"""Headline benchmarks at the auditory-LFP workload size.

Problem size = the reference's flagship fit
(``auditory_lfp/fit_gpcsd_baseline.py``): nx=24 electrodes, nt=600 time
points, 100 trials, ngl=100 quadrature nodes.

Prints TWO JSON lines ({"metric", "value", "unit", "vs_baseline"} each):

1. **NUTS samples/s/chip** (the BASELINE.json north star) — taken from
   the completed paper-scale posterior run artifact when present
   (``results/paper_nuts/paper_nuts_auditory.json``: 4 chains x 500
   warmup + 500 samples via the chunked driver, median sampling-chunk
   throughput), else measured live with a short chunked run at the same
   configuration.  ``vs_baseline`` divides by the implied rate of a
   reference-style numpy sampler: baseline forward evals/s / (mean
   leapfrogs per sample) — optimistic for the baseline, since the real
   reference would also pay autograd's reverse pass per leapfrog.
2. **log-joint value+grad evals/s** — jitted ``value_and_grad`` on the
   accelerator vs the reference-style numpy float64 *forward-only*
   log-joint (eigh of Ks/Kt + per-trial quad-form loop, mirroring
   ``gpcsd1d.py:113-128``); a lower bound on the true speedup.
"""

import json
import os
import time

import numpy as np

NX, NT, NTRIALS, NGL = 24, 600, 100, 100
PAPER_RUN = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "results", "paper_nuts", "paper_nuts_auditory.json",
)


def build_problem(seed=0):
    import gpcsd_tpu as g

    rng = np.random.default_rng(seed)
    x = (np.arange(NX) * 100.0).reshape(-1, 1)
    t = np.arange(NT).reshape(-1, 1) * 1.0
    lfp = rng.normal(size=(NX, NT, NTRIALS))
    m = g.GPCSD1D(lfp, x, t, ngl=NGL)
    m.R["value"] = 150.0
    m.spatial_cov.params["ell"]["value"] = 200.0
    m.temporal_cov_list[0].params["ell"]["value"] = 8.0
    m.temporal_cov_list[0].params["sigma2"]["value"] = 1.0
    m.temporal_cov_list[1].params["ell"]["value"] = 3.0
    m.temporal_cov_list[1].params["sigma2"]["value"] = 0.5
    m.sig2n["value"] = 0.05
    return m


def bench_ours(m, n_iters=50):
    import jax
    import jax.numpy as jnp

    # precondition=True is the production sampler path: NUTS/SMC always run
    # with the temporal eigh preconditioned on the MAP (sample_posterior's
    # default).  Exactness is unchanged (tests/test_precondition.py); it
    # cuts Jacobi sweeps ~2.3x on TPU (PERF.md).
    fns = m._fns(precondition=True)
    Y = m._Y()
    u0 = np.asarray(fns.param_set.pack(m._theta()))

    vg = jax.jit(jax.value_and_grad(fns.neg_log_joint))
    # distinct parameter points so no intermediate is trivially reusable
    us = jnp.asarray(u0[None, :] + 0.01 * np.random.default_rng(1).normal(size=(n_iters, u0.size)))
    f, g = vg(us[0], Y)
    f.block_until_ready()  # compile
    t0 = time.perf_counter()
    for i in range(n_iters):
        f, g = vg(us[i], Y)
    f.block_until_ready()
    dt = time.perf_counter() - t0
    return n_iters / dt


def reference_style_loglik_numpy(theta, x, t, gl_x, gl_w, Y):
    """Reference-semantics forward pass in plain numpy float64:
    quadrature covariances, two eighs, per-trial quad-form loop."""
    R, ell = theta["R"], theta["ell"]
    delta = x[:, None] - gl_x[None, :]
    u = delta / R
    A = gl_w[None, :] * (np.sqrt(u * u + 1) - np.abs(u))
    Kgl = np.exp(-0.5 * ((gl_x[:, None] - gl_x[None, :]) / ell) ** 2)
    Ks = A @ Kgl @ A.T + 1e-8 * np.eye(x.size)
    dt_ = t[:, None] - t[None, :]
    Kt = theta["s1"] * np.exp(-0.5 * (dt_ / theta["l1"]) ** 2) + theta["s2"] * np.exp(
        -np.abs(dt_) / theta["l2"]
    )
    lt, Qt = np.linalg.eigh(Kt)
    ls, Qs = np.linalg.eigh(Ks)
    Dvec = np.repeat(ls, t.size) * np.tile(lt, x.size) + theta["sig2n"]
    logdet = -0.5 * Y.shape[2] * np.sum(np.log(Dvec))
    quad = 0.0
    for trial in range(Y.shape[2]):  # the reference's per-trial loop
        alpha = (Qs.T @ Y[:, :, trial] @ Qt).reshape(-1)
        quad += np.sum(alpha**2 / Dvec)
    return logdet - 0.5 * quad


def bench_baseline(m, n_iters=5):
    from scipy.special import roots_legendre

    x = m.x.reshape(-1)
    t = m.t.reshape(-1)
    glx, glw = roots_legendre(NGL)
    a, b = x.min(), x.max()
    gl_x = 0.5 * (glx + 1) * (b - a) + a
    gl_w = 0.5 * (b - a) * glw
    Y = m.lfp
    thetas = []
    rng = np.random.default_rng(2)
    for _ in range(n_iters):
        j = 1.0 + 0.01 * rng.normal()
        thetas.append(
            dict(R=150.0 * j, ell=200.0 * j, s1=1.0 * j, l1=8.0 * j, s2=0.5 * j,
                 l2=3.0 * j, sig2n=0.05 * j)
        )
    reference_style_loglik_numpy(thetas[0], x, t, gl_x, gl_w, Y)  # warm caches
    t0 = time.perf_counter()
    for th in thetas:
        reference_style_loglik_numpy(th, x, t, gl_x, gl_w, Y)
    dt = time.perf_counter() - t0
    return n_iters / dt


def bench_nuts(m, base_evals_per_s):
    """NUTS samples/s/chip: paper-run artifact if present, else a short
    live run through ``sample_posterior`` — the production path (Laplace
    MAP-Hessian whitening + MAP-centered preconditioning + warm-basis
    threading + chunked dispatches), so the fallback measures the same
    sampler configuration the paper run uses."""
    if os.path.isfile(PAPER_RUN):
        with open(PAPER_RUN) as f:
            art = json.load(f)
        rate = art.get("samples_per_s_per_chip_median")
        steps = art.get("mean_leapfrogs_per_sample")
        rhat = art.get("max_rhat")
        # quality gate: a throughput number from a run whose chains did not
        # mix is not a headline (the round-2 artifact hit R-hat ~1e4 after
        # its whitening Hessian came out garbage) — fall back to the live
        # measurement instead of reporting a statistically invalid rate
        if rate and rhat is not None and rhat < 1.05:
            return rate, steps, "paper-run artifact (4x(500+500))"
    times = {}
    last = {"t": time.perf_counter()}

    def cb(c, carry):
        now = time.perf_counter()
        times[c] = now - last["t"]
        last["t"] = now

    post = m.sample_posterior(
        n_chains=4, num_warmup=20, num_samples=20, seed=5,
        chunk_size=2, max_depth=7, callback=cb,
    )
    samp = [v for k, v in times.items() if k >= 10]  # post-warmup chunks
    med = float(np.median(samp))
    steps = float(np.asarray(post.diagnostics["num_steps"]).mean())
    return 4 * 2 / med, steps, "live 4x(20+20) whitened chunked measurement"


def main():
    m = build_problem()
    ours = bench_ours(m)
    base = bench_baseline(m)
    nuts_rate, steps, source = bench_nuts(m, base)
    # implied reference-style sampler rate: forward evals/s / leapfrogs per
    # sample (no reverse-pass cost charged -> optimistic for the baseline)
    base_nuts = base / max(steps or 32.0, 1.0)
    print(
        json.dumps(
            {
                "metric": "GPCSD1D log-joint value+grad evals/s (nx=24,nt=600,trials=100,ngl=100)",
                "value": round(ours, 3),
                "unit": "evals/s",
                "vs_baseline": round(ours / base, 2),
            }
        )
    )
    # north-star metric last (the driver records the final JSON line)
    print(
        json.dumps(
            {
                "metric": "NUTS samples/s/chip, auditory config (4 chains; " + source + ")",
                "value": round(nuts_rate, 3),
                "unit": "samples/s",
                "vs_baseline": round(nuts_rate / base_nuts, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
