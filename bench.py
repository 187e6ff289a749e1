"""Headline benchmark: marginal-likelihood value+gradient throughput.

Problem size = the auditory-LFP workload (reference
``auditory_lfp/fit_gpcsd_baseline.py``): nx=24 electrodes, nt=600 time
points, 100 trials, ngl=100 quadrature nodes — the objective evaluated
hundreds of times per L-BFGS restart and at every NUTS leapfrog step
(SURVEY.md §3.1: the hot path).

Ours: jitted ``value_and_grad`` of the full log-joint on the accelerator.
Baseline: a reference-style numpy float64 implementation of the *forward*
log-joint only (eigh of Ks/Kt + per-trial quad-form loop, mirroring
``gpcsd1d.py:113-128``).  The reference additionally pays autograd's
reverse pass per evaluation (2-3x the forward cost, SURVEY.md §3.1), so
``vs_baseline`` — our value+grad rate over its value-only rate — is a
*lower bound* on the true speedup.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

NX, NT, NTRIALS, NGL = 24, 600, 100, 100


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


def main():
    m = build_problem()
    ours = bench_ours(m)
    base = bench_baseline(m)
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


if __name__ == "__main__":
    main()
