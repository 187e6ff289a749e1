"""On-device numerical acceptance at realistic configs (VERDICT item 2).

Quantifies TPU (f32-factor policy) vs CPU float64 agreement where it
matters — the real workload configurations, not the adversarial pure-noise
bench — in three tiers:

1. **Log-joint value + gradient** at the MAP and at jittered points around
   it, for the auditory GPCSD1D size (nx=24, nt=600, 100 trials, ngl=100)
   and the Neuropixels GPCSD2D size (nx=69, nt=375, ngl 30x120, eps=1).
2. **MAP parameters**: polish the TPU MAP with CPU-f64 L-BFGS; if the
   polish barely moves any parameter, the TPU MAP is an f64 stationary
   point to that tolerance.
3. **Posterior moments** (when the paper NUTS run artifact exists):
   evaluate the CPU-f64 log-joint at a subsample of the TPU posterior
   draws and compute the importance-weight effective sample size of
   ``w ~ exp(lp_f64 - lp_tpu)``.  ESS/n near 1 bounds the moment error of
   the TPU posterior by ordinary Monte-Carlo error.

Backends cannot be switched inside one process, so this runs staged:

    python scripts/tpu_accuracy.py --backend tpu   # writes tpu.json
    python scripts/tpu_accuracy.py --backend cpu   # writes cpu.json (+polish)
    python scripts/tpu_accuracy.py --report        # merges -> acceptance.json

Each stage is idempotent and cached in --out-dir.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_JITTER = 5
N_POSTERIOR_DRAWS = 64


def _build_1d(out_dir):
    from scripts.paper_nuts_run import build_model

    return build_model(
        os.environ.get("GPCSD_PAPER_DIR", "results/paper_nuts"), 1200, 100, 0
    )


def _build_2d():
    """Neuropixels-size GPCSD2D on surrogate data (matches scripts/bench_2d)."""
    import gpcsd_tpu as g
    from workloads.neuropixels import neuropixels_geometry

    rng = np.random.default_rng(0)
    x = neuropixels_geometry(nrows=35)[:69]
    nt = 375
    t = np.linspace(-40.0, 110.0, nt).reshape(-1, 1)
    lfp = 0.5 * rng.normal(size=(69, nt, 100))
    m = g.GPCSD2D(
        lfp, x, t, eps=1.0, ngl1=30, ngl2=120,
        a1=x[:, 0].min() - 16, b1=x[:, 0].max() + 16,
        a2=x[:, 1].min() - 100, b2=x[:, 1].max() + 100,
    )
    m.R["value"] = 80.0
    m.spatial_cov.params["ell1"]["value"] = 30.0
    m.spatial_cov.params["ell2"]["value"] = 100.0
    m.temporal_cov_list[0].params["ell"]["value"] = 20.0
    m.temporal_cov_list[0].params["sigma2"]["value"] = 1.0
    m.temporal_cov_list[1].params["ell"]["value"] = 3.0
    m.temporal_cov_list[1].params["sigma2"]["value"] = 0.5
    m.sig2n["value"] = 0.1
    return m


def _points_1d(model, out_dir):
    """MAP point (from the paper run if available) + jittered neighbors."""
    import jax

    map_path = os.path.join(
        os.environ.get("GPCSD_PAPER_DIR", "results/paper_nuts"), "map_params.pkl"
    )
    if os.path.isfile(map_path):
        with open(map_path, "rb") as f:
            model.restore_model_params(pickle.load(f))
    fns = model._fns()
    u0 = np.asarray(fns.param_set.pack(model._theta()), dtype=np.float64)
    rng = np.random.default_rng(7)
    pts = [u0] + [
        u0 + 0.05 * rng.standard_normal(u0.shape) for _ in range(N_JITTER)
    ]
    return fns, np.stack(pts)


def _posterior_subsample():
    """U-SPACE posterior draws from the finished paper run.

    Uses ``posterior_samples.npz``'s ``raw_u``, which the inference API
    already mapped back from the Laplace-whitened sampling coordinates —
    the raw ``nuts_state`` checkpoints hold v-space positions, and
    evaluating those as u-space points produced the bogus +-3e3-log-unit
    "discrepancies" this stage reported before round 4's fix."""
    samp = os.path.join(
        os.environ.get("GPCSD_PAPER_DIR", "results/paper_nuts"),
        "posterior_samples.npz",
    )
    if not os.path.isfile(samp):
        return None
    with np.load(samp) as d:
        u = np.asarray(d["raw_u"], dtype=np.float64)  # (chains, S, dim)
    flat = u.reshape(-1, u.shape[-1])
    idx = np.random.default_rng(3).choice(
        flat.shape[0], min(N_POSTERIOR_DRAWS, flat.shape[0]), replace=False
    )
    return flat[idx]


def run_backend(backend, out_dir):
    if backend == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    if backend == "cpu":
        assert jax.default_backend() == "cpu", jax.default_backend()
    else:
        # the TPU plugin registers as 'axon' in this environment
        assert jax.default_backend() != "cpu", jax.default_backend()
    res = {"backend": jax.default_backend()}

    # ---- auditory 1D
    model = _build_1d(out_dir)
    fns, pts = _points_1d(model, out_dir)
    Y = model._Y()
    vg = jax.jit(jax.value_and_grad(fns.neg_log_joint))
    vals, grads = [], []
    for u in pts:
        f, g = vg(jnp.asarray(u), Y)
        vals.append(float(f))
        grads.append(np.asarray(g, dtype=np.float64).tolist())
    res["aud_points"] = pts.tolist()
    res["aud_values"] = vals
    res["aud_grads"] = grads

    post = _posterior_subsample()
    if post is not None:
        lp = jax.jit(lambda u: -fns.neg_log_joint(u, Y))
        res["post_draws"] = post.tolist()
        res["post_logp"] = [float(lp(jnp.asarray(u))) for u in post]

    if backend == "cpu":
        # CPU-f64 polish of the TPU MAP: movement == distance from an f64
        # stationary point
        from gpcsd_tpu.infer.lbfgs import lbfgs_minimize

        lo, hi = fns.param_set.bounds()
        polish = jax.jit(
            lambda u0: lbfgs_minimize(
                lambda u: fns.neg_log_joint(u, Y), u0,
                lo=jnp.asarray(lo), hi=jnp.asarray(hi), max_iter=200,
            )
        )(jnp.asarray(pts[0]))
        res["map_polished_u"] = np.asarray(polish.u, dtype=np.float64).tolist()
        res["map_polish_iters"] = int(np.asarray(polish.n_iter))
        res["param_names"] = list(fns.param_set.names_flat())

    # ---- Neuropixels 2D, at a FITTED point: f32 accuracy is only
    # meaningful where inference actually operates — arbitrary unfitted
    # parameters put the Kronecker spectrum in f32-hostile territory
    # (measured 7-11% there vs ~1e-6 near the 1D MAP)
    m2 = _build_2d()
    npx_map = os.path.join(out_dir, "npx_map.pkl")
    if os.path.isfile(npx_map):
        with open(npx_map, "rb") as f:
            m2.restore_model_params(pickle.load(f))
    elif backend == "tpu":
        m2.fit(n_restarts=2, seed=0,
               options={"maxiter": 80, "chunk_iters": 3,
                        "state_path": os.path.join(out_dir, "npx_map_state")})
        with open(npx_map + ".tmp", "wb") as f:
            pickle.dump(m2.extract_model_params(), f)
        os.replace(npx_map + ".tmp", npx_map)
    fns2 = m2._fns()
    Y2 = m2._Y()
    u2 = np.asarray(fns2.param_set.pack(m2._theta()), dtype=np.float64)
    rng = np.random.default_rng(11)
    pts2 = np.stack(
        [u2] + [u2 + 0.05 * rng.standard_normal(u2.shape) for _ in range(3)]
    )
    vg2 = jax.jit(jax.value_and_grad(fns2.neg_log_joint))
    res["npx_values"] = []
    res["npx_grads"] = []
    for u in pts2:
        f, g = vg2(jnp.asarray(u), Y2)
        res["npx_values"].append(float(f))
        res["npx_grads"].append(np.asarray(g, dtype=np.float64).tolist())
    res["npx_points"] = pts2.tolist()

    out = os.path.join(out_dir, f"{backend}.json")
    with open(out + ".tmp", "w") as f:
        json.dump(res, f)
    os.replace(out + ".tmp", out)
    print(f"wrote {out}", flush=True)


def report(out_dir):
    with open(os.path.join(out_dir, "tpu.json")) as f:
        tpu = json.load(f)
    with open(os.path.join(out_dir, "cpu.json")) as f:
        cpu = json.load(f)

    # the two stages must have evaluated the SAME points (they do when run
    # under the same map_params.pkl availability — rerun the stale one if
    # this trips)
    np.testing.assert_allclose(
        np.asarray(tpu["aud_points"]), np.asarray(cpu["aud_points"]),
        err_msg="stage point mismatch: rerun both stages back-to-back",
    )
    np.testing.assert_allclose(
        np.asarray(tpu["npx_points"]), np.asarray(cpu["npx_points"])
    )

    def rel(a, b):
        a, b = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
        return np.abs(a - b) / np.maximum(np.abs(b), 1e-30)

    def grad_metrics(ga, gb):
        ga, gb = np.asarray(ga), np.asarray(gb)
        cos = [
            float(np.dot(x, y) / (np.linalg.norm(x) * np.linalg.norm(y)))
            for x, y in zip(ga, gb)
        ]
        rl2 = [
            float(np.linalg.norm(x - y) / np.linalg.norm(y))
            for x, y in zip(ga, gb)
        ]
        return cos, rl2

    rep = {}
    rep["aud_logjoint_rel_err"] = rel(tpu["aud_values"], cpu["aud_values"]).tolist()
    cos, rl2 = grad_metrics(tpu["aud_grads"], cpu["aud_grads"])
    rep["aud_grad_cos"] = cos
    rep["aud_grad_rel_l2"] = rl2
    rep["npx_logjoint_rel_err"] = rel(tpu["npx_values"], cpu["npx_values"]).tolist()
    cos2, rl22 = grad_metrics(tpu["npx_grads"], cpu["npx_grads"])
    rep["npx_grad_cos"] = cos2
    rep["npx_grad_rel_l2"] = rl22

    # MAP acceptance: CPU-f64 polish movement per parameter (log-scale units)
    u_tpu = np.asarray(tpu["aud_points"][0])
    u_pol = np.asarray(cpu["map_polished_u"])
    rep["map_param_abs_delta_u"] = dict(
        zip(cpu["param_names"], np.abs(u_pol - u_tpu).tolist())
    )
    rep["map_max_abs_delta_u"] = float(np.max(np.abs(u_pol - u_tpu)))
    rep["map_polish_iters"] = cpu["map_polish_iters"]
    # u is log-scale, so |delta u| is the relative change of the
    # constrained parameter: exp(delta)-1 ~ delta

    if "post_logp" in tpu and "post_logp" in cpu:
        lt = np.asarray(tpu["post_logp"])
        lc = np.asarray(cpu["post_logp"])
        lw = lc - lt
        lw = lw - lw.max()
        w = np.exp(lw)
        n = w.size
        ess = float(w.sum() ** 2 / np.sum(w**2))
        rep["posterior_is_ess_frac"] = ess / n
        rep["posterior_logp_abs_diff_mean"] = float(np.mean(np.abs(lt - lc)))
        rep["posterior_logp_diff_sd"] = float(np.std(lt - lc))
        rep["posterior_n_draws"] = int(n)

    out = os.path.join(out_dir, "acceptance.json")
    with open(out, "w") as f:
        json.dump(rep, f, indent=1)
    summary = {
        "aud_logjoint_rel_err_max": max(rep["aud_logjoint_rel_err"]),
        "aud_grad_cos_min": min(rep["aud_grad_cos"]),
        "npx_logjoint_rel_err_max": max(rep["npx_logjoint_rel_err"]),
        "npx_grad_cos_min": min(rep["npx_grad_cos"]),
        "map_max_abs_delta_u": rep["map_max_abs_delta_u"],
        "posterior_is_ess_frac": rep.get("posterior_is_ess_frac"),
    }
    print(json.dumps(summary, indent=1))
    print(f"wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", choices=["tpu", "cpu"], default=None)
    ap.add_argument("--report", action="store_true")
    ap.add_argument("--out-dir", default="results/tpu_accuracy")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    if args.report:
        report(args.out_dir)
    elif args.backend:
        run_backend(args.backend, args.out_dir)
    else:
        raise SystemExit("pass --backend tpu|cpu or --report")


if __name__ == "__main__":
    main()
