"""Bisect the accelerator log-joint eval noise by likelihood stage.

The family-surrogate probe (scripts/f32_noise_probe.py) measures 1.42
log-units RMS on TPU vs 0.012 under the same f32 policy on CPU, and the
noise is invariant to every temporal-congruence config — so the source
is some OTHER stage.  This script evaluates each piece along the same
whitened segment and reports its quadratic-fit residual:

  - lam_s / lam_t spectra (sum of logs of the positive part)
  - logdet = sum(log d) + offset
  - quad   = sum(alpha^2 / d)
  - total  = -0.5*(ntrials*logdet' ... ) as loglik reports it

Usage:  python scripts/noise_bisect.py [--out-dir results/paper_nuts_family]
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out-dir", default="results/paper_nuts_family")
    ap.add_argument("--scale", type=float, default=1e-2)
    ap.add_argument("--npts", type=int, default=17)
    ap.add_argument("--f64", action="store_true",
                    help="force factor+compute dtype float64")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from scripts.paper_nuts_run import build_model
    from gpcsd_tpu.ops import kronlik

    if args.f64:
        from gpcsd_tpu import config
        config.set_policy(factor_dtype="float64", compute_dtype="float64")

    model = build_model(args.out_dir, 1200, 100, 0)
    with open(os.path.join(args.out_dir, "map_params.pkl"), "rb") as f:
        model.restore_model_params(pickle.load(f))

    fns = model._fns(precondition=True)
    u0 = np.asarray(fns.param_set.pack(model._theta()))
    rng = np.random.default_rng(0)
    du = rng.normal(size=u0.size)
    du /= np.linalg.norm(du)
    Y = model._Y()
    ntrials = Y.shape[0]

    def pieces(u):
        theta = fns.param_set.unpack(u)
        fac = fns.build_factors(theta)
        alpha = kronlik.whiten(fac, Y)
        quad = jnp.sum(jnp.square(alpha) / fac.d)
        logdet = ntrials * (jnp.sum(jnp.log(fac.d)) + fac.logdet_offset)
        ls = jnp.sum(jnp.log(jnp.abs(fac.lam_s) + 1e-300))
        lt = jnp.sum(jnp.log(jnp.abs(fac.lam_t) + 1e-300))
        return jnp.stack([
            quad, logdet, ls, lt,
            -0.5 * (quad + logdet),
        ])

    f = jax.jit(pieces)
    ts = np.linspace(-args.scale, args.scale, args.npts)
    vals = np.stack([np.asarray(f(jnp.asarray(u0 + t * du)))
                     for t in ts])  # (npts, 5)
    names = ["quad", "logdet", "sum log|lam_s|", "sum log|lam_t|",
             "-0.5(quad+logdet)"]
    print("backend:", jax.default_backend())
    for j, nm in enumerate(names):
        v = vals[:, j]
        coef = np.polyfit(ts, v, 2)
        resid = v - np.polyval(coef, ts)
        print("%-20s center=%.6g  range=%.4g  RMS-resid=%.4g" % (
            nm, v[args.npts // 2], v.max() - v.min(), resid.std()))


if __name__ == "__main__":
    main()
