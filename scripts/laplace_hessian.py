"""Float64 Laplace (MAP-Hessian) whitening matrix for the paper NUTS run.

Computes the Hessian of the negative log joint at the cached MAP in
float64 on CPU (batched central finite differences of the f64 gradient,
~25 s at the auditory size) and writes it to ``<paper-dir>/hessian_f64.npz``
for ``sample_posterior(laplace_hessian=...)``.

Why a separate process: the numeric policy (``gpcsd_tpu/config.py``) keys
dtypes off ``jax.default_backend()`` at trace time, so f64 factors require
a CPU-backend process.  The TPU in-process fallback (FD of f32 gradients)
gets the stiff curvatures to ~2% but buries the soft ones in an O(1e3)
noise floor (measured: true soft eigenvalues {1e-10, 0.21} come out as
{-30, -2.8} at the auditory size); the f64 stencil resolves them exactly,
so NUTS warmup starts from correct scales in every direction.

    python scripts/laplace_hessian.py --paper-dir results/paper_nuts
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paper-dir", default="results/paper_nuts")
    ap.add_argument("--ntime", type=int, default=1200)
    ap.add_argument("--ntrials", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fd-step", type=float, default=1e-4)
    args = ap.parse_args()

    out = os.path.join(args.paper_dir, "hessian_f64.npz")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    assert jax.default_backend() == "cpu", jax.default_backend()

    from scripts.paper_nuts_run import build_model

    model = build_model(args.paper_dir, args.ntime, args.ntrials, args.seed)
    map_path = os.path.join(args.paper_dir, "map_params.pkl")
    with open(map_path, "rb") as f:
        model.restore_model_params(pickle.load(f))
    fns = model._fns()
    Y = model._Y()
    u0 = jnp.asarray(fns.param_set.pack(model._theta()))
    assert u0.dtype == jnp.float64, u0.dtype
    dim = u0.shape[0]

    if os.path.exists(out):
        with np.load(out) as d:
            if np.allclose(d["u0"], np.asarray(u0)):
                print(f"cached: {out}", flush=True)
                return 0

    h = args.fd_step
    eye = h * jnp.eye(dim, dtype=u0.dtype)
    pts = jnp.concatenate([u0[None] + eye, u0[None] - eye], axis=0)
    gs = jax.jit(jax.vmap(jax.grad(lambda u: fns.neg_log_joint(u, Y))))(pts)
    H = np.asarray((gs[:dim] - gs[dim:]) / (2 * h), dtype=np.float64).T
    H = 0.5 * (H + H.T)
    w = np.linalg.eigvalsh(H)
    with open(out + ".tmp", "wb") as f:
        np.savez(f, H=H, u0=np.asarray(u0), eigs=w)
    os.replace(out + ".tmp", out)
    print(
        "wrote %s  (eig range [%.3e, %.3e], %d non-positive)"
        % (out, w.min(), w.max(), int((w <= 0).sum())),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
