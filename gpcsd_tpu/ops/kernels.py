"""Stationary covariance kernels (pure functions, trace-safe).

Parity targets:
- Squared-exponential spatial/temporal kernels and Matern-1/2 temporal kernel
  as used in ``/root/reference/src/gpcsd/covariances.py`` (``compute_Ks``
  ``:50-56``/``:177-186``, ``GPCSDTemporalCovSE.compute_Kt`` ``:257-271``,
  ``GPCSDTemporalCovMatern.compute_Kt`` ``:291-305``).

All functions take flat coordinate vectors and scalar (or per-dim) params and
return dense Gram matrices; they are building blocks for the quadrature
covariance ops in :mod:`gpcsd_tpu.ops.spatial`.
"""

from __future__ import annotations

import jax.numpy as jnp


def _col(x):
    return jnp.asarray(x).reshape(-1)


def se(x, y, ell):
    """Squared-exponential correlation exp(-0.5 (x-y)^2 / ell^2); (nx, ny)."""
    d = _col(x)[:, None] - _col(y)[None, :]
    return jnp.exp(-0.5 * jnp.square(d / ell))


def se_2d(xy, zw, ell1, ell2):
    """Product-SE correlation over 2D points; (n, m).

    ``xy`` (n, 2) and ``zw`` (m, 2) are point lists.
    """
    xy = jnp.asarray(xy)
    zw = jnp.asarray(zw)
    d1 = xy[:, 0][:, None] - zw[:, 0][None, :]
    d2 = xy[:, 1][:, None] - zw[:, 1][None, :]
    return jnp.exp(
        -0.5 * jnp.square(d1 / ell1) - 0.5 * jnp.square(d2 / ell2)
    )


def temporal_se(t, tprime, ell, sigma2):
    """SE temporal covariance sigma2 * exp(-0.5 dt^2/ell^2); (nt, ntp)."""
    return sigma2 * se(t, tprime, ell)


def temporal_matern12(t, tprime, ell, sigma2):
    """Matern-1/2 (exponential) covariance sigma2 * exp(-|dt|/ell)."""
    d = _col(t)[:, None] - _col(tprime)[None, :]
    return sigma2 * jnp.exp(-jnp.abs(d) / ell)


#: registry used by the model layer to assemble temporal covariance stacks
TEMPORAL_KERNELS = {
    "se": temporal_se,
    "matern": temporal_matern12,
}
