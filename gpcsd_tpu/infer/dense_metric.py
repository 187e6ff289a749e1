"""Dense (full-covariance) NUTS metric building blocks — round-5 lever #1.

The round-4 paper run isolated the sampling failure to posterior
geometry: a dense 30-dim ridge that the diagonal Welford metric cannot
represent (PERF.md round 4).  This module provides the Stan ``dense_e``
ingredients as pure functions, kept separate from the sampler so they
can be unit-tested and then wired into ``infer/nuts.py``'s warmup in
round 5:

- :func:`dense_welford_init` / :func:`dense_welford_update` /
  :func:`dense_welford_cov` — streaming full-covariance estimate with
  Stan's shrinkage regularization toward a scaled identity.
- :func:`metric_from_cov` — Cholesky factor ``L`` with ``Sigma = L L^T``;
  the mass matrix is ``M = Sigma^{-1}``.
- :func:`draw_momentum` (``r ~ N(0, M)``), :func:`velocity`
  (``M^{-1} r = Sigma r``), :func:`kinetic` (``0.5 r^T Sigma r``) —
  everything leapfrog and the U-turn criterion need, each O(dim^2).

Conventions match the diagonal path in ``infer/hmc.py`` (inv_mass ==
posterior covariance estimate), so the sampler can select vector
(diagonal) vs (L, dense) representations per run.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DenseWelfordState(NamedTuple):
    count: jnp.ndarray  # scalar
    mean: jnp.ndarray  # (dim,)
    m2: jnp.ndarray  # (dim, dim) sum of outer products of residuals


def dense_welford_init(dim: int, dtype=jnp.float64) -> DenseWelfordState:
    return DenseWelfordState(
        count=jnp.zeros((), dtype),
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim, dim), dtype),
    )


def dense_welford_update(st: DenseWelfordState, x) -> DenseWelfordState:
    x = jnp.asarray(x)
    n = st.count + 1.0
    d = x - st.mean
    mean = st.mean + d / n
    d2 = x - mean
    return DenseWelfordState(count=n, mean=mean, m2=st.m2 + jnp.outer(d, d2))


def dense_welford_merge(a: DenseWelfordState, b: DenseWelfordState):
    """Pool two accumulators (cross-chain warmup pooling, Chan et al.)."""
    n = a.count + b.count
    safe = jnp.maximum(n, 1.0)
    d = b.mean - a.mean
    mean = a.mean + d * (b.count / safe)
    m2 = a.m2 + b.m2 + jnp.outer(d, d) * (a.count * b.count / safe)
    return DenseWelfordState(count=n, mean=mean, m2=m2)


def dense_welford_cov(st: DenseWelfordState, regularize: bool = True):
    """Covariance estimate; Stan's dense shrinkage when ``regularize``:

        Sigma_reg = (n/(n+5)) * Sigma + 1e-3 * (5/(n+5)) * I

    keeps the metric SPD and conservative for short adaptation windows.
    """
    n = jnp.maximum(st.count, 2.0)
    cov = st.m2 / (n - 1.0)
    if not regularize:
        return cov
    dim = st.mean.shape[0]
    w = n / (n + 5.0)
    return w * cov + 1e-3 * (1.0 - w) * jnp.eye(dim, dtype=cov.dtype)


def metric_from_cov(cov):
    """Cholesky factor L with ``Sigma = L L^T`` (lower), jitter-guarded."""
    cov = jnp.asarray(cov)
    dim = cov.shape[-1]
    scale = jnp.maximum(jnp.trace(cov) / dim, 1e-300)
    return jnp.linalg.cholesky(
        cov + 1e-12 * scale * jnp.eye(dim, dtype=cov.dtype)
    )


def draw_momentum(key, L):
    """``r ~ N(0, M)`` with ``M = Sigma^{-1}``: ``r = L^{-T} xi``."""
    xi = jax.random.normal(key, (L.shape[-1],), L.dtype)
    return jax.scipy.linalg.solve_triangular(L.T, xi, lower=False)


def velocity(L, r):
    """``M^{-1} r = Sigma r = L (L^T r)`` — the leapfrog position update
    direction and the U-turn criterion's velocity."""
    return L @ (L.T @ r)


def kinetic(L, r):
    """``0.5 r^T Sigma r = 0.5 ||L^T r||^2``."""
    y = L.T @ r
    return 0.5 * jnp.sum(y * y)
