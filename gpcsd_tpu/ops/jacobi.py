"""Parallel-order cyclic Jacobi symmetric eigensolver in pure JAX.

Why this exists: on the TPU backend, XLA's ``eigh`` lowering hits a
compile-time cliff for moderate matrix sizes (minutes-to-never at
n≈600 — exactly the auditory workload's temporal kernel size, SURVEY.md
§6).  This implementation compiles in seconds at any size: two nested
``fori``/``while`` loops whose body is a fixed set of gathers, elementwise
rotation math on the VPU, and scatters.

Algorithm: classic cyclic Jacobi with the round-robin ("tournament")
parallel ordering — each of the n-1 steps in a sweep rotates n/2 *disjoint*
pivot pairs simultaneously, so one step = one vectorized update of the
whole matrix.  Convergence is quadratic; sweeps stop when the off-diagonal
Frobenius norm falls below ``tol * ||A||_F``.

Precision note: Jacobi is the *most* accurate dense symmetric eigensolver
for small eigenvalues (high relative accuracy), which matters here because
the Kronecker likelihood floors D with sig2n as small as 1e-8.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _round_robin_schedule(n: int) -> np.ndarray:
    """(n-1, 2, n//2) static pivot schedule covering all pairs per sweep."""
    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        ps = [players[i] for i in range(n // 2)]
        qs = [players[n - 1 - i] for i in range(n // 2)]
        # normalize so p < q (symmetric matrix, order irrelevant but tidy)
        pair = np.stack([np.minimum(ps, qs), np.maximum(ps, qs)])
        rounds.append(pair)
        players = [players[0]] + [players[-1]] + players[1:-1]
    return np.stack(rounds)  # (n-1, 2, n//2)


@partial(jax.jit, static_argnames=("max_sweeps",))
def _eigh_jacobi_even(A, schedule, max_sweeps: int):
    n = A.shape[-1]
    dtype = A.dtype
    V0 = jnp.eye(n, dtype=dtype)
    eps = jnp.asarray(np.finfo(np.dtype(dtype)).eps, dtype)
    tol = eps * jnp.linalg.norm(A)

    def offnorm(M):
        return jnp.linalg.norm(M - jnp.diagflat(jnp.diagonal(M)))

    def step(carry, pq):
        A, V = carry
        p = pq[0]
        q = pq[1]
        app = A[p, p]
        aqq = A[q, q]
        apq = A[p, q]
        small = jnp.abs(apq) <= eps * jnp.sqrt(jnp.abs(app * aqq) + eps)
        tau = (aqq - app) / (2.0 * jnp.where(small, 1.0, apq))
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0.0, 1.0, t)  # tau=0 -> 45 degree rotation
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        c = jnp.where(small, 1.0, c)
        s = jnp.where(small, 0.0, s)

        # A <- J^T A J with disjoint Givens rotations (p_i, q_i)
        Ap = A[:, p]
        Aq = A[:, q]
        A = A.at[:, p].set(c * Ap - s * Aq).at[:, q].set(s * Ap + c * Aq)
        Ap = A[p, :]
        Aq = A[q, :]
        A = (
            A.at[p, :].set(c[:, None] * Ap - s[:, None] * Aq)
            .at[q, :].set(s[:, None] * Ap + c[:, None] * Aq)
        )
        Vp = V[:, p]
        Vq = V[:, q]
        V = V.at[:, p].set(c * Vp - s * Vq).at[:, q].set(s * Vp + c * Vq)
        return (A, V), None

    def sweep_body(state):
        A, V, it = state
        (A, V), _ = jax.lax.scan(step, (A, V), schedule)
        # re-symmetrize to kill rounding drift
        A = 0.5 * (A + A.T)
        return A, V, it + 1

    def sweep_cond(state):
        A, _, it = state
        return (offnorm(A) > tol) & (it < max_sweeps)

    A, V, _ = jax.lax.while_loop(sweep_cond, sweep_body, (0.5 * (A + A.T), V0, 0))

    w = jnp.diagonal(A)
    order = jnp.argsort(w)
    return w[order], V[:, order]


def eigh_jacobi(A, max_sweeps: int = 20):
    """Symmetric eigendecomposition, ascending eigenvalues (eigh convention).

    Supports odd n by bordering with a decoupled unit row/column.
    """
    A = jnp.asarray(A)
    n = A.shape[-1]
    if n % 2 == 1:
        # border with an isolated dummy dimension whose eigenvalue exceeds the
        # Gershgorin bound, so it is strictly the largest and sorts last
        big = 2.0 * n * jnp.max(jnp.abs(A)) + 1.0
        Ap = jnp.zeros((n + 1, n + 1), A.dtype)
        Ap = Ap.at[:n, :n].set(A).at[n, n].set(big)
        schedule = jnp.asarray(_round_robin_schedule(n + 1))
        w, V = _eigh_jacobi_even(Ap, schedule, max_sweeps)
        # dummy eigenvalue `big` is strictly the largest -> last after sort
        return w[:n], V[:n, :n]
    schedule = jnp.asarray(_round_robin_schedule(n))
    return _eigh_jacobi_even(A, schedule, max_sweeps)
