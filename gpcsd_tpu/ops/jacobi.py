"""Parallel-order cyclic Jacobi symmetric eigensolver in pure JAX.

Why this exists: on the TPU backend, XLA's ``eigh`` lowering hits a
compile-time cliff for moderate matrix sizes (measured on TPU v5e:
n=256 -> 2 s, n=384 -> 164 s, n=512 -> 293 s, n=600 -> beyond 10 min — and
n≈600 is exactly the auditory workload's temporal kernel, SURVEY.md §6).
This implementation compiles in seconds at any size and is built purely
from *static* strided slices, elementwise VPU math, and one fixed
permutation — no dynamic gathers, no unrolling.

Algorithm: cyclic Jacobi with the round-robin ("circle method") parallel
ordering.  The matrix is kept in a rotating layout in which the current
n/2 pivot pairs are always the adjacent index pairs (2i, 2i+1):

- rotate all pairs simultaneously (2x2 symmetric Schur decompositions,
  vectorized over pairs; strided slices only);
- advance to the next round's pairing by ONE fixed permutation (the same
  static index array every step — the circle method's rotation);
- after n-1 steps every pair has been pivoted once and the layout returns
  to the identity, so sweeps compose cleanly inside a ``while_loop``.

Convergence is quadratic; iteration stops when the off-diagonal Frobenius
norm drops below machine-eps * ||A||_F or at ``max_sweeps``.

Precision note: Jacobi delivers high *relative* accuracy for small
eigenvalues — exactly what the Kronecker likelihood needs when sig2n
floors D at 1e-8 (reference ``gpcsd1d.py:17``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _interleave_cols(X, Y):
    n, m = X.shape
    return jnp.stack([X, Y], axis=2).reshape(n, 2 * m)


def _interleave_rows(X, Y):
    m, n = X.shape
    return jnp.stack([X, Y], axis=1).reshape(2 * m, n)


def _circle_layout(players):
    n = len(players)
    out = []
    for i in range(n // 2):
        out.append(players[i])
        out.append(players[n - 1 - i])
    return out


def _step_permutation(n: int) -> np.ndarray:
    """sigma with B_next = B[sigma][:, sigma]: one circle-method rotation."""
    p0 = list(range(n))
    p1 = [p0[0], p0[-1]] + p0[1:-1]
    L0 = _circle_layout(p0)
    L1 = _circle_layout(p1)
    pos0 = {pl: i for i, pl in enumerate(L0)}
    return np.array([pos0[pl] for pl in L1], dtype=np.int32)


def _initial_layout(n: int) -> np.ndarray:
    return np.array(_circle_layout(list(range(n))), dtype=np.int32)


@partial(jax.jit, static_argnames=("max_sweeps",))
def _eigh_jacobi_even(A, sigma, max_sweeps: int):
    n = A.shape[-1]
    dtype = A.dtype
    eps = jnp.asarray(np.finfo(np.dtype(dtype)).eps, dtype)
    tol = eps * jnp.linalg.norm(A)
    nsteps = n - 1

    def offnorm(M):
        return jnp.linalg.norm(M - jnp.diagflat(jnp.diagonal(M)))

    def step(_, BV):
        B, V = BV
        d = jnp.diagonal(B)
        app = d[0::2]
        aqq = d[1::2]
        apq = jnp.diagonal(B, offset=1)[0::2]
        small = jnp.abs(apq) <= eps * (jnp.abs(app) + jnp.abs(aqq) + eps)
        tau = (aqq - app) / (2.0 * jnp.where(small, 1.0, apq))
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0.0, 1.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        c = jnp.where(small, 1.0, c)
        s = jnp.where(small, 0.0, s)

        # B <- J^T B J on adjacent pairs: columns then rows, static strides
        Bt = B[:, 0::2]
        Bb = B[:, 1::2]
        B = _interleave_cols(c[None, :] * Bt - s[None, :] * Bb,
                             s[None, :] * Bt + c[None, :] * Bb)
        Bt = B[0::2, :]
        Bb = B[1::2, :]
        B = _interleave_rows(c[:, None] * Bt - s[:, None] * Bb,
                             s[:, None] * Bt + c[:, None] * Bb)
        Vt = V[:, 0::2]
        Vb = V[:, 1::2]
        V = _interleave_cols(c[None, :] * Vt - s[None, :] * Vb,
                             s[None, :] * Vt + c[None, :] * Vb)

        # advance to the next round's pairing (fixed static permutation)
        B = B[sigma][:, sigma]
        V = V[:, sigma]
        return B, V

    def sweep_body(state):
        B, V, it = state
        B, V = jax.lax.fori_loop(0, nsteps, step, (B, V))
        B = 0.5 * (B + B.T)
        return B, V, it + 1

    def sweep_cond(state):
        B, _, it = state
        return (offnorm(B) > tol) & (it < max_sweeps)

    # start in circle layout L0 so pairs are adjacent
    L0 = jnp.asarray(_initial_layout(n))
    B0 = A[L0][:, L0]
    B0 = 0.5 * (B0 + B0.T)
    V0 = jnp.zeros((n, n), dtype).at[L0, jnp.arange(n)].set(1.0)

    B, V, _ = jax.lax.while_loop(sweep_cond, sweep_body, (B0, V0, 0))
    # after full sweeps the layout is back to L0; undo it
    inv = jnp.argsort(L0)
    w = jnp.diagonal(B)[inv]
    V = V[:, inv]
    order = jnp.argsort(w)
    return w[order], V[:, order]


def eigh_jacobi(A, max_sweeps: int = 20):
    """Symmetric eigendecomposition, ascending eigenvalues (eigh convention).

    Supports odd n by bordering with a decoupled dummy dimension.
    """
    A = jnp.asarray(A)
    n = A.shape[-1]
    if n % 2 == 1:
        # border with an isolated dummy dimension whose eigenvalue exceeds the
        # Gershgorin bound, so it is strictly the largest and sorts last
        big = 2.0 * n * jnp.max(jnp.abs(A)) + 1.0
        Ap = jnp.zeros((n + 1, n + 1), A.dtype)
        Ap = Ap.at[:n, :n].set(A).at[n, n].set(big)
        w, V = _eigh_jacobi_even(Ap, jnp.asarray(_step_permutation(n + 1)), max_sweeps)
        return w[:n], V[:n, :n]
    return _eigh_jacobi_even(A, jnp.asarray(_step_permutation(n)), max_sweeps)
