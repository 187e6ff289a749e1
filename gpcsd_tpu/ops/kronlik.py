"""Kronecker-structured Gaussian marginal likelihood and solves.

The whole framework's performance story (reference SURVEY.md §1) hangs on the
identity: for ``K = Ks (x) Kt + diag(sig2n)`` with ``Ks = Qs Ls Qs^T`` and
``Kt = Qt Lt Qt^T``,

    K = (Qs (x) Qt) diag(D) (Qs (x) Qt)^T,   D = Ls (x) Lt + sig2n

so the log-likelihood needs only two small ``eigh`` calls plus per-trial
congruence transforms ``Qs^T Y Qt`` (reference ``comp_eig_D``
``/root/reference/src/gpcsd/utility_functions.py:44-64`` and
``GPCSD1D.loglik`` ``gpcsd1d.py:113-128``).

TPU-first redesign decisions:
- trials are a leading batch axis contracted with two batched matmuls
  (``einsum``) instead of the reference's per-trial Python loop;
- the posterior solve is kept *factored* — ``K^{-1} y`` is three small
  matmuls per trial, never the dense ``(nx*nt)^2`` matrix the reference
  materializes in ``GPCSD1D.predict`` (``gpcsd1d.py:262-265``);
- ``eigh`` gets a gap-regularized JVP so hyperparameter gradients stay finite
  when the temporal kernel has (numerically) repeated eigenvalues — the
  downstream likelihood is invariant to rotations inside degenerate
  eigenspaces, so the regularization does not bias its gradient.

Heteroscedastic note: with per-channel sig2n the diagonalization is the same
*approximation* the reference makes (``utility_functions.py:54-63``) — D uses
the eigenbasis of Ks alone.  We reproduce it for parity (SURVEY.md §5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# gradient-safe symmetric eigendecomposition
# ---------------------------------------------------------------------------

_EIGH_GAP_EPS = 1e-12

#: On non-CPU backends, matrices larger than this use the Jacobi eigensolver:
#: XLA's TPU ``eigh`` lowering has a compile-time cliff (n=384 -> 164 s,
#: n=512 -> 293 s measured on v5e) while the parallel-order Jacobi in
#: :mod:`gpcsd_tpu.ops.jacobi` compiles in seconds and runs in ~1 ms.
EIGH_JACOBI_MIN_N = 257


def _eigh_impl(a):
    n = a.shape[-1]
    if n >= EIGH_JACOBI_MIN_N and jax.default_backend() != "cpu":
        from .jacobi import eigh_jacobi

        return eigh_jacobi(a)
    return jnp.linalg.eigh(a)


@jax.custom_jvp
def eigh_safe(a):
    """Symmetric eigendecomposition with a gap-regularized derivative.

    Returns (eigenvalues, eigenvectors) like ``jnp.linalg.eigh``; the
    backend implementation is chosen per platform/size (see ``_eigh_impl``).
    """
    w, v = _eigh_impl(a)
    return w, v


@eigh_safe.defjvp
def _eigh_safe_jvp(primals, tangents):
    (a,) = primals
    (da,) = tangents
    w, v = eigh_safe(a)
    hp = jax.lax.Precision.HIGHEST  # TPU default matmul precision is bf16
    da_sym = 0.5 * (da + jnp.swapaxes(da, -1, -2))
    vt_da_v = jnp.matmul(
        jnp.matmul(jnp.swapaxes(v, -1, -2), da_sym, precision=hp), v, precision=hp
    )
    dw = jnp.diagonal(vt_da_v, axis1=-2, axis2=-1)
    gap = w[..., None, :] - w[..., :, None]  # gap[i, j] = w_j - w_i
    # Lorentzian-regularized inverse gap: behaves like 1/gap for separated
    # eigenvalues, ->0 (instead of inf) inside degenerate clusters.
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=-1, keepdims=True)[..., None], 1.0)
    eps = _EIGH_GAP_EPS * scale
    f = gap / (gap * gap + eps * eps)
    f = f * (1.0 - jnp.eye(w.shape[-1], dtype=a.dtype))
    dv = jnp.matmul(v, f * vt_da_v, precision=hp)
    return (w, v), (dw, dv)


# ---------------------------------------------------------------------------
# factored Kronecker likelihood
# ---------------------------------------------------------------------------


class KronFactors(NamedTuple):
    """Factorization of ``K = Ks (x) Kt + diag(noise)`` such that

        K^{-1} = (qs (x) qt) diag(1/d) (qs (x) qt)^T
        log|K| = sum(log d) + logdet_offset

    In the homoscedastic / reference-approximation path ``qs``/``qt`` are the
    orthogonal eigenvectors of Ks/Kt and ``logdet_offset`` is zero.  In the
    exact heteroscedastic path (``het_exact=True``) ``qs = S^{-1} Q̃`` is the
    noise-whitened spatial basis (not orthogonal) and ``logdet_offset``
    carries ``nt * sum(log sig2n)``; every downstream identity (whiten,
    loglik quad form, kron_solve, posterior variance) holds unchanged.
    """

    qs: jnp.ndarray  # (nx, nx)
    qt: jnp.ndarray  # (nt, nt)
    lam_s: jnp.ndarray  # (nx,)
    lam_t: jnp.ndarray  # (nt,)
    d: jnp.ndarray  # (nx, nt) diagonal in the (qs (x) qt) basis
    logdet_offset: jnp.ndarray = 0.0  # scalar, see class docstring


def _spatial_factors(Ks, sig2n, nt, het_exact):
    """Spatial eigenbasis + per-entry noise floor + logdet offset.

    ``het_exact=False`` reproduces the reference approximation for vector
    sig2n (D built in the eigenbasis of Ks alone,
    ``/root/reference/src/gpcsd/utility_functions.py:54-63``).
    ``het_exact=True`` whitens by the noise first: with ``S = diag(sig2n)``,

        K = Ks (x) Kt + S (x) I
          = (S^{1/2} (x) I)(S^{-1/2} Ks S^{-1/2} (x) Kt + I)(S^{1/2} (x) I)

    so eigendecomposing the whitened ``K̃s = S^{-1/2} Ks S^{-1/2}`` gives the
    *exact* diagonalization at identical cost (one nx-sized eigh).  For
    scalar sig2n both paths are the same exact factorization.
    """
    eigh_in = Ks
    if het_exact and sig2n.ndim:
        s = jnp.sqrt(sig2n)
        eigh_in = Ks / (s[:, None] * s[None, :])
    lam_s, qs = eigh_safe(eigh_in)
    # The kernels are PSD + jitter, so true eigenvalues are nonnegative;
    # numerically negative ones (quadrature Gram roundoff, ~eps*||K||) would
    # push D below the noise floor and NaN the log-determinant.
    lam_s = jnp.maximum(lam_s, 0.0)
    if het_exact and sig2n.ndim:
        qs = qs / s[:, None]
        noise = jnp.ones((), Ks.dtype)
        logdet_offset = nt * jnp.sum(jnp.log(sig2n))
    else:
        noise = sig2n[..., None] if sig2n.ndim else sig2n
        logdet_offset = jnp.zeros((), Ks.dtype)
    return qs, lam_s, noise, logdet_offset


def dct_basis(n: int):
    """Orthonormal DCT-II basis matrix (numpy, float64).

    Stationary kernels on a *uniform* grid are near-Toeplitz, and Toeplitz
    matrices are approximately diagonalized by the DCT — so solving the
    temporal eigh in this basis hands the iterative Jacobi solver a
    strongly diagonally-dominant matrix (measured ~13x lower off-norm and
    ~3x faster on v5e at nt=600; PERF.md).  Exact for any symmetric matrix:
    it is just a fixed orthogonal similarity.
    """
    j = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    C = np.cos(np.pi * (2 * j + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    C[:, 0] /= np.sqrt(2.0)
    return C


def comp_eig_d(Ks, Kt, sig2n, het_exact: bool = False) -> KronFactors:
    """Joint factorization; ``sig2n`` is a scalar or per-channel (nx,) vector.

    Matches reference ``comp_eig_D`` with D reshaped to (nx, nt): the
    reference's flat ``Dvec`` is ``repeat(lam_s, nt)*tile(lam_t, nx)+sig2n``
    i.e. row-major (nx, nt) — identical layout.  Factors are computed in the
    policy factor dtype (float64 on CPU, float32 on accelerators by
    default — see :class:`gpcsd_tpu.config.Policy`).

    :param het_exact: with vector sig2n, use the exact noise-whitened
        factorization instead of the reference's approximation (SURVEY.md §5);
        no-op for scalar sig2n.
    """
    from .. import config

    fdt = config.get_policy().resolve_factor_dtype()
    Ks = jnp.asarray(Ks).astype(fdt)
    Kt = jnp.asarray(Kt).astype(fdt)
    sig2n = jnp.asarray(sig2n).astype(fdt)
    lam_t, qt = eigh_safe(Kt)
    lam_t = jnp.maximum(lam_t, 0.0)
    qs, lam_s, noise, logdet_offset = _spatial_factors(
        Ks, sig2n, lam_t.shape[0], het_exact
    )
    d = lam_s[:, None] * lam_t[None, :] + noise
    return KronFactors(
        qs=qs, qt=qt, lam_s=lam_s, lam_t=lam_t, d=d, logdet_offset=logdet_offset
    )


def comp_eig_d_preconditioned(Ks, Kt, sig2n, q0t, het_exact: bool = False) -> KronFactors:
    """:func:`comp_eig_d` with the temporal eigh solved in a fixed reference
    basis ``q0t`` (typically the MAP's eigenvectors).

    ``B = q0t^T Kt q0t`` is nearly diagonal near the reference point, so the
    iterative Jacobi eigensolver converges in 1-2 sweeps; the result is the
    exact eigendecomposition everywhere (``Qt = q0t W``).
    """
    from .. import config

    fdt = config.get_policy().resolve_factor_dtype()
    hp = jax.lax.Precision.HIGHEST
    Ks = jnp.asarray(Ks).astype(fdt)
    Kt = jnp.asarray(Kt).astype(fdt)
    q0t = jnp.asarray(q0t).astype(fdt)
    sig2n = jnp.asarray(sig2n).astype(fdt)
    B = jnp.matmul(jnp.matmul(q0t.T, Kt, precision=hp), q0t, precision=hp)
    lam_t, w_t = eigh_safe(B)
    qt = jnp.matmul(q0t, w_t, precision=hp)
    lam_t = jnp.maximum(lam_t, 0.0)
    qs, lam_s, noise, logdet_offset = _spatial_factors(
        Ks, sig2n, lam_t.shape[0], het_exact
    )
    d = lam_s[:, None] * lam_t[None, :] + noise
    return KronFactors(
        qs=qs, qt=qt, lam_s=lam_s, lam_t=lam_t, d=d, logdet_offset=logdet_offset
    )


def whiten(factors: KronFactors, Y):
    """``alpha = Qs^T Y Qt`` batched over leading axes; Y is (..., nx, nt).

    The contraction runs in the policy compute dtype (float32 on
    accelerators — float64 matmuls are emulated on TPU; the eigenbasis and
    the D-weighted reduction stay in the factor dtype).
    """
    from .. import config

    cdt = config.get_policy().resolve_compute_dtype()
    Y = jnp.asarray(Y)
    out_dtype = jnp.result_type(Y.dtype, factors.qs.dtype)
    alpha = jnp.einsum(
        "xi,...xt,tj->...ij",
        factors.qs.astype(cdt),
        Y.astype(cdt),
        factors.qt.astype(cdt),
        precision=jax.lax.Precision.HIGHEST,
    )
    return alpha.astype(out_dtype)


def loglik(factors: KronFactors, Y, ntrials=None):
    """Marginal log-likelihood of trials Y (..., nx, nt); sums trial axes.

    Drops the -0.5*n*log(2*pi) constant, matching reference ``loglik``
    (``gpcsd1d.py:113-128``).

    :param ntrials: override the trial count in the log-determinant term —
        used when Y carries zero-padded trials for sharding (padded trials
        contribute exactly zero to the quadratic form).
    """
    Y = jnp.asarray(Y)
    if ntrials is None:
        ntrials = 1
        for s in Y.shape[:-2]:
            ntrials *= s
    alpha = whiten(factors, Y)
    quad = jnp.sum(jnp.square(alpha) / factors.d)
    logdet = ntrials * (jnp.sum(jnp.log(factors.d)) + factors.logdet_offset)
    return -0.5 * (logdet + quad)


def kron_solve(factors: KronFactors, Y):
    """``(Ks (x) Kt + diag(sig2n))^{-1} Y`` per trial, fully factored.

    Y is (..., nx, nt); returns the same shape.  Replaces the reference's
    dense ``mykron(Qs, Qt) @ diag(1/D) @ ...`` (``gpcsd1d.py:262-265``).
    """
    from .. import config

    cdt = config.get_policy().resolve_compute_dtype()
    alpha = whiten(factors, Y) / factors.d
    out = jnp.einsum(
        "xi,...ij,tj->...xt",
        factors.qs.astype(cdt),
        alpha.astype(cdt),
        factors.qt.astype(cdt),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(alpha.dtype)


def kron_cross_mean(Kxz, Ktt, V):
    """Posterior mean contraction ``(Kxz (x) Ktt)^T vec(V)`` per trial.

    :param Kxz: (nx, nz) spatial cross-covariance (data side first)
    :param Ktt: (nt, ntstar) temporal cross-covariance (data side first)
    :param V: (..., nx, nt) solve output from :func:`kron_solve`
    :return: (..., nz, ntstar)
    """
    from .. import config

    cdt = config.get_policy().resolve_compute_dtype()
    V = jnp.asarray(V)
    out = jnp.einsum(
        "xz,...xt,ts->...zs",
        jnp.asarray(Kxz).astype(cdt),
        V.astype(cdt),
        jnp.asarray(Ktt).astype(cdt),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(V.dtype)


def orth_polish(q):
    """One Newton-Schulz step toward the nearest orthogonal matrix.

    Used to pin the orthogonality defect of a *carried* eigenbasis (the
    NUTS warm-start aux state) at the roundoff floor: each leapfrog
    multiplies two approximately-orthogonal f32 factors, so over thousands
    of steps the defect would grow linearly and bias the factorization
    identity ``K^{-1} = qt d^{-1} qt^T``.
    """
    hp = jax.lax.Precision.HIGHEST
    return 1.5 * q - 0.5 * jnp.matmul(
        q, jnp.matmul(q.T, q, precision=hp), precision=hp
    )


def mykron(A, B):
    """Dense Kronecker product (kept for tests/interop; avoid in hot paths)."""
    a1, a2 = A.shape
    b1, b2 = B.shape
    return jnp.reshape(
        A[:, None, :, None] * B[None, :, None, :], (a1 * b1, a2 * b2)
    )
