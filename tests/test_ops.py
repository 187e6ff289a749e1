"""Unit tests for the numerics core: quadrature, forward ops, Kronecker algebra.

Strategy (SURVEY.md §4): closed-form checks plus dense-reference oracles —
every factored computation is compared against the naive dense formula it
replaces, evaluated in float64 on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpcsd_tpu.ops import forward, kernels, kronlik, spatial
from gpcsd_tpu.ops.quadrature import gauss_legendre, gauss_legendre_2d


class TestQuadrature:
    def test_gl_integrates_polynomial_exactly(self):
        rule = gauss_legendre(-2.0, 3.0, 8)
        # GL with n nodes is exact for degree <= 2n-1
        val = np.sum(rule.w * rule.x**7)
        exact = (3.0**8 - (-2.0) ** 8) / 8
        assert np.allclose(val, exact, rtol=1e-12)

    def test_gl_2d_weights(self):
        r = gauss_legendre_2d(0, 1, 0, 2, 5, 6)
        assert r.xy.shape == (30, 2)
        assert np.allclose(np.sum(r.w), 2.0)  # area of [0,1]x[0,2]


class TestForward:
    def test_b_fwd_1d_closed_form(self):
        r = jnp.array([-1.0, 0.0, 2.0])
        R = 2.0
        got = forward.b_fwd_1d(r, R)
        want = np.sqrt((np.asarray(r) / R) ** 2 + 1) - np.abs(np.asarray(r) / R)
        assert np.allclose(got, want)

    def test_b_fwd_2d_closed_form(self):
        w = jnp.array([0.0, 1.0, 5.0])
        R, eps = 2.0, 0.1
        got = forward.b_fwd_2d(w, R, eps)
        want = np.log(R + eps + np.sqrt((R + eps) ** 2 + np.asarray(w) ** 2)) - np.log(
            eps + np.sqrt(eps**2 + np.asarray(w) ** 2)
        )
        assert np.allclose(got, want)

    def test_trapezoid_weights_match_numpy_trapz(self, rng):
        x = np.sort(rng.uniform(0, 10, size=17))
        y = rng.normal(size=17)
        w = forward.trapezoid_weights(x)
        assert np.allclose(np.sum(np.asarray(w) * y), np.trapezoid(y, x), rtol=1e-12)

    def test_fwd_model_1d_matches_loop(self, rng):
        """Oracle: the reference's per-(z,t) trapezoid loop
        (forward_models.py:20-39), written naively here."""
        nx, nt, nz = 12, 5, 7
        x = np.linspace(0, 100, nx)
        z = np.linspace(10, 90, nz)
        R = 25.0
        arr = rng.normal(size=(nx, nt))
        got = np.asarray(forward.fwd_model_1d(arr, x, z, R))
        want = np.zeros((nz, nt))
        for t in range(nt):
            for i in range(nz):
                b = np.sqrt(((z[i] - x) / R) ** 2 + 1) - np.abs((z[i] - x) / R)
                want[i, t] = np.trapezoid(b * arr[:, t], x)
        want *= R / 2.0
        assert np.allclose(got, want, rtol=1e-10)

    def test_fwd_model_2d_matches_loop(self, rng):
        nx1, nx2, nt, nz = 6, 8, 3, 5
        x1 = np.linspace(0, 50, nx1)
        x2 = np.linspace(0, 100, nx2)
        z = np.stack([rng.uniform(5, 45, nz), rng.uniform(5, 95, nz)], axis=1)
        R, eps = 15.0, 2.0
        arr = rng.normal(size=(nx1, nx2, nt))
        got = np.asarray(forward.fwd_model_2d(arr, x1, x2, z, R, eps))
        want = np.zeros((nz, nt))
        for t in range(nt):
            for i in range(nz):
                d1 = z[i, 0] - x1
                d2 = z[i, 1] - x2
                w = np.sqrt(d1[:, None] ** 2 + d2[None, :] ** 2)
                wt = np.log(R + eps + np.sqrt((R + eps) ** 2 + w**2)) - np.log(
                    eps + np.sqrt(eps**2 + w**2)
                )
                inner = np.trapezoid(wt * arr[:, :, t], x1, axis=0)
                want[i, t] = np.trapezoid(inner, x2)
        assert np.allclose(got, want, rtol=1e-10)

    def test_fwd_model_1d_batched(self, rng):
        x = np.linspace(0, 100, 9)
        z = np.linspace(0, 100, 4)
        arr = rng.normal(size=(3, 9, 6))
        got = np.asarray(forward.fwd_model_1d(arr, x, z, 20.0))
        for b in range(3):
            single = np.asarray(forward.fwd_model_1d(arr[b], x, z, 20.0))
            assert np.allclose(got[b], single)


class TestKernels:
    def test_se(self):
        x = np.array([0.0, 1.0, 3.0])
        got = np.asarray(kernels.se(x, x, 2.0))
        want = np.exp(-0.5 * (x[:, None] - x[None, :]) ** 2 / 4.0)
        assert np.allclose(got, want)

    def test_matern_and_se_temporal(self):
        t = np.linspace(0, 10, 6)
        km = np.asarray(kernels.temporal_matern12(t, t, 2.0, 0.7))
        assert np.allclose(km, 0.7 * np.exp(-np.abs(t[:, None] - t[None, :]) / 2.0))
        ks = np.asarray(kernels.temporal_se(t, t, 3.0, 0.5))
        assert np.allclose(ks, 0.5 * np.exp(-0.5 * (t[:, None] - t[None, :]) ** 2 / 9.0))

    def test_se_2d_product(self, rng):
        xy = rng.normal(size=(5, 2))
        zw = rng.normal(size=(4, 2))
        got = np.asarray(kernels.se_2d(xy, zw, 1.5, 2.5))
        want = np.exp(
            -0.5 * (xy[:, 0][:, None] - zw[:, 0][None, :]) ** 2 / 1.5**2
        ) * np.exp(-0.5 * (xy[:, 1][:, None] - zw[:, 1][None, :]) ** 2 / 2.5**2)
        assert np.allclose(got, want)


class TestSpatialQuadratureCov:
    """The quadrature covariances vs. brute-force numerical integration."""

    def test_kphi_1d_symmetric_psd(self):
        x = np.linspace(0, 2300, 24)
        rule = gauss_legendre(0, 2300, 100)
        K = np.asarray(spatial.kphi_1d(x, rule.x, rule.w, 200.0, 100.0))
        assert np.allclose(K, K.T, atol=1e-10)
        w = np.linalg.eigvalsh(K + 1e-8 * np.eye(24))
        assert w.min() > -1e-8

    def test_kphi_1d_is_double_integral(self):
        """Kphi(x, x') = int int b(x-u) k(u,v) b(x'-v) du dv via a fine
        trapezoid oracle."""
        x = np.array([30.0, 60.0])
        a, b, ell, R = 0.0, 100.0, 30.0, 20.0
        rule = gauss_legendre(a, b, 120)
        got = np.asarray(spatial.kphi_1d(x, rule.x, rule.w, ell, R))
        u = np.linspace(a, b, 4001)
        K_uv = np.exp(-0.5 * (u[:, None] - u[None, :]) ** 2 / ell**2)
        for i in range(2):
            for j in range(2):
                bi = np.sqrt(((x[i] - u) / R) ** 2 + 1) - np.abs((x[i] - u) / R)
                bj = np.sqrt(((x[j] - u) / R) ** 2 + 1) - np.abs((x[j] - u) / R)
                inner = np.trapezoid(K_uv * bj[None, :], u, axis=1)
                want = np.trapezoid(bi * inner, u)
                assert np.allclose(got[i, j], want, rtol=1e-3)

    def test_kphig_1d_is_single_integral(self):
        x = np.array([40.0])
        z = np.array([55.0])
        a, b, ell, R = 0.0, 100.0, 25.0, 15.0
        rule = gauss_legendre(a, b, 120)
        got = np.asarray(spatial.kphig_1d(x, z, rule.x, rule.w, ell, R))
        u = np.linspace(a, b, 4001)
        bi = np.sqrt(((x[0] - u) / R) ** 2 + 1) - np.abs((x[0] - u) / R)
        k = np.exp(-0.5 * (u - z[0]) ** 2 / ell**2)
        want = np.trapezoid(bi * k, u)
        assert np.allclose(got[0, 0], want, rtol=1e-3)

    def test_kphi_2d_shapes_and_symmetry(self, rng):
        from gpcsd_tpu.utils.grids import expand_grid

        x = expand_grid(np.linspace(0, 30, 3), np.linspace(0, 300, 8))
        r = gauss_legendre_2d(0, 30, 0, 300, 10, 20)
        dw = np.asarray(spatial.pairwise_w(x, r.xy))
        K = np.asarray(spatial.kphi_2d(dw, r.xy, r.w, 20.0, 60.0, 15.0, 5.0))
        assert K.shape == (24, 24)
        assert np.allclose(K, K.T, atol=1e-8)


class TestKronLik:
    def _setup(self, rng, nx=5, nt=7, sig2n=0.3):
        A = rng.normal(size=(nx, nx))
        Ks = A @ A.T + nx * np.eye(nx)
        B = rng.normal(size=(nt, nt))
        Kt = B @ B.T + nt * np.eye(nt)
        return Ks, Kt, sig2n

    def test_eigen_identity(self, rng):
        """(Qs x Qt) diag(D) (Qs x Qt)^T == Ks x Kt + sig2n I."""
        Ks, Kt, s2 = self._setup(rng)
        fac = kronlik.comp_eig_d(jnp.asarray(Ks), jnp.asarray(Kt), s2)
        Q = np.kron(np.asarray(fac.qs), np.asarray(fac.qt))
        rebuilt = Q @ np.diag(np.asarray(fac.d).reshape(-1)) @ Q.T
        dense = np.kron(Ks, Kt) + s2 * np.eye(Ks.shape[0] * Kt.shape[0])
        assert np.allclose(rebuilt, dense, atol=1e-8)

    def test_loglik_matches_dense_gaussian(self, rng):
        Ks, Kt, s2 = self._setup(rng)
        nx, nt = Ks.shape[0], Kt.shape[0]
        Y = rng.normal(size=(3, nx, nt))
        fac = kronlik.comp_eig_d(jnp.asarray(Ks), jnp.asarray(Kt), s2)
        got = float(kronlik.loglik(fac, jnp.asarray(Y)))
        dense = np.kron(Ks, Kt) + s2 * np.eye(nx * nt)
        sign, logdet = np.linalg.slogdet(dense)
        inv = np.linalg.inv(dense)
        want = 0.0
        for b in range(3):
            y = Y[b].reshape(-1)
            want += -0.5 * logdet - 0.5 * y @ inv @ y
        assert np.allclose(got, want, rtol=1e-8)

    def test_loglik_heteroscedastic_matches_reference_approx(self, rng):
        """Per-channel noise uses the reference's approximation: D built in
        the eigenbasis of Ks alone (utility_functions.py:54-63)."""
        Ks, Kt, _ = self._setup(rng)
        nx, nt = Ks.shape[0], Kt.shape[0]
        sig2n = rng.uniform(0.1, 0.5, size=nx)
        Y = rng.normal(size=(2, nx, nt))
        fac = kronlik.comp_eig_d(jnp.asarray(Ks), jnp.asarray(Kt), jnp.asarray(sig2n))
        got = float(kronlik.loglik(fac, jnp.asarray(Y)))
        # reference formula: Dvec = repeat(ls, nt)*tile(lt, nx) + repeat(s2, nt)
        ls, Qs = np.linalg.eigh(Ks)
        lt, Qt = np.linalg.eigh(Kt)
        Dvec = np.repeat(ls, nt) * np.tile(lt, nx) + np.repeat(sig2n, nt)
        want = 0.0
        for b in range(2):
            alpha = (Qs.T @ Y[b] @ Qt).reshape(-1)
            want += -0.5 * np.sum(np.log(Dvec)) - 0.5 * np.sum(alpha**2 / Dvec)
        assert np.allclose(got, want, rtol=1e-8)

    def test_loglik_het_exact_matches_dense_gaussian(self, rng):
        """het_exact=True: per-channel noise handled exactly (noise-whitened
        spatial eigh), matching the dense N(0, Ks x Kt + diag(s2 x 1))."""
        Ks, Kt, _ = self._setup(rng)
        nx, nt = Ks.shape[0], Kt.shape[0]
        sig2n = rng.uniform(0.1, 0.5, size=nx)
        Y = rng.normal(size=(2, nx, nt))
        fac = kronlik.comp_eig_d(
            jnp.asarray(Ks), jnp.asarray(Kt), jnp.asarray(sig2n), het_exact=True
        )
        got = float(kronlik.loglik(fac, jnp.asarray(Y)))
        dense = np.kron(Ks, Kt) + np.diag(np.repeat(sig2n, nt))
        _, logdet = np.linalg.slogdet(dense)
        inv = np.linalg.inv(dense)
        want = sum(
            -0.5 * logdet - 0.5 * Y[b].reshape(-1) @ inv @ Y[b].reshape(-1)
            for b in range(2)
        )
        assert np.allclose(got, want, rtol=1e-8)
        # and the approximation path genuinely differs on this problem
        fac_a = kronlik.comp_eig_d(jnp.asarray(Ks), jnp.asarray(Kt), jnp.asarray(sig2n))
        assert not np.allclose(float(kronlik.loglik(fac_a, jnp.asarray(Y))), want, rtol=1e-6)

    def test_kron_solve_het_exact_matches_dense(self, rng):
        Ks, Kt, _ = self._setup(rng)
        nx, nt = Ks.shape[0], Kt.shape[0]
        sig2n = rng.uniform(0.05, 0.4, size=nx)
        Y = rng.normal(size=(2, nx, nt))
        fac = kronlik.comp_eig_d(
            jnp.asarray(Ks), jnp.asarray(Kt), jnp.asarray(sig2n), het_exact=True
        )
        got = np.asarray(kronlik.kron_solve(fac, jnp.asarray(Y)))
        dense = np.kron(Ks, Kt) + np.diag(np.repeat(sig2n, nt))
        for b in range(2):
            want = np.linalg.solve(dense, Y[b].reshape(-1)).reshape(nx, nt)
            assert np.allclose(got[b], want, rtol=1e-7, atol=1e-9)

    def test_het_exact_scalar_noise_equivalence(self, rng):
        """With equal per-channel noise both modes coincide with the scalar path."""
        Ks, Kt, s2 = self._setup(rng)
        Y = rng.normal(size=(3, Ks.shape[0], Kt.shape[0]))
        fac_scalar = kronlik.comp_eig_d(jnp.asarray(Ks), jnp.asarray(Kt), s2)
        want = float(kronlik.loglik(fac_scalar, jnp.asarray(Y)))
        vec = jnp.full((Ks.shape[0],), s2)
        for he in (False, True):
            fac = kronlik.comp_eig_d(jnp.asarray(Ks), jnp.asarray(Kt), vec, het_exact=he)
            assert np.allclose(float(kronlik.loglik(fac, jnp.asarray(Y))), want, rtol=1e-9)

    def test_het_exact_preconditioned_matches(self, rng):
        """Preconditioned temporal eigh + exact het noise stays exact."""
        Ks, Kt, _ = self._setup(rng)
        nx, nt = Ks.shape[0], Kt.shape[0]
        sig2n = rng.uniform(0.1, 0.5, size=nx)
        Y = rng.normal(size=(2, nx, nt))
        # arbitrary orthogonal preconditioner basis
        q0, _ = np.linalg.qr(rng.normal(size=(nt, nt)))
        fac_p = kronlik.comp_eig_d_preconditioned(
            jnp.asarray(Ks), jnp.asarray(Kt), jnp.asarray(sig2n), jnp.asarray(q0),
            het_exact=True,
        )
        fac = kronlik.comp_eig_d(
            jnp.asarray(Ks), jnp.asarray(Kt), jnp.asarray(sig2n), het_exact=True
        )
        got_p = float(kronlik.loglik(fac_p, jnp.asarray(Y)))
        got = float(kronlik.loglik(fac, jnp.asarray(Y)))
        assert np.allclose(got_p, got, rtol=1e-8)

    def test_kron_solve_matches_dense(self, rng):
        Ks, Kt, s2 = self._setup(rng)
        nx, nt = Ks.shape[0], Kt.shape[0]
        Y = rng.normal(size=(2, nx, nt))
        fac = kronlik.comp_eig_d(jnp.asarray(Ks), jnp.asarray(Kt), s2)
        got = np.asarray(kronlik.kron_solve(fac, jnp.asarray(Y)))
        dense = np.kron(Ks, Kt) + s2 * np.eye(nx * nt)
        for b in range(2):
            want = np.linalg.solve(dense, Y[b].reshape(-1)).reshape(nx, nt)
            assert np.allclose(got[b], want, rtol=1e-7, atol=1e-9)

    def test_kron_cross_mean_matches_dense_kron(self, rng):
        nx, nt, nz, nts = 4, 5, 3, 6
        Kxz = rng.normal(size=(nx, nz))
        Ktt = rng.normal(size=(nt, nts))
        V = rng.normal(size=(2, nx, nt))
        got = np.asarray(kronlik.kron_cross_mean(jnp.asarray(Kxz), jnp.asarray(Ktt), jnp.asarray(V)))
        big = np.kron(Kxz, Ktt)  # (nx*nt, nz*nts)
        for b in range(2):
            want = (big.T @ V[b].reshape(-1)).reshape(nz, nts)
            assert np.allclose(got[b], want, rtol=1e-10)

    def test_mykron_matches_numpy(self, rng):
        A = rng.normal(size=(3, 4))
        B = rng.normal(size=(2, 5))
        assert np.allclose(np.asarray(kronlik.mykron(jnp.asarray(A), jnp.asarray(B))), np.kron(A, B))

    def test_loglik_gradient_finite_with_degenerate_eigs(self):
        """eigh_safe must give finite grads when Kt has repeated eigenvalues."""
        nx, nt = 4, 6
        x = jnp.linspace(0.0, 3.0, nx)
        t = jnp.linspace(0.0, 5.0, nt)
        Y = jnp.ones((1, nx, nt)) * 0.1

        def f(ell):
            Ks = kernels.se(x, x, 1.0) + 1e-8 * jnp.eye(nx)
            # enormous lengthscale -> Kt nearly rank-1, eigenvalues clustered at 0
            Kt = kernels.temporal_se(t, t, ell, 1.0)
            fac = kronlik.comp_eig_d(Ks, Kt, 0.1)
            return kronlik.loglik(fac, Y)

        g = jax.grad(f)(1e6)
        assert np.isfinite(float(g))

    def test_eigh_safe_gradient_matches_fd(self, rng):
        A = rng.normal(size=(5, 5))
        A = A @ A.T + 5 * np.eye(5)

        def f(a):
            w, v = kronlik.eigh_safe(a)
            return jnp.sum(w**2) + jnp.sum(jnp.abs(v[:, -1]) * w)

        g = jax.grad(f)(jnp.asarray(A))
        eps = 1e-6
        for idx in [(0, 0), (1, 2), (3, 4)]:
            dA = np.zeros_like(A)
            dA[idx] = eps
            fd = (float(f(jnp.asarray(A + dA))) - float(f(jnp.asarray(A - dA)))) / (2 * eps)
            assert np.allclose(float(g[idx]), fd, rtol=1e-4, atol=1e-6)
