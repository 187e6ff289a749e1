"""Preconditioned eigendecomposition: exactness away from the center."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpcsd_tpu as g
from gpcsd_tpu.ops import kronlik


class TestPreconditionedFactors:
    def test_matches_plain_comp_eig_d(self, rng):
        nx, nt = 6, 40
        A = rng.normal(size=(nx, nx))
        Ks = A @ A.T + nx * np.eye(nx)
        t = np.arange(nt) * 1.0
        dt = t[:, None] - t[None, :]

        def make_kt(ell):
            return np.exp(-0.5 * (dt / ell) ** 2) + 0.3 * np.exp(-np.abs(dt) / 2.0)

        q0t = np.asarray(kronlik.comp_eig_d(jnp.asarray(Ks), jnp.asarray(make_kt(8.0)), 0.1).qt)
        # evaluate far from the center: the result must still be exact
        for ell in (8.0, 10.0, 4.0, 20.0):
            Kt = make_kt(ell)
            plain = kronlik.comp_eig_d(jnp.asarray(Ks), jnp.asarray(Kt), 0.1)
            pre = kronlik.comp_eig_d_preconditioned(
                jnp.asarray(Ks), jnp.asarray(Kt), 0.1, jnp.asarray(q0t)
            )
            assert np.allclose(np.asarray(pre.lam_t), np.asarray(plain.lam_t), atol=1e-9)
            # eigenvectors may differ by sign/degenerate rotation; compare
            # the reconstructed kernel instead
            recon = np.asarray(pre.qt) @ np.diag(np.asarray(pre.lam_t)) @ np.asarray(pre.qt).T
            assert np.allclose(recon, Kt, atol=1e-8)

    def test_model_loglik_invariant(self, rng):
        nx, nt = 6, 12
        x = (np.arange(nx) * 100.0).reshape(-1, 1)
        t = np.arange(nt).reshape(-1, 1) * 1.0
        m = g.GPCSD1D(rng.normal(size=(nx, nt, 3)), x, t, ngl=20)
        m.R["value"] = 120.0
        m.spatial_cov.params["ell"]["value"] = 180.0
        m.temporal_cov_list[0].params["ell"]["value"] = 4.0
        m.temporal_cov_list[0].params["sigma2"]["value"] = 0.8
        m.temporal_cov_list[1].params["ell"]["value"] = 1.5
        m.temporal_cov_list[1].params["sigma2"]["value"] = 0.4
        m.sig2n["value"] = 0.05
        fns_plain = m._fns()
        fns_pre = m._fns(precondition=True)
        Y = m._Y()
        th = m._theta()
        ll_plain = float(fns_plain.loglik(th, Y))
        ll_pre = float(fns_pre.loglik(th, Y))
        assert np.allclose(ll_plain, ll_pre, rtol=1e-10)
        # and at a different theta (away from the preconditioning center)
        th2 = dict(th)
        th2["tm0_ell"] = jnp.asarray(8.0)
        th2["R"] = jnp.asarray(200.0)
        assert np.allclose(
            float(fns_plain.loglik(th2, Y)), float(fns_pre.loglik(th2, Y)), rtol=1e-10
        )
        # gradients agree too
        u = fns_plain.param_set.pack(th)
        g1 = np.asarray(jax.grad(fns_plain.log_prob)(u, Y))
        g2 = np.asarray(jax.grad(fns_pre.log_prob)(u, Y))
        assert np.allclose(g1, g2, rtol=1e-8, atol=1e-10)
