"""Amplitude reparameterization (models/reparam.py): the round-4 paper
run's pooled covariance names a curved forward-amplitude ridge
(0.67 tm0_sigma2 - 0.53 R + 0.33 tm1_sigma2 in log space); sampling with
the mean per-channel LFP signal variance as an axis removes it at the
source.  These tests pin the bijection, its unimodularity, the physical
meaning of the amplitude coordinate, and posterior invariance through
``sample_posterior(reparam="amplitude")``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _model(rng, nx=8, nt=24, ntrials=6):
    import gpcsd_tpu as g

    x = (np.arange(nx) * 100.0).reshape(-1, 1)
    t = np.arange(float(nt)).reshape(-1, 1)
    lfp = rng.normal(size=(nx, nt, ntrials))
    m = g.GPCSD1D(lfp, x, t, ngl=20)
    m.R["value"] = 150.0
    m.spatial_cov.params["ell"]["value"] = 200.0
    m.temporal_cov_list[0].params["ell"]["value"] = 8.0
    m.temporal_cov_list[0].params["sigma2"]["value"] = 1.2
    m.temporal_cov_list[1].params["ell"]["value"] = 3.0
    m.temporal_cov_list[1].params["sigma2"]["value"] = 0.4
    m.sig2n["value"] = 0.05
    return m


class TestAmplitudeReparam:
    def test_bijection_roundtrip(self, rng):
        from gpcsd_tpu.models.reparam import AmplitudeReparam

        m = _model(rng)
        fns = m._fns()
        rp = AmplitudeReparam(fns)
        u0 = jnp.asarray(fns.param_set.pack(m._theta()))
        for _ in range(5):
            u = u0 + jnp.asarray(rng.normal(size=u0.shape))
            v = rp.forward(u)
            u_back = rp.inverse(v)
            np.testing.assert_allclose(
                np.asarray(u_back), np.asarray(u), rtol=0, atol=1e-12
            )
            # and the other direction
            np.testing.assert_allclose(
                np.asarray(rp.forward(u_back)), np.asarray(v), atol=1e-12
            )

    def test_unimodular_jacobian(self, rng):
        from gpcsd_tpu.models.reparam import AmplitudeReparam

        m = _model(rng)
        fns = m._fns()
        rp = AmplitudeReparam(fns)
        u = jnp.asarray(fns.param_set.pack(m._theta()))
        J = np.asarray(jax.jacobian(rp.forward)(u), dtype=np.float64)
        sign, logdet = np.linalg.slogdet(J)
        assert abs(logdet) < 1e-10, logdet

    def test_amplitude_coordinate_semantics(self, rng):
        """exp(v_P) == (tr Ks / nx) * (sigma2_0 + sigma2_1): the exact
        mean per-channel LFP-space signal variance."""
        from gpcsd_tpu.models.reparam import AmplitudeReparam

        m = _model(rng)
        fns = m._fns()
        rp = AmplitudeReparam(fns)
        theta = m._theta()
        u = jnp.asarray(fns.param_set.pack(theta))
        v = rp.forward(u)
        v_P = float(v[rp._s_offsets[0]])
        Ks = np.asarray(fns.build_ks(theta))
        expect = (np.trace(Ks) / Ks.shape[0]) * (1.2 + 0.4)
        np.testing.assert_allclose(np.exp(v_P), expect, rtol=1e-9)

    def test_ridge_direction_flattened(self, rng):
        """Moving along the forward-amplitude trade-off (sigma2 up, the
        amplitude coordinate fixed) changes v_P by 0 by construction;
        conversely a pure amplitude change moves ONLY v_P among the
        transformed coordinates."""
        from gpcsd_tpu.models.reparam import AmplitudeReparam

        m = _model(rng)
        fns = m._fns()
        rp = AmplitudeReparam(fns)
        u = np.asarray(fns.param_set.pack(m._theta()))
        # scale both sigma2's by c: v_P moves by log c, ratios untouched
        u2 = u.copy()
        for o in rp._s_offsets:
            u2[o] += np.log(3.0)
        dv = np.asarray(rp.forward(jnp.asarray(u2))) - np.asarray(
            rp.forward(jnp.asarray(u))
        )
        np.testing.assert_allclose(dv[rp._s_offsets[0]], np.log(3.0),
                                   rtol=1e-9)
        others = np.delete(dv, rp._s_offsets[0])
        assert np.max(np.abs(others)) < 1e-9

    def test_sample_posterior_reparam_invariance(self, rng):
        """reparam='amplitude' must sample the SAME posterior: compare
        moments against the plain path on a small model (both healthy,
        loose MC tolerance)."""
        m = _model(rng, nx=6, nt=16, ntrials=4)
        m.fit(n_restarts=2, seed=0, options={"maxiter": 60})
        kw = dict(n_chains=2, num_warmup=60, num_samples=120, seed=3,
                  chunk_size=20, max_depth=6)
        p_plain = m.sample_posterior(**kw)
        p_rep = m.sample_posterior(**kw, reparam="amplitude")
        for k in ("R", "ell", "tm0_sigma2", "tm1_sigma2"):
            a = np.log(np.asarray(p_plain.theta[k], dtype=np.float64))
            b = np.log(np.asarray(p_rep.theta[k], dtype=np.float64))
            # agreement within a few combined MC sds
            se = np.sqrt(a.var() / max(len(a) / 8, 1)
                         + b.var() / max(len(b) / 8, 1))
            assert abs(a.mean() - b.mean()) < 4 * max(se, 1e-3), (
                k, a.mean(), b.mean(), se,
            )

    def test_rejects_unknown_and_mesh(self, rng):
        m = _model(rng)
        with pytest.raises(ValueError, match="unknown reparam"):
            m.sample_posterior(num_warmup=2, num_samples=2, reparam="bogus")
