"""Posterior variance: factored computation vs the dense GP formula."""

import numpy as np
import pytest

import gpcsd_tpu as g


@pytest.fixture
def model(rng):
    nx, nt = 6, 10
    x = (np.arange(nx) * 100.0).reshape(-1, 1)
    t = np.arange(nt).reshape(-1, 1) * 1.0
    m = g.GPCSD1D(rng.normal(size=(nx, nt, 2)), x, t, ngl=24)
    m.R["value"] = 120.0
    m.spatial_cov.params["ell"]["value"] = 180.0
    m.temporal_cov_list[0].params["ell"]["value"] = 4.0
    m.temporal_cov_list[0].params["sigma2"]["value"] = 0.8
    m.temporal_cov_list[1].params["ell"]["value"] = 1.5
    m.temporal_cov_list[1].params["sigma2"]["value"] = 0.4
    m.sig2n["value"] = 0.05
    return m


class TestPosteriorVariance:
    def test_matches_dense_formula(self, model):
        z = np.linspace(50, 450, 5).reshape(-1, 1)
        var = model.predict_variance(z, model.t, type="csd")
        nx, nt = 6, 10

        Ks = np.asarray(model.spatial_cov.compKphi_1d(model.R["value"])) + 1e-8 * np.eye(nx)
        Kt = sum(np.asarray(tc.compute_Kt()) for tc in model.temporal_cov_list)
        dense = np.kron(Ks, Kt) + model.sig2n["value"] * np.eye(nx * nt)
        Kinv = np.linalg.inv(dense)
        Kphig = np.asarray(model.spatial_cov.compKphig_1d(z, model.R["value"]))
        sig_t_tot = sum(tc.params["sigma2"]["value"] for tc in model.temporal_cov_list)
        for i in range(z.shape[0]):
            for j in range(nt):
                c = np.kron(Kphig[:, i], Kt[:, j])
                want = 1.0 * sig_t_tot - c @ Kinv @ c
                assert np.allclose(var[i, j], want, rtol=1e-6, atol=1e-8), (i, j)

    def test_variance_positive_and_shrinks_near_data(self, model):
        z = np.linspace(0, 500, 6).reshape(-1, 1)
        var = model.predict_variance(z, model.t, type="csd")
        assert var.shape == (6, 10)
        assert (var > 0).all()
        prior = sum(tc.params["sigma2"]["value"] for tc in model.temporal_cov_list)
        assert var.max() < prior  # conditioning reduces variance

    def test_lfp_variance(self, model):
        z = np.linspace(0, 500, 4).reshape(-1, 1)
        var = model.predict_variance(z, model.t, type="lfp")
        assert var.shape == (4, 10)
        assert np.isfinite(var).all()
