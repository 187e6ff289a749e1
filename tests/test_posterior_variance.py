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


class TestPosteriorVariance2D:
    def test_2d_variance_sane(self, rng):
        from gpcsd_tpu.utils.grids import expand_grid

        x = expand_grid(np.arange(3) * 40.0, np.arange(8) * 50.0)
        t = np.arange(8).reshape(-1, 1) * 1.0
        m = g.GPCSD2D(rng.normal(size=(24, 8, 2)), x, t, ngl1=8, ngl2=16)
        m.R["value"] = 60.0
        m.spatial_cov.params["ell1"]["value"] = 50.0
        m.spatial_cov.params["ell2"]["value"] = 80.0
        m.temporal_cov_list[0].params["ell"]["value"] = 4.0
        m.temporal_cov_list[0].params["sigma2"]["value"] = 0.7
        m.temporal_cov_list[1].params["ell"]["value"] = 1.5
        m.temporal_cov_list[1].params["sigma2"]["value"] = 0.3
        m.sig2n["value"] = 0.1
        z = x[:5] + 3.0
        var = m.predict_variance(z, m.t, type="csd")
        assert var.shape == (5, 8)
        assert (var > 0).all()
        assert var.max() < 1.0  # prior var = sum sigma2 = 1.0
        var_lfp = m.predict_variance(z, m.t, type="lfp")
        assert np.isfinite(var_lfp).all()


class TestMatheronSamples:
    def test_moments_match_analytic(self, model):
        """Pathwise-conditioned draws must reproduce the analytic posterior
        mean and pointwise variance within MC error."""
        z = np.linspace(50, 450, 5).reshape(-1, 1)
        model.predict(z, model.t, type="csd")
        mean_analytic = model.csd_pred[:, :, 0]
        var_analytic = model.predict_variance(z, model.t, type="csd")
        draws = model.predict_samples(z, model.t, n_draws=600, seed=3, trial=0)
        assert draws.shape == (600, 5, 10)
        mc_mean = draws.mean(axis=0)
        mc_var = draws.var(axis=0)
        se = np.sqrt(var_analytic / 600)
        assert np.all(np.abs(mc_mean - mean_analytic) < 5 * se + 1e-3)
        assert np.allclose(mc_var, var_analytic, rtol=0.35, atol=5e-3)


class TestMatheronSamplesRFF:
    def test_rff_moments_match_analytic(self, model):
        """Random-Fourier-feature prior draws: posterior moments still match
        the analytic mean/variance (looser tolerance — the prior kernel
        carries the O(1/sqrt(M)) feature approximation)."""
        z = np.linspace(50, 450, 5).reshape(-1, 1)
        model.predict(z, model.t, type="csd")
        mean_analytic = model.csd_pred[:, :, 0]
        var_analytic = model.predict_variance(z, model.t, type="csd")
        draws = model.predict_samples(z, model.t, n_draws=600, seed=3, trial=0,
                                      method="rff", n_features=4096)
        assert draws.shape == (600, 5, 10)
        se = np.sqrt(var_analytic / 600)
        assert np.all(np.abs(draws.mean(0) - mean_analytic) < 6 * se + 5e-3)
        assert np.allclose(draws.var(0), var_analytic, rtol=0.45, atol=1e-2)

    def test_2d_neuropixels_scale_auto_selects_rff(self, rng):
        """The Neuropixels quadrature configuration (ngl 30x120 = 3600 union
        points) routes through the RFF path and stays finite — the exact
        path's union Cholesky is numerically rank-deficient there."""
        from gpcsd_tpu.utils.grids import expand_grid

        x = expand_grid(np.arange(3) * 40.0, np.arange(23) * 40.0)  # 69 sites
        t = np.arange(12).reshape(-1, 1) * 1.0
        m = g.GPCSD2D(rng.normal(size=(69, 12, 2)) * 0.5, x, t, ngl1=30, ngl2=120)
        m.R["value"] = 60.0
        m.spatial_cov.params["ell1"]["value"] = 40.0
        m.spatial_cov.params["ell2"]["value"] = 100.0
        m.temporal_cov_list[0].params["ell"]["value"] = 4.0
        m.temporal_cov_list[0].params["sigma2"]["value"] = 0.7
        m.temporal_cov_list[1].params["ell"]["value"] = 1.5
        m.temporal_cov_list[1].params["sigma2"]["value"] = 0.3
        m.sig2n["value"] = 0.1
        z = x[:6] + 5.0
        draws = m.predict_samples(z, m.t, n_draws=8, seed=1, trial=0,
                                  n_features=1024)  # method="auto" -> rff
        assert draws.shape == (8, 6, 12)
        assert np.isfinite(draws).all()
        # sanity: spread is in the posterior ballpark, not prior-sized blowup
        var = m.predict_variance(z, m.t, type="csd")
        assert float(draws.var(0).mean()) < 4.0 * float(var.mean()) + 1.0


class TestMatheronSamplesOffGrid:
    def test_moments_match_analytic_at_off_grid_times(self, model):
        """predict_samples at t* != data grid (union-time-grid joint prior):
        MC mean/variance match predict / predict_variance at those times."""
        z = np.linspace(50, 450, 4).reshape(-1, 1)
        tstar = np.array([0.5, 3.25, 7.75, 9.5])  # strictly off-grid
        model.predict(z, tstar.reshape(-1, 1), type="csd")
        mean_analytic = model.csd_pred[:, :, 0]
        var_analytic = model.predict_variance(z, tstar, type="csd")
        draws = model.predict_samples(z, tstar, n_draws=600, seed=7, trial=0)
        assert draws.shape == (600, 4, 4)
        se = np.sqrt(var_analytic / 600)
        assert np.all(np.abs(draws.mean(0) - mean_analytic) < 5 * se + 1e-3)
        assert np.allclose(draws.var(0), var_analytic, rtol=0.35, atol=5e-3)

    def test_overlapping_times_stable(self, model):
        """t* overlapping data times duplicates rows in the union temporal
        kernel; the relative jitter must keep the Cholesky finite."""
        tstar = np.array([2.0, 5.0, 6.5])  # 2.0 and 5.0 are data times
        z = np.linspace(100, 400, 3).reshape(-1, 1)
        draws = model.predict_samples(z, tstar, n_draws=50, seed=2, trial=0)
        assert draws.shape == (50, 3, 3)
        assert np.isfinite(draws).all()


class TestMatheronSamples2D:
    def test_moments_match_analytic_2d(self, rng):
        from gpcsd_tpu.utils.grids import expand_grid

        x = expand_grid(np.arange(3) * 40.0, np.arange(6) * 50.0)
        t = np.arange(8).reshape(-1, 1) * 1.0
        m = g.GPCSD2D(rng.normal(size=(18, 8, 2)) * 0.5, x, t, ngl1=6, ngl2=12)
        m.R["value"] = 60.0
        m.spatial_cov.params["ell1"]["value"] = 50.0
        m.spatial_cov.params["ell2"]["value"] = 80.0
        m.temporal_cov_list[0].params["ell"]["value"] = 4.0
        m.temporal_cov_list[0].params["sigma2"]["value"] = 0.7
        m.temporal_cov_list[1].params["ell"]["value"] = 1.5
        m.temporal_cov_list[1].params["sigma2"]["value"] = 0.3
        m.sig2n["value"] = 0.1
        z = x[:4] + 5.0
        m.predict(z, m.t, type="csd")
        mean_analytic = m.csd_pred[:, :, 0]
        var_analytic = m.predict_variance(z, m.t, type="csd")
        draws = m.predict_samples(z, m.t, n_draws=500, seed=5, trial=0)
        assert draws.shape == (500, 4, 8)
        se = np.sqrt(var_analytic / 500)
        assert np.all(np.abs(draws.mean(0) - mean_analytic) < 5 * se + 5e-3)
        assert np.allclose(draws.var(0), var_analytic, rtol=0.4, atol=1e-2)

        # off-grid prediction times through the union-time-grid path
        tstar = np.array([0.5, 3.25, 6.75])
        m.predict(z, tstar.reshape(-1, 1), type="csd")
        mean_og = m.csd_pred[:, :, 0]
        var_og = m.predict_variance(z, tstar, type="csd")
        draws_og = m.predict_samples(z, tstar, n_draws=500, seed=6, trial=0)
        assert draws_og.shape == (500, 4, 3)
        se_og = np.sqrt(var_og / 500)
        assert np.all(np.abs(draws_og.mean(0) - mean_og) < 5 * se_og + 5e-3)
        assert np.allclose(draws_og.var(0), var_og, rtol=0.4, atol=1e-2)
