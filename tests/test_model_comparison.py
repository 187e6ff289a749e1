"""WAIC / PSIS-LOO model comparison (`gpcsd_tpu.infer.model_comparison`).

Validation strategy: exact-math checks on the estimators (conjugate
normal-normal, where leave-one-out predictive densities are analytic),
then an end-to-end GPCSD check that the criteria prefer the data-generating
covariance stack over a mis-specified one — the fully-Bayesian version of
the reference's sim_from_gp_1D_mismatch MSE comparison.
"""

import numpy as np
import pytest

from gpcsd_tpu.infer import model_comparison as mc


def _normal_logpdf(y, mu, var):
    return -0.5 * (np.log(2 * np.pi * var) + (y - mu) ** 2 / var)


class TestEstimators:
    def test_waic_pointwise_math(self, rng):
        ll = rng.normal(size=(200, 7))
        out = mc.waic(ll)
        lppd = np.sum(
            np.log(np.mean(np.exp(ll - ll.max(0)), axis=0)) + ll.max(0)
        )
        assert np.isclose(out["elpd_waic"], lppd - ll.var(0, ddof=1).sum())
        assert np.isclose(out["waic"], -2 * out["elpd_waic"])

    def test_psislw_normalized_and_truncated(self, rng):
        lr = rng.normal(size=(800, 5))
        lw, k = mc.psislw(lr)
        from scipy.special import logsumexp

        np.testing.assert_allclose(logsumexp(lw, axis=0), 0.0, atol=1e-8)
        assert lw.max() <= 1e-12  # log-weights never exceed 0
        assert np.all(k < 0.7)  # iid normal ratios are light-tailed

    def test_gpdfit_recovers_k(self, rng):
        # draws from a generalized Pareto with known k
        k_true, sigma = 0.3, 1.0
        u = rng.uniform(size=4000)
        x = np.sort(sigma * ((1 - u) ** (-k_true) - 1) / k_true)
        k_hat, sigma_hat = mc._gpdfit(x)
        assert abs(k_hat - k_true) < 0.1
        assert abs(sigma_hat - sigma) < 0.15

    def test_loo_matches_analytic_conjugate(self, rng):
        """Normal-normal: y_i ~ N(mu, s2), mu ~ N(0, t2).  Exact LOO
        predictive p(y_i | y_-i) is analytic; PSIS-LOO from posterior
        draws must agree within Monte-Carlo error."""
        n, s2, t2 = 20, 1.0, 4.0
        y = rng.normal(loc=1.2, scale=np.sqrt(s2), size=n)

        def posterior(yv):
            m = yv.size
            var = 1.0 / (m / s2 + 1.0 / t2)
            return var * yv.sum() / s2, var

        S = 8000
        mu_hat, var_hat = posterior(y)
        draws = rng.normal(mu_hat, np.sqrt(var_hat), size=S)
        ll = _normal_logpdf(y[None, :], draws[:, None], s2)
        out = mc.psis_loo(ll)
        exact = 0.0
        for i in range(n):
            m_i, v_i = posterior(np.delete(y, i))
            exact += _normal_logpdf(y[i], m_i, v_i + s2)
        assert abs(out["elpd_loo"] - exact) < 0.25, (out["elpd_loo"], exact)
        assert np.all(out["pareto_k"] < 0.7)
        # p_loo should be near the effective parameter count (1 here)
        assert 0.3 < out["p_loo"] < 2.5

    def test_compare_ranks_and_se(self, rng):
        llA = rng.normal(size=(300, 40))
        llB = llA - 0.5  # uniformly worse
        res = {"A": mc.waic(llA), "B": mc.waic(llB)}
        ranked = mc.compare(res)
        assert ranked[0][0] == "A" and ranked[1][0] == "B"
        assert ranked[0][2] == 0.0
        assert ranked[1][2] < 0  # elpd deficit
        assert ranked[1][3] >= 0


class TestGPCSDIntegration:
    @pytest.fixture(scope="class")
    def fitted_models(self):
        """Data from an SE+Matern stack; matched vs SE-only models with
        SMC posteriors (fast, deterministic seeds)."""
        import gpcsd_tpu as g
        from gpcsd_tpu.models.covariances import (
            GPCSDTemporalCovSE,
            GPCSDTemporalCovMatern,
        )
        from gpcsd_tpu.ops.forward import fwd_model_1d

        rng = np.random.default_rng(11)
        nx, nt, ntr = 8, 24, 16
        x = (np.arange(nx) * 100.0).reshape(-1, 1)
        t = np.arange(nt).reshape(-1, 1) * 1.0
        gen = g.GPCSD1D(np.zeros((nx, nt, 1)), x, t, ngl=24)
        gen.R["value"] = 150.0
        gen.spatial_cov.params["ell"]["value"] = 200.0
        gen.temporal_cov_list[0].params["ell"]["value"] = 7.0
        gen.temporal_cov_list[0].params["sigma2"]["value"] = 0.4
        # strong rough (Matern) component: the SE-only model cannot track it
        gen.temporal_cov_list[1].params["ell"]["value"] = 1.5
        gen.temporal_cov_list[1].params["sigma2"]["value"] = 1.0
        csd = gen.sample_prior(ntr, seed=3)
        lfp = np.array(
            np.moveaxis(
                np.asarray(
                    fwd_model_1d(np.moveaxis(csd, 2, 0), x.ravel(), x.ravel(), 150.0)
                ),
                0,
                2,
            )
        )
        lfp /= np.max(np.abs(lfp))
        lfp += 0.02 * rng.normal(size=lfp.shape)

        matched = g.GPCSD1D(lfp, x, t, ngl=24)
        se_only = g.GPCSD1D(
            lfp, x, t, ngl=24,
            temporal_cov_list=[GPCSDTemporalCovSE(t)],
        )
        for m in (matched, se_only):
            m.smc(n_particles=96, n_mutation_steps=4, seed=0)
        return matched, se_only

    def test_criteria_finite_and_prefer_matched(self, fitted_models):
        matched, se_only = fitted_models
        icA = matched.information_criteria(max_draws=96, batch=8)
        icB = se_only.information_criteria(max_draws=96, batch=8)
        for ic in (icA, icB):
            assert np.isfinite(ic["waic"]["elpd_waic"])
            assert np.isfinite(ic["loo"]["elpd_loo"])
        ranked = mc.compare({"matched": icA["loo"], "se_only": icB["loo"]})
        assert ranked[0][0] == "matched"
        # decisive preference: deficit clearly exceeds its SE
        name, _, d, se = ranked[1]
        assert d < 0 and abs(d) > 2 * max(se, 1e-9), (d, se)

    def test_requires_posterior(self):
        import gpcsd_tpu as g

        m = g.GPCSD1D(
            np.zeros((4, 8, 2)),
            (np.arange(4) * 100.0).reshape(-1, 1),
            np.arange(8.0).reshape(-1, 1),
            ngl=12,
        )
        with pytest.raises(RuntimeError):
            m.information_criteria()
