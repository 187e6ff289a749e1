"""Smoke/quality tests for the workload pipelines (tiny configs).

These are the integration tier of the test pyramid (SURVEY.md §4): each
reference paper pipeline runs end-to-end at reduced size and must hit
quality gates (R^2, baseline superiority) with MC-tolerant thresholds.
"""

import numpy as np
import pytest


class TestSimpleTemplate:
    def test_recovers_template_and_beats_tcsd(self):
        from workloads.simple_template_1d import run

        metrics, _ = run(n_restarts=3, deltaz=100.0, nt=25, seed=1)
        assert metrics["white_noise_gpcsd_r2"] > 0.9
        assert metrics["white_noise_gpcsd_mse"] < metrics["white_noise_tcsd_mse"]
        assert 50 < metrics["white_noise_fitted_R"] < 600


class TestSimFromGP1D:
    def test_beats_tcsd_significantly(self):
        from workloads.sim_from_gp_1d import run

        metrics, _ = run(ntrials=15, nt=30, n_restarts=2, seed=3)
        assert metrics["gpcsd_mse_mean"] < metrics["tcsd_mse_mean"]
        assert metrics["paired_p_gp_vs_tcsd"] < 0.01
        assert metrics["gpcsd_r2_mean"] > 0.8

    def test_oracle_mode(self):
        from workloads.sim_from_gp_1d import run

        metrics, _ = run(ntrials=10, nt=30, fix=True, seed=3)
        assert metrics["gpcsd_r2_mean"] > 0.85
        assert metrics["fitted_R"] == 100.0  # injected truth untouched


class TestMismatch:
    def test_correct_model_not_worse(self):
        from workloads.sim_from_gp_1d_mismatch import run

        m = run(ntrials=10, nt=24, n_restarts=2, seed=5)
        assert m["mse_2comp_fit2"] < 0.05
        assert m["mse_2comp_fit1"] < 0.5  # misspecified still sane


class TestSim2D:
    def test_oracle_quality(self):
        from workloads.sim_from_gp_2d import run

        m, _ = run(nt=10, nz1=8, nz2=30, nx2=10, ngl1=8, ngl2=16,
                   n_restarts=2, ntrials=2, seed=2)
        assert m["oracle_r2"] > 0.6
        assert np.isfinite(m["fitted_rmse"])


class TestAuditorySurrogate:
    def test_pipeline_end_to_end(self):
        from workloads.auditory_lfp import run

        m, phases, tg = run(n_restarts=2, nboot=2, ntime=120, ntrials=20, seed=4)
        assert m["source"] == "surrogate"
        assert phases["lateral"]["csd"].shape[0] == 24
        assert np.isfinite(np.asarray(tg.pvals)).all()
        assert 0 <= m["tg_edges_bonf_001"] <= 1128


class TestFitMeanFunction:
    def test_pipeline_end_to_end(self):
        from workloads.fit_mean_function import run

        m, res, tau_true = run(nt=50, ntrials=30, n_restarts=3, seed=1)
        assert m["n_segments"] >= 2
        # at least one estimated component must track a true injected shift
        assert m["best_match_shift_corr_max"] > 0.25
        assert np.isfinite(res.tau).all()


class TestNeuropixelsSurrogate:
    def test_outlier_rejection(self, rng):
        from workloads.neuropixels import outlier_trials

        lfp = rng.normal(size=(10, 20, 30))
        lfp[:, :, 3] *= 12.0
        keep = outlier_trials(lfp)
        assert not keep[3]
        assert keep.sum() >= 25

    def test_pipeline_end_to_end(self):
        from workloads.neuropixels import run

        m = run(n_restarts=1, ngl1=6, ngl2=16, nt=60, ntrials=12, seed=6,
                nboot=2)
        assert m["source"] == "surrogate"
        assert m["probeC_csd_pred_shape"] == [4, 60, m["probeC_trials_kept"]]
        assert np.isfinite(m["probeC_R"])
        # TG fit + bootstrap per band x time (reference fit_torus_graph.py)
        for tag in ("tg_3_7_t0", "tg_3_7_t70", "tg_15_25_t0", "tg_15_25_t70"):
            assert f"{tag}_edges_bonf" in m
            w = m[f"{tag}_pplv_ci_width_mean"]
            assert np.isfinite(w) and 0.0 <= w <= 1.0
