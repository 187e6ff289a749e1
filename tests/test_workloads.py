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

    def test_kcsd_protocol(self):
        """Reference kCSD train/test protocol in its workload context
        (sim_from_gp_1D.py:112-127, 197-203): GPCSD beats CV'd kCSD on
        per-trial MSE."""
        from workloads.sim_from_gp_1d import run

        metrics, _ = run(ntrials=12, nt=30, fix=True, seed=3, kcsd=True)
        assert metrics["gpcsd_mse_mean"] < metrics["kcsd_mse_mean"]
        assert metrics["paired_p_gp_vs_kcsd"] < 0.05
        assert np.isfinite(metrics["kcsd_R"]) and metrics["kcsd_lambda"] > 0


class TestMismatch:
    def test_correct_model_not_worse(self):
        from workloads.sim_from_gp_1d_mismatch import run

        m = run(ntrials=10, nt=24, n_restarts=2, seed=5)
        assert m["mse_2comp_fit2"] < 0.05
        assert m["mse_2comp_fit1"] < 0.5  # misspecified still sane
        # fully-Bayesian stack selection agrees with the ground truth
        assert m["loo_best_stack"] == "2comp"
        assert np.isfinite(m["loo_elpd_1comp"]) and np.isfinite(
            m["loo_elpd_2comp"]
        )


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
        # evoked kCSD comparison (reference :113-115): GPCSD should recover
        # the true evoked CSD at least as well as cross-validated kCSD
        assert m["gpcsd_evoked_corr"] > 0.7
        assert m["gpcsd_evoked_corr"] >= m["kcsd_evoked_corr"] - 0.05

    def test_real_data_mode(self, tmp_path):
        """Reference-format text data + stage-1 pickle restore
        (reference fit_mean_function.py:55-128)."""
        from gpcsd_tpu.ops.forward import fwd_model_1d
        from workloads.auditory_lfp import A, B, NX, fit_probe
        from workloads.fit_mean_function import _template_components, run_real

        rng = np.random.default_rng(0)
        ntime, ntrials = 120, 8
        time_s = (np.arange(ntime) - 60) / 1000.0
        t_ms = time_s * 1000.0
        x = np.linspace(A, B, NX)
        z = np.linspace(A, B, 60)
        comps = _template_components(z, np.clip(t_ms, 0.0, None))
        csd = (comps[0] + comps[1]) * (t_ms >= 0)[None, :]
        lfp_e = np.asarray(fwd_model_1d(csd, z, x, 150.0))
        lfp = lfp_e[:, :, None] + 0.05 * np.max(np.abs(lfp_e)) * (
            rng.standard_normal((NX, ntime, ntrials))
        )
        data = tmp_path / "aud"
        data.mkdir()
        np.savetxt(data / "time.txt", time_s)
        for probe in ("lateral", "medial"):
            for i in range(NX):
                np.savetxt(data / f"{probe}_electrode{i + 1}.txt", 100.0 * lfp[i])

        # stage-1 pickle written by a quick baseline-style fit
        stage1 = tmp_path / "stage1"
        stage1.mkdir()
        widx = (t_ms >= 0) & (t_ms <= 150.0)
        fit_probe(lfp[:, widx, :], t_ms[widx], n_restarts=1, seed=0,
                  cache=str(stage1 / "gpcsd_model_lateral.pkl"))

        m, results = run_real(str(data), stage1_dir=str(stage1),
                              n_restarts=1, gdx=50.0, probes=("lateral",))
        assert m["lateral_stage1_restored"] is True
        assert np.isfinite(m["lateral_kcsd_gpcsd_corr"])
        assert m["lateral_n_segments"] >= 1
        assert 0.0 <= m["lateral_converged_frac"] <= 1.0


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
