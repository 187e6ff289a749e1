"""Model-mismatch robustness study.

Parity target: ``/root/reference/simulation_studies/sim_from_gp_1D_mismatch.py``
— generate from a 2-component temporal model and fit a 1-component model
with per-channel noise; generate from 3 components and fit 2; report CSD
recovery MSE under misspecification.

Run: ``python -m workloads.sim_from_gp_1d_mismatch [--quick]``
"""

from __future__ import annotations

import argparse

import numpy as np

import gpcsd_tpu as g
from gpcsd_tpu.models.covariances import GPCSDTemporalCovMatern, GPCSDTemporalCovSE
from gpcsd_tpu.ops.forward import fwd_model_1d

from .common import mse, report


def _generate(x, t, ntrials, temporal_params, seed):
    """temporal_params: list of (kind, ell, sigma2)."""
    covs = []
    for kind, ell, s2 in temporal_params:
        tc = (GPCSDTemporalCovSE if kind == "se" else GPCSDTemporalCovMatern)(t.reshape(-1, 1))
        tc.params["ell"]["value"] = ell
        tc.params["sigma2"]["value"] = s2
        covs.append(tc)
    gen = g.GPCSD1D(
        np.zeros((x.size, t.size, 1)), x.reshape(-1, 1), t.reshape(-1, 1),
        temporal_cov_list=covs,
    )
    gen.R["value"] = 100.0
    gen.spatial_cov.params["ell"]["value"] = 200.0
    gen.sig2n["value"] = 1e-4
    csd = gen.sample_prior(ntrials, seed=seed)
    lfp = np.moveaxis(
        np.asarray(fwd_model_1d(np.moveaxis(csd, 2, 0), x, x, 100.0)), 0, 2
    )
    lfp = lfp / np.max(np.abs(lfp))
    rng = np.random.default_rng(seed + 7)
    lfp = lfp + 1e-2 * rng.normal(size=lfp.shape)
    return csd, lfp


def _fit_and_score(x, t, lfp, csd_true, n_components, n_restarts, per_channel, seed):
    covs = [GPCSDTemporalCovSE(t.reshape(-1, 1))]
    if n_components >= 2:
        covs.append(GPCSDTemporalCovMatern(t.reshape(-1, 1)))
    sig2n_prior = [g.HalfNormal(0.1) for _ in range(x.size)] if per_channel else None
    model = g.GPCSD1D(
        lfp, x.reshape(-1, 1), t.reshape(-1, 1),
        temporal_cov_list=covs, sig2n_prior=sig2n_prior,
    )
    model.fit(n_restarts=n_restarts, seed=seed)
    model.predict(x.reshape(-1, 1), t.reshape(-1, 1))

    def norm(v):
        return v / np.max(np.abs(v), axis=(0, 1), keepdims=True)

    return float(mse(norm(model.csd_pred), norm(csd_true)))


def _loo_compare(x, t, lfp, n_restarts, seed, n_particles=128):
    """Fully-Bayesian stack selection (beyond-reference): SMC posteriors
    for the 1- and 2-component temporal stacks, ranked by PSIS-LOO
    (``gpcsd_tpu.infer.model_comparison``) — the posterior-predictive
    version of this workload's MSE comparison."""
    from gpcsd_tpu.infer import model_comparison as mc

    ics = {}
    for ncomp in (1, 2):
        covs = [GPCSDTemporalCovSE(t.reshape(-1, 1))]
        if ncomp >= 2:
            covs.append(GPCSDTemporalCovMatern(t.reshape(-1, 1)))
        model = g.GPCSD1D(
            lfp, x.reshape(-1, 1), t.reshape(-1, 1), temporal_cov_list=covs
        )
        model.smc(n_particles=n_particles, n_mutation_steps=4, seed=seed)
        ics["%dcomp" % ncomp] = model.information_criteria(
            method="loo", max_draws=n_particles
        )["loo"]
    ranked = mc.compare(ics)
    return {
        "loo_best_stack": ranked[0][0],
        "loo_elpd_1comp": ics["1comp"]["elpd_loo"],
        "loo_elpd_2comp": ics["2comp"]["elpd_loo"],
        "loo_d_elpd_runnerup": ranked[1][2],
        "loo_d_se_runnerup": ranked[1][3],
        "loo_max_pareto_k": float(
            max(ics[k]["pareto_k"].max() for k in ics)
        ),
    }


def run(ntrials=50, nt=50, nx=24, n_restarts=5, seed=11, results_dir=None):
    x = np.linspace(0, 2300, nx)
    t = np.linspace(0, 50, nt)

    # 2-component truth, 1-component fit with per-channel noise
    csd2, lfp2 = _generate(
        x, t, ntrials, [("se", 20.0, 0.5), ("matern", 5.0, 0.7)], seed
    )
    mse_2to1 = _fit_and_score(x, t, lfp2, csd2, 1, n_restarts, True, seed)
    mse_2to2 = _fit_and_score(x, t, lfp2, csd2, 2, n_restarts, False, seed)

    # 3-component truth, 2-component fit
    csd3, lfp3 = _generate(
        x, t, ntrials,
        [("se", 30.0, 0.4), ("se", 10.0, 0.4), ("matern", 3.0, 0.6)], seed + 1,
    )
    mse_3to2 = _fit_and_score(x, t, lfp3, csd3, 2, n_restarts, False, seed + 1)

    metrics = {
        "mse_2comp_fit1": mse_2to1,
        "mse_2comp_fit2": mse_2to2,
        "mse_3comp_fit2": mse_3to2,
    }
    metrics.update(_loo_compare(x, t, lfp2, n_restarts, seed))
    report("sim_from_gp_1d_mismatch", metrics, results_dir)
    return metrics


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--results-dir", default=None)
    args = p.parse_args()
    if args.quick:
        run(ntrials=15, nt=30, n_restarts=2, results_dir=args.results_dir)
    else:
        run(results_dir=args.results_dir)


if __name__ == "__main__":
    main()
