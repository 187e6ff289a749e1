"""Simulate-from-the-model 1D study (reference Figure: GP recovery).

Parity target: ``/root/reference/simulation_studies/sim_from_gp_1D.py`` —
draw CSD trials from a GPCSD1D generator with known hyperparameters
(R=100, spatial ell=200, Matern sigma2=0.7/ell=5, SE sigma2=0.5/ell=20,
sig2n=1e-4), forward-model to 24 electrodes, add noise, fit a fresh model
(or inject the truth with ``fix=True``), and score per-trial MSE/R^2 of the
posterior CSD against spline ground truth, with paired t-tests vs the
traditional-CSD baseline.

Run: ``python -m workloads.sim_from_gp_1d [--quick] [--fix]``
"""

from __future__ import annotations

import argparse

import numpy as np

import gpcsd_tpu as g
from gpcsd_tpu.ops.forward import fwd_model_1d

from .common import mse, paired_t, r2, report

TRUE = dict(R=100.0, ell=200.0, se_sigma2=0.5, se_ell=20.0,
            m_sigma2=0.7, m_ell=5.0, sig2n=1e-4)


def make_generator(x, t):
    gen = g.GPCSD1D(np.zeros((x.size, t.size, 1)), x.reshape(-1, 1), t.reshape(-1, 1))
    gen.R["value"] = TRUE["R"]
    gen.spatial_cov.params["ell"]["value"] = TRUE["ell"]
    gen.temporal_cov_list[0].params["ell"]["value"] = TRUE["se_ell"]
    gen.temporal_cov_list[0].params["sigma2"]["value"] = TRUE["se_sigma2"]
    gen.temporal_cov_list[1].params["ell"]["value"] = TRUE["m_ell"]
    gen.temporal_cov_list[1].params["sigma2"]["value"] = TRUE["m_sigma2"]
    gen.sig2n["value"] = TRUE["sig2n"]
    return gen


def run(ntrials=100, nt=60, nx=24, n_restarts=10, fix=False, seed=42,
        results_dir=None, kcsd=False):
    a, b = 0.0, 2300.0
    x = np.linspace(a, b, nx)
    t = np.linspace(0, 60, nt)
    # dense generation grid, spline-interpolated to electrodes (reference
    # ``sim_from_gp_1D.py:59-63``)
    gen = make_generator(x, t)
    csd_at_x = gen.sample_prior(ntrials, seed=seed)  # (nx, nt, ntrials)

    lfp = np.asarray(
        fwd_model_1d(np.moveaxis(csd_at_x, 2, 0), x, x, TRUE["R"])
    )
    lfp = np.moveaxis(lfp, 0, 2)
    scale = np.max(np.abs(lfp))
    lfp = lfp / scale
    rng = np.random.default_rng(seed + 1)
    lfp = lfp + np.sqrt(TRUE["sig2n"]) * rng.normal(size=lfp.shape)

    model = g.GPCSD1D(lfp, x.reshape(-1, 1), t.reshape(-1, 1))
    if fix:
        # oracle mode: inject true params (accounting for the forward gain
        # R/2 and the normalization absorbed into the temporal variances)
        gain = (TRUE["R"] / 2.0 / scale) ** 2
        model.R["value"] = TRUE["R"]
        model.spatial_cov.params["ell"]["value"] = TRUE["ell"]
        model.temporal_cov_list[0].params["ell"]["value"] = TRUE["se_ell"]
        model.temporal_cov_list[0].params["sigma2"]["value"] = TRUE["se_sigma2"] * gain
        model.temporal_cov_list[1].params["ell"]["value"] = TRUE["m_ell"]
        model.temporal_cov_list[1].params["sigma2"]["value"] = TRUE["m_sigma2"] * gain
        model.sig2n["value"] = TRUE["sig2n"]
    else:
        model.fit(n_restarts=n_restarts, seed=seed)

    model.predict(x.reshape(-1, 1), t.reshape(-1, 1))
    gp_pred = model.csd_pred  # (nx, nt, ntrials)
    tcsd = g.predictcsd_trad_1d(lfp)

    # per-trial scores against the generated CSD (normalized per trial as in
    # the reference comparison)
    def norm(v):
        return v / np.max(np.abs(v), axis=(0, 1), keepdims=True)

    truth_n = norm(csd_at_x)
    gp_n = norm(gp_pred)
    t_n = norm(np.where(tcsd == 0, 1e-12, tcsd))
    gp_mse = np.array([mse(gp_n[:, :, i], truth_n[:, :, i]) for i in range(ntrials)])
    t_mse = np.array(
        [mse(t_n[1:-1, :, i], truth_n[1:-1, :, i]) for i in range(ntrials)]
    )
    gp_r2 = np.array([r2(gp_n[:, :, i], truth_n[:, :, i]) for i in range(ntrials)])
    tt, tp = paired_t(gp_mse, t_mse)

    metrics = {
        "gpcsd_mse_mean": float(gp_mse.mean()),
        "gpcsd_mse_median": float(np.median(gp_mse)),
        "tcsd_mse_mean": float(t_mse.mean()),
        "gpcsd_r2_mean": float(gp_r2.mean()),
        "paired_t_gp_vs_tcsd": float(tt),
        "paired_p_gp_vs_tcsd": float(tp),
        "fitted_R": float(model.R["value"]),
        "fitted_spatial_ell": float(model.spatial_cov.params["ell"]["value"]),
        "fitted_sig2n": float(np.asarray(model.sig2n["value"])),
    }

    kcsd_n = None
    if kcsd:
        # kCSD comparison, reference protocol (``sim_from_gp_1D.py:112-127``):
        # cross-validate (R, lambda) on the first 5 trials concatenated, then
        # estimate every trial at the selected parameters and interpolate
        # back to the electrode grid
        from scipy.interpolate import interp1d

        from gpcsd_tpu.models.kcsd import KCSD1D

        deltax = float(x[1] - x[0])
        ncv = min(5, ntrials)
        kc = KCSD1D(x.reshape(-1, 1), lfp[:, :, :ncv].reshape(nx, -1),
                    gdx=deltax / 4, h=TRUE["R"])
        kc.cross_validate(Rs=np.linspace(100, 1000, 8))
        kcsd_vals = np.empty_like(lfp)
        for i in range(ntrials):
            kci = KCSD1D(x.reshape(-1, 1), lfp[:, :, i], gdx=deltax / 4,
                         h=TRUE["R"], R_init=kc.R, lambd=kc.lambd)
            kcsd_vals[:, :, i] = interp1d(kci.estm_x, kci.values(), axis=0)(x)
        kcsd_n = norm(kcsd_vals)
        k_mse = np.array(
            [mse(kcsd_n[:, :, i], truth_n[:, :, i]) for i in range(ntrials)]
        )
        ktt, ktp = paired_t(gp_mse, k_mse)
        metrics.update(
            kcsd_mse_mean=float(k_mse.mean()),
            kcsd_R=float(kc.R),
            kcsd_lambda=float(kc.lambd),
            paired_t_gp_vs_kcsd=float(ktt),
            paired_p_gp_vs_kcsd=float(ktp),
        )

    report("sim_from_gp_1d" + ("_fix" if fix else ""), metrics, results_dir)
    if results_dir:
        _figure(x, t, truth_n, gp_n, t_n, kcsd_n, gp_mse, t_mse, results_dir,
                tag="_fix" if fix else "")
    return metrics, model


def _figure(x, t, truth_n, gp_n, t_n, kcsd_n, gp_mse, t_mse, results_dir, tag=""):
    """Recovery panels mirroring the reference's visual check
    (``sim_from_gp_1D.py:129-194``): one-trial heatmaps, the per-electrode
    RMSE profile across depth, and per-trial MSE boxplots."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from .common import maybe_savefig

    panels = [("true CSD", truth_n), ("GPCSD", gp_n), ("tCSD", t_n)]
    if kcsd_n is not None:
        panels.append(("kCSD", kcsd_n))
    ncols = len(panels) + 2
    fig, axes = plt.subplots(1, ncols, figsize=(3.2 * ncols, 4.2))
    extent = [t[0], t[-1], x[-1], x[0]]
    vmax = 1.0
    for ax, (name, v) in zip(axes, panels):
        ax.imshow(v[:, :, 0], aspect="auto", extent=extent, cmap="bwr",
                  vmin=-vmax, vmax=vmax)
        ax.set_title(name)
        ax.set_xlabel("time (ms)")
    axes[0].set_ylabel("depth (um)")
    # per-electrode RMSE profile (reference sim_from_gp_1D.py:184-194)
    ax = axes[len(panels)]
    for name, v in panels[1:]:
        prof = np.sqrt(np.mean((v - truth_n) ** 2, axis=(1, 2)))
        ax.plot(prof, x, label=name)
    ax.invert_yaxis()
    ax.set_xlabel("RMSE")
    ax.set_title("per-electrode RMSE")
    ax.legend(fontsize=8)
    # per-trial MSE boxplots
    ax = axes[len(panels) + 1]
    ax.boxplot([gp_mse, t_mse], tick_labels=["GPCSD", "tCSD"])
    ax.set_title("per-trial MSE")
    fig.tight_layout()
    maybe_savefig(fig, results_dir, f"sim_from_gp_1d{tag}.png")
    plt.close(fig)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--fix", action="store_true", help="oracle: inject true params")
    p.add_argument("--no-kcsd", action="store_true", help="skip the kCSD baseline")
    p.add_argument("--results-dir", default=None)
    args = p.parse_args()
    kw = dict(fix=args.fix, results_dir=args.results_dir, kcsd=not args.no_kcsd)
    if args.quick:
        kw.update(ntrials=20, nt=40, n_restarts=3)
    run(**kw)


if __name__ == "__main__":
    main()
