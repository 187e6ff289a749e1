"""Simple-template 1D simulation (reference Figure 1 pipeline).

Parity target: ``/root/reference/simulation_studies/simple_template_1D.py``
— a toy 4-dipole CSD template pushed through the 1D forward model, white
noise at SNR 30, GPCSD fit with 10 restarts, dense-grid posterior CSD, and
a traditional-CSD comparison.  (The reference also compares kCSD via the
external ``kcsd`` package; not vendored here.)

Run: ``python -m workloads.simple_template_1d [--quick]``
"""

from __future__ import annotations

import argparse

import numpy as np

import gpcsd_tpu as g
from gpcsd_tpu.ops.forward import fwd_model_1d
from gpcsd_tpu.utils.grids import normalize

from .common import mse, r2, report


def csd_true_f(x, t):
    """Toy CSD with two dipole pairs (reference ``simple_template_1D.py:19-31``)."""
    x = np.asarray(x).reshape(-1, 1)
    t = np.asarray(t).reshape(1, -1)
    comp1 = np.exp(-((x - 200) ** 2) / (2 * 150**2)) * np.exp(-((t - 25) ** 2) / (2 * 3**2))
    comp2 = -np.exp(-((x - 800) ** 2) / (2 * 150**2)) * np.exp(-((t - 25) ** 2) / (2 * 4**2))
    comp3 = np.exp(-((x - 1600) ** 2) / (2 * 150**2)) * np.exp(-((t - 30) ** 2) / (2 * 4**2))
    comp4 = -np.exp(-((x - 2200) ** 2) / (2 * 150**2)) * np.exp(-((t - 30) ** 2) / (2 * 3**2))
    val = comp1 + comp2 + comp3 + comp4
    return val / np.max(np.abs(val))


def run(n_restarts=10, deltaz=10.0, nt=50, nx=24, snr=30, seed=1, results_dir=None):
    rng = np.random.default_rng(seed)
    a, b, R_true = 0.0, 2400.0, 150.0
    t = np.linspace(0, 50, nt).reshape(-1, 1)
    x = np.linspace(a, b, nx).reshape(-1, 1)
    nz = int(np.rint((b - a) / deltaz)) + 1
    z = np.linspace(a, b, nz).reshape(-1, 1)

    csd_true = csd_true_f(z, t)
    lfp_clean = normalize(
        np.asarray(fwd_model_1d(csd_true, z.ravel(), x.ravel(), R_true))
    )
    sig2n_true = (np.std(lfp_clean) / snr) ** 2
    lfp_noisy = lfp_clean + rng.normal(0, np.sqrt(sig2n_true), size=lfp_clean.shape)

    metrics = {}
    preds = {}
    for name, lfp in (("noiseless", lfp_clean), ("white_noise", lfp_noisy)):
        model = g.GPCSD1D(lfp, x, t)
        model.fit(n_restarts=n_restarts, seed=seed)
        model.predict(z, t)
        est = normalize(model.csd_pred[:, :, 0])
        truth = normalize(csd_true)
        tcsd = g.predictcsd_trad_1d(lfp[:, :, None])[:, :, 0]
        tcsd_n = normalize(tcsd)
        # compare tCSD at the electrodes against the true CSD there
        truth_at_x = normalize(csd_true_f(x, t))
        metrics[f"{name}_gpcsd_mse"] = float(mse(est, truth))
        metrics[f"{name}_gpcsd_r2"] = float(r2(est, truth))
        metrics[f"{name}_tcsd_mse"] = float(mse(tcsd_n, truth_at_x))
        metrics[f"{name}_fitted_R"] = float(model.R["value"])

        # native kCSD comparison with cross-validation (the reference uses
        # the external kcsd package here, ``simple_template_1D.py:99-107``)
        import time as _time

        from gpcsd_tpu.models.kcsd import KCSD1D

        t0 = _time.process_time()
        kc = KCSD1D(x, lfp, gdx=deltaz, h=R_true)
        kc.cross_validate(
            Rs=np.linspace(100, 800, 8), lambdas=np.logspace(1, -15, 12)
        )
        kcsd_est = kc.values()
        metrics[f"{name}_kcsd_seconds"] = _time.process_time() - t0
        truth_kcsd = normalize(csd_true_f(kc.estm_x, t))
        metrics[f"{name}_kcsd_mse"] = float(
            mse(normalize(kcsd_est), truth_kcsd)
        )
        preds[name] = (model, est)

    if results_dir:
        _figure(z, t, x, csd_true, lfp_noisy, preds, results_dir)
    report("simple_template_1d", metrics, results_dir)
    return metrics, preds


def _figure(z, t, x, csd_true, lfp_noisy, preds, results_dir):
    """Figure-1-style panel: true CSD, noisy LFP, GPCSD and tCSD estimates."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from .common import maybe_savefig

    model, est = preds["white_noise"]
    tcsd = g.predictcsd_trad_1d(lfp_noisy[:, :, None])[:, :, 0]
    panels = [
        (normalize(csd_true), "True CSD"),
        (normalize(lfp_noisy), "LFP (noisy)"),
        (est, "GPCSD"),
        (normalize(tcsd), "tCSD"),
    ]
    fig, axes = plt.subplots(1, len(panels), figsize=(4 * len(panels), 5))
    for ax, (img, title) in zip(axes, panels):
        v = np.nanmax(np.abs(img))
        ax.imshow(img, aspect="auto", cmap="bwr", vmin=-v, vmax=v)
        ax.set_title(title)
        ax.set_xlabel("time (ms)")
    axes[0].set_ylabel("depth")
    fig.tight_layout()
    maybe_savefig(fig, results_dir, "simple_template_1d.png")
    plt.close(fig)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="fewer restarts, coarser grid")
    p.add_argument("--results-dir", default=None)
    args = p.parse_args()
    if args.quick:
        run(n_restarts=3, deltaz=50.0, results_dir=args.results_dir)
    else:
        run(results_dir=args.results_dir)


if __name__ == "__main__":
    main()
