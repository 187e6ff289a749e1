"""Auditory two-probe macaque LFP pipeline (reference Figures 2-3).

Parity target: ``/root/reference/auditory_lfp/fit_gpcsd_baseline.py`` +
``torus_graph_fit.py``:

1. load 24-electrode LFP per probe (Zenodo record 5137888), rescale /100,
   de-mean across trials, subset the baseline window (t < 0);
2. GPCSD1D with the paper's covariance stack — padded integration bounds
   (a=-200, b=2600), Matern ell prior on (1, 20) ms, SE ell prior on
   (30, 100) ms, per-channel HalfNormal(0.1) noise;
3. MAP fit (or NUTS — new capability), posterior CSD/LFP per temporal
   component on the trial window;
4. 8-12 Hz bandpass -> Hilbert phases -> PLV matrices;
5. torus-graph phase-differences fit on the stacked two-probe phases with
   bootstrap partial-PLV CIs (native engine, replacing pyTG).

Without the Zenodo data (no network in this environment) a surrogate
two-probe dataset is generated from a GPCSD1D prior with inter-probe
phase coupling injected at 10 Hz, so the full pipeline stays runnable.

Run: ``python -m workloads.auditory_lfp [--data-dir PATH] [--quick] [--nuts]``
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

import gpcsd_tpu as g
from gpcsd_tpu import signal as gsig
from gpcsd_tpu.models.covariances import (
    GPCSD1DSpatialCovSE,
    GPCSDTemporalCovMatern,
    GPCSDTemporalCovSE,
)
from gpcsd_tpu.models.torus_graph import bootstrap_partial_plv, torus_graph_fit
from gpcsd_tpu.ops.forward import fwd_model_1d

from .common import report

FS = 1000.0  # Hz
A, B = 0.0, 2300.0
NX = 24


def load_probe(data_dir, probe):
    """Load (nx, ntime, ntrials) LFP from the reference's text files via the
    native parallel parser (numpy fallback inside the loader)."""
    from gpcsd_tpu.io.loaders import load_auditory_probe

    return load_auditory_probe(data_dir, probe, n_electrodes=NX)


def synth_probe(seed, ntime=400, ntrials=60, coupled_phases=None, f_hz=10.0):
    """Surrogate probe: GPCSD1D prior draw + forward model + a 10 Hz
    oscillation whose phase is trial-coupled across probes."""
    rng = np.random.default_rng(seed)
    x = np.linspace(A, B, NX)
    time = (np.arange(ntime) - ntime // 2) / FS * 1000.0  # ms, 0 at middle
    gen = g.GPCSD1D(np.zeros((NX, ntime, 1)), x.reshape(-1, 1), time.reshape(-1, 1))
    gen.R["value"] = 150.0
    gen.spatial_cov.params["ell"]["value"] = 300.0
    gen.temporal_cov_list[0].params["ell"]["value"] = 40.0
    gen.temporal_cov_list[0].params["sigma2"]["value"] = 1.0
    gen.temporal_cov_list[1].params["ell"]["value"] = 5.0
    gen.temporal_cov_list[1].params["sigma2"]["value"] = 0.5
    gen.sig2n["value"] = 1e-4
    csd = gen.sample_prior(ntrials, seed=seed)
    lfp = np.array(
        np.moveaxis(np.asarray(fwd_model_1d(np.moveaxis(csd, 2, 0), x, x, 150.0)), 0, 2)
    )
    lfp /= np.max(np.abs(lfp))
    # inject a coherent 10 Hz component with per-trial phase
    if coupled_phases is None:
        coupled_phases = rng.uniform(0, 2 * np.pi, ntrials)
    chan_jitter = rng.normal(0, 0.6, size=(NX, 1, ntrials))  # decorrelate channels
    osc = 0.15 * np.sin(
        2 * np.pi * f_hz * time[None, :, None] / 1000.0
        + coupled_phases[None, None, :]
        + chan_jitter
    )
    depth_profile = np.exp(-0.5 * ((x - 1200.0) / 500.0) ** 2)[:, None, None]
    lfp = lfp + osc * depth_profile
    lfp = lfp + 0.05 * rng.normal(size=lfp.shape)
    return lfp, time, coupled_phases


def fit_probe(lfp_baseline, t, n_restarts=10, seed=0, nuts=False, cache=None):
    x = np.linspace(A, B, NX).reshape(-1, 1)
    spatial_cov = GPCSD1DSpatialCovSE(x, a=-200.0, b=2600.0)
    matern_cov = GPCSDTemporalCovMatern(t.reshape(-1, 1))
    matern_cov.params["ell"]["prior"] = g.InvGamma.from_interval(1.0, 20.0)
    se_cov = GPCSDTemporalCovSE(t.reshape(-1, 1))
    se_cov.params["ell"]["prior"] = g.InvGamma.from_interval(30.0, 100.0)
    sig2n_prior = [g.HalfNormal(0.1) for _ in range(NX)]
    model = g.GPCSD1D(
        lfp_baseline, x, t.reshape(-1, 1),
        a=-200.0, b=2600.0,
        spatial_cov=spatial_cov,
        temporal_cov_list=[se_cov, matern_cov],
        sig2n_prior=sig2n_prior,
    )
    if cache and os.path.isfile(cache):
        with open(cache, "rb") as f:
            model.restore_model_params(pickle.load(f))
    elif nuts:
        model.sample_posterior(
            n_chains=2, num_warmup=200, num_samples=200, seed=seed,
            set_posterior_mean=True,
        )
    else:
        model.fit(n_restarts=n_restarts, seed=seed)
    if cache:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        with open(cache, "wb") as f:
            pickle.dump(model.extract_model_params(), f)
    return model


def run(data_dir=None, n_restarts=10, nuts=False, nboot=10, seed=0,
        results_dir=None, ntime=400, ntrials=60):
    probes = {}
    if data_dir and os.path.isfile(os.path.join(data_dir, "time.txt")):
        for p in ("lateral", "medial"):
            probes[p] = load_probe(data_dir, p)
        source = "zenodo"
    else:
        rng = np.random.default_rng(seed)
        shared = rng.uniform(0, 2 * np.pi, ntrials)
        # medial phases partially coupled to lateral (phase-difference model)
        lag = 0.8 + 0.2 * rng.normal(size=ntrials)
        lfp_l, time, _ = synth_probe(seed, ntime, ntrials, coupled_phases=shared)
        lfp_m, _, _ = synth_probe(seed + 1, ntime, ntrials, coupled_phases=shared + lag)
        probes = {"lateral": (lfp_l, time), "medial": (lfp_m, time)}
        source = "surrogate"

    phases = {}
    fig_data = {}
    metrics = {"source": source}
    for pname, (lfp, time) in probes.items():
        baseline_idx = time < 0
        t_base = time[baseline_idx]
        model = fit_probe(
            lfp[:, baseline_idx, :], t_base, n_restarts=n_restarts,
            seed=seed, nuts=nuts,
            cache=os.path.join(results_dir, f"gpcsd_model_{pname}.pkl") if results_dir else None,
        )
        metrics[f"{pname}_R"] = float(model.R["value"])
        metrics[f"{pname}_spatial_ell"] = float(model.spatial_cov.params["ell"]["value"])

        # trial window prediction, CSD and LFP, per temporal component
        trial_idx = (time >= 0) & (time < min(500.0, time.max()))
        t_trial = time[trial_idx].reshape(-1, 1)
        x = np.linspace(A, B, NX).reshape(-1, 1)
        model.update_lfp(lfp[:, trial_idx, :], t_trial)
        model.predict(x, t_trial, type="both")

        # alpha-band phases at the window midpoint (reference uses 8-12 Hz
        # filtfilt + hilbert at a fixed time index, :303-308)
        mid = model.csd_pred.shape[1] // 2

        def band_phases(pred):
            # pred (nx, nt, ntrials) -> phases (nx, ntrials) at the midpoint
            v = np.moveaxis(pred, 1, -1)  # (nx, ntrials, nt): filter along time
            filt = np.asarray(gsig.bandpass_filtfilt(v, 8.0, 12.0, FS))
            return np.asarray(gsig.instantaneous_phase(filt))[:, :, mid]

        csd_ph = band_phases(model.csd_pred)
        lfp_ph = band_phases(model.lfp_pred)
        phases[pname] = {"csd": csd_ph, "lfp": lfp_ph}

        plv = np.asarray(gsig.plv_matrix(csd_ph))
        metrics[f"{pname}_mean_offdiag_plv"] = float(
            plv[~np.eye(NX, dtype=bool)].mean()
        )
        if results_dir:
            fig_data[pname] = dict(
                t=t_trial.reshape(-1),
                lfp_evoked=lfp[:, trial_idx, :].mean(axis=2),
                csd_evoked=model.csd_pred.mean(axis=2),
                csd_components=[c.mean(axis=2) for c in model.csd_pred_list],
                plv=plv,
            )

    # torus-graph phase-differences fit on stacked probes (48 channels)
    X = np.vstack([phases["lateral"]["csd"], phases["medial"]["csd"]])
    tg = torus_graph_fit(X)
    n_edges = int(np.sum(np.asarray(tg.pvals) < 0.001 / (24 * 24)))
    metrics["tg_edges_bonf_001"] = n_edges
    metrics["tg_max_kappa"] = float(np.asarray(tg.kappa).max())

    if nboot > 0:
        import jax

        bs = bootstrap_partial_plv(X, nboot, jax.random.PRNGKey(seed), batch_size=2)
        metrics["bootstrap_pplv_ci_width_mean"] = float(
            (np.quantile(bs, 0.975, axis=1) - np.quantile(bs, 0.025, axis=1)).mean()
        )

    report("auditory_lfp", metrics, results_dir)
    if results_dir:
        _figure(fig_data, results_dir)
    return metrics, phases, tg


def _figure(fig_data, results_dir):
    """Figure-2-style panels per probe (reference
    ``fit_gpcsd_baseline.py:189-269``): trial-averaged LFP, evoked GPCSD
    total and per temporal component (slow SE / fast Matern decomposition),
    and the alpha-band CSD PLV matrix."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from .common import maybe_savefig

    for pname, d in fig_data.items():
        comps = d["csd_components"]
        ncols = 2 + len(comps) + 1
        fig, axes = plt.subplots(1, ncols, figsize=(3.1 * ncols, 4.2))
        t = d["t"]
        extent = [t[0], t[-1], NX, 1]
        panels = [("evoked LFP", d["lfp_evoked"])]
        panels.append(("evoked CSD (total)", d["csd_evoked"]))
        names = ["slow (SE)", "fast (Matern)"]
        for i, c in enumerate(comps):
            panels.append((f"CSD comp {i}: {names[i] if i < 2 else ''}", c))
        for ax, (name, v) in zip(axes, panels):
            vmax = np.max(np.abs(v)) or 1.0
            ax.imshow(v, aspect="auto", extent=extent, cmap="bwr",
                      vmin=-vmax, vmax=vmax)
            ax.set_title(name, fontsize=9)
            ax.set_xlabel("time (ms)")
        axes[0].set_ylabel("electrode")
        im = axes[-1].imshow(d["plv"], vmin=0, vmax=1, cmap="viridis")
        axes[-1].set_title("alpha-band CSD PLV")
        fig.colorbar(im, ax=axes[-1], shrink=0.8)
        fig.tight_layout()
        maybe_savefig(fig, results_dir, f"auditory_lfp_{pname}.png")
        plt.close(fig)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default=None)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--nuts", action="store_true", help="NUTS posterior instead of MAP")
    p.add_argument("--results-dir", default=None)
    args = p.parse_args()
    kw = dict(data_dir=args.data_dir, nuts=args.nuts, results_dir=args.results_dir)
    if args.quick:
        kw.update(n_restarts=3, nboot=4, ntime=200, ntrials=30)
    run(**kw)


if __name__ == "__main__":
    main()
