"""Neuropixels 2D LFP + torus-graph pipeline (reference Figure 6).

Parity target: ``/root/reference/neuropixels/fit_gpcsd2d.py`` +
``fit_torus_graph.py``:

1. per-probe (V1 + LM) 69-channel 2D-geometry LFP epochs, window
   -40..110 ms, /100 rescale, de-evoked, outlier-trial rejection (> 5 SD);
2. GPCSD2D with R prior on (50, 300), SE ell prior (20, 200), Matern ell
   prior (1, 20), eps=1, ngl 30x120, padded integration domain;
3. MAP fit (reference: 20 restarts), CSD prediction at 4 layer locations
   per probe;
4. theta (3-7 Hz) / beta (15-25 Hz) bandpass + Hilbert phases at t = 0 and
   70 ms -> torus-graph fit on stacked probes per band x time, plus a
   trial bootstrap of conditional coupling (partial PLV) per band x time
   (reference ``fit_torus_graph.py:47-66``; paper nboot = 1000).

Without the NWB data (no network here) a surrogate two-probe dataset with
Neuropixels-like geometry is generated so the pipeline stays runnable.

Run: ``python -m workloads.neuropixels [--data-dir PATH] [--quick]``
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

import gpcsd_tpu as g
from gpcsd_tpu import signal as gsig
from gpcsd_tpu.models.covariances import (
    GPCSDTemporalCovMatern,
    GPCSDTemporalCovSE,
)
from gpcsd_tpu.models.torus_graph import bootstrap_partial_plv, torus_graph_fit
from gpcsd_tpu.utils.grids import expand_grid

from .common import report

FS = 2500.0  # Hz


def neuropixels_geometry(nrows=18, staggered=True):
    """Approximate Neuropixels checkerboard: 2 columns x nrows, 16/24 um."""
    xs, ys = [], []
    for r in range(nrows):
        for c in range(2):
            xs.append(16.0 + 32.0 * c + (8.0 if (staggered and r % 2) else 0.0))
            ys.append(2200.0 + 20.0 * r)
    return np.stack([np.asarray(xs), np.asarray(ys)], axis=1)


def outlier_trials(lfp, thresh=5.0):
    """Keep trials with no sample exceeding thresh x the per-(channel, time)
    SD across trials (reference ``fit_gpcsd2d.py:51-70``)."""
    sd = np.std(lfp, axis=2, keepdims=True)
    bad = np.any(np.abs(lfp) > thresh * sd, axis=(0, 1))
    return ~bad


def synth_probe(x, nt=150, ntrials=40, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(-40, 110, nt).reshape(-1, 1)
    gen = g.GPCSD2D(
        np.zeros((x.shape[0], nt, 1)), x, t, eps=1.0, ngl1=10, ngl2=30,
        a1=x[:, 0].min() - 16, b1=x[:, 0].max() + 16,
        a2=x[:, 1].min() - 100, b2=x[:, 1].max() + 100,
    )
    gen.R["value"] = 80.0
    gen.spatial_cov.params["ell1"]["value"] = 30.0
    gen.spatial_cov.params["ell2"]["value"] = 100.0
    gen.temporal_cov_list[0].params["ell"]["value"] = 20.0
    gen.temporal_cov_list[0].params["sigma2"]["value"] = 1.0
    gen.temporal_cov_list[1].params["ell"]["value"] = 3.0
    gen.temporal_cov_list[1].params["sigma2"]["value"] = 0.5
    gen.sig2n["value"] = 0.1
    _, lfp = gen.sample_prior(ntrials, type="lfp", seed=seed)
    lfp = np.array(lfp)
    lfp += np.sqrt(0.1) * rng.normal(size=lfp.shape)
    # a couple of artificial outlier trials to exercise rejection
    lfp[:, :, : max(1, ntrials // 20)] *= 8.0
    return lfp, t


def fit_probe(lfp, x, t, n_restarts=20, ngl1=30, ngl2=120, seed=0, cache=None):
    R_prior = g.InvGamma.from_interval(50, 300)
    se = GPCSDTemporalCovSE(t, ell_prior=g.InvGamma.from_interval(20, 200))
    ma = GPCSDTemporalCovMatern(t, ell_prior=g.InvGamma.from_interval(1, 20))
    model = g.GPCSD2D(
        lfp, x, t, R_prior=R_prior, temporal_cov_list=[se, ma],
        eps=1.0, ngl1=ngl1, ngl2=ngl2,
        a1=x[:, 0].min() - 16, b1=x[:, 0].max() + 16,
        a2=x[:, 1].min() - 100, b2=x[:, 1].max() + 100,
    )
    if cache and os.path.isfile(cache):
        with open(cache, "rb") as f:
            model.restore_model_params(pickle.load(f))
    else:
        model.fit(n_restarts=n_restarts, seed=seed)
        if cache:
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            with open(cache, "wb") as f:
                pickle.dump(model.extract_model_params(), f)
    return model


def run(data_dir=None, n_restarts=20, ngl1=30, ngl2=120, nt=150, ntrials=40,
        seed=0, results_dir=None, bands=((3, 7), (15, 25)),
        phase_times=(0.0, 70.0), nboot=1000):
    probes = {}
    if data_dir:
        for probe in ("probeC", "probeD"):
            path = os.path.join(data_dir, f"neuropixel_viz_{probe}_m405751.pkl")
            with open(path, "rb") as f:
                d = pickle.load(f)
            t = d["t"] * 1000.0
            t_ind = (t >= -40.0) & (t <= 110.0)
            lfp = d["y"][:, t_ind.ravel(), :] / 100.0
            lfp -= lfp.mean(2, keepdims=True)
            probes[probe] = (lfp, d["x"], t[t_ind].reshape(-1, 1))
        source = "nwb"
    else:
        x = neuropixels_geometry()
        for i, probe in enumerate(("probeC", "probeD")):
            lfp, t = synth_probe(x, nt=nt, ntrials=ntrials, seed=seed + i)
            probes[probe] = (lfp, x, t)
        source = "surrogate"

    metrics = {"source": source}
    phases = {}
    for pi, (probe, (lfp, x, t)) in enumerate(probes.items()):
        keep = outlier_trials(lfp)
        metrics[f"{probe}_trials_kept"] = int(keep.sum())
        lfp = lfp[:, :, keep]
        model = fit_probe(
            lfp, x, t, n_restarts=n_restarts, ngl1=ngl1, ngl2=ngl2, seed=seed + 13 * pi,
            cache=os.path.join(results_dir, f"{probe}_params.pkl") if results_dir else None,
        )
        metrics[f"{probe}_R"] = float(model.R["value"])
        metrics[f"{probe}_ell1"] = float(model.spatial_cov.params["ell1"]["value"])
        metrics[f"{probe}_ell2"] = float(model.spatial_cov.params["ell2"]["value"])

        # CSD at 4 depths down the probe mid-line
        depths = np.linspace(x[:, 1].min() + 50, x[:, 1].max() - 50, 4)
        z = np.stack([np.full(4, x[:, 0].mean()), depths], axis=1)
        model.predict(z, t, type="csd")
        metrics[f"{probe}_csd_pred_shape"] = list(model.csd_pred.shape)
        if results_dir:
            _layer_figure(probe, t.ravel(), depths, model.csd_pred, results_dir)

        # band phases at the selected analysis times (reference uses
        # t = 0 and 70 ms, ``fit_gpcsd2d.py:140-159``)
        t_inds = [int(np.argmin(np.abs(t.ravel() - tt))) for tt in phase_times]
        fs = 1000.0 / float(np.mean(np.diff(t.ravel())))  # t is in ms
        for lo, hi in bands:
            v = np.moveaxis(model.csd_pred, 1, -1)
            filt = np.asarray(gsig.bandpass_filtfilt(v, lo, hi, fs))
            ph_all = np.asarray(gsig.instantaneous_phase(filt))
            for tt, ti in zip(phase_times, t_inds):
                ph = ph_all[:, :, ti]
                phases.setdefault((lo, hi, tt), {})[probe] = ph

    # torus-graph fit + trial bootstrap per band x time on stacked probes
    # (reference ``neuropixels/fit_torus_graph.py:25-37`` fit, ``:47-66``
    # 1000-iteration bootstrap of conditional coupling / partial PLV)
    import jax

    for bi, ((lo, hi, tt), per_probe) in enumerate(sorted(phases.items())):
        X = np.vstack([per_probe["probeC"], per_probe["probeD"]])
        tg = torus_graph_fit(X)
        tag = f"tg_{lo}_{hi}_t{int(tt)}"
        metrics[f"{tag}_edges_bonf"] = int(
            np.sum(np.asarray(tg.pvals) < 0.05 / tg.pairs.shape[0])
        )
        if nboot:
            pplv = bootstrap_partial_plv(
                X, nboot, jax.random.PRNGKey(seed + 1000 + bi)
            )  # (npairs, nboot)
            lo_q, hi_q = np.percentile(pplv, [2.5, 97.5], axis=1)
            metrics[f"{tag}_pplv_ci_width_mean"] = float(np.mean(hi_q - lo_q))
            metrics[f"{tag}_pplv_ci_lo_max"] = float(np.max(lo_q))
            if results_dir:
                np.savez(
                    os.path.join(results_dir, f"bootstrap_{tag}.npz"),
                    pplv=pplv, ci_lo=lo_q, ci_hi=hi_q,
                    cond_coupling=np.asarray(tg.cond_coupling),
                    pvals=np.asarray(tg.pvals), pairs=np.asarray(tg.pairs),
                )

    report("neuropixels", metrics, results_dir)
    return metrics


def _layer_figure(probe, t, depths, csd_pred, results_dir):
    """Figure-6A-style panel: evoked CSD traces at the 4 probe depths
    (reference ``neuropixels/fit_gpcsd2d.py:101-113`` prediction targets)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from .common import maybe_savefig

    evoked = csd_pred.mean(axis=2)  # (4, nt)
    fig, ax = plt.subplots(figsize=(6, 4))
    off = 2.2 * np.max(np.abs(evoked))
    for i, d in enumerate(depths):
        ax.plot(t, evoked[i] + i * off, label=f"{d:.0f} um")
    ax.axvline(0.0, color="k", lw=0.6, ls="--")
    ax.set_xlabel("time (ms)")
    ax.set_yticks([])
    ax.set_title(f"{probe}: evoked CSD by depth")
    ax.legend(fontsize=7)
    maybe_savefig(fig, results_dir, f"neuropixels_{probe}_layers.png")
    plt.close(fig)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default=None)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--results-dir", default=None)
    p.add_argument("--nboot", type=int, default=1000,
                   help="torus-graph bootstrap iterations (paper = 1000)")
    args = p.parse_args()
    kw = dict(data_dir=args.data_dir, results_dir=args.results_dir,
              nboot=args.nboot)
    if args.quick:
        kw.update(n_restarts=3, ngl1=8, ngl2=24, nt=80, ntrials=20)
        if args.nboot == 1000:
            kw["nboot"] = 4
    run(**kw)


if __name__ == "__main__":
    main()
