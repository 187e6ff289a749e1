"""Figures for the paper-scale NUTS acceptance run (scripts/paper_nuts_run.py).

Reads ``<out-dir>/{paper_nuts_auditory.json, posterior_samples.npz}`` and
renders the standard posterior-quality panels:

1. ``traces.png``   — per-chain trace plots of every scalar hyperparameter
   (ground truth overlaid), plus step size / tree depth diagnostics.
2. ``marginals.png`` — posterior marginal histograms with ground truth and
   90% central intervals (the surrogate is drawn FROM the model family, so
   coverage of the truth is the acceptance criterion).
3. ``sig2n.png``     — per-channel noise posterior (median + 90% band)
   against the true per-channel noise floor.

CPU-only (reads artifacts; no model evaluation).
"""

from __future__ import annotations

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

SCALARS = ["R", "ell", "tm0_ell", "tm0_sigma2", "tm1_ell", "tm1_sigma2"]
LABELS = {
    "R": "R (um)",
    "ell": "spatial ell (um)",
    "tm0_ell": "SE ell (ms)",
    "tm0_sigma2": "SE sigma2",
    "tm1_ell": "Matern ell (ms)",
    "tm1_sigma2": "Matern sigma2",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="results/paper_nuts")
    args = ap.parse_args()

    with open(os.path.join(args.out_dir, "paper_nuts_auditory.json")) as f:
        art = json.load(f)
    d = np.load(os.path.join(args.out_dir, "posterior_samples.npz"))
    truth = art.get("truth", {})
    chains = art["config"]["chains"]
    fig_dir = os.path.join(args.out_dir, "figures")
    os.makedirs(fig_dir, exist_ok=True)

    def per_chain(name):
        v = d[name]  # (chains*nsamples, ...) chain-major
        return v.reshape(chains, -1, *v.shape[1:])

    # ---------------------------------------------------------- traces
    keys = [k for k in SCALARS if k in d.files]
    nrow = len(keys) + 2
    fig, axes = plt.subplots(nrow, 1, figsize=(9, 2.0 * nrow), sharex=True)
    for ax, k in zip(axes, keys):
        v = per_chain(k)
        for c in range(chains):
            ax.plot(v[c], lw=0.6, alpha=0.8)
        if k in truth:
            ax.axhline(truth[k], color="k", ls="--", lw=1)
        ax.set_ylabel(LABELS.get(k, k), fontsize=8)
        rh = art.get("rhat", {}).get(k)
        if rh:
            ax.set_title(f"R-hat = {rh:.3f}", fontsize=8, loc="right")
    steps = per_chain("diag_num_steps")
    for c in range(chains):
        axes[-2].plot(steps[c], lw=0.5, alpha=0.7)
    axes[-2].set_ylabel("leapfrogs/draw", fontsize=8)
    ss = np.atleast_1d(d["diag_step_size"])
    axes[-1].bar(range(ss.size), ss)
    axes[-1].set_yscale("log")
    axes[-1].set_ylabel("step size/chain", fontsize=8)
    axes[-1].set_xlabel("draw")
    fig.suptitle(
        f"auditory 4x({art['config']['warmup']}+{art['config']['samples']}) — "
        f"max R-hat {art.get('max_rhat'):.3f}, min ESS {art.get('min_ess'):.0f}, "
        f"{art.get('divergences')} divergences",
        fontsize=10,
    )
    fig.tight_layout()
    fig.savefig(os.path.join(fig_dir, "traces.png"), dpi=120)
    plt.close(fig)

    # -------------------------------------------------------- marginals
    fig, axes = plt.subplots(2, 3, figsize=(11, 6))
    for ax, k in zip(axes.ravel(), keys):
        v = np.asarray(d[k]).ravel()
        ax.hist(v, bins=40, color="#4878d0", alpha=0.8, density=True)
        lo, hi = np.quantile(v, [0.05, 0.95])
        ax.axvspan(lo, hi, color="#4878d0", alpha=0.15, label="90% CI")
        if k in truth:
            ax.axvline(truth[k], color="k", ls="--", lw=1.2, label="truth")
        ax.set_title(LABELS.get(k, k), fontsize=9)
        ax.legend(fontsize=7)
    fig.suptitle("posterior marginals vs ground truth (well-specified surrogate)")
    fig.tight_layout()
    fig.savefig(os.path.join(fig_dir, "marginals.png"), dpi=120)
    plt.close(fig)

    # ------------------------------------------------- per-channel noise
    if "sig2n" in d.files and d["sig2n"].ndim == 2:
        v = d["sig2n"]  # (draws, nx)
        med = np.median(v, axis=0)
        lo, hi = np.quantile(v, [0.05, 0.95], axis=0)
        ch = np.arange(med.size)
        fig, ax = plt.subplots(figsize=(8, 3.5))
        ax.fill_between(ch, lo, hi, alpha=0.25, label="90% CI")
        ax.plot(ch, med, marker="o", ms=3, lw=1, label="posterior median")
        if "sig2n" in truth:
            ax.axhline(truth["sig2n"], color="k", ls="--", lw=1, label="truth")
        ax.set_xlabel("channel")
        ax.set_ylabel("sig2n")
        ax.legend(fontsize=8)
        fig.tight_layout()
        fig.savefig(os.path.join(fig_dir, "sig2n.png"), dpi=120)
        plt.close(fig)

    print(f"figures -> {fig_dir}", flush=True)


if __name__ == "__main__":
    main()
