"""Adaptive-metric rescue run for the paper-scale NUTS posterior (TPU).

The first full paper run (scripts/paper_nuts_run.py) completed with
smooth, divergence-free, depth-saturated chains that each crawled a
different stretch of the posterior ridge (in-flight diagnosis round 4:
every transition at 127 leapfrogs, per-chain whitened sds 0.02-0.5,
split-R-hat 2.5-10.7, ESS ~2).  The MAP-Hessian whitening under-estimates
the ridge's long directions, and a diagonal Welford metric cannot fix a
dense 30-dimensional correlation.

The rescue uses the information that run DID produce: the 4 chains'
POOLED draws straddle the ridge, so their empirical covariance resolves
exactly the directions the chains could not traverse.  Stan's
adaptive-restart idea: rerun sampling whitened by ``Sigma_pool`` (passed
as ``laplace_hessian = inv(Sigma_pool)`` — the whitening transform is
``Sigma^{1/2}``), short fresh step-size warmup, full sampling phase.
Crash-resumable exactly like the primary run.

Writes ``<out-dir>/paper_nuts_auditory.json`` with the same schema (the
bench prefers whichever artifact passes the health gates).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paper-dir", default="results/paper_nuts",
                    help="completed primary run (source of the pooled "
                         "covariance, MAP/mode params, surrogate)")
    ap.add_argument("--out-dir", default="results/paper_nuts_rescue")
    ap.add_argument("--ntime", type=int, default=1200)
    ap.add_argument("--ntrials", type=int, default=100)
    ap.add_argument("--chains", type=int, default=4)
    ap.add_argument("--warmup", type=int, default=150)
    ap.add_argument("--samples", type=int, default=500)
    ap.add_argument("--chunk", type=int, default=3)
    ap.add_argument("--max-depth", type=int, default=7)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--max-seconds", type=float, default=None)
    ap.add_argument("--dense-mass", action="store_true",
                    help="adapt a full-covariance metric during warmup "
                         "(round-4 dense_e implementation) — the geometry "
                         "lever the fixed-whitening attempts lacked")
    ap.add_argument("--hessian", choices=["pooled", "map"], default="pooled",
                    help="whitening source: the pooled-draw covariance "
                         "inverse, or the primary run's CPU-f64 MAP Hessian")
    ap.add_argument("--shrink", type=float, default=0.1,
                    help="Ledoit-Wolf-style shrinkage of the pooled "
                         "covariance toward its diagonal (4 frozen-ish "
                         "clusters inflate off-diagonals; shrinkage keeps "
                         "the metric SPD and conservative)")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    t0_process = time.time()

    if args.hessian == "map":
        H = np.load(os.path.join(args.paper_dir, "hessian_f64.npz"))["H"]
        return run_sampler(args, H)
    samp_path = os.path.join(args.paper_dir, "posterior_samples.npz")
    if not os.path.exists(samp_path):
        print(f"primary run artifact {samp_path} missing — run "
              "scripts/paper_nuts_run.py to completion first", flush=True)
        return 2

    # pooled-draw covariance -> whitening Hessian (computed on HOST, f64,
    # deterministic across resume attempts so the jitted program constants
    # are stable)
    hess_path = os.path.join(args.out_dir, "hessian_pooled.npz")
    if os.path.exists(hess_path):
        H = np.load(hess_path)["H"]
    else:
        d = np.load(samp_path)
        u = np.asarray(d["raw_u"], dtype=np.float64)  # (chains, S, dim)
        flat = u.reshape(-1, u.shape[-1])
        cov = np.cov(flat.T)
        diag = np.diag(np.diag(cov))
        cov = (1.0 - args.shrink) * cov + args.shrink * diag
        # SPD guard: lift any numerically tiny directions
        w, Q = np.linalg.eigh(cov)
        w = np.maximum(w, 1e-8 * w.max())
        cov = (Q * w) @ Q.T
        H = (Q * (1.0 / w)) @ Q.T
        with open(hess_path + ".tmp", "wb") as f:
            np.savez(f, H=H, cov=cov, eigs=w)
        os.replace(hess_path + ".tmp", hess_path)
        print("pooled covariance: eig range [%.3e, %.3e]" % (w.min(), w.max()),
              flush=True)
    return run_sampler(args, H)


def run_sampler(args, H):
    t0_process = time.time()
    from scripts.paper_nuts_run import build_model

    import jax  # noqa: F401  (axon TPU by default)

    model = build_model(args.paper_dir, args.ntime, args.ntrials, 0)
    mode_path = os.path.join(args.paper_dir, "mode_params.pkl")
    map_path = os.path.join(args.paper_dir, "map_params.pkl")
    with open(mode_path if os.path.exists(mode_path) else map_path, "rb") as f:
        model.restore_model_params(pickle.load(f))

    timing_path = os.path.join(args.out_dir, "chunk_timing.json")
    timing = {}
    if os.path.exists(timing_path):
        with open(timing_path) as f:
            timing = json.load(f)
    last = {"t": time.time()}
    save_every = 5

    class _TimeBudget(Exception):
        pass

    def cb(c, carry):
        now = time.time()
        timing[str(c)] = now - last["t"]
        last["t"] = now
        with open(timing_path + ".tmp", "w") as f:
            json.dump(timing, f)
        os.replace(timing_path + ".tmp", timing_path)
        print(f"chunk {c}: {timing[str(c)]:.1f} s", flush=True)
        if (
            args.max_seconds is not None
            and now - t0_process > args.max_seconds
            and (c + 1) % save_every == 0
        ):
            raise _TimeBudget

    t_run0 = time.time()
    try:
        post = model.sample_posterior(
            n_chains=args.chains,
            num_warmup=args.warmup,
            num_samples=args.samples,
            seed=args.seed,
            chunk_size=args.chunk,
            max_depth=args.max_depth,
            state_path=os.path.join(args.out_dir, "nuts_state"),
            save_every=save_every,
            callback=cb,
            laplace_hessian=H,
            pool_warmup=True,
            dense_mass=getattr(args, "dense_mass", False),
        )
    except _TimeBudget:
        print("time budget reached — checkpointed; rerun to continue",
              flush=True)
        return 3
    wall = time.time() - t_run0

    n_chunks_warm = args.warmup // args.chunk
    samp_durs = [v for k, v in timing.items() if int(k) >= n_chunks_warm]
    med = float(np.median(samp_durs)) if samp_durs else float("nan")
    div = int(np.asarray(post.diagnostics["diverging"]).sum())
    rhat = {k: float(v) for k, v in post.diagnostics.get("rhat", {}).items()}
    ess = {k: float(v) for k, v in post.diagnostics.get("ess", {}).items()}
    result = {
        "config": {
            "nx": 24, "nt": 600, "ntrials": args.ntrials, "ngl": 100,
            "chains": args.chains, "warmup": args.warmup,
            "samples": args.samples, "chunk_size": args.chunk,
            "max_depth": args.max_depth,
            "metric": (
                ("dense_mass + " if getattr(args, "dense_mass", False) else "")
                + ("map-hessian" if args.hessian == "map" else "pooled-cov")
                + " whitening (rescue)"
            ),
        },
        "backend": jax.default_backend(),
        "samples_per_s_per_chip_median": (
            args.chains * args.chunk / med if med == med else None
        ),
        "samples_per_s_per_chip_wall": (
            args.chains * args.samples / float(np.sum(samp_durs))
            if samp_durs else None
        ),
        "median_sampling_chunk_s": med,
        "total_wall_s": wall,
        "divergences": div,
        "mean_leapfrogs_per_sample": float(
            np.asarray(post.diagnostics["num_steps"]).mean()
        ),
        "mean_acceptance": float(
            np.asarray(post.diagnostics["accept_prob"]).mean()
        ),
        "max_rhat": max(rhat.values()) if rhat else None,
        "min_ess": min(ess.values()) if ess else None,
        "rhat": rhat,
        "ess": ess,
        "step_size": np.asarray(post.diagnostics["step_size"]).tolist(),
        "posterior_mean": {
            k: np.asarray(v).mean(axis=0).tolist()
            for k, v in post.theta.items()
        },
    }
    out = os.path.join(args.out_dir, "paper_nuts_auditory.json")
    with open(out + ".tmp", "w") as f:
        json.dump(result, f, indent=1)
    os.replace(out + ".tmp", out)
    samp_out = os.path.join(args.out_dir, "posterior_samples.npz")
    with open(samp_out + ".tmp", "wb") as f:
        np.savez(
            f,
            **{k: np.asarray(v) for k, v in post.theta.items()},
            raw_u=np.asarray(post.raw.samples),
            diag_num_steps=np.asarray(post.diagnostics["num_steps"]),
            diag_diverging=np.asarray(post.diagnostics["diverging"]),
            diag_step_size=np.asarray(post.diagnostics["step_size"]),
        )
    os.replace(samp_out + ".tmp", samp_out)
    print(json.dumps({k: result[k] for k in (
        "samples_per_s_per_chip_median", "mean_leapfrogs_per_sample",
        "divergences", "max_rhat", "min_ess")}), flush=True)
    print(f"DONE -> {out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
