"""Paper-scale NUTS posterior run at the auditory configuration (TPU).

The north-star acceptance run (BASELINE.json; VERDICT round-1 item 1):
GPCSD1D at the auditory-workload size — nx=24, nt=600 baseline window,
100 trials, ngl=100, the paper covariance stack of
``/root/reference/auditory_lfp/fit_gpcsd_baseline.py:80-100`` — MAP fit,
then 4 NUTS chains x (500 warmup + 500 samples) via the chunked driver
with crash resume (``state_path``) and warm-basis threading.

Designed to be re-invoked until done: every stage (surrogate data, MAP
params, sampler chunks, per-chunk timing) checkpoints to ``--out-dir``,
so a worker crash or an external ``timeout`` just continues.  Exits 0
with a final JSON artifact once the posterior is complete; a kill/timeout
mid-run leaves the checkpoints behind and a rerun continues.

    for i in $(seq 1 40); do
        timeout 580 python scripts/paper_nuts_run.py && break
    done

Records: samples/s/chip (median sampling-chunk throughput and total-wall),
split-R-hat, ESS, divergence count, step sizes — written to
``<out-dir>/paper_nuts_auditory.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

# runnable as `python scripts/paper_nuts_run.py` from the repo root: the
# workloads package lives next to scripts/, not inside it
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_model(out_dir, ntime, ntrials, seed):
    """Auditory-size data + paper covariance stack (surrogate data cached
    on disk so every resume sees the identical problem)."""
    import gpcsd_tpu as g
    from gpcsd_tpu.models.covariances import (
        GPCSD1DSpatialCovSE,
        GPCSDTemporalCovMatern,
        GPCSDTemporalCovSE,
    )
    from workloads.auditory_lfp import A, B, NX, synth_probe

    data_path = os.path.join(out_dir, "surrogate_lfp.npz")
    if os.path.exists(data_path):
        d = np.load(data_path)
        lfp, time_ms = d["lfp"], d["time_ms"]
    else:
        lfp, time_ms, _ = synth_probe(seed, ntime=ntime, ntrials=ntrials)
        tmp = data_path + ".tmp.npz"
        with open(tmp, "wb") as f:
            np.savez(f, lfp=lfp, time_ms=time_ms)
        os.replace(tmp, data_path)

    base = time_ms < 0  # baseline window, reference :66-70
    t = time_ms[base].reshape(-1, 1)
    x = np.linspace(A, B, NX).reshape(-1, 1)
    spatial_cov = GPCSD1DSpatialCovSE(x, a=-200.0, b=2600.0)
    matern = GPCSDTemporalCovMatern(t)
    matern.params["ell"]["prior"] = g.InvGamma.from_interval(1.0, 20.0)
    se = GPCSDTemporalCovSE(t)
    se.params["ell"]["prior"] = g.InvGamma.from_interval(30.0, 100.0)
    model = g.GPCSD1D(
        lfp[:, base, :], x, t, a=-200.0, b=2600.0,
        spatial_cov=spatial_cov, temporal_cov_list=[se, matern],
        sig2n_prior=[g.HalfNormal(0.1) for _ in range(NX)],
    )
    return model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="results/paper_nuts")
    ap.add_argument("--ntime", type=int, default=1200)  # 600 pre-stimulus
    ap.add_argument("--ntrials", type=int, default=100)
    ap.add_argument("--chains", type=int, default=4)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--samples", type=int, default=500)
    ap.add_argument("--chunk", type=int, default=1,
                    help="NUTS transitions per dispatch (the axon worker "
                         "kills long single dispatches; keep small)")
    ap.add_argument("--max-depth", type=int, default=8,
                    help="NUTS max tree depth; 8 caps a dispatch at 256 "
                         "leapfrogs/chain (bounds worst-case device time)")
    ap.add_argument("--restarts", type=int, default=10)
    ap.add_argument("--map-maxiter", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    import jax  # noqa: F401  (device selection: axon TPU by default)

    model = build_model(args.out_dir, args.ntime, args.ntrials, args.seed)

    # stage 1: MAP (reference fit, 10 restarts) — also the NUTS
    # preconditioning center; cached like the reference's pickles
    map_path = os.path.join(args.out_dir, "map_params.pkl")
    if os.path.exists(map_path):
        with open(map_path, "rb") as f:
            model.restore_model_params(pickle.load(f))
        print("MAP: restored from cache", flush=True)
    else:
        t0 = time.time()
        model.fit(
            n_restarts=args.restarts, seed=args.seed, verbose=True,
            options={
                "maxiter": args.map_maxiter,
                # small dispatches + optimizer-state checkpointing: the
                # axon worker kills long executions, so MAP progress must
                # survive worker deaths just like the sampler's does
                "chunk_iters": 3,
                "state_path": os.path.join(args.out_dir, "map_state"),
            },
        )
        with open(map_path + ".tmp", "wb") as f:
            pickle.dump(model.extract_model_params(), f)
        os.replace(map_path + ".tmp", map_path)
        print(f"MAP: fitted in {time.time() - t0:.1f} s", flush=True)

    # stage 1b: float64 Laplace whitening Hessian at the MAP, computed in a
    # CPU-backend subprocess (scripts/laplace_hessian.py) — the TPU FD
    # fallback buries the posterior's soft curvature directions in f32
    # gradient noise, and the round-2 TPU AD Hessian was outright garbage
    # (finite but wrong by orders of magnitude: the run it whitened pinned
    # all 4 chains at step sizes 1.6e-8..3.7e-5 with R-hat ~1e4)
    hess_path = os.path.join(args.out_dir, "hessian_f64.npz")
    if not os.path.exists(hess_path):
        import subprocess

        t0 = time.time()
        subprocess.run(
            [
                sys.executable, os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "laplace_hessian.py",
                ),
                "--paper-dir", args.out_dir,
                "--ntime", str(args.ntime),
                "--ntrials", str(args.ntrials),
                "--seed", str(args.seed),
            ],
            check=True,
        )
        print(f"Laplace Hessian (CPU f64): {time.time() - t0:.1f} s", flush=True)

    # stage 2: chunked NUTS with crash resume + per-chunk timing sidecar
    timing_path = os.path.join(args.out_dir, "chunk_timing.json")
    timing = {}
    if os.path.exists(timing_path):
        with open(timing_path) as f:
            timing = json.load(f)

    last = {"t": time.time()}

    def cb(c, carry):
        now = time.time()
        timing[str(c)] = now - last["t"]
        last["t"] = now
        with open(timing_path + ".tmp", "w") as f:
            json.dump(timing, f)
        os.replace(timing_path + ".tmp", timing_path)
        print(f"chunk {c}: {timing[str(c)]:.1f} s", flush=True)

    t_run0 = time.time()
    post = model.sample_posterior(
        n_chains=args.chains,
        num_warmup=args.warmup,
        num_samples=args.samples,
        seed=args.seed,
        chunk_size=args.chunk,
        max_depth=args.max_depth,
        state_path=os.path.join(args.out_dir, "nuts_state"),
        save_every=10,  # the warm-basis carry is MBs; don't ship it per chunk
        callback=cb,
        laplace_hessian=hess_path,
    )
    wall_this_attempt = time.time() - t_run0

    # throughput: median sampling-phase chunk duration (excludes the
    # compile-bearing first chunk of every attempt, which shows up as an
    # outlier), plus the conservative total-wall figure
    n_chunks_warm = args.warmup // args.chunk
    samp_durs = [v for k, v in timing.items() if int(k) >= n_chunks_warm]
    warm_durs = [v for k, v in timing.items() if int(k) < n_chunks_warm]
    med = float(np.median(samp_durs)) if samp_durs else float("nan")
    total_known = float(np.sum(list(timing.values())))
    samples_per_s_median = args.chains * args.chunk / med if med == med else None
    samples_per_s_wall = (
        args.chains * args.samples
        / float(np.sum(samp_durs))
        if samp_durs else None
    )

    div = int(np.asarray(post.diagnostics["diverging"]).sum())
    rhat = {k: float(v) for k, v in post.diagnostics.get("rhat", {}).items()}
    ess = {k: float(v) for k, v in post.diagnostics.get("ess", {}).items()}
    result = {
        "config": {
            "nx": 24, "nt": int(np.sum(np.load(
                os.path.join(args.out_dir, "surrogate_lfp.npz"))["time_ms"] < 0)),
            "ntrials": args.ntrials, "ngl": 100,
            "chains": args.chains, "warmup": args.warmup,
            "samples": args.samples, "chunk_size": args.chunk,
        },
        "backend": jax.default_backend(),
        "n_devices": jax.device_count(),
        "samples_per_s_per_chip_median": samples_per_s_median,
        "samples_per_s_per_chip_wall": samples_per_s_wall,
        "median_sampling_chunk_s": med,
        "median_warmup_chunk_s": float(np.median(warm_durs)) if warm_durs else None,
        "total_chunk_wall_s": total_known,
        "divergences": div,
        "mean_leapfrogs_per_sample": float(
            np.asarray(post.diagnostics["num_steps"]).mean()
        ),
        "max_rhat": max(rhat.values()) if rhat else None,
        "min_ess": min(ess.values()) if ess else None,
        "rhat": rhat,
        "ess": ess,
        "step_size": np.asarray(post.diagnostics["step_size"]).tolist(),
        "posterior_mean": {
            k: np.asarray(v).mean(axis=0).tolist() for k, v in post.theta.items()
        },
        "posterior_sd": {
            k: np.asarray(v).std(axis=0).tolist() for k, v in post.theta.items()
        },
    }
    out = os.path.join(args.out_dir, "paper_nuts_auditory.json")
    with open(out + ".tmp", "w") as f:
        json.dump(result, f, indent=1)
    os.replace(out + ".tmp", out)
    print(json.dumps({k: result[k] for k in (
        "samples_per_s_per_chip_median", "samples_per_s_per_chip_wall",
        "divergences", "max_rhat", "min_ess")}), flush=True)
    print(f"DONE -> {out} (this attempt: {wall_this_attempt:.1f} s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
