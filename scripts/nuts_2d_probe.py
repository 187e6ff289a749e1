"""GPCSD2D NUTS throughput probe at the Neuropixels size (TPU).

BASELINE.json config 5 asks for the 2D model under the samplers "at scale".
This drives the full production sampler stack (Laplace-whitened, chunked,
crash-resumable NUTS through ``InferenceAPIMixin.sample_posterior``) on the
largest reference problem — nx=69 channels, nt=375, 100 trials, ngl 30x120
(reference ``neuropixels/fit_gpcsd2d.py:77-91``) — and records
samples/s/chip.  A short run by paper-run standards (default 4 x (20+20)):
the purpose is mechanical viability + throughput of 2D NUTS on the chip,
not a converged posterior (that is the 1D paper run's job; a full 2D
posterior is a straight --warmup/--samples bump away with resume).

Usage (resumable; rerun until it prints DONE):

    for i in $(seq 1 10); do
        timeout 1500 python scripts/nuts_2d_probe.py --max-seconds 1250 && break
    done
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="results/nuts_2d")
    ap.add_argument("--chains", type=int, default=4)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--samples", type=int, default=20)
    ap.add_argument("--chunk", type=int, default=1)
    ap.add_argument("--max-depth", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-seconds", type=float, default=None)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    t0_process = time.time()

    from scripts.bench_2d import build_problem

    import jax  # noqa: F401

    m = build_problem(seed=args.seed)

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

    try:
        post = m.sample_posterior(
            n_chains=args.chains,
            num_warmup=args.warmup,
            num_samples=args.samples,
            seed=args.seed,
            chunk_size=args.chunk,
            max_depth=args.max_depth,
            state_path=os.path.join(args.out_dir, "nuts_state"),
            save_every=save_every,
            callback=cb,
        )
    except _TimeBudget:
        print("time budget reached — checkpointed; rerun to continue", flush=True)
        return 3

    n_chunks_warm = args.warmup // args.chunk
    samp = [v for k, v in timing.items() if int(k) >= n_chunks_warm]
    med = float(np.median(samp)) if samp else float("nan")
    result = {
        "config": {
            "nx": 69, "nt": 375, "ntrials": 100, "ngl": [30, 120],
            "chains": args.chains, "warmup": args.warmup,
            "samples": args.samples, "max_depth": args.max_depth,
        },
        "backend": __import__("jax").default_backend(),
        "samples_per_s_per_chip_median": args.chains * args.chunk / med,
        "median_sampling_chunk_s": med,
        "mean_leapfrogs_per_sample": float(
            np.asarray(post.diagnostics["num_steps"]).mean()
        ),
        "divergences": int(np.asarray(post.diagnostics["diverging"]).sum()),
        "step_size": np.asarray(post.diagnostics["step_size"]).tolist(),
    }
    out = os.path.join(args.out_dir, "nuts_2d_probe.json")
    with open(out + ".tmp", "w") as f:
        json.dump(result, f, indent=1)
    os.replace(out + ".tmp", out)
    print(json.dumps({k: result[k] for k in (
        "samples_per_s_per_chip_median", "mean_leapfrogs_per_sample",
        "divergences")}), flush=True)
    print(f"DONE -> {out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
