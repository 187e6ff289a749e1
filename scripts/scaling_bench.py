"""Multi-device scaling harness: sharded NUTS samples/s vs mesh size.

The BASELINE.json north star asks for samples/s measured at 1 chip, 1 host,
and N>=2 hosts with >=80% scaling.  Real ICI numbers need a pod slice; this
harness runs the identical program over any mesh — by default an 8-way
virtual CPU device mesh (``--virtual 8``), which validates the collective
structure and measures the scaling of everything except the interconnect.

Usage:
    python scripts/scaling_bench.py --virtual 8 --chains 8 --nt 60
    python scripts/scaling_bench.py            # real devices, all of them
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--virtual", type=int, default=0,
                   help="force N virtual CPU devices (0 = use real devices)")
    p.add_argument("--chains", type=int, default=8)
    p.add_argument("--nx", type=int, default=12)
    p.add_argument("--nt", type=int, default=60)
    p.add_argument("--ntrials", type=int, default=16)
    p.add_argument("--num-warmup", type=int, default=50)
    p.add_argument("--num-samples", type=int, default=50)
    p.add_argument("--weak", action="store_true",
                   help="weak scaling: chains = --chains per device")
    p.add_argument("--trial-shard", action="store_true",
                   help="strong-scale the trial-psum likelihood instead: "
                        "value+grad evals/s of the trial-sharded log-joint "
                        "over 1/2/.../N trial devices at fixed total trials")
    p.add_argument("--neuropixels", action="store_true",
                   help="use the GPCSD2D Neuropixels shape (nx=69, nt=375, "
                        "ngl 30x120) — the regime where trial sharding is "
                        "PREDICTED to win (the nt=375 eigh is amortized "
                        "over a 3600-point quadrature Gram; VERDICT r4 "
                        "next #8); --ntrials controls the trial count")
    p.add_argument("--json-out", default=None,
                   help="write the result dict to this path")
    args = p.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import gpcsd_tpu as g
    from gpcsd_tpu.parallel.mesh import make_mesh
    from gpcsd_tpu.parallel.sharded import nuts_sharded

    rng = np.random.default_rng(0)
    if args.neuropixels:
        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        from scripts.bench_2d import build_problem

        m = build_problem(seed=0)
        m.lfp = rng.normal(size=(m.lfp.shape[0], m.lfp.shape[1],
                                 args.ntrials)) * 0.3
    else:
        x = (np.arange(args.nx) * 100.0).reshape(-1, 1)
        t = np.arange(args.nt).reshape(-1, 1) * 1.0
        m = g.GPCSD1D(
            rng.normal(size=(args.nx, args.nt, args.ntrials)) * 0.3,
            x, t, ngl=30,
        )
        m.R["value"] = 120.0
        m.spatial_cov.params["ell"]["value"] = 180.0
        m.temporal_cov_list[0].params["ell"]["value"] = 5.0
        m.temporal_cov_list[0].params["sigma2"]["value"] = 0.8
        m.temporal_cov_list[1].params["ell"]["value"] = 2.0
        m.temporal_cov_list[1].params["sigma2"]["value"] = 0.4
        m.sig2n["value"] = 0.05
    fns = m._fns()
    Y = np.asarray(m._Y())

    ndev = len(jax.devices())
    results = {}
    nd = 1
    sizes = []
    while nd <= ndev:
        sizes.append(nd)
        nd *= 2

    if args.trial_shard:
        # strong scaling of the data axis: one likelihood gradient, trials
        # split over the mesh, ONE psum per eval (parallel/sharded.py) — the
        # multi-chip path for few-chain / many-trial fits
        from functools import partial

        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        from gpcsd_tpu.parallel.mesh import pad_to_multiple
        from gpcsd_tpu.parallel.sharded import make_trial_sharded_log_prob

        u0 = np.asarray(fns.param_set.pack(m._theta()))
        n_iters = 40 if not args.neuropixels else 10
        us = jnp.asarray(
            u0[None, :]
            + 0.01 * np.random.default_rng(1).normal(size=(n_iters, u0.size))
        )
        # overhead decomposition (single device): the replicated share —
        # covariance build + both eigendecompositions, identical on every
        # trial device — vs the full eval.  Trial sharding scales only the
        # contraction, so ``1 - replicated_share`` bounds its usefulness;
        # on a core-saturated virtual mesh this RATIO (not the absolute
        # evals/s) is the design-claim check (VERDICT r4 next #8).
        fac = jax.jit(
            lambda u: fns.build_factors(fns.param_set.unpack(u)).d
        )
        fac(us[0]).block_until_ready()
        t0 = time.time()
        for i in range(n_iters):
            out = fac(us[i])
        out.block_until_ready()
        t_replicated = (time.time() - t0) / n_iters
        results["replicated_factors_ms"] = round(t_replicated * 1e3, 2)
        for n_trial_dev in sizes:
            mesh = make_mesh(chain=1, trial=n_trial_dev,
                             devices=jax.devices()[:n_trial_dev])
            Yp, ntrials = pad_to_multiple(Y, n_trial_dev)
            lp = make_trial_sharded_log_prob(fns, ntrials)

            @jax.jit
            @partial(jax.shard_map, mesh=mesh,
                     in_specs=(P(), P("trial")), out_specs=(P(), P()))
            def vg(u, Y_block):
                return jax.value_and_grad(lambda uu: -lp(uu, Y_block))(u)

            Yp = jnp.asarray(Yp)
            f, g = vg(us[0], Yp)
            f.block_until_ready()  # compile
            t0 = time.time()
            for i in range(n_iters):
                f, g = vg(us[i], Yp)
            f.block_until_ready()
            wall = time.time() - t0
            results[n_trial_dev] = {
                "ntrials": int(ntrials),
                "evals_per_s": round(n_iters / wall, 2),
            }
            print(f"trial_devices={n_trial_dev}: {results[n_trial_dev]}",
                  flush=True)
        base = results[sizes[0]]["evals_per_s"]
        t_total_1dev = 1.0 / base
        results["replicated_share_1dev"] = round(
            min(t_replicated / t_total_1dev, 1.0), 3
        )
        results["scalable_share_1dev"] = round(
            max(1.0 - t_replicated / t_total_1dev, 0.0), 3
        )
        for ndv in sizes:
            results[ndv]["speedup_vs_1dev"] = round(
                results[ndv]["evals_per_s"] / base, 3
            )
        print(json.dumps(results))
        if args.json_out:
            with open(args.json_out, "w") as f:
                json.dump(results, f, indent=1)
        return

    for n_chain_dev in sizes:
        trial_dev = 1
        mesh = make_mesh(chain=n_chain_dev, trial=trial_dev,
                         devices=jax.devices()[: n_chain_dev * trial_dev])
        # weak scaling (the north-star shape): per-device chain load is
        # constant, total chains grow with the mesh
        n_chains = (
            args.chains * n_chain_dev if args.weak else args.chains
        )

        def run():
            return nuts_sharded(
                fns, Y, mesh, jax.random.PRNGKey(1),
                n_chains=n_chains, num_warmup=args.num_warmup,
                num_samples=args.num_samples, max_depth=6,
            )

        run()  # compile (and warm allocator) — excluded from timing
        t0 = time.time()
        run()
        wall = time.time() - t0
        total_samples = n_chains * args.num_samples
        results[n_chain_dev] = {
            "n_chains": n_chains,
            "wall_s": round(wall, 2),
            "samples_per_s": round(total_samples / wall, 2),
        }
        print(f"chain_devices={n_chain_dev}: {results[n_chain_dev]}", flush=True)

    base = results[sizes[0]]["samples_per_s"]
    for ndv in sizes:
        eff = results[ndv]["samples_per_s"] / (base * ndv)
        results[ndv]["scaling_efficiency"] = round(eff, 3)
    print(json.dumps(results))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
