"""Thin alias for the unified paper-run driver (VERDICT r4 #7).

The round-4 rescue fork duplicated ``paper_nuts_run.py``'s run loop with
a weaker artifact schema (no truth / posterior sd / quantiles) — and the
round's best result (the first healthy paper-scale posterior: max_rhat
1.0011, 0 divergences, 6.90 samples/s/chip) landed in that weaker format.
The dense-mass / pooled-whitening options now live in the primary driver;
this shim just maps the old flags onto it so existing retry loops keep
working.

    python scripts/paper_nuts_rescue.py --paper-dir results/paper_nuts \
        --out-dir results/paper_nuts_rescue --dense-mass

is equivalent to

    python scripts/paper_nuts_run.py --out-dir results/paper_nuts_rescue \
        --inputs-from results/paper_nuts --dense-mass --pool-warmup \
        --hessian pooled --pooled-from results/paper_nuts
"""

from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    paper_dir = "results/paper_nuts"
    out = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--paper-dir":
            paper_dir = argv[i + 1]
            i += 2
            continue
        if a.startswith("--paper-dir="):
            paper_dir = a.split("=", 1)[1]
            i += 1
            continue
        if a == "--hessian":  # map->map, pooled->pooled (same names)
            out += [a, argv[i + 1]]
            i += 2
            continue
        out.append(a)
        i += 1
    if "--out-dir" not in " ".join(out):
        out += ["--out-dir", "results/paper_nuts_rescue"]
    out += ["--inputs-from", paper_dir, "--pool-warmup"]
    if "--hessian" not in " ".join(out):
        out += ["--hessian", "pooled"]
    if "pooled" in " ".join(out) and "--pooled-from" not in " ".join(out):
        out += ["--pooled-from", paper_dir]
    from scripts.paper_nuts_run import main as run_main

    sys.argv = [sys.argv[0]] + out
    print("paper_nuts_rescue (alias) -> paper_nuts_run", out, flush=True)
    return run_main()


if __name__ == "__main__":
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    sys.exit(main())
