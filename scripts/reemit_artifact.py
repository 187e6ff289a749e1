"""Recompute a paper-run artifact's convergence diagnostics from its saved
draws and rewrite the JSON in place.

Why: the run driver computes R-hat/ESS with whatever diagnostics code the
*final resume attempt's* process imported; after a diagnostics upgrade
(e.g. the round-5 rank-normalized bulk/tail ESS) a completed artifact can
lag the committed estimator.  ``posterior_samples.npz`` stores the full
unconstrained draws (``raw_u``: chains x samples x dim — the same array
``inference_api`` feeds the estimators), so every diagnostic is exactly
recomputable post hoc.

    python scripts/reemit_artifact.py results/paper_nuts_dense
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def param_names(dim, art):
    """Flat unconstrained-space names matching ParamSet.names_flat() for
    the paper configuration (6 kernel params + per-channel sig2n)."""
    names = list(art.get("rhat", {}).keys())
    if len(names) == dim:
        return names
    base = ["R", "ell", "tm0_ell", "tm0_sigma2", "tm1_ell", "tm1_sigma2"]
    return base + [f"sig2n[{i}]" for i in range(dim - len(base))]


def reemit(run_dir):
    from gpcsd_tpu.infer.diagnostics import ess_bulk, ess_tail, rhat

    art_path = os.path.join(run_dir, "paper_nuts_auditory.json")
    samp_path = os.path.join(run_dir, "posterior_samples.npz")
    with open(art_path) as f:
        art = json.load(f)
    with np.load(samp_path) as d:
        u = np.asarray(d["raw_u"], dtype=np.float64)  # (chains, S, dim)
    names = param_names(u.shape[-1], art)

    r = dict(zip(names, (float(v) for v in rhat(u))))
    eb = dict(zip(names, (float(v) for v in ess_bulk(u))))
    et = dict(zip(names, (float(v) for v in ess_tail(u))))
    art["rhat"] = r
    art["ess"] = eb
    art["ess_tail"] = et
    art["max_rhat"] = max(r.values())
    art["min_ess"] = min(eb.values())
    art["min_ess_tail"] = min(et.values())
    art["diagnostics_reemitted"] = "rank-normalized (Vehtari et al. 2021)"
    with open(art_path + ".tmp", "w") as f:
        json.dump(art, f, indent=1)
    os.replace(art_path + ".tmp", art_path)
    print(json.dumps({
        "dir": run_dir, "max_rhat": art["max_rhat"],
        "min_ess": art["min_ess"], "min_ess_tail": art["min_ess_tail"],
    }))


if __name__ == "__main__":
    for run_dir in sys.argv[1:] or ["results/paper_nuts_dense"]:
        reemit(run_dir)
