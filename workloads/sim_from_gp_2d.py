"""2D simulate-and-recover study.

Parity target: ``/root/reference/simulation_studies/sim_from_gp_2D.py`` —
generate CSD from a GPCSD2D prior on a dense 2D grid, forward-model to a
sparse electrode grid, add noise; (a) oracle-predict with the generator
params as a sanity check, (b) fit a fresh GPCSD2D and compare CSD recovery
(RMSE / R^2) against the traditional columnwise-CSD baseline.

Run: ``python -m workloads.sim_from_gp_2d [--quick]``
"""

from __future__ import annotations

import argparse

import numpy as np

import gpcsd_tpu as g
from gpcsd_tpu.models.covariances import GPCSDTemporalCovMatern, GPCSDTemporalCovSE
from gpcsd_tpu.ops.forward import fwd_model_2d
from gpcsd_tpu.utils.grids import expand_grid

from .common import mse, r2, report

TRUE = dict(R=30.0, ell1=40.0, ell2=100.0, se_s2=20.0, se_ell=5.0,
            m_s2=10.0, m_ell=1.0, sig2n=0.5, eps=10.0)


def run(nt=30, ntrials=3, nz1=12, nz2=100, nx1=4, nx2=25, ngl1=15, ngl2=40,
        n_restarts=5, seed=8, results_dir=None):
    a1, b1 = 0.0, 60.0
    a2, b2 = 0.0, 1000.0
    t = np.linspace(0, 20, nt).reshape(-1, 1)
    z1 = np.linspace(a1, b1, nz1)
    z2 = np.linspace(a2, b2, nz2)
    z_grid = expand_grid(z1, z2)
    x1 = np.linspace(a1, b1, nx1)
    x2 = np.linspace(a2, b2, nx2)
    x_grid = expand_grid(x1, x2)

    tcovs = [GPCSDTemporalCovSE(t), GPCSDTemporalCovMatern(t)]
    gen = g.GPCSD2D(
        np.zeros((z_grid.shape[0], nt, 1)), z_grid, t,
        a1=a1, b1=b1, a2=a2, b2=b2, ngl1=ngl1, ngl2=ngl2,
        temporal_cov_list=tcovs, eps=TRUE["eps"],
    )
    gen.R["value"] = TRUE["R"]
    gen.sig2n["value"] = TRUE["sig2n"]
    gen.spatial_cov.params["ell1"]["value"] = TRUE["ell1"]
    gen.spatial_cov.params["ell2"]["value"] = TRUE["ell2"]
    gen.temporal_cov_list[0].params["ell"]["value"] = TRUE["se_ell"]
    gen.temporal_cov_list[0].params["sigma2"]["value"] = TRUE["se_s2"]
    gen.temporal_cov_list[1].params["ell"]["value"] = TRUE["m_ell"]
    gen.temporal_cov_list[1].params["sigma2"]["value"] = TRUE["m_s2"]

    csd_dense, _ = gen.sample_prior(ntrials, type="csd", seed=seed)
    csd_rect = csd_dense.reshape(nz1, nz2, nt, ntrials)
    lfp = np.asarray(
        fwd_model_2d(
            np.moveaxis(csd_rect, 3, 0),  # (ntrials, nz1, nz2, nt)
            z1, z2, x_grid, TRUE["R"], TRUE["eps"],
        )
    )  # (ntrials, nxgrid, nt)
    lfp = np.moveaxis(lfp, 0, 2)
    rng = np.random.default_rng(seed + 1)
    lfp = lfp + np.sqrt(TRUE["sig2n"]) * rng.normal(size=lfp.shape)

    # oracle prediction from the generator (reference ``sim_from_gp_2D.py:93-98``)
    gen.update_lfp(lfp, t, x_grid)
    gen.predict(z_grid, t, type="csd")
    oracle = gen.csd_pred

    # fresh fit
    model = g.GPCSD2D(
        lfp, x_grid, t, a1=a1, b1=b1, a2=a2, b2=b2, ngl1=ngl1, ngl2=ngl2,
        eps=TRUE["eps"],
    )
    model.fit(n_restarts=n_restarts, seed=seed)
    model.predict(z_grid, t, type="csd")
    fitted = model.csd_pred

    # tCSD on the sparse grid (columns = dim 2)
    tcsd = g.predictcsd_trad_2d(lfp.reshape(nx1, nx2, nt, ntrials))

    def norm(v):
        s = np.nanmax(np.abs(v))
        return v / s

    truth_n = norm(csd_dense)
    metrics = {
        "oracle_rmse": float(np.sqrt(mse(norm(oracle), truth_n))),
        "oracle_r2": float(r2(norm(oracle), truth_n)),
        "fitted_rmse": float(np.sqrt(mse(norm(fitted), truth_n))),
        "fitted_r2": float(r2(norm(fitted), truth_n)),
        "fitted_R": float(model.R["value"]),
        "fitted_ell1": float(model.spatial_cov.params["ell1"]["value"]),
        "fitted_ell2": float(model.spatial_cov.params["ell2"]["value"]),
        "tcsd_shape_ok": list(tcsd.shape),
    }
    report("sim_from_gp_2d", metrics, results_dir)
    if results_dir:
        _figure(z1, z2, nz1, nz2, nt, truth_n, norm(oracle), norm(fitted),
                results_dir)
    return metrics, model


def _figure(z1, z2, nz1, nz2, nt, truth_n, oracle_n, fitted_n, results_dir):
    """2D recovery snapshot (reference ``sim_from_gp_2D.py`` visual check):
    truth / oracle / fitted CSD over the probe plane at the time of peak
    CSD power, trial 0."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from .common import maybe_savefig

    tr = 0
    truth_r = truth_n.reshape(nz1, nz2, nt, -1)[:, :, :, tr]
    ti = int(np.argmax(np.sum(truth_r**2, axis=(0, 1))))
    panels = [
        ("true CSD", truth_r[:, :, ti]),
        ("oracle", oracle_n.reshape(nz1, nz2, nt, -1)[:, :, ti, tr]),
        ("fitted", fitted_n.reshape(nz1, nz2, nt, -1)[:, :, ti, tr]),
    ]
    fig, axes = plt.subplots(1, 3, figsize=(10.5, 4))
    vmax = max(np.abs(p[1]).max() for p in panels)
    extent = [z2[0], z2[-1], z1[-1], z1[0]]
    for ax, (name, v) in zip(axes, panels):
        im = ax.imshow(v, aspect="auto", extent=extent, cmap="bwr",
                       vmin=-vmax, vmax=vmax)
        ax.set_title(f"{name} (t index {ti})")
        ax.set_xlabel("depth dim 2 (um)")
    axes[0].set_ylabel("dim 1 (um)")
    fig.colorbar(im, ax=axes, shrink=0.8)
    maybe_savefig(fig, results_dir, "sim_from_gp_2d.png")
    plt.close(fig)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--results-dir", default=None)
    args = p.parse_args()
    if args.quick:
        run(nt=15, nz2=50, nx2=15, ngl1=10, ngl2=25, n_restarts=2,
            results_dir=args.results_dir)
    else:
        run(results_dir=args.results_dir)


if __name__ == "__main__":
    main()
