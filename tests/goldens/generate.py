"""Generate reference-execution goldens for tests/test_reference_golden.py.

Runs the ACTUAL reference implementation (``/root/reference/src/gpcsd``,
numpy/autograd CPU code) on fixed seeded inputs and stores every output we
pin parity on into ``reference_goldens.npz``.  The reference only uses
autograd as a numpy re-export plus ``grad`` (fitting only, not needed for
goldens), so a two-line module shim suffices — no autograd install.

Rerun when the reference is present:  ``python tests/goldens/generate.py``
The .npz is checked in so CI needs neither the reference nor the shim.

Inputs are constructed to exercise the conventions SURVEY.md §5 flags:
/100 parameter scaling lives in fit() (not pinned here), jitter 1e-8/1e-7,
flat Dvec ordering (repeat(lam_s) * tile(lam_t)), heteroscedastic-noise
eigenbasis approximation, unnormalized prior lpdfs, and the
``set_params(l, u)`` InvGamma heuristic.
"""

import json
import os
import sys
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REFERENCE = os.environ.get("GPCSD_REFERENCE", "/root/reference")


def install_autograd_shim():
    ag = types.ModuleType("autograd")

    def grad(f):  # fitting only; never called for goldens
        raise NotImplementedError("autograd shim: grad unavailable")

    ag.grad = grad
    ag_np = types.ModuleType("autograd.numpy")
    ag_np.__dict__.update(np.__dict__)
    ag.numpy = ag_np
    sys.modules["autograd"] = ag
    sys.modules["autograd.numpy"] = ag_np


def main():
    install_autograd_shim()
    # the reference predates scipy 1.14's removal of integrate.trapz
    import scipy.integrate

    if not hasattr(scipy.integrate, "trapz"):
        scipy.integrate.trapz = np.trapz
    sys.path.insert(0, os.path.join(REFERENCE, "src"))
    import gpcsd.covariances as rcov
    import gpcsd.forward_models as rfwd
    import gpcsd.predict_csd as rpred
    import gpcsd.priors as rpri
    import gpcsd.utility_functions as rutil
    from gpcsd.gpcsd1d import GPCSD1D as RefGPCSD1D
    from gpcsd.gpcsd2d import GPCSD2D as RefGPCSD2D

    rng = np.random.default_rng(12345)
    out = {}
    scalars = {}

    # ------------------------------------------------------------------ L0
    A_ = rng.normal(size=(3, 4))
    B_ = rng.normal(size=(2, 5))
    out["mykron_A"] = A_
    out["mykron_B"] = B_
    out["mykron"] = rutil.mykron(A_, B_)

    M = rng.normal(size=(5, 7, 2))
    out["normalize_in"] = M
    out["normalize"] = rutil.normalize(M)

    g1 = np.array([0.0, 1.0, 2.0])
    g2 = np.array([10.0, 20.0])
    eg = rutil.expand_grid(g1, g2)
    out["expand_grid"] = np.asarray(eg)
    red1, red2 = rutil.reduce_grid(np.asarray(eg))
    out["reduce_grid_1"] = np.asarray(red1)
    out["reduce_grid_2"] = np.asarray(red2)

    # comp_eig_D: fixed PSD Ks/Kt, scalar and heteroscedastic sig2n (the
    # reference's het path keeps the Ks eigenbasis — an approximation we
    # deliberately reproduce, SURVEY.md §5)
    xs = np.linspace(0.0, 700.0, 8)[:, None]
    ts = np.arange(12.0)[:, None]
    Ks0 = np.exp(-0.5 * (xs - xs.T) ** 2 / 200.0**2) + 1e-8 * np.eye(8)
    Kt0 = 1.3 * np.exp(-0.5 * (ts - ts.T) ** 2 / 4.0**2) + 1e-8 * np.eye(12)
    out["ceD_Ks"] = Ks0
    out["ceD_Kt"] = Kt0
    sig2n_vec = np.linspace(0.02, 0.09, 8)
    out["ceD_sig2n_vec"] = sig2n_vec
    _, _, D_hom = rutil.comp_eig_D(Ks0, Kt0, 0.05)
    _, _, D_het = rutil.comp_eig_D(Ks0, Kt0, sig2n_vec)
    out["ceD_D_hom"] = np.asarray(D_hom)
    out["ceD_D_het"] = np.asarray(D_het)

    # ------------------------------------------------------------------ L1
    rgrid = np.linspace(-400.0, 400.0, 17)
    out["b_fwd_1d_in"] = rgrid
    out["b_fwd_1d"] = np.asarray(rfwd.b_fwd_1d(rgrid, 150.0))
    d1 = np.linspace(-60.0, 60.0, 5)[:, None]
    d2 = np.linspace(0.0, 300.0, 7)[None, :]
    out["b_fwd_2d_d1"] = d1
    out["b_fwd_2d_d2"] = d2
    out["b_fwd_2d"] = np.asarray(rfwd.b_fwd_2d(d1, d2, 80.0, 1.0))

    z6 = np.linspace(0.0, 700.0, 6)
    t5 = np.arange(5.0)
    csd_small = rng.normal(size=(6, 5))
    out["fwd1d_csd"] = csd_small
    # reference signature: arr (n_source, nt) at x (column!), predict at z
    out["fwd1d"] = np.asarray(
        rfwd.fwd_model_1d(csd_small, z6[:, None], xs.squeeze(), 150.0)
    )

    # 2D forward model: CSD on a dense (z1, z2) grid, predicted at
    # electrode sites (reference signature: arr (nx1, nx2, nt))
    z1 = np.linspace(0.0, 60.0, 4)[:, None]
    z2 = np.linspace(0.0, 300.0, 7)[:, None]
    csd2 = rng.normal(size=(4, 7, 3))
    xgrid = np.asarray(rutil.expand_grid(np.array([16.0, 48.0]),
                                         np.linspace(0.0, 300.0, 5)))
    out["fwd2d_csd"] = csd2
    out["fwd2d_z1"] = z1
    out["fwd2d_z2"] = z2
    out["fwd2d_x"] = xgrid
    out["fwd2d"] = np.asarray(
        rfwd.fwd_model_2d(csd2, z1, z2, xgrid, R=80.0, eps=1.0)
    )

    # ------------------------------------------------------------------ L5
    lfp_t = rng.normal(size=(8, 12, 2))
    out["trad_in"] = lfp_t
    out["trad1d"] = np.asarray(rpred.predictcsd_trad_1d(lfp_t))

    # ------------------------------------------------------------------ L3
    ig = rpri.GPCSDInvGammaPrior()
    pairs = [(1.0, 20.0), (30.0, 100.0), (100.0, 300.0)]
    ab = []
    for l, u in pairs:
        ig.set_params(l, u)
        ab.append([ig.alpha, ig.beta])
    out["invgamma_pairs"] = np.asarray(pairs)
    out["invgamma_alpha_beta"] = np.asarray(ab)
    pts = np.array([0.5, 3.0, 42.0, 250.0])
    ig.set_params(30.0, 100.0)
    out["invgamma_lpdf_pts"] = pts
    out["invgamma_lpdf"] = np.asarray([ig.lpdf(p) for p in pts])
    hn = rpri.GPCSDHalfNormalPrior(0.1)
    out["halfnormal_lpdf"] = np.asarray([hn.lpdf(p) for p in np.array([0.01, 0.1, 0.3])])
    scalars["halfnormal_sd"] = 0.1

    # ------------------------------------------------------------------ L2
    np.random.seed(0)  # constructors draw initial values from priors
    scov = rcov.GPCSD1DSpatialCovSE(xs, a=-200.0, b=900.0, ngl=24)
    scov.params["ell"]["value"] = 200.0
    out["spat1d_gl_x"] = scov.gl_x
    out["spat1d_gl_w"] = scov.gl_w
    out["spat1d_Ks"] = np.asarray(scov.compute_Ks())
    out["spat1d_Kphi"] = np.asarray(scov.compKphi_1d(150.0))
    zq = np.linspace(50.0, 650.0, 5)[:, None]
    out["spat1d_Kphi_xp"] = np.asarray(scov.compKphi_1d(150.0, xp=zq))
    out["spat1d_Kphig"] = np.asarray(scov.compKphig_1d(zq, 150.0))
    scalars["spat1d_ell_min"] = float(scov.params["ell"]["min"])
    scalars["spat1d_ell_max"] = float(scov.params["ell"]["max"])
    scalars["spat1d_ell_prior_alpha"] = float(scov.params["ell"]["prior"].alpha)
    scalars["spat1d_ell_prior_beta"] = float(scov.params["ell"]["prior"].beta)

    tse = rcov.GPCSDTemporalCovSE(ts)
    tse.params["ell"]["value"] = 7.0
    tse.params["sigma2"]["value"] = 1.1
    tma = rcov.GPCSDTemporalCovMatern(ts)
    tma.params["ell"]["value"] = 2.5
    tma.params["sigma2"]["value"] = 0.6
    tstar = np.linspace(0.0, 11.0, 7)[:, None]
    out["tempSE_Kt"] = np.asarray(tse.compute_Kt())
    out["tempSE_Kt_star"] = np.asarray(tse.compute_Kt(tstar))
    out["tempMa_Kt"] = np.asarray(tma.compute_Kt())
    out["tempMa_Kt_star"] = np.asarray(tma.compute_Kt(tstar))
    scalars["tempSE_ell_min"] = float(tse.params["ell"]["min"])
    scalars["tempSE_ell_max"] = float(tse.params["ell"]["max"])
    scalars["tempSE_ell_prior_alpha"] = float(tse.params["ell"]["prior"].alpha)
    scalars["tempSE_ell_prior_beta"] = float(tse.params["ell"]["prior"].beta)
    scalars["tempSE_sigma2_min"] = float(tse.params["sigma2"]["min"])
    scalars["tempSE_sigma2_max"] = float(tse.params["sigma2"]["max"])

    # ------------------------------------------------------------------ L4 1D
    Y = 0.5 * rng.normal(size=(8, 12, 3))
    out["m1_Y"] = Y
    np.random.seed(1)
    m1 = RefGPCSD1D(Y, xs, ts, a=-200.0, b=900.0, ngl=24,
                    spatial_cov=scov, temporal_cov_list=[tse, tma])
    m1.R["value"] = 150.0
    m1.sig2n["value"] = 0.05
    scalars["m1_loglik_hom"] = float(m1.loglik())
    scalars["m1_R_min"] = float(m1.R["min"])
    scalars["m1_R_max"] = float(m1.R["max"])
    scalars["m1_R_prior_alpha"] = float(m1.R["prior"].alpha)
    scalars["m1_R_prior_beta"] = float(m1.R["prior"].beta)
    scalars["m1_sig2n_min"] = float(m1.sig2n["min"])
    scalars["m1_sig2n_max"] = float(m1.sig2n["max"])

    # reference predict's Ktstar orientation assumes t* == t (its only
    # in-repo usage, e.g. fit_gpcsd_baseline.py:104); pin goldens there
    m1.predict(zq, ts, type="both")
    out["m1_csd_pred"] = np.asarray(m1.csd_pred)
    out["m1_lfp_pred"] = np.asarray(m1.lfp_pred)
    out["m1_csd_pred_c0"] = np.asarray(m1.csd_pred_list[0])
    out["m1_csd_pred_c1"] = np.asarray(m1.csd_pred_list[1])

    # heteroscedastic noise variant (per-channel sig2n list)
    np.random.seed(2)
    m1h = RefGPCSD1D(
        Y, xs, ts, a=-200.0, b=900.0, ngl=24,
        spatial_cov=scov, temporal_cov_list=[tse, tma],
        sig2n_prior=[rpri.GPCSDHalfNormalPrior(0.1) for _ in range(8)],
    )
    m1h.R["value"] = 150.0
    m1h.sig2n["value"] = sig2n_vec
    scalars["m1_loglik_het"] = float(m1h.loglik())

    # ------------------------------------------------------------------ L4 2D
    np.random.seed(3)
    x1 = np.array([16.0, 48.0])
    x2 = np.linspace(0.0, 300.0, 5)
    xg = np.asarray(rutil.expand_grid(x1, x2))
    Y2 = 0.5 * rng.normal(size=(10, 9, 2))
    out["m2_Y"] = Y2
    t2 = np.arange(9.0)[:, None]
    m2 = RefGPCSD2D(Y2, xg, t2, a1=0.0, b1=64.0, a2=-50.0, b2=350.0,
                    ngl1=8, ngl2=12, eps=1.0)
    m2.R["value"] = 80.0
    m2.spatial_cov.params["ell1"]["value"] = 30.0
    m2.spatial_cov.params["ell2"]["value"] = 100.0
    m2.temporal_cov_list[0].params["ell"]["value"] = 4.0
    m2.temporal_cov_list[0].params["sigma2"]["value"] = 1.0
    m2.temporal_cov_list[1].params["ell"]["value"] = 1.5
    m2.temporal_cov_list[1].params["sigma2"]["value"] = 0.5
    m2.sig2n["value"] = 0.1
    scalars["m2_loglik"] = float(m2.loglik())
    scalars["m2_R_prior_alpha"] = float(m2.R["prior"].alpha)
    scalars["m2_R_prior_beta"] = float(m2.R["prior"].beta)
    scalars["m2_ell1_min"] = float(m2.spatial_cov.params["ell1"]["min"])
    scalars["m2_ell1_max"] = float(m2.spatial_cov.params["ell1"]["max"])
    scalars["m2_ell2_min"] = float(m2.spatial_cov.params["ell2"]["min"])
    scalars["m2_ell2_max"] = float(m2.spatial_cov.params["ell2"]["max"])
    out["m2_x"] = xg
    out["m2_Kphi"] = np.asarray(
        m2.spatial_cov.compKphi_2d(m2.R["value"], 1.0)
    )
    zg = np.asarray(rutil.expand_grid(np.array([32.0]), np.linspace(0.0, 300.0, 4)))
    out["m2_z"] = zg
    out["m2_Kphig"] = np.asarray(
        m2.spatial_cov.compKphig_2d(zg, m2.R["value"], 1.0)
    )

    np.savez(os.path.join(HERE, "reference_goldens.npz"), **out)
    with open(os.path.join(HERE, "reference_scalars.json"), "w") as f:
        json.dump(scalars, f, indent=1, sort_keys=True)
    print(f"wrote {len(out)} arrays, {len(scalars)} scalars")


if __name__ == "__main__":
    main()
