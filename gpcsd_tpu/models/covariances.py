"""Covariance components: reference-compatible objects over functional ops.

These classes mirror the constructor/params-dict API of
``/root/reference/src/gpcsd/covariances.py`` (``GPCSD1DSpatialCovSE``
``:29-96``, ``GPCSD2DSpatialCovSE`` ``:142-232``, ``GPCSDTemporalCovSE``
``:240-271``, ``GPCSDTemporalCovMatern`` ``:274-305``) so reference users can
switch without rewriting model setup.  All math delegates to the pure ops in
:mod:`gpcsd_tpu.ops`; the objects only hold static geometry (quadrature rule,
electrode coordinates) and the params/prior dicts.

Each param entry is ``{'value', 'prior', 'min', 'max'}`` exactly as in the
reference, so pickled parameter dicts round-trip between the two frameworks.
"""

from __future__ import annotations

import numpy as np


from ..ops import spatial as sp_ops
from ..ops import kernels as k_ops
from ..ops.quadrature import gauss_legendre, gauss_legendre_2d
from ..utils.grids import reduce_grid
from .priors import InvGamma, HalfNormal

_rng = np.random.default_rng(0)


def _prior_draw(prior):
    """Host-side draw used only for default param initialization."""
    import jax.random as jr

    key = jr.PRNGKey(int(_rng.integers(0, 2**31 - 1)))
    return float(prior.sample(key))


def _flat(x):
    return np.asarray(x).reshape(-1)


def _interval_prior(lb, ub):
    """Default-prior helper: reference-heuristic InvGamma over [lb, ub].

    Tiny grids can make the heuristic interval degenerate (e.g. three evenly
    spaced sites give ``2*min(diff) == range``); the reference silently
    divides by zero there (``priors.py:31``).  We instead widen the upper end
    so the default prior stays finite — user-supplied priors are unaffected.
    """
    lb, ub = float(lb), float(ub)
    if not ub > lb:
        ub = 2.0 * abs(lb) if lb != 0 else 1.0
    return InvGamma.from_interval(lb, ub)


class GPCSD1DSpatialCov:
    def __init__(self, x, a=None, b=None, ngl=100):
        self.x = np.asarray(x).reshape(-1, 1)
        xf = _flat(x)
        self.a = float(np.min(xf)) if a is None else float(a)
        self.b = float(np.max(xf)) if b is None else float(b)
        self.ngl = int(ngl)
        rule = gauss_legendre(self.a, self.b, self.ngl)
        self.gl_x = rule.x
        self.gl_w = rule.w


class GPCSD1DSpatialCovSE(GPCSD1DSpatialCov):
    """SE spatial covariance with the forward model folded in by quadrature."""

    kind = "se"

    def __init__(self, x, ell_prior=None, a=None, b=None, ngl=100):
        super().__init__(x, a=a, b=b, ngl=ngl)
        xf = _flat(x)
        if ell_prior is None:
            lb = 1.2 * np.min(np.diff(xf))
            ub = 0.8 * (np.max(xf) - np.min(xf))
            ell_prior = _interval_prior(lb, ub)
        ell_min = 0.5 * np.min(np.diff(xf))
        ell_max = np.max(xf) - np.min(xf)
        self.params = {
            "ell": {
                "value": _prior_draw(ell_prior),
                "prior": ell_prior,
                "min": float(ell_min),
                "max": float(ell_max),
            }
        }

    def compute_Ks(self):
        """CSD-space spatial correlation at the electrode sites (nx, nx)."""
        ell = self.params["ell"]["value"]
        return k_ops.se(self.x, self.x, ell)

    def compKphig_1d(self, z, R):
        """LFP-CSD spatial cross covariance (nx, nz)."""
        ell = self.params["ell"]["value"]
        return sp_ops.kphig_1d(self.x, _flat(z), self.gl_x, self.gl_w, ell, R)

    def compKphi_1d(self, R, xp=None):
        """LFP-LFP spatial covariance (nx, nxp)."""
        ell = self.params["ell"]["value"]
        xpf = None if xp is None else _flat(xp)
        return sp_ops.kphi_1d(self.x, self.gl_x, self.gl_w, ell, R, xp=xpf)


class GPCSD2DSpatialCov:
    def __init__(self, x, a1, b1, a2, b2, ngl1, ngl2):
        self.x = np.asarray(x)
        self.a1, self.b1, self.a2, self.b2 = a1, b1, a2, b2
        self.ngl1, self.ngl2 = int(ngl1), int(ngl2)
        rule = gauss_legendre_2d(a1, b1, a2, b2, self.ngl1, self.ngl2)
        self.gl_x_grid = rule.xy  # (ngl1*ngl2, 2)
        self.gl_w_prod = rule.w  # (ngl1*ngl2,)
        self._recompute_deltas()

    def _recompute_deltas(self):
        self.delta_w = np.asarray(sp_ops.pairwise_w(self.x, self.gl_x_grid))

    def reset_x(self, x_new):
        self.x = np.asarray(x_new)
        self._recompute_deltas()


class GPCSD2DSpatialCovSE(GPCSD2DSpatialCov):
    kind = "se2d"

    def __init__(
        self,
        x,
        ell_prior1=None,
        ell_prior2=None,
        a1=None,
        b1=None,
        a2=None,
        b2=None,
        ngl1=100,
        ngl2=100,
    ):
        x = np.asarray(x)
        if a1 is None:
            a1 = float(np.min(x[:, 0]))
        if b1 is None:
            b1 = float(np.max(x[:, 0]))
        if a2 is None:
            a2 = float(np.min(x[:, 1]))
        if b2 is None:
            b2 = float(np.max(x[:, 1]))
        super().__init__(x, a1, b1, a2, b2, ngl1, ngl2)
        x1, x2 = reduce_grid(x)
        if ell_prior1 is None:
            lb = 2.0 * np.min(np.diff(x1))
            ub = 2.0 * (np.max(x1) - np.min(x1))
            ell_prior1 = _interval_prior(lb, ub)
        if ell_prior2 is None:
            lb = 2.0 * np.min(np.diff(x2))
            ub = np.max(x2) - np.min(x2)
            ell_prior2 = _interval_prior(lb, ub)
        # bound conventions follow the reference (``covariances.py:166-171``)
        self.params = {
            "ell1": {
                "value": _prior_draw(ell_prior1),
                "prior": ell_prior1,
                "min": float(np.min(np.diff(x1))),
                "max": float(5.0 * np.max(x1) - np.min(x1)),
            },
            "ell2": {
                "value": _prior_draw(ell_prior2),
                "prior": ell_prior2,
                "min": float(np.min(np.diff(x2))),
                "max": float(np.max(x2) - np.min(x2)),
            },
        }

    def compute_Ks(self):
        ell1 = self.params["ell1"]["value"]
        ell2 = self.params["ell2"]["value"]
        return k_ops.se_2d(self.x, self.x, ell1, ell2)

    def compKphig_2d(self, z, R, eps):
        ell1 = self.params["ell1"]["value"]
        ell2 = self.params["ell2"]["value"]
        return sp_ops.kphig_2d(
            self.delta_w, self.gl_x_grid, np.asarray(z), self.gl_w_prod, ell1, ell2, R, eps
        )

    def compKphi_2d(self, R, eps, xp=None):
        ell1 = self.params["ell1"]["value"]
        ell2 = self.params["ell2"]["value"]
        dwp = None
        if xp is not None:
            dwp = sp_ops.pairwise_w(np.asarray(xp), self.gl_x_grid)
        return sp_ops.kphi_2d(
            self.delta_w, self.gl_x_grid, self.gl_w_prod, ell1, ell2, R, eps, delta_w_p=dwp
        )


class GPCSDTemporalCov:
    def __init__(self, t):
        self.t = np.asarray(t).reshape(-1, 1)

    def _default_params(self, ell_prior, sigma2_prior, sigma2_min):
        tf = _flat(self.t)
        if ell_prior is None:
            lb = 1.2 * np.min(np.diff(tf))
            ub = 0.8 * (np.max(tf) - np.min(tf))
            ell_prior = _interval_prior(lb, ub)
        if sigma2_prior is None:
            sigma2_prior = HalfNormal(1.0)
        self.params = {
            "ell": {
                "value": _prior_draw(ell_prior),
                "prior": ell_prior,
                "min": float(0.5 * np.min(np.diff(tf))),
                "max": float(np.max(tf) - np.min(tf)),
            },
            "sigma2": {
                "value": _prior_draw(sigma2_prior),
                "prior": sigma2_prior,
                "min": sigma2_min,
                "max": np.inf,
            },
        }

    def compute_Kt(self, t=None, tprime=None):
        ell = self.params["ell"]["value"]
        sigma2 = self.params["sigma2"]["value"]
        t = self.t if t is None else np.asarray(t)
        tprime = self.t if tprime is None else np.asarray(tprime)
        return k_ops.TEMPORAL_KERNELS[self.kind](t, tprime, ell, sigma2)


class GPCSDTemporalCovSE(GPCSDTemporalCov):
    kind = "se"

    def __init__(self, t, ell_prior=None, sigma2_prior=None):
        super().__init__(t)
        self._default_params(ell_prior, sigma2_prior, sigma2_min=1e-8)


class GPCSDTemporalCovMatern(GPCSDTemporalCov):
    kind = "matern"

    def __init__(self, t, ell_prior=None, sigma2_prior=None):
        super().__init__(t)
        self._default_params(ell_prior, sigma2_prior, sigma2_min=0.0)
