"""Amplitude reparameterization for the GPCSD hyperparameter posterior.

The round-4 paper-run diagnosis (PERF.md) names the posterior's hard
direction exactly: the pooled-draw covariance's top eigenvector is
``0.67 tm0_sigma2 - 0.53 R + 0.33 tm1_sigma2`` (u = log space) — the
forward-amplitude degeneracy.  ``R`` rescales the quadrature operator's
gain while the temporal sigma2's rescale CSD variance, so total LFP
signal power is nearly constant along a CURVED ridge that no constant
linear whitening (MAP Hessian, pooled covariance) unbends; the dense
warmup metric absorbs its local direction but still pays depth-7
trajectories to traverse its length.

This module removes the ridge at the source by sampling coordinates in
which the tightly-identified quantity is an axis:

    v_P = log( tr(Ks(R, ell)) / nx ) + logsumexp_k( log sigma2_k )
    v_dk = log sigma2_k - log sigma2_0         (k = 1..K-1)
    v_j = u_j                                  (every other coordinate)

``tr(Ks)/nx`` is the mean per-channel LFP-space signal variance implied
by UNIT total temporal sigma2 through the model's own quadrature
amplitude convention (reference ``covariances.py:74-96`` R-gain), so
``exp(v_P)`` is the exact mean signal variance per channel — the
quantity the data pins to a few percent while R/ell/ratios stay weakly
identified.  The map is a closed-form bijection: given (v_R, v_ell),
``g = log(tr Ks / nx)`` is recomputed forward and the sigma2 logs are
recovered by a softmax split of ``v_P - g`` over the ratio coordinates.

The Jacobian is UNIMODULAR (|det| = 1): ordering coordinates as
(..., v_P, v_d1..v_dK-1), the block over (log sigma2_0..K-1) is
[[r_0..r_K-1 (softmax weights, sum 1)], [-1, 1, 0..], [-1, 0, 1, ..]]
with determinant 1, and the dependence of v_P on (u_R, u_ell) is block-
triangular — so ``log_prob_v(v) = log_prob_u(T^{-1}(v))`` with NO
density correction, for any number of temporal components (1D and 2D
models alike).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class AmplitudeReparam:
    """Bijection ``v = T(u)`` straightening the forward-amplitude ridge.

    :param fns: a :class:`gpcsd_tpu.models.core.ModelFns` (supplies
        ``param_set`` for coordinate offsets and ``build_ks`` for the
        trace gain).
    """

    def __init__(self, fns):
        self.fns = fns
        ps = fns.param_set
        self.dim = ps.dim
        self._s_offsets = []
        k = 0
        while f"tm{k}_sigma2" in ps.specs:
            o0, o1 = ps._offsets[f"tm{k}_sigma2"]
            assert o1 - o0 == 1
            self._s_offsets.append(o0)
            k += 1
        if not self._s_offsets:
            raise ValueError("model has no temporal sigma2 parameters")
        self.n_sigma2 = len(self._s_offsets)

    def _log_gain(self, u):
        """``log(tr Ks(R, ell) / nx)`` — mean per-channel LFP signal
        variance at unit total temporal sigma2 (differentiable)."""
        theta = self.fns.param_set.unpack(u)
        Ks = self.fns.build_ks(theta)
        nx = Ks.shape[-1]
        return jnp.log(jnp.trace(Ks) / nx)

    def forward(self, u):
        """u -> v.  Coordinate slots are reused: sigma2_0's slot carries
        v_P; sigma2_k's slot (k >= 1) carries the log-ratio v_dk."""
        u = jnp.asarray(u)
        s = jnp.stack([u[..., o] for o in self._s_offsets], axis=-1)
        v_P = jax.scipy.special.logsumexp(s, axis=-1) + self._log_gain(u)
        v = u
        v = v.at[..., self._s_offsets[0]].set(v_P)
        for k in range(1, self.n_sigma2):
            v = v.at[..., self._s_offsets[k]].set(
                s[..., k] - s[..., 0]
            )
        return v

    def inverse(self, v):
        """v -> u (closed form: forward gain + softmax split)."""
        v = jnp.asarray(v)
        g = self._log_gain(v)  # only reads R/ell slots, untouched by T
        v_P = v[..., self._s_offsets[0]]
        diffs = [
            v[..., self._s_offsets[k]] for k in range(1, self.n_sigma2)
        ]
        # log-softmax over (0, d1, .., dK-1): s_k = S + log r_k with
        # r = softmax, S = total log sigma2
        zs = jnp.stack(
            [jnp.zeros_like(v_P)] + diffs, axis=-1
        )
        log_r = zs - jax.scipy.special.logsumexp(zs, axis=-1, keepdims=True)
        S = v_P - g
        u = v
        for k in range(self.n_sigma2):
            u = u.at[..., self._s_offsets[k]].set(S + log_r[..., k])
        return u

    # log|det dT/du| == 0 (unimodular; see module docstring)

    def wrap_log_prob(self, log_prob):
        """``log_prob_u -> log_prob_v`` (no Jacobian correction)."""

        def log_prob_v(v, *args, **kwargs):
            return log_prob(self.inverse(v), *args, **kwargs)

        return log_prob_v

    def wrap_log_prob_aux(self, log_prob_aux):
        def log_prob_aux_v(v, aux, *args, **kwargs):
            return log_prob_aux(self.inverse(v), aux, *args, **kwargs)

        return log_prob_aux_v
