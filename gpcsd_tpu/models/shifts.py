"""Per-trial time-shift estimation for evoked CSD components.

Parity target: ``/root/reference/auditory_lfp/fit_mean_function.py:299-333``
— for each trial, find per-component time shifts tau maximizing the GP
residual likelihood (whitened by cached Kronecker eigen factors) with a
Gaussian prior on tau, optimized by L-BFGS.  The reference fans this out
over CPU processes with joblib; here the trials axis is a ``vmap`` over the
pure-JAX optimizer — one compiled program for all trials, shardable over a
mesh like any other batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..infer.lbfgs import lbfgs_minimize
from ..ops.kronlik import KronFactors


class ShiftResult(NamedTuple):
    tau: np.ndarray  # (ntrials, n_seg)
    nll: np.ndarray  # (ntrials,)
    converged: np.ndarray  # (ntrials,)


def shift_component(mu, t, tau):
    """Time-shift one component (nx, nt) by tau via linear interpolation,
    extrapolating with edge values (reference uses scipy interp1d with
    fill_value='extrapolate'; edge-hold is the stable equivalent)."""
    t = jnp.asarray(t).reshape(-1)

    def per_channel(row):
        return jnp.interp(t + tau, t, row)

    return jax.vmap(per_channel)(jnp.asarray(mu))


def shift_nll(tau, lfp_trial, mu_background, mu_components, t, factors: KronFactors,
              prior_mu=0.0, prior_sd=10.0):
    """Negative log-likelihood of one trial's residual under the GP noise
    model, plus the Gaussian shift prior (``fit_mean_function.py:301-311``)."""
    mu_new = mu_background
    for i in range(mu_components.shape[0]):
        mu_new = mu_new + shift_component(mu_components[i], t, tau[i])
    resid = lfp_trial - mu_new
    alpha = factors.qs.T @ resid @ factors.qt
    quad = 0.5 * jnp.sum(jnp.square(alpha) / factors.d)
    prior = 0.5 * jnp.sum(jnp.square((tau - prior_mu) / prior_sd))
    return quad + prior


def estimate_shifts(
    lfp_trials,
    mu_background,
    mu_components,
    t,
    factors: KronFactors,
    prior_mu=0.0,
    prior_sd=10.0,
    maxiter=200,
) -> ShiftResult:
    """Fit per-trial shifts for all trials in one vmapped program.

    :param lfp_trials: (nx, nt, ntrials)
    :param mu_background: (nx, nt) non-shifted background component
    :param mu_components: (n_seg, nx, nt) shiftable components
    :param factors: Kronecker eigen factors of the fitted noise model
    :return: ShiftResult with (ntrials, n_seg) shifts in ms
    """
    lfp_trials = jnp.asarray(lfp_trials)
    mu_background = jnp.asarray(mu_background)
    mu_components = jnp.asarray(mu_components)
    n_seg = mu_components.shape[0]
    ntrials = lfp_trials.shape[2]
    Y = jnp.moveaxis(lfp_trials, 2, 0)  # (ntrials, nx, nt)

    def one(lfp_trial):
        res = lbfgs_minimize(
            lambda tau: shift_nll(
                tau, lfp_trial, mu_background, mu_components, t, factors,
                prior_mu, prior_sd,
            ),
            jnp.zeros((n_seg,), lfp_trials.dtype),
            max_iter=maxiter,
        )
        return res.u, res.f, res.converged

    tau, nll, conv = jax.jit(jax.vmap(one))(Y)
    return ShiftResult(
        tau=np.asarray(tau), nll=np.asarray(nll), converged=np.asarray(conv)
    )
