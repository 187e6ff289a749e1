"""Shared HMC machinery: leapfrog, dual averaging, Welford mass adaptation.

The reference has no sampler (MAP only, ``gpcsd1d.py:130-246``); NUTS/HMC are
the new engine's north-star extension (BASELINE.json).  Everything here is a
pure function on explicit state tuples so samplers vmap over chains and
shard_map over device meshes.

Design: diagonal mass matrix; one leapfrog step is (grad, update, grad) fused
by XLA into the log-prob kernel; warmup follows the Stan three-phase schedule
(fast / expanding slow windows / fast).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg
import numpy as np


class DualAveragingState(NamedTuple):
    log_step: jnp.ndarray
    log_step_avg: jnp.ndarray
    h_sum: jnp.ndarray
    mu: jnp.ndarray
    count: jnp.ndarray


def da_init(step_size: float) -> DualAveragingState:
    log_step = jnp.log(jnp.asarray(step_size, dtype=jnp.result_type(float)))
    return DualAveragingState(
        log_step=log_step,
        log_step_avg=log_step,
        h_sum=jnp.zeros_like(log_step),
        mu=jnp.log(10.0) + log_step,
        count=jnp.zeros((), jnp.int32),
    )


def da_update(state: DualAveragingState, accept_prob, target=0.8,
              gamma=0.05, t0=10.0, kappa=0.75) -> DualAveragingState:
    """Nesterov dual averaging on log step size (Hoffman & Gelman 2014)."""
    count = state.count + 1
    w = 1.0 / (count + t0)
    h_sum = (1.0 - w) * state.h_sum + w * (target - accept_prob)
    log_step = state.mu - jnp.sqrt(count.astype(h_sum.dtype)) / gamma * h_sum
    eta = count.astype(h_sum.dtype) ** (-kappa)
    log_step_avg = eta * log_step + (1.0 - eta) * state.log_step_avg
    return DualAveragingState(
        log_step=log_step, log_step_avg=log_step_avg, h_sum=h_sum,
        mu=state.mu, count=count,
    )


class WelfordState(NamedTuple):
    mean: jnp.ndarray
    m2: jnp.ndarray
    count: jnp.ndarray


def welford_init(dim: int, dtype=None) -> WelfordState:
    dtype = dtype or jnp.result_type(float)
    return WelfordState(
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim,), dtype),
        count=jnp.zeros((), jnp.int32),
    )


def welford_update(state: WelfordState, x) -> WelfordState:
    count = state.count + 1
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    return WelfordState(mean=mean, m2=m2, count=count)


def welford_variance(state: WelfordState, regularize=True):
    n = jnp.maximum(state.count, 1).astype(state.m2.dtype)
    var = state.m2 / jnp.maximum(n - 1.0, 1.0)
    if regularize:  # Stan's shrinkage toward unit metric
        var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
    return var


def as_aux_vga(value_and_grad: Callable) -> Callable:
    """Adapt a plain ``z -> (logp, grad)`` to the aux-threading signature
    ``(z, aux) -> (logp, grad, aux)`` used by the samplers.

    The aux slot carries solver warm-start state along the trajectory (e.g.
    the previous leapfrog's temporal eigenbasis, ``ModelFns.log_prob_basis``);
    plain log-probs just pass it through untouched."""

    def vga(z, aux):
        logp, grad = value_and_grad(z)
        return logp, grad, aux

    return vga


def mass_velocity(inv_mass, r):
    """``M^{-1} r`` under either metric representation: ``inv_mass`` is a
    (dim,) vector (diagonal metric, the default) or a (dim, dim) dense
    posterior-covariance estimate (Stan dense_e analog — the round-4
    geometry diagnosis's lever).  The branch is static at trace time."""
    if inv_mass.ndim == 2:
        return inv_mass @ r
    return inv_mass * r


def draw_momentum(key, inv_mass, shape, dtype):
    """``r ~ N(0, M)`` with ``M = inv_mass^{-1}``: elementwise scaling for
    a diagonal metric, a triangular solve against ``chol(inv_mass)`` for
    a dense one (``cov(r) = inv_mass^{-1}``)."""
    xi = jax.random.normal(key, shape, dtype)
    if inv_mass.ndim == 2:
        # trace-scaled jitter (same guard as dense_metric.metric_from_cov):
        # dense_welford_cov's shrinkage keeps the adapted metric SPD, but a
        # caller-supplied rank-deficient covariance would otherwise produce
        # silent NaNs out of the Cholesky
        dim = inv_mass.shape[-1]
        scale = jnp.maximum(jnp.trace(inv_mass) / dim, 1e-300)
        L = jnp.linalg.cholesky(
            inv_mass + 1e-12 * scale * jnp.eye(dim, dtype=inv_mass.dtype)
        )
        return jax.scipy.linalg.solve_triangular(L.T, xi, lower=False)
    return xi / jnp.sqrt(inv_mass)


def leapfrog(vga: Callable, z, r, grad, aux, step_size, inv_mass):
    """One leapfrog step; returns (z, r, logp, grad, aux).

    ``vga`` has the aux-threading signature ``(z, aux) -> (logp, grad, aux)``
    (see :func:`as_aux_vga`)."""
    r = r + 0.5 * step_size * grad
    z = z + step_size * mass_velocity(inv_mass, r)
    logp, grad, aux = vga(z, aux)
    r = r + 0.5 * step_size * grad
    return z, r, logp, grad, aux


def kinetic(r, inv_mass):
    if inv_mass.ndim == 2:
        return 0.5 * jnp.sum(r * (inv_mass @ r), axis=-1)
    return 0.5 * jnp.sum(jnp.square(r) * inv_mass, axis=-1)


def vma0(ref):
    """Zero scalar carrying ``ref``'s varying-across-mesh type — seeds
    constant-initialized loop carries under shard_map(check_vma=True)."""
    return jnp.sum(ref) * 0.0


def find_reasonable_step_size(vga, z, key, inv_mass, init=1.0, aux=()):
    """Heuristic initial step size (Hoffman & Gelman 2014 Algorithm 4).

    ``vga`` has the aux-threading signature ``(z, aux) -> (logp, grad, aux)``.
    """
    dtype = z.dtype
    logp0, grad0, aux = vga(z, aux)
    r = draw_momentum(key, inv_mass, z.shape, dtype)
    h0 = -logp0 + kinetic(r, inv_mass)

    def joint(step):
        _, r1, logp1, _, _ = leapfrog(vga, z, r, grad0, aux, step, inv_mass)
        h1 = -logp1 + kinetic(r1, inv_mass)
        return h0 - h1  # log accept ratio

    la0 = joint(jnp.asarray(init, dtype))
    direction = jnp.where(la0 > jnp.log(0.5), 1.0, -1.0)

    def cond(carry):
        step, it = carry
        la = joint(step)
        la = jnp.where(jnp.isfinite(la), la, -jnp.inf)
        keep_going = jnp.where(direction > 0, la > jnp.log(0.5), la < jnp.log(0.5))
        return keep_going & (it < 50) & (step > 1e-10) & (step < 1e7)

    def body(carry):
        step, it = carry
        return step * jnp.where(direction > 0, 2.0, 0.5), it + 1

    step, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(init, dtype) + vma0(logp0), 0)
    )
    return step


def stan_warmup_schedule(num_warmup: int, init_buffer=75, term_buffer=50, base_window=25):
    """Boolean masks over warmup steps: (in_slow_window, window_end_flags).

    Returns numpy arrays (static, consumed at trace time): ``slow_mask[i]``
    marks steps whose positions feed the mass-matrix estimator and
    ``window_end[i]`` marks the last step of each slow window (where the
    metric is refreshed and dual averaging restarts).
    """
    slow_mask = np.zeros(num_warmup, dtype=bool)
    window_end = np.zeros(num_warmup, dtype=bool)
    if num_warmup < 20:
        return slow_mask, window_end
    if init_buffer + term_buffer + base_window > num_warmup:
        # compress: keep proportions (Stan does similar)
        init_buffer = int(0.15 * num_warmup)
        term_buffer = int(0.1 * num_warmup)
        base_window = num_warmup - init_buffer - term_buffer
    start = init_buffer
    size = base_window
    while start < num_warmup - term_buffer:
        end = start + size
        next_size = size * 2
        # final window absorbs the remainder
        if end + next_size > num_warmup - term_buffer:
            end = num_warmup - term_buffer
        slow_mask[start:end] = True
        window_end[end - 1] = True
        start = end
        size = next_size
    return slow_mask, window_end
