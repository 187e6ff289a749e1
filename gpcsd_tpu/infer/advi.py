"""ADVI: automatic differentiation variational inference (mean-field).

North-star engine component (BASELINE.json); no reference analogue — the
reference's only inference is MAP (``gpcsd1d.py:130-246``).  Operates on the
same unconstrained log-density as NUTS, so any model expressed in the DSL
(GPCSD1D/2D, torus graph) gets ADVI for free.

q(u) = N(mu, diag(exp(2 rho))); reparameterized ELBO gradients; optax Adam;
MC samples vmapped (and shardable over a mesh axis).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class ADVIResult(NamedTuple):
    mu: jnp.ndarray
    rho: jnp.ndarray  # log std dev
    elbo_trace: jnp.ndarray

    def sample(self, key, n):
        eps = jax.random.normal(key, (n, self.mu.shape[-1]), self.mu.dtype)
        return self.mu + jnp.exp(self.rho) * eps


def elbo(log_prob: Callable, mu, rho, key, n_mc: int):
    """Monte-Carlo ELBO with the entropy term in closed form."""
    dim = mu.shape[-1]
    eps = jax.random.normal(key, (n_mc, dim), mu.dtype)
    us = mu + jnp.exp(rho) * eps
    lps = jax.vmap(log_prob)(us)
    entropy = jnp.sum(rho) + 0.5 * dim * (1.0 + jnp.log(2.0 * jnp.pi))
    return jnp.mean(lps) + entropy


def advi_fit(
    log_prob: Callable,
    u0,
    key,
    num_steps: int = 2000,
    n_mc: int = 8,
    learning_rate: float = 0.02,
    init_rho: float = -2.0,
) -> ADVIResult:
    """Fit the mean-field approximation; returns means, log-stds, ELBO trace."""
    dtype = u0.dtype
    params = {
        "mu": jnp.asarray(u0),
        "rho": jnp.full(u0.shape, init_rho, dtype),
    }
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    def loss_fn(p, k):
        return -elbo(log_prob, p["mu"], p["rho"], k, n_mc)

    def step(carry, k):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, k)
        # non-finite MC estimates (e.g. q mass outside the prior support
        # early in optimization) skip the update rather than poisoning Adam
        ok = jnp.isfinite(loss) & jax.tree_util.tree_reduce(
            jnp.logical_and,
            jax.tree.map(lambda g: jnp.all(jnp.isfinite(g)), grads),
        )
        grads = jax.tree.map(lambda g: jnp.where(ok, g, 0.0), grads)
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), -loss

    keys = jax.random.split(key, num_steps)
    (params, _), trace = jax.lax.scan(step, (params, opt_state), keys)
    return ADVIResult(mu=params["mu"], rho=params["rho"], elbo_trace=trace)
