"""Adaptive tempered SMC with systematic resampling.

North-star engine component (BASELINE.json).  Sampler over the same
unconstrained density as NUTS/ADVI:

- particles initialized from the prior (via ``ParamSet.sample`` upstream);
- inverse-temperature ladder chosen adaptively by bisection so each stage's
  effective sample size stays near ``ess_target * n_particles``;
- systematic resampling; random-walk Metropolis mutation with the proposal
  scaled by the empirical particle covariance (diagonal, 2.38^2/d rule);
- log normalizing-constant estimate accumulated across stages (useful for
  model comparison — requires normalized priors, see
  :meth:`gpcsd_tpu.models.priors.Prior.log_normalizer`).

Everything is ``lax`` control flow; the particle axis vmaps and, on a mesh,
shards over 'chain' with resampling via all-gather (particle counts are
small — thousands — so a replicated gather is cheaper than a distributed
permutation at these sizes).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class SMCResult(NamedTuple):
    particles: jnp.ndarray  # (n_particles, dim)
    log_weights: jnp.ndarray  # final (normalized) log weights
    log_evidence: jnp.ndarray  # log normalizing constant estimate
    n_stages: jnp.ndarray
    acceptance: jnp.ndarray  # mean MH acceptance of the final stage


def _ess(log_w):
    w = jax.nn.softmax(log_w)
    return 1.0 / jnp.sum(jnp.square(w))


def systematic_resample(key, log_w, n):
    """Systematic resampling; returns indices (n,)."""
    w = jax.nn.softmax(log_w)
    positions = (jax.random.uniform(key, ()) + jnp.arange(n)) / n
    cumsum = jnp.cumsum(w)
    return jnp.searchsorted(cumsum, positions)


def _choose_delta(log_like, lam, ess_target_frac, n_iter=30):
    """Bisection for the largest temperature increment keeping ESS above
    target (Del Moral et al. adaptive tempering)."""
    n = log_like.shape[0]
    target = ess_target_frac * n

    def ess_at(delta):
        return _ess(delta * log_like)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        ok = ess_at(mid) >= target
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    vz = jnp.sum(log_like) * 0.0  # VMA seed for shard_map(check_vma=True)
    hi0 = 1.0 - lam + vz
    full_ok = ess_at(hi0) >= target
    lo, hi = jax.lax.fori_loop(0, n_iter, body, (jnp.zeros(()) + vz, hi0))
    return jnp.where(full_ok, hi0, jnp.maximum(lo, 1e-6))


class _SMCState(NamedTuple):
    key: jnp.ndarray
    particles: jnp.ndarray
    log_prior: jnp.ndarray
    log_like: jnp.ndarray
    lam: jnp.ndarray
    log_evidence: jnp.ndarray
    stage: jnp.ndarray
    acceptance: jnp.ndarray


def smc_run(
    log_prior_fn: Callable,
    log_like_fn: Callable,
    particles0,
    key,
    n_mutation_steps: int = 10,
    ess_target_frac: float = 0.5,
    max_stages: int = 100,
    rw_scale: float = 1.0,
    batch_prior: Callable | None = None,
    batch_like: Callable | None = None,
) -> SMCResult:
    """Tempered SMC from the prior to prior x likelihood.

    :param log_prior_fn: ``u -> scalar`` (the bridging base density).
    :param log_like_fn: ``u -> scalar`` tempered component.
    :param particles0: (n_particles, dim) prior draws.
    :param batch_prior, batch_like: optional ``(N, dim) -> (N,)`` batch
        evaluators overriding the default ``vmap`` — the mesh-sharded path
        (:func:`gpcsd_tpu.parallel.sharded.smc_sharded`) injects evaluators
        that split the particle batch over the chain axis and all_gather the
        results, keeping the particle state replicated so resampling stays
        a deterministic local computation.
    """
    n, dim = particles0.shape
    dtype = particles0.dtype
    v_prior = batch_prior or jax.vmap(log_prior_fn)
    v_like = batch_like or jax.vmap(log_like_fn)

    ll0 = v_like(particles0)
    vz = jnp.sum(ll0) * 0.0  # VMA seed for shard_map(check_vma=True)
    init = _SMCState(
        key=key,
        particles=jnp.asarray(particles0) + vz,
        log_prior=v_prior(particles0) + vz,
        log_like=ll0,
        lam=jnp.zeros((), dtype) + vz,
        log_evidence=jnp.zeros((), dtype) + vz,
        stage=jnp.zeros((), jnp.int32) + (vz != 0.0),
        acceptance=jnp.zeros((), dtype) + vz,
    )

    def cond(st: _SMCState):
        return (st.lam < 1.0) & (st.stage < max_stages)

    def body(st: _SMCState):
        key, k_res, k_mut = jax.random.split(st.key, 3)
        log_like = jnp.where(jnp.isfinite(st.log_like), st.log_like, -1e300)
        delta = _choose_delta(log_like, st.lam, ess_target_frac)
        lam_new = st.lam + delta

        # incremental weights and evidence update
        log_w = delta * log_like
        log_evidence = st.log_evidence + jax.nn.logsumexp(log_w) - jnp.log(n)

        # resample
        idx = systematic_resample(k_res, log_w, n)
        particles = st.particles[idx]
        log_prior = st.log_prior[idx]
        log_like_r = log_like[idx]

        # random-walk MH mutation targeting prior * like^lam_new
        prop_sd = rw_scale * (2.38 / jnp.sqrt(dim)) * (
            jnp.std(particles, axis=0) + 1e-6
        )

        def mh_step(carry, k):
            z, lp, ll, acc = carry
            k1, k2 = jax.random.split(k)
            prop = z + prop_sd * jax.random.normal(k1, z.shape, dtype)
            lp_p = v_prior(prop)
            ll_p = v_like(prop)
            ll_p = jnp.where(jnp.isfinite(ll_p), ll_p, -1e300)
            log_ratio = (lp_p + lam_new * ll_p) - (lp + lam_new * ll)
            accept = jnp.log(jax.random.uniform(k2, (n,), dtype)) < log_ratio
            z = jnp.where(accept[:, None], prop, z)
            lp = jnp.where(accept, lp_p, lp)
            ll = jnp.where(accept, ll_p, ll)
            return (z, lp, ll, acc + jnp.mean(accept)), None

        (particles, log_prior, log_like_m, acc), _ = jax.lax.scan(
            mh_step,
            (particles, log_prior, log_like_r,
             jnp.zeros((), dtype) + jnp.sum(log_like_r) * 0.0),
            jax.random.split(k_mut, n_mutation_steps),
        )

        return _SMCState(
            key=key,
            particles=particles,
            log_prior=log_prior,
            log_like=log_like_m,
            lam=lam_new,
            log_evidence=log_evidence,
            stage=st.stage + 1,
            acceptance=acc / n_mutation_steps,
        )

    final = jax.lax.while_loop(cond, body, init)
    return SMCResult(
        particles=final.particles,
        log_weights=jnp.zeros((n,), dtype),  # equal weights post-resampling
        log_evidence=final.log_evidence,
        n_stages=final.stage,
        acceptance=final.acceptance,
    )
