"""High-level inference API shared by GPCSD1D and GPCSD2D.

Extends the reference's class surface (which only has ``fit``,
``gpcsd1d.py:130-246``) with full posterior inference over hyperparameters —
NUTS, ADVI, and SMC on the same log-joint, returning *constrained* per-name
samples so downstream analysis never touches the unconstrained space.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PosteriorSamples(NamedTuple):
    """Posterior over hyperparameters in constrained (natural) units."""

    theta: Dict[str, np.ndarray]  # name -> (..., nsamples[, size]) samples
    raw: object  # backend-specific result (NUTSResult/ADVIResult/SMCResult)
    diagnostics: Dict[str, np.ndarray]


class InferenceAPIMixin:
    """Mixin adding .sample_posterior / .advi / .smc to model classes.

    Host classes must provide ``_fns(fix_R=...)``, ``_Y()``, ``_theta()``,
    ``_set_theta(theta)``.
    """

    def _constrain_batch(self, fns, u_batch):
        """(N, dim) unconstrained -> dict of (N,) or (N, size) arrays."""
        theta = jax.vmap(fns.param_set.unpack)(jnp.asarray(u_batch))
        return {k: np.asarray(v) for k, v in theta.items()}

    def sample_posterior(
        self,
        n_chains=4,
        num_warmup=500,
        num_samples=500,
        seed=0,
        fix_R=False,
        max_depth=10,
        target_accept=0.8,
        mesh=None,
        set_posterior_mean=False,
        precondition=True,
        chunk_size=None,
        pool_warmup=False,
        state_path=None,
        warm_basis=None,
        callback=None,
        init="params_jitter",
        save_every=1,
    ) -> PosteriorSamples:
        """NUTS posterior over hyperparameters.

        :param mesh: optional jax Mesh with (chain, trial) axes — runs the
            multi-chip path (:func:`gpcsd_tpu.parallel.sharded.nuts_sharded`);
            otherwise chains are vmapped on one device.
        :param set_posterior_mean: write posterior-mean params back into the
            model (analogous to ``fit`` writing back the MAP).
        :param precondition: solve the temporal eigh in the current
            parameters' eigenbasis (run ``fit`` first so this is the MAP) —
            cuts per-leapfrog Jacobi sweeps several-fold on TPU, exact
            everywhere (see ``make_model_fns``).
        :param pool_warmup: share mass-matrix adaptation statistics across
            chains at chunk boundaries (chunked driver only).
        :param state_path: chunk-level checkpoint/resume file (chunked
            driver only) — rerunning after a worker crash continues from
            the last completed chunk.
        :param callback: ``callback(chunk_index, carry)`` after every chunk
            (chunked driver only) — progress reporting / per-chunk timing.
        :param warm_basis: thread the temporal eigenbasis along each NUTS
            trajectory (every leapfrog warm-starts the iterative eigh from
            the previous step's eigenvectors — stays at 1-2 sweeps however
            far the chain drifts from the preconditioning center).  Default
            None = on for accelerator backends, off on CPU (where LAPACK
            eigh ignores warm starts).  Exact everywhere.
        :param init: chain initialization. ``"params_jitter"`` (default)
            starts chains at the model's current parameters (run ``fit``
            first so this is the MAP) with a small per-chain jitter in
            unconstrained space; ``"prior"`` draws starts from the priors.
            Prior draws can sit millions of log-units from the posterior
            bulk at real problem sizes (the Ks quadrature amplitude
            convention makes prior-scale temporal variances astronomically
            wrong), and warmup spent descending that cliff diverges
            constantly and poisons step-size adaptation.
        """
        fns = self._fns(fix_R=fix_R, precondition=precondition)
        Y = self._Y()
        key = jax.random.PRNGKey(seed)

        if mesh is not None:
            # the sharded driver has no chunking/pooling/checkpointing —
            # refuse rather than silently dropping what the caller asked for
            ignored = {
                "pool_warmup": pool_warmup,
                "state_path": state_path,
                "chunk_size": chunk_size,
                "callback": callback,
            }
            bad = [k for k, v in ignored.items() if v]
            if bad:
                raise ValueError(
                    f"sample_posterior(mesh=...) does not support {bad}; "
                    "these are chunked-driver (single-device) options"
                )
            from ..parallel.sharded import nuts_sharded

            res = nuts_sharded(
                fns, np.asarray(Y), mesh, key,
                n_chains=n_chains, num_warmup=num_warmup,
                num_samples=num_samples, max_depth=max_depth,
                target_accept=target_accept,
                warm_basis=True if warm_basis is None else warm_basis,
            )
        else:
            if warm_basis is None:
                warm_basis = jax.default_backend() != "cpu"
            warm_kw = {}
            if warm_basis:
                warm_kw = dict(
                    log_prob_aux=lambda u, qb: fns.log_prob_basis(u, Y, qb),
                    aux0=jnp.asarray(fns.qt0),
                )
            from ..infer.nuts import nuts_chains, nuts_chains_chunked

            u0s = []
            if init == "params_jitter":
                u_center = fns.param_set.pack(self._theta())
                for k in jax.random.split(jax.random.fold_in(key, 0), n_chains):
                    u = u_center + 0.05 * jax.random.normal(
                        k, u_center.shape, u_center.dtype
                    )
                    u0s.append(fns.param_set.clip_to_bounds(u))
            elif init == "prior":
                for k in jax.random.split(jax.random.fold_in(key, 0), n_chains):
                    theta0 = fns.param_set.sample(k)
                    u0s.append(
                        fns.param_set.clip_to_bounds(fns.param_set.pack(theta0))
                    )
            else:
                raise ValueError(f"unknown init {init!r}")
            if chunk_size is None and jax.default_backend() != "cpu":
                # accelerator default: small fixed-size chunk programs — the
                # monolithic scan compiles for ~10 min on the axon backend
                # and has crashed the TPU worker at large problem sizes
                chunk_size = 10
            if chunk_size:
                res = nuts_chains_chunked(
                    lambda u: fns.log_prob(u, Y),
                    jnp.stack(u0s),
                    jax.random.fold_in(key, 1),
                    num_warmup=num_warmup,
                    num_samples=num_samples,
                    max_depth=max_depth,
                    target_accept=target_accept,
                    chunk_size=chunk_size,
                    pool_warmup=pool_warmup,
                    state_path=state_path,
                    save_every=save_every,
                    callback=callback,
                    **warm_kw,
                )
            else:
                res = jax.jit(
                    lambda u0s, k: nuts_chains(
                        lambda u: fns.log_prob(u, Y),
                        u0s,
                        k,
                        num_warmup=num_warmup,
                        num_samples=num_samples,
                        max_depth=max_depth,
                        target_accept=target_accept,
                        **warm_kw,
                    )
                )(jnp.stack(u0s), jax.random.fold_in(key, 1))

        samples = np.asarray(res.samples)
        flat = samples.reshape(-1, samples.shape[-1])
        theta = self._constrain_batch(fns, flat)
        diagnostics = {
            "accept_prob": np.asarray(res.accept_prob),
            "num_steps": np.asarray(res.num_steps),
            "diverging": np.asarray(res.diverging),
            "step_size": np.asarray(res.step_size),
        }
        if samples.ndim == 3 and samples.shape[0] > 1 and samples.shape[1] > 3:
            from ..infer.diagnostics import ess, rhat

            names = list(fns.param_set.names_flat())
            diagnostics["rhat"] = dict(zip(names, rhat(samples)))
            diagnostics["ess"] = dict(zip(names, ess(samples)))
        if set_posterior_mean:
            mean_u = jnp.asarray(flat.mean(axis=0))
            th = fns.param_set.unpack(mean_u)
            th = fns.full_theta(th)
            self._set_theta(th)
        self.posterior = PosteriorSamples(theta=theta, raw=res, diagnostics=diagnostics)
        return self.posterior

    def advi(self, num_steps=3000, n_mc=8, learning_rate=0.02, seed=0, fix_R=False,
             n_draws=1000, mesh=None) -> PosteriorSamples:
        """Mean-field ADVI posterior approximation.

        :param mesh: optional (chain, trial) Mesh — trial terms psum-reduced
            over chips (:func:`gpcsd_tpu.parallel.sharded.advi_sharded`).
        """
        from ..infer.advi import ADVIResult, advi_fit

        fns = self._fns(fix_R=fix_R)
        Y = self._Y()
        key = jax.random.PRNGKey(seed)
        if mesh is not None:
            from ..parallel.sharded import advi_sharded

            raw = advi_sharded(
                fns, np.asarray(Y), mesh, key,
                num_steps=num_steps, n_mc=n_mc, learning_rate=learning_rate,
            )
            res = ADVIResult(*raw) if not isinstance(raw, ADVIResult) else raw
            draws = np.asarray(res.sample(jax.random.fold_in(key, 2), n_draws))
            theta = self._constrain_batch(fns, draws)
            self.posterior = PosteriorSamples(
                theta=theta, raw=res,
                diagnostics={"elbo": np.asarray(res.elbo_trace)},
            )
            return self.posterior
        u0 = fns.param_set.clip_to_bounds(
            fns.param_set.pack(fns.param_set.sample(jax.random.fold_in(key, 0)))
        )
        res = jax.jit(
            lambda u0, k: advi_fit(
                lambda u: fns.log_prob(u, Y),
                u0, k, num_steps=num_steps, n_mc=n_mc, learning_rate=learning_rate,
            )
        )(u0, jax.random.fold_in(key, 1))
        draws = np.asarray(res.sample(jax.random.fold_in(key, 2), n_draws))
        theta = self._constrain_batch(fns, draws)
        self.posterior = PosteriorSamples(
            theta=theta,
            raw=res,
            diagnostics={"elbo": np.asarray(res.elbo_trace)},
        )
        return self.posterior

    def smc(self, n_particles=1024, n_mutation_steps=10, seed=0, fix_R=False,
            mesh=None) -> PosteriorSamples:
        """Adaptive tempered SMC posterior (prior -> posterior).

        :param mesh: optional (chain, trial) Mesh — shards particle
            likelihoods over chips (:func:`gpcsd_tpu.parallel.sharded.smc_sharded`).
        """
        fns = self._fns(fix_R=fix_R)
        Y = self._Y()
        key = jax.random.PRNGKey(seed)
        if mesh is not None:
            from ..parallel.sharded import smc_sharded

            res = smc_sharded(
                fns, np.asarray(Y), mesh, key,
                n_particles=n_particles, n_mutation_steps=n_mutation_steps,
            )
            theta = self._constrain_batch(fns, np.asarray(res.particles))
            self.posterior = PosteriorSamples(
                theta=theta,
                raw=res,
                diagnostics={
                    "log_evidence": np.asarray(res.log_evidence),
                    "n_stages": np.asarray(res.n_stages),
                    "acceptance": np.asarray(res.acceptance),
                },
            )
            return self.posterior
        from ..infer.smc import smc_run
        particles0 = []
        for k in jax.random.split(jax.random.fold_in(key, 0), n_particles):
            th = fns.param_set.sample(k)
            particles0.append(fns.param_set.clip_to_bounds(fns.param_set.pack(th)))
        particles0 = jnp.stack(particles0)

        def log_prior(u):
            return fns.log_prior_u(u)

        def log_like(u):
            theta = fns.param_set.unpack(u)
            return fns.loglik(theta, Y)

        res = jax.jit(
            lambda p, k: smc_run(log_prior, log_like, p, k, n_mutation_steps=n_mutation_steps)
        )(particles0, jax.random.fold_in(key, 1))
        theta = self._constrain_batch(fns, np.asarray(res.particles))
        self.posterior = PosteriorSamples(
            theta=theta,
            raw=res,
            diagnostics={
                "log_evidence": np.asarray(res.log_evidence),
                "n_stages": np.asarray(res.n_stages),
                "acceptance": np.asarray(res.acceptance),
            },
        )
        return self.posterior
