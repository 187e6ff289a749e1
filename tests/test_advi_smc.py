"""ADVI and SMC correctness on analytically known targets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpcsd_tpu.infer.advi import advi_fit
from gpcsd_tpu.infer.smc import smc_run, systematic_resample


class TestADVI:
    def test_gaussian_recovery(self):
        mu_true = jnp.asarray([1.0, -2.0, 0.5])
        sd_true = jnp.asarray([0.5, 2.0, 1.0])

        def lp(u):
            return -0.5 * jnp.sum(((u - mu_true) / sd_true) ** 2)

        res = jax.jit(
            lambda u0, k: advi_fit(lp, u0, k, num_steps=3000, learning_rate=0.05)
        )(jnp.zeros(3, jnp.float64), jax.random.PRNGKey(0))
        assert np.allclose(np.asarray(res.mu), np.asarray(mu_true), atol=0.1)
        assert np.allclose(np.exp(np.asarray(res.rho)), np.asarray(sd_true), rtol=0.2)
        # ELBO should improve over optimization
        trace = np.asarray(res.elbo_trace)
        assert np.nanmean(trace[-100:]) > np.nanmean(trace[:100])

    def test_sampling_shapes(self):
        def lp(u):
            return -0.5 * jnp.sum(u**2)

        res = advi_fit(lp, jnp.zeros(2, jnp.float64), jax.random.PRNGKey(1), num_steps=100)
        s = res.sample(jax.random.PRNGKey(2), 64)
        assert s.shape == (64, 2)


class TestSMC:
    def test_systematic_resample_unbiased(self):
        log_w = jnp.log(jnp.asarray([0.1, 0.2, 0.3, 0.4]))
        counts = np.zeros(4)
        for i in range(200):
            idx = systematic_resample(jax.random.PRNGKey(i), log_w, 4)
            counts += np.bincount(np.asarray(idx), minlength=4)
        freqs = counts / counts.sum()
        assert np.allclose(freqs, [0.1, 0.2, 0.3, 0.4], atol=0.03)

    def test_gaussian_posterior_and_evidence(self):
        """Prior N(0, 1), likelihood N(u; y=1, sd=0.5) per dim.
        Posterior: N(0.8, 0.2) per dim; evidence known in closed form."""
        dim = 2
        y = 1.0
        sd_l = 0.5

        def log_prior(u):
            return -0.5 * jnp.sum(u**2) - 0.5 * dim * jnp.log(2 * jnp.pi)

        def log_like(u):
            return -0.5 * jnp.sum((u - y) ** 2) / sd_l**2 - dim * jnp.log(
                sd_l * jnp.sqrt(2 * jnp.pi)
            )

        n = 2000
        particles0 = jax.random.normal(jax.random.PRNGKey(0), (n, dim), jnp.float64)
        res = jax.jit(
            lambda p, k: smc_run(log_prior, log_like, p, k, n_mutation_steps=10)
        )(particles0, jax.random.PRNGKey(1))
        p = np.asarray(res.particles)
        post_var = 1.0 / (1.0 + 1.0 / sd_l**2)
        post_mean = post_var * y / sd_l**2
        assert np.allclose(p.mean(0), post_mean, atol=0.05)
        assert np.allclose(p.var(0), post_var, rtol=0.25)
        # evidence: N(y; 0, 1 + sd_l^2) per dim
        want_log_z = dim * (-0.5 * np.log(2 * np.pi * (1 + sd_l**2)) - 0.5 * y**2 / (1 + sd_l**2))
        assert np.allclose(float(res.log_evidence), want_log_z, atol=0.1)
        assert int(res.n_stages) >= 2
        assert float(res.acceptance) > 0.1

    def test_multimodal_does_not_collapse(self):
        """Two well-separated modes: tempering should keep both populated."""

        def log_prior(u):
            return -0.5 * jnp.sum((u / 10.0) ** 2)

        def log_like(u):
            return jnp.logaddexp(
                -0.5 * jnp.sum((u - 4.0) ** 2) / 0.25,
                -0.5 * jnp.sum((u + 4.0) ** 2) / 0.25,
            )

        n = 1000
        particles0 = 10.0 * jax.random.normal(jax.random.PRNGKey(3), (n, 1), jnp.float64)
        res = smc_run(log_prior, log_like, particles0, jax.random.PRNGKey(4))
        p = np.asarray(res.particles).ravel()
        frac_pos = (p > 0).mean()
        assert 0.2 < frac_pos < 0.8
