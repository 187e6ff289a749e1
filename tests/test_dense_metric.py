"""Dense NUTS metric building blocks (`infer/dense_metric.py`).

These are the round-5 geometry ingredients; each identity is pinned
against numpy/analytic references so wiring them into the sampler is a
plumbing change, not a math change.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gpcsd_tpu.infer.dense_metric import (
    dense_welford_cov,
    dense_welford_init,
    dense_welford_merge,
    dense_welford_update,
    draw_momentum,
    kinetic,
    metric_from_cov,
    velocity,
)


def _corr_cov(rng, dim=5):
    A = rng.normal(size=(dim, dim))
    return A @ A.T / dim + np.eye(dim)


class TestDenseWelford:
    def test_matches_numpy_cov(self, rng):
        xs = rng.normal(size=(400, 4)) @ np.diag([1.0, 2.0, 0.5, 3.0])
        st = dense_welford_init(4)
        for x in xs:
            st = dense_welford_update(st, jnp.asarray(x))
        cov = np.asarray(dense_welford_cov(st, regularize=False))
        np.testing.assert_allclose(cov, np.cov(xs.T), rtol=1e-10)

    def test_merge_equals_single_stream(self, rng):
        xs = rng.normal(size=(100, 3))
        a = dense_welford_init(3)
        b = dense_welford_init(3)
        for x in xs[:60]:
            a = dense_welford_update(a, jnp.asarray(x))
        for x in xs[60:]:
            b = dense_welford_update(b, jnp.asarray(x))
        merged = dense_welford_merge(a, b)
        full = dense_welford_init(3)
        for x in xs:
            full = dense_welford_update(full, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(dense_welford_cov(merged, regularize=False)),
            np.asarray(dense_welford_cov(full, regularize=False)),
            rtol=1e-9,
        )

    def test_regularization_shrinks_toward_identity(self, rng):
        st = dense_welford_init(3)
        for x in rng.normal(size=(10, 3)) * 100.0:
            st = dense_welford_update(st, jnp.asarray(x))
        reg = np.asarray(dense_welford_cov(st))
        raw = np.asarray(dense_welford_cov(st, regularize=False))
        assert np.all(np.abs(reg) <= np.abs(raw) + 1e-2)


class TestMetricOps:
    def test_momentum_covariance_is_inverse(self, rng):
        cov = _corr_cov(rng)
        L = metric_from_cov(jnp.asarray(cov))
        keys = jax.random.split(jax.random.PRNGKey(0), 20000)
        rs = jax.vmap(lambda k: draw_momentum(k, L))(keys)
        emp = np.cov(np.asarray(rs).T)
        np.testing.assert_allclose(emp, np.linalg.inv(cov), atol=0.12)

    def test_velocity_and_kinetic_identities(self, rng):
        cov = _corr_cov(rng)
        L = metric_from_cov(jnp.asarray(cov))
        r = jnp.asarray(rng.normal(size=5))
        np.testing.assert_allclose(
            np.asarray(velocity(L, r)), cov @ np.asarray(r), rtol=1e-9
        )
        np.testing.assert_allclose(
            float(kinetic(L, r)),
            0.5 * float(np.asarray(r) @ cov @ np.asarray(r)),
            rtol=1e-10,
        )
        # grad_r kinetic == velocity (what leapfrog uses)
        g = jax.grad(lambda rr: kinetic(L, rr))(r)
        np.testing.assert_allclose(np.asarray(g), np.asarray(velocity(L, r)), rtol=1e-9)

    def test_hmc_invariance_on_correlated_gaussian(self, rng):
        """End-to-end sanity: plain leapfrog HMC with the dense metric set
        to the TARGET covariance traverses a correlated Gaussian
        efficiently (acceptance ~1 at modest step size, exact energy
        bookkeeping) — the property the sampler wiring will rely on."""
        cov = _corr_cov(rng, dim=4)
        icov = jnp.asarray(np.linalg.inv(cov))

        def logp(z):
            return -0.5 * z @ icov @ z

        L = metric_from_cov(jnp.asarray(cov))
        eps, steps = 0.5, 8

        def leapfrog(z, r):
            g = jax.grad(logp)(z)
            r = r + 0.5 * eps * g
            for _ in range(steps - 1):
                z = z + eps * velocity(L, r)
                r = r + eps * jax.grad(logp)(z)
            z = z + eps * velocity(L, r)
            r = r + 0.5 * eps * jax.grad(logp)(z)
            return z, r

        key = jax.random.PRNGKey(3)
        z = jnp.zeros(4, jnp.float64)
        accs = []
        for i in range(200):
            kr, ku, key = jax.random.split(key, 3)
            r = draw_momentum(kr, L)
            H0 = -logp(z) + kinetic(L, r)
            z2, r2 = leapfrog(z, r)
            H1 = -logp(z2) + kinetic(L, r2)
            a = float(jnp.minimum(1.0, jnp.exp(H0 - H1)))
            accs.append(a)
            if float(jax.random.uniform(ku)) < a:
                z = z2
        assert np.mean(accs) > 0.9  # well-tuned metric -> high acceptance
