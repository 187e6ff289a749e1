"""Sharding tests on a virtual 8-device CPU mesh.

Asserts the contract from SURVEY.md §4: posteriors/objectives computed on an
N-device mesh match the single-device values (the trial psum is an exact
reduction, padding contributes zero).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpcsd_tpu as g
from gpcsd_tpu.parallel.mesh import make_mesh, pad_to_multiple, shard_trials
from gpcsd_tpu.parallel.sharded import (
    make_trial_sharded_log_prob,
    map_fit_sharded,
    nuts_sharded,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def make_model(rng, nx=8, nt=12, ntrials=10):
    x = (np.arange(nx) * 100.0).reshape(-1, 1)
    t = np.arange(nt).reshape(-1, 1) * 1.0
    lfp = rng.normal(size=(nx, nt, ntrials))
    m = g.GPCSD1D(lfp, x, t, ngl=30)
    m.R["value"] = 120.0
    m.spatial_cov.params["ell"]["value"] = 180.0
    m.temporal_cov_list[0].params["ell"]["value"] = 5.0
    m.temporal_cov_list[0].params["sigma2"]["value"] = 0.8
    m.temporal_cov_list[1].params["ell"]["value"] = 2.0
    m.temporal_cov_list[1].params["sigma2"]["value"] = 0.4
    m.sig2n["value"] = 0.05
    return m


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(chain=4, trial=2)
        assert mesh.shape == {"chain": 4, "trial": 2}
        mesh = make_mesh()
        assert mesh.shape["chain"] == 8

    def test_pad_to_multiple(self, rng):
        Y = rng.normal(size=(10, 3, 4))
        Yp, n = pad_to_multiple(Y, 4)
        assert Yp.shape == (12, 3, 4) and n == 10
        assert np.all(Yp[10:] == 0)


class TestShardedLogProb:
    def test_matches_single_device(self, rng):
        m = make_model(rng)
        fns = m._fns()
        Y = np.asarray(m._Y())
        mesh = make_mesh(chain=2, trial=4)
        Yp, ntrials = pad_to_multiple(Y, 4)
        lp_sharded = make_trial_sharded_log_prob(fns, ntrials)

        u = np.asarray(fns.param_set.pack(m._theta()))

        from functools import partial
        from jax.sharding import PartitionSpec as P

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P("trial")),
            out_specs=P(),
        )
        def f(u, Y_block):
            return lp_sharded(u, Y_block)

        got = float(jax.jit(f)(jnp.asarray(u), jnp.asarray(Yp)))
        want = float(fns.log_prob(jnp.asarray(u), jnp.asarray(Y)))
        assert np.allclose(got, want, rtol=1e-10)

    def test_gradients_match(self, rng):
        m = make_model(rng)
        fns = m._fns()
        Y = np.asarray(m._Y())
        mesh = make_mesh(chain=1, trial=8)
        Yp, ntrials = pad_to_multiple(Y, 8)
        lp_sharded = make_trial_sharded_log_prob(fns, ntrials)
        u = jnp.asarray(np.asarray(fns.param_set.pack(m._theta())))

        from functools import partial
        from jax.sharding import PartitionSpec as P

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P("trial")),
            out_specs=P(),
        )
        def gradf(u, Y_block):
            return jax.grad(lambda uu: lp_sharded(uu, Y_block))(u)

        got = np.asarray(jax.jit(gradf)(u, jnp.asarray(Yp)))
        want = np.asarray(jax.grad(lambda uu: fns.log_prob(uu, jnp.asarray(Y)))(u))
        assert np.allclose(got, want, rtol=1e-8)


class TestShardedDrivers:
    def test_map_fit_sharded_matches_vmap_backend(self, rng):
        m = make_model(rng)
        fns = m._fns()
        Y = np.asarray(m._Y())
        mesh = make_mesh(chain=4, trial=2)
        u_all, nll_all = map_fit_sharded(
            fns, Y, mesh, jax.random.PRNGKey(0), n_restarts=4, maxiter=200
        )
        assert np.isfinite(nll_all).any()
        # same restarts through the single-device vmapped path
        from gpcsd_tpu.infer.map import map_fit

        res = map_fit(
            fns.neg_log_joint,
            fns.param_set,
            jnp.asarray(Y),
            jax.random.PRNGKey(0),
            n_restarts=4,
            backend="jax",
            maxiter=200,
        )
        # the sharded objective includes the log-det-Jacobian (posterior
        # geometry); compare best achieved *neg_log_joint* values instead
        best_sharded = np.inf
        for u in u_all:
            best_sharded = min(
                best_sharded, float(fns.neg_log_joint(jnp.asarray(u), jnp.asarray(Y)))
            )
        assert best_sharded < res.nll_best + abs(res.nll_best) * 0.05 + 1.0

    def test_nuts_sharded_runs_and_is_finite(self, rng):
        m = make_model(rng, ntrials=6)
        fns = m._fns()
        Y = np.asarray(m._Y())
        mesh = make_mesh(chain=4, trial=2)
        res = nuts_sharded(
            fns,
            Y,
            mesh,
            jax.random.PRNGKey(1),
            n_chains=4,
            num_warmup=30,
            num_samples=30,
            max_depth=6,
        )
        assert res.samples.shape == (4, 30, fns.param_set.dim)
        assert np.isfinite(res.samples).all()
        assert np.isfinite(res.logp).all()

    def test_nuts_sharded_mixed_policy_dict_basis(self, rng):
        """The PRODUCTION accelerator configuration on the virtual mesh:
        f32 factor policy (mixed path) + MAP-centered preconditioning, so
        the dict-valued {qt, qs} basis aux threads through shard_map +
        scan (the round-4 spatial-threading path — this is what runs on
        real chips)."""
        from gpcsd_tpu import config

        config.set_policy(factor_dtype="float32", compute_dtype="float32",
                          spatial_precondition=True)
        try:
            m = make_model(rng, ntrials=6)
            m._fns_cache = {}
            fns = m._fns(precondition=True)
            assert isinstance(fns.basis0, dict) and "qs" in fns.basis0
            Y = np.asarray(m._Y())
            mesh = make_mesh(chain=2, trial=2)
            res = nuts_sharded(
                fns, Y, mesh, jax.random.PRNGKey(2),
                n_chains=2, num_warmup=8, num_samples=8, max_depth=5,
            )
            assert np.isfinite(res.samples).all()
            assert np.isfinite(res.logp).all()
        finally:
            config.set_policy(factor_dtype="float64", compute_dtype="float64",
                          spatial_precondition=False)


class TestShardedSMC:
    def test_smc_sharded_matches_quality(self, rng):
        m = make_model(rng, ntrials=6)
        fns = m._fns()
        Y = np.asarray(m._Y())
        mesh = make_mesh(chain=4, trial=2)
        from gpcsd_tpu.parallel.sharded import smc_sharded

        res = smc_sharded(
            fns, Y, mesh, jax.random.PRNGKey(3), n_particles=64,
            n_mutation_steps=3,
        )
        assert res.particles.shape == (64, fns.param_set.dim)
        assert np.isfinite(res.particles).all()
        assert np.isfinite(res.log_evidence)
        assert int(res.n_stages) >= 1


class TestShardedADVI:
    def test_advi_sharded_runs(self, rng):
        m = make_model(rng, ntrials=6)
        fns = m._fns()
        Y = np.asarray(m._Y())
        mesh = make_mesh(chain=1, trial=8)
        from gpcsd_tpu.parallel.sharded import advi_sharded

        res = advi_sharded(
            fns, Y, mesh, jax.random.PRNGKey(5), num_steps=150, n_mc=4
        )
        assert np.isfinite(res.mu).all()
        assert np.isfinite(res.rho).all()
        elbo = np.asarray(res.elbo_trace)
        assert np.nanmean(elbo[-30:]) >= np.nanmean(elbo[:30]) - 1.0
