"""Diagnostics tests: R-hat and ESS on known chain structures."""

import numpy as np

from gpcsd_tpu.infer.diagnostics import (
    ess,
    ess_bulk,
    ess_tail,
    rhat,
    summarize,
)


def _ar1(rng, phi, m, n, dim=1):
    """AR(1) chains with stationary marginal N(0, 1/(1-phi^2))."""
    x = np.zeros((m, n, dim))
    z = rng.normal(size=(m, n, dim))
    x[:, 0] = z[:, 0] / np.sqrt(1.0 - phi**2)
    for i in range(1, n):
        x[:, i] = phi * x[:, i - 1] + z[:, i]
    return x


class TestRhat:
    def test_identical_chains_near_one(self, rng):
        chains = rng.normal(size=(4, 500, 2))
        r = rhat(chains)
        assert np.all(r < 1.05)

    def test_shifted_chains_large(self, rng):
        chains = rng.normal(size=(4, 200, 1))
        chains[0] += 5.0  # one chain stuck elsewhere
        assert rhat(chains)[0] > 1.5

    def test_frozen_chains_inf_no_warning(self, rng):
        # frozen chains (zero within-chain variance) must report inf
        # explicitly, not emit a divide-by-zero RuntimeWarning — this is
        # the exact pathology of a stuck sampler (VERDICT r3 weak #4)
        import warnings

        chains = np.tile(
            rng.normal(size=(4, 1, 2)), (1, 100, 1)
        )  # 4 chains each pinned at a constant
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            r = rhat(chains)
        assert np.all(np.isinf(r))

    def test_partially_frozen_dim(self, rng):
        chains = rng.normal(size=(4, 100, 2))
        chains[:, :, 1] = 3.14  # dim 1 frozen everywhere
        r = rhat(chains)
        assert r[0] < 1.1 and np.isinf(r[1])


class TestESS:
    def test_iid_ess_near_n(self, rng):
        chains = rng.normal(size=(2, 1000, 1))
        e = ess(chains)[0]
        assert 1000 < e < 3500  # around 2000, loose MC bounds

    def test_correlated_ess_small(self, rng):
        # AR(1) with phi=0.95 -> tau ~ (1+phi)/(1-phi) = 39
        n = 4000
        x = np.zeros((1, n, 1))
        z = rng.normal(size=n)
        for i in range(1, n):
            x[0, i, 0] = 0.95 * x[0, i - 1, 0] + z[i]
        e = ess(x)[0]
        assert e < n / 10


class TestRankNormalizedESS:
    """Vehtari et al. 2021 acceptance (VERDICT r4 next #6): bulk/tail ESS
    against chains with KNOWN integrated autocorrelation time
    tau = (1+phi)/(1-phi)."""

    def test_ar1_bulk_ess_matches_theory(self, rng):
        m, n, phi = 4, 4000, 0.7  # tau = 5.667 -> ESS ~ 2824
        e = ess_bulk(_ar1(rng, phi, m, n))[0]
        expected = m * n * (1 - phi) / (1 + phi)
        assert 0.6 * expected < e < 1.6 * expected

    def test_ar1_strong_correlation(self, rng):
        m, n, phi = 4, 8000, 0.95  # tau = 39
        e = ess_bulk(_ar1(rng, phi, m, n))[0]
        expected = m * n * (1 - phi) / (1 + phi)
        assert 0.5 * expected < e < 2.0 * expected

    def test_antithetic_ess_exceeds_n(self, rng):
        # negative lag-1 correlation -> tau < 1 -> ESS > chains*samples;
        # the raw-scale Geyer variant floored tau at 1 and could NEVER
        # report this (the round-4 'min_ess == cap' ambiguity)
        m, n, phi = 4, 4000, -0.5  # tau = 1/3 -> ESS ~ 3*m*n
        e = ess_bulk(_ar1(rng, phi, m, n))[0]
        assert e > 1.5 * m * n

    def test_iid_not_pinned_at_cap(self, rng):
        # iid draws: ESS should be NEAR m*n but not exactly == m*n for
        # every seed (the estimator-ceiling signature)
        vals = [
            ess_bulk(np.random.default_rng(s).normal(size=(4, 500, 1)))[0]
            for s in range(5)
        ]
        assert all(0.7 * 2000 < v < 1.6 * 2000 for v in vals)
        assert len({round(v, 6) for v in vals}) > 1  # not all identical

    def test_tail_ess_iid(self, rng):
        e = ess_tail(rng.normal(size=(4, 1000, 1)))[0]
        assert 1000 < e < 8000

    def test_tail_ess_detects_tail_disagreement(self, rng):
        # same bulk, one chain with truncated tails: bulk ESS stays
        # healthy-ish while the tail indicator mixes poorly across chains
        m, n = 4, 2000
        x = rng.normal(size=(m, n, 1))
        x[0] = np.clip(x[0], -1.0, 1.0)  # chain 0 never visits the tails
        assert ess_tail(x)[0] < 0.5 * ess_bulk(x)[0]

    def test_ess_alias_is_bulk(self, rng):
        x = rng.normal(size=(4, 400, 2))
        assert np.allclose(ess(x), ess_bulk(x))


class TestRankNormalizedRhat:
    def test_heavy_tail_robustness(self, rng):
        # rank normalization keeps R-hat meaningful for Cauchy draws,
        # where the raw-scale estimator is variance-undefined
        chains = rng.standard_cauchy(size=(4, 1000, 1))
        assert rhat(chains)[0] < 1.05

    def test_folded_catches_scale_mismatch(self, rng):
        # equal means, different variances: the bulk transform alone can
        # miss this; the folded term must flag it
        chains = rng.normal(size=(4, 500, 1))
        chains[0] *= 4.0
        assert rhat(chains)[0] > 1.05


class TestSummarize:
    def test_structure(self, rng):
        chains = rng.normal(size=(2, 300, 3)) + np.array([0.0, 5.0, -2.0])
        s = summarize(chains, names=["a", "b", "c"])
        assert abs(s["b"]["mean"] - 5.0) < 0.2
        assert s["a"]["ess"] > 100
        assert abs(s["c"]["q5"] - (-2.0 - 1.645)) < 0.3
