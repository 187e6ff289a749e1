"""Torus-graph tests: score-matching recovery on Gibbs-sampled ground truth.

Validation strategy: since the estimator is closed-form, correctness is
checked generatively — sample from a known torus graph, recover the
coupling parameters, and check edge detection separates true edges from
non-edges.
"""

import jax
import numpy as np
import pytest

from gpcsd_tpu.models.torus_graph import (
    bootstrap_partial_plv,
    gibbs_sample,
    layout,
    pair_index,
    suff_stats,
    torusGraphs,
    torus_graph_fit,
)


def make_true_phi(d=5, kappa=1.2, edges=((0, 1), (1, 2), (3, 4))):
    lay = layout(d, (False, True, False))
    phi = np.zeros(lay.m)
    pairs = [tuple(p) for p in lay.pairs.tolist()]
    for e in edges:
        p = pairs.index(tuple(sorted(e)))
        phi[lay.diff_off + p] = kappa  # pure cos-difference coupling
    return lay, phi


class TestLayout:
    def test_pair_index(self):
        p = pair_index(4)
        assert p.shape == (6, 2)
        assert (p[:, 0] < p[:, 1]).all()

    def test_layout_sizes(self):
        lay = layout(6, (True, True, True))
        assert lay.m == 12 + 30 + 30
        lay = layout(48, (False, True, False))
        assert lay.m == 2 * 1128  # the auditory two-probe size

    def test_suff_stats_values(self):
        lay = layout(3, (True, True, True))
        X = np.array([[0.0], [np.pi / 2], [np.pi]])
        S = np.asarray(suff_stats(lay, X)).ravel()
        # marginals: cos(0), cos(pi/2), cos(pi), sin(0), sin(pi/2), sin(pi)
        assert np.allclose(S[:6], [1, 0, -1, 0, 1, 0], atol=1e-12)
        # diffs (pairs (0,1),(0,2),(1,2)): cos(-pi/2), cos(-pi), cos(-pi/2)
        assert np.allclose(S[6:9], [0, -1, 0], atol=1e-12)


class TestScoreMatchingRecovery:
    def test_recovers_coupling_and_detects_edges(self):
        d = 5
        lay, phi_true = make_true_phi(d=d, kappa=1.2)
        X = gibbs_sample(phi_true, d, 3000, seed=1)
        res = torus_graph_fit(X)
        phi_hat = np.asarray(res.phi)
        # couplings recovered within sampling error
        assert np.allclose(phi_hat, phi_true, atol=0.2)
        pairs = [tuple(p) for p in res.pairs.tolist()]
        true_edges = {(0, 1), (1, 2), (3, 4)}
        pv = np.asarray(res.pvals)
        for i, p in enumerate(pairs):
            if p in true_edges:
                assert pv[i] < 1e-4, f"true edge {p} not detected (p={pv[i]})"
        # most non-edges should be non-significant at Bonferroni level
        non_edge_pv = [pv[i] for i, p in enumerate(pairs) if p not in true_edges]
        assert np.mean(np.asarray(non_edge_pv) > 0.05 / len(pairs)) > 0.7

    def test_null_uniform_phases_no_edges(self, rng):
        X = rng.uniform(0, 2 * np.pi, size=(6, 2000))
        res = torus_graph_fit(X)
        assert np.asarray(res.kappa).max() < 0.3
        assert np.asarray(res.graph).sum() <= 1  # at most one false positive

    def test_full_model_fits(self):
        d = 4
        lay, phi_true = make_true_phi(d=d, kappa=1.0, edges=((0, 1),))
        X = gibbs_sample(phi_true, d, 1500, seed=2)
        res = torus_graph_fit(X, sel_mode=(True, True, True))
        assert np.isfinite(np.asarray(res.phi)).all()
        # the (0,1) edge must still dominate
        pairs = [tuple(p) for p in res.pairs.tolist()]
        k = np.asarray(res.kappa)
        assert pairs[int(np.argmax(k))] == (0, 1)

    def test_cond_coupling_monotone_in_kappa(self):
        d = 4
        plvs = []
        for kappa in (0.4, 1.2):
            _, phi_true = make_true_phi(d=d, kappa=kappa, edges=((0, 1),))
            X = gibbs_sample(phi_true, d, 2000, seed=3)
            res = torus_graph_fit(X)
            pairs = [tuple(p) for p in res.pairs.tolist()]
            plvs.append(float(np.asarray(res.cond_coupling)[pairs.index((0, 1))]))
        assert plvs[1] > plvs[0]


class TestPyTGShim:
    def test_return_structure(self, rng):
        X = rng.uniform(0, 2 * np.pi, size=(6, 300))
        graph, _, _, nodepairs, _, phi, phi_cov = torusGraphs(X, selMode=(False, True, False))
        assert nodepairs["pVals"].shape == (15,)
        assert nodepairs["condCoupling"].shape == (15,)
        assert phi.shape == (30,)
        assert phi_cov.shape == (30, 30)
        assert graph.shape == (15,)


class TestBootstrap:
    def test_bootstrap_shapes_and_spread(self):
        d = 4
        _, phi_true = make_true_phi(d=d, kappa=1.0, edges=((0, 1),))
        X = gibbs_sample(phi_true, d, 600, seed=4)
        bs = bootstrap_partial_plv(X, nboot=8, key=jax.random.PRNGKey(0), batch_size=4)
        assert bs.shape == (6, 8)
        assert np.isfinite(bs).all()
        assert bs.std(axis=1).max() > 0  # resampling actually varies
