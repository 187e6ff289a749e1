"""Per-trial shift estimation and watershed segmentation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpcsd_tpu as g
from gpcsd_tpu.models.shifts import estimate_shifts, shift_component, shift_nll
from gpcsd_tpu.ops.forward import fwd_model_1d
from gpcsd_tpu.utils.segmentation import segment_csd, watershed


class TestShiftComponent:
    def test_shift_moves_peak(self):
        t = np.linspace(0, 30, 61)
        mu = np.exp(-0.5 * (t[None, :] - 15.0) ** 2)  # (1, nt) peak at 15
        shifted = np.asarray(shift_component(jnp.asarray(mu), t, jnp.asarray(2.0)))
        # evaluating at t+2 moves the apparent peak EARLIER by 2
        assert abs(t[np.argmax(shifted[0])] - 13.0) < 0.6

    def test_zero_shift_identity(self, rng):
        t = np.linspace(0, 10, 21)
        mu = rng.normal(size=(3, 21))
        out = np.asarray(shift_component(jnp.asarray(mu), t, jnp.asarray(0.0)))
        assert np.allclose(out, mu)


class TestEstimateShifts:
    def test_recovers_known_shifts(self, rng):
        nx, nt, ntrials = 24, 40, 15
        x = np.linspace(0, 2300, nx)
        t = np.linspace(0, 60, nt)
        z = np.linspace(0, 2300, 93)
        zc, tc = z.reshape(-1, 1), t.reshape(1, -1)
        comp = np.exp(-((zc - 600) ** 2) / (2 * 180**2)) * np.exp(
            -((tc - 25) ** 2) / (2 * 4**2)
        ) - np.exp(-((zc - 1100) ** 2) / (2 * 180**2)) * np.exp(
            -((tc - 25) ** 2) / (2 * 4**2)
        )
        comp_lfp = np.asarray(fwd_model_1d(comp, z, x, 150.0))
        scale = np.max(np.abs(comp_lfp))
        comp_lfp = comp_lfp / scale
        tau_true = 3.0 * rng.standard_normal(ntrials)
        lfp = np.zeros((nx, nt, ntrials))
        for tr in range(ntrials):
            lfp[:, :, tr] = np.array(
                [np.interp(t + tau_true[tr], t, comp_lfp[ch]) for ch in range(nx)]
            )
        lfp += 0.02 * rng.standard_normal(lfp.shape)

        m = g.GPCSD1D(
            lfp - lfp.mean(2, keepdims=True), x.reshape(-1, 1), t.reshape(-1, 1)
        )
        m.fit(n_restarts=2, seed=0)
        fac = m._fns().build_factors(m._theta())
        res = estimate_shifts(lfp, np.zeros((nx, nt)), comp_lfp[None], t, fac)
        err = np.abs(res.tau[:, 0] - tau_true)
        assert np.median(err) < 0.5  # sub-sample-resolution recovery
        assert res.converged.mean() > 0.5


class TestWatershed:
    def test_two_basin_split(self):
        # two gaussian bumps -> two labels covering their neighborhoods
        xx, tt = np.meshgrid(np.arange(40), np.arange(40), indexing="ij")
        img = np.exp(-((xx - 10) ** 2 + (tt - 10) ** 2) / 30.0) + np.exp(
            -((xx - 30) ** 2 + (tt - 30) ** 2) / 30.0
        )
        labels, n = segment_csd(img, rel_threshold=0.5, min_distance=8)
        assert n == 2
        assert labels[10, 10] != labels[30, 30]
        assert labels[10, 10] > 0 and labels[30, 30] > 0

    def test_signed_sources_sinks(self):
        xx, tt = np.meshgrid(np.arange(40), np.arange(40), indexing="ij")
        img = np.exp(-((xx - 10) ** 2 + (tt - 20) ** 2) / 40.0) - np.exp(
            -((xx - 30) ** 2 + (tt - 20) ** 2) / 40.0
        )
        labels, n = segment_csd(img, rel_threshold=0.5, min_distance=8)
        assert n == 2

    def test_watershed_respects_markers(self):
        elev = np.zeros((10, 10))
        markers = np.zeros((10, 10), dtype=int)
        markers[2, 2] = 1
        markers[7, 7] = 2
        labels = watershed(elev, markers)
        assert set(np.unique(labels)) == {1, 2}
