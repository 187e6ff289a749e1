"""Checkpoint round-trips: reference-schema pickles and sampler state."""

import numpy as np
import pytest

import gpcsd_tpu as g
from gpcsd_tpu.io.checkpoint import (
    load_params,
    load_sampler_state,
    save_params,
    save_sampler_state,
)


def make_model(rng):
    x = (np.arange(6) * 100.0).reshape(-1, 1)
    t = np.arange(8).reshape(-1, 1) * 1.0
    return g.GPCSD1D(rng.normal(size=(6, 8, 2)), x, t, ngl=16)


class TestParamPickles:
    def test_round_trip(self, rng, tmp_path):
        m = make_model(rng)
        m.R["value"] = 123.0
        save_params(m, str(tmp_path / "params.pkl"))
        m2 = make_model(rng)
        load_params(m2, str(tmp_path / "params.pkl"))
        assert m2.R["value"] == 123.0
        assert m2.extract_model_params() == m.extract_model_params()

    def test_reference_schema_keys(self, rng, tmp_path):
        """The pickle payload must use the reference's exact key names
        (``gpcsd1d.py:84-91``) so reference-produced pickles load."""
        import pickle

        m = make_model(rng)
        save_params(m, str(tmp_path / "p.pkl"))
        with open(tmp_path / "p.pkl", "rb") as f:
            d = pickle.load(f)
        assert set(d) == {
            "R", "sig2n", "spatial_ell", "temporal_ell_list", "temporal_sigma2_list",
        }


class TestSamplerState:
    def test_pytree_round_trip(self, rng, tmp_path):
        state = {
            "u": rng.normal(size=(4, 7)),
            "step_size": np.float64(0.3),
            "inv_mass": rng.uniform(size=7),
            "key": np.array([1, 2], dtype=np.uint32),
        }
        path = str(tmp_path / "ckpt")
        save_sampler_state(state, path)
        restored = load_sampler_state(path, like=state)
        for k in state:
            assert np.allclose(np.asarray(restored[k]), np.asarray(state[k]))
