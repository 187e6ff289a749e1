"""bench.py sampler-health gates (VERDICT r3 next #2): the headline NUTS
number must be impossible to fake with a degenerate or non-mixing run."""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def _healthy():
    return {
        "samples_per_s_per_chip_median": 0.41,
        "mean_leapfrogs_per_sample": 22.0,
        "max_rhat": 1.01,
        "config": {"chains": 4, "warmup": 500, "samples": 500,
                   "max_depth": 7, "chunk_size": 3},
    }


class TestArtifactGates:
    def test_healthy_passes(self):
        rate, steps, src, max_rhat = bench.artifact_nuts_rate(_healthy())
        assert rate == 0.41 and steps == 22.0
        assert "max_depth=7" in src and "4x(500+500)" in src
        assert max_rhat == 1.01

    def test_round2_frozen_chains_rejected(self):
        art = _healthy()
        art["max_rhat"] = 1.2e4  # the round-2 pathology
        assert bench.artifact_nuts_rate(art) is None
        assert any("max_rhat" in f for f in bench.artifact_gate_failures(art))

    def test_round3_degenerate_leapfrogs_rejected(self):
        art = _healthy()
        art["mean_leapfrogs_per_sample"] = 1.0  # the round-3 pathology
        assert bench.artifact_nuts_rate(art) is None

    def test_missing_fields_rejected(self):
        assert bench.artifact_nuts_rate({}) is None
        art = _healthy()
        art["max_rhat"] = None
        assert bench.artifact_nuts_rate(art) is None

    def test_borderline_rhat(self):
        art = _healthy()
        art["max_rhat"] = 1.049
        assert bench.artifact_nuts_rate(art) is not None
        art["max_rhat"] = 1.051
        assert bench.artifact_nuts_rate(art) is None
