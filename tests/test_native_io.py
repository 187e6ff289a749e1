"""Native C++ loader tests (with numpy-fallback coverage)."""

import os

import numpy as np
import pytest

from gpcsd_tpu.io.loaders import load_electrode_stack, loadtxt_matrix
from gpcsd_tpu.native import lib


@pytest.fixture
def matrix_files(tmp_path, rng):
    paths = []
    mats = []
    for i in range(4):
        M = rng.normal(size=(50, 20)) * 10.0 ** rng.integers(-8, 8)
        p = tmp_path / f"m{i}.txt"
        np.savetxt(p, M)
        paths.append(str(p))
        mats.append(M)
    return paths, mats


class TestLoadtxt:
    def test_matches_numpy(self, matrix_files):
        paths, mats = matrix_files
        for p, M in zip(paths, mats):
            got = loadtxt_matrix(p)
            assert got.shape == M.shape
            assert np.allclose(got, M, rtol=1e-15)

    def test_stack(self, matrix_files):
        paths, mats = matrix_files
        got = load_electrode_stack(paths)
        assert got.shape == (4, 50, 20)
        assert np.allclose(got, np.stack(mats), rtol=1e-15)

    def test_missing_file(self, tmp_path):
        with pytest.raises((FileNotFoundError, OSError)):
            loadtxt_matrix(str(tmp_path / "nope.txt"))

    def test_native_lib_builds(self):
        # in this environment g++ exists; the native path must be live
        assert lib() is not None

    def test_scientific_and_int_formats(self, tmp_path):
        p = tmp_path / "mixed.txt"
        p.write_text("1 2.5 -3e-4\n4.0E+2 -5 6.25\n")
        got = loadtxt_matrix(str(p))
        assert np.allclose(got, [[1, 2.5, -3e-4], [400.0, -5, 6.25]])
