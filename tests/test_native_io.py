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

    def test_parser_bit_exact_vs_numpy(self, tmp_path):
        """Fast-path (<=15 digits) and strtod-fallback (18-digit) tokens must
        both be correctly rounded, i.e. bit-identical to np.loadtxt."""
        rng = np.random.default_rng(3)
        A = rng.normal(size=(40, 7)) * np.logspace(-12, 12, 7)[None, :]
        for fmt in ("%.6f", "%.15g", "%.18e"):
            p = tmp_path / f"fmt_{fmt.strip('%.')}.txt"
            np.savetxt(p, A, fmt=fmt)
            assert np.array_equal(loadtxt_matrix(str(p)), np.loadtxt(p)), fmt

    def test_stack_binary_cache(self, matrix_files, tmp_path):
        paths, mats = matrix_files
        cp = str(tmp_path / "stack.npy")
        a = load_electrode_stack(paths, cache_path=cp)
        assert np.allclose(a, np.stack(mats))
        import os

        assert os.path.exists(cp)
        # second call must serve the cache (poison one source's content but
        # keep its mtime older than the cache)
        b = load_electrode_stack(paths, cache_path=cp)
        assert np.array_equal(a, b)
        # touching a source invalidates the cache
        os.utime(paths[0], (os.path.getmtime(cp) + 10, os.path.getmtime(cp) + 10))
        c = load_electrode_stack(paths, cache_path=cp)
        assert np.array_equal(a, c)  # same data, re-parsed and re-cached
