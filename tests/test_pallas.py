"""Pallas fused quad-form kernel: correctness in interpreter mode.

The axon TPU tunnel's remote-compile service cannot build Mosaic kernels
(HTTP 500 from tpu_compile_helper), so on this infrastructure the kernel is
validated via the Pallas interpreter and ships disabled by default
(PERF.md); on direct-attached TPU it can be enabled with ``use_pallas``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpcsd_tpu.ops.pallas.quadform import quadform


class TestQuadformKernel:
    def test_interpret_matches_xla(self, rng):
        nx, nt, B = 8, 32, 5
        qs = jnp.asarray(np.linalg.qr(rng.normal(size=(nx, nx)))[0])
        qt = jnp.asarray(np.linalg.qr(rng.normal(size=(nt, nt)))[0])
        dinv = jnp.asarray(rng.uniform(0.5, 2.0, size=(nx, nt)))
        Y = jnp.asarray(rng.normal(size=(B, nx, nt)))
        r_xla = float(quadform(qs, qt, dinv, Y, use_pallas=False))
        r_pal = float(quadform(qs, qt, dinv, Y, use_pallas=True, interpret=True))
        assert np.allclose(r_xla, r_pal, rtol=1e-5)

    def test_matches_loglik_quad_term(self, rng):
        """The kernel computes exactly the quad term of the marginal
        likelihood (reference ``gpcsd1d.py:124-127``)."""
        from gpcsd_tpu.ops import kronlik

        nx, nt, B = 6, 16, 3
        A = rng.normal(size=(nx, nx))
        Ks = A @ A.T + nx * np.eye(nx)
        Bm = rng.normal(size=(nt, nt))
        Kt = Bm @ Bm.T + nt * np.eye(nt)
        Y = rng.normal(size=(B, nx, nt))
        fac = kronlik.comp_eig_d(jnp.asarray(Ks), jnp.asarray(Kt), 0.3)
        alpha = kronlik.whiten(fac, jnp.asarray(Y))
        want = float(jnp.sum(jnp.square(alpha) / fac.d))
        got = float(
            quadform(fac.qs, fac.qt, 1.0 / fac.d, jnp.asarray(Y),
                     use_pallas=True, interpret=True)
        )
        assert np.allclose(got, want, rtol=1e-5)
