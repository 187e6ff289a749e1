"""Pallas TPU kernel: fused Kronecker-whitened quadratic form.

Computes ``sum_b || D^{-1/2} . (Qs^T Y_b Qt) ||^2`` — the per-trial
reduction at the heart of the marginal likelihood (SURVEY.md §7.9) — in a
single kernel: each grid step streams one trial through VMEM, does the two
congruence matmuls on the MXU, and accumulates the masked reduction without
ever writing the (ntrials, nx, nt) whitened intermediate back to HBM.

Status: behind a flag (``use_pallas`` in :func:`quadform`), per the survey's
"measure against the XLA baseline before keeping" rule — at reference
problem sizes the XLA-fused einsum is already near memory-bound optimum, so
this kernel is expected to matter only for much larger trial batches; see
PERF.md for measurements.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU/GPU-only in some builds; import lazily-tolerant
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _quadform_kernel(qs_ref, qt_ref, dinv_ref, y_ref, out_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[0, 0] = jnp.zeros((), out_ref.dtype)

    y = y_ref[0]  # (nx, nt) block for this trial
    alpha = jnp.dot(
        jnp.dot(qs_ref[:].T, y, preferred_element_type=jnp.float32),
        qt_ref[:],
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0] += jnp.sum(alpha * alpha * dinv_ref[:])


@functools.partial(jax.jit, static_argnames=("use_pallas", "interpret"))
def quadform(qs, qt, dinv, Y, use_pallas: bool = False, interpret: bool = False):
    """``sum_b sum_ij (Qs^T Y_b Qt)_ij^2 * dinv_ij``.

    :param qs: (nx, nx); :param qt: (nt, nt); :param dinv: (nx, nt)
    :param Y: (ntrials, nx, nt)
    :param interpret: run the kernel in the Pallas interpreter (any backend;
        used for correctness tests — the axon remote-compile service cannot
        build Mosaic kernels, see PERF.md)
    """
    if not (use_pallas and _HAS_PALLAS):
        alpha = jnp.einsum(
            "xi,bxt,tj->bij", qs, Y, qt, precision=jax.lax.Precision.HIGHEST
        )
        return jnp.sum(jnp.square(alpha) * dinv[None])

    ntrials, nx, nt = Y.shape
    f32 = jnp.float32
    out = pl.pallas_call(
        _quadform_kernel,
        grid=(ntrials,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((nx, nx), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, nt), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, nt), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nx, nt), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), f32),
    )(qs.astype(f32), qt.astype(f32), dinv.astype(f32), Y.astype(f32))
    return out[0, 0]
