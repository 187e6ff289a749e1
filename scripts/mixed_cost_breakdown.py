"""Per-stage cost breakdown of the mixed-precision likelihood on TPU.

The mixed factor path (kronlik.eigh_mixed) fixed the f32 likelihood noise
at a measured ~5x evals/s cost (280 -> 55 at the auditory size).  This
script times the stages in isolation so optimization targets the real
bottleneck instead of a guess: spatial f64 slices-Jacobi vs temporal
df32 refinement sweeps vs f64 elementwise (Kt build, D, reductions).

Run when the device is otherwise idle; axon microbenchmarks lie for
single dispatches, so every stage is timed over n_iters distinct inputs
with one final block (bench.py's method).
"""

import sys
import time
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ITERS = 30


def timeit(fn, inputs):
    out = fn(inputs[0])
    import jax

    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for x in inputs:
        out = fn(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / len(inputs) * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp
    import bench
    from gpcsd_tpu.ops import kronlik

    m = bench.build_problem()
    fns = m._fns(precondition=True)
    Y = m._Y()
    theta = m._theta()
    u0 = np.asarray(fns.param_set.pack(theta))
    rng = np.random.default_rng(0)
    us = [jnp.asarray(u0 + 0.01 * rng.normal(size=u0.size)) for _ in range(N_ITERS)]

    # full value+grad (the hot path)
    vg = jax.jit(jax.value_and_grad(fns.neg_log_joint))
    print("value+grad: %.2f ms" % timeit(lambda u: vg(u, Y), us))

    # forward only
    f = jax.jit(fns.neg_log_joint)
    print("value only: %.2f ms" % timeit(lambda u: f(u, Y), us))

    # factors only (no contraction)
    bf = jax.jit(lambda u: fns.build_factors(fns.param_set.unpack(u)).d)
    print("factors only: %.2f ms" % timeit(bf, us))

    # spatial eigh alone (f64 slices on accelerator)
    Ks = fns.build_ks(theta)
    Kss = [jnp.asarray(np.asarray(Ks) * (1 + 0.01 * rng.normal())) for _ in range(N_ITERS)]
    se = jax.jit(lambda k: kronlik._factor_eigh(k)[0])
    print("spatial eigh (n=%d): %.2f ms" % (Ks.shape[-1], timeit(se, Kss)))

    # temporal mixed eigh alone
    Kt = fns.build_kt(theta)
    Kts = [jnp.asarray(np.asarray(Kt) * (1 + 0.01 * rng.normal())) for _ in range(N_ITERS)]
    te = jax.jit(lambda k: kronlik.eigh_mixed(k)[0])
    print("temporal eigh_mixed (n=%d): %.2f ms" % (Kt.shape[-1], timeit(te, Kts)))

    # Kt build alone (f64 elementwise)
    bk = jax.jit(lambda u: fns.build_kt(fns.param_set.unpack(u)))
    print("Kt build: %.2f ms" % timeit(bk, us))

    # whiten + quad reduction with fixed factors
    fac = fns.build_factors(theta)
    Ys = [jnp.asarray(np.asarray(Y) + 0.001 * i) for i in range(N_ITERS)]
    lq = jax.jit(lambda y: kronlik.loglik(fac, y))
    print("whiten+quad: %.2f ms" % timeit(lq, Ys))


if __name__ == "__main__":
    main()
