"""Profiling / observability helpers.

The reference's only hooks are a cProfile dump in ``GPCSD2D.fit``
(``gpcsd2d.py:242-247``) and tqdm progress bars.  Here the first-class
counters are the north-star metrics (BASELINE.json): marginal-likelihood
evals/s and sampler transitions/s, plus a jax.profiler trace context for
XLA-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def xla_trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class Throughput:
    """Wall-clock throughput counter for repeated device calls.

    Measures honestly on asynchronous backends: blocks on the final result
    only, over many iterations with distinct inputs.
    """

    name: str = "evals"
    count: int = 0
    seconds: float = 0.0
    _t0: float = field(default=0.0, repr=False)

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds += time.perf_counter() - self._t0
        return False

    def add(self, n=1):
        self.count += n

    @property
    def rate(self):
        return self.count / self.seconds if self.seconds > 0 else float("nan")

    def __str__(self):
        return f"{self.name}: {self.count} in {self.seconds:.2f}s = {self.rate:.2f}/s"


def measure_evals_per_second(fn, args_list, warmup=1):
    """Throughput of ``fn`` over a list of argument tuples (compiles first)."""
    for a in args_list[:warmup]:
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    out = None
    for a in args_list:
        out = fn(*a)
    jax.block_until_ready(out)
    return len(args_list) / (time.perf_counter() - t0)
