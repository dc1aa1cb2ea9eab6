"""Profiling / tracing hooks (SURVEY.md §5 auxiliary subsystems).

The reference exposes no profiler; monitoring is TensorBoard scalars.  Here:

* :func:`trace` — context manager around ``jax.profiler.trace`` writing a
  TensorBoard-viewable XPlane trace (open with TB's profile plugin),
* :func:`annotate` — named region inside a trace (``TraceAnnotation``),
* :func:`time_fn` — compile-then-measure wall-clock helper used by the
  benchmarks (blocks on device completion; reports per-call ms).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Tuple

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def time_fn(
    fn: Callable, *args, warmup: int = 2, iters: int = 10
) -> Tuple[float, Any]:
    """Returns (ms_per_call, last_output). ``fn`` should be jitted."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0, out
