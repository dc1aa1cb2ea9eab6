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


# One v5e chip: 197 TFLOP/s bf16 MXU peak (394 TOPS int8).
V5E_BF16_PEAK_FLOPS = 197e12


def flops_estimate(jitted_fn: Callable, *args) -> float:
    """FLOPs per call of a jitted function, from XLA's HLO cost analysis.

    Uses ``Lowered.cost_analysis()`` (pre-compile, backend-independent) so no
    second device compilation happens; falls back to the compiled
    executable's analysis where the lowered one is unavailable.  Returns 0.0
    when neither is supported by the backend.
    """
    try:
        lowered = jitted_fn.lower(*args)
    except Exception:
        return 0.0
    for stage in (lowered, None):
        try:
            ca = stage.cost_analysis() if stage is not None else (
                lowered.compile().cost_analysis()
            )
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            f = float((ca or {}).get("flops", 0.0))
            if f > 0:
                return f
        except Exception:
            continue
    return 0.0


def mfu(
    flops_per_item: float, items_per_sec: float,
    peak_flops: float = V5E_BF16_PEAK_FLOPS,
) -> float:
    """Model FLOPs utilisation: achieved FLOP/s over the chip's bf16 peak."""
    if flops_per_item <= 0 or items_per_sec <= 0:
        return 0.0
    return flops_per_item * items_per_sec / peak_flops


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
