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


def _prod(shape) -> float:
    out = 1.0
    for d in shape:
        out *= int(d)
    return out


def _jaxpr_flops(jaxpr) -> float:
    """Matmul/conv FLOPs of one (open) jaxpr, recursing into sub-jaxprs.

    Counts ``2 * MACs`` for ``dot_general`` and ``conv_general_dilated``
    (where essentially all of a convnet's FLOPs live); elementwise and data-
    movement ops are ignored.  ``scan`` bodies are multiplied by the trip
    count; ``cond``/``while`` branches are counted once (an upper bound of
    one branch; ``while`` trip counts are unknowable statically).
    """
    total = 0.0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            (lhs_c, _), _ = eqn.params["dimension_numbers"]
            out = _prod(eqn.outvars[0].aval.shape)
            k = _prod(eqn.invars[0].aval.shape[d] for d in lhs_c)
            total += 2.0 * out * k
        elif prim == "conv_general_dilated":
            dn = eqn.params["dimension_numbers"]
            rhs_shape = eqn.invars[1].aval.shape
            out = _prod(eqn.outvars[0].aval.shape)
            # per-output-element MACs = kH*kW*Cin/groups = prod(rhs)/Cout
            macs = _prod(rhs_shape) / max(int(rhs_shape[dn.rhs_spec[0]]), 1)
            total += 2.0 * out * macs
        else:
            mult = 1.0
            if prim == "scan":
                mult = float(eqn.params.get("length", 1))
            for p in eqn.params.values():
                vals = p if isinstance(p, (list, tuple)) else (p,)
                for v in vals:
                    inner = getattr(v, "jaxpr", None)
                    if inner is not None and hasattr(inner, "eqns"):
                        total += mult * _jaxpr_flops(inner)
                    elif hasattr(v, "eqns"):
                        total += mult * _jaxpr_flops(v)
    return total


def analytic_flops(fn: Callable, *args) -> float:
    """Backend-independent FLOPs per call: trace to a jaxpr and count
    ``dot_general``/``conv_general_dilated`` MACs x2 (see :func:`_jaxpr_flops`).

    Works where XLA's ``cost_analysis`` returns ``None`` (it does for large
    multi-computation modules); only needs a trace, never a compile.
    """
    try:
        closed = jax.make_jaxpr(fn)(*args)
    except Exception:
        return 0.0
    return _jaxpr_flops(closed.jaxpr)


def flops_estimate(jitted_fn: Callable, *args) -> float:
    """FLOPs per call of a jitted function.

    Prefers ``Lowered.cost_analysis()`` (pre-compile, backend-independent —
    no second device compilation); falls back to the analytic jaxpr count
    (:func:`analytic_flops`) where XLA's analysis is unavailable or returns
    nothing (observed: ``None`` for the full detection graph).  Returns 0.0
    only when both fail.
    """
    try:
        lowered = jitted_fn.lower(*args)
        ca = lowered.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        f = float((ca or {}).get("flops", 0.0))
        if f > 0:
            return f
    except Exception:
        pass
    return analytic_flops(jitted_fn, *args)


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
