"""Post-training quantization: INT8 PTQ (weights + activations) and FP16.

Functional spec — the reference's export-time quantization surface
(``yolo_head_training/yolo_head/exportable_mesh_model.py:141-146,175-184``):
``quantization_mode`` INT8|FP16, an optional ``calibration_loader``,
``calibration_method='percentile'`` with ``calibration_percentile=99.99``
over ``calibration_batches=16``, and a ``selective_quantizer`` that exempts
chosen layers.  There the work is delegated to pytorch-quantization +
TensorRT (``exportable_mesh_model.py:396-405``); both are GPU-vendor
runtimes, so this module re-designs the capability TPU-native instead of
wrapping them:

* **Weights**: symmetric per-output-channel int8 (scale = amax/127 over the
  non-output axes of each conv/dense kernel).  The quantized artifact
  (:func:`save_quantized`) stores int8 kernels + f32 scales — ~4x smaller
  than the f32 msgpack checkpoint.
* **Activations**: symmetric per-tensor int8.  Calibration
  (:func:`calibrate_activations`) observes the input of every ``nn.Conv`` /
  ``nn.ConvTranspose`` via a flax method interceptor and records the
  percentile amax (per-batch percentile, max across batches — the same
  estimator family as pytorch-quantization's percentile calibrator).
* **Execution**: fake-quant (quantize->dequantize) folded into the SAME
  deploy graph — weights fake-quantized in the variables pytree
  (:func:`fake_quant_variables`), activations fake-quantized by a tracing
  -time interceptor (:func:`quantized_apply`) — so PTQ accuracy is measured
  through the production jitted pipeline and XLA fuses the scale multiplies
  into the convs.  On TPU the *throughput* format of record stays bf16 (the
  MXU's native half precision, the deploy default); int8 here is an
  accuracy/artifact-size contract matching the reference's PTQ semantics,
  not a kernel bet on XLA's int8 conv lowering.
* **FP16** (:func:`fp16_variables`): weights converted through half
  precision, the reference's ``QuantizationMode.FP16`` semantics
  (``exportable_mesh_model.py:177``).

The ONNX leg (``onnx_export.export_onnx(..., quantize='int8')``) ships the
same per-channel int8 kernels as standard weight-QDQ ONNX
(initializer int8 + ``DequantizeLinear``); its interpreter executes them for
verification.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "quantize_array",
    "dequantize_array",
    "quantize_weights",
    "fake_quant_variables",
    "calibrate_activations",
    "quantized_apply",
    "ptq",
    "PTQResult",
    "fp16_variables",
    "save_quantized",
    "load_quantized",
]


# --------------------------------------------------------------------------- #
# Weight quantization
# --------------------------------------------------------------------------- #


def quantize_array(
    w: np.ndarray, axis: int = -1
) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric int8 quantization of ``w`` with per-slice scales along
    ``axis`` (the output-channel axis: flax kernels are ``[..., out]``).

    Returns ``(q int8, scale f32)`` with ``scale`` keepdims-shaped so that
    ``q * scale`` broadcasts back to ``w``'s shape."""
    w = np.asarray(w, np.float32)
    axis = axis % w.ndim if w.ndim else 0
    red = tuple(i for i in range(w.ndim) if i != axis)
    amax = np.max(np.abs(w), axis=red, keepdims=True) if red else np.abs(w)
    scale = np.where(amax > 0.0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale


def dequantize_array(q: np.ndarray, scale: np.ndarray) -> np.ndarray:
    return q.astype(np.float32) * scale


def _is_kernel_scope(v: Any) -> bool:
    return (
        isinstance(v, dict)
        and "kernel" in v
        and not isinstance(v["kernel"], dict)
        and np.ndim(v["kernel"]) >= 2
    )


def _walk_kernels(params: Dict[str, Any], path: Tuple[str, ...] = ()):
    for k in sorted(params):
        v = params[k]
        if isinstance(v, dict):
            if _is_kernel_scope(v):
                yield path + (k,), v
            yield from _walk_kernels(v, path + (k,))


def _skipped(key: str, skip: Sequence[str]) -> bool:
    return any(re.search(pat, key) for pat in skip)


def quantize_weights(
    variables: Dict[str, Any], skip: Sequence[str] = ()
) -> Dict[str, Dict[str, np.ndarray]]:
    """Per-channel int8 of every conv/dense kernel in the variables tree.

    Returns a flat dict ``{"a/b/c": {"q": int8, "scale": f32}}`` keyed by
    the kernel scope's slash-joined path.  ``skip`` is a list of regexes
    matched against that key (the reference's ``selective_quantizer``
    escape hatch)."""
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for path, scope in _walk_kernels(variables.get("params", variables)):
        key = "/".join(path)
        if _skipped(key, skip):
            continue
        q, scale = quantize_array(np.asarray(scope["kernel"]), axis=-1)
        out[key] = {"q": q, "scale": scale}
    return out


def fake_quant_variables(
    variables: Dict[str, Any], skip: Sequence[str] = ()
) -> Tuple[Dict[str, Any], Dict[str, Dict[str, np.ndarray]]]:
    """Variables pytree with every kernel replaced by dequant(quant(kernel)).

    Drop-in for ``model.apply`` — the deploy graph runs unchanged, now with
    int8-representable weights."""
    qmap = quantize_weights(variables, skip=skip)

    def rebuild(p: Dict[str, Any], path: Tuple[str, ...]) -> Dict[str, Any]:
        new = {}
        for k in p:
            v = p[k]
            if isinstance(v, dict):
                sub = rebuild(v, path + (k,))
                key = "/".join(path + (k,))
                if key in qmap:
                    sub = dict(sub)
                    sub["kernel"] = jnp.asarray(
                        dequantize_array(qmap[key]["q"], qmap[key]["scale"])
                    )
                new[k] = sub
            else:
                new[k] = v
        return new

    if "params" in variables:
        out = dict(variables)
        out["params"] = rebuild(variables["params"], ())
    else:
        out = rebuild(variables, ())
    return out, qmap


# --------------------------------------------------------------------------- #
# Activation calibration + fake-quant execution
# --------------------------------------------------------------------------- #

_QUANT_MODULES = (nn.Conv, nn.ConvTranspose)


def _module_key(context) -> str:
    m = context.module
    p = getattr(m, "path", None)
    if not p and getattr(m, "scope", None) is not None:
        p = m.scope.path
    return "/".join(str(s) for s in (p or ("?",)))


def calibrate_activations(
    apply_fn: Callable[[Any], Any],
    batches: Iterable[Any],
    percentile: float = 99.99,
    max_batches: int = 16,
) -> Dict[str, float]:
    """Percentile-amax calibration of every conv input.

    ``apply_fn(batch)`` must run the model EAGERLY (un-jitted): the
    interceptor reads concrete activation values.  Defaults mirror the
    reference's calibrator (percentile 99.99 over 16 batches,
    ``exportable_mesh_model.py:144-146``)."""
    stats: Dict[str, float] = {}

    def interceptor(next_fun, args, kwargs, context):
        if (
            isinstance(context.module, _QUANT_MODULES)
            and context.method_name == "__call__"
            and args
        ):
            a = np.abs(np.asarray(jax.device_get(args[0]), np.float32))
            amax = float(np.percentile(a, percentile)) if a.size else 0.0
            key = _module_key(context)
            stats[key] = max(stats.get(key, 0.0), amax)
        return next_fun(*args, **kwargs)

    for i, batch in enumerate(batches):
        if i >= max_batches:
            break
        with nn.intercept_methods(interceptor):
            apply_fn(batch)
    return stats


def _act_interceptor(act_scales: Dict[str, float], skip: Sequence[str] = ()):
    def interceptor(next_fun, args, kwargs, context):
        if (
            isinstance(context.module, _QUANT_MODULES)
            and context.method_name == "__call__"
            and args
        ):
            key = _module_key(context)
            amax = act_scales.get(key, 0.0)
            if amax > 0.0 and not _skipped(key, skip):
                x = args[0]
                dt = x.dtype
                s = jnp.float32(amax / 127.0)
                q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
                args = (q * s).astype(dt), *args[1:]
        return next_fun(*args, **kwargs)

    return interceptor


def quantized_apply(
    model,
    fq_variables: Dict[str, Any],
    act_scales: Optional[Dict[str, float]] = None,
    skip: Sequence[str] = (),
    **apply_kwargs,
) -> Callable:
    """Jittable forward with int8-representable weights and (optionally)
    fake-quantized conv inputs — the W8A8 accuracy surface of the deploy
    graph.  The interceptor runs at trace time, so the returned callable
    jits like any other."""
    interceptor = _act_interceptor(act_scales or {}, skip=skip)

    def fn(*args, **kwargs):
        with nn.intercept_methods(interceptor):
            return model.apply(fq_variables, *args, **apply_kwargs, **kwargs)

    return fn


@dataclass
class PTQResult:
    """Outcome of :func:`ptq` — everything needed to run, ship, or audit
    the quantized model."""

    variables: Dict[str, Any]
    weight_qmap: Dict[str, Dict[str, np.ndarray]]
    act_scales: Dict[str, float]
    report: Dict[str, float] = field(default_factory=dict)


def ptq(
    model,
    variables: Dict[str, Any],
    calibration_batches: Optional[Iterable[Any]] = None,
    percentile: float = 99.99,
    max_batches: int = 16,
    skip: Sequence[str] = (),
    **apply_kwargs,
) -> PTQResult:
    """One-call INT8 PTQ, the analogue of the reference's
    ``ptq(model, selective_quantizer, calibration_loader, ...)``
    (``exportable_mesh_model.py:398-405``):

    1. per-channel int8 weight quantization (minus ``skip`` regexes),
    2. percentile activation calibration over ``calibration_batches``
       (skipped when None -> weight-only PTQ),
    3. a weight-quantization error report.
    """
    fq_vars, qmap = fake_quant_variables(variables, skip=skip)

    act_scales: Dict[str, float] = {}
    if calibration_batches is not None:
        act_scales = calibrate_activations(
            lambda batch: model.apply(fq_vars, batch, **apply_kwargs),
            calibration_batches,
            percentile=percentile,
            max_batches=max_batches,
        )

    # weight quantization error: mean |w - dq(q(w))| / amax per kernel
    errs: List[float] = []
    params = variables.get("params", variables)
    for path, scope in _walk_kernels(params):
        key = "/".join(path)
        if key not in qmap:
            continue
        w = np.asarray(scope["kernel"], np.float32)
        dq = dequantize_array(qmap[key]["q"], qmap[key]["scale"])
        amax = float(np.max(np.abs(w))) or 1.0
        errs.append(float(np.mean(np.abs(w - dq))) / amax)
    report = {
        "kernels_quantized": float(len(qmap)),
        "mean_weight_err_rel": float(np.mean(errs)) if errs else 0.0,
        "max_weight_err_rel": float(np.max(errs)) if errs else 0.0,
        "activations_calibrated": float(len(act_scales)),
    }
    return PTQResult(fq_vars, qmap, act_scales, report)


# --------------------------------------------------------------------------- #
# FP16
# --------------------------------------------------------------------------- #


def fp16_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Weights round-tripped through IEEE half precision — the reference's
    ``QuantizationMode.FP16`` ('weights converted to half precision',
    ``exportable_mesh_model.py:177``).  Arrays come back f32-typed (the
    graph's parameter dtype) with f16-representable values; integer leaves
    pass through."""

    def conv(x):
        a = np.asarray(x)
        if np.issubdtype(a.dtype, np.floating):
            return jnp.asarray(a.astype(np.float16).astype(np.float32))
        return x

    return jax.tree_util.tree_map(conv, variables)


# --------------------------------------------------------------------------- #
# Quantized artifact
# --------------------------------------------------------------------------- #


def save_quantized(path: str, variables: Dict[str, Any], skip: Sequence[str] = ()) -> Dict[str, float]:
    """Write an int8-weight artifact: kernels as int8 + per-channel scales,
    every other leaf verbatim (f32).  Returns size accounting."""
    qmap = quantize_weights(variables, skip=skip)
    flat: Dict[str, np.ndarray] = {}
    has_params = "params" in variables

    def walk(p, path):
        for k in sorted(p):
            v = p[k]
            sub = path + (k,)
            if isinstance(v, dict):
                walk(v, sub)
            else:
                key = "/".join(sub)
                # qmap keys are relative to the 'params' subtree
                rel = sub[:-1][1:] if has_params and sub[:1] == ("params",) else sub[:-1]
                parent = "/".join(rel)
                if k == "kernel" and parent in qmap:
                    flat["q8:" + key] = qmap[parent]["q"]
                    flat["sc:" + key] = qmap[parent]["scale"]
                else:
                    flat["f:" + key] = np.asarray(v)

    walk(variables, ())
    np.savez(path, **flat)
    f32_bytes = sum(
        np.asarray(v).size * 4
        for v in jax.tree_util.tree_leaves(variables)
    )
    q_bytes = sum(a.nbytes for a in flat.values())
    return {"f32_bytes": float(f32_bytes), "quantized_bytes": float(q_bytes)}


def load_quantized(path: str) -> Dict[str, Any]:
    """Reconstruct a fake-quant variables pytree from :func:`save_quantized`
    output (kernels dequantized to f32)."""
    data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
    tree: Dict[str, Any] = {}
    for key in data.files:
        kind, rest = key.split(":", 1)
        parts = rest.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if kind == "q8":
            node.setdefault("__q8__", {})[parts[-1]] = data[key]
        elif kind == "sc":
            node.setdefault("__sc__", {})[parts[-1]] = data[key]
        else:
            node[parts[-1]] = data[key]

    def resolve(node):
        if not isinstance(node, dict):
            return node
        q8 = node.pop("__q8__", {})
        sc = node.pop("__sc__", {})
        out = {k: resolve(v) for k, v in node.items()}
        for k, q in q8.items():
            out[k] = jnp.asarray(dequantize_array(q, sc[k]))
        return out

    return resolve(tree)
