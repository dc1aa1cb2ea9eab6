"""Sparse post-NMS FLAME towers: regress 413 params only at kept anchors.

The dense head runs six FLAME regression towers over every anchor of every
scale (reference ``yolo_head_dfl_head.py:141-186``) and materialises a
``[B, A, 413]`` tensor of which NMS keeps ~100 rows — and of those, real
images keep only the handful that are valid detections.  On TPU that dense
tensor is the single largest cost after the backbone (measured 10.7 ms
towers + 6.0 ms selection vs a 36.9 ms forward+NMS floor for L @640 bf16
batch 32; BENCHMARKS.md round 2).

This module re-runs the towers as *patch convolutions at the kept anchors
only*: the tower stack is 1x1 pose-stem + N 3x3 VALID convs + 1x1 pred, so a
``(2N+1)``-pixel square patch of the neck feature map around an anchor
produces exactly that anchor's 413-vector.  Work then scales with the number
of detections, not the anchor count — the production shape of the problem
(the reference itself decodes FLAME per kept detection, never densely:
``yolo_heads_post_prediction_callback.py:86``).

Numerics: identical operations to the dense path (same fused deploy kernels,
same activation zoo, same concat order), differing only in conv tiling —
parity is asserted in tests/test_sparse_towers.py.

Only the deploy (QARepVGG-fused, ``rbr_reparam``) parameter layout is
supported; training keeps the dense path.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from head_detector_tpu.head_info import FLAME_CONSTS
from head_detector_tpu.models.presets import ArchCfg

_TOWERS = (
    "flame_shape_pred",
    "flame_expression_pred",
    "flame_rotation_pred",
    "flame_jaw_pred",
    "flame_translation_pred",
    "flame_scale_pred",
)


def _conv(x: jnp.ndarray, kernel: jnp.ndarray, bias=None, dtype=None) -> jnp.ndarray:
    """VALID NHWC conv in ``dtype`` with f32 params, like flax nn.Conv."""
    dtype = dtype or x.dtype
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def _bn_eval(x: jnp.ndarray, params, stats, eps: float) -> jnp.ndarray:
    mul = params["scale"] / jnp.sqrt(stats["var"] + eps)
    add = params["bias"] - stats["mean"] * mul
    return x * mul.astype(x.dtype) + add.astype(x.dtype)


def extract_patches(
    feat: jnp.ndarray,  # [B, H, W, C]
    ys: jnp.ndarray,  # [R, K] int32 (may be out of range; masked)
    xs: jnp.ndarray,  # [R, K]
    rf: int,
    batch_idx: jnp.ndarray = None,  # [R, K] source image per slot
) -> jnp.ndarray:
    """[R, K, rf, rf, C] patches centered at (ys, xs), zero-padded at borders
    (matching the dense convs' zero padding).

    Without ``batch_idx``, row r of (ys, xs) indexes image r (R == B).  With
    ``batch_idx`` each slot names its source image — the batch-compacted
    case, where R is typically 1 and K the packed-detection budget."""
    b, h, w, c = feat.shape
    r, k = ys.shape
    n = rf // 2
    d = jnp.arange(-n, n + 1)
    yy = ys[:, :, None] + d[None, None, :]  # [R, K, rf]
    xx = xs[:, :, None] + d[None, None, :]
    ok = (
        ((yy >= 0) & (yy < h))[:, :, :, None]
        & ((xx >= 0) & (xx < w))[:, :, None, :]
    )  # [R, K, rf, rf]
    spatial = (
        jnp.clip(yy, 0, h - 1)[:, :, :, None] * w
        + jnp.clip(xx, 0, w - 1)[:, :, None, :]
    )  # [R, K, rf, rf]
    if batch_idx is None:
        assert r == b, f"need one coord row per image: {r} != {b}"
        flat = spatial.reshape(r, k * rf * rf)
        rows = jnp.take_along_axis(
            feat.reshape(b, h * w, c), flat[:, :, None], axis=1
        )  # [R, K*rf*rf, C]
        rows = rows * ok.reshape(r, k * rf * rf, 1).astype(rows.dtype)
        return rows.reshape(r, k, rf, rf, c)
    flat = batch_idx[:, :, None, None] * (h * w) + spatial  # [R, K, rf, rf]
    rows = jnp.take(
        feat.reshape(b * h * w, c), flat.reshape(-1), axis=0,
        indices_are_sorted=False, unique_indices=False,
    )
    rows = rows.reshape(r, k, rf, rf, c) * ok[..., None].astype(rows.dtype)
    return rows


def _boundary_masks(
    ys: jnp.ndarray, xs: jnp.ndarray, h: int, w: int, rf: int
) -> list:
    """Per-layer in-map masks.  The dense convs zero-pad EVERY layer at the
    feature-map border, so a patch pipeline must zero out-of-map pixels after
    every conv, not just at extraction: layer l's (rf-2l)-wide patch pixel
    (dy, dx) sits at map position (y+dy, x+dx) and is zero when outside."""
    masks = []
    n = rf // 2
    for level in range(n + 1):
        m = n - level
        d = jnp.arange(-m, m + 1)
        yy = ys[:, :, None] + d[None, None, :]
        xx = xs[:, :, None] + d[None, None, :]
        ok = (
            ((yy >= 0) & (yy < h))[:, :, :, None]
            & ((xx >= 0) & (xx < w))[:, :, None, :]
        )  # [B, K, m2, m2]
        b, k = ys.shape
        masks.append(ok.reshape(b * k, 2 * m + 1, 2 * m + 1, 1))
    return masks


def _tower_rows(
    head_params: Dict[str, Any],
    head_stats: Dict[str, Any],
    patches: jnp.ndarray,  # [B, K, rf, rf, C]
    masks: list,  # per-layer in-map masks from _boundary_masks
    num_blocks: int,
    bn_eps: float,
    dtype,
) -> jnp.ndarray:
    """Run pose_stem + the six towers on patches -> [B, K, 413] rows in the
    dense head's concat order (heads.py:177-216)."""
    b, k, rf, _, c = patches.shape
    x = patches.reshape(b * k, rf, rf, c)

    # pose_stem: 1x1 conv (bias-free) + BN + relu (ConvBNAct); BN/relu make
    # padded zeros nonzero, so re-zero out-of-map pixels
    ps, ss = head_params["pose_stem"], head_stats["pose_stem"]
    x = _conv(x, ps["conv"]["kernel"], dtype=dtype)
    x = jax.nn.relu(_bn_eval(x, ps["bn"], ss["bn"], bn_eps))
    x = x * masks[0].astype(x.dtype)

    def run_tower(name):
        y = x
        tp = head_params[name]
        for i in range(num_blocks):
            blk = tp[f"block{i}"]["rbr_reparam"]
            y = jax.nn.relu(_conv(y, blk["kernel"], blk["bias"], dtype=dtype))
            y = y * masks[i + 1].astype(y.dtype)
        y = _conv(y, tp["pred"]["kernel"], tp["pred"]["bias"], dtype=dtype)
        assert y.shape[1] == 1 and y.shape[2] == 1, (
            f"receptive field mismatch: tower left {y.shape[1]}x{y.shape[2]} "
            f"spatial extent — patch rf must be 2*num_blocks+1"
        )
        return y.reshape(b, k, y.shape[-1])

    shape = jnp.tanh(run_tower("flame_shape_pred")) * 3
    expression = jnp.tanh(run_tower("flame_expression_pred")) * 3
    rotation = run_tower("flame_rotation_pred")
    jaw = run_tower("flame_jaw_pred")
    translation = run_tower("flame_translation_pred")
    scale = jnp.exp(jnp.clip(run_tower("flame_scale_pred"), -15.0, 15.0)) / 0.05

    pad = lambda t, wdt: jnp.pad(t, [(0, 0), (0, 0), (0, wdt - t.shape[-1])])
    shape = pad(shape, FLAME_CONSTS["shape"])
    expression = pad(expression, FLAME_CONSTS["expression"])
    return jnp.concatenate(
        [shape, expression, rotation, jaw, translation, scale], axis=-1
    )


def sparse_flame_rows(
    variables: Dict[str, Any],
    arch: ArchCfg,
    feats: Sequence[jnp.ndarray],  # neck pyramid (p3, p4, p5), NHWC
    anchor_idx: jnp.ndarray,  # [R, K] global anchor indices
    dtype=None,
    batch_idx: jnp.ndarray = None,  # [R, K] source image per slot (compacted)
) -> jnp.ndarray:
    """FLAME parameter rows [B, K, 413] for the given anchors — equal to the
    dense head's ``decoded.flame_params`` (anchor-local, pre-globalisation)
    at those rows.

    Per scale: 7x7 (=2*blocks+1) patches of the neck feature are gathered
    around every anchor, pose-stem + towers run as VALID convs collapsing to
    1x1, and each anchor takes the row from its own scale (anchor ranges per
    scale are static).
    """
    params = variables["params"]["heads"]
    stats = variables.get("batch_stats", {}).get("heads", {})
    dtype = dtype or feats[0].dtype

    b, k = anchor_idx.shape
    out = jnp.zeros((b, k, sum(FLAME_CONSTS.values())), jnp.float32)
    base = 0
    for i, feat in enumerate(feats):
        hcfg = arch.heads[i]
        _, h, w, _ = feat.shape
        count = h * w
        num_blocks = hcfg.flame_regression_blocks
        rf = 2 * num_blocks + 1

        local = anchor_idx - base
        in_scale = (anchor_idx >= base) & (anchor_idx < base + count)
        local = jnp.where(in_scale, local, 0)
        ys = (local // w).astype(jnp.int32)
        xs = (local % w).astype(jnp.int32)

        patches = extract_patches(feat, ys, xs, rf, batch_idx=batch_idx)
        masks = _boundary_masks(ys, xs, h, w, rf)
        rows = _tower_rows(
            params[f"head{i + 1}"], stats.get(f"head{i + 1}", {}),
            patches, masks, num_blocks, arch.bn_eps, dtype,
        )
        out = jnp.where(in_scale[:, :, None], rows.astype(jnp.float32), out)
        base += count
    return out
