"""Fixed-shape, fully on-device NMS for TPU.

Functional spec: reference ``head_detector/utils.py:159-194`` and
``yolo_head_training/yolo_head/yolo_heads_post_prediction_callback.py:42-99``:
confidence filter -> top-k (pre_nms_max) -> greedy IoU suppression
(torchvision.ops.nms semantics) -> keep first post_nms_max.

TPU design: everything is static-shape.  The confidence filter becomes score
masking, top-k uses ``jax.lax.top_k``, and greedy suppression is a
``lax.fori_loop`` over the K sorted candidates carrying a keep-mask vector
(K iterations of K-wide VPU ops — no host sync, no dynamic shapes).  Outputs
are fixed-size arrays plus a validity mask, so everything downstream (FLAME
decode per detection, crops, rendering) stays compiled.

torchvision.ops.nms semantics replicated: boxes are suppressed when their IoU
with a *higher-scoring kept* box strictly exceeds ``iou_threshold``; ties in
score are broken by original index (stable sort).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class NMSResult(NamedTuple):
    boxes: jnp.ndarray  # [K, 4] xyxy
    scores: jnp.ndarray  # [K]
    flame_params: jnp.ndarray  # [K, P]
    valid: jnp.ndarray  # [K] bool


def box_iou_xyxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between two sets of xyxy boxes: [M,4] x [N,4] -> [M,N]."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0, None) * jnp.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0, None) * jnp.clip(b[:, 3] - b[:, 1], 0, None)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def _greedy_suppress(boxes: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS over score-sorted boxes. Returns keep mask [K] (bool).

    Candidates must already be sorted by descending score.  Box i is kept iff
    it is valid and no kept box j < i has IoU(i, j) > threshold.

    TPU implementation: instead of the K-step serial scan (1000 sequential
    tiny ops), iterate the fixed point ``keep[i] = valid[i] & !any_{j<i}
    (keep[j] & iou[i,j] > t)`` starting from the all-valid estimate.  Each
    sweep is one dense [K, K] masked reduction on the VPU, and the iteration
    converges to the exact greedy solution in at most the suppression-chain
    depth (typically < 10 for real detections; bounded by K).
    """
    k = boxes.shape[0]
    iou = box_iou_xyxy(boxes, boxes)  # [K, K]
    lower = jnp.tril(jnp.ones((k, k), jnp.bool_), k=-1)  # j < i
    suppressing = (iou > iou_threshold) & lower  # [i, j]: j can suppress i

    def sweep(keep):
        return valid & ~jnp.any(suppressing & keep[None, :], axis=1)

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < k)

    def body(state):
        keep, _, it = state
        return sweep(keep), keep, it + 1

    keep0 = sweep(valid)
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, valid, jnp.zeros((), jnp.int32))
    )
    return keep


def single_image_nms(
    boxes_xyxy: jnp.ndarray,  # [A, 4]
    scores: jnp.ndarray,  # [A] or [A, 1]
    flame_params: jnp.ndarray,  # [A, P]
    confidence_threshold: float = 0.5,
    iou_threshold: float = 0.5,
    pre_nms_max: int = 1000,
    post_nms_max: int = 100,
) -> NMSResult:
    """One image: conf filter -> top-k -> greedy NMS -> keep post_nms_max."""
    scores = scores.reshape(-1)
    num_anchors = scores.shape[0]
    k = min(pre_nms_max, num_anchors)

    conf_ok = scores >= confidence_threshold
    masked = jnp.where(conf_ok, scores, -1.0)
    top_scores, top_idx = jax.lax.top_k(masked, k)  # sorted desc, stable
    top_boxes = boxes_xyxy[top_idx]
    top_valid = top_scores >= confidence_threshold

    keep = _greedy_suppress(top_boxes, top_valid, iou_threshold)

    # order-preserving selection of the first `post_nms_max` kept boxes:
    # rank kept boxes by (kept desc, original order asc) via a composite key.
    order = jnp.arange(k)
    key = jnp.where(keep, order, k + order)  # kept boxes sort first, in order
    sel = jnp.argsort(key)[:post_nms_max]
    out_valid = keep[sel]

    # The wide [A, P] flame rows are selected with a one-hot matmul instead of
    # a row gather: the MXU streams the params tensor once sequentially, where
    # the gather does random row access (measured 576 vs 548 img/s end-to-end
    # on v5e for the L pipeline).  HIGHEST precision makes the 1.0/0.0 one-hot
    # contraction bit-exact vs the gather (verified max|diff| = 0 on chip).
    final_idx = top_idx[sel]  # [post_nms_max] indices into the anchor axis
    onehot = (final_idx[:, None] == jnp.arange(num_anchors)[None, :]).astype(
        flame_params.dtype
    )
    selected_flame = jnp.dot(
        onehot,
        flame_params,
        preferred_element_type=flame_params.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )

    return NMSResult(
        boxes=jnp.where(out_valid[:, None], top_boxes[sel], 0.0),
        scores=jnp.where(out_valid, top_scores[sel], 0.0),
        flame_params=jnp.where(out_valid[:, None], selected_flame, 0.0),
        valid=out_valid,
    )


def batched_nms(
    boxes_xyxy: jnp.ndarray,  # [B, A, 4]
    scores: jnp.ndarray,  # [B, A] or [B, A, 1]
    flame_params: jnp.ndarray,  # [B, A, P]
    confidence_threshold: float = 0.5,
    iou_threshold: float = 0.5,
    pre_nms_max: int = 1000,
    post_nms_max: int = 100,
) -> NMSResult:
    """Batch NMS (vmapped). All outputs [B, post_nms_max, ...] + valid mask."""
    if scores.ndim == 3:
        scores = scores[..., 0]
    fn = lambda b, s, f: single_image_nms(
        b,
        s,
        f,
        confidence_threshold=confidence_threshold,
        iou_threshold=iou_threshold,
        pre_nms_max=pre_nms_max,
        post_nms_max=post_nms_max,
    )
    return jax.vmap(fn)(boxes_xyxy, scores, flame_params)
