"""Task-aligned label assignment (TOOD-style), fixed-shape and jit-friendly.

Functional spec: reference ``YoloHeadsTaskAlignedAssigner``
(``yolo_head_training/yolo_head/yolo_head_loss.py:76-239``):

1. alignment metric = score^alpha * IoU^beta between every (gt, anchor),
2. top-k (13) candidates per gt, restricted to anchors whose center is
   inside the gt box,
3. anchors claimed by multiple gts resolve to the max-IoU gt,
4. assigned scores = one-hot * alignment metric rescaled per instance by its
   max IoU.

Differences from the reference: no ``num_max_boxes == 0`` python branch (gt
tensors are always padded to a static N with ``pad_gt_mask``; N==0 simply
cannot occur) and the multiple-assignment resolution is applied
unconditionally (it is the identity when no anchor is contested), keeping the
whole assigner a single traced graph.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from head_detector_tpu.train.boxes import (
    batch_iou_similarity,
    check_points_inside_bboxes,
    compute_max_iou_anchor,
    gather_topk_anchors,
)


class AssignmentResult(NamedTuple):
    """Per-anchor assignment (all leading dims [B, L]).

    ``fg_mask`` replaces the reference's ``assigned_labels != bg_index``
    (single-class task, so a boolean is the whole story).
    """

    fg_mask: jnp.ndarray  # [B, L] bool
    assigned_bboxes: jnp.ndarray  # [B, L, 4]
    assigned_scores: jnp.ndarray  # [B, L, 1]
    assigned_gt_index: jnp.ndarray  # [B, L] int32 (into the padded gt dim)


def task_aligned_assigner(
    pred_scores: jnp.ndarray,  # [B, L, 1] (already sigmoided)
    pred_bboxes: jnp.ndarray,  # [B, L, 4] xyxy pixels
    anchor_points: jnp.ndarray,  # [L, 2] pixel centers
    gt_bboxes: jnp.ndarray,  # [B, N, 4] xyxy pixels (zero-padded)
    pad_gt_mask: jnp.ndarray,  # [B, N, 1] float/bool
    topk: int = 13,
    alpha: float = 1.0,
    beta: float = 6.0,
    eps: float = 1e-9,
) -> AssignmentResult:
    pad_gt_mask = pad_gt_mask.astype(jnp.float32)
    b, num_anchors, _ = pred_scores.shape
    n = gt_bboxes.shape[1]

    ious = batch_iou_similarity(gt_bboxes, pred_bboxes)  # [B, N, L]

    # single class: the gathered class score is just the (sigmoided) logit
    bbox_cls_scores = pred_scores[..., 0][:, None, :]  # [B, 1, L] -> broadcast [B, N, L]
    alignment = (bbox_cls_scores**alpha) * (ious**beta)

    is_in_gts = check_points_inside_bboxes(anchor_points, gt_bboxes)  # [B, N, L]
    is_in_topk = gather_topk_anchors(alignment * is_in_gts, topk, pad_gt_mask)
    mask_positive = is_in_topk * is_in_gts * pad_gt_mask  # [B, N, L]

    # resolve anchors contested by multiple gts to the max-IoU gt
    mask_positive_sum = mask_positive.sum(-2)  # [B, L]
    mask_multiple = jnp.broadcast_to(
        (mask_positive_sum[:, None, :] > 1), mask_positive.shape
    )
    is_max_iou = compute_max_iou_anchor(ious)
    mask_positive = jnp.where(mask_multiple, is_max_iou, mask_positive)
    mask_positive_sum = mask_positive.sum(-2)

    assigned_gt_index = jnp.argmax(mask_positive, axis=-2)  # [B, L]
    fg_mask = mask_positive_sum > 0

    take = jax.vmap(lambda g, i: g[i])  # per-image gather over the gt dim
    assigned_bboxes = take(gt_bboxes, assigned_gt_index)  # [B, L, 4]

    # rescale alignment metrics into assigned scores
    alignment = alignment * mask_positive
    max_metrics_per_instance = alignment.max(-1, keepdims=True)
    max_ious_per_instance = (ious * mask_positive).max(-1, keepdims=True)
    alignment = alignment / (max_metrics_per_instance + eps) * max_ious_per_instance
    assigned_scores = alignment.max(-2)[..., None]  # [B, L, 1]
    assigned_scores = assigned_scores * fg_mask[..., None]

    return AssignmentResult(
        fg_mask=fg_mask,
        assigned_bboxes=assigned_bboxes,
        assigned_scores=assigned_scores,
        assigned_gt_index=assigned_gt_index.astype(jnp.int32),
    )
