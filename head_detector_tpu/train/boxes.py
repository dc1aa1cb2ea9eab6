"""Box utilities used by the assigner/loss (fixed-shape, batched, pure JAX).

Functional specs: the SuperGradients ppyolo loss helpers the reference imports
(``yolo_head_loss.py:10-12``): ``batch_iou_similarity``,
``check_points_inside_bboxes``, ``gather_topk_anchors``,
``compute_max_iou_anchor``, ``batch_distance2bbox``, and the GIoU/CIoU
elementwise losses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_iou_similarity(
    box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-9
) -> jnp.ndarray:
    """IoU between two batched box sets: [B, N, 4] x [B, L, 4] -> [B, N, L]."""
    px1y1, px2y2 = box1[:, :, None, :2], box1[:, :, None, 2:]
    gx1y1, gx2y2 = box2[:, None, :, :2], box2[:, None, :, 2:]
    x1y1 = jnp.maximum(px1y1, gx1y1)
    x2y2 = jnp.minimum(px2y2, gx2y2)
    overlap = jnp.clip(x2y2 - x1y1, 0, None).prod(-1)
    area1 = jnp.clip(px2y2 - px1y1, 0, None).prod(-1)
    area2 = jnp.clip(gx2y2 - gx1y1, 0, None).prod(-1)
    union = area1 + area2 - overlap + eps
    return overlap / union


def check_points_inside_bboxes(
    points: jnp.ndarray, bboxes: jnp.ndarray, eps: float = 1e-9
) -> jnp.ndarray:
    """points [L, 2] pixel centers, bboxes [B, N, 4] xyxy -> [B, N, L] float."""
    x, y = points[:, 0], points[:, 1]  # [L]
    xmin, ymin, xmax, ymax = (bboxes[..., i][..., None] for i in range(4))  # [B,N,1]
    l = x[None, None] - xmin
    t = y[None, None] - ymin
    r = xmax - x[None, None]
    b = ymax - y[None, None]
    delta = jnp.minimum(jnp.minimum(l, t), jnp.minimum(r, b))
    return (delta > eps).astype(jnp.float32)


def gather_topk_anchors(
    metrics: jnp.ndarray, topk: int, topk_mask: jnp.ndarray, eps: float = 1e-9
) -> jnp.ndarray:
    """Top-k per gt over anchors -> membership mask [B, N, L] float.

    ``topk_mask`` is the [B, N, 1] pad-gt mask.
    """
    num_anchors = metrics.shape[-1]
    k = min(topk, num_anchors)
    _, topk_idxs = jax.lax.top_k(metrics, k)  # [B, N, k]
    is_in_topk = jax.nn.one_hot(topk_idxs, num_anchors, dtype=metrics.dtype).sum(-2)
    return is_in_topk * topk_mask.astype(metrics.dtype)


def compute_max_iou_anchor(ious: jnp.ndarray) -> jnp.ndarray:
    """For each anchor, one-hot over gts of its max-IoU gt: [B, N, L] float."""
    num_max_boxes = ious.shape[-2]
    max_iou_index = jnp.argmax(ious, axis=-2)  # [B, L]
    return jnp.moveaxis(
        jax.nn.one_hot(max_iou_index, num_max_boxes, dtype=ious.dtype), -1, -2
    )


def batch_distance2bbox(points: jnp.ndarray, distance: jnp.ndarray) -> jnp.ndarray:
    """ltrb distances + center points -> xyxy boxes (broadcasts over batch)."""
    x1y1 = points - distance[..., :2]
    x2y2 = points + distance[..., 2:]
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def bbox2distance(
    points: jnp.ndarray, bbox: jnp.ndarray, reg_max: int
) -> jnp.ndarray:
    """xyxy boxes -> ltrb distances, clipped to [0, reg_max - 0.01]
    (ref ``yolo_head_loss.py:733-737``)."""
    lt = points - bbox[..., :2]
    rb = bbox[..., 2:] - points
    return jnp.clip(jnp.concatenate([lt, rb], axis=-1), 0, reg_max - 0.01)


def _box_wh(box):
    return box[..., 2] - box[..., 0], box[..., 3] - box[..., 1]


def giou_loss(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Elementwise 1 - GIoU for xyxy boxes [..., 4] -> [...]."""
    ix1 = jnp.maximum(pred[..., 0], target[..., 0])
    iy1 = jnp.maximum(pred[..., 1], target[..., 1])
    ix2 = jnp.minimum(pred[..., 2], target[..., 2])
    iy2 = jnp.minimum(pred[..., 3], target[..., 3])
    inter = jnp.clip(ix2 - ix1, 0, None) * jnp.clip(iy2 - iy1, 0, None)
    pw, ph = _box_wh(pred)
    tw, th = _box_wh(target)
    union = pw * ph + tw * th - inter + eps
    iou = inter / union
    cx1 = jnp.minimum(pred[..., 0], target[..., 0])
    cy1 = jnp.minimum(pred[..., 1], target[..., 1])
    cx2 = jnp.maximum(pred[..., 2], target[..., 2])
    cy2 = jnp.maximum(pred[..., 3], target[..., 3])
    c_area = (cx2 - cx1) * (cy2 - cy1) + eps
    giou = iou - (c_area - union) / c_area
    return 1.0 - giou


def ciou_loss(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Elementwise 1 - CIoU (complete IoU) for xyxy boxes [..., 4] -> [...]."""
    ix1 = jnp.maximum(pred[..., 0], target[..., 0])
    iy1 = jnp.maximum(pred[..., 1], target[..., 1])
    ix2 = jnp.minimum(pred[..., 2], target[..., 2])
    iy2 = jnp.minimum(pred[..., 3], target[..., 3])
    inter = jnp.clip(ix2 - ix1, 0, None) * jnp.clip(iy2 - iy1, 0, None)
    pw, ph = _box_wh(pred)
    tw, th = _box_wh(target)
    union = pw * ph + tw * th - inter + eps
    iou = inter / union

    # enclosing box diagonal
    cx1 = jnp.minimum(pred[..., 0], target[..., 0])
    cy1 = jnp.minimum(pred[..., 1], target[..., 1])
    cx2 = jnp.maximum(pred[..., 2], target[..., 2])
    cy2 = jnp.maximum(pred[..., 3], target[..., 3])
    c2 = (cx2 - cx1) ** 2 + (cy2 - cy1) ** 2 + eps

    # center distance
    pcx = (pred[..., 0] + pred[..., 2]) * 0.5
    pcy = (pred[..., 1] + pred[..., 3]) * 0.5
    tcx = (target[..., 0] + target[..., 2]) * 0.5
    tcy = (target[..., 1] + target[..., 3]) * 0.5
    rho2 = (pcx - tcx) ** 2 + (pcy - tcy) ** 2

    v = (4.0 / (jnp.pi**2)) * (
        jnp.arctan(tw / (th + eps)) - jnp.arctan(pw / (ph + eps))
    ) ** 2
    alpha = v / jnp.clip(1.0 - iou + v, eps, None)
    alpha = jax.lax.stop_gradient(alpha)
    ciou = iou - rho2 / c2 - alpha * v
    return 1.0 - ciou
