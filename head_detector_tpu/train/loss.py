"""YoloHeadsLoss: cls + IoU + DFL + OKS keypoints + 3D vertices + rotation.

Functional spec: reference ``yolo_head_training/yolo_head/yolo_head_loss.py``
(``YoloHeadsLoss.forward`` at ``:388-500``, ``_bbox_loss`` at ``:617-715``).
Weights of record: cls 1.0, iou 2.0, dfl 0.01, pose 5.0, 3d-verts 50.0,
rot 1.0 (``configs/training_hyperparams/vgg_head_train_params.yaml:23-33``
plus the class defaults).

TPU-first shape discipline (vs the reference's ``masked_select``):

* GT comes in padded per-image tensors (``Targets``) with a validity mask —
  there is no python unpacking step in the loss (the reference's
  ``_unpack_flat_targets`` loop runs per batch on host, ``:322-386``).
* Box / DFL losses are computed for every anchor and weighted by the
  assigned-score mask — zero-positive batches are the same graph.
* The expensive FLAME decode runs on a fixed-size top-``max_positives``
  subset of foreground anchors selected with one ``top_k`` (the reference
  gathers a dynamic number of positives).  Overflowing positives are dropped
  and reported in the aux dict as ``num_pos_dropped``.
* ``average_losses_in_ddp`` becomes a ``jax.lax.pmean`` over the data axis.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from head_detector_tpu.flame import FlameModel, reproject_spatial_vertices
from head_detector_tpu.models.heads import RawOutputs
from head_detector_tpu.train.assigner import task_aligned_assigner
from head_detector_tpu.train.boxes import (
    batch_distance2bbox,
    bbox2distance,
    ciou_loss,
    giou_loss,
)
from head_detector_tpu.train.losses import (
    bce_with_logits,
    df_loss,
    focal_loss,
    oks_keypoint_loss,
    rotation_loss,
    vertices_3d_loss,
)


class Targets(NamedTuple):
    """Padded per-image ground truth (the TPU-native collate output).

    :param gt_bboxes:      [B, N, 4] xyxy pixels (zero rows where padded)
    :param gt_vertices_2d: [B, N, K, 3] (x, y, visibility) projected vertices
    :param gt_vertices_3d: [B, N, V, 3] canonical (zero-rotation) vertices
    :param gt_rotations:   [B, N, 3, 3]
    :param pad_gt_mask:    [B, N, 1] 1 = real box
    """

    gt_bboxes: jnp.ndarray
    gt_vertices_2d: jnp.ndarray
    gt_vertices_3d: jnp.ndarray
    gt_rotations: jnp.ndarray
    pad_gt_mask: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class LossConfig:
    oks_sigma: float = 0.025
    indexes_subset: Optional[np.ndarray] = None  # static vertex subset
    classification_loss_type: str = "focal"
    regression_iou_loss_type: str = "ciou"
    vertices_loss: str = "smooth_l1"
    rotation_loss: str = "geodesic"
    classification_loss_weight: float = 1.0
    iou_loss_weight: float = 2.0
    dfl_loss_weight: float = 0.01
    pose_reg_loss_weight: float = 5.0
    bbox_assigner_topk: int = 13
    bbox_assigner_alpha: float = 1.0
    bbox_assigner_beta: float = 6.0
    rescale_pose_loss_with_assigned_score: bool = False
    average_losses_in_ddp: bool = False
    vertices_3d_loss_weight: float = 50.0
    rotation_loss_weight: float = 1.0
    max_positives: int = 256


COMPONENT_NAMES = (
    "loss_3d_rotation",
    "loss_cls",
    "loss_iou",
    "loss_dfl",
    "loss_pose_reg",
    "loss_3d_vertices",
    "loss",
)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over elements where mask (broadcastable) is 1."""
    mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return (x * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def yolo_heads_loss(
    flame_model: FlameModel,
    raw: RawOutputs,
    targets: Targets,
    cfg: LossConfig = LossConfig(),
    axis_name: Optional[str] = None,
):
    """:return: (total_loss scalar, dict of components per COMPONENT_NAMES
    plus aux diagnostics)."""
    pred_logits = raw.cls_score_list.astype(jnp.float32)  # [B, L, 1]
    pred_distri = raw.reg_distri_list.astype(jnp.float32)  # [B, L, 4*(m+1)]
    stride = raw.stride_tensor  # [L, 1]
    anchor_points = raw.anchor_points  # [L, 2] pixels
    anchor_points_s = anchor_points / stride

    b, l, _ = pred_distri.shape
    reg_max = pred_distri.shape[-1] // 4 - 1

    # bbox decode in grid units (ref _bbox_decode :717-731)
    dist = jax.nn.softmax(pred_distri.reshape(b, l, 4, reg_max + 1), axis=-1)
    proj = jnp.arange(reg_max + 1, dtype=jnp.float32)
    expected = jnp.einsum("blkm,m->blk", dist, proj)
    pred_bboxes = batch_distance2bbox(anchor_points_s[None], expected)  # grid units

    assign = task_aligned_assigner(
        pred_scores=jax.nn.sigmoid(jax.lax.stop_gradient(pred_logits)),
        pred_bboxes=jax.lax.stop_gradient(pred_bboxes) * stride[None],
        anchor_points=anchor_points,
        gt_bboxes=targets.gt_bboxes,
        pad_gt_mask=targets.pad_gt_mask,
        topk=cfg.bbox_assigner_topk,
        alpha=cfg.bbox_assigner_alpha,
        beta=cfg.bbox_assigner_beta,
    )
    assigned_scores = assign.assigned_scores  # [B, L, 1]
    fg = assign.fg_mask  # [B, L]

    # ---------------- classification ---------------- #
    if cfg.classification_loss_type == "focal":
        loss_cls = focal_loss(pred_logits, assigned_scores, alpha=-1.0).sum()
    elif cfg.classification_loss_type == "bce":
        loss_cls = bce_with_logits(pred_logits, assigned_scores).sum()
    else:
        raise ValueError(cfg.classification_loss_type)

    assigned_scores_sum = assigned_scores.sum()
    if cfg.average_losses_in_ddp and axis_name is not None:
        assigned_scores_sum = jax.lax.pmean(assigned_scores_sum, axis_name)
    assigned_scores_sum = jnp.clip(assigned_scores_sum, 1.0, None)
    loss_cls = loss_cls / assigned_scores_sum

    # ---------------- box / dfl -------------------- #
    bbox_weight = assigned_scores[..., 0] * fg  # [B, L]
    assigned_s = assign.assigned_bboxes / stride[None]  # grid units

    iou_fn = {"giou": giou_loss, "ciou": ciou_loss}[cfg.regression_iou_loss_type]
    iou_elem = jnp.where(fg, iou_fn(pred_bboxes, assigned_s), 0.0)
    loss_iou = (iou_elem * bbox_weight).sum() / assigned_scores_sum

    assigned_ltrb = bbox2distance(anchor_points_s[None], assigned_s, reg_max)
    dfl_elem = df_loss(pred_distri.reshape(b, l, 4, reg_max + 1), assigned_ltrb)[..., 0]
    dfl_elem = jnp.where(fg, dfl_elem, 0.0)
    loss_dfl = (dfl_elem * bbox_weight).sum() / assigned_scores_sum

    # ------------- FLAME losses on fixed-size positive subset ------------- #
    p = cfg.max_positives
    flat_fg = fg.reshape(-1).astype(jnp.float32)
    sel_val, sel = jax.lax.top_k(flat_fg, min(p, b * l))
    sel_valid = sel_val > 0  # [P]
    img_idx = sel // l

    flame_sel = raw.flame_params.reshape(b * l, -1)[sel]  # [P, 413]
    gt_idx = assign.assigned_gt_index.reshape(-1)[sel]  # [P]
    boxes_img = assign.assigned_bboxes.reshape(-1, 4)[sel]  # [P, 4] pixels
    weight_sel = bbox_weight.reshape(-1)[sel]  # [P]

    gt_v3d = targets.gt_vertices_3d[img_idx, gt_idx]  # [P, V, 3]
    gt_v2d = targets.gt_vertices_2d[img_idx, gt_idx][..., :2]  # [P, K, 2]
    gt_rot = targets.gt_rotations[img_idx, gt_idx]  # [P, 3, 3]

    # Sanitize padding rows BEFORE any math: masking a loss with `where`
    # after the fact does not stop NaN/inf *gradients* of garbage rows from
    # poisoning the backward pass (0 * inf = NaN).  Padding rows get neutral
    # FLAME params (identity 6DoF basis at [403:409] in from_3dmm layout,
    # unit scale) and identity GT rotations.
    neutral = jnp.zeros((flame_sel.shape[-1],), flame_sel.dtype)
    neutral = neutral.at[403].set(1.0).at[407].set(1.0).at[412].set(1.0)
    vmask = sel_valid[:, None]
    flame_sel = jnp.where(vmask, flame_sel, neutral[None])
    boxes_img = jnp.where(vmask, boxes_img, jnp.asarray([0.0, 0.0, 8.0, 8.0]))
    gt_rot = jnp.where(vmask[:, :, None], gt_rot, jnp.eye(3, dtype=gt_rot.dtype))
    gt_v2d = jnp.where(vmask[:, :, None], gt_v2d, 0.0)
    gt_v3d = jnp.where(vmask[:, :, None], gt_v3d, 0.0)

    pred_v3d, pred_rot, pred_2d = reproject_spatial_vertices(
        flame_model, flame_sel, to_2d=True
    )

    if cfg.indexes_subset is not None:
        subset = jnp.asarray(np.asarray(cfg.indexes_subset), jnp.int32)
        pred_2d = pred_2d[:, subset]
        gt_v2d = gt_v2d[:, subset]
        pred_v3d = pred_v3d[:, subset]
        gt_v3d = gt_v3d[:, subset]

    area = jnp.clip(
        (boxes_img[:, 2] - boxes_img[:, 0]) * (boxes_img[:, 3] - boxes_img[:, 1]),
        0.0,
        None,
    ) * 0.53  # [P] (ref :669)

    kp_elem = oks_keypoint_loss(pred_2d, gt_v2d, area[:, None], cfg.oks_sigma)  # [P]
    v3d_elem = vertices_3d_loss(pred_v3d, gt_v3d, cfg.vertices_loss)  # [P, V, 3]
    rot_elem = rotation_loss(pred_rot, gt_rot, cfg.rotation_loss)  # [P]

    if cfg.rescale_pose_loss_with_assigned_score:
        w = weight_sel * sel_valid
        loss_pose = (kp_elem * w).sum() / assigned_scores_sum
        loss_v3d = (v3d_elem.mean((-2, -1)) * w).sum() / assigned_scores_sum
        loss_rot = (rot_elem * w).sum() / assigned_scores_sum
    else:
        loss_pose = _masked_mean(kp_elem, sel_valid)
        loss_v3d = _masked_mean(v3d_elem, sel_valid[:, None, None])
        loss_rot = _masked_mean(rot_elem, sel_valid)

    loss_cls = loss_cls * cfg.classification_loss_weight
    loss_iou = loss_iou * cfg.iou_loss_weight
    loss_dfl = loss_dfl * cfg.dfl_loss_weight
    loss_pose = loss_pose * cfg.pose_reg_loss_weight
    loss_v3d = loss_v3d * cfg.vertices_3d_loss_weight
    loss_rot = loss_rot * cfg.rotation_loss_weight

    total = loss_cls + loss_iou + loss_dfl + loss_pose + loss_v3d + loss_rot

    num_pos = fg.sum()
    components = {
        "loss_3d_rotation": loss_rot,
        "loss_cls": loss_cls,
        "loss_iou": loss_iou,
        "loss_dfl": loss_dfl,
        "loss_pose_reg": loss_pose,
        "loss_3d_vertices": loss_v3d,
        "loss": total,
        "num_pos": num_pos,
        "num_pos_dropped": jnp.maximum(num_pos - sel_valid.sum(), 0),
    }
    return total, components
