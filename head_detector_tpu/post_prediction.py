"""Post-prediction decode for evaluation/serving.

Functional spec: reference ``yolo_heads_post_prediction_callback.py:12-99``:
per image, confidence filter -> top-k pre_nms (<=1000) -> NMS -> keep
post_nms (<=300) -> FLAME reproject to 2D/3D vertices -> per-image
``YoloHeadsPredictions``.

TPU design: one jitted, batched, fixed-shape program (NMS + FLAME decode for
the whole batch at once) followed by a trivial host unpacking into per-image
prediction objects for the metrics/eval layer.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import numpy as np

from head_detector_tpu.flame import FlameModel, reproject_spatial_vertices
from head_detector_tpu.models.heads import DecodedPredictions
from head_detector_tpu.ops.nms import batched_nms


@dataclasses.dataclass
class YoloHeadsPredictions:
    """Per-image predictions (reference ``yolo_heads_predictions.py:8-21``)."""

    scores: np.ndarray  # [N]
    bboxes_xyxy: np.ndarray  # [N, 4]
    mm_params: np.ndarray  # [N, 413]
    predicted_3d_vertices: np.ndarray  # [N, V, 3]
    predicted_2d_vertices: np.ndarray  # [N, V, 2]


class YoloHeadsPostPredictionCallback:
    def __init__(
        self,
        flame_model: Optional[FlameModel] = None,
        confidence_threshold: float = 0.5,
        nms_iou_threshold: float = 0.7,
        pre_nms_max_predictions: int = 300,
        post_nms_max_predictions: int = 30,
        param_fusion: bool = False,
        fusion_iou: float = 0.7,
    ):
        self.flame_model = flame_model or FlameModel.from_assets()
        self.confidence_threshold = confidence_threshold
        self.nms_iou_threshold = nms_iou_threshold
        self.pre_nms_max_predictions = pre_nms_max_predictions
        self.post_nms_max_predictions = post_nms_max_predictions
        # WBF-style score-weighted FLAME-row averaging over each kept box's
        # suppressed neighbor anchors (ops/nms.py single_image_nms docstring).
        # Off by default: plain NMS is the reference-parity decode.
        self.param_fusion = param_fusion
        self.fusion_iou = fusion_iou
        self._device_fn = jax.jit(self._decode)

    def _decode(self, boxes, scores, flame_params):
        res = batched_nms(
            boxes,
            scores,
            flame_params,
            confidence_threshold=self.confidence_threshold,
            iou_threshold=self.nms_iou_threshold,
            pre_nms_max=self.pre_nms_max_predictions,
            post_nms_max=self.post_nms_max_predictions,
            fuse_flame=self.param_fusion,
            fusion_iou=self.fusion_iou,
        )
        b, k, p = res.flame_params.shape
        flat = res.flame_params.reshape(b * k, p)
        verts3d, _, proj = reproject_spatial_vertices(
            self.flame_model, flat, to_2d=False
        )
        v = verts3d.shape[-2]
        return (
            res.boxes,
            res.scores,
            res.flame_params,
            verts3d.reshape(b, k, v, 3),
            proj[..., :2].reshape(b, k, v, 2),
            res.valid,
        )

    def __call__(self, decoded: DecodedPredictions) -> List[YoloHeadsPredictions]:
        boxes, scores, params, verts3d, verts2d, valid = map(
            np.asarray,
            self._device_fn(
                decoded.boxes_xyxy, decoded.scores, decoded.flame_params
            ),
        )
        out: List[YoloHeadsPredictions] = []
        for i in range(boxes.shape[0]):
            keep = valid[i]
            out.append(
                YoloHeadsPredictions(
                    scores=scores[i][keep],
                    bboxes_xyxy=boxes[i][keep],
                    mm_params=params[i][keep],
                    predicted_3d_vertices=verts3d[i][keep],
                    predicted_2d_vertices=verts2d[i][keep],
                )
            )
        return out
