"""FaceMeshPredictor: single-crop 3D mesh teacher (DAD-3DNet equivalent).

Functional spec: reference ``dad_3d_heads/predictor.py:67-210``: preprocess =
LongestMaxSize(256) + pad + ImageNet normalise; a frozen single-crop mesh
network; postprocess = 68-landmark extraction + 3DMM readjustment to input
coordinates.  The frozen TorchScript ``dad_3dheads.trcd`` weights are
downloaded from the hub in the reference and are not redistributable; this
teacher reuses our YoloHeads detector on the 256-crop and converts its
model-convention FLAME output into the **DAD annotation convention** the
pseudo-annotation format stores:

    model:  projected = R v * s_m + t_m                 (pixels in crop)
    DAD:    projected = ((R v (s' + 1) + t') + 1)/2 * 256

    =>  s' = s_m / 128 - 1,   t'_xy = t_m / 128 - 1,   t'_z = 0

so ``train.dataset.decode_dad_annotation`` round-trips to the same pixels.

Note an improvement over the reference: DAD-3DNet's params live in the
256-RESIZED crop space, and the reference's absolute-coordinate read-back
(``projected + extended_bbox_origin``) silently assumes the crop was 256 px.
Here ``s_m``/``t_m`` are in RAW crop pixels, so decode + origin is exact for
any crop size — the annotate -> read -> train loop round-trips losslessly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

DAD_SIZE = 256


def model_params_to_dad(mm_params: np.ndarray) -> np.ndarray:
    """Packed model-convention params [413] (crop pixels) -> DAD convention."""
    out = np.asarray(mm_params, np.float32).copy().reshape(413)
    half = DAD_SIZE / 2.0
    out[412] = out[412] / half - 1.0  # scale
    out[409] = out[409] / half - 1.0  # tx
    out[410] = out[410] / half - 1.0  # ty
    out[411] = 0.0  # tz zeroed in the annotation convention
    return out


class FaceMeshPredictor:
    """``predictor(crop) -> {"3dmm_params", "projected_vertices", "points"}``.

    ``points`` are 68 2D landmarks (ref: heatmap argmax; here the 68-vertex
    subset of the projected mesh — see evaluation.dad_metrics landmark note).
    """

    def __init__(self, predictor=None, model_name: str = "yolo_heads_m",
                 checkpoint: Optional[str] = None):
        if predictor is None:
            from head_detector_tpu.evaluation.predictor import EvalPredictor

            predictor = EvalPredictor(
                model_name=model_name,
                checkpoint=checkpoint,
                image_size=DAD_SIZE,
                confidence_threshold=0.1,
                nms_iou_threshold=0.5,
                post_nms_max_predictions=5,
            )
        self.predictor = predictor
        from head_detector_tpu.evaluation.dad_metrics import get_68_landmark_indices

        self._lmk68 = get_68_landmark_indices()

    @classmethod
    def dad_3dnet(cls, checkpoint: Optional[str] = None) -> "FaceMeshPredictor":
        """Named constructor mirroring the reference factory
        (``FaceMeshPredictor.dad_3dnet()``)."""
        return cls(checkpoint=checkpoint)

    def __call__(self, crop: np.ndarray) -> Optional[Dict[str, Any]]:
        pred = self.predictor(np.ascontiguousarray(crop))
        if len(pred.scores) == 0:
            return None
        # largest-area detection is the crop's subject
        areas = (pred.bboxes_xyxy[:, 2] - pred.bboxes_xyxy[:, 0]) * (
            pred.bboxes_xyxy[:, 3] - pred.bboxes_xyxy[:, 1]
        )
        i = int(np.argmax(areas))
        projected = np.asarray(pred.predicted_2d_vertices[i])
        return {
            "3dmm_params": model_params_to_dad(pred.mm_params[i]),
            "projected_vertices": projected,
            "points": projected[self._lmk68],
            "score": float(pred.scores[i]),
        }
