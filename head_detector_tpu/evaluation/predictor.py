"""The shared evaluation predictor idiom.

Every reference eval script inlines the same flow
(``evaluation/evaluate_pose.py:95-129`` is canonical): resize longest side to
640 -> pad bottom/right with 127 -> forward -> post-prediction callback
(conf/iou thresholds) -> divide coords and ``flame.scale`` by the resize
scale.  This is the training-checkpoint inference path, distinct from the
``HeadDetector`` TorchScript path.
"""

from __future__ import annotations

from typing import Any, Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from head_detector_tpu.flame import FlameModel
from head_detector_tpu.models import build_model, init_model
from head_detector_tpu.post_prediction import (
    YoloHeadsPostPredictionCallback,
    YoloHeadsPredictions,
)


class EvalPredictor:
    def __init__(
        self,
        model_name: str = "yolo_heads_l",
        variables: Optional[dict] = None,
        checkpoint: Optional[str] = None,
        image_size: int = 640,
        confidence_threshold: float = 0.5,
        nms_iou_threshold: float = 0.7,
        pre_nms_max_predictions: int = 300,
        post_nms_max_predictions: int = 30,
        dtype: Any = jnp.float32,
    ):
        self.image_size = image_size
        self.model = build_model(model_name, dtype=dtype)
        if variables is not None:
            self.variables = variables
        elif checkpoint:
            from head_detector_tpu.detector import load_variables

            self.variables = load_variables(checkpoint)
        else:
            self.variables = init_model(
                self.model, jax.random.PRNGKey(0), (image_size, image_size)
            )
        self.flame = FlameModel.from_assets()
        self.callback = YoloHeadsPostPredictionCallback(
            flame_model=self.flame,
            confidence_threshold=confidence_threshold,
            nms_iou_threshold=nms_iou_threshold,
            pre_nms_max_predictions=pre_nms_max_predictions,
            post_nms_max_predictions=post_nms_max_predictions,
        )
        self._forward = jax.jit(
            lambda imgs: self.model.apply(self.variables, imgs, train=False)[0]
        )

    def preprocess(self, image: np.ndarray):
        """Longest-max-size 640 + bottom/right pad 127 (eval idiom)."""
        h, w = image.shape[:2]
        scale = min(self.image_size / h, self.image_size / w)
        new_h, new_w = int(h * scale + 0.5), int(w * scale + 0.5)
        resized = cv2.resize(image, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
        padded = cv2.copyMakeBorder(
            resized, 0, self.image_size - new_h, 0, self.image_size - new_w,
            cv2.BORDER_CONSTANT, value=(127, 127, 127),
        )
        return padded, scale

    def __call__(self, image: np.ndarray) -> YoloHeadsPredictions:
        """RGB uint8 image -> predictions in ORIGINAL image coordinates."""
        padded, scale = self.preprocess(image)
        imgs = jnp.asarray(padded[None], jnp.float32) / 255.0
        decoded = self._forward(imgs)
        pred = self.callback(decoded)[0]

        # un-scale back to original coords (ref evaluate_pose.py:120-129):
        # boxes and 2D vertices divide by scale; flame scale divides too;
        # 3D canonical vertices are scale-free.
        pred.bboxes_xyxy = pred.bboxes_xyxy / scale
        pred.predicted_2d_vertices = pred.predicted_2d_vertices / scale
        mm = pred.mm_params.copy()
        mm[:, 409:412] /= scale  # translation
        mm[:, 412] /= scale  # scale
        pred.mm_params = mm
        return pred
