"""Box dataclass + head-box detector used by the data-cleaning filters.

Functional spec: reference ``data_generator/binary_detector.py:14-99``: a
``Box`` value type with IoU, an ONNX-runtime DETR-style head detector, and an
insightface face detector.  Here the head detector is our own TPU
``HeadDetector`` (boxes only), and the face detector is approximated by the
same model's face-region vertex bboxes (insightface is unavailable) — the
filters only need "a face box inside some head box" semantics.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from head_detector_tpu.utils import FACE_INDICES


@dataclasses.dataclass
class Box:
    x1: float
    y1: float
    x2: float
    y2: float
    confidence: float = 1.0

    @property
    def width(self) -> float:
        return self.x2 - self.x1

    @property
    def height(self) -> float:
        return self.y2 - self.y1

    def area(self) -> float:
        return max(0.0, self.width) * max(0.0, self.height)

    def iou(self, other: "Box") -> float:
        x1 = max(self.x1, other.x1)
        y1 = max(self.y1, other.y1)
        x2 = min(self.x2, other.x2)
        y2 = min(self.y2, other.y2)
        inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
        union = self.area() + other.area() - inter
        return inter / union if union > 0 else 0.0


def fliplr_boxes(boxes: List[Box], image_shape) -> List[Box]:
    w = image_shape[1]
    return [
        Box(x1=w - b.x2, y1=b.y1, x2=w - b.x1, y2=b.y2, confidence=b.confidence)
        for b in boxes
    ]


class HeadBoxDetector:
    """Boxes-only wrapper of :class:`head_detector_tpu.detector.HeadDetector`."""

    def __init__(self, detector=None, confidence_threshold: float = 0.5, **kwargs):
        if detector is None:
            from head_detector_tpu.detector import HeadDetector

            detector = HeadDetector(**kwargs)
        self.detector = detector
        self.confidence_threshold = confidence_threshold

    def __call__(self, image: np.ndarray) -> List[Box]:
        result = self.detector(image, confidence_threshold=self.confidence_threshold)
        return [
            Box(
                x1=float(h.bbox.x),
                y1=float(h.bbox.y),
                x2=float(h.bbox.x + h.bbox.w),
                y2=float(h.bbox.y + h.bbox.h),
                confidence=float(h.score),
            )
            for h in result.heads
        ]


class FaceBoxDetector:
    """Face boxes from the detected heads' face-region vertices (stand-in for
    insightface; supply ``external_detector`` to use a real face detector)."""

    def __init__(self, detector=None, external_detector=None, **kwargs):
        self.external_detector = external_detector
        if external_detector is None:
            if detector is None:
                from head_detector_tpu.detector import HeadDetector

                detector = HeadDetector(**kwargs)
            self.detector = detector

    def __call__(self, image: np.ndarray) -> List[Box]:
        if self.external_detector is not None:
            return self.external_detector(image)
        result = self.detector(image)
        boxes = []
        for h in result.heads:
            pts = np.take(h.vertices_3d[:, :2], FACE_INDICES, axis=0)
            boxes.append(
                Box(
                    x1=float(pts[:, 0].min()),
                    y1=float(pts[:, 1].min()),
                    x2=float(pts[:, 0].max()),
                    y2=float(pts[:, 1].max()),
                    confidence=float(h.score),
                )
            )
        return boxes
