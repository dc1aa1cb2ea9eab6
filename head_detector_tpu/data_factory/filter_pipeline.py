"""Auto-cleaning filters for generated data.

Functional spec: reference ``data_generator/filter_pipeline.py:27-243``:
* ``DetectorFilter``   — reject when flip changes the detection count,
* ``FaceDetectorFilter`` — reject when some face box overlaps no head box,
* ``VerticalCutFilter`` — reject when splitting the image at a head-free
  vertical line changes the total detection count,
* ``StabilityMetric``  — mean best-IoU between boxes and flipped-image boxes,
* ``filter_data``      — sweep a folder, write the ``files.txt`` exclusion
  list + ``metrics.json`` the dataset reader consumes.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import List, Optional, Tuple

import cv2
import numpy as np

from head_detector_tpu.data_factory.binary_detector import (
    Box,
    FaceBoxDetector,
    HeadBoxDetector,
    fliplr_boxes,
)


class StabilityMetric:
    def __init__(self, detector: HeadBoxDetector):
        self.detector = detector

    def _compute_iou(self, bboxes: List[Box], flipped: List[Box]) -> float:
        iou = 0.0
        for bbox in bboxes:
            iou += max((bbox.iou(f) for f in flipped), default=0.0)
        return iou / len(bboxes)

    def __call__(self, image: np.ndarray) -> Tuple[int, float]:
        bboxes = self.detector(image)
        if not bboxes:
            return 0, 0.0
        flipped = self.detector(np.fliplr(image))
        flipped = fliplr_boxes(flipped, image.shape)
        return len(bboxes), self._compute_iou(bboxes, flipped)


class DetectorFilter:
    """True (= reject) when zero detections or flip-inconsistent count."""

    def __init__(self, detector: HeadBoxDetector):
        self.detector = detector

    def __call__(self, image: np.ndarray) -> bool:
        bboxes = self.detector(image)
        if len(bboxes) == 0:
            return True
        flipped = self.detector(np.fliplr(image))
        return len(bboxes) != len(flipped)


class VerticalCutFilter:
    """True (= reject) when detections are inconsistent across a head-free
    vertical split."""

    def __init__(self, detector: HeadBoxDetector):
        self.detector = detector

    @staticmethod
    def find_vertical_split(image_width: int, bboxes: List[Box]) -> Optional[int]:
        center_x = image_width // 2
        for offset in range(center_x + 1):
            left_x = center_x - offset
            right_x = center_x + offset
            if any(box.x1 < left_x < box.x2 for box in bboxes):
                if not any(box.x1 < right_x < box.x2 for box in bboxes):
                    return right_x
            else:
                return left_x
        return None

    def _valid_split(self, image, bboxes: List[Box], split: Optional[int]) -> bool:
        if split is None:
            return False
        left = image[:, :split]
        right = image[:, split:]
        if min(left.shape[:2]) < 10 or min(right.shape[:2]) < 10:
            return False
        has_left = any(b.x2 < split for b in bboxes)
        has_right = any(b.x1 > split for b in bboxes)
        return has_left and has_right

    def __call__(self, image: np.ndarray) -> bool:
        bboxes = self.detector(image)
        if len(bboxes) == 0:
            return True
        split = self.find_vertical_split(image.shape[1], bboxes)
        if not self._valid_split(image, bboxes, split):
            return False
        left = self.detector(image[:, :split])
        right = self.detector(image[:, split:])
        return len(left) + len(right) != len(bboxes)


class FaceDetectorFilter:
    """True (= reject) when some detected face lies inside no detected head."""

    def __init__(self, detector: HeadBoxDetector,
                 face_detector: Optional[FaceBoxDetector] = None):
        self.detector = detector
        self.face_detector = face_detector or FaceBoxDetector(
            detector=detector.detector
        )

    @staticmethod
    def _overlap(a: Box, b: Box) -> bool:
        inter = max(0.0, min(a.x2, b.x2) - max(a.x1, b.x1)) * max(
            0.0, min(a.y2, b.y2) - max(a.y1, b.y1)
        )
        return inter > 0

    def __call__(self, image: np.ndarray) -> bool:
        heads = self.detector(image.copy())
        faces = self.face_detector(image)
        if len(faces) == 0:
            return False
        for face in faces:
            if not any(self._overlap(face, head) for head in heads):
                return True
        return False


def filter_data(data_path: str, save_path: str, detector: Optional[HeadBoxDetector] = None) -> dict:
    """Sweep ``{data_path}/images`` -> write exclusion list + metrics
    (ref filter_pipeline.py:filter_data)."""
    os.makedirs(save_path, exist_ok=True)
    detector = detector or HeadBoxDetector()
    filters = [
        DetectorFilter(detector),
        FaceDetectorFilter(detector),
        VerticalCutFilter(detector),
    ]
    stability = StabilityMetric(detector)

    excluded = []
    metrics = {}
    images_dir = Path(data_path) / "images"
    for image_path in sorted(images_dir.glob("*.jpg")):
        image = cv2.imread(str(image_path))
        if image is None:
            excluded.append(image_path.name)
            continue
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        if any(f(image) for f in filters):
            excluded.append(image_path.name)
            continue
        count, iou = stability(image)
        metrics[image_path.name] = {"num_boxes": count, "flip_iou": iou}

    with open(os.path.join(save_path, "files.txt"), "w") as f:
        f.write("\n".join(excluded))
    with open(os.path.join(save_path, "metrics.json"), "w") as f:
        json.dump(metrics, f)
    return {"excluded": len(excluded), "kept": len(metrics)}
