"""Pseudo-annotation: detector boxes + single-crop mesh teacher -> npz GT.

Functional spec: reference ``data_generator/mesh_dataset.py:37-246``: for each
image, take head bboxes (own detector or provided), extend by 0.25, crop,
run the DAD-3DNet teacher on the crop, save per-image
``annotations/{stem}.npz`` with ``bbox`` [N,4] xywh, ``extended_bbox`` [N,4]
xywh and ``3dmm_params`` [N,1,413] in the DAD annotation convention — exactly
the format ``train.dataset.DAD3DHeadsDataset`` consumes.

The teacher here is :class:`head_detector_tpu.dad_teacher.FaceMeshPredictor`
(our TPU single-crop mesh predictor standing in for the frozen TorchScript
DAD-3DNet, whose weights are not redistributable).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import cv2
import numpy as np

from head_detector_tpu.data_factory.binary_detector import Box, HeadBoxDetector
from head_detector_tpu.utils import extend_bbox


def _clip_xywh(bbox: np.ndarray, h: int, w: int) -> np.ndarray:
    x, y, bw, bh = bbox
    x1 = max(0, int(x))
    y1 = max(0, int(y))
    x2 = min(w, int(x + bw))
    y2 = min(h, int(y + bh))
    return np.array([x1, y1, x2 - x1, y2 - y1], np.int64)


def annotate_image(
    image: np.ndarray,
    teacher,
    boxes: Optional[List[Box]] = None,
    detector: Optional[HeadBoxDetector] = None,
    bbox_extend: float = 0.25,
):
    """One image -> (bbox [N,4], extended_bbox [N,4], 3dmm_params [N,1,413])."""
    if boxes is None:
        boxes = detector(image)
    h, w = image.shape[:2]
    bboxes, ext_bboxes, params = [], [], []
    for box in boxes:
        xywh = np.array([box.x1, box.y1, box.width, box.height])
        ext = _clip_xywh(extend_bbox(xywh, offset=bbox_extend), h, w)
        if ext[2] < 8 or ext[3] < 8:
            continue
        crop = image[ext[1] : ext[1] + ext[3], ext[0] : ext[0] + ext[2]]
        result = teacher(crop)
        if result is None:
            continue
        bboxes.append(_clip_xywh(xywh, h, w))
        ext_bboxes.append(ext)
        params.append(result["3dmm_params"].reshape(1, 413))
    if not bboxes:
        return None
    return (
        np.stack(bboxes),
        np.stack(ext_bboxes),
        np.stack(params).astype(np.float32),
    )


def annotate_folder(
    data_path: str,
    teacher=None,
    detector: Optional[HeadBoxDetector] = None,
    bbox_extend: float = 0.25,
) -> int:
    """Sweep ``{data_path}/images`` and write ``{data_path}/annotations``."""
    if teacher is None:
        from head_detector_tpu.dad_teacher import FaceMeshPredictor

        teacher = FaceMeshPredictor.dad_3dnet()
    detector = detector or HeadBoxDetector()

    images_dir = Path(data_path) / "images"
    ann_dir = Path(data_path) / "annotations"
    ann_dir.mkdir(parents=True, exist_ok=True)
    written = 0
    for image_path in sorted(images_dir.glob("*.jpg")):
        image = cv2.imread(str(image_path))
        if image is None:
            continue
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        out = annotate_image(image, teacher, detector=detector, bbox_extend=bbox_extend)
        if out is None:
            continue
        bbox, ext, params = out
        np.savez(
            ann_dir / (image_path.stem + ".npz"),
            bbox=bbox,
            extended_bbox=ext,
            **{"3dmm_params": params},
        )
        written += 1
    return written
