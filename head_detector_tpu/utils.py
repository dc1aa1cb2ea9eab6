"""Host-side geometry helpers for crops/alignment + asset constants.

Functional spec: reference ``head_detector/utils.py:14-156``.  Only the cheap
per-head host math lives here (bbox algebra, cv2 affine warps for the
aligned-crop API); all per-anchor math (NMS, rotation, RPY) runs on device in
``ops/``.
"""

from __future__ import annotations

import os
from typing import Tuple, Union

import cv2
import numpy as np

from head_detector_tpu.assets_io import load_flame_assets
from head_detector_tpu.head_info import Bbox, FlameParams

IMAGE_SIZE = 640

_ASSETS = load_flame_assets()
FACE_INDICES = _ASSETS.face_indices
HEAD_INDICES = _ASSETS.head_indices
TRIANGLES = _ASSETS.triangles


def get_relative_path(x: str, rel_to: str) -> str:
    return os.path.join(os.path.dirname(rel_to), x)


def refined_head_bbox(vertices: np.ndarray) -> Bbox:
    """Tight int bbox over the head-subset vertices (ref utils.py:26-35)."""
    points = np.take(np.asarray(vertices), HEAD_INDICES, axis=0)
    x, y = int(points[:, 0].min()), int(points[:, 1].min())
    x1, y1 = int(points[:, 0].max()), int(points[:, 1].max())
    return Bbox(x=x, y=y, w=x1 - x, h=y1 - y)


def extend_bbox(
    bbox: np.ndarray, offset: Union[Tuple[float, ...], float] = 0.1
) -> np.ndarray:
    """Grow an xywh bbox by a fraction of its size per side (ref utils.py:38-66)."""
    x, y, w, h = bbox
    if isinstance(offset, tuple):
        if len(offset) == 4:
            left, right, top, bottom = offset
        else:
            w_off, h_off = offset
            left = right = w_off
            top = bottom = h_off
    else:
        left = right = top = bottom = offset
    return np.array(
        [x - w * left, y - h * top, w * (1.0 + right + left), h * (1.0 + top + bottom)]
    ).astype("int32")


def extend_to_rect(bbox: np.ndarray) -> np.ndarray:
    """Symmetrically grow the short side to make the bbox square (ref utils.py:69-76)."""
    x, y, w, h = bbox
    if w > h:
        diff = w - h
        return np.array([x, y - diff // 2, w, w])
    diff = h - w
    return np.array([x - diff // 2, y, h, h])


def flame_params_skull_center(
    flame_params: FlameParams, image: np.ndarray
) -> Tuple[int, int]:
    """Skull center in original-image coordinates (ref utils.py:79-90).

    Replicates the reference formula exactly, including its use of the *full*
    pad rather than the half pad applied on each side.
    """
    h, w = image.shape[:2]
    scale = IMAGE_SIZE / max(h, w)
    if h > w:
        new_h, new_w = IMAGE_SIZE, int(w * IMAGE_SIZE / h)
    else:
        new_h, new_w = int(h * IMAGE_SIZE / w), IMAGE_SIZE
    pad_w = IMAGE_SIZE - new_w
    pad_h = IMAGE_SIZE - new_h
    center = np.asarray(flame_params.translation).reshape(-1)[:2] / scale
    return int(center[0] - pad_w), int(center[1] - pad_h)


def get_rotation_mat(
    img: np.ndarray, img_center: Tuple[int, int], angle: Union[float, int]
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """cv2 rotation matrix with bounds grown to hold the rotated image
    (ref utils.py:93-106)."""
    height, width = img.shape[:2]
    rotation_mat = cv2.getRotationMatrix2D(
        (float(img_center[0]), float(img_center[1])), float(angle), 1.0
    )
    abs_cos = abs(rotation_mat[0, 0])
    abs_sin = abs(rotation_mat[0, 1])
    bound_w = int(height * abs_sin + width * abs_cos)
    bound_h = int(height * abs_cos + width * abs_sin)
    rotation_mat[0, 2] += bound_w / 2 - img_center[0]
    rotation_mat[1, 2] += bound_h / 2 - img_center[1]
    return rotation_mat, (bound_w, bound_h)


def vertically_align(
    img: np.ndarray, vertices: np.ndarray, flame_params: FlameParams, roll: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Rotate image+vertices by -roll about the skull center (ref utils.py:109-117)."""
    skull_center = flame_params_skull_center(flame_params, img)
    rot_mat, bounds = get_rotation_mat(img, skull_center, roll)
    vertical_img = cv2.warpAffine(img, rot_mat, bounds, flags=cv2.INTER_LINEAR)
    pts = np.hstack([vertices[:, :2], np.ones((vertices.shape[0], 1))])
    rotated = pts @ rot_mat.T
    return vertical_img, rotated
