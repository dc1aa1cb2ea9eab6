"""Host-side visualisation (cv2). Functional spec: reference
``head_detector/draw_utils.py:15-90``. Pure presentation code — nothing here
touches the device."""

from __future__ import annotations

from math import cos, sin, sqrt
from typing import Optional, Tuple

import cv2
import numpy as np

from head_detector_tpu.head_info import HeadMetadata
from head_detector_tpu.utils import FACE_INDICES, HEAD_INDICES, TRIANGLES

POINT_COLOR = (255, 255, 255)


def draw_points(
    image: np.ndarray, points: np.ndarray, color: Optional[Tuple[int, int, int]] = None
) -> np.ndarray:
    if color is None:
        color = POINT_COLOR
    radius = max(1, int(min(image.shape[:2]) * 0.001))
    for pt in points:
        cv2.circle(image, (int(pt[0]), int(pt[1])), radius, color, -1)
    return image


def draw_2d_landmarks(image: np.ndarray, head: HeadMetadata) -> np.ndarray:
    points = np.take(head.vertices_3d[:, :2], FACE_INDICES, axis=0)
    return draw_points(image, points)


def draw_3d_landmarks(image: np.ndarray, head: HeadMetadata) -> np.ndarray:
    projected = head.vertices_3d[:, :2]
    points = np.take(projected, HEAD_INDICES, axis=0)
    for triangle in TRIANGLES:
        pts = np.array(
            [(projected[i][0], projected[i][1]) for i in triangle], np.int32
        ).reshape(-1, 1, 2)
        cv2.polylines(image, [pts], isClosed=True, color=(0, 0, 255), thickness=1)
    return draw_points(image, points)


def draw_pose(image: np.ndarray, head: HeadMetadata) -> np.ndarray:
    """Three arrowed pose axes scaled by sqrt(bbox area)/4 (ref draw_utils.py:45-84)."""
    rpy = head.head_pose
    bbox = head.bbox
    bbox_area = bbox.w * bbox.h
    tdx, tdy = bbox.x + bbox.w // 2, bbox.y + bbox.h // 2
    size = sqrt(bbox_area) // 4

    pitch = rpy.pitch * np.pi / 180
    yaw = -(rpy.yaw * np.pi / 180)
    roll = rpy.roll * np.pi / 180

    x1 = size * (cos(yaw) * cos(roll)) + tdx
    y1 = size * (cos(pitch) * sin(roll) + cos(roll) * sin(pitch) * sin(yaw)) + tdy
    x2 = size * (-cos(yaw) * sin(roll)) + tdx
    y2 = size * (cos(pitch) * cos(roll) - sin(pitch) * sin(yaw) * sin(roll)) + tdy
    x3 = size * (sin(yaw)) + tdx
    y3 = size * (-cos(yaw) * sin(pitch)) + tdy

    thickness = max(1, int(sqrt(bbox_area) * 0.03))
    cv2.arrowedLine(image, (int(tdx), int(tdy)), (int(x1), int(y1)), (0, 0, 255), thickness)
    cv2.arrowedLine(image, (int(tdx), int(tdy)), (int(x2), int(y2)), (0, 255, 0), thickness)
    cv2.arrowedLine(image, (int(tdx), int(tdy)), (int(x3), int(y3)), (255, 0, 0), thickness)
    return image


def draw_bboxes(image: np.ndarray, head: HeadMetadata) -> np.ndarray:
    x, y, w, h = head.bbox
    cv2.rectangle(image, (x, y), (x + w, y + h), (255, 0, 0), 2)
    return image
