"""Host-side visualisation. Functional spec: reference
``head_detector/draw_utils.py:15-90`` (dot radius rule, triangle-wire
landmark rendering, RGB-arrow pose axes, 2px blue bboxes).  Pure
presentation code — nothing here touches the device.

Unlike the reference (a cv2 primitive call per point / per triangle), the
renderers here are vectorized: dots are stamped as one NumPy disk-stencil
scatter over all landmarks, and the mesh wireframe is a single
``cv2.polylines`` call over the whole triangle list.  At 2,094 face
landmarks x N heads per frame the per-call python overhead is the actual
cost of this module, so the batch formulation is both the idiomatic and the
fast one.
"""

from __future__ import annotations

from math import sqrt
from typing import Optional, Tuple

import cv2
import numpy as np

from head_detector_tpu.head_info import HeadMetadata
from head_detector_tpu.utils import FACE_INDICES, HEAD_INDICES, TRIANGLES

POINT_COLOR = (255, 255, 255)

# pose-axis palette: x-axis red, y-axis green, z-axis blue (BGR tuples),
# matching the reference's arrowed-axis colors (ref draw_utils.py:45-84)
_AXIS_COLORS = ((0, 0, 255), (0, 255, 0), (255, 0, 0))


def _disk_stencil(radius: int) -> np.ndarray:
    """Integer offsets of the filled disk of ``radius`` — (K, 2) (dy, dx).

    Matches cv2's filled-circle coverage (|d| <= r Euclidean ball) for the
    tiny radii the dot rule produces.
    """
    span = np.arange(-radius, radius + 1)
    dy, dx = np.meshgrid(span, span, indexing="ij")
    keep = dy * dy + dx * dx <= radius * radius
    return np.stack([dy[keep], dx[keep]], axis=1)


def draw_points(
    image: np.ndarray, points: np.ndarray, color: Optional[Tuple[int, int, int]] = None
) -> np.ndarray:
    """Stamp every landmark dot in one vectorized scatter.

    Dot radius rule (functional spec, ref draw_utils.py:15-25): 0.1% of the
    short image side, floored at 1 px.
    """
    if color is None:
        color = POINT_COLOR
    h, w = image.shape[:2]
    radius = max(1, int(min(h, w) * 0.001))
    pts = np.rint(np.asarray(points, np.float64)[:, :2]).astype(np.int64)
    if pts.size == 0:
        return image
    # all (dot, stencil-offset) pixel coordinates at once: [N, K, 2]
    pix = pts[:, None, ::-1] + _disk_stencil(radius)[None, :, :]
    pix = pix.reshape(-1, 2)
    inb = (
        (pix[:, 0] >= 0) & (pix[:, 0] < h) & (pix[:, 1] >= 0) & (pix[:, 1] < w)
    )
    pix = pix[inb]
    image[pix[:, 0], pix[:, 1]] = np.asarray(color, image.dtype)
    return image


def draw_2d_landmarks(image: np.ndarray, head: HeadMetadata) -> np.ndarray:
    """Face-subset landmark dots (ref draw_utils.py:28-31)."""
    points = head.vertices_3d[FACE_INDICES, :2]
    return draw_points(image, points)


def draw_3d_landmarks(image: np.ndarray, head: HeadMetadata) -> np.ndarray:
    """Red mesh wireframe + head-subset dots (ref draw_utils.py:34-42).

    The whole triangle subset renders as ONE ``cv2.polylines`` call: the
    [T, 3, 2] projected-triangle tensor is built by a single fancy-index
    gather instead of a python loop over triangles.
    """
    projected = np.asarray(head.vertices_3d[:, :2], np.float64)
    wires = np.rint(projected[np.asarray(TRIANGLES, np.int64)]).astype(np.int32)
    cv2.polylines(
        image, list(wires[:, :, None, :]), isClosed=True,
        color=(0, 0, 255), thickness=1,
    )
    return draw_points(image, projected[HEAD_INDICES])


def draw_pose(image: np.ndarray, head: HeadMetadata) -> np.ndarray:
    """Three arrowed pose axes from the head's RPY euler angles.

    Spec (ref draw_utils.py:45-84): axes anchored at the bbox center, length
    sqrt(bbox area)/4, thickness 3% of sqrt(bbox area); the screen-plane
    axis directions are the standard draw-axis projection of the intrinsic
    basis under the XYZ euler convention of ``calculate_rpy`` (yaw negated
    for the y-down image frame).
    """
    rpy = head.head_pose
    bbox = head.bbox
    side = sqrt(bbox.w * bbox.h)
    center = np.array([bbox.x + bbox.w // 2, bbox.y + bbox.h // 2], np.float64)

    p, y, r = np.deg2rad([rpy.pitch, -rpy.yaw, rpy.roll])
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    cr, sr = np.cos(r), np.sin(r)
    # rows: image-plane (x, y) of the rotated head-frame X / Y / Z axes
    axes = np.array(
        [
            [cy * cr, cp * sr + cr * sp * sy],
            [-cy * sr, cp * cr - sp * sy * sr],
            [sy, -cy * sp],
        ]
    )
    tips = np.rint(center + (side // 4) * axes).astype(int)

    origin = (int(center[0]), int(center[1]))
    thickness = max(1, int(side * 0.03))
    for tip, axis_color in zip(tips, _AXIS_COLORS):
        cv2.arrowedLine(image, origin, (tip[0], tip[1]), axis_color, thickness)
    return image


def draw_bboxes(image: np.ndarray, head: HeadMetadata) -> np.ndarray:
    """2px blue box (ref draw_utils.py:87-90)."""
    x, y, w, h = head.bbox
    cv2.rectangle(image, (x, y), (x + w, y + h), (255, 0, 0), 2)
    return image
