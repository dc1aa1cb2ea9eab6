"""PredictionResult: draw / PNCC render / aligned crops / OBJ export.

Functional spec: reference ``head_detector/detection_result.py:12-81``.
Improvement over the reference: the PNCC processor and mesh saver are shared
lazily-constructed singletons instead of being re-built (with full asset
reloads) inside every ``PredictionResult`` constructor — the reference
rebuilds them per call (``detection_result.py:39-43``, a known inefficiency).
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from head_detector_tpu.assets_io import load_flame_assets
from head_detector_tpu.draw_utils import (
    draw_2d_landmarks,
    draw_3d_landmarks,
    draw_bboxes,
    draw_pose,
)
from head_detector_tpu.head_info import HeadMetadata
from head_detector_tpu.utils import extend_bbox, extend_to_rect, refined_head_bbox, vertically_align

DRAW_MAPPING = {
    "landmarks": [draw_3d_landmarks],
    "points": [draw_2d_landmarks],
    "pose": [draw_pose],
    "full": [draw_bboxes, draw_3d_landmarks],
    "bbox": [draw_bboxes],
}
MAX_YAW = 60


class MeshSaver:
    """OBJ writer with 1-based faces (ref detection_result.py:22-35).

    Same output format as the reference's per-line loop.  The constant face
    block is rendered once at construction; writing goes through the native
    C++ writer when it is available (OpenMP-parallel over meshes, GIL-free —
    bench config 3 exports every detection) with a vectorised pure-Python
    formatting pass as the fallback.  Both render float64 through "%.8f" so
    the two paths are byte-identical (tests/test_native.py)."""

    def __init__(self) -> None:
        self.triangles = load_flame_assets().faces.astype(np.int64) + 1
        self._faces_block = "".join(
            "f %d %d %d\n" % tuple(face) for face in self.triangles
        )
        from head_detector_tpu import native

        self._native = native if native.available() else None

    def __call__(self, vertices: np.ndarray, output_path: str) -> None:
        self.save_many(np.asarray(vertices, np.float64)[None], [output_path])

    def save_many(self, vertices: np.ndarray, paths: list) -> None:
        """Write vertices[i] (+ the shared face block) to paths[i]."""
        vertices = np.asarray(vertices, np.float64)
        if self._native is not None:
            self._native.write_objs_native(
                vertices, self._faces_block.encode(), list(paths)
            )
            return
        for verts, path in zip(vertices, paths):
            # one C-level % expansion instead of a per-vertex python loop
            body = ("v %.8f %.8f %.8f\n" * len(verts)) % tuple(verts.ravel())
            with open(path, "w") as f:
                f.write(body)
                f.write(self._faces_block)


_SHARED = {}


def _pncc_processor():
    if "pncc" not in _SHARED:
        from head_detector_tpu.pncc import PNCCProcessor

        _SHARED["pncc"] = PNCCProcessor()
    return _SHARED["pncc"]


def _mesh_saver() -> MeshSaver:
    if "mesh" not in _SHARED:
        _SHARED["mesh"] = MeshSaver()
    return _SHARED["mesh"]


class PredictionResult:
    def __init__(self, original_image: np.ndarray, heads: List[HeadMetadata]):
        self.original_image = original_image
        self.heads = heads

    @property
    def pncc_processor(self):
        return _pncc_processor()

    @property
    def mesh_saver(self) -> MeshSaver:
        return _mesh_saver()

    def draw(self, method: str = "full") -> np.ndarray:
        image = self.original_image.copy()
        for head in self.heads:
            for draw_method in DRAW_MAPPING[method]:
                image = draw_method(image, head)
        return image

    def get_pncc(self) -> np.ndarray:
        return self.pncc_processor(self.original_image, self.heads)

    def get_aligned_heads(self) -> List[np.ndarray]:
        """Roll-aligned square head crops (ref detection_result.py:56-70)."""
        head_images = []
        for head in self.heads:
            head_image = self.original_image.copy()
            roll = head.head_pose.roll
            vertices = head.vertices_3d
            if np.abs(head.head_pose.yaw) < MAX_YAW:
                head_image, vertices = vertically_align(
                    head_image, vertices, head.flame_params, roll
                )
            head_bbox = refined_head_bbox(vertices)
            head_bbox = extend_to_rect(
                extend_bbox(
                    [head_bbox.x, head_bbox.y, head_bbox.w, head_bbox.h], offset=0.1
                )
            )
            x, y, w, h = head_bbox
            head_images.append(head_image[y : y + h, x : x + w])
        return head_images

    def save_meshes(self, save_folder: str) -> None:
        os.makedirs(save_folder, exist_ok=True)
        saver = self.mesh_saver
        for i, head in enumerate(self.heads):
            saver(head.vertices_3d, os.path.join(save_folder, f"head_{i}.obj"))

    def __repr__(self) -> str:
        return (
            f"PredictionResult(original_image={self.original_image.shape}, "
            f"num heads={len(self.heads)})"
        )
