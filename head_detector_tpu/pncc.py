"""PNCC (Projected Normalized Coordinate Code) rendering.

Functional spec: reference ``head_detector/pncc_processor.py:10-73`` — per
head: flip z, rasterize the head_w_ears triangle subset colored by the
min-max-normalised template coordinates, composite nonzero pixels onto an
accumulating canvas.  The raster itself runs on device
(:mod:`head_detector_tpu.ops.rasterize`); only the trivial compositing is
host numpy.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from head_detector_tpu.assets_io import load_flame_assets
from head_detector_tpu.head_info import HeadMetadata
from head_detector_tpu.ops.rasterize import rasterize


def compute_ncc_color_codes(
    template_face: np.ndarray, subset_indexes: Optional[np.ndarray] = None
) -> np.ndarray:
    """Min-max normalise template coords to unit RGB (ref pncc_processor.py:40-55)."""
    if not isinstance(template_face, np.ndarray):
        raise ValueError(
            f"Argument template_face must be a numpy array, got type {type(template_face)}"
        )
    if len(template_face.shape) != 2 or template_face.shape[1] != 3:
        raise ValueError(
            f"Argument template_face must have shape [N,3], got shape {template_face.shape}"
        )
    if subset_indexes is not None and not isinstance(subset_indexes, np.ndarray):
        raise ValueError(
            f"Argument subset_indexes must be a numpy array, got type {type(subset_indexes)}"
        )
    sub = template_face[subset_indexes] if subset_indexes is not None else template_face
    u_min = sub.min(axis=0, keepdims=True, initial=0)
    u_max = sub.max(axis=0, keepdims=True, initial=0)
    return (template_face - u_min) / (u_max - u_min)


def pncc(
    img: np.ndarray,
    vertices: np.ndarray,
    faces: np.ndarray,
    colors: np.ndarray,
    with_bg_flag: bool = True,
) -> np.ndarray:
    """Render a colored 3D face mesh (ref pncc_processor.py:10-37)."""
    overlap = img.copy() if with_bg_flag else np.zeros_like(img)
    return rasterize(
        np.ascontiguousarray(vertices, np.float32),
        np.ascontiguousarray(faces, np.int32),
        np.ascontiguousarray(colors, np.float32),
        bg=overlap,
    )


class PNCCProcessor:
    def __init__(self):
        assets = load_flame_assets()
        self.indices = assets.head_w_ears_indices
        idx_set = set(int(i) for i in self.indices)
        self.triangles = np.array(
            [t for t in assets.faces if all(int(v) in idx_set for v in t)]
        ).astype(np.int32)
        self.colors = compute_ncc_color_codes(
            assets.v_template.astype(np.float64), self.indices
        )

    def __call__(self, image: np.ndarray, heads: List[HeadMetadata]) -> np.ndarray:
        pncc_image = np.zeros_like(image)
        for head in heads:
            # z-flip mutates the head's vertices in the reference too
            # (pncc_processor.py:69-70) — kept on a copy here.
            vertices = np.array(head.vertices_3d, np.float32, copy=True)
            vertices[:, 2] *= -1
            current = pncc(pncc_image, vertices, self.triangles, self.colors)
            mask = current.sum(2) != 0
            pncc_image[mask] = current[mask]
        return pncc_image
