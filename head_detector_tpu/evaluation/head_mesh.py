"""HeadMesh: FLAME decode helper with the DAD projection convention.

Functional spec: reference ``evaluation/head_mesh.py:9-60`` (and the
identical copy in ``dad_3d_heads/model_training/head_mesh.py``):
``reprojected_vertices`` uses ``scale' = clamp(scale + 1, 1e-8)``,
``translation.z = 0`` and ``(v + 1)/2 * image_size``;
``adjust_3dmm_to_paddings`` shifts translation by ``2 * pad / image_size``.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp

from head_detector_tpu.flame import FlameModel, flame_vertices
from head_detector_tpu.head_info import FLAME_CONSTS, FlameParams


class HeadMesh:
    def __init__(
        self,
        flame_config: Optional[Dict[str, int]] = None,
        image_size: int = 256,
        flame_model: Optional[FlameModel] = None,
    ):
        self.flame_constants = flame_config or FLAME_CONSTS
        self.flame = flame_model or FlameModel.from_assets()
        self._image_size = image_size

    def flame_params(self, params_3dmm: jnp.ndarray) -> FlameParams:
        return FlameParams.from_3dmm(params_3dmm, self.flame_constants)

    def vertices_3d(self, params_3dmm: jnp.ndarray, zero_rotation: bool = False) -> jnp.ndarray:
        p = self.flame_params(params_3dmm)
        return flame_vertices(self.flame, p, zero_rot=zero_rotation)

    def reprojected_vertices(self, params_3dmm: jnp.ndarray, to_2d: bool = True) -> jnp.ndarray:
        p = self.flame_params(params_3dmm)
        verts = flame_vertices(self.flame, p, zero_rot=False)
        scale = jnp.clip(p.scale[:, None] + 1.0, 1e-8, None)
        verts = verts * scale
        translation = p.translation.at[..., 2].set(0.0)
        verts = verts + translation[:, None]
        projected = (verts + 1.0) / 2.0 * self._image_size
        return projected[..., :2] if to_2d else projected

    def adjust_3dmm_to_paddings(
        self, params_3dmm: jnp.ndarray, paddings: List[int]
    ) -> jnp.ndarray:
        """paddings = [pad_top, pad_bottom, pad_left, pad_right]; positive
        when the image grew, negative when cropped."""
        p = self.flame_params(params_3dmm)
        shift = jnp.asarray([[paddings[2], paddings[0], 0.0]], params_3dmm.dtype)
        p.translation = p.translation + shift * 2.0 / self._image_size
        return p.to_3dmm_tensor()
