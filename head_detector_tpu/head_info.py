"""Core data contracts: FLAME parameter layout, bbox/pose tuples, head metadata.

Functional spec: reference ``head_detector/head_info.py:9-109``.

The FLAME wire format is a 413-float vector.  The reference has a deliberate
(historically accidental, now load-bearing) asymmetry between the two
conversion functions:

* ``FlameParams.from_3dmm`` slices the wire vector in the order
  ``[shape(300), expression(100), jaw(3), rotation(6), eyeballs(0), neck(0),
  translation(3), scale(1)]`` (jaw at ``[400:403]``, rotation at ``[403:409]``,
  reference ``head_info.py:53-77``).
* ``FlameParams.to_3dmm_tensor`` concatenates in the order
  ``[shape, expression, rotation, jaw, eyeballs, neck, translation, scale]``
  (rotation at ``[400:406]``, jaw at ``[406:409]``, reference
  ``head_info.py:95-107``).

The round trip ``from_3dmm(to_3dmm(p))`` therefore permutes three floats
between the rotation and jaw fields.  All consumers in the reference (and
here) always go through the same pair, so the mapping is self-consistent
end-to-end; we replicate it exactly for wire-format parity.
"""

from __future__ import annotations

import dataclasses
from collections import namedtuple
from typing import Dict, Optional

import numpy as np

Bbox = namedtuple("Bbox", ["x", "y", "w", "h"])
RPY = namedtuple("RPY", ["roll", "pitch", "yaw"])

# Reference: head_detector/head_info.py:12-21
FLAME_CONSTS: Dict[str, int] = {
    "shape": 300,
    "expression": 100,
    "rotation": 6,
    "jaw": 3,
    "eyeballs": 0,
    "neck": 0,
    "translation": 3,
    "scale": 1,
}

NUM_FLAME_PARAMS = sum(FLAME_CONSTS.values())  # 413
NUM_VERTICES = 5023
NUM_FACES = 9976


@dataclasses.dataclass
class FlameParams:
    """A batch of decomposed FLAME parameter groups.

    Every field is an array whose leading dimensions are batch-like and whose
    second dimension is the parameter-group size.  Arrays may be jax or numpy;
    all math here is backend-agnostic (pure slicing / concatenation).
    """

    shape: np.ndarray
    expression: np.ndarray
    rotation: np.ndarray
    translation: np.ndarray
    scale: np.ndarray
    jaw: np.ndarray
    eyeballs: np.ndarray
    neck: np.ndarray

    @classmethod
    def from_3dmm(
        cls,
        tensor_3dmm,
        constants: Optional[Dict[str, int]] = None,
        zero_expr: bool = False,
    ) -> "FlameParams":
        """Slice a packed ``[B, 413, ...]`` wire tensor into parameter groups.

        Slice order (reference ``head_info.py:53-77``): shape, expression,
        **jaw, rotation**, eyeballs, neck, translation, scale.
        """
        if constants is None:
            constants = FLAME_CONSTS
        total = sum(constants.values())
        if tensor_3dmm.shape[1] != total:
            raise ValueError(
                f"3DMM vector has {tensor_3dmm.shape[1]} parameters; expected {total}."
            )
        i = 0
        shape = tensor_3dmm[:, i : i + constants["shape"]]
        i += constants["shape"]
        expression = tensor_3dmm[:, i : i + constants["expression"]]
        if zero_expr:
            expression = expression * 0
        i += constants["expression"]
        jaw = tensor_3dmm[:, i : i + constants["jaw"]]
        i += constants["jaw"]
        rotation = tensor_3dmm[:, i : i + constants["rotation"]]
        i += constants["rotation"]
        eyeballs = tensor_3dmm[:, i : i + constants["eyeballs"]]
        i += constants["eyeballs"]
        neck = tensor_3dmm[:, i : i + constants["neck"]]
        i += constants["neck"]
        translation = tensor_3dmm[:, i : i + constants["translation"]]
        i += constants["translation"]
        scale = tensor_3dmm[:, i : i + constants["scale"]]
        i += constants["scale"]
        return cls(
            shape=shape,
            expression=expression,
            rotation=rotation,
            jaw=jaw,
            eyeballs=eyeballs,
            neck=neck,
            translation=translation,
            scale=scale,
        )

    def to_3dmm_tensor(self):
        """Concatenate groups back to the wire format.

        Concat order (reference ``head_info.py:95-107``): shape, expression,
        **rotation, jaw**, eyeballs, neck, translation, scale.
        """
        parts = [
            self.shape,
            self.expression,
            self.rotation,
            self.jaw,
            self.eyeballs,
            self.neck,
            self.translation,
            self.scale,
        ]
        first = self.shape
        if isinstance(first, np.ndarray):
            return np.concatenate(parts, axis=1)
        import jax.numpy as jnp

        return jnp.concatenate(parts, axis=1)


@dataclasses.dataclass
class HeadMetadata:
    """Per-head detection output (reference ``head_info.py:24-30``)."""

    bbox: Bbox
    score: float
    flame_params: FlameParams
    vertices_3d: np.ndarray
    head_pose: RPY
