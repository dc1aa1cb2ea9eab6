from head_detector_tpu.ops.rotation import (
    rot_mat_from_6dof,
    rodrigues,
    calculate_rpy,
    rotation_mats_to_rpy,
    limit_angle,
)
from head_detector_tpu.ops.nms import batched_nms, NMSResult
from head_detector_tpu.ops.letterbox import letterbox, LetterboxSpec

__all__ = [
    "rot_mat_from_6dof",
    "rodrigues",
    "calculate_rpy",
    "rotation_mats_to_rpy",
    "limit_angle",
    "batched_nms",
    "NMSResult",
    "letterbox",
    "LetterboxSpec",
]
