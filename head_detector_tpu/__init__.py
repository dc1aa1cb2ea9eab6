"""head_detector_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of VGGHeads.

A single-shot multi-head 3D head detector: one forward pass over an RGB image
produces, for every human head, a bounding box, a confidence score, and a full
FLAME 3DMM parameter vector (413 floats) from which a 5,023-vertex 3D head
mesh is decoded.

Public API mirrors the reference ``head_detector`` package
(reference: /root/reference/head_detector/detector.py) but the whole compute
path — letterbox preprocess, YOLO-NAS-style conv backbone, detection decode,
NMS, and FLAME blendshape/pose decoding — runs as fused XLA/Pallas programs
on TPU.
"""

from head_detector_tpu.head_info import (
    Bbox,
    RPY,
    FLAME_CONSTS,
    FlameParams,
    HeadMetadata,
)
from head_detector_tpu.flame import (
    FlameModel,
    flame_vertices,
    fused_project_vertices,
    reproject_spatial_vertices,
)

__version__ = "0.1.0"

_LAZY = {
    "HeadDetector": "head_detector_tpu.detector",
    "PredictionResult": "head_detector_tpu.detection_result",
    "PNCCProcessor": "head_detector_tpu.pncc",
    "YoloHeadsPostPredictionCallback": "head_detector_tpu.post_prediction",
    "FaceMeshPredictor": "head_detector_tpu.dad_teacher",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name])
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "Bbox",
    "RPY",
    "FLAME_CONSTS",
    "FlameParams",
    "HeadMetadata",
    "FlameModel",
    "flame_vertices",
    "fused_project_vertices",
    "reproject_spatial_vertices",
    "HeadDetector",
    "PredictionResult",
]
