"""Synthetic-data factory: detection-based auto-cleaning, pseudo-annotation,
pose conditioning, and (gated) SDXL generation.

Reference: ``data_generator/`` (SURVEY.md §2.6).  The detection-driven parts
(filters, pseudo-annotation, pose skeleton rendering) run natively on our
TPU detector; the diffusion/captioning/NER/safety models (SDXL, BLIP2,
GLiNER, SD safety checker) are external weights the bare environment cannot
host — those entry points exist with the same interfaces and raise actionable
errors until the weights/deps are supplied.
"""

from head_detector_tpu.data_factory.binary_detector import Box, HeadBoxDetector
from head_detector_tpu.data_factory.filter_pipeline import (
    DetectorFilter,
    FaceDetectorFilter,
    StabilityMetric,
    VerticalCutFilter,
    filter_data,
)
from head_detector_tpu.data_factory.mesh_dataset import annotate_folder

__all__ = [
    "Box",
    "HeadBoxDetector",
    "DetectorFilter",
    "FaceDetectorFilter",
    "StabilityMetric",
    "VerticalCutFilter",
    "filter_data",
    "annotate_folder",
]
