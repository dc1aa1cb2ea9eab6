"""Evaluation harness: DAD-3DHeads / AFLW2000+BIWI / FDDB / WIDER protocols.

Reference: ``yolo_head_training/evaluation/`` (SURVEY.md §2.4).  All metric
math is re-implemented natively (kaolin / pycocotools are unavailable):
chamfer + Procrustes in JAX/numpy, COCO-style AP in numpy.
"""

from head_detector_tpu.evaluation.predictor import EvalPredictor
from head_detector_tpu.evaluation.dad_metrics import (
    calc_zn,
    chamfer_distance,
    procrustes_align,
    rotation_frobenius_error,
    rotation_angle_error_deg,
    nme_2d,
)
from head_detector_tpu.evaluation.detection_ap import coco_map

__all__ = [
    "EvalPredictor",
    "calc_zn",
    "chamfer_distance",
    "procrustes_align",
    "rotation_frobenius_error",
    "rotation_angle_error_deg",
    "nme_2d",
    "coco_map",
]
