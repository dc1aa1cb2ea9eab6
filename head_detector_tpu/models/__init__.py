"""Model zoo: YoloHeads N/S/M/L — TPU-native flax implementations."""

from head_detector_tpu.models.presets import (
    ArchCfg,
    HeadCfg,
    NeckStageCfg,
    StageCfg,
    PRESETS,
    get_arch,
)
from head_detector_tpu.models.yolo_heads import (
    YoloHeads,
    build_model,
    init_model,
    forward,
    param_count,
)
from head_detector_tpu.models.heads import DecodedPredictions, RawOutputs, make_anchors

__all__ = [
    "ArchCfg",
    "HeadCfg",
    "NeckStageCfg",
    "StageCfg",
    "PRESETS",
    "get_arch",
    "YoloHeads",
    "build_model",
    "init_model",
    "forward",
    "param_count",
    "DecodedPredictions",
    "RawOutputs",
    "make_anchors",
]
