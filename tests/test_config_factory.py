"""Config system, data factory filters, teacher annotation round trip."""

import numpy as np
import pytest

from head_detector_tpu.config import load_config, run_config_from_dict
from head_detector_tpu.data_factory.binary_detector import Box, fliplr_boxes
from head_detector_tpu.data_factory.filter_pipeline import (
    DetectorFilter,
    StabilityMetric,
    VerticalCutFilter,
)

CONFIG = "head_detector_tpu/configs/yolo_heads_l.yaml"


def test_config_composition_and_overrides():
    cfg = load_config(CONFIG, ["training_hyperparams.initial_lr=1e-4"])
    assert cfg["architecture"] == "yolo_heads_l"
    assert cfg["training_hyperparams"]["initial_lr"] == pytest.approx(1e-4)
    # composed defaults present
    assert cfg["training_hyperparams"]["criterion_params"]["iou_loss_weight"] == 2.0
    assert cfg["dataset_params"]["image_size"] == 640


def test_run_config_mapping():
    cfg = load_config(CONFIG)
    rc = run_config_from_dict(cfg)
    assert rc.arch == "yolo_heads_l"
    assert rc.train.initial_lr == pytest.approx(5e-5)  # L recipe override
    assert rc.train.ema_decay == pytest.approx(0.9997)
    assert rc.loss.dfl_loss_weight == pytest.approx(0.01)
    assert len(rc.loss.indexes_subset) == 2470  # head subset


def test_box_iou_and_flip():
    a = Box(0, 0, 10, 10)
    b = Box(5, 0, 15, 10)
    assert a.iou(b) == pytest.approx(50 / 150)
    (f,) = fliplr_boxes([a], (20, 100, 3))
    assert (f.x1, f.x2) == (90, 100)


class _FakeDetector:
    """Deterministic box oracle keyed on the image's first pixel."""

    def __init__(self, boxes_by_width):
        self.boxes_by_width = boxes_by_width

    def __call__(self, image):
        return list(self.boxes_by_width.get(image.shape[1], []))


def test_detector_filter_flip_consistency():
    det = _FakeDetector({100: [Box(10, 10, 30, 30)]})
    assert DetectorFilter(det)(np.zeros((50, 100, 3), np.uint8)) is False
    det_empty = _FakeDetector({})
    assert DetectorFilter(det_empty)(np.zeros((50, 100, 3), np.uint8)) is True


def test_vertical_cut_filter_detects_split_inconsistency():
    # full image: 2 boxes; left half: 1; right half: 0 -> inconsistent
    det = _FakeDetector(
        {
            100: [Box(5, 5, 20, 20), Box(80, 5, 95, 20)],
            50: [Box(5, 5, 20, 20)],
        }
    )
    # right-half width is also 50 -> returns the same single box; 1+1 == 2 ok
    assert VerticalCutFilter(det)(np.zeros((50, 100, 3), np.uint8)) is False


def test_stability_metric_perfect_for_symmetric_boxes():
    det = _FakeDetector({100: [Box(40, 10, 60, 30)]})  # symmetric around center
    count, iou = StabilityMetric(det)(np.zeros((50, 100, 3), np.uint8))
    assert count == 1 and iou == pytest.approx(1.0)


def test_model_params_to_dad_roundtrip():
    import jax.numpy as jnp

    from head_detector_tpu.dad_teacher import model_params_to_dad
    from head_detector_tpu.flame import FlameModel, reproject_spatial_vertices
    from head_detector_tpu.train.dataset import decode_dad_annotation

    flame = FlameModel.from_assets()
    rng = np.random.RandomState(0)
    params = rng.randn(413).astype(np.float32) * 0.1
    params[409:411] = 120.0  # translation in crop pixels
    params[411] = 0.0
    params[412] = 50.0  # scale in crop pixels

    # model-convention projection
    _, _, proj_model = reproject_spatial_vertices(
        flame, jnp.asarray(params[None]), to_2d=True
    )
    # DAD-convention decode of the converted params
    dad = model_params_to_dad(params)
    _, proj_dad, _ = decode_dad_annotation(flame, jnp.asarray(dad[None]))

    np.testing.assert_allclose(
        np.asarray(proj_dad[0]), np.asarray(proj_model[0]), atol=1e-2
    )
