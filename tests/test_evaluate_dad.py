"""evaluate_dad end-to-end on synthetic samples (no external data/env).

Exercises the full DAD protocol — eval predictor, IoU head selection, the
shipped iBUG-68 landmark extraction, NME-2D, Z_n, rot/angle errors,
Procrustes-aligned chamfer, attribute breakdown — with a tiny model on a
synthetic sample whose GT fields follow the documented DadSample schema.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from head_detector_tpu.evaluation.evaluate_dad import DadEvaluator, DadSample
from head_detector_tpu.evaluation.predictor import EvalPredictor
from head_detector_tpu.models import build_model, init_model

from test_model import TINY


@pytest.fixture(scope="module")
def predictor():
    model = build_model(TINY)
    variables = init_model(model, jax.random.PRNGKey(0), (64, 64))
    return EvalPredictor(
        model_name=TINY, variables=variables, image_size=64,
        confidence_threshold=1e-6, nms_iou_threshold=0.5,
        post_nms_max_predictions=5,
    )


def _synthetic_sample(tmp_path, rng, idx):
    import cv2

    path = str(tmp_path / f"img{idx}.jpg")
    cv2.imwrite(path, rng.randint(0, 255, (60, 64, 3), np.uint8))
    mv = np.eye(4)
    mv[:3, :3] = np.diag([1.0, -1.0, -1.0])  # cancels the ROT_180 pre-rotation
    return DadSample(
        image_path=path,
        bbox=[10.0, 10.0, 30.0, 30.0],
        model_view_matrix=mv,
        landmarks_68_2d=rng.rand(68, 2) * 60,
        vertices_3d=rng.randn(5023, 3) * 0.1,
        attributes={"quality": "good", "gender": "female", "age": "30-50"},
    )


def test_dad_evaluator_end_to_end(predictor, tmp_path):
    rng = np.random.RandomState(5)
    samples = [_synthetic_sample(tmp_path, rng, i) for i in range(2)]
    result = DadEvaluator(samples, predictor)()
    for key in ("nme_2d", "z_n", "rot_error", "angle_error", "chamfer"):
        assert key in result
        assert np.isfinite(result[key]), key
    # protocol ranges: z_n is a [0, 1] accuracy, angle_error wrapped at 90
    assert 0.0 <= result["z_n"] <= 1.0
    assert 0.0 <= result["angle_error"] <= 90.0


def test_dad_sample_schema_roundtrip(tmp_path):
    cfg = {
        "image_path": "x.jpg",
        "bbox": [1, 2, 3, 4],
        "model_view_matrix": np.eye(4).tolist(),
        "landmarks_68_2d": np.zeros((68, 2)).tolist(),
        "vertices_3d": np.zeros((5023, 3)).tolist(),
        "attributes": {"pose": "frontal"},
    }
    s = DadSample.from_config(cfg, str(tmp_path))
    assert s.image_path == os.path.join(str(tmp_path), "x.jpg")
    assert s.model_view_matrix.shape == (4, 4)
    assert s.attributes["pose"] == "frontal"
