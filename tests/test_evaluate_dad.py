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


def test_rendered_dad_gt_conventions_oracle(tmp_path):
    """The stand-in DAD test set (tools/render_dad_testset.py) must score
    ~perfectly under the real DadEvaluator when the predictor is an oracle
    returning the GT itself in the predictor's output frame — this pins the
    frame conventions (model_view pre-rotation, vertices_3d world frame,
    landmark projection) to the evaluator's expectations."""
    import cv2

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from render_dad_testset import build_scene

    from head_detector_tpu.assets_io import load_flame_assets
    from head_detector_tpu.evaluation.dad_metrics import get_68_landmark_indices
    from head_detector_tpu.flame import FlameModel, flame_vertices
    from head_detector_tpu.head_info import FLAME_CONSTS, FlameParams
    from head_detector_tpu.post_prediction import YoloHeadsPredictions

    flame = FlameModel.from_assets()
    assets = load_flame_assets()
    lmk68 = get_68_landmark_indices()

    def flame_decode(params):
        p = FlameParams.from_3dmm(jnp.asarray(params), FLAME_CONSTS)
        return np.asarray(flame_vertices(flame, p, zero_rot=True))

    rng = np.random.RandomState(42)
    image, cfgs = build_scene(
        rng, flame_decode,
        np.ascontiguousarray(assets.faces, np.int32),
        np.ones((assets.v_template.shape[0], 3), np.float32),
        lmk68, 256, max_heads=1,
    )
    path = str(tmp_path / "s.png")
    cv2.imwrite(path, cv2.cvtColor(image, cv2.COLOR_RGB2BGR))
    cfg = dict(cfgs[0])
    cfg["image_path"] = "s.png"
    sample = DadSample.from_config(cfg, str(tmp_path))

    # oracle: reconstruct the prediction the perfect model would emit —
    # image-frame projected vertices (z = projection depth, not negated)
    world = np.asarray(cfg["vertices_3d"])
    abs_v = world * np.array([1.0, -1.0, -1.0])  # world -> image frame
    params = np.asarray(cfg["_params_dad"], np.float32)

    class Oracle:
        def __call__(self, img):
            x1, y1 = abs_v[:, 0].min(), abs_v[:, 1].min()
            x2, y2 = abs_v[:, 0].max(), abs_v[:, 1].max()
            return YoloHeadsPredictions(
                scores=np.array([1.0]),
                bboxes_xyxy=np.array([[x1, y1, x2, y2]]),
                mm_params=params[None],
                predicted_3d_vertices=abs_v[None],
                predicted_2d_vertices=abs_v[None, :, :2],
            )

    result = DadEvaluator([sample], Oracle())()
    assert result["nme_2d"] < 1e-6
    assert result["rot_error"] < 1e-5
    assert result["angle_error"] < 1e-3
    assert result["z_n"] == 1.0
    assert result["chamfer"] < 1e-6
