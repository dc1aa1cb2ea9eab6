"""End-to-end drives of the benchmark evaluators on synthetic fixtures.

Each test fabricates the benchmark's on-disk layout (AFLW2000 .mat, BIWI
pose.txt trees, FDDB label.txt, WIDER split files), runs the REAL evaluator
with the tiny model's EvalPredictor, and checks the protocol produces finite
metrics of the right shape — the harness equivalent of the reference's
evaluation scripts running minus downloadable datasets.
"""

import os

import cv2
import jax
import numpy as np
import pytest

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


def _img(rng):
    return rng.randint(0, 255, (64, 64, 3), np.uint8)


def test_evaluate_aflw_end_to_end(predictor, tmp_path, rng):
    import scipy.io

    for i in range(2):
        cv2.imwrite(str(tmp_path / f"image{i:05d}.jpg"), _img(rng))
        pose = np.zeros((1, 7))
        pose[0, :3] = np.deg2rad([10.0, -5.0, 3.0])
        scipy.io.savemat(
            str(tmp_path / f"image{i:05d}.mat"),
            {"Pose_Para": pose, "pt3d_68": rng.rand(3, 68) * 60},
        )
    # one sample beyond the 99-degree skip threshold must be excluded
    skip_pose = np.zeros((1, 7))
    skip_pose[0, :3] = np.deg2rad([120.0, 0.0, 0.0])
    cv2.imwrite(str(tmp_path / "image99999.jpg"), _img(rng))
    scipy.io.savemat(
        str(tmp_path / "image99999.mat"),
        {"Pose_Para": skip_pose, "pt3d_68": rng.rand(3, 68) * 60},
    )

    from head_detector_tpu.evaluation.evaluate_pose import AFLWEvaluator

    result = AFLWEvaluator(str(tmp_path), predictor)()
    for k in ("roll_mae", "pitch_mae", "yaw_mae", "mean_mae"):
        assert np.isfinite(result[k])
    assert result["evaluated"] == 2  # the >99-degree sample was skipped


def test_evaluate_biwi_end_to_end(predictor, tmp_path, rng):
    d = tmp_path / "01"
    d.mkdir()
    for i in range(2):
        cv2.imwrite(str(d / f"frame_{i:05d}_rgb.png"), _img(rng))
        pose = np.vstack([np.eye(3), [10.0, 20.0, 1000.0]])
        np.savetxt(str(d / f"frame_{i:05d}_pose.txt"), pose)

    from head_detector_tpu.evaluation.evaluate_pose import BIWIEvaluator

    result = BIWIEvaluator(str(tmp_path), predictor)()
    for k in ("roll_mae", "pitch_mae", "yaw_mae", "mean_mae"):
        assert np.isfinite(result[k])


def test_evaluate_fddb_end_to_end(predictor, tmp_path, rng):
    (tmp_path / "images" / "v").mkdir(parents=True)
    lines = []
    for i in range(2):
        name = f"v/{i}.jpg"
        cv2.imwrite(str(tmp_path / "images" / name), _img(rng))
        lines += [f"# {name}", "5 5 30 30", "35 35 60 60"]
    (tmp_path / "label.txt").write_text("\n".join(lines) + "\n")

    from head_detector_tpu.evaluation.evaluate_fddb import evaluate_fddb

    result = evaluate_fddb(str(tmp_path), predictor)
    assert set(result) >= {"AP", "AP50"}
    assert 0.0 <= result["AP"] <= 1.0


def test_evaluate_wider_end_to_end(predictor, tmp_path, rng):
    split = tmp_path / "wider_face_split"
    split.mkdir()
    event = "0--Parade"
    img_dir = tmp_path / "WIDER_val" / "images" / event
    img_dir.mkdir(parents=True)
    lines = []
    for i in range(2):
        name = f"{event}/{i}.jpg"
        cv2.imwrite(str(img_dir / f"{i}.jpg"), _img(rng))
        lines += [name, "1", "10 10 25 25 0 0 0 0 0 0"]
    # a zero-box entry exercises the count==0 parser branch
    cv2.imwrite(str(img_dir / "empty.jpg"), _img(rng))
    lines += [f"{event}/empty.jpg", "0", "0 0 0 0 0 0 0 0 0 0"]
    (split / "wider_face_val_bbx_gt.txt").write_text("\n".join(lines) + "\n")

    from head_detector_tpu.evaluation.evaluate_wider import evaluate_wider

    result = evaluate_wider(
        str(tmp_path), predictor, save_dir=str(tmp_path / "out")
    )
    assert 0.0 <= result["AP"] <= 1.0
    # official submission dump: one txt per image under the event dir
    assert os.path.isfile(tmp_path / "out" / event / "0.txt")
