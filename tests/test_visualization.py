"""Extreme-batch visualization + TensorBoard logger."""

import os

import numpy as np

from head_detector_tpu.train.visualization import (
    ExtremeBatchVisualizationCallback,
    TensorBoardLogger,
)


def _batch(seed, n=2, s=48):
    rng = np.random.RandomState(seed)
    images = rng.randint(0, 255, (n, s, s, 3), np.uint8)
    gt = np.array([[[5, 5, 30, 30], [0, 0, 0, 0]]] * n, np.float32)
    mask = np.array([[1.0, 0.0]] * n, np.float32)
    kps = rng.rand(n, 2, 10, 3).astype(np.float32) * s
    return images, gt, mask, kps


def test_extreme_batch_tracks_max_loss_and_renders(tmp_path):
    cb = ExtremeBatchVisualizationCallback(str(tmp_path), freq=1)
    img_lo, gt, mask, kps = _batch(0)
    img_hi, _, _, _ = _batch(1)
    cb.update(1.0, img_lo, gt, mask, gt_keypoints=kps)
    cb.update(5.0, img_hi, gt, mask, gt_keypoints=kps)  # the extreme one
    cb.update(2.0, img_lo, gt, mask, gt_keypoints=kps)

    calls = {}

    def predict(images):
        calls["images"] = images
        n = len(images)
        return (
            np.tile(np.array([[6, 6, 28, 28]], np.float32), (n, 1, 1)),
            np.full((n, 1), 0.9, np.float32),
        )

    cb.on_epoch_end(0, predict_fn=predict)
    np.testing.assert_array_equal(calls["images"], img_hi)  # max-loss batch
    files = [f for f in os.listdir(tmp_path) if f.startswith("extreme_batch")]
    assert len(files) == 1
    # state resets for the next epoch
    assert cb._extreme is None


def test_extreme_batch_respects_frequency(tmp_path):
    cb = ExtremeBatchVisualizationCallback(str(tmp_path), freq=2)
    images, gt, mask, kps = _batch(2)
    cb.update(1.0, images, gt, mask, gt_keypoints=kps)
    cb.on_epoch_end(1)  # epoch 1 % 2 != 0 -> skipped
    assert not [f for f in os.listdir(tmp_path) if f.startswith("extreme_batch")]


def test_tensorboard_logger_writes_events(tmp_path):
    tb = TensorBoardLogger(str(tmp_path))
    tb.log_scalars({"loss": 1.0, "loss_cls": 0.5}, step=1, prefix="train/")
    tb.log_image("panel", np.zeros((8, 8, 3), np.uint8), 1)
    tb.close()
    assert any("tfevents" in f for f in os.listdir(tmp_path))
