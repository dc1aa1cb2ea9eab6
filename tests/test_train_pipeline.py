"""Data pipeline + trainer runner + checkpoint round-trip tests."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from head_detector_tpu.flame import FlameModel
from head_detector_tpu.models import build_model, init_model
from head_detector_tpu.train import LossConfig, TrainConfig, create_train_state, make_train_step
from head_detector_tpu.train.checkpoint import CheckpointManager, restore_key_matching
from head_detector_tpu.train.dataset import (
    DAD3DHeadsDataset,
    SyntheticHeadsDataset,
    collate_samples,
    decode_dad_annotation,
    flat_collate_tensors_with_batch_index,
    undo_flat_collate_tensors_with_batch_index,
)
from head_detector_tpu.train.mesh_sample import MeshEstimationSample
from head_detector_tpu.train.runner import RunConfig, Trainer
from head_detector_tpu.train.transforms import (
    MeshLongestMaxSize,
    MeshPadIfNeeded,
    MeshRandomAffineTransform,
    PhotometricAugs,
    default_val_transforms,
)
from test_model import TINY


@pytest.fixture(scope="module")
def flame():
    return FlameModel.from_assets()


# ----------------------------- transforms ----------------------------- #


def _toy_sample(h=100, w=80, n=2):
    rng = np.random.RandomState(0)
    return MeshEstimationSample(
        image=rng.randint(0, 255, (h, w, 3), dtype=np.uint8),
        vertices_2d=np.concatenate(
            [rng.rand(n, 10, 2) * [w, h], np.ones((n, 10, 1))], -1
        ).astype(np.float32),
        vertices_3d=rng.randn(n, 10, 3).astype(np.float32),
        rotation_matrix=np.tile(np.eye(3, dtype=np.float32), (n, 1, 1)),
        areas=np.array([100.0, 200.0], np.float32),
        bboxes_xywh=np.array([[5, 5, 20, 20], [30, 40, 25, 30]], np.float32),
        is_crowd=np.zeros(n, bool),
    )


def test_longest_max_size_and_pad():
    s = _toy_sample(h=100, w=80)
    s = MeshLongestMaxSize(64, 64).apply_to_sample(s)
    assert max(s.image.shape[:2]) == 64
    s = MeshPadIfNeeded(64, 64, 127, "center").apply_to_sample(s)
    assert s.image.shape[:2] == (64, 64)
    # keypoints stay within the padded canvas
    assert s.vertices_2d[..., 0].max() <= 64
    assert s.vertices_2d[..., 1].max() <= 64


def test_random_affine_transforms_keypoints_with_image():
    rng = np.random.RandomState(3)
    s = _toy_sample()
    before_rot = s.rotation_matrix.copy()
    t = MeshRandomAffineTransform(prob=1.0, max_rotation=30, min_scale=0.9,
                                  max_scale=1.1, max_translate=0.05, rng=rng)
    out = t.apply_to_sample(s)
    assert out.image.shape == (100, 80, 3)
    # rotation matrices must have been updated in-plane (still orthonormal)
    rtr = out.rotation_matrix @ np.swapaxes(out.rotation_matrix, -1, -2)
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (2, 1, 1)), atol=1e-5)
    assert not np.allclose(out.rotation_matrix, before_rot)


def test_photometric_augs_preserve_shape_dtype():
    rng = np.random.RandomState(0)
    augs = PhotometricAugs(rng)
    img = rng.randint(0, 255, (64, 48, 3), dtype=np.uint8)
    for _ in range(20):
        out = augs(img)
        assert out.shape == img.shape and out.dtype == np.uint8


# ----------------------------- dataset ----------------------------- #


def test_dad_dataset_reads_npz_layout(tmp_path, flame):
    import cv2

    root = tmp_path / "train"
    (root / "images").mkdir(parents=True)
    (root / "annotations").mkdir()
    rng = np.random.RandomState(0)
    for name in ("a", "b", "c"):
        img = rng.randint(0, 255, (96, 96, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "images" / f"{name}.jpg"), img)
        n = 2
        np.savez(
            root / "annotations" / f"{name}.npz",
            bbox=rng.randint(0, 40, (n, 4)),
            extended_bbox=rng.randint(0, 40, (n, 4)),
            **{"3dmm_params": rng.randn(n, 1, 413).astype(np.float32) * 0.1},
        )
    # exclusion list drops one file
    (root / "files.txt").write_text("c.jpg\n")

    ds = DAD3DHeadsDataset(
        str(tmp_path), splits=["train"], flame_model=flame,
        transforms=default_val_transforms(64), min_bbox_area=0.0,
    )
    assert len(ds) == 2
    sample = ds[0]
    assert sample.image.shape == (64, 64, 3)
    assert sample.vertices_3d.shape[1:] == (flame.num_vertices, 3)
    assert sample.rotation_matrix.shape[1:] == (3, 3)


def test_decode_dad_annotation_convention(flame):
    """scale+1 clamp and (v+1)/2*256 projection (dataset_parsing.py:170-189)."""
    params = np.zeros((1, 413), np.float32)
    params[0, 403] = 1.0  # rotation 6dof -> identity
    params[0, 407] = 1.0
    params[0, 412] = 0.0  # scale: (0 + 1) = 1
    verts, proj, rot = decode_dad_annotation(flame, jnp.asarray(params))
    np.testing.assert_allclose(np.asarray(rot[0]), np.eye(3), atol=1e-6)
    v = np.asarray(verts[0])
    p = np.asarray(proj[0])
    np.testing.assert_allclose(p, (v[:, :2] + 1.0) / 2.0 * 256.0, atol=1e-3)


def test_flat_collate_roundtrip():
    tensors = [np.random.rand(2, 5, 3), np.random.rand(1, 5, 3)]
    flat = flat_collate_tensors_with_batch_index(tensors)
    assert flat.shape == (3, 5, 4)
    back = undo_flat_collate_tensors_with_batch_index(flat, 2)
    np.testing.assert_allclose(back[0], tensors[0])
    np.testing.assert_allclose(back[1], tensors[1])


def test_collate_samples_shapes(flame):
    ds = SyntheticHeadsDataset(flame, image_size=64, length=4, max_heads=2)
    images, targets = collate_samples([ds[0], ds[1]], max_boxes=3)
    assert images.shape == (2, 64, 64, 3)
    assert targets.gt_bboxes.shape == (2, 3, 4)
    assert targets.gt_vertices_3d.shape == (2, 3, flame.num_vertices, 3)
    assert targets.pad_gt_mask.sum() >= 2


# ----------------------------- overfit + runner ----------------------------- #


def test_single_batch_overfit_decreases_loss(flame):
    model = build_model(TINY)
    variables = init_model(model, jax.random.PRNGKey(0), (64, 64))
    tcfg = TrainConfig(max_steps=60, lr_warmup_steps=5, initial_lr=3e-3, ema=False)
    lcfg = LossConfig(max_positives=32)
    state = create_train_state(model, variables, tcfg)
    step = jax.jit(make_train_step(model, flame, lcfg, tcfg))

    ds = SyntheticHeadsDataset(flame, image_size=64, length=2, max_heads=1)
    images, targets = collate_samples([ds[0], ds[1]], max_boxes=2)
    imgs = jnp.asarray(images, jnp.float32) / 255.0

    losses = []
    for _ in range(30):
        state, comps = step(state, imgs, targets)
        losses.append(float(comps["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"no learning: {losses[0]:.3f} -> {losses[-1]:.3f}"


def test_runner_epoch_and_resume(tmp_path, flame):
    ds = SyntheticHeadsDataset(flame, image_size=64, length=8, max_heads=1)
    cfg = RunConfig(
        arch=TINY,
        image_size=64,
        batch_size=2,
        max_epochs=1,
        steps_per_epoch=2,
        max_gt_boxes=2,
        num_workers=2,
        mixed_precision=False,
        ckpt_dir=str(tmp_path / "ckpt"),
        log_every=1,
        loss=LossConfig(max_positives=16),
        train=TrainConfig(lr_warmup_steps=1, ema=True),
    )
    trainer = Trainer(cfg, ds, val_dataset=None)
    trainer.train()
    assert int(trainer.state.step) == 2
    assert trainer.ckpt.latest_step() == 2

    # resume continues from the saved step
    cfg2 = dataclasses.replace(cfg, resume=True, max_epochs=2)
    trainer2 = Trainer(cfg2, ds, val_dataset=None)
    assert int(trainer2.state.step) == 2


def test_key_matching_restore():
    a = {"x": {"kernel": np.zeros((3, 3))}, "y": {"b": np.zeros(4)}}
    b = {"x": {"kernel": np.ones((3, 3))}, "y": {"b": np.ones(5)}, "z": np.ones(2)}
    merged, matched, total = restore_key_matching(a, b)
    assert matched == 1 and total == 2
    np.testing.assert_allclose(merged["x"]["kernel"], 1.0)  # matched
    np.testing.assert_allclose(merged["y"]["b"], 0.0)  # shape mismatch -> kept


def test_check_dataset_sweep(flame):
    """The check_dataset CLI helper (reference check_dataset.py parity):
    clean synthetic samples pass; a corrupted sample is reported."""
    from head_detector_tpu.train.check_dataset import check_dataset

    ds = SyntheticHeadsDataset(flame, image_size=64, length=4, max_heads=2)
    report = check_dataset(ds, limit=4)
    assert report["checked"] == 4 and not report["problems"]

    class Corrupt:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            s = ds[0]
            if len(s.bboxes_xywh):
                s.bboxes_xywh[:, 2:] = 0.1  # area < 1
            return s

    report = check_dataset(Corrupt())
    assert report["problems"], "corrupted bbox areas must be flagged"


def test_compact_wire_matches_full_precision(flame):
    """uint8-image + f16-vertex wire format: the train step restores f32 on
    device; loss must match the full-f32 wire to GT-quantization tolerance."""
    model = build_model(TINY)
    variables = init_model(model, jax.random.PRNGKey(0), (64, 64))
    tcfg = TrainConfig(max_steps=10, lr_warmup_steps=2, ema=False)
    lcfg = LossConfig(max_positives=16)
    step = jax.jit(make_train_step(model, flame, lcfg, tcfg))

    ds = SyntheticHeadsDataset(flame, image_size=64, length=2, max_heads=1)
    samples = [ds[0], ds[1]]
    images_f, targets_f = collate_samples(samples, max_boxes=2)
    images_c, targets_c = collate_samples(samples, max_boxes=2,
                                          wire_dtype=np.float16)

    s1 = create_train_state(model, variables, tcfg)
    s2 = create_train_state(model, variables, tcfg)
    _, comps_full = step(s1, jnp.asarray(images_f, jnp.float32) / 255.0,
                         targets_f)
    _, comps_compact = step(s2, jnp.asarray(images_c), targets_c)

    lf, lc = float(comps_full["loss"]), float(comps_compact["loss"])
    assert np.isfinite(lc)
    assert abs(lf - lc) < 0.02 * max(abs(lf), 1.0), (lf, lc)


def test_checkpoint_metrics_history_and_average_best(tmp_path):
    import numpy as np

    from head_detector_tpu.train.checkpoint import average_trees

    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=3)
    trees = {}
    # four saves with NME 5, 3, 4, 6 — max_to_keep=3 drops step 1 (the best!)
    for step, nme in [(1, 5.0), (2, 3.0), (3, 4.0), (4, 6.0)]:
        tree = {"params": {"w": np.full((2,), float(step), np.float32)},
                "step": np.asarray(step)}
        trees[step] = tree
        mgr.save(step, tree, metrics={"KeypointsNME": nme})

    hist = mgr.metrics_history()
    assert [r["step"] for r in hist] == [1, 2, 3, 4]
    assert hist[1]["KeypointsNME"] == 3.0
    # retention: only the last 3 survive on disk; best_steps respects that
    assert mgr.best_steps(2) == [2, 3]
    assert mgr.best_steps(10) == [2, 3, 4]
    mgr.close()

    avg = average_trees([trees[2], trees[3]])
    np.testing.assert_allclose(avg["params"]["w"], [2.5, 2.5])
    assert int(avg["step"]) == 2  # non-float leaves: first tree wins


def test_prefetcher_surfaces_dataset_errors():
    """A corrupt sample must raise in the consumer, not hang the campaign
    (the producer thread used to die without enqueuing the sentinel)."""
    from head_detector_tpu.train.runner import _Prefetcher

    class _Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise RuntimeError("corrupt sample")

    loader = _Prefetcher(_Bad(), batch_size=4, max_boxes=2, num_workers=2,
                         collate_fn=lambda s, m, wire_dtype=None: s)
    import pytest

    with pytest.raises(RuntimeError, match="corrupt sample"):
        next(iter(loader))


def test_prefetcher_early_break_stops_producer():
    """Breaking out of the loader must terminate the producer thread instead
    of leaking it blocked on a full queue."""
    import threading
    import time

    from head_detector_tpu.train.runner import _Prefetcher

    class _DS:
        def __len__(self):
            return 256

        def __getitem__(self, i):
            return i

    before = threading.active_count()
    loader = _Prefetcher(_DS(), batch_size=4, max_boxes=2, num_workers=2,
                         collate_fn=lambda s, m, wire_dtype=None: s)
    for batch in loader:
        break  # steps_per_epoch-style early exit
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= before, "producer thread leaked"
