"""Assigner + loss + sharded train step tests (tiny arch, CPU-fast)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from head_detector_tpu.flame import FlameModel, reproject_spatial_vertices
from head_detector_tpu.models import build_model, init_model
from head_detector_tpu.train import (
    LossConfig,
    Targets,
    TrainConfig,
    create_train_state,
    make_train_step,
    task_aligned_assigner,
    yolo_heads_loss,
)
from head_detector_tpu.train.trainer import make_data_mesh, shard_train_step
from test_model import TINY

IMG = 64
N_GT = 3  # padded gt slots per image


@pytest.fixture(scope="module")
def flame():
    return FlameModel.from_assets()


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_model(TINY)
    variables = init_model(model, jax.random.PRNGKey(0), (IMG, IMG))
    return model, variables


def make_targets(flame, batch: int, seed: int = 0, empty: bool = False) -> Targets:
    """Synthetic GT: one real head per image decoded through the real FLAME."""
    rng = np.random.RandomState(seed)
    v = flame.num_vertices
    gt_bboxes = np.zeros((batch, N_GT, 4), np.float32)
    gt_v2d = np.zeros((batch, N_GT, v, 3), np.float32)
    gt_v3d = np.zeros((batch, N_GT, v, 3), np.float32)
    gt_rot = np.tile(np.eye(3, dtype=np.float32), (batch, N_GT, 1, 1))
    mask = np.zeros((batch, N_GT, 1), np.float32)

    if not empty:
        params = rng.randn(batch, 413).astype(np.float32) * 0.1
        params[:, 409:411] = IMG / 2  # translation near image center
        params[:, 412] = 30.0  # scale in pixels
        verts, rot, proj = reproject_spatial_vertices(
            flame, jnp.asarray(params), to_2d=False
        )
        verts, rot, proj = map(np.asarray, (verts, rot, proj))
        for i in range(batch):
            x1, y1 = proj[i, :, 0].min(), proj[i, :, 1].min()
            x2, y2 = proj[i, :, 0].max(), proj[i, :, 1].max()
            gt_bboxes[i, 0] = [x1, y1, x2, y2]
            gt_v2d[i, 0, :, :2] = proj[i, :, :2]
            gt_v2d[i, 0, :, 2] = 1.0
            gt_v3d[i, 0] = verts[i]
            gt_rot[i, 0] = rot[i]
            mask[i, 0] = 1.0
    return Targets(
        gt_bboxes=jnp.asarray(gt_bboxes),
        gt_vertices_2d=jnp.asarray(gt_v2d),
        gt_vertices_3d=jnp.asarray(gt_v3d),
        gt_rotations=jnp.asarray(gt_rot),
        pad_gt_mask=jnp.asarray(mask),
    )


def test_assigner_basics():
    # 8x8 grid of stride-8 anchors, one gt box covering a 3x3 cell patch
    xs = (np.arange(8) + 0.5) * 8
    pts = np.stack(np.meshgrid(xs, xs, indexing="xy"), -1).reshape(-1, 2)
    anchor_points = jnp.asarray(pts, jnp.float32)
    l = 64
    gt = jnp.asarray([[[8.0, 8.0, 32.0, 32.0]]])  # one box
    pad = jnp.ones((1, 1, 1))
    pred_boxes = jnp.tile(anchor_points, (1, 1, 2)).reshape(1, l, 4) + jnp.asarray(
        [-6, -6, 6, 6], jnp.float32
    )
    pred_scores = jnp.full((1, l, 1), 0.5)

    res = task_aligned_assigner(pred_scores, pred_boxes, anchor_points, gt, pad)
    fg = np.asarray(res.fg_mask[0])
    inside = (
        (pts[:, 0] > 8) & (pts[:, 0] < 32) & (pts[:, 1] > 8) & (pts[:, 1] < 32)
    )
    # every positive anchor center lies inside the gt box; at most topk
    assert fg.sum() > 0
    assert np.all(~fg | inside)
    assert fg.sum() <= 13
    # assigned box is the gt box for positives
    assigned_fg = np.asarray(res.assigned_bboxes[0])[fg]
    np.testing.assert_allclose(
        assigned_fg, np.tile(np.asarray(gt[0, 0]), (assigned_fg.shape[0], 1)), atol=1e-6
    )
    # scores rescaled to <= max IoU
    assert float(res.assigned_scores.max()) <= 1.0


def test_assigner_empty_gt():
    anchor_points = jnp.asarray([[4.0, 4.0], [12.0, 4.0]])
    res = task_aligned_assigner(
        jnp.full((1, 2, 1), 0.5),
        jnp.zeros((1, 2, 4)),
        anchor_points,
        jnp.zeros((1, 2, 4)),
        jnp.zeros((1, 2, 1)),
    )
    assert not bool(res.fg_mask.any())
    assert float(res.assigned_scores.sum()) == 0.0


@pytest.fixture(scope="module")
def loss_cfg():
    return LossConfig(max_positives=32)


def test_loss_finite_and_components(model_and_vars, flame, loss_cfg):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.RandomState(0).rand(2, IMG, IMG, 3), jnp.float32)
    (_, raw), _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    targets = make_targets(flame, 2)
    total, comps = yolo_heads_loss(flame, raw, targets, loss_cfg)
    assert np.isfinite(float(total))
    for name in (
        "loss_3d_rotation",
        "loss_cls",
        "loss_iou",
        "loss_dfl",
        "loss_pose_reg",
        "loss_3d_vertices",
        "loss",
    ):
        assert np.isfinite(float(comps[name])), name
    assert int(comps["num_pos"]) > 0
    assert int(comps["num_pos_dropped"]) == 0


def test_loss_empty_batch_is_cls_only(model_and_vars, flame, loss_cfg):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.RandomState(1).rand(2, IMG, IMG, 3), jnp.float32)
    (_, raw), _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    targets = make_targets(flame, 2, empty=True)
    total, comps = yolo_heads_loss(flame, raw, targets, loss_cfg)
    assert np.isfinite(float(total))
    assert float(comps["loss_iou"]) == 0.0
    assert float(comps["loss_dfl"]) == 0.0
    assert float(comps["loss_pose_reg"]) == 0.0
    assert float(comps["loss_3d_vertices"]) == 0.0
    assert float(comps["loss_3d_rotation"]) == 0.0
    assert float(comps["loss_cls"]) > 0.0


def test_train_step_updates_and_ema(model_and_vars, flame, loss_cfg):
    model, variables = model_and_vars
    tcfg = TrainConfig(max_steps=100, lr_warmup_steps=2, initial_lr=1e-4)
    state = create_train_state(model, variables, tcfg)
    step = jax.jit(make_train_step(model, flame, loss_cfg, tcfg))

    x = jnp.asarray(np.random.RandomState(2).rand(2, IMG, IMG, 3), jnp.float32)
    targets = make_targets(flame, 2)
    new_state, comps = step(state, x, targets)
    assert int(new_state.step) == 1
    assert np.isfinite(float(comps["loss"]))
    # params changed
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(a, b), variables["params"], new_state.params
    )
    assert any(jax.tree_util.tree_leaves(changed))
    # ema moved toward new params but is not equal to them at step 1
    ema_leaves = jax.tree_util.tree_leaves(new_state.ema_params)
    assert all(np.isfinite(l).all() for l in ema_leaves)


def test_sharded_train_step_runs_on_mesh(model_and_vars, flame, loss_cfg):
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")
    model, variables = model_and_vars
    tcfg = TrainConfig(max_steps=100, lr_warmup_steps=2, initial_lr=1e-4)
    state = create_train_state(model, variables, tcfg)
    mesh = make_data_mesh()
    step = shard_train_step(make_train_step(model, flame, loss_cfg, tcfg), mesh)

    b = len(jax.devices())
    x = jnp.asarray(np.random.RandomState(3).rand(b, IMG, IMG, 3), jnp.float32)
    targets = make_targets(flame, b)
    new_state, comps = step(state, x, targets)
    assert np.isfinite(float(comps["loss"]))
    assert int(new_state.step) == 1
