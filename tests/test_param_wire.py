"""Params-on-the-wire training path: decode parity, conformal augs, loss parity.

The params wire replaces dense GT vertex transfer with 413-float DAD params
decoded on device (train/param_wire.py).  These tests pin:

* decode_param_targets == the host dense decode path (DAD3DHeadsDataset),
* conformal-affine folding: decoded projection of updated params == affine of
  the original decoded projection (the augmentation-correctness invariant),
* the generator's on-disk annotations round-trip through both loaders,
* the train step runs and agrees between dense and params wire.
"""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from head_detector_tpu.flame import FlameModel
from head_detector_tpu.train.param_wire import (
    ConformalAugs,
    ParamSample,
    ParamTargets,
    RenderedHeadsDataset,
    apply_conformal_to_params,
    collate_param_samples,
    decode_param_targets,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def flame():
    return FlameModel.from_assets()


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "render_synthetic_dataset.py"),
            "--out", str(out), "--split", "train", "--count", "6",
            "--image-size", "320",
        ],
        check=True,
        env=env,
        cwd=REPO,
    )
    return str(out)


def _random_params(rng, n):
    """Valid-ish DAD-convention params with proper 6dof and positive scale."""
    from tools.render_synthetic_dataset import euler_rotation

    params = rng.normal(0, 0.2, (n, 413)).astype(np.float32)
    rots = np.stack(
        [
            euler_rotation(*np.radians(rng.uniform(-40, 40, 3)))
            for _ in range(n)
        ]
    )
    params[:, 403:409] = rots[:, :, :2].transpose(0, 2, 1).reshape(n, 6)
    params[:, 409:411] = rng.uniform(-0.2, 0.2, (n, 2))
    params[:, 411] = 0.0
    params[:, 412] = rng.uniform(1.0, 4.0, n)
    return params


def _decode_host(flame, params, offsets):
    """Host reference: the dense loader's decode (dataset.decode_dad_annotation)."""
    from head_detector_tpu.train.dataset import decode_dad_annotation

    verts, proj, rot = decode_dad_annotation(flame, jnp.asarray(params))
    joints = np.asarray(proj) + offsets[:, None, :]
    return np.asarray(verts), joints, np.asarray(rot)


def test_decode_param_targets_matches_host_decode(flame):
    rng = np.random.RandomState(0)
    b, nmax = 2, 3
    gt_flame = np.zeros((b, nmax, 413), np.float32)
    gt_off = np.zeros((b, nmax, 2), np.float32)
    mask = np.zeros((b, nmax, 1), np.float32)
    counts = [2, 1]
    for i, n in enumerate(counts):
        gt_flame[i, :n] = _random_params(rng, n)
        gt_off[i, :n] = rng.uniform(-50, 200, (n, 2))
        mask[i, :n] = 1.0

    pt = ParamTargets(
        gt_bboxes=jnp.zeros((b, nmax, 4)),
        gt_flame=jnp.asarray(gt_flame),
        gt_offsets=jnp.asarray(gt_off),
        pad_gt_mask=jnp.asarray(mask),
    )
    t = decode_param_targets(flame, pt)

    for i, n in enumerate(counts):
        verts, joints, rot = _decode_host(flame, gt_flame[i, :n], gt_off[i, :n])
        np.testing.assert_allclose(
            np.asarray(t.gt_vertices_3d)[i, :n], verts, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(t.gt_vertices_2d)[i, :n, :, :2], joints, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(t.gt_rotations)[i, :n], rot, atol=2e-5
        )


def test_conformal_fold_matches_affine_of_projection(flame):
    """THE augmentation invariant: fold(params, A) decodes to A(decode(params))."""
    rng = np.random.RandomState(1)
    params = _random_params(rng, 3)
    offsets = rng.uniform(0, 100, (3, 2)).astype(np.float32)

    for trial in range(4):
        angle = rng.uniform(-180, 180)
        c = rng.uniform(0.5, 2.0)
        b2 = rng.uniform(-40, 40, 2)
        rad = np.radians(angle)
        q = np.array([[np.cos(rad), -np.sin(rad)], [np.sin(rad), np.cos(rad)]])
        amat = np.hstack([c * q, b2[:, None]]).astype(np.float64)

        new_params, new_off = apply_conformal_to_params(params, offsets, amat)

        _, joints, rot = _decode_host(flame, params, offsets)
        _, joints_new, rot_new = _decode_host(flame, new_params, new_off)

        expected = joints[..., :2] @ amat[:, :2].T + amat[:, 2]
        np.testing.assert_allclose(joints_new[..., :2], expected, atol=5e-2)

        # rotation label consistency: R_new == Q3 @ R_old
        q3 = np.eye(3)
        q3[:2, :2] = q
        np.testing.assert_allclose(rot_new, q3[None] @ rot, atol=1e-4)


def test_generator_annotations_roundtrip(flame, synth_dir):
    """The rendered npz decodes to joints inside the stated bbox via BOTH
    loaders, and the params wire agrees with the dense wire."""
    from head_detector_tpu.train.dataset import DAD3DHeadsDataset

    dense = DAD3DHeadsDataset(os.path.join(synth_dir, "train"), flame_model=flame)
    pw = RenderedHeadsDataset(os.path.join(synth_dir, "train"))
    assert len(dense) == len(pw) == 6

    s_dense = dense[0]
    s_pw = pw[0]
    assert isinstance(s_pw, ParamSample)
    np.testing.assert_allclose(s_pw.bboxes_xywh, s_dense.bboxes_xywh, atol=1e-3)

    # dense joints == params-wire on-device decode
    images, pt = collate_param_samples([s_pw], max_boxes=4)
    t = decode_param_targets(flame, pt)
    n = len(s_dense.bboxes_xywh)
    np.testing.assert_allclose(
        np.asarray(t.gt_vertices_2d)[0, :n, :, :2],
        s_dense.vertices_2d[:, :, :2],
        atol=5e-3,
    )

    # joints fall inside the stated (tight) bbox
    for h in range(n):
        x, y, w, hgt = s_dense.bboxes_xywh[h]
        jx = s_dense.vertices_2d[h, :, 0]
        jy = s_dense.vertices_2d[h, :, 1]
        assert jx.min() >= x - 1 and jx.max() <= x + w + 1
        assert jy.min() >= y - 1 and jy.max() <= y + hgt + 1


def test_rendered_heads_visible(synth_dir):
    """Rendered scenes must actually contain the heads: the bbox interior
    differs from the background (guards against silent raster misalignment)."""
    import cv2

    img = cv2.imread(os.path.join(synth_dir, "train", "images", "000000.jpg"))
    ann = np.load(os.path.join(synth_dir, "train", "annotations", "000000.npz"))
    for bbox in ann["bbox"]:
        x, y, w, h = [int(v) for v in bbox]
        x, y = max(x, 0), max(y, 0)
        inner = img[y : y + h, x : x + w]
        assert inner.size > 0
        # NCC-colored pixels are saturated vs the dim background
        assert inner.max() > 150


def test_conformal_augs_apply(flame, synth_dir):
    """Augmented sample still decodes consistently: joints transformed by the
    same conformal map as the image corners."""
    rng = np.random.RandomState(3)
    pw = RenderedHeadsDataset(
        os.path.join(synth_dir, "train"),
        augs=ConformalAugs(320, rng=rng, rot90_prob=1.0, affine_prob=1.0),
    )
    s = pw[2]
    assert s.image.shape[:2] == (320, 320)
    if len(s.params):
        _, joints, _ = _decode_host(flame, s.params, s.offsets)
        x, y, w, h = s.bboxes_xywh[0]
        # bbox (4-corner hull, clamped to canvas) must contain the tight
        # joints bbox clipped to the canvas
        jx = np.clip(joints[0, :, 0], 0, 320)
        jy = np.clip(joints[0, :, 1], 0, 320)
        assert jx.min() >= x - 2 and jx.max() <= x + w + 2
        assert jy.min() >= y - 2 and jy.max() <= y + h + 2


def test_train_step_params_wire_matches_dense(flame, synth_dir):
    """One jitted train step on each wire: identical loss components."""
    import dataclasses

    import jax

    from head_detector_tpu.models import build_model, init_model
    from head_detector_tpu.train.dataset import DAD3DHeadsDataset, collate_samples
    from head_detector_tpu.train.loss import LossConfig
    from head_detector_tpu.train.trainer import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    model = build_model("yolo_heads_n", dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), (64, 64))
    tcfg = TrainConfig(max_steps=10, ema=False)
    step = make_train_step(model, flame, LossConfig(max_positives=32), tcfg)

    dense_ds = DAD3DHeadsDataset(os.path.join(synth_dir, "train"), flame_model=flame)
    pw_ds = RenderedHeadsDataset(os.path.join(synth_dir, "train"))

    # same sample through both wires, image shrunk to 64 for speed
    import cv2

    def shrink(img):
        return cv2.resize(img, (64, 64), interpolation=cv2.INTER_AREA)

    sd = dense_ds[1]
    sp = pw_ds[1]
    scale = 64.0 / 320.0
    sd.image = shrink(sd.image)
    sd.vertices_2d[:, :, :2] *= scale
    sd.bboxes_xywh *= scale
    amat = np.array([[scale, 0.0, 0.0], [0.0, scale, 0.0]])
    new_params, new_off = apply_conformal_to_params(sp.params, sp.offsets, amat)
    sp = ParamSample(shrink(sp.image), new_params, new_off, sp.bboxes_xywh * scale)

    imgs_d, t_d = collate_samples([sd], max_boxes=4)
    imgs_p, t_p = collate_param_samples([sp], max_boxes=4)
    np.testing.assert_array_equal(imgs_d, imgs_p)

    state = create_train_state(model, variables, tcfg)
    _, comps_d = jax.jit(step)(state, jnp.asarray(imgs_d, jnp.float32) / 255.0, t_d)
    state2 = create_train_state(model, variables, tcfg)
    _, comps_p = jax.jit(step)(state2, jnp.asarray(imgs_p, jnp.float32) / 255.0, t_p)

    for k in ("loss", "loss_cls", "loss_iou", "loss_pose_reg", "loss_3d_vertices"):
        np.testing.assert_allclose(
            float(comps_d[k]), float(comps_p[k]), rtol=2e-3, atol=2e-4
        )


def test_rot_mat_from_6dof_np_matches_jax():
    import jax.numpy as jnp

    from head_detector_tpu.ops.rotation import rot_mat_from_6dof
    from head_detector_tpu.train.param_wire import rot_mat_from_6dof_np

    v = np.random.RandomState(3).randn(64, 6).astype(np.float32)
    r_np = rot_mat_from_6dof_np(v)
    r_jax = np.asarray(rot_mat_from_6dof(jnp.asarray(v)))
    np.testing.assert_allclose(r_np, r_jax, atol=2e-6)


def test_conformal_augs_thread_deterministic():
    """Per-(index, pass) aug seeding: the augmented sample stream must not
    depend on _Prefetcher thread scheduling (shared RandomState was not
    thread-safe and order-dependent)."""
    import concurrent.futures as cf

    from head_detector_tpu.train.param_wire import (
        ConformalAugs, RenderedHeadsDataset,
    )

    class _DS(RenderedHeadsDataset):
        def __init__(self, n, augs):  # bypass the disk reader
            self.augs = augs
            self.photometric = None
            self.min_bbox_area = 0.0
            self.aug_seed = 7
            import threading

            self._serve_counts = {}
            self._serve_lock = threading.Lock()
            self._epoch = None
            self._n = n

        def __len__(self):
            return self._n

        def __getitem__(self, index):
            from head_detector_tpu.train.param_wire import ParamSample

            rng = np.random.RandomState(index)
            img = rng.randint(0, 255, (64, 64, 3), np.uint8)
            params = rng.randn(2, 413).astype(np.float32) * 0.1
            sample = ParamSample(
                img, params, np.zeros((2, 2), np.float32),
                np.array([[4, 4, 20, 20], [30, 30, 20, 20]], np.float32),
            )
            return self.augs(sample, rng=self._rng_for(index))

    def run(order, workers):
        ds = _DS(8, ConformalAugs(64))
        with cf.ThreadPoolExecutor(workers) as pool:
            out = list(pool.map(ds.__getitem__, order))
        return {i: out[k] for k, i in enumerate(order)}

    a = run(list(range(8)), 1)
    b = run(list(reversed(range(8))), 4)
    for i in range(8):
        np.testing.assert_array_equal(a[i].image, b[i].image)
        np.testing.assert_array_equal(a[i].params, b[i].params)


def test_set_epoch_varies_aug_stream_across_chunk_restarts():
    """Chunked campaigns restart the process each chunk; without the
    trainer's set_epoch(global_epoch) call every chunk would replay the
    same per-sample aug draws (round-3 advisor finding).  The epoch must
    supersede the per-process serve count, and two epochs must differ."""
    from head_detector_tpu.train.param_wire import RenderedHeadsDataset

    ds = RenderedHeadsDataset.__new__(RenderedHeadsDataset)
    import threading

    ds.aug_seed = 0
    ds._serve_counts = {}
    ds._serve_lock = threading.Lock()
    ds._epoch = None

    # fresh-process default (no set_epoch): serve counts restart at 0
    first_serve = ds._rng_for(5).randint(1 << 30)
    ds._serve_counts.clear()
    assert ds._rng_for(5).randint(1 << 30) == first_serve

    # with set_epoch the draw tracks the GLOBAL epoch, not the process
    ds.set_epoch(0)
    e0 = ds._rng_for(5).randint(1 << 30)
    ds.set_epoch(7)
    e7 = ds._rng_for(5).randint(1 << 30)
    assert e0 == first_serve  # epoch 0 == first serve (continuity)
    assert e0 != e7
    # restarted process at epoch 7 reproduces the unchunked stream
    ds2 = RenderedHeadsDataset.__new__(RenderedHeadsDataset)
    ds2.aug_seed = 0
    ds2._serve_counts = {}
    ds2._serve_lock = threading.Lock()
    ds2._epoch = None
    ds2.set_epoch(7)
    assert ds2._rng_for(5).randint(1 << 30) == e7


def test_conformal_augs_folds_offsize_inputs_to_square():
    from head_detector_tpu.train.param_wire import ConformalAugs, ParamSample

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (100, 160, 3), np.uint8)  # non-square
    sample = ParamSample(
        img, rng.randn(1, 413).astype(np.float32) * 0.1,
        np.zeros((1, 2), np.float32),
        np.array([[40, 30, 40, 40]], np.float32),
    )
    augs = ConformalAugs(64, rot90_prob=0.0, affine_prob=0.0,
                         rng=np.random.RandomState(0))
    out = augs(sample)
    assert out.image.shape == (64, 64, 3)
    # longest-max-size scale 64/160 = 0.4: the bbox scales conformally
    np.testing.assert_allclose(out.bboxes_xywh[0], [16, 12, 16, 16], atol=1e-4)
