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


def test_parse_pose_heads_recovers_conditioned_faces():
    from head_detector_tpu.data_factory.generation import (
        draw_bodypose, parse_pose_heads,
    )

    canvas = np.zeros((256, 256, 3), np.uint8)
    # two people: full face joints (nose 0, eyes 14/15, ears 16/17) plus a
    # couple of body joints so the skeleton is non-degenerate
    def face(cx, cy, r):
        kp = [(0, 0, 0.0)] * 18
        kp[0] = (cx, cy, 1.0)
        kp[14] = (cx - r, cy - r, 1.0)
        kp[15] = (cx + r, cy - r, 1.0)
        kp[16] = (cx - 2 * r, cy - r, 1.0)
        kp[17] = (cx + 2 * r, cy - r, 1.0)
        kp[1] = (cx, cy + 6 * r, 1.0)  # neck
        # shoulders + an arm: the neck->shoulder stick shares the nose
        # joint's (255,0,0) — a body must NOT become a phantom head
        kp[2] = (cx - 5 * r, cy + 7 * r, 1.0)
        kp[5] = (cx + 5 * r, cy + 7 * r, 1.0)
        kp[3] = (cx - 6 * r, cy + 12 * r, 1.0)
        kp[13] = (cx + 2 * r, cy + 14 * r, 1.0)  # ankle: shares a face color
        return kp

    draw_bodypose(canvas, face(60, 80, 6))
    draw_bodypose(canvas, face(190, 150, 6))
    heads = parse_pose_heads(canvas)
    assert len(heads) == 2
    centers = sorted((float(h[0]), float(h[1])) for h in heads)
    assert abs(centers[0][0] - 60) < 15 and abs(centers[0][1] - 80) < 15
    assert abs(centers[1][0] - 190) < 15 and abs(centers[1][1] - 150) < 15


def test_data_generator_flame_render_backend(tmp_path):
    import cv2

    from head_detector_tpu.data_factory.generation import (
        DataGenerator, FlameRenderBackend, draw_bodypose, parse_pose_heads,
    )

    # conditioning dataset: one pose image + captions
    data = tmp_path / "poses"
    (data / "images").mkdir(parents=True)
    canvas = np.zeros((256, 256, 3), np.uint8)
    kp = [(0, 0, 0.0)] * 18
    kp[0] = (128, 90, 1.0)
    kp[14] = (120, 82, 1.0)
    kp[15] = (136, 82, 1.0)
    kp[1] = (128, 140, 1.0)
    draw_bodypose(canvas, kp)
    cv2.imwrite(str(data / "images" / "scene0.jpg"), canvas)
    (data / "annotations.json").write_text(
        '{"scene0": {"caption": "a photo of a person"}}'
    )

    out = tmp_path / "generated"
    gen = DataGenerator(pipeline=FlameRenderBackend(image_size=256))
    written = gen.generate(str(data), str(out))
    assert len(written) == 1
    img = cv2.imread(written[0])
    assert img is not None and img.shape == (256, 256, 3)
    # the rendered head must sit near the conditioned face location: NCC
    # colors are bright vs the dim background, so threshold for head pixels
    bright = np.where(img.max(axis=-1) > 140)
    assert bright[0].size > 200, "no rendered head pixels found"
    cy, cx = bright[0].mean(), bright[1].mean()
    assert abs(cx - 128) < 40 and abs(cy - 90) < 60

    # determinism: same caption+pose -> same image (fixed-seed analogue)
    img2 = FlameRenderBackend(image_size=256)("a photo of a person", canvas)
    img1 = FlameRenderBackend(image_size=256)("a photo of a person", canvas)
    np.testing.assert_array_equal(img1, img2)

    # resume semantics: a second generate() call skips existing outputs
    assert gen.generate(str(data), str(out)) == []


def test_detector_captioner_templates():
    from head_detector_tpu.data_factory.generation import DetectorCaptioner

    cap = DetectorCaptioner(lambda img: [Box(0, 0, 1, 1)] * 2)
    assert cap(np.zeros((8, 8, 3), np.uint8)) == "a photo of two people"
    cap0 = DetectorCaptioner(lambda img: [])
    assert cap0(np.zeros((8, 8, 3), np.uint8)) == "an empty scene"


def test_slurm_index_ranges_cover_all_images(monkeypatch):
    """SLURM bucketing must not silently drop the len%MAX_TASKS tail nor
    yield all-empty ranges for small conditioning sets (round-3 advisor;
    ref data_generator/generate_laion.py drops both)."""
    from head_detector_tpu.data_factory import generation as g

    def ranges(n):
        out = []
        for tid in range(g.MAX_TASKS):
            monkeypatch.setenv("SLURM_ARRAY_TASK_ID", str(tid))
            out.append(g.DataGenerator._get_start_end_index([f"i{k}" for k in range(n)]))
        return out

    # tail case: 2*MAX_TASKS+7 images — union of ranges covers everything
    n = 2 * g.MAX_TASKS + 7
    covered = sorted(i for s, e in ranges(n) for i in range(s, e))
    assert covered == list(range(n))

    # small-set case: fewer images than tasks — still disjoint full coverage
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("ignore")
        covered = sorted(i for s, e in ranges(13) for i in range(s, e))
    assert covered == list(range(13))
