"""YoloHeads model: shape/decode invariants on a tiny arch (CPU-fast)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from head_detector_tpu.head_info import NUM_FLAME_PARAMS
from head_detector_tpu.models import build_model, init_model, make_anchors
from head_detector_tpu.models.presets import (
    ArchCfg,
    HeadCfg,
    NeckStageCfg,
    StageCfg,
    get_arch,
)

TINY = ArchCfg(
    name="tiny",
    stem_channels=8,
    stages=(
        StageCfg(16, 1, 8, False),
        StageCfg(24, 1, 8, True),
        StageCfg(32, 1, 16, False),
        StageCfg(48, 1, 16, True),
    ),
    spp_channels=48,
    neck_up=(
        NeckStageCfg(24, 1, 8, reduce_channels=True),
        NeckStageCfg(16, 1, 8, reduce_channels=True),
    ),
    neck_down=(
        NeckStageCfg(24, 1, 8),
        NeckStageCfg(32, 1, 8),
    ),
    heads=tuple(
        HeadCfg(
            stride=s,
            bbox_inter_channels=16,
            flame_inter_channels=16,
            flame_regression_blocks=1,
            flame_shape_inter_channels=16,
            flame_expression_inter_channels=8,
            flame_shape_out_channels=8,
            flame_expression_out_channels=8,
            flame_transformation_inter_channels=8,
        )
        for s in (8, 16, 32)
    ),
)


@pytest.fixture(scope="module")
def tiny_model():
    model = build_model(TINY)
    variables = init_model(model, jax.random.PRNGKey(0), (64, 64))
    return model, variables


def test_forward_shapes(tiny_model):
    model, variables = tiny_model
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    decoded, raw = model.apply(variables, x, train=False)
    a = 8 * 8 + 4 * 4 + 2 * 2  # anchors at strides 8/16/32 on 64x64
    assert decoded.boxes_xyxy.shape == (2, a, 4)
    assert decoded.scores.shape == (2, a, 1)
    assert decoded.flame_params.shape == (2, a, NUM_FLAME_PARAMS)
    assert raw.cls_score_list.shape == (2, a, 1)
    assert raw.reg_distri_list.shape == (2, a, 4 * 17)
    assert raw.anchors.shape == (a, 4)
    assert raw.anchor_points.shape == (a, 2)
    assert raw.num_anchors_list == (64, 16, 4)
    assert np.all(np.isfinite(np.asarray(decoded.boxes_xyxy)))


def test_decode_invariants(tiny_model):
    """Scores in (0,1); cls prior bias => initial scores ~0.01; boxes span
    sane pixel ranges; FLAME scale positive and stride-scaled."""
    model, variables = tiny_model
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    decoded, raw = model.apply(variables, x, train=False)
    scores = np.asarray(decoded.scores)
    # sigmoid range (an untrained net may saturate individual anchors)
    assert (scores >= 0).all() and (scores <= 1).all()
    assert np.isfinite(scores).all()

    flame = np.asarray(decoded.flame_params)
    assert (flame[..., 412] > 0).all()

    # translation was globalised by +centers: the per-anchor offsets must
    # track the anchor centers (untrained towers add bounded noise)
    centers = np.asarray(raw.anchor_points)
    t_xy = flame[0, :, 409:411]
    assert np.abs(t_xy - centers).max() < 3 * 64.0
    # and correlate strongly with them across the grid
    corr = np.corrcoef(t_xy[:, 0], centers[:, 0])[0, 1]
    assert corr > 0.3, corr


def test_deferred_globalization_bit_identical(tiny_model):
    """select-then-globalize (deferred) == globalize-then-select (eager):
    the same f32 ops run on the same values, so results are bit-identical."""
    from head_detector_tpu.models import build_model
    from head_detector_tpu.models.heads import globalize_flame
    from head_detector_tpu.ops.nms import batched_nms

    model, variables = tiny_model
    deferred_model = build_model(TINY, defer_globalization=True)
    x = jnp.asarray(np.random.RandomState(3).rand(2, 64, 64, 3), jnp.float32)

    decoded, _ = model.apply(variables, x, train=False)
    d_decoded, d_raw = deferred_model.apply(variables, x, train=False)

    # deferred output is anchor-local: globalising the dense tensor must
    # reproduce the eager decode exactly
    a = decoded.flame_params.shape[1]
    all_idx = jnp.broadcast_to(jnp.arange(a), (2, a))
    densified = globalize_flame(
        d_decoded.flame_params.astype(jnp.float32), all_idx,
        d_raw.anchor_points, d_raw.stride_tensor,
    )
    np.testing.assert_array_equal(
        np.asarray(densified), np.asarray(decoded.flame_params)
    )

    # and through NMS: select-then-globalize == NMS over eager-globalized
    kwargs = dict(confidence_threshold=0.0, pre_nms_max=64, post_nms_max=16)
    res_eager = batched_nms(
        decoded.boxes_xyxy, decoded.scores, decoded.flame_params, **kwargs
    )
    res_def = batched_nms(
        d_decoded.boxes_xyxy, d_decoded.scores, d_decoded.flame_params, **kwargs
    )
    selected = globalize_flame(
        res_def.flame_params.astype(jnp.float32), res_def.anchor_idx,
        d_raw.anchor_points, d_raw.stride_tensor,
    )
    valid = np.asarray(res_eager.valid)
    np.testing.assert_array_equal(
        np.asarray(selected)[valid], np.asarray(res_eager.flame_params)[valid]
    )


def test_train_mode_updates_batch_stats(tiny_model):
    model, variables = tiny_model
    x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3), jnp.float32)
    (_, raw), mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(not np.allclose(a, b) for a, b in zip(old, new))
    assert changed


def test_make_anchors_matches_reference_layout():
    anchors, points, counts, strides = make_anchors([(8, 8), (4, 4), (2, 2)], (8, 16, 32))
    assert counts == (64, 16, 4)
    # first cell center of stride-8 level: (0.5, 0.5) grid units
    assert np.allclose(points[0], [0.5, 0.5])
    # anchor box = center_px +- 2.5*stride
    assert np.allclose(anchors[0], [0.5 * 8 - 20, 0.5 * 8 - 20, 0.5 * 8 + 20, 0.5 * 8 + 20])
    # last level stride recorded per anchor
    assert strides[0, 0] == 8 and strides[-1, 0] == 32


def test_presets_exist():
    for name in ("yolo_heads_n", "yolo_heads_s", "yolo_heads_m", "yolo_heads_l"):
        arch = get_arch(name)
        assert len(arch.stages) == 4 and len(arch.heads) == 3
    assert get_arch("vgg_heads_l") is get_arch("yolo_heads_l")


def test_s2d_stem_kernel_algebra_exact():
    """The space-to-depth stem is the SAME arithmetic as the dense 3x3/s2
    stem conv (export.s2d_stem_kernel doc): dense conv(pad 1, stride 2) ==
    2x2/s1 conv over the 2x2 s2d rearrangement with the re-laid kernel."""
    import jax.lax as lax

    from head_detector_tpu.export import s2d_stem_kernel

    r = np.random.RandomState(0)
    x = jnp.asarray(r.rand(2, 16, 16, 3), jnp.float32)
    w = jnp.asarray(r.randn(3, 3, 3, 8).astype(np.float32))

    dense = lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

    b, h, ww, c = x.shape
    y = x.reshape(b, h // 2, 2, ww // 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, ww // 2, 4 * c)
    k = jnp.asarray(s2d_stem_kernel(np.asarray(w)))
    s2d = lax.conv_general_dilated(
        y, k, window_strides=(1, 1), padding=[(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert s2d.shape == dense.shape
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(dense),
                               rtol=1e-6, atol=1e-6)


def test_s2d_stem_deploy_model_matches_dense(tiny_model):
    """Whole-graph check: the deploy model built with s2d_stem=True decodes
    the same boxes/scores/flame params as the dense deploy build."""
    from head_detector_tpu.export import build_deploy

    _, variables = tiny_model
    dense_m, dense_v = build_deploy(TINY, variables, dtype=jnp.float32)
    s2d_m, s2d_v = build_deploy(TINY, variables, dtype=jnp.float32,
                                s2d_stem=True)
    stem_k = s2d_v["params"]["backbone"]["stem"]["conv"]["rbr_reparam"]["kernel"]
    assert stem_k.shape[:2] == (2, 2) and stem_k.shape[2] == 12

    x = jnp.asarray(np.random.RandomState(3).rand(2, 64, 64, 3), jnp.float32)
    d_dense, _ = dense_m.apply(dense_v, x, train=False)
    d_s2d, _ = s2d_m.apply(s2d_v, x, train=False)
    np.testing.assert_allclose(np.asarray(d_s2d.boxes_xyxy),
                               np.asarray(d_dense.boxes_xyxy),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(d_s2d.scores),
                               np.asarray(d_dense.scores),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_s2d.flame_params),
                               np.asarray(d_dense.flame_params),
                               rtol=1e-4, atol=1e-3)
