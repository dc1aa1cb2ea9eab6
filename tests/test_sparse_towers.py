"""Sparse post-NMS FLAME towers must reproduce the dense head's rows."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from head_detector_tpu.export import build_deploy
from head_detector_tpu.models import build_model, init_model
from head_detector_tpu.models.heads import globalize_flame
from head_detector_tpu.ops.nms import batched_nms
from head_detector_tpu.ops.sparse_towers import extract_patches, sparse_flame_rows

from test_model import TINY


@pytest.fixture(scope="module")
def deploy_model():
    train_model = build_model(TINY)
    variables = init_model(train_model, jax.random.PRNGKey(0), (64, 64))
    model, fused = build_deploy(TINY, variables, dtype=jnp.float32,
                                defer_globalization=True)
    return model, fused


def test_extract_patches_matches_manual_pad(rng):
    feat = jnp.asarray(rng.rand(2, 6, 7, 3), jnp.float32)
    padded = np.pad(np.asarray(feat), ((0, 0), (2, 2), (2, 2), (0, 0)))
    ys = jnp.asarray([[0, 3, 5], [1, 2, 4]])
    xs = jnp.asarray([[0, 6, 2], [3, 0, 6]])
    got = np.asarray(extract_patches(feat, ys, xs, rf=5))
    for b in range(2):
        for k in range(3):
            y, x = int(ys[b, k]), int(xs[b, k])
            exp = padded[b, y : y + 5, x : x + 5]
            np.testing.assert_array_equal(got[b, k], exp)


def test_sparse_rows_match_dense_head(deploy_model, rng):
    """Rows from patch towers == the dense [B, A, 413] tensor's rows, for
    anchors on every scale including borders."""
    model, fused = deploy_model
    dense_model = build_model(TINY, deploy=True, dtype=jnp.float32,
                              defer_globalization=True)
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    decoded, raw, feats = dense_model.apply(fused, x, train=False,
                                            return_feats=True)
    dense = np.asarray(decoded.flame_params)  # [B, A, 413] anchor-local

    # anchors: corners + centers of each scale (strides 8/16/32 on 64x64:
    # 64 + 16 + 4 anchors)
    idx = jnp.asarray([[0, 7, 36, 63, 64, 69, 79, 80, 81, 83],
                       [1, 8, 42, 56, 65, 75, 78, 80, 82, 83]], jnp.int32)
    rows = sparse_flame_rows(fused, TINY, feats, idx)
    rows = np.asarray(rows)
    for b in range(2):
        for j, a in enumerate(np.asarray(idx)[b]):
            np.testing.assert_allclose(
                rows[b, j], dense[b, a], atol=2e-5,
                err_msg=f"anchor {a} (batch {b})",
            )


def test_sparse_rows_compacted_batch(deploy_model, rng):
    """Batch-compacted slots (each naming its source image via batch_idx)
    must match the dense rows of that image."""
    model, fused = deploy_model
    dense_model = build_model(TINY, deploy=True, dtype=jnp.float32,
                              defer_globalization=True)
    x = jnp.asarray(rng.rand(3, 64, 64, 3), jnp.float32)
    decoded, _, feats = dense_model.apply(fused, x, train=False,
                                          return_feats=True)
    dense = np.asarray(decoded.flame_params)

    anchor_idx = jnp.asarray([[0, 36, 83, 64, 7, 80]], jnp.int32)
    batch_idx = jnp.asarray([[2, 0, 1, 2, 1, 0]], jnp.int32)
    rows = np.asarray(
        sparse_flame_rows(fused, TINY, feats, anchor_idx, batch_idx=batch_idx)
    )[0]
    for j in range(6):
        np.testing.assert_allclose(
            rows[j],
            dense[int(batch_idx[0, j]), int(anchor_idx[0, j])],
            atol=2e-5,
        )


def test_skip_flame_forward_and_nms(deploy_model, rng):
    """skip_flame emits a zero-width flame map; boxes/scores identical to the
    full model; NMS runs on the empty params and sparse rows + globalize
    reproduce the eager selected params."""
    model, fused = deploy_model
    lean = build_model(TINY, deploy=True, dtype=jnp.float32, skip_flame=True,
                       defer_globalization=True)
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    d_full, r_full, feats = build_model(
        TINY, deploy=True, dtype=jnp.float32, defer_globalization=True
    ).apply(fused, x, train=False, return_feats=True)
    d_lean, r_lean = lean.apply(fused, x, train=False)

    assert d_lean.flame_params.shape[-1] == 0
    np.testing.assert_array_equal(np.asarray(d_lean.boxes_xyxy),
                                  np.asarray(d_full.boxes_xyxy))
    np.testing.assert_array_equal(np.asarray(d_lean.scores),
                                  np.asarray(d_full.scores))

    kwargs = dict(confidence_threshold=0.0, pre_nms_max=32, post_nms_max=8)
    res_full = batched_nms(d_full.boxes_xyxy, d_full.scores,
                           d_full.flame_params, **kwargs)
    res_lean = batched_nms(d_lean.boxes_xyxy, d_lean.scores,
                           d_lean.flame_params, **kwargs)
    np.testing.assert_array_equal(np.asarray(res_lean.anchor_idx),
                                  np.asarray(res_full.anchor_idx))

    sparse_sel = sparse_flame_rows(fused, TINY, feats, res_lean.anchor_idx)
    full_sel = res_full.flame_params.astype(jnp.float32)
    valid = np.asarray(res_full.valid)
    np.testing.assert_allclose(
        np.asarray(sparse_sel)[valid], np.asarray(full_sel)[valid], atol=2e-5
    )

    # and through globalisation: same final 413-vectors
    g_sparse = globalize_flame(sparse_sel, res_lean.anchor_idx,
                               r_lean.anchor_points, r_lean.stride_tensor)
    g_full = globalize_flame(full_sel, res_full.anchor_idx,
                             r_full.anchor_points, r_full.stride_tensor)
    np.testing.assert_allclose(
        np.asarray(g_sparse)[valid], np.asarray(g_full)[valid], atol=2e-5
    )
