"""Fixed-shape NMS vs a greedy numpy reference (torchvision.ops.nms semantics)."""

import numpy as np

import jax.numpy as jnp

from head_detector_tpu.ops.nms import batched_nms, box_iou_xyxy, single_image_nms


def _np_iou(a, b):
    area_a = np.clip(a[2] - a[0], 0, None) * np.clip(a[3] - a[1], 0, None)
    area_b = np.clip(b[2] - b[0], 0, None) * np.clip(b[3] - b[1], 0, None)
    lt = np.maximum(a[:2], b[:2])
    rb = np.minimum(a[2:], b[2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[0] * wh[1]
    return inter / max(area_a + area_b - inter, 1e-12)


def _np_nms(boxes, scores, iou_threshold):
    """torchvision.ops.nms: sort by score desc (stable), greedy suppress > thr."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    for i in order:
        ok = True
        for j in keep:
            if _np_iou(boxes[i], boxes[j]) > iou_threshold:
                ok = False
                break
        if ok:
            keep.append(i)
    return keep


def _random_boxes(rng, n, size=640):
    cx = rng.uniform(0, size, n)
    cy = rng.uniform(0, size, n)
    w = rng.uniform(10, 120, n)
    h = rng.uniform(10, 120, n)
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1).astype(
        np.float32
    )


def test_nms_matches_reference(rng):
    n = 200
    boxes = _random_boxes(rng, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    params = rng.normal(size=(n, 7)).astype(np.float32)

    conf, iou_thr = 0.3, 0.5
    res = single_image_nms(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        jnp.asarray(params),
        confidence_threshold=conf,
        iou_threshold=iou_thr,
        pre_nms_max=1000,
        post_nms_max=100,
    )

    # reference pipeline: conf filter -> topk(1000) -> nms -> keep 100
    mask = scores >= conf
    idx = np.nonzero(mask)[0]
    sub_boxes, sub_scores = boxes[idx], scores[idx]
    keep = _np_nms(sub_boxes, sub_scores, iou_thr)[:100]
    exp_order = np.argsort(-sub_scores[keep], kind="stable")
    expected_boxes = sub_boxes[keep]
    expected_scores = sub_scores[keep]

    nvalid = int(np.asarray(res.valid).sum())
    assert nvalid == len(keep)
    got_boxes = np.asarray(res.boxes)[:nvalid]
    got_scores = np.asarray(res.scores)[:nvalid]
    # our output is ordered by descending score (topk order), reference keep
    # list is in score order already
    order = np.argsort(-expected_scores, kind="stable")
    np.testing.assert_allclose(got_scores, expected_scores[order], atol=1e-6)
    np.testing.assert_allclose(got_boxes, expected_boxes[order], atol=1e-4)
    # flame rows (selected via the one-hot matmul) must be the exact original rows
    got_params = np.asarray(res.flame_params)[:nvalid]
    expected_params = params[idx][keep][order]
    np.testing.assert_array_equal(got_params, expected_params)


def test_nms_no_detections(rng):
    boxes = _random_boxes(rng, 50)
    scores = np.full(50, 0.01, np.float32)
    params = np.zeros((50, 413), np.float32)
    res = single_image_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(params),
        confidence_threshold=0.5,
    )
    assert not bool(np.asarray(res.valid).any())
    assert np.asarray(res.boxes).shape == (50, 4)  # post_nms_max clipped to A? no: 100>50 -> 50


def test_batched_nms_shapes(rng):
    b, a = 3, 300
    boxes = np.stack([_random_boxes(rng, a) for _ in range(b)])
    scores = rng.uniform(0, 1, (b, a, 1)).astype(np.float32)
    params = rng.normal(size=(b, a, 413)).astype(np.float32)
    res = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(params),
        pre_nms_max=256, post_nms_max=64,
    )
    assert res.boxes.shape == (b, 64, 4)
    assert res.scores.shape == (b, 64)
    assert res.flame_params.shape == (b, 64, 413)
    assert res.valid.shape == (b, 64)
    # all valid scores above threshold, sorted descending
    v = np.asarray(res.valid)
    s = np.asarray(res.scores)
    for i in range(b):
        sv = s[i][v[i]]
        assert np.all(np.diff(sv) <= 1e-6)
        assert np.all(sv >= 0.5)


def test_nms_anchor_idx_points_at_source_rows(rng):
    n = 120
    boxes = _random_boxes(rng, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    params = rng.normal(size=(n, 9)).astype(np.float32)
    res = single_image_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(params),
        confidence_threshold=0.3, post_nms_max=32,
    )
    v = np.asarray(res.valid)
    idx = np.asarray(res.anchor_idx)[v]
    np.testing.assert_allclose(np.asarray(res.scores)[v], scores[idx], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(res.flame_params)[v], params[idx])


def test_compact_detections_packs_valid_rows(rng):
    from head_detector_tpu.ops.nms import compact_detections

    b, a = 4, 200
    boxes = np.stack([_random_boxes(rng, a) for _ in range(b)])
    scores = rng.uniform(0, 1, (b, a)).astype(np.float32)
    params = rng.normal(size=(b, a, 7)).astype(np.float32)
    res = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(params),
        confidence_threshold=0.4, pre_nms_max=128, post_nms_max=32,
    )
    m = 16
    cres = compact_detections(res, m)
    assert cres.scores.shape == (m,)
    assert cres.flame_params.shape == (m, 7)

    v = np.asarray(res.valid)
    s = np.asarray(res.scores)
    n_valid = int(v.sum())
    cv = np.asarray(cres.valid)
    # packed slots are the global top-min(m, n_valid) valid detections
    assert int(cv.sum()) == min(m, n_valid)
    expected = np.sort(s[v])[::-1][: min(m, n_valid)]
    np.testing.assert_allclose(np.asarray(cres.scores)[cv], expected, atol=1e-6)
    # every packed row round-trips to its dense source slot
    bi, si = np.asarray(cres.batch_idx), np.asarray(cres.slot_idx)
    for j in np.flatnonzero(cv):
        np.testing.assert_array_equal(
            np.asarray(cres.flame_params)[j], np.asarray(res.flame_params)[bi[j], si[j]]
        )
        assert np.asarray(res.valid)[bi[j], si[j]]


def test_iou_matrix(rng):
    a = _random_boxes(rng, 10)
    b = _random_boxes(rng, 7)
    got = np.asarray(box_iou_xyxy(jnp.asarray(a), jnp.asarray(b)))
    for i in range(10):
        for j in range(7):
            np.testing.assert_allclose(got[i, j], _np_iou(a[i], b[j]), atol=1e-6)


# ---------------------------------------------------------------------------
# WBF-style FLAME-param fusion (fuse_flame): score-weighted averaging of the
# rows each kept box suppressed.  Detection outputs (boxes/scores/valid/
# anchor_idx) must be bit-identical to plain NMS; only flame_params change.
# ---------------------------------------------------------------------------


def _nms(boxes, scores, params, **kw):
    return single_image_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(params), **kw
    )


def test_fusion_detection_outputs_unchanged(rng):
    n = 200
    boxes = _random_boxes(rng, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    params = rng.normal(size=(n, 13)).astype(np.float32)
    kw = dict(confidence_threshold=0.3, iou_threshold=0.5, post_nms_max=50)
    plain = _nms(boxes, scores, params, **kw)
    fused = _nms(boxes, scores, params, fuse_flame=True, **kw)
    np.testing.assert_array_equal(np.asarray(plain.boxes), np.asarray(fused.boxes))
    np.testing.assert_array_equal(np.asarray(plain.scores), np.asarray(fused.scores))
    np.testing.assert_array_equal(np.asarray(plain.valid), np.asarray(fused.valid))
    np.testing.assert_array_equal(
        np.asarray(plain.anchor_idx), np.asarray(fused.anchor_idx)
    )


def test_fusion_isolated_boxes_are_identity(rng):
    # Non-overlapping detections: each kept box's only candidate is itself,
    # so fusion must return the original rows exactly (weights: own score).
    boxes = np.array(
        [[0, 0, 50, 50], [200, 200, 260, 260], [500, 500, 540, 540]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    params = rng.normal(size=(3, 9)).astype(np.float32)
    plain = _nms(boxes, scores, params)
    fused = _nms(boxes, scores, params, fuse_flame=True)
    np.testing.assert_allclose(
        np.asarray(fused.flame_params), np.asarray(plain.flame_params),
        rtol=1e-6, atol=1e-6,
    )


def test_fusion_is_score_weighted_mean_of_cluster(rng):
    # One head seen by three anchors (pairwise IoU > 0.7) + one far box:
    # the cluster's kept row becomes the score-weighted mean of all three.
    boxes = np.array(
        [
            [0, 0, 100, 100],
            [1, 1, 99, 99],
            [2, 2, 100, 100],
            [400, 400, 480, 480],
        ],
        np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    params = rng.normal(size=(4, 5)).astype(np.float32)
    res = _nms(boxes, scores, params, iou_threshold=0.5, fuse_flame=True,
               fusion_iou=0.7)
    valid = np.asarray(res.valid)
    assert int(valid.sum()) == 2
    w = scores[:3]
    expected = (w[:, None] * params[:3]).sum(0) / w.sum()
    got = np.asarray(res.flame_params)[valid]
    np.testing.assert_allclose(got[0], expected, rtol=1e-5, atol=1e-5)
    # the isolated box fuses only itself
    np.testing.assert_allclose(got[1], params[3], rtol=1e-6, atol=1e-6)


def test_fusion_candidate_assigned_to_best_iou_kept_box_only():
    # Two kept boxes A (score .9) and B (score .8) with IoU(A,B) ~ 0.45
    # (< nms 0.5 so both survive).  Candidate C is suppressed and overlaps
    # BOTH above fusion_iou, but its best-IoU match is B — it must fuse into
    # B only, never into A.
    a = [0.0, 0.0, 100.0, 100.0]
    b = [30.0, 0.0, 130.0, 100.0]  # IoU(A,B) = 70/130 ~ 0.538... pick wider
    b = [38.0, 0.0, 138.0, 100.0]  # inter 62 -> IoU 62/138 ~ 0.449
    c = [34.0, 0.0, 132.0, 100.0]  # closer to B than to A
    boxes = np.array([a, b, c], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    iou_ab = _np_iou(boxes[0], boxes[1])
    iou_ac = _np_iou(boxes[0], boxes[2])
    iou_bc = _np_iou(boxes[1], boxes[2])
    assert iou_ab < 0.5 and iou_bc > iou_ac  # construction sanity
    params = np.array([[1.0, 0.0], [0.0, 1.0], [10.0, 10.0]], np.float32)
    res = _nms(boxes, scores, params, iou_threshold=0.5, fuse_flame=True,
               fusion_iou=min(iou_ac, iou_bc) - 0.01)
    valid = np.asarray(res.valid)
    assert int(valid.sum()) == 2
    got = np.asarray(res.flame_params)[valid]
    # A keeps its own params untouched (C assigned to B)
    np.testing.assert_allclose(got[0], params[0], rtol=1e-6, atol=1e-6)
    # B = weighted mean of {B, C}
    w = scores[1:]
    expected_b = (w[:, None] * params[1:]).sum(0) / w.sum()
    np.testing.assert_allclose(got[1], expected_b, rtol=1e-5, atol=1e-5)


def test_fusion_ignores_subconfidence_candidates(rng):
    # A neighbor below the confidence threshold must not leak into the mean.
    boxes = np.array([[0, 0, 100, 100], [1, 1, 99, 99]], np.float32)
    scores = np.array([0.9, 0.2], np.float32)
    params = np.array([[1.0, 2.0], [100.0, 200.0]], np.float32)
    res = _nms(boxes, scores, params, confidence_threshold=0.5,
               fuse_flame=True)
    valid = np.asarray(res.valid)
    assert int(valid.sum()) == 1
    np.testing.assert_allclose(
        np.asarray(res.flame_params)[valid][0], params[0], rtol=1e-6, atol=1e-6
    )


def test_fusion_batched_and_empty(rng):
    b, a = 2, 64
    boxes = np.stack([_random_boxes(rng, a) for _ in range(b)])
    scores = rng.uniform(0, 1, (b, a)).astype(np.float32)
    scores[1] = 0.01  # image 2: nothing passes conf
    params = rng.normal(size=(b, a, 413)).astype(np.float32)
    res = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(params),
        confidence_threshold=0.5, fuse_flame=True, post_nms_max=16,
    )
    assert np.asarray(res.flame_params).shape == (b, 16, 413)
    assert not bool(np.asarray(res.valid)[1].any())
    assert np.isfinite(np.asarray(res.flame_params)).all()


def test_return_neighbors_matches_fusion_weights(rng):
    # NeighborInfo must list the cluster candidates with their score weights
    # (same construction as test_fusion_is_score_weighted_mean_of_cluster).
    boxes = np.array(
        [[0, 0, 100, 100], [1, 1, 99, 99], [2, 2, 100, 100], [400, 400, 480, 480]],
        np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    params = rng.normal(size=(4, 5)).astype(np.float32)
    res, nb = _nms(boxes, scores, params, iou_threshold=0.5, fusion_iou=0.7,
                   return_neighbors=3)
    valid = np.asarray(res.valid)
    assert int(valid.sum()) == 2
    nb_idx = np.asarray(nb.anchor_idx)[valid]
    nb_w = np.asarray(nb.weights)[valid]
    # kept det 0 = the cluster: neighbors {0,1,2} weight-desc
    np.testing.assert_array_equal(nb_idx[0], [0, 1, 2])
    np.testing.assert_allclose(nb_w[0], scores[:3], atol=1e-6)
    # kept det 1 = isolated: itself + two empty slots (weight 0)
    assert nb_idx[1][0] == 3
    np.testing.assert_allclose(nb_w[1], [scores[3], 0.0, 0.0], atol=1e-6)
    # weighted mean over NeighborInfo reproduces the fused rows exactly
    fused_res = _nms(boxes, scores, params, iou_threshold=0.5,
                     fusion_iou=0.7, fuse_flame=True)
    gathered = params[nb_idx.reshape(-1)].reshape(2, 3, -1)
    manual = (nb_w[..., None] * gathered).sum(1) / nb_w.sum(1, keepdims=True)
    np.testing.assert_allclose(
        manual, np.asarray(fused_res.flame_params)[valid], rtol=1e-5, atol=1e-5
    )
