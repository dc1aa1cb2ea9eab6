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
