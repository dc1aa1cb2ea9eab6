"""Fixed-shape, fully on-device NMS for TPU.

Functional spec: reference ``head_detector/utils.py:159-194`` and
``yolo_head_training/yolo_head/yolo_heads_post_prediction_callback.py:42-99``:
confidence filter -> top-k (pre_nms_max) -> greedy IoU suppression
(torchvision.ops.nms semantics) -> keep first post_nms_max.

TPU design: everything is static-shape.  The confidence filter becomes score
masking, top-k uses ``jax.lax.top_k``, and greedy suppression is a
``lax.fori_loop`` over the K sorted candidates carrying a keep-mask vector
(K iterations of K-wide VPU ops — no host sync, no dynamic shapes).  Outputs
are fixed-size arrays plus a validity mask, so everything downstream (FLAME
decode per detection, crops, rendering) stays compiled.

torchvision.ops.nms semantics replicated: boxes are suppressed when their IoU
with a *higher-scoring kept* box strictly exceeds ``iou_threshold``; ties in
score are broken by original index (stable sort).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class NMSResult(NamedTuple):
    boxes: jnp.ndarray  # [K, 4] xyxy
    scores: jnp.ndarray  # [K]
    flame_params: jnp.ndarray  # [K, P]
    valid: jnp.ndarray  # [K] bool
    anchor_idx: jnp.ndarray  # [K] int32 index into the anchor axis (0 if invalid)


class NeighborInfo(NamedTuple):
    """Per kept detection: its top-n fusion candidates (see ``fuse_flame``).

    The serving path (detector.py) runs the FLAME towers sparsely, so it
    cannot fuse dense rows inside NMS — instead it asks for the neighbor
    anchor ids + score weights, runs the towers at the [K, n] union,
    globalizes each row at its OWN anchor, and takes the weighted mean in
    image space (weighted-mean of per-anchor globalizations == fusion of
    globalized dense rows: globalization is a per-anchor affine on the same
    translation/scale slots).
    """

    anchor_idx: jnp.ndarray  # [K, n] int32 into the anchor axis (0-padded)
    weights: jnp.ndarray  # [K, n] f32 fusion weights (0 for empty slots)


class CompactDetections(NamedTuple):
    """Batch detections packed into M slots, scores-descending (valid first)."""

    boxes: jnp.ndarray  # [M, 4]
    scores: jnp.ndarray  # [M]
    flame_params: jnp.ndarray  # [M, P]
    valid: jnp.ndarray  # [M] bool
    anchor_idx: jnp.ndarray  # [M] int32
    batch_idx: jnp.ndarray  # [M] int32 source image (0 if invalid)
    slot_idx: jnp.ndarray  # [M] int32 source NMS slot (0 if invalid)


def box_iou_xyxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between two sets of xyxy boxes: [M,4] x [N,4] -> [M,N]."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0, None) * jnp.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0, None) * jnp.clip(b[:, 3] - b[:, 1], 0, None)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def _greedy_suppress(boxes: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS over score-sorted boxes. Returns keep mask [K] (bool).

    Candidates must already be sorted by descending score.  Box i is kept iff
    it is valid and no kept box j < i has IoU(i, j) > threshold.

    TPU implementation: instead of the K-step serial scan (1000 sequential
    tiny ops), iterate the fixed point ``keep[i] = valid[i] & !any_{j<i}
    (keep[j] & iou[i,j] > t)`` starting from the all-valid estimate.  Each
    sweep is one dense [K, K] masked reduction on the VPU, and the iteration
    converges to the exact greedy solution in at most the suppression-chain
    depth (typically < 10 for real detections; bounded by K).
    """
    k = boxes.shape[0]
    iou = box_iou_xyxy(boxes, boxes)  # [K, K]
    lower = jnp.tril(jnp.ones((k, k), jnp.bool_), k=-1)  # j < i
    suppressing = (iou > iou_threshold) & lower  # [i, j]: j can suppress i

    def sweep(keep):
        return valid & ~jnp.any(suppressing & keep[None, :], axis=1)

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < k)

    def body(state):
        keep, _, it = state
        return sweep(keep), keep, it + 1

    keep0 = sweep(valid)
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, valid, jnp.zeros((), jnp.int32))
    )
    return keep


def single_image_nms(
    boxes_xyxy: jnp.ndarray,  # [A, 4]
    scores: jnp.ndarray,  # [A] or [A, 1]
    flame_params: jnp.ndarray,  # [A, P]
    confidence_threshold: float = 0.5,
    iou_threshold: float = 0.5,
    pre_nms_max: int = 1000,
    post_nms_max: int = 100,
    fuse_flame: bool = False,
    fusion_iou: float = 0.7,
    return_neighbors: int = 0,
) -> NMSResult:
    """One image: conf filter -> top-k -> greedy NMS -> keep post_nms_max.

    ``fuse_flame``: weighted-box-fusion-style ensembling of the FLAME rows
    (Solovyev et al., WBF).  Each kept detection's params become the
    score-weighted mean over the confidence-passing candidates it suppressed
    (IoU >= ``fusion_iou``, candidate assigned to its best-IoU kept box).
    Neighboring anchors regress the same head independently; the round-5
    failure-mode diagnosis measured their per-head 2D translation residual as
    zero-mean noise (std ~5.3 px), so averaging k neighbors cuts that term
    ~sqrt(k).  Rotation rides the continuous 6D rep, which linearizes under
    small perturbations (that is the point of the rep), so a weighted mean of
    full 413-param rows is well-posed.  Boxes and scores are NOT fused —
    detection matching stays bit-identical to plain NMS; only the FLAME rows
    (hence landmarks/mesh) change.  No reference counterpart
    (``yolo_heads_post_prediction_callback.py:42-99`` keeps the argmax row).

    ``return_neighbors=n``: additionally return :class:`NeighborInfo` — each
    kept box's top-n fusion candidates by weight (its own row always has
    weight >= its score, so it is always included for n >= 1) — and the
    return value becomes ``(NMSResult, NeighborInfo)``.  Used by the sparse
    serving path, which must run the FLAME towers at the neighbor anchors
    before it can average (truncation to n is exact whenever a cluster has
    <= n confidence-passing candidates).
    """
    scores = scores.reshape(-1)
    num_anchors = scores.shape[0]
    k = min(pre_nms_max, num_anchors)

    conf_ok = scores >= confidence_threshold
    masked = jnp.where(conf_ok, scores, -1.0)
    top_scores, top_idx = jax.lax.top_k(masked, k)  # sorted desc, stable
    top_boxes = boxes_xyxy[top_idx]
    top_valid = top_scores >= confidence_threshold

    keep = _greedy_suppress(top_boxes, top_valid, iou_threshold)

    # order-preserving selection of the first `post_nms_max` kept boxes:
    # rank kept boxes by (kept desc, original order asc) via a composite key.
    order = jnp.arange(k)
    key = jnp.where(keep, order, k + order)  # kept boxes sort first, in order
    sel = jnp.argsort(key)[:post_nms_max]
    out_valid = keep[sel]

    # The wide [A, P] flame rows are selected with a one-hot matmul instead of
    # a row gather: the MXU streams the params tensor once sequentially, where
    # the gather does random row access (measured 576 vs 548 img/s end-to-end
    # on v5e for the L pipeline).  DEFAULT precision is bit-exact here for
    # any input dtype: every product is 1.0*x or 0.0*x and the MXU
    # accumulates in f32, so the single-pass contraction reproduces the
    # gather exactly (asserted against the gather in tests/test_nms.py).
    final_idx = top_idx[sel]  # [post_nms_max] indices into the anchor axis
    w = None
    if fuse_flame or return_neighbors:
        iou_ck = box_iou_xyxy(top_boxes[sel], top_boxes)  # [K_kept, k]
        iou_ck = jnp.where(out_valid[:, None], iou_ck, -1.0)
        # Each candidate fuses into exactly ONE kept box — its best-IoU one —
        # so a candidate suppressed early in a crowd can't bleed a different
        # head's params into a lower-scoring kept box.
        best_kept = jnp.argmax(iou_ck, axis=0)  # [k]
        assign = best_kept[None, :] == jnp.arange(sel.shape[0])[:, None]
        # ...and only DOWN the score order (candidate j may fuse into kept i
        # only if score_j <= score_i, i.e. j >= sel[i] on the sorted axis):
        # a kept box is its cluster's score maximum under greedy NMS, but a
        # higher-scoring candidate suppressed by some OTHER kept box can
        # still best-IoU-match this one — it belongs to that other head's
        # cluster, not this one.  This also guarantees each kept box is its
        # own top-weight candidate (n=1 neighbors == plain NMS exactly).
        downrank = jnp.arange(k)[None, :] >= sel[:, None]  # [K_kept, k]
        w = (
            top_scores[None, :]
            * (iou_ck >= fusion_iou)
            * assign
            * downrank
            * top_valid[None, :]
        ).astype(jnp.float32)  # [K_kept, k]
    neighbors = None
    if return_neighbors:
        n = min(int(return_neighbors), k)
        wn, jn = jax.lax.top_k(w, n)  # [K_kept, n], weight-descending
        neighbors = NeighborInfo(
            anchor_idx=jnp.where(wn > 0, top_idx[jn], 0).astype(jnp.int32),
            weights=wn,
        )
    if fuse_flame:
        # Candidate FLAME rows [k, P]: same streaming one-hot contraction as
        # below, just over the whole conf-passing top-k set.
        cand_onehot = (top_idx[:, None] == jnp.arange(num_anchors)[None, :]).astype(
            flame_params.dtype
        )
        cand_params = jnp.dot(
            cand_onehot, flame_params, preferred_element_type=jnp.float32
        )  # [k, P] f32 accumulate
        fused = jnp.dot(w, cand_params, preferred_element_type=jnp.float32)
        fused = fused / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-12)
        # Every kept box has itself as a candidate (IoU 1 >= fusion_iou), so
        # the weight row-sum is >= its own score > 0 for valid slots.
        selected_flame = fused.astype(flame_params.dtype)
    else:
        onehot = (final_idx[:, None] == jnp.arange(num_anchors)[None, :]).astype(
            flame_params.dtype
        )
        selected_flame = jnp.dot(
            onehot,
            flame_params,
            preferred_element_type=flame_params.dtype,
        )

    result = NMSResult(
        boxes=jnp.where(out_valid[:, None], top_boxes[sel], 0.0),
        scores=jnp.where(out_valid, top_scores[sel], 0.0),
        flame_params=jnp.where(out_valid[:, None], selected_flame, 0.0),
        valid=out_valid,
        anchor_idx=jnp.where(out_valid, final_idx, 0).astype(jnp.int32),
    )
    if return_neighbors:
        return result, neighbors
    return result


def compact_detections(res: NMSResult, max_total: int) -> CompactDetections:
    """Pack a batch's valid detections into ``max_total`` flat slots.

    Real images keep far fewer than B*post_nms_max detections; downstream
    per-detection work (FLAME mesh decode, crops, rendering) over the dense
    [B, K] grid wastes most of its FLOPs on masked-out slots.  This gathers
    the top ``max_total`` slots batch-wide ordered (valid desc, score desc) —
    a fixed-shape compaction, so consumers decode M rows instead of B*K.

    Spec note: the reference consumes vertices strictly per-kept-head
    (``head_detector/detector.py:61-90``), never densely — compaction changes
    no observable result, only which slots get decoded.
    """
    b, k = res.scores.shape
    # composite sort key: valid first, then score descending
    key = jnp.where(res.valid.reshape(-1), res.scores.reshape(-1), -1.0)
    m = min(max_total, b * k)
    _, flat_idx = jax.lax.top_k(key, m)
    batch_idx = (flat_idx // k).astype(jnp.int32)
    slot_idx = (flat_idx % k).astype(jnp.int32)
    valid = res.valid.reshape(-1)[flat_idx]

    def pick(x):
        return x.reshape((b * k,) + x.shape[2:])[flat_idx]

    return CompactDetections(
        boxes=pick(res.boxes),
        scores=pick(res.scores),
        flame_params=pick(res.flame_params),
        valid=valid,
        anchor_idx=pick(res.anchor_idx),
        batch_idx=jnp.where(valid, batch_idx, 0),
        slot_idx=jnp.where(valid, slot_idx, 0),
    )


def batched_nms(
    boxes_xyxy: jnp.ndarray,  # [B, A, 4]
    scores: jnp.ndarray,  # [B, A] or [B, A, 1]
    flame_params: jnp.ndarray,  # [B, A, P]
    confidence_threshold: float = 0.5,
    iou_threshold: float = 0.5,
    pre_nms_max: int = 1000,
    post_nms_max: int = 100,
    fuse_flame: bool = False,
    fusion_iou: float = 0.7,
    return_neighbors: int = 0,
) -> NMSResult:
    """Batch NMS (vmapped). All outputs [B, post_nms_max, ...] + valid mask.

    With ``return_neighbors=n`` returns ``(NMSResult, NeighborInfo)`` with
    leading batch axes.
    """
    if scores.ndim == 3:
        scores = scores[..., 0]
    fn = lambda b, s, f: single_image_nms(
        b,
        s,
        f,
        confidence_threshold=confidence_threshold,
        iou_threshold=iou_threshold,
        pre_nms_max=pre_nms_max,
        post_nms_max=post_nms_max,
        fuse_flame=fuse_flame,
        fusion_iou=fusion_iou,
        return_neighbors=return_neighbors,
    )
    return jax.vmap(fn)(boxes_xyxy, scores, flame_params)
