"""Failure-mode breakdown for the flagship campaign's folded val metric.

VERDICT r4 "What's weak" 7 / "Next round" 2: FR has been the binding
constraint for two rounds with "more epochs" the only treatment.  This tool
separates the failure modes behind the folded KeypointsNME / FailureRate
(which divide by detection accuracy, so misses AND false positives both
inflate them — see head_detector_tpu/metrics.py):

1. **Confidence-threshold sweep** — one dense forward + one low-threshold
   NMS pass per image; higher thresholds are simulated host-side by score
   filtering (exact for greedy NMS: a kept box's fate depends only on
   higher-scoring kept boxes, so keep(t) = {b in keep(t0) : score_b >= t}
   for t >= t0).  Reports tp/fp/fn, detection accuracy, RAW landmark NME
   over TPs, raw failure share, and the folded metrics of record per
   threshold — separating "the detector misses/hallucinates" from "the
   landmarks are bad".
2. **Miss buckets** at the protocol threshold: honest per-GT recall
   (IoU>=0.5 Hungarian match) by head size and per-image head count.
3. **False-positive taxonomy**: duplicate (IoU>=0.5 with a GT), localization
   (0.1..0.5), background (<0.1), with score quantiles.
4. **Assigner histogram** (train split): anchors assigned per GT by the
   task-aligned assigner at the current weights — detects assigner
   starvation (GTs that receive zero positive anchors never teach the
   classifier their appearance).  Ref assigner spec:
   yolo_head_training/yolo_head/yolo_head_loss.py:76-239; val protocol
   metrics/nme.py:115-124.

Usage (CPU or TPU)::

    python tools/diagnose_recall.py --ckpt-dir runs/campaign/flagship_r4 \
        --arch yolo_heads_m --image-size 512 --data-dir /root/data/synth512 \
        [--step N] [--which ema] [--out /tmp/diag.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE_BINS = (0, 32, 64, 96, 128, 192, 10_000)  # sqrt(gt box area), px
COUNT_BINS = (1, 2, 3, 99)  # heads per image


def _size_bucket(s: float) -> str:
    for lo, hi in zip(SIZE_BINS[:-1], SIZE_BINS[1:]):
        if lo <= s < hi:
            return f"{lo}-{hi if hi < 10_000 else 'inf'}"
    return "inf"


def _count_bucket(n: int) -> str:
    for c in COUNT_BINS[:-1]:
        if n == c:
            return str(c)
    return f"{COUNT_BINS[-2]}+"


def collect_predictions(variables, model, flame, dataset, batch_size, max_boxes,
                        head_idx, floor=0.05):
    """One dense forward + low-threshold NMS pass; per-image host arrays."""
    import jax
    import jax.numpy as jnp

    from head_detector_tpu.post_prediction import YoloHeadsPostPredictionCallback
    from head_detector_tpu.train.runner import _Prefetcher, _targets_to_samples

    callback = YoloHeadsPostPredictionCallback(
        flame_model=flame,
        confidence_threshold=floor / 2,  # sweep floor with margin
        nms_iou_threshold=0.7,
        pre_nms_max_predictions=300,
        post_nms_max_predictions=100,
    )
    forward = jax.jit(lambda v, x: model.apply(v, x, train=False)[0])
    records = []
    loader = _Prefetcher(dataset, batch_size, max_boxes, num_workers=2, seed=0)
    for images, targets in loader:
        decoded = forward(variables, jnp.asarray(images, jnp.float32) / 255.0)
        preds = callback(decoded)
        gts = _targets_to_samples(images, targets)
        for p, g in zip(preds, gts):
            keep = p.scores >= floor
            records.append({
                "scores": p.scores[keep],
                "boxes": p.bboxes_xyxy[keep],
                "v2d": p.predicted_2d_vertices[keep][:, head_idx, :2],
                "gt_xywh": g.bboxes_xywh,
                "gt_v2d": g.vertices_2d[:, head_idx, :2],
            })
    return records


def sweep(records, thresholds, nme_fail=0.05):
    """Protocol metrics + raw decomposition per confidence threshold."""
    from head_detector_tpu.metrics import match_head_boxes, xywh_to_xyxy_np

    rows = []
    for t in thresholds:
        tp = fp = fn = 0
        nme_sum = 0.0
        failures = 0
        for r in records:
            keep = r["scores"] >= t
            boxes, v2d = r["boxes"][keep], r["v2d"][keep]
            m = match_head_boxes(boxes, xywh_to_xyxy_np(r["gt_xywh"]), 0.5)
            tp += len(m.tp_matches)
            fp += len(m.fp_indexes)
            fn += len(m.fn_indexes)
            for pi, ti in m.tp_matches:
                bbox = r["gt_xywh"][ti]
                err = np.linalg.norm(v2d[pi] - r["gt_v2d"][ti], axis=-1).mean()
                norm = math.sqrt(bbox[2] * bbox[3])
                nme_sum += err / norm
                failures += float(err > nme_fail * norm)
        total = tp + fp + fn
        acc = tp / total if total else 0.0
        raw_nme = 100 * nme_sum / tp if tp else 100.0
        raw_fr = failures / tp if tp else 1.0
        rows.append({
            "threshold": t, "tp": tp, "fp": fp, "fn": fn,
            "accuracy": round(acc, 4),
            "raw_nme": round(raw_nme, 3),
            "raw_fr": round(raw_fr, 4),
            "folded_nme": round(raw_nme / acc, 3) if acc > 0 else 100.0,
            "folded_fr": round(1 - (1 - raw_fr) * acc, 4),
        })
    return rows


def buckets(records, threshold):
    """Honest per-GT recall by size / per-image count + FP taxonomy."""
    from head_detector_tpu.metrics import box_iou_np, match_head_boxes, xywh_to_xyxy_np

    by_size, by_count = {}, {}
    fp_tax = {"duplicate": 0, "localization": 0, "background": 0}
    fp_scores = []
    tp_nmes = []
    for r in records:
        keep = r["scores"] >= threshold
        boxes, v2d, scores = r["boxes"][keep], r["v2d"][keep], r["scores"][keep]
        gt_xyxy = xywh_to_xyxy_np(r["gt_xywh"])
        m = match_head_boxes(boxes, gt_xyxy, 0.5)
        matched_gt = {ti for _, ti in m.tp_matches}
        matched_pred = {pi for pi, _ in m.tp_matches}
        n_gt = len(r["gt_xywh"])
        for ti in range(n_gt):
            s = math.sqrt(r["gt_xywh"][ti][2] * r["gt_xywh"][ti][3])
            for key, d in ((_size_bucket(s), by_size),
                           (_count_bucket(n_gt), by_count)):
                hit, tot = d.get(key, (0, 0))
                d[key] = (hit + (ti in matched_gt), tot + 1)
        for pi, ti in m.tp_matches:
            bbox = r["gt_xywh"][ti]
            err = np.linalg.norm(v2d[pi] - r["gt_v2d"][ti], axis=-1).mean()
            tp_nmes.append(err / math.sqrt(bbox[2] * bbox[3]))
        for pi in range(len(boxes)):
            if pi in matched_pred:
                continue
            iou = box_iou_np(boxes[pi:pi + 1], gt_xyxy).max() if n_gt else 0.0
            kind = ("duplicate" if iou >= 0.5
                    else "localization" if iou >= 0.1 else "background")
            fp_tax[kind] += 1
            fp_scores.append(float(scores[pi]))
    fmt = lambda d: {k: {"recall": round(v[0] / v[1], 4), "n": v[1]}
                     for k, v in sorted(d.items())}
    q = (lambda p: round(float(np.quantile(fp_scores, p)), 3)) if fp_scores else (lambda p: None)
    tp_nmes = np.asarray(tp_nmes)
    return {
        "recall_by_size": fmt(by_size),
        "recall_by_count": fmt(by_count),
        "fp_taxonomy": fp_tax,
        "fp_score_quantiles": {"p50": q(0.5), "p90": q(0.9), "max": q(1.0)},
        "tp_nme_pct": {
            "mean": round(100 * float(tp_nmes.mean()), 3) if tp_nmes.size else None,
            "p50": round(100 * float(np.quantile(tp_nmes, 0.5)), 3) if tp_nmes.size else None,
            "p90": round(100 * float(np.quantile(tp_nmes, 0.9)), 3) if tp_nmes.size else None,
        },
    }


def assigner_histogram(variables, model, flame, dataset, batch_size, max_boxes,
                       n_batches, loss_cfg=None):
    """Anchors-per-GT under the task-aligned assigner at current weights."""
    import jax
    import jax.numpy as jnp

    from head_detector_tpu.train.assigner import task_aligned_assigner
    from head_detector_tpu.train.boxes import batch_distance2bbox
    from head_detector_tpu.train.loss import LossConfig
    from head_detector_tpu.train.runner import _Prefetcher

    cfg = loss_cfg or LossConfig()

    def raw_assign(v, x, gt_bboxes, pad_gt_mask):
        _, raw = model.apply(v, x, train=False)
        logits = raw.cls_score_list.astype(jnp.float32)
        distri = raw.reg_distri_list.astype(jnp.float32)
        stride, anchors = raw.stride_tensor, raw.anchor_points
        b, l, _ = distri.shape
        reg_max = distri.shape[-1] // 4 - 1
        dist = jax.nn.softmax(distri.reshape(b, l, 4, reg_max + 1), axis=-1)
        expected = jnp.einsum("blkm,m->blk", dist,
                              jnp.arange(reg_max + 1, dtype=jnp.float32))
        pred_bboxes = batch_distance2bbox((anchors / stride)[None], expected)
        assign = task_aligned_assigner(
            pred_scores=jax.nn.sigmoid(logits),
            pred_bboxes=pred_bboxes * stride[None],
            anchor_points=anchors,
            gt_bboxes=gt_bboxes, pad_gt_mask=pad_gt_mask,
            topk=cfg.bbox_assigner_topk, alpha=cfg.bbox_assigner_alpha,
            beta=cfg.bbox_assigner_beta,
        )
        # anchors per padded-gt slot: fg anchors grouped by assigned gt index
        one_hot = jax.nn.one_hot(assign.assigned_gt_index,
                                 gt_bboxes.shape[1], dtype=jnp.float32)
        return (one_hot * assign.fg_mask[..., None]).sum(axis=1)  # [B, N]

    fn = jax.jit(raw_assign)
    loader = _Prefetcher(dataset, batch_size, max_boxes, num_workers=2, seed=0)
    hist: dict = {}
    starved_by_size: dict = {}
    for bi, (images, targets) in enumerate(loader):
        if bi >= n_batches:
            break
        counts = np.asarray(fn(
            variables, jnp.asarray(images, jnp.float32) / 255.0,
            jnp.asarray(targets.gt_bboxes), jnp.asarray(targets.pad_gt_mask),
        ))
        mask = np.asarray(targets.pad_gt_mask)[..., 0] > 0
        gt = np.asarray(targets.gt_bboxes)
        for b in range(counts.shape[0]):
            for n in range(counts.shape[1]):
                if not mask[b, n]:
                    continue
                c = int(counts[b, n])
                hist[c] = hist.get(c, 0) + 1
                w = gt[b, n, 2] - gt[b, n, 0]
                h = gt[b, n, 3] - gt[b, n, 1]
                key = _size_bucket(math.sqrt(max(w * h, 0.0)))
                st, tot = starved_by_size.get(key, (0, 0))
                starved_by_size[key] = (st + (c == 0), tot + 1)
    return {
        "anchors_per_gt_hist": {str(k): v for k, v in sorted(hist.items())},
        "starved_share_by_size": {
            k: {"starved": round(v[0] / v[1], 4), "n": v[1]}
            for k, v in sorted(starved_by_size.items())
        },
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--step", type=int, default=None, help="default: best.json, else latest")
    ap.add_argument("--arch", default="yolo_heads_m")
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--which", choices=["raw", "ema"], default="ema")
    ap.add_argument("--data-dir", default="/root/data/synth512")
    ap.add_argument("--val-split", default="val")
    ap.add_argument("--train-split", default="train")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--max-boxes", type=int, default=4)
    ap.add_argument("--thresholds", default="0.05,0.1,0.2,0.3,0.4,0.5,0.6,0.7")
    ap.add_argument("--protocol-threshold", type=float, default=0.5)
    ap.add_argument("--assigner-batches", type=int, default=8)
    ap.add_argument("--records-cache", default=None,
                    help="npz path: save/reuse the TPU prediction pass so "
                         "host-side analysis reruns never recompile")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import orbax.checkpoint as ocp

    from head_detector_tpu.assets_io import get_indices
    from head_detector_tpu.flame import FlameModel
    from head_detector_tpu.models import build_model
    from head_detector_tpu.train.dataset import DAD3DHeadsDataset
    from head_detector_tpu.train.transforms import default_val_transforms

    args.ckpt_dir = os.path.abspath(args.ckpt_dir)
    step = args.step
    if step is None:
        best = os.path.join(args.ckpt_dir, "best.json")
        if os.path.exists(best):
            step = int(json.load(open(best))["step"])
        else:
            step = max(int(d) for d in os.listdir(args.ckpt_dir) if d.isdigit())
    restored = ocp.PyTreeCheckpointer().restore(
        os.path.join(args.ckpt_dir, str(step), "default"))
    params = restored["ema_params" if args.which == "ema" else "params"]
    variables = {"params": params, "batch_stats": restored["batch_stats"]}

    model = build_model(args.arch)
    flame = FlameModel.from_assets()
    head_idx = np.asarray(get_indices()["head"], np.int64)
    val_ds = DAD3DHeadsDataset(
        args.data_dir, splits=[args.val_split], flame_model=flame,
        transforms=default_val_transforms(args.image_size))

    print(f"[diag] step={step} which={args.which} val={len(val_ds)} imgs")
    cache = args.records_cache
    if cache and os.path.exists(cache):
        records = list(np.load(cache, allow_pickle=True)["records"])
        print(f"[diag] loaded {len(records)} cached prediction records")
    else:
        records = collect_predictions(
            variables, model, flame, val_ds, args.batch_size, args.max_boxes,
            head_idx)
        if cache:
            np.savez_compressed(cache, records=np.asarray(records, object))
            print(f"[diag] cached prediction records -> {cache}")
    thresholds = [float(t) for t in args.thresholds.split(",")]
    report = {
        "step": step, "which": args.which, "n_images": len(records),
        "sweep": sweep(records, thresholds),
        "protocol_threshold": args.protocol_threshold,
        "buckets": buckets(records, args.protocol_threshold),
    }
    if args.assigner_batches > 0:
        train_ds = DAD3DHeadsDataset(
            args.data_dir, splits=[args.train_split], flame_model=flame,
            transforms=default_val_transforms(args.image_size))
        report["assigner"] = assigner_histogram(
            variables, model, flame, train_ds, args.batch_size,
            args.max_boxes, args.assigner_batches)

    print(json.dumps(report, indent=1, default=float))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1, default=float)
        print(f"[diag] wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
