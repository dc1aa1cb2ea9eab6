"""Evaluate a saved training checkpoint (raw and/or EMA params) on the
rendered-synthetic val protocol.

The trainer validates with EMA params when EMA is on — the reference ships
EMA weights (vgg_head_train_params.yaml:41-45) so that is the protocol of
record.  But the reference's decay (0.9997) assumes ~50-epoch runs; on a
short campaign the EMA average still carries early-training weights long
after the raw parameters have become useful.  This tool scores BOTH
parameter sets from any saved step so the learning curve of the underlying
model is visible alongside the EMA-lagged metric of record.

Usage::

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/eval_checkpoint.py \
        --ckpt-dir runs/campaign/synthetic_campaign [--step 1024] \
        [--image-size 320] [--val-length 64] [--max-heads 3] [--which both]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate(variables, model, flame, dataset, batch_size=16, max_boxes=30,
             forward=None, param_fusion=False, fusion_iou=0.7,
             confidence_threshold=0.5):
    import jax
    import jax.numpy as jnp

    from head_detector_tpu.metrics import (
        KeypointsFailureRate,
        KeypointsNME,
        RPYError,
    )
    from head_detector_tpu.post_prediction import YoloHeadsPostPredictionCallback
    from head_detector_tpu.train.runner import _Prefetcher, _targets_to_samples

    callback = YoloHeadsPostPredictionCallback(
        flame_model=flame,
        confidence_threshold=confidence_threshold,
        nms_iou_threshold=0.7,
        pre_nms_max_predictions=300,
        post_nms_max_predictions=30,
        param_fusion=param_fusion,
        fusion_iou=fusion_iou,
    )
    metrics = {
        "KeypointsNME": KeypointsNME(callback, indexes_subset="head"),
        "KeypointsFailureRate": KeypointsFailureRate(callback, indexes_subset="head"),
        "RPYError": RPYError(callback),
    }
    if forward is None:
        # NOTE: a fresh jax.jit wrapper per evaluate() call recompiles the
        # forward (full cold axon compile per candidate arm — the round-5
        # scorer lesson).  Multi-candidate callers must build ONE
        # jit(lambda v, x: model.apply(v, x, train=False)[0]) and pass it in;
        # params ride as an argument so every arm shares the executable.
        forward = jax.jit(lambda v, x: model.apply(v, x, train=False)[0])
    # Upload the param tree ONCE.  Passing host numpy trees straight into
    # the jitted forward re-ships ~140 MB (f32 M) over the axon relay on
    # EVERY batch — 64 test batches paced the round-5 scorer at the relay
    # (and its per-upload RSS retention), not the chip, until timeout.
    variables = jax.device_put(variables)
    loader = _Prefetcher(dataset, batch_size, max_boxes, num_workers=4, seed=0)
    n_images = 0
    for i, (images, targets) in enumerate(loader):
        decoded = forward(variables, jnp.asarray(images, jnp.float32) / 255.0)
        gt_samples = _targets_to_samples(images, targets)
        n_images += len(gt_samples)
        for m in metrics.values():
            m.update(decoded, gt_samples)
        if i % 8 == 0:
            print(f"[eval] batch {i} ({n_images} imgs)", flush=True)
    out = {}
    for name, m in metrics.items():
        val = m.compute()
        if isinstance(val, dict):
            out.update({k: float(v) for k, v in val.items()})
        else:
            out[name] = float(val)
    out["images"] = n_images
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--step", type=int, default=None, help="default: latest")
    ap.add_argument("--arch", default="yolo_heads_n")
    ap.add_argument("--image-size", type=int, default=320)
    ap.add_argument("--val-length", type=int, default=64)
    ap.add_argument("--max-heads", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--max-boxes", type=int, default=30,
                    help="GT pad width (match the trainer's max_gt_boxes so "
                         "crowd scenes are not silently truncated)")
    ap.add_argument("--which", choices=["raw", "ema", "both"], default="both")
    ap.add_argument("--data-dir", default=None,
                    help="VGGHeads-layout dataset root: score the on-disk "
                         "val split instead of the procedural generator")
    ap.add_argument("--val-split", default="val")
    ap.add_argument("--export-dtype", choices=["f32", "f16"], default="f32",
                    help="dtype for --export-msgpack leaves; f16 halves the "
                         "artifact for in-repo shipping (bench.py restores "
                         "to f32 at load)")
    ap.add_argument("--export-msgpack", default=None,
                    help="also write {params,batch_stats} (first --which "
                         "kind) as a flax msgpack for HeadDetector/bench")
    ap.add_argument("--no-eval", action="store_true",
                    help="skip metric evaluation (export-only)")
    ap.add_argument("--param-fusion", action="store_true",
                    help="WBF-style score-weighted FLAME-row fusion over "
                         "each kept box's suppressed neighbor anchors "
                         "(ops/nms.py); detection matching is unchanged")
    ap.add_argument("--fusion-iou", type=float, default=0.7)
    ap.add_argument("--conf", type=float, default=0.5,
                    help="decode confidence threshold (protocol: 0.5)")
    ap.add_argument("--average-best", type=int, default=0, metavar="N",
                    help="score the uniform weight-average of the N best "
                         "on-disk checkpoints by the watched metric — the "
                         "reference's average_best_models: True (SG "
                         "ModelWeightAveraging); overrides --step")
    args = ap.parse_args(argv)

    import orbax.checkpoint as ocp

    from head_detector_tpu.flame import FlameModel
    from head_detector_tpu.models import build_model
    from head_detector_tpu.train.dataset import SyntheticHeadsDataset

    args.ckpt_dir = os.path.abspath(args.ckpt_dir)  # orbax requires absolute
    steps = sorted(int(d) for d in os.listdir(args.ckpt_dir) if d.isdigit())
    ckptr = ocp.PyTreeCheckpointer()
    if args.average_best > 0:
        from head_detector_tpu.train.checkpoint import (
            CheckpointManager, average_trees,
        )

        mgr = CheckpointManager(args.ckpt_dir)
        best = mgr.best_steps(args.average_best)
        mgr.close()
        if not best:
            print("no metric history / on-disk steps to average"); return 1
        print(f"averaging {len(best)} best steps: {sorted(best)}")
        restored = average_trees([
            ckptr.restore(os.path.join(args.ckpt_dir, str(s), "default"))
            for s in best
        ])
        step = f"avg{len(best)}:{'+'.join(str(s) for s in sorted(best))}"
    else:
        step = args.step if args.step is not None else steps[-1]
        restored = ckptr.restore(
            os.path.join(args.ckpt_dir, str(step), "default")
        )

    model = build_model(args.arch)
    flame = FlameModel.from_assets()
    if args.data_dir:
        from head_detector_tpu.train.dataset import DAD3DHeadsDataset
        from head_detector_tpu.train.transforms import default_val_transforms

        dataset = DAD3DHeadsDataset(
            args.data_dir, splits=[args.val_split], flame_model=flame,
            transforms=default_val_transforms(args.image_size),
        )
    else:
        # the held-out val renders: same generator/seed convention as the
        # trainer CLI (train/__main__.py) — seed offset 1 from the train set
        dataset = SyntheticHeadsDataset(
            flame, image_size=args.image_size, length=args.val_length,
            max_heads=args.max_heads, seed=1, render=True,
        )

    which = (["raw", "ema"] if args.which == "both" else [args.which])
    for i, kind in enumerate(which):
        params = restored["params"] if kind == "raw" else restored["ema_params"]
        variables = {"params": params, "batch_stats": restored["batch_stats"]}
        if i == 0 and args.export_msgpack:
            import json as _json

            import numpy as _np

            from head_detector_tpu.detector import save_variables

            out_vars = variables
            if args.export_dtype == "f16":
                import jax

                out_vars = jax.tree_util.tree_map(
                    lambda x: _np.asarray(x, _np.float16)
                    if _np.asarray(x).dtype == _np.float32 else _np.asarray(x),
                    variables,
                )
            save_variables(out_vars, args.export_msgpack)
            # sidecar metadata: bench.py reads arch/size so the in-repo
            # default checkpoint is self-describing
            with open(args.export_msgpack + ".json", "w") as f:
                _json.dump({
                    "arch": args.arch, "image_size": args.image_size,
                    "which": kind, "step": str(step),
                    "dtype": args.export_dtype,
                }, f)
            print(f"[step {step}] wrote {kind} msgpack: {args.export_msgpack}")
        if args.no_eval:
            continue
        result = evaluate(variables, model, flame, dataset,
                          batch_size=args.batch_size,
                          max_boxes=args.max_boxes,
                          param_fusion=args.param_fusion,
                          fusion_iou=args.fusion_iou,
                          confidence_threshold=args.conf)
        print(f"[step {step}] {kind}: {result}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
