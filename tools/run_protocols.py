"""Run the DAD and FDDB evaluation protocols in ONE process.

On axon every process pays a cold multi-minute compile of the dense
forward (persistent compile cache is disabled for TPU — CLAUDE.md).
``EvalPredictor`` applies its post-prediction callback OUTSIDE the jitted
forward (`evaluation/predictor.py:76-83`), so one predictor instance can
serve both protocols by swapping the callback: the DAD pass (conf 0.2,
post-NMS 30 — ref ``evaluate_dad.py:236-316``) and the FDDB pass
(conf 0.5, pre 1000 / post 500 — ref ``evaluate_fddb.py:194-234``)
share the single expensive forward executable.

Usage::

    python tools/run_protocols.py --checkpoint /tmp/round5/best_ema_f32.msgpack \
        --arch yolo_heads_m --image-size 512 --out /tmp/round5/protocols.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--arch", default="yolo_heads_m")
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--dad-json", default="/root/data/dad_standin/dataset.json")
    ap.add_argument("--dad-base", default="/root/data/dad_standin")
    ap.add_argument("--fddb-dir", default="/root/data/fddb_standin")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from head_detector_tpu.evaluation.evaluate_dad import DadEvaluator, DadSample
    from head_detector_tpu.evaluation.evaluate_fddb import evaluate_fddb
    from head_detector_tpu.evaluation.predictor import EvalPredictor
    from head_detector_tpu.post_prediction import YoloHeadsPostPredictionCallback

    results = {"checkpoint": args.checkpoint, "arch": args.arch,
               "image_size": args.image_size}

    # DAD protocol settings (ref evaluate_dad.py:236-316)
    predictor = EvalPredictor(
        model_name=args.arch, checkpoint=args.checkpoint,
        image_size=args.image_size,
        confidence_threshold=0.2, nms_iou_threshold=0.5,
        post_nms_max_predictions=30,
    )
    with open(args.dad_json) as f:
        data = json.load(f)
    samples = []
    for _, values in data.items():
        samples += [DadSample.from_config(cfg, args.dad_base) for cfg in values]
    print(f"[protocols] DAD pass over {len(samples)} samples", flush=True)
    results["dad"] = DadEvaluator(samples, predictor)()

    # FDDB protocol settings (ref evaluate_fddb.py:194-234): swap the
    # callback only — the jitted forward (the compile) is reused.
    predictor.callback = YoloHeadsPostPredictionCallback(
        flame_model=predictor.flame,
        confidence_threshold=0.5, nms_iou_threshold=0.5,
        pre_nms_max_predictions=1000, post_nms_max_predictions=500,
    )
    print("[protocols] FDDB pass", flush=True)
    results["fddb"] = evaluate_fddb(args.fddb_dir, predictor)

    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1, default=float)
        print(f"[protocols] wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
