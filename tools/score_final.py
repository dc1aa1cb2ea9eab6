"""Score the finished campaign's candidate checkpoints in ONE process.

On axon every process pays a cold 10-20 min compile of the eval forward
(persistent compile cache is disabled for TPU — CLAUDE.md); this driver
restores best-EMA, best-raw, and the average-best-N EMA weights and runs
all of them through a single jitted forward (same arch/size), so the
compile is paid once.  Exports the winner as f32 (protocol runs) and f16
(in-repo bench default) msgpacks.

VERDICT r4 items 1 + 6: held-out test-split score of record +
average_best_models actually exercised on a converged run (reference
trains with average_best_models: True, vgg_head_train_params.yaml:18-19).

Usage::

    python tools/score_final.py --ckpt-dir runs/campaign/flagship_r4 \
        --arch yolo_heads_m --image-size 512 --split test \
        --out /tmp/round5/final_scores.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--arch", default="yolo_heads_m")
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--data-dir", default="/root/data/synth512")
    ap.add_argument("--split", default="test")
    ap.add_argument("--average-best", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--max-boxes", type=int, default=4)
    ap.add_argument("--export-f32", default="/tmp/round5/best_ema_f32.msgpack")
    ap.add_argument("--export-f16", default="checkpoints/flagship_ema.msgpack")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import orbax.checkpoint as ocp

    from head_detector_tpu.flame import FlameModel
    from head_detector_tpu.models import build_model
    from head_detector_tpu.train.checkpoint import CheckpointManager, average_trees
    from head_detector_tpu.train.dataset import DAD3DHeadsDataset
    from head_detector_tpu.train.transforms import default_val_transforms
    from tools.eval_checkpoint import evaluate

    args.ckpt_dir = os.path.abspath(args.ckpt_dir)
    best_step = int(json.load(open(os.path.join(args.ckpt_dir, "best.json")))["step"])
    ckptr = ocp.PyTreeCheckpointer()
    best = ckptr.restore(os.path.join(args.ckpt_dir, str(best_step), "default"))

    mgr = CheckpointManager(args.ckpt_dir)
    avg_steps = mgr.best_steps(args.average_best)
    mgr.close()
    avg = average_trees([
        ckptr.restore(os.path.join(args.ckpt_dir, str(s), "default"))
        for s in avg_steps
    ]) if avg_steps else None

    model = build_model(args.arch)
    flame = FlameModel.from_assets()
    dataset = DAD3DHeadsDataset(
        args.data_dir, splits=[args.split], flame_model=flame,
        transforms=default_val_transforms(args.image_size))
    print(f"[score] split={args.split} n={len(dataset)} best_step={best_step} "
          f"avg_steps={sorted(avg_steps)}")

    candidates = {
        f"ema@{best_step}": {"params": best["ema_params"],
                             "batch_stats": best["batch_stats"]},
        f"raw@{best_step}": {"params": best["params"],
                             "batch_stats": best["batch_stats"]},
    }
    if avg is not None:
        candidates[f"avg{len(avg_steps)}_ema"] = {
            "params": avg["ema_params"], "batch_stats": avg["batch_stats"]}

    import jax

    # ONE jitted forward shared by every candidate arm: params are an
    # argument, so arms reuse the compiled executable instead of each
    # repaying the cold axon compile (which is what cut the avg-best arms
    # out of the first round-5 scorer run).
    shared_forward = jax.jit(lambda v, x: model.apply(v, x, train=False)[0])

    results = {}
    for name, variables in candidates.items():
        results[name] = evaluate(variables, model, flame, dataset,
                                 batch_size=args.batch_size,
                                 max_boxes=args.max_boxes,
                                 forward=shared_forward)
        print(f"[score] {name}: {results[name]}")

    # winner by the watched metric among the shippable (EMA) candidates
    ema_names = [n for n in results if "raw@" not in n]
    winner = min(ema_names, key=lambda n: results[n]["KeypointsNME"])
    print(f"[score] winner: {winner}")
    win_vars = candidates[winner]

    from head_detector_tpu.detector import save_variables

    meta = {"arch": args.arch, "image_size": args.image_size, "which": "ema",
            "step": winner.split("@")[-1] if "@" in winner
            else f"avg{len(avg_steps)}:{'+'.join(map(str, sorted(avg_steps)))}",
            "dtype": "f32", "split_scored": args.split,
            "KeypointsNME": results[winner]["KeypointsNME"]}
    if args.export_f32:
        os.makedirs(os.path.dirname(args.export_f32), exist_ok=True)
        save_variables(win_vars, args.export_f32)
        with open(args.export_f32 + ".json", "w") as f:
            json.dump(meta, f)
        print(f"[score] wrote {args.export_f32}")
    if args.export_f16:
        import jax

        out_vars = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float16)
            if np.asarray(x).dtype == np.float32 else np.asarray(x), win_vars)
        save_variables(out_vars, args.export_f16)
        with open(args.export_f16 + ".json", "w") as f:
            json.dump({**meta, "dtype": "f16"}, f)
        print(f"[score] wrote {args.export_f16}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"best_step": best_step, "avg_steps": sorted(avg_steps),
                       "results": results, "winner": winner}, f, indent=1,
                      default=float)
        print(f"[score] wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
