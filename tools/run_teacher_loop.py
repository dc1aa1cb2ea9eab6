"""End-to-end data-factory teacher loop with a TRAINED teacher (VERDICT r4
item 7).

Reference flow (``data_generator/mesh_dataset.py:37-246``): detector finds
head boxes -> extend 0.25 -> crop -> frozen DAD-3DNet teacher annotates the
crop -> per-image ``annotations/{stem}.npz`` in the DAD convention -> a
student trains on the pseudo-annotations.  Here both the detector and the
single-crop teacher are the trained flagship checkpoint
(:class:`head_detector_tpu.dad_teacher.FaceMeshPredictor`), and the student
is a yolo_heads_n trained ONLY on the pseudo-labels
(configs/teacher_student.yaml), scored against the real GT of the untouched
synth512 val split — a like-for-like teacher-vs-student round-trip metric.

Phases (run serially; each is one TPU program family)::

    python tools/run_teacher_loop.py prepare  [--src .../test] [--limit 512]
    python tools/run_teacher_loop.py annotate --checkpoint best.msgpack
    python tools/run_teacher_loop.py train     # via the trainer CLI
    python tools/run_teacher_loop.py report    # summarize annotations
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DEFAULT = "/root/data/teacher_loop"


def prepare(src: str, out: str, limit: int, val_src: str) -> None:
    images = sorted((Path(src) / "images").glob("*.jpg"))[:limit]
    train_img = Path(out) / "train" / "images"
    train_img.mkdir(parents=True, exist_ok=True)
    for p in images:
        dst = train_img / p.name
        if not dst.exists():
            os.symlink(p, dst)
    val = Path(out) / "val"
    if not val.exists():
        os.symlink(Path(val_src), val)
    print(f"[prepare] {len(images)} train images -> {train_img}; val -> {val_src}")


def annotate(out: str, checkpoint: str, arch: str, image_size: int) -> None:
    from head_detector_tpu.dad_teacher import FaceMeshPredictor
    from head_detector_tpu.data_factory.binary_detector import HeadBoxDetector
    from head_detector_tpu.data_factory.mesh_dataset import annotate_folder

    teacher = FaceMeshPredictor(model_name=arch, checkpoint=checkpoint)
    detector = HeadBoxDetector(
        model=arch, checkpoint=checkpoint, image_size=image_size,
        confidence_threshold=0.5,
    )
    t0 = time.time()
    n = annotate_folder(os.path.join(out, "train"), teacher=teacher,
                        detector=detector)
    print(f"[annotate] {n} images pseudo-annotated in {time.time() - t0:.0f}s")


def train() -> int:
    cmd = [sys.executable, "-m", "head_detector_tpu.train",
           "--config-name", "teacher_student"]
    print("[train]", " ".join(cmd))
    return subprocess.call(cmd)


def report(out: str) -> None:
    import numpy as np

    ann = sorted((Path(out) / "train" / "annotations").glob("*.npz"))
    heads = [np.load(p)["bbox"].shape[0] for p in ann]
    summary = {
        "annotated_images": len(ann),
        "total_pseudo_heads": int(np.sum(heads)) if heads else 0,
        "heads_per_image": round(float(np.mean(heads)), 3) if heads else 0.0,
    }
    print(json.dumps(summary))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("phase", choices=["prepare", "annotate", "train", "report"])
    ap.add_argument("--src", default="/root/data/synth512/test")
    ap.add_argument("--val-src", default="/root/data/synth512/val")
    ap.add_argument("--out", default=OUT_DEFAULT)
    ap.add_argument("--limit", type=int, default=512)
    ap.add_argument("--checkpoint", default="checkpoints/flagship_ema.msgpack")
    ap.add_argument("--arch", default="yolo_heads_m")
    ap.add_argument("--image-size", type=int, default=512)
    args = ap.parse_args(argv)

    if args.phase == "prepare":
        prepare(args.src, args.out, args.limit, args.val_src)
    elif args.phase == "annotate":
        annotate(args.out, args.checkpoint, args.arch, args.image_size)
    elif args.phase == "train":
        return train()
    else:
        report(args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
