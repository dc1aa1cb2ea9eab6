"""Dataset integrity sweep (reference ``yolo_head_training/check_dataset.py``).

Runs every sample through the real transform + collate stack and validates
bbox areas >= 1, finite vertices, and mask consistency.

Usage: ``python -m head_detector_tpu.train.check_dataset --data-dir ...
[--splits split_00000] [--image-size 640] [--limit N]``
"""

from __future__ import annotations

import argparse

import numpy as np


def check_dataset(dataset, max_boxes: int = 30, limit: int = 0) -> dict:
    from head_detector_tpu.train.dataset import collate_samples

    bad = []
    n = len(dataset) if not limit else min(limit, len(dataset))
    total_heads = 0
    for i in range(n):
        sample = dataset[i]
        if len(sample.bboxes_xywh):
            areas = sample.bboxes_xywh[:, 2] * sample.bboxes_xywh[:, 3]
            if (areas < 1).any():
                bad.append((i, "bbox area < 1"))
            if not np.isfinite(sample.vertices_3d).all():
                bad.append((i, "non-finite vertices_3d"))
            if not np.isfinite(sample.vertices_2d).all():
                bad.append((i, "non-finite vertices_2d"))
        total_heads += len(sample.bboxes_xywh)
        # collate must accept every sample
        _, targets = collate_samples([sample], max_boxes)
        if int(np.asarray(targets.pad_gt_mask).sum()) != min(
            len(sample.bboxes_xywh), max_boxes
        ):
            bad.append((i, "collate mask mismatch"))
    report = {"checked": n, "heads": total_heads, "problems": bad}
    print(f"[check_dataset] {report['checked']} samples, "
          f"{report['heads']} heads, {len(bad)} problems")
    for i, what in bad[:20]:
        print(f"  sample {i}: {what}")
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--splits", nargs="*", default=None)
    ap.add_argument("--image-size", type=int, default=640)
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args()

    from head_detector_tpu.train.transforms import default_train_transforms

    if args.data_dir:
        from head_detector_tpu.train.dataset import DAD3DHeadsDataset

        ds = DAD3DHeadsDataset(
            args.data_dir, splits=args.splits,
            transforms=default_train_transforms(args.image_size),
        )
    else:
        print("[check_dataset] no --data-dir; sweeping the synthetic dataset")
        from head_detector_tpu.train.dataset import SyntheticHeadsDataset

        ds = SyntheticHeadsDataset(image_size=args.image_size, length=64)
    check_dataset(ds, limit=args.limit)


if __name__ == "__main__":
    main()
