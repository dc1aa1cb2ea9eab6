"""Aligned-crop extraction CLI + the batched on-device warp path.

Functional spec: reference ``evaluation/head_alignment.py:106-197`` (the
prototype of ``PredictionResult.get_aligned_heads``).  Beyond the host path,
:func:`aligned_heads_batched` performs BASELINE.json config-3's "aligned head
crops (batched warp)": all heads of an image are roll-aligned and cropped to
a fixed square size in ONE device gather program
(:mod:`head_detector_tpu.ops.warp`) instead of one cv2.warpAffine per head.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path
from typing import List

import cv2
import numpy as np

from head_detector_tpu.detection_result import MAX_YAW, PredictionResult
from head_detector_tpu.ops.warp import affine_warp, invert_affine
from head_detector_tpu.utils import (
    HEAD_INDICES,
    extend_bbox,
    extend_to_rect,
    flame_params_skull_center,
)


def _head_crop_matrix(head, image: np.ndarray, out_size: int) -> np.ndarray:
    """Forward affine (original image -> out_size x out_size aligned crop)."""
    roll = head.head_pose.roll if abs(head.head_pose.yaw) < MAX_YAW else 0.0
    center = flame_params_skull_center(head.flame_params, image)
    rot = cv2.getRotationMatrix2D((float(center[0]), float(center[1])), roll, 1.0)

    # bbox of the head vertices in the rotated frame
    pts = np.take(head.vertices_3d[:, :2], HEAD_INDICES, axis=0)
    pts_h = np.concatenate([pts, np.ones_like(pts[:, :1])], axis=1)
    rpts = pts_h @ rot.T
    x, y = rpts[:, 0].min(), rpts[:, 1].min()
    w, h = rpts[:, 0].max() - x, rpts[:, 1].max() - y
    bx, by, bw, bh = extend_to_rect(extend_bbox(np.array([x, y, w, h]), offset=0.1))

    # compose: rotate about skull center, then map the square bbox to out_size
    s = out_size / max(bw, 1)
    post = np.array([[s, 0, -bx * s], [0, s, -by * s]], np.float64)
    rot3 = np.vstack([rot, [0, 0, 1]])
    return (post @ rot3).astype(np.float32)


def aligned_heads_batched(result: PredictionResult, out_size: int = 256) -> np.ndarray:
    """All heads -> [N, out_size, out_size, 3] float crops in one device warp."""
    import jax.numpy as jnp

    if not result.heads:
        return np.zeros((0, out_size, out_size, 3), np.float32)
    mats = np.stack(
        [_head_crop_matrix(h, result.original_image, out_size) for h in result.heads]
    )
    crops = affine_warp(
        jnp.asarray(result.original_image),
        jnp.asarray(invert_affine(mats)),
        out_size,
        out_size,
    )
    return np.asarray(crops)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-dir", required=True)
    ap.add_argument("--output-dir", default="aligned_heads")
    ap.add_argument("--model", default="vgg_heads_l")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--device-batched", action="store_true",
                    help="use the single-program batched warp")
    args = ap.parse_args()

    from head_detector_tpu.detector import HeadDetector

    detector = HeadDetector(model=args.model, checkpoint=args.checkpoint)
    os.makedirs(args.output_dir, exist_ok=True)
    count = 0
    for image_path in sorted(Path(args.input_dir).glob("*.jpg")):
        result = detector(str(image_path))
        if args.device_batched:
            crops: List[np.ndarray] = list(
                aligned_heads_batched(result, args.size).astype(np.uint8)
            )
        else:
            crops = result.get_aligned_heads()
        for i, crop in enumerate(crops):
            if crop.size == 0:
                continue
            out = os.path.join(args.output_dir, f"{image_path.stem}_head{i}.jpg")
            cv2.imwrite(out, cv2.cvtColor(np.asarray(crop), cv2.COLOR_RGB2BGR))
            count += 1
    print(f"wrote {count} aligned crops to {args.output_dir}")


if __name__ == "__main__":
    main()
