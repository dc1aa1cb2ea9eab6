"""Qualitative batch visualisation over an arbitrary image folder.

Functional spec: reference ``evaluation/test_folder.py:43-118`` — run the
detector over every image in a folder and save the rendered overlays.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import cv2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-dir", required=True)
    ap.add_argument("--output-dir", default="test_folder_out")
    ap.add_argument("--model", default="vgg_heads_l")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--draw", default="full",
                    choices=("full", "bbox", "landmarks", "points", "pose"))
    ap.add_argument("--confidence", type=float, default=0.5)
    args = ap.parse_args()

    from head_detector_tpu.detector import HeadDetector

    detector = HeadDetector(model=args.model, checkpoint=args.checkpoint)
    os.makedirs(args.output_dir, exist_ok=True)
    exts = (".jpg", ".jpeg", ".png")
    total_heads = 0
    for image_path in sorted(Path(args.input_dir).iterdir()):
        if image_path.suffix.lower() not in exts:
            continue
        result = detector(str(image_path), confidence_threshold=args.confidence)
        total_heads += len(result.heads)
        rendered = result.draw(args.draw)
        cv2.imwrite(
            os.path.join(args.output_dir, image_path.name),
            cv2.cvtColor(rendered, cv2.COLOR_RGB2BGR),
        )
    print(f"rendered folder -> {args.output_dir} ({total_heads} heads)")


if __name__ == "__main__":
    main()
