"""Convert a rendered VGGHeads-layout split into FDDB layout for
``evaluation/evaluate_fddb.py`` (ref ``evaluation/evaluate_fddb.py:42-247``:
``label.txt`` with '# path' headers + ``x y x1 y1`` box lines).

Channel convention: the training pipeline reads renders with raw
``cv2.imread`` (array ch0 = NCC-x), while the eval CLIs convert BGR->RGB
before the predictor.  Images are therefore re-written channel-swapped so
that imread + BGR2RGB reproduces exactly the arrays the checkpoint was
trained on.

Usage::

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/make_fddb_standin.py \
        --src /root/data/synth512 --split val --out /root/data/fddb_standin
"""

from __future__ import annotations

import argparse
import glob
import os

import cv2
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--out", required=True)
    ap.add_argument("--limit", type=int, default=256)
    args = ap.parse_args()

    img_dir = os.path.join(args.src, args.split, "images")
    ann_dir = os.path.join(args.src, args.split, "annotations")
    out_img = os.path.join(args.out, "images")
    os.makedirs(out_img, exist_ok=True)

    lines = []
    names = sorted(os.path.basename(p) for p in glob.glob(
        os.path.join(img_dir, "*.jpg")))[: args.limit]
    for name in names:
        stem = os.path.splitext(name)[0]
        ann = np.load(os.path.join(ann_dir, stem + ".npz"))
        img = cv2.imread(os.path.join(img_dir, name), cv2.IMREAD_COLOR)
        # swap so the eval CLI's BGR2RGB restores the training-time array
        cv2.imwrite(os.path.join(out_img, name),
                    cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
        lines.append(f"# {name}")
        for x, y, w, h in np.asarray(ann["bbox"], np.float64):
            lines.append(
                f"{int(round(x))} {int(round(y))} "
                f"{int(round(x + w))} {int(round(y + h))}"
            )
    with open(os.path.join(args.out, "label.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"done: {len(names)} images -> {args.out}")


if __name__ == "__main__":
    main()
