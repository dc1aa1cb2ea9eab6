"""Interactive demo (reference ``gradio/app.py:7-33``).

Launches a gradio interface over the five draw modes when gradio is
installed; otherwise a CLI fallback that writes the rendered modes to disk
(same dispatch table either way).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

DRAW_MODES = ("full", "bbox", "landmarks", "points", "pose")


def build_demo(detector=None):
    import gradio as gr

    if detector is None:
        from head_detector_tpu.detector import HeadDetector

        detector = HeadDetector()

    def predict(image: np.ndarray, method: str):
        result = detector(image)
        return result.draw(method)

    return gr.Interface(
        fn=predict,
        inputs=[
            gr.Image(type="numpy", label="Input image"),
            gr.Radio(list(DRAW_MODES), value="full", label="Draw method"),
        ],
        outputs=gr.Image(type="numpy", label="Detections"),
        title="VGGHeads (TPU)",
        description="Single-shot 3D head detection + FLAME mesh on TPU.",
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default=None, help="CLI fallback: render one image")
    ap.add_argument("--out-dir", default="demo_out")
    ap.add_argument("--model", default="vgg_heads_l")
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()

    from head_detector_tpu.detector import HeadDetector

    detector = HeadDetector(model=args.model, checkpoint=args.checkpoint)

    try:
        import gradio  # noqa: F401

        build_demo(detector).launch()
        return
    except ImportError:
        pass

    if not args.image:
        raise SystemExit("gradio is not installed; pass --image for the CLI fallback")
    import cv2

    result = detector(args.image)
    os.makedirs(args.out_dir, exist_ok=True)
    for mode in DRAW_MODES:
        out = result.draw(mode)
        cv2.imwrite(
            os.path.join(args.out_dir, f"{mode}.jpg"),
            cv2.cvtColor(out, cv2.COLOR_RGB2BGR),
        )
    print(f"wrote {len(DRAW_MODES)} renders to {args.out_dir}; "
          f"{len(result.heads)} heads detected")


if __name__ == "__main__":
    main()
