"""Synthetic-image generation stack: pose conditioning, captioning, caption
augmentation, safety filtering, SDXL generation.

Functional spec: reference ``data_generator/{generation_pipeline,
generate_laion, yolo_pose_processor, image_captioning, caption_processor,
safety_checker}.py`` (SURVEY.md §2.6).

What runs natively here: the OpenPose-style skeleton renderer and the
COCO-17 -> OpenPose-18 keypoint remap (pure functions), plus the ethnicity
caption augmentation.  What is gated: SDXL/T2I-Adapter (diffusers), BLIP2/GIT
captioners and the SD safety checker (weights require network egress), and
GLiNER person-name NER — each class keeps the reference's interface and
raises an actionable error at construction when its dependency is missing.
"""

from __future__ import annotations

import random
from typing import List, Optional, Sequence

import cv2
import numpy as np

# OpenPose BODY_18 limb sequence and colors (public OpenPose convention,
# as rendered by the reference's draw_bodypose)
LIMB_SEQ = [
    (1, 2), (1, 5), (2, 3), (3, 4), (5, 6), (6, 7), (1, 8), (8, 9),
    (9, 10), (1, 11), (11, 12), (12, 13), (1, 0), (0, 14), (14, 16),
    (0, 15), (15, 17),
]
LIMB_COLORS = [
    (255, 0, 0), (255, 85, 0), (255, 170, 0), (255, 255, 0), (170, 255, 0),
    (85, 255, 0), (0, 255, 0), (0, 255, 85), (0, 255, 170), (0, 255, 255),
    (0, 170, 255), (0, 85, 255), (0, 0, 255), (85, 0, 255), (170, 0, 255),
    (255, 0, 255), (255, 0, 170),
]


def remap_coco17_to_openpose18(keypoints: Sequence) -> List:
    """COCO-17 keypoints -> OpenPose-18 order with a synthesised neck
    (ref yolo_pose_processor.remap_keypoints)."""

    def median(a, b):
        return ((a[0] + b[0]) / 2, (a[1] + b[1]) / 2, (a[2] + b[2]) / 2)

    k = keypoints
    return [
        k[0], median(k[5], k[6]), k[6], k[8], k[10], k[5], k[7], k[9],
        k[12], k[14], k[16], k[11], k[13], k[15], k[2], k[1], k[4], k[3],
    ]


def draw_bodypose(
    canvas: np.ndarray, keypoints: Sequence, conf_threshold: float = 0.5
) -> np.ndarray:
    """Render one OpenPose-18 skeleton (sticks + joints) onto the canvas."""
    h, w = canvas.shape[:2]
    stick_width = max(2, int(min(h, w) * 0.006))
    for (a, b), color in zip(LIMB_SEQ, LIMB_COLORS):
        ka, kb = keypoints[a], keypoints[b]
        if ka[2] < conf_threshold or kb[2] < conf_threshold:
            continue
        mx, my = (ka[0] + kb[0]) / 2, (ka[1] + kb[1]) / 2
        length = np.hypot(ka[0] - kb[0], ka[1] - kb[1])
        angle = np.degrees(np.arctan2(ka[1] - kb[1], ka[0] - kb[0]))
        poly = cv2.ellipse2Poly(
            (int(mx), int(my)), (int(length / 2), stick_width), int(angle), 0, 360, 1
        )
        cv2.fillConvexPoly(canvas, poly, color)
    for i, kp in enumerate(keypoints):
        if kp[2] >= conf_threshold:
            cv2.circle(canvas, (int(kp[0]), int(kp[1])), stick_width + 1,
                       LIMB_COLORS[i % len(LIMB_COLORS)], -1)
    return canvas


class PoseConditioningProcessor:
    """Image -> OpenPose conditioning render.  Needs an external COCO-pose
    model (the reference uses YOLO-NAS-Pose-L); pass any callable returning
    [N, 17, 3] keypoints."""

    def __init__(self, pose_model=None, img_size: int = 1024):
        if pose_model is None:
            raise RuntimeError(
                "PoseConditioningProcessor needs a COCO-keypoint pose model "
                "(reference: yolo_nas_pose_l). Pass pose_model=callable(image)"
                "->[N,17,3]; no pose weights ship with this environment."
            )
        self.pose_model = pose_model
        self.img_size = img_size

    def __call__(self, image: np.ndarray) -> np.ndarray:
        h, w = image.shape[:2]
        scale = self.img_size / min(h, w)
        image = cv2.resize(image, (int(w * scale), int(h * scale)))
        poses = self.pose_model(image)
        canvas = np.zeros_like(image)
        for pose in poses:
            canvas = draw_bodypose(canvas, remap_coco17_to_openpose18(pose))
        return canvas


ETHNIC_LABELS = {
    base: [f"{eth} {base}" for eth in (
        "Latino", "Black", "Asian", "White", "Middle Eastern", "Indigenous",
        "Pacific Islander", "Mixed race", "Afro-Latino", "South Asian",
        "Southeast Asian", "East Asian", "Biracial", "Multiracial", "Arab",
    )]
    for base in ("male", "female", "person", "man", "woman")
}
ETHNIC_LABELS["people"] = ["people", "people of different races"]


class CaptionProcessor:
    """Diversity augmentation + (gated) person-name NER filter
    (ref caption_processor.py)."""

    def __init__(self, use_ner: bool = True, rng: Optional[random.Random] = None):
        self.rng = rng or random.Random()
        self.model = None
        if use_ner:
            try:
                from gliner import GLiNER  # noqa: F401

                self.model = GLiNER.from_pretrained("urchade/gliner_largev2")
            except Exception as e:
                raise RuntimeError(
                    "GLiNER is unavailable in this environment (no package / "
                    "no egress for weights). Construct CaptionProcessor("
                    "use_ner=False) to use only the augmentation."
                ) from e

    def add_ethnic_labels(self, prompt: str, p: float = 0.8) -> str:
        words = prompt.split()
        for i, word in enumerate(words):
            if word in ETHNIC_LABELS and self.rng.random() < p:
                words[i] = self.rng.choice(ETHNIC_LABELS[word])
        return " ".join(words)

    def contains_person(self, prompt: str) -> bool:
        if self.model is None:
            raise RuntimeError("NER model not loaded (use_ner=False)")
        entities = self.model.predict_entities(prompt, ["first name", "last name"])
        return len(entities) > 0


def _gated(name: str, pip_hint: str):
    def ctor(*_a, **_k):
        raise RuntimeError(
            f"{name} requires external model weights / packages ({pip_hint}) "
            "that this zero-egress environment cannot host. The interface "
            "matches the reference; wire it up where the weights exist."
        )

    return ctor


# SDXL + T2I-Adapter generation (ref generation_pipeline.py / generate_laion.py)
GenerationPipeline = _gated("GenerationPipeline", "diffusers, RealVisXL_V4.0, t2i-adapter-openpose-sdxl")
# BLIP/BLIP2/GIT captioner zoo (ref image_captioning.py)
ImageCaptioner = _gated("ImageCaptioner", "transformers BLIP2/GIT checkpoints")
# SD safety checker + NSFW ensemble (ref safety_checker.py)
SafetyChecker = _gated("SafetyChecker", "CompVis safety checker weights")
