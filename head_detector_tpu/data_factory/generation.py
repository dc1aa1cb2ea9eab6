"""Synthetic-image generation stack: pose conditioning, captioning, caption
augmentation, safety filtering, generation backends.

Functional spec: reference ``data_generator/{generation_pipeline,
generate_laion, yolo_pose_processor, image_captioning, caption_processor,
safety_checker}.py`` (SURVEY.md §2.6).

What runs natively here: the OpenPose-style skeleton renderer and the
COCO-17 -> OpenPose-18 keypoint remap (pure functions), the ethnicity
caption augmentation, the full :class:`DataGenerator` driver protocol
(``generate_laion.py:25-106``: caption filter/augment -> pose-conditioned
generation -> safety gate -> split folders), a pose-conditioned
:class:`FlameRenderBackend` generation backend (native rasterizer; honours
the OpenPose conditioning's head keypoints for placement) and a
:class:`DetectorCaptioner` (head-count template captions).  What is gated:
SDXL/T2I-Adapter (diffusers), BLIP2/GIT captioners and the SD safety checker
(weights require network egress), and GLiNER person-name NER — each keeps
the reference's interface and raises an actionable error at construction
when its dependency is missing.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import random
import uuid
import warnings
import zlib
from typing import Callable, List, Optional, Sequence

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


def parse_pose_heads(pose_image: np.ndarray, conf_threshold: float = 0.5
                     ) -> List[np.ndarray]:
    """Recover per-person head anchors from a rendered OpenPose canvas.

    The conditioning the reference feeds SDXL is the *rendered skeleton
    image* (``generate_laion.py:77-90``), not keypoints — so a conditioning-
    honouring backend must read head placement back off the canvas.  The
    canvas is drawn with known joint colors (:func:`draw_bodypose`), so the
    face joints are recoverable as color blobs.  The usable colors are the
    ones that appear ONLY on faces: the eye/ear joints 14/15/16 and the
    face-limb sticks 13-16 — colors 85/170/255-magenta family.  The nose
    joint's (255,0,0) is NOT usable: the neck->shoulder limb stick is drawn
    in the same color, which would turn every shoulder line into a phantom
    head.  A cluster must show >=2 distinct face colors (a lone ankle joint
    circle shares color (85,0,255) with the nose->eye stick, so a single
    color is not evidence of a face).  Conditioning images ride disk as JPEG
    (``generate_laion.py:77``), so the match is tolerance-based, not exact.
    Returns one ``[cx, cy, size]`` array per detected head, where ``size``
    is a head-diameter estimate from the face-joint spread.
    """
    del conf_threshold  # drawn joints already passed the draw threshold
    face_colors = [LIMB_COLORS[13], LIMB_COLORS[14], LIMB_COLORS[15],
                   LIMB_COLORS[16]]  # (85|170|255,0,255), (255,0,170)
    img = pose_image.astype(np.int32)
    masks = []
    for color in face_colors:
        d = img - np.array(color, np.int32)
        masks.append((d * d).sum(axis=-1) < 60 ** 2)
    face_mask = np.logical_or.reduce(masks).astype(np.uint8)
    if not face_mask.any():
        return []
    # Group face-joint pixels into per-person clusters: joints of one face
    # are within a few stick-widths of each other; dilate to bridge them.
    h, w = face_mask.shape
    k = max(3, int(min(h, w) * 0.04) | 1)
    bridged = cv2.dilate(face_mask, np.ones((k, k), np.uint8))
    n, labels = cv2.connectedComponents(bridged)
    heads = []
    for lab in range(1, n):
        in_cluster = (labels == lab) & (face_mask > 0)
        distinct = sum(1 for m in masks if (m & in_cluster).any())
        if distinct < 2:
            continue
        ys, xs = np.nonzero(in_cluster)
        if xs.size < 4:
            continue
        cx, cy = float(xs.mean()), float(ys.mean())
        spread = float(max(xs.max() - xs.min(), ys.max() - ys.min()))
        size = max(spread * 2.2, min(h, w) * 0.04)
        heads.append(np.array([cx, cy, size], np.float32))
    return heads


class FlameRenderBackend:
    """Egress-free generation backend: FLAME-head scenes via the native
    rasterizer, honouring OpenPose conditioning for head placement.

    Drop-in for the reference's SDXL+T2I-Adapter pipeline *in the one aspect
    this framework's data factory consumes* — images containing heads at the
    pose-conditioned locations, which then flow through pseudo-annotation
    (``mesh_dataset.py``) and the cleaning filters.  The caption seeds the
    scene deterministically (same caption+pose -> same image, the fixed-seed
    diffusion analogue); its text content is otherwise not interpreted.

    Call signature matches how ``DataGenerator`` invokes the reference
    pipeline (``generate_laion.py:84-91``): ``backend(caption,
    pose_image) -> RGB uint8``.
    """

    def __init__(self, image_size: int = 1024, max_heads: int = 4, seed: int = 0):
        self.image_size = int(image_size)
        self.max_heads = int(max_heads)
        self.seed = int(seed)
        self._decode = None  # lazy: jitted canonical FLAME decode

    def _setup(self):
        if self._decode is not None:
            return
        import jax
        import jax.numpy as jnp

        from head_detector_tpu.assets_io import load_flame_assets
        from head_detector_tpu.flame import FlameModel, flame_vertices
        from head_detector_tpu.head_info import FLAME_CONSTS, FlameParams
        from head_detector_tpu.native import rasterize_zbuffer_native
        from head_detector_tpu.pncc import compute_ncc_color_codes

        flame = FlameModel.from_assets()
        assets = load_flame_assets()
        self._faces = np.ascontiguousarray(assets.faces, np.int32)
        self._colors = np.ascontiguousarray(
            compute_ncc_color_codes(assets.v_template.astype(np.float64)),
            np.float32,
        )
        self._rasterize = rasterize_zbuffer_native

        @jax.jit
        def decode(params):
            p = FlameParams.from_3dmm(params, FLAME_CONSTS)
            return flame_vertices(flame, p, zero_rot=True)

        self._decode = lambda p: np.asarray(decode(jnp.asarray(p)))

    def __call__(self, caption: str, pose_image: Optional[np.ndarray] = None,
                 ) -> np.ndarray:
        self._setup()
        s = self.image_size
        rng = np.random.RandomState(
            (self.seed * 1000003 + zlib.crc32(caption.encode())) % (2 ** 31)
        )
        heads = parse_pose_heads(pose_image) if pose_image is not None else []
        if pose_image is not None and heads:
            sy = s / pose_image.shape[0]
            sx = s / pose_image.shape[1]
            heads = [np.array([h[0] * sx, h[1] * sy, h[2] * (sx + sy) / 2],
                              np.float32) for h in heads]
        if not heads:
            n = int(rng.randint(1, self.max_heads + 1))
            for _ in range(n):
                size = float(np.exp(rng.uniform(np.log(0.1), np.log(0.4)))) * s
                cx = rng.uniform(size / 2, s - size / 2)
                cy = rng.uniform(size / 2, s - size / 2)
                heads.append(np.array([cx, cy, size], np.float32))
        heads = heads[: self.max_heads]

        n = len(heads)
        params = np.zeros((n, 413), np.float32)
        params[:, :300] = rng.normal(0, 0.3, (n, 300))
        params[:, 300:400] = rng.normal(0, 0.3, (n, 100))
        params[:, 400] = np.abs(rng.normal(0, 0.12, n))
        rolls = rng.uniform(-30, 30, n)
        yaws = rng.uniform(-60, 60, n)
        pitches = rng.uniform(-35, 35, n)
        verts = self._decode(params)  # [n, V, 3] canonical

        # low-frequency background (same family as the training renders)
        c0 = rng.uniform(30, 110, 3)
        c1 = rng.uniform(30, 110, 3)
        theta = rng.uniform(0, 2 * np.pi)
        xx, yy = np.meshgrid(np.linspace(0, 1, s), np.linspace(0, 1, s))
        t = np.cos(theta) * xx + np.sin(theta) * yy
        t = (t - t.min()) / max(t.max() - t.min(), 1e-6)
        image = c0[None, None] * (1 - t[..., None]) + c1[None, None] * t[..., None]
        image = np.clip(image + rng.normal(0, 6.0, image.shape), 0, 255
                        ).astype(np.uint8)

        for h, (cx, cy, size) in enumerate(np.asarray(heads)):
            cr, sr = np.cos(np.radians(rolls[h])), np.sin(np.radians(rolls[h]))
            cy_, sy_ = np.cos(np.radians(yaws[h])), np.sin(np.radians(yaws[h]))
            cp, sp = np.cos(np.radians(pitches[h])), np.sin(np.radians(pitches[h]))
            rz = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
            ry = np.array([[cy_, 0, sy_], [0, 1, 0], [-sy_, 0, cy_]])
            rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
            rv = verts[h] @ (rz @ ry @ rx).T
            ext = max(rv[:, 0].max() - rv[:, 0].min(),
                      rv[:, 1].max() - rv[:, 1].min())
            rv = rv * (size / max(ext, 1e-6))
            center = (rv.max(0) + rv.min(0)) / 2.0
            rv = rv - center
            rv[:, :2] += np.array([cx, cy])
            rv[:, 2] *= -1.0  # camera-facing depth
            canvas, hit = self._rasterize(
                np.ascontiguousarray(rv, np.float32), self._faces, self._colors,
                height=s, width=s,
            )
            m = hit.astype(bool)
            image[m] = np.clip(canvas[m] * 255.0, 0, 255).astype(np.uint8)
        return image


class DetectorCaptioner:
    """Head-count template captioner: the egress-free stand-in for the BLIP2
    zoo (ref ``image_captioning.py`` — the captions only exist to drive the
    caption processor's person-word augmentation, so a caption built from
    the detector's own head count carries exactly the signal the downstream
    pipeline consumes).  Pass any ``image -> List[Box]`` callable."""

    _COUNTS = {1: "a person", 2: "two people", 3: "three people"}

    def __init__(self, detector: Callable):
        self.detector = detector

    def __call__(self, image: np.ndarray) -> str:
        n = len(self.detector(image))
        if n == 0:
            return "an empty scene"
        subject = self._COUNTS.get(n, "a group of people")
        return f"a photo of {subject}"


NEGATIVE_PROMPT = ("worst quality, low quality, sketch, bad anatomy, bad "
                   "body, bad face, nsfw, nudity, violence")
MAX_ASPECT_RATIO = 2
MAX_TASKS = 100


class DataGenerator:
    """The ``generate_laion`` driver (ref ``generate_laion.py:25-106``):
    caption NER-filter + diversity augmentation -> pose-conditioned
    generation -> safety gate -> ``split_NNNNN/images/*.jpg``.

    Backends are injectable; the default is the egress-free
    :class:`FlameRenderBackend` (the SDXL pipeline stays available as the
    gated :data:`GenerationPipeline` ctor).  ``safety_checker`` defaults to
    None = no gate (the reference's SD safety-checker weights cannot be
    hosted here); pass any ``image -> bool (unsafe)`` callable.
    """

    def __init__(self, pipeline: Optional[Callable] = None,
                 caption_processor: Optional["CaptionProcessor"] = None,
                 safety_checker: Optional[Callable] = None,
                 rng: Optional[random.Random] = None):
        self.pipeline = pipeline if pipeline is not None else FlameRenderBackend()
        self.caption_processor = (caption_processor if caption_processor
                                  is not None else CaptionProcessor(use_ner=False))
        self.safety_checker = safety_checker
        self.rng = rng or random.Random(0)

    @staticmethod
    def valid_image(image: np.ndarray) -> bool:
        h, w = image.shape[0], image.shape[1]
        return h / w <= MAX_ASPECT_RATIO and w / h <= MAX_ASPECT_RATIO

    @staticmethod
    def generate_unique_filename(prefix: Optional[str] = None) -> str:
        name = uuid.uuid4().hex
        return f"{prefix}_{name}" if prefix is not None else name

    @staticmethod
    def _get_start_end_index(images: List[str]):
        if "SLURM_ARRAY_TASK_ID" not in os.environ:
            return 0, len(images)
        task_id = int(os.environ["SLURM_ARRAY_TASK_ID"])
        per_bucket = len(images) // MAX_TASKS
        if per_bucket == 0:
            warnings.warn(
                f"conditioning set ({len(images)} images) smaller than "
                f"MAX_TASKS={MAX_TASKS}; task {task_id} gets a round-robin "
                "share instead of the reference's empty range"
            )
            return task_id, task_id + 1 if task_id < len(images) else task_id
        end = (task_id + 1) * per_bucket
        if task_id == MAX_TASKS - 1:
            # the reference's arithmetic drops the len%MAX_TASKS tail
            # (data_generator/generate_laion.py:40-44); give it to the last task
            end = len(images)
        return task_id * per_bucket, min(len(images), end)

    @staticmethod
    def _get_folder_name() -> str:
        if "SLURM_ARRAY_TASK_ID" not in os.environ:
            return "split_00000"
        return f"split_{int(os.environ['SLURM_ARRAY_TASK_ID']):05d}"

    def generate(self, data_path: str, save_dir: str) -> List[str]:
        """Returns the list of written image paths (the reference returns
        nothing; the list makes the driver testable)."""
        folder = self._get_folder_name()
        with open(os.path.join(data_path, "annotations.json")) as f:
            annotations = json.load(f)
        out_dir = os.path.join(save_dir, folder, "images")
        os.makedirs(out_dir, exist_ok=True)
        pose_images = sorted(
            _glob.glob(f"{data_path}/**/images/*.jpg", recursive=True)
        ) or sorted(_glob.glob(f"{data_path}/**/images/*.png", recursive=True))
        start, end = self._get_start_end_index(pose_images)
        written = []
        for index in range(start, end):
            # per-image try/except: one bad input (unreadable image, missing
            # caption) must not abort the bucket (ref generate_laion.py:68-97)
            try:
                image_path = pose_images[index]
                filename = os.path.splitext(os.path.basename(image_path))[0]
                out_path = os.path.join(out_dir, f"{filename}.jpg")
                if os.path.exists(out_path):
                    continue
                pose_image = cv2.cvtColor(
                    cv2.imread(image_path), cv2.COLOR_BGR2RGB
                )
                if not self.valid_image(pose_image):
                    continue
                caption = annotations[filename]["caption"]
                if self.caption_processor.model is not None and \
                        self.caption_processor.contains_person(caption):
                    continue
                caption = self.caption_processor.add_ethnic_labels(caption)
                if self.rng.random() < 0.5:
                    caption = f"{caption}, ultra highres"
                image = self.pipeline(caption, pose_image)
                if self.safety_checker is not None and \
                        self.safety_checker(image):
                    continue
                cv2.imwrite(out_path, cv2.cvtColor(image, cv2.COLOR_RGB2BGR),
                            [cv2.IMWRITE_JPEG_QUALITY, 95])
                written.append(out_path)
            except Exception as e:  # noqa: BLE001 — reference semantics
                print(f"Error: {e}")
        return written


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
