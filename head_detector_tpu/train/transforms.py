"""Geometric + photometric training transforms (host numpy/cv2).

Functional specs: reference ``yolo_head_training/yolo_head/transforms/``
(``mesh_longest_max_size.py``, ``mesh_pad_if_needed.py``,
``mesh_random_affine.py`` incl. the in-plane GT-rotation-matrix update, and
``mesh_random_rotate_90.py``), plus the albumentations photometric pipeline
hard-coded in the reference dataset (``dataset.py:66-92``) re-implemented in
numpy/cv2 (albumentations is not available in this environment; the subset
below covers blur / gaussian noise / downscale / jpeg / rgb-shift /
channel-shuffle / grayscale-sepia with the same probabilities).

These run on the host: they are cheap per-sample byte ops, and keeping them
off the TPU keeps the compiled train step static-shaped.  Randomness uses an
explicit ``np.random.RandomState`` for reproducibility.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import cv2
import numpy as np

from head_detector_tpu.train.mesh_sample import MeshEstimationSample


def xywh_to_xyxy(b: np.ndarray) -> np.ndarray:
    out = b.copy().astype(np.float32)
    out[:, 2] = b[:, 0] + b[:, 2]
    out[:, 3] = b[:, 1] + b[:, 3]
    return out


def xyxy_to_xywh(b: np.ndarray) -> np.ndarray:
    out = b.copy().astype(np.float32)
    out[:, 2] = b[:, 2] - b[:, 0]
    out[:, 3] = b[:, 3] - b[:, 1]
    return out


class MeshLongestMaxSize:
    """Scale so the longest side fits (max_height, max_width)."""

    def __init__(self, max_height: int, max_width: int, prob: float = 1.0,
                 rng: Optional[np.random.RandomState] = None):
        self.max_height = max_height
        self.max_width = max_width
        self.prob = prob
        self.rng = rng or np.random.RandomState()

    def apply_to_sample(self, sample: MeshEstimationSample) -> MeshEstimationSample:
        if self.rng.rand() >= self.prob:
            return sample
        height, width = sample.image.shape[:2]
        scale = min(self.max_height / height, self.max_width / width)
        if scale != 1.0:
            new_h, new_w = (int(d * scale + 0.5) for d in (height, width))
            sample.image = cv2.resize(
                sample.image, (new_w, new_h), interpolation=cv2.INTER_LINEAR
            )
        kp = sample.vertices_2d.astype(np.float32, copy=True)
        kp[:, :, 0:2] *= scale
        sample.vertices_2d = kp
        if sample.bboxes_xywh is not None:
            sample.bboxes_xywh = np.multiply(sample.bboxes_xywh, scale, dtype=np.float32)
        if sample.areas is not None:
            sample.areas = np.multiply(sample.areas, scale**2, dtype=np.float32)
        return sample


class MeshPadIfNeeded:
    """Pad to at least (min_height, min_width), bottom_right or center."""

    def __init__(self, min_height: int, min_width: int, image_pad_value: int = 127,
                 padding_mode: str = "bottom_right"):
        if padding_mode not in ("bottom_right", "center"):
            raise ValueError(f"Unknown padding mode: {padding_mode}")
        self.min_height = min_height
        self.min_width = min_width
        self.image_pad_value = image_pad_value
        self.padding_mode = padding_mode

    def apply_to_sample(self, sample: MeshEstimationSample) -> MeshEstimationSample:
        height, width = sample.image.shape[:2]
        if self.padding_mode == "bottom_right":
            pad_left = pad_top = 0
            pad_bottom = max(0, self.min_height - height)
            pad_right = max(0, self.min_width - width)
        else:
            pad_left = max(0, (self.min_width - width) // 2)
            pad_top = max(0, (self.min_height - height) // 2)
            pad_bottom = max(0, self.min_height - height - pad_top)
            pad_right = max(0, self.min_width - width - pad_left)

        value = tuple([self.image_pad_value] * sample.image.shape[-1])
        sample.image = cv2.copyMakeBorder(
            sample.image, pad_top, pad_bottom, pad_left, pad_right,
            borderType=cv2.BORDER_CONSTANT, value=value,
        )
        kp = sample.vertices_2d.copy()
        kp[:, :, 0] += pad_left
        kp[:, :, 1] += pad_top
        sample.vertices_2d = kp
        if sample.bboxes_xywh is not None:
            bb = sample.bboxes_xywh.copy()
            bb[:, 0] += pad_left
            bb[:, 1] += pad_top
            sample.bboxes_xywh = bb
        return sample


class MeshRandomAffineTransform:
    """Random rotate/scale/translate; also rotates the GT rotation matrices
    in-plane (ref ``mesh_random_affine.py:apply_to_matrix``)."""

    def __init__(
        self,
        max_rotation: float = 45.0,
        min_scale: float = 0.5,
        max_scale: float = 2.0,
        max_translate: float = 0.1,
        image_pad_value: Union[int, Sequence[int]] = 127,
        interpolation_modes: Tuple[int, ...] = (0, 1, 2, 3, 4),
        prob: float = 0.5,
        rng: Optional[np.random.RandomState] = None,
    ):
        self.max_rotation = max_rotation
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.max_translate = max_translate
        self.image_pad_value = image_pad_value
        self.interpolation_modes = tuple(interpolation_modes)
        self.prob = prob
        self.rng = rng or np.random.RandomState()

    def apply_to_sample(self, sample: MeshEstimationSample) -> MeshEstimationSample:
        if self.rng.rand() >= self.prob:
            return sample
        angle = self.rng.uniform(-self.max_rotation, self.max_rotation)
        scale = self.rng.uniform(self.min_scale, self.max_scale)
        dx = self.rng.uniform(-self.max_translate, self.max_translate)
        dy = self.rng.uniform(-self.max_translate, self.max_translate)
        interpolation = int(self.rng.choice(self.interpolation_modes))

        height, width = sample.image.shape[:2]
        center = (width / 2 + dx * width, height / 2 + dy * height)
        mat = cv2.getRotationMatrix2D(center, angle, scale)[:2]

        pad = self.image_pad_value
        value = tuple(pad) if isinstance(pad, (list, tuple)) else tuple([pad] * sample.image.shape[-1])
        sample.image = cv2.warpAffine(
            sample.image, mat, (width, height), flags=interpolation,
            borderMode=cv2.BORDER_CONSTANT, borderValue=value,
        )
        sample.rotation_matrix = self.apply_to_matrix(sample.rotation_matrix, angle)
        sample.vertices_2d = self.apply_to_keypoints(
            sample.vertices_2d, mat, sample.image.shape[:2]
        )
        if sample.bboxes_xywh is not None:
            sample.bboxes_xywh = self.apply_to_bboxes(sample.bboxes_xywh, mat)
        if sample.areas is not None:
            det = abs(np.linalg.det(mat[:2, :2]))
            sample.areas = (sample.areas * det).astype(sample.areas.dtype)
        return sample.sanitize_sample()

    @classmethod
    def apply_to_matrix(cls, rotation_matrix: np.ndarray, angle: float) -> np.ndarray:
        rad = np.radians(angle)
        c, s = np.cos(rad), np.sin(rad)
        rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], rotation_matrix.dtype)
        return rotation_matrix @ rz[None]

    @classmethod
    def apply_to_keypoints(cls, keypoints, mat, image_shape):
        out = keypoints.copy()
        kp = out[:, :, :2].reshape(-1, 2)
        kp = np.concatenate([kp, np.ones_like(kp[:, :1])], axis=1) @ mat.T
        kp = kp.reshape(out[:, :, :2].shape)
        h, w = image_shape[:2]
        outside = (kp[:, :, 0] < 0) | (kp[:, :, 1] < 0) | (kp[:, :, 0] >= w) | (kp[:, :, 1] >= h)
        out[:, :, :2] = kp
        out[outside, 2] = 0
        return out.astype(keypoints.dtype, copy=False)

    @classmethod
    def apply_to_bboxes(cls, bboxes_xywh, mat):
        if len(bboxes_xywh) == 0:
            return bboxes_xywh
        xyxy = xywh_to_xyxy(bboxes_xywh)
        corners = np.stack(
            [
                xyxy[:, [0, 1]],
                xyxy[:, [2, 1]],
                xyxy[:, [2, 3]],
                xyxy[:, [0, 3]],
            ],
            axis=1,
        )  # [N, 4, 2]
        ones = np.ones_like(corners[..., :1])
        tr = np.concatenate([corners, ones], axis=-1) @ mat.T  # [N, 4, 2]
        new = np.stack(
            [tr[..., 0].min(1), tr[..., 1].min(1), tr[..., 0].max(1), tr[..., 1].max(1)],
            axis=1,
        )
        return xyxy_to_xywh(new).astype(bboxes_xywh.dtype)


class MeshRandomRotate90:
    """Rotate image + annotations by k*90 degrees
    (ref ``mesh_random_rotate_90.py``)."""

    def __init__(self, prob: float = 0.5, rng: Optional[np.random.RandomState] = None):
        self.prob = prob
        self.rng = rng or np.random.RandomState()

    def apply_to_sample(self, sample: MeshEstimationSample) -> MeshEstimationSample:
        if self.rng.rand() >= self.prob:
            return sample
        k = int(self.rng.randint(0, 4))
        if k == 0:
            return sample
        height, width = sample.image.shape[:2]
        sample.image = np.ascontiguousarray(np.rot90(sample.image, k))
        sample.vertices_2d = self.apply_to_keypoints(sample.vertices_2d, k, height, width)
        if sample.bboxes_xywh is not None:
            sample.bboxes_xywh = self.apply_to_bboxes(sample.bboxes_xywh, k, height, width)
        sample.rotation_matrix = MeshRandomAffineTransform.apply_to_matrix(
            sample.rotation_matrix, -90.0 * k
        )
        return sample

    @classmethod
    def apply_to_keypoints(cls, keypoints, k, height, width):
        out = keypoints.astype(np.float32, copy=True)
        x, y = out[:, :, 0].copy(), out[:, :, 1].copy()
        if k == 1:  # 90 CCW (np.rot90 direction)
            out[:, :, 0], out[:, :, 1] = y, width - 1 - x
        elif k == 2:
            out[:, :, 0], out[:, :, 1] = width - 1 - x, height - 1 - y
        elif k == 3:
            out[:, :, 0], out[:, :, 1] = height - 1 - y, x
        return out

    @classmethod
    def apply_to_bboxes(cls, bboxes_xywh, k, height, width):
        xyxy = xywh_to_xyxy(bboxes_xywh)
        pts = np.stack([xyxy[:, [0, 1]], xyxy[:, [2, 3]]], axis=1)  # [N,2,2]
        kp = cls.apply_to_keypoints(
            np.concatenate([pts, np.ones_like(pts[..., :1])], axis=-1), k, height, width
        )[..., :2]
        new = np.stack(
            [kp[..., 0].min(1), kp[..., 1].min(1), kp[..., 0].max(1), kp[..., 1].max(1)],
            axis=1,
        )
        return xyxy_to_xywh(new).astype(bboxes_xywh.dtype)


# --------------------------------------------------------------------------- #
# Photometric augmentations (ref dataset.py:66-92, numpy/cv2 re-implementation)
# --------------------------------------------------------------------------- #


class PhotometricAugs:
    """Blur / noise / downscale-jpeg / rgb-shift / channel-shuffle / gray-sepia
    with the reference's group probabilities (ref dataset.py:66-92).

    Implementation note (round 4): every elementwise op runs through cv2's
    saturating SIMD paths (``cv2.add`` / ``cv2.transform``) instead of the
    ``astype(f32) -> op -> np.clip -> astype(u8)`` round trip, and gaussian
    noise samples come from a process-wide pre-drawn standard-normal pool
    (random crop + random sign flips, scaled by the per-call sigma) instead
    of a fresh 786k-sample ``r.normal`` draw.  The one-core loader hot path
    dropped 26 -> ~4 ms/img at 512px for identical aug distributions (cv2
    rounds-to-nearest where numpy truncated — immaterial for augmentation).
    """

    _POOL_SHAPE = (1088, 1088, 3)
    _noise_pool: Optional[np.ndarray] = None

    def __init__(self, rng: Optional[np.random.RandomState] = None):
        self.rng = rng or np.random.RandomState()
        if PhotometricAugs._noise_pool is None:
            PhotometricAugs._noise_pool = (
                np.random.RandomState(0x5EED)
                .standard_normal(self._POOL_SHAPE)
                .astype(np.float32)
            )

    def _gauss_noise(self, img: np.ndarray, r: np.random.RandomState,
                     sigma: float) -> np.ndarray:
        h, w = img.shape[:2]
        pool = PhotometricAugs._noise_pool
        ph, pw = pool.shape[:2]
        if h > ph or w > pw:  # image larger than the pool: fall back
            noise = r.normal(0, sigma, img.shape).astype(np.float32)
            return cv2.add(img, noise, dtype=cv2.CV_8U)
        oy, ox = int(r.randint(ph - h + 1)), int(r.randint(pw - w + 1))
        view = pool[oy:oy + h, ox:ox + w]
        if r.randint(2):  # decorrelate crops between calls
            view = view[::-1]
        if r.randint(2):
            view = view[:, ::-1]
        return cv2.add(img, view * np.float32(sigma), dtype=cv2.CV_8U)

    def __call__(self, image: np.ndarray) -> np.ndarray:
        r = self.rng
        img = image
        if r.rand() < 0.2:  # blur family
            choice = r.randint(4)
            if choice == 0:
                k = int(r.choice([3, 5, 7]))
                img = cv2.blur(img, (k, k))
            elif choice == 1:
                k = int(r.choice([3, 5, 7]))
                img = cv2.GaussianBlur(img, (k, k), 0)
            elif choice == 2:  # motion blur
                k = int(r.choice([3, 5, 7]))
                kernel = np.zeros((k, k), np.float32)
                kernel[k // 2, :] = 1.0 / k
                angle = r.uniform(0, 180)
                m = cv2.getRotationMatrix2D((k / 2 - 0.5, k / 2 - 0.5), angle, 1.0)
                kernel = cv2.warpAffine(kernel, m, (k, k))
                s = kernel.sum()
                if s > 0:
                    kernel /= s
                img = cv2.filter2D(img, -1, kernel)
            else:  # defocus: disk kernel
                k = int(r.choice([3, 5]))
                kernel = np.zeros((k, k), np.float32)
                cv2.circle(kernel, (k // 2, k // 2), k // 2, 1.0, -1)
                kernel /= kernel.sum()
                img = cv2.filter2D(img, -1, kernel)
        if r.rand() < 0.2:  # noise family
            choice = r.randint(2)
            if choice == 0:
                var = r.uniform(10.0, 50.0)
                img = self._gauss_noise(img, r, float(np.sqrt(var)))
            else:
                mult = r.uniform(0.9, 1.1, size=3)
                img = cv2.transform(img, np.diag(mult).astype(np.float32))
        if r.rand() < 0.2:  # downscale / jpeg
            if r.randint(2) == 0:
                s = r.uniform(0.25, 0.75)
                h, w = img.shape[:2]
                small = cv2.resize(img, (max(1, int(w * s)), max(1, int(h * s))),
                                   interpolation=cv2.INTER_NEAREST)
                img = cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)
            else:
                q = int(r.randint(20, 81))
                ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, q])
                if ok:
                    img = cv2.imdecode(enc, cv2.IMREAD_COLOR)
        if r.rand() < 0.125:  # rgb shift (saturating per-channel scalar add)
            shift = r.randint(-20, 21, size=3)
            img = cv2.add(img, (int(shift[0]), int(shift[1]), int(shift[2]), 0))
        if r.rand() < 0.05:  # channel shuffle
            img = img[..., r.permutation(3)]
        if r.rand() < 0.05:  # sepia / gray
            if r.randint(2) == 0:  # sepia
                sepia = np.array(
                    [[0.393, 0.769, 0.189], [0.349, 0.686, 0.168], [0.272, 0.534, 0.131]],
                    np.float32,
                )
                img = cv2.transform(img, sepia)
            else:
                gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
                img = cv2.cvtColor(gray, cv2.COLOR_GRAY2RGB)
        return np.ascontiguousarray(img)


class ComposeTransforms:
    def __init__(self, transforms: List):
        self.transforms = transforms

    def apply_to_sample(self, sample: MeshEstimationSample) -> MeshEstimationSample:
        for t in self.transforms:
            sample = t.apply_to_sample(sample)
        return sample


def default_train_transforms(
    image_size: int = 640, rng: Optional[np.random.RandomState] = None
) -> ComposeTransforms:
    """The training geometric chain of record (dataset_params YAML):
    random rotate90 + random affine + longest-max-size + pad."""
    rng = rng or np.random.RandomState()
    return ComposeTransforms(
        [
            MeshRandomRotate90(prob=0.5, rng=rng),
            MeshRandomAffineTransform(
                max_rotation=45, min_scale=0.5, max_scale=2.0, max_translate=0.1,
                image_pad_value=127, prob=0.5, rng=rng,
            ),
            MeshLongestMaxSize(image_size, image_size, rng=rng),
            MeshPadIfNeeded(image_size, image_size, 127, "center"),
        ]
    )


def default_val_transforms(image_size: int = 640) -> ComposeTransforms:
    return ComposeTransforms(
        [
            MeshLongestMaxSize(image_size, image_size),
            MeshPadIfNeeded(image_size, image_size, 127, "bottom_right"),
        ]
    )
