"""Fused letterbox preprocessing on device: resize + pad + normalize.

Functional spec: reference ``head_detector/detector.py:40-52`` —
aspect-preserving resize of the longest side to ``image_size`` (cv2
INTER_LANCZOS4), symmetric constant padding with value 127, then
``float / 255`` and CHW layout.

TPU design: a single jitted program taking the raw uint8 HWC image.  The
resize uses ``jax.image.resize`` with the ``lanczos5`` kernel (closest XLA
analogue of cv2's 4-lobe Lanczos; the kernel-width delta is a sub-LSB
difference on natural images and is covered by the vertex-L2 tolerance
budget).  Output layout is NHWC (TPU-native conv layout).

The geometry (new size / padding / scale) depends only on the *static* input
shape, so it is computed in python at trace time and returned as a
``LetterboxSpec`` — the exact analogue of the reference's ``cache`` dict.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def _lanczos4_weights(src: int, dst: int) -> "np.ndarray":
    """Dense [dst, src] resampling matrix with cv2's INTER_LANCZOS4 kernel
    (8-tap Lanczos a=4, border-clamped, weights normalised).

    Precomputed in numpy at trace time; the resize then becomes two MXU
    matmuls (rows, then cols) — both faster than a gather-based resampler
    and numerically faithful to cv2's kernel (cv2 additionally quantises
    weights to 14-bit fixed point; that sub-LSB delta is inside the parity
    budget)."""
    import numpy as np

    scale = src / dst
    w = np.zeros((dst, src), np.float32)
    xs = (np.arange(dst) + 0.5) * scale - 0.5
    for i, center in enumerate(xs):
        left = int(np.floor(center)) - 3
        taps = np.arange(left, left + 8)
        t = taps - center
        with np.errstate(invalid="ignore", divide="ignore"):
            lz = np.sinc(t) * np.sinc(t / 4.0)
        lz[np.abs(t) >= 4] = 0.0
        lz = lz / lz.sum()
        np.add.at(w[i], np.clip(taps, 0, src - 1), lz.astype(np.float32))
    return w


def lanczos4_resize(image: "jnp.ndarray", new_h: int, new_w: int) -> "jnp.ndarray":
    """cv2.INTER_LANCZOS4-equivalent separable resize as two matmuls.

    :param image: [H, W, C] float32
    """
    import numpy as np

    h, w = image.shape[0], image.shape[1]
    wy = jnp.asarray(_lanczos4_weights(h, new_h))  # [new_h, H]
    wx = jnp.asarray(_lanczos4_weights(w, new_w))  # [new_w, W]
    # rows: [new_h, H] @ [H, W*C]
    x = jnp.einsum("oh,hwc->owc", wy, image)
    return jnp.einsum("ow,hwc->hoc", wx, x)


class LetterboxSpec(NamedTuple):
    pad_left: int
    pad_top: int
    scale: float
    new_w: int
    new_h: int


def letterbox_spec(h: int, w: int, image_size: int = 640) -> LetterboxSpec:
    """Static geometry of the letterbox op (ref detector.py:41-50)."""
    if h > w:
        new_h, new_w = image_size, int(w * image_size / h)
    else:
        new_h, new_w = int(h * image_size / w), image_size
    scale = image_size / max(h, w)
    pad_w = image_size - new_w
    pad_h = image_size - new_h
    return LetterboxSpec(
        pad_left=pad_w // 2, pad_top=pad_h // 2, scale=scale, new_w=new_w, new_h=new_h
    )


@partial(jax.jit, static_argnames=("image_size", "method"))
def letterbox(
    image: jnp.ndarray, image_size: int = 640, method: str = "lanczos4"
) -> Tuple[jnp.ndarray, Tuple[int, int], float]:
    """uint8 HWC image -> (float32 [1, S, S, 3] in [0,1], (pad_l, pad_t), scale).

    Jit-cached per input shape.  ``method="lanczos4"`` (default) reproduces
    cv2.INTER_LANCZOS4 (the reference's kernel, detector.py:47) via two MXU
    matmuls; any jax.image method name works as a fallback.
    """
    h, w = image.shape[0], image.shape[1]
    spec = letterbox_spec(h, w, image_size)

    img = image.astype(jnp.float32)
    if method == "lanczos4":
        img = lanczos4_resize(img, spec.new_h, spec.new_w)
    else:
        img = jax.image.resize(
            img, (spec.new_h, spec.new_w, image.shape[2]), method=method
        )
    # Lanczos can overshoot outside [0,255]; cv2 saturates to uint8.
    img = jnp.clip(img, 0.0, 255.0)

    pad_w = image_size - spec.new_w
    pad_h = image_size - spec.new_h
    img = jnp.pad(
        img,
        (
            (spec.pad_top, pad_h - spec.pad_top),
            (spec.pad_left, pad_w - spec.pad_left),
            (0, 0),
        ),
        constant_values=127.0,
    )
    img = img / 255.0
    return img[None], (spec.pad_left, spec.pad_top), spec.scale


@partial(jax.jit, static_argnames=("image_size", "method"))
def letterbox_batch(images: jnp.ndarray, image_size: int = 640, method: str = "lanczos4") -> jnp.ndarray:
    """Batched same-size letterbox: uint8 [B, H, W, 3] -> float32 [B, S, S, 3].

    ONE host->device transfer + ONE dispatch for the whole group — on the
    axon relay a per-image device letterbox costs a full round trip each
    (the round-5 predict_batch probe measured 183 ms/img at b16, ~95%
    relay overhead).  ``method="lanczos4"`` keeps kernel parity with the
    single-image ``letterbox``: the same trace-time resampling matrices,
    batched over B by the einsum."""
    b, h, w, c = images.shape
    spec = letterbox_spec(h, w, image_size)
    imgs = images.astype(jnp.float32)
    if method == "lanczos4":
        wy = jnp.asarray(_lanczos4_weights(h, spec.new_h))  # [new_h, H]
        wx = jnp.asarray(_lanczos4_weights(w, spec.new_w))  # [new_w, W]
        imgs = jnp.einsum("oh,bhwc->bowc", wy, imgs)
        imgs = jnp.einsum("ow,bhwc->bhoc", wx, imgs)
    else:
        imgs = jax.image.resize(imgs, (b, spec.new_h, spec.new_w, c), method=method)
    imgs = jnp.clip(imgs, 0.0, 255.0)
    pad_w = image_size - spec.new_w
    pad_h = image_size - spec.new_h
    imgs = jnp.pad(
        imgs,
        (
            (0, 0),
            (spec.pad_top, pad_h - spec.pad_top),
            (spec.pad_left, pad_w - spec.pad_left),
            (0, 0),
        ),
        constant_values=127.0,
    )
    return imgs / 255.0
