"""Batched affine warp: gather-based bilinear sampling on device.

Functional spec: the reference's per-head ``cv2.warpAffine`` calls in the
aligned-crop path (``head_detector/utils.py:109-117``) and evaluation
alignment (``evaluation/head_alignment.py``).  The cv2 call warps the WHOLE
image once per head on the host; here all heads of an image are warped in one
fixed-shape gather program: for each output pixel the source coordinate is
``inv_matrix @ [x, y, 1]`` and the value is bilinearly interpolated, with
constant padding outside the canvas — exactly cv2's INTER_LINEAR +
BORDER_CONSTANT semantics.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def invert_affine(mat: np.ndarray) -> np.ndarray:
    """Invert [..., 2, 3] forward affine matrices (dst = M @ [src, 1])."""
    mat = np.asarray(mat, np.float64)
    a = mat[..., :2, :2]
    t = mat[..., :2, 2]
    inv_a = np.linalg.inv(a)
    inv_t = -np.einsum("...ij,...j->...i", inv_a, t)
    return np.concatenate([inv_a, inv_t[..., None]], axis=-1).astype(np.float32)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def affine_warp(
    image: jnp.ndarray,  # [H, W, C] float or uint8
    inv_matrices: jnp.ndarray,  # [N, 2, 3] dst->src mapping
    out_h: int,
    out_w: int,
    fill_value: float = 0.0,
) -> jnp.ndarray:
    """Warp one image into N crops of (out_h, out_w): returns [N, out_h, out_w, C]."""
    h, w = image.shape[0], image.shape[1]
    img = image.astype(jnp.float32)

    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # [out_h, out_w]

    # src = A @ [x, y]^T + t, per crop
    a = inv_matrices[:, :, :2]  # [N, 2, 2]
    t = inv_matrices[:, :, 2]  # [N, 2]
    sx = a[:, 0, 0, None, None] * gx + a[:, 0, 1, None, None] * gy + t[:, 0, None, None]
    sy = a[:, 1, 0, None, None] * gx + a[:, 1, 1, None, None] * gy + t[:, 1, None, None]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def sample(yi, xi):
        inside = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = img[yi_c, xi_c]  # [N, out_h, out_w, C]
        return jnp.where(inside[..., None], vals, fill_value)

    v00 = sample(y0, x0)
    v01 = sample(y0, x0 + 1)
    v10 = sample(y0 + 1, x0)
    v11 = sample(y0 + 1, x0 + 1)

    fx = fx[..., None]
    fy = fy[..., None]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    return out


@partial(jax.jit, static_argnames=("out_size",))
def scaled_crops_matmul(
    image: jnp.ndarray,  # [H, W, C] float
    boxes_xyxy: jnp.ndarray,  # [N, 4] traced
    out_size: int = 256,
) -> jnp.ndarray:
    """Axis-aligned bilinear crops as two MXU matmuls per crop.

    Gather-based warps are slow on TPU (large random gathers); for the common
    box-crop case bilinear resampling is separable, and the per-crop weight
    matrices are dense hat functions computed entirely with vectorised
    arithmetic: ``W[i, s] = max(0, 1 - |src_coord(i) - s|)`` has at most two
    nonzeros per row and sums to 1, which IS bilinear interpolation.  Each
    crop is then ``W_y @ image @ W_x^T`` — measured ~20x faster than the
    gather path for the 10-crops-per-image benchmark.

    :return: [N, out_size, out_size, C] float crops (edge-clamped at borders).
    """
    h, w = image.shape[0], image.shape[1]
    n = boxes_xyxy.shape[0]

    def weights(lo, hi, src_len):
        # [N, out_size, src_len] hat weights for coords lo..hi -> out_size
        scale = (hi - lo) / out_size  # [N]
        centers = lo[:, None] + (jnp.arange(out_size) + 0.5) * scale[:, None] - 0.5
        centers = jnp.clip(centers, 0.0, src_len - 1.0)  # edge clamp
        grid = jnp.arange(src_len, dtype=jnp.float32)
        return jnp.clip(1.0 - jnp.abs(centers[..., None] - grid), 0.0, None)

    wy = weights(boxes_xyxy[:, 1], boxes_xyxy[:, 3], h)  # [N, S, H]
    wx = weights(boxes_xyxy[:, 0], boxes_xyxy[:, 2], w)  # [N, S, W]
    img = image.astype(jnp.float32)
    rows = jnp.einsum("nih,hwc->niwc", wy, img)  # [N, S, W, C]
    return jnp.einsum("njw,niwc->nijc", wx, rows)  # [N, S, S, C]


def _shear_lines(img: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """Fractionally translate each LINE of ``img`` by its own offset.

    ``img`` is [N, L, S, C] (L independent lines of length S); line (n, l) is
    resampled at source coordinate ``x + offsets[n, l]``, zero outside
    (bilinear: two taps, floor/ceil, linear blend).

    TPU formulation: a whole-line translation by a fixed (per-line) offset
    is a TOEPLITZ operator, and Toeplitz operators are diagonalised by the
    DFT — so the shear becomes four dense MXU matmuls against a static DFT
    basis (rfft -> per-line phase multiply by the 2-tap bilinear kernel's
    transform -> irfft), with the line zero-padded to 2S so the circular
    wrap lands in the zero region for any |offset| <= S.  No gathers: both
    per-element ``take_along_axis`` taps and vmapped contiguous
    ``dynamic_slice`` reads were measured pathological on the TPU backend
    (1.2 s for 512 crops of 256px — 393k tiny gathers on a 3-wide lane
    dim), and the banded-matrix matmul form materialises [N, L, S, S]
    weights (34 GB).  This form measures MXU-bound.
    """
    n, l, s, c = img.shape
    p = 2 * s
    freqs = np.arange(p // 2 + 1)
    w = 2.0 * np.pi * freqs / p  # [F]
    ang = np.outer(np.arange(p), w)  # [P, F]
    cosb = jnp.asarray(np.cos(ang), jnp.float32)
    sinb = jnp.asarray(np.sin(ang), jnp.float32)
    # irfft basis with Hermitian doubling (nu = 0 and Nyquist count once)
    scale = np.ones(p // 2 + 1)
    scale[1:-1] = 2.0
    icos = jnp.asarray((np.cos(ang) * scale[None]).T / p, jnp.float32)  # [F, P]
    isin = jnp.asarray((np.sin(ang) * scale[None]).T / p, jnp.float32)

    # lines-major: [N, L, C, S] -> [M, S], offsets repeated per channel
    lines = jnp.moveaxis(img, 3, 2).reshape(n * l * c, s).astype(jnp.float32)
    lines = jnp.pad(lines, ((0, 0), (0, p - s)))
    o = jnp.broadcast_to(offsets[:, :, None], (n, l, c)).reshape(n * l * c)
    o = jnp.clip(o, -float(s), float(s))  # out-of-range lines read only zeros
    k = jnp.floor(o)
    f = (o - k)[:, None]  # [M, 1]

    re = lines @ cosb  # [M, F]
    im = -(lines @ sinb)
    # shift property x[t + m] <-> X[nu] e^{+i w m}; bilinear kernel:
    # K = (1-f) e^{iwk} + f e^{iw(k+1)}
    pk = k[:, None] * w[None, :]  # [M, F]
    kr = (1.0 - f) * jnp.cos(pk) + f * jnp.cos(pk + w[None, :])
    ki = (1.0 - f) * jnp.sin(pk) + f * jnp.sin(pk + w[None, :])
    rre = re * kr - im * ki
    rim = re * ki + im * kr
    out = rre @ icos - rim @ isin  # [M, P]
    out = out[:, :s].reshape(n, l, c, s)
    return jnp.moveaxis(out, 2, 3).astype(img.dtype)


def rotate_crops_matmul(crops: jnp.ndarray, angles_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotate square crops about their centers with THREE SHEAR PASSES.

    The classic three-shear decomposition
    ``R(t) = ShearX(-tan(t/2)) . ShearY(sin t) . ShearX(-tan(t/2))`` turns a
    rotation into three one-axis translations whose per-line offsets vary
    linearly with the other coordinate.  Each fractional line translation is
    a two-tap lerp of axis-shifted reads (see :func:`_shear_lines`) — three
    cheap streaming passes, no scatter/gather of arbitrary 2-D coordinates.
    Quality matches a direct bilinear rotation to ~1-2 gray levels away from
    edges (three resamples vs one; tested against scipy.ndimage in
    tests/test_warp.py).  Pixels rotated in from outside the crop are zero
    (BORDER_CONSTANT), like the reference's ``cv2.warpAffine`` alignment
    (utils.py:109-117).

    :param crops: [N, S, S, C] float
    :param angles_deg: [N] rotation angles (counter-clockwise, like
        cv2.getRotationMatrix2D's convention)
    :return: [N, S, S, C] rotated crops
    """
    n, s = crops.shape[0], crops.shape[1]
    t = jnp.deg2rad(angles_deg.astype(jnp.float32))
    c = (s - 1) / 2.0
    rel = jnp.arange(s, dtype=jnp.float32) - c  # [S]

    # Exact quadrant pre-rotation (pure transpose/flip, no resampling):
    # rotate by the nearest multiple of 90 deg first so the shears only
    # handle a residual |t| <= 45 deg.  This makes the decomposition valid
    # over the FULL +-180 deg range (plain 3-shear degenerates past ~90 deg:
    # tan(t/2) -> inf) and tightens shear offsets to <= tan(22.5)*S/2.
    # Convention: +90 deg == np.rot90 k=1 on (row, col) == scipy/cv2 CCW
    # (pinned by tests/test_warp.py against scipy.ndimage.rotate).
    q = jnp.round(t / (jnp.pi / 2.0))
    t = t - q * (jnp.pi / 2.0)
    qm = jnp.mod(q.astype(jnp.int32), 4)[:, None, None, None]  # [N,1,1,1]
    c0 = crops.astype(jnp.float32)
    c1 = jnp.rot90(c0, 1, axes=(1, 2))
    c2 = jnp.rot90(c0, 2, axes=(1, 2))
    c3 = jnp.rot90(c0, 3, axes=(1, 2))
    crops = jnp.where(
        qm == 0, c0, jnp.where(qm == 1, c1, jnp.where(qm == 2, c2, c3))
    )

    alpha = -jnp.tan(t / 2.0)  # x-shear factor (source offset per y)
    beta = jnp.sin(t)  # y-shear factor (source offset per x)

    def shear_x(img, factor):
        # out[y, x] = in[y, x + factor*ry] — rows are the lines
        offsets = factor[:, None] * rel[None, :]  # [N, S(y)]
        return _shear_lines(img, offsets)

    def shear_y(img, factor):
        # out[y, x] = in[y + factor*rx, x] — columns are the lines
        offsets = factor[:, None] * rel[None, :]  # [N, S(x)]
        out = _shear_lines(jnp.swapaxes(img, 1, 2), offsets)
        return jnp.swapaxes(out, 1, 2)

    out = shear_x(crops.astype(jnp.float32), alpha)
    out = shear_y(out, beta)
    return shear_x(out, alpha)


def aligned_crops_matmul(
    image: jnp.ndarray,  # [H, W, C] float
    boxes_xyxy: jnp.ndarray,  # [N, 4] traced
    angles_deg: jnp.ndarray,  # [N] roll per box
    out_size: int = 256,
    margin: float = 1.5,
) -> jnp.ndarray:
    """Roll-aligned square crops, fully on device: an axis-aligned expanded
    crop (x ``margin`` >= sqrt(2), two matmuls) followed by a three-shear
    center rotation (three slice-gather line-translation passes).  Callers
    composing this into a larger jitted graph should keep it a SEPARATE
    program: fused into the detection graph, XLA's schedule was measured
    ~40x slower than the same warp dispatched standalone (bench.py crops
    mode).  The device analogue of the reference's
    ``vertically_align`` host path (cv2.getRotationMatrix2D + warpAffine,
    ``head_detector/utils.py:93-117``): content inside the original box is
    rotated by its roll angle and returned at ``out_size``.
    """
    cx = (boxes_xyxy[:, 0] + boxes_xyxy[:, 2]) / 2
    cy = (boxes_xyxy[:, 1] + boxes_xyxy[:, 3]) / 2
    half = jnp.maximum(
        boxes_xyxy[:, 2] - boxes_xyxy[:, 0], boxes_xyxy[:, 3] - boxes_xyxy[:, 1]
    ) * (margin / 2)
    big = jnp.stack([cx - half, cy - half, cx + half, cy + half], axis=1)
    expanded = scaled_crops_matmul(image, big, out_size=out_size)
    return rotate_crops_matmul(expanded, angles_deg)


def warp_like_cv2(
    image: np.ndarray, forward_mat: np.ndarray, dsize: Tuple[int, int]
) -> np.ndarray:
    """Single-crop convenience matching ``cv2.warpAffine(image, M, dsize)``
    with INTER_LINEAR + BORDER_CONSTANT(0). dsize is (width, height)."""
    inv = invert_affine(forward_mat[None])
    out = affine_warp(jnp.asarray(image), jnp.asarray(inv), dsize[1], dsize[0])
    out = np.asarray(out[0])
    if image.dtype == np.uint8:
        out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out
