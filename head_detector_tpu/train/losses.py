"""Elementwise loss functions (focal/BCE/DFL/vertices/rotation).

Functional specs:
* focal / df loss — reference ``yolo_head_loss.py:506-518, 739-758``
* Vertices3DLoss + normalize_to_cube — ``losses/vertices_loss.py:10-49``
* Frobenius / Geodesic / Cosine rotation — ``losses/rotation_losses.py:5-34``

All functions here return *unreduced* per-element values; masking and
normalisation happen in :mod:`head_detector_tpu.train.loss` so zero-positive
batches stay well-defined under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable binary cross entropy on logits, elementwise."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def focal_loss(
    pred_logits: jnp.ndarray,
    label: jnp.ndarray,
    alpha: float = -1.0,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Quality focal loss, elementwise (ref ``_focal_loss``; the training
    config calls it with alpha=-1 i.e. no class-balance term)."""
    pred_score = jax.nn.sigmoid(pred_logits)
    weight = jnp.abs(pred_score - label) ** gamma
    if alpha > 0:
        weight = weight * (alpha * label + (1 - alpha) * (1 - label))
    return weight * bce_with_logits(pred_logits, label)


def df_loss(pred_dist: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Distribution-focal loss.

    :param pred_dist: [..., 4, reg_max+1] logits over bins
    :param target:    [..., 4] continuous ltrb targets in [0, reg_max)
    :return:          [..., 1] mean over the 4 sides
    """
    target_left = target.astype(jnp.int32)
    target_right = target_left + 1
    weight_left = target_right.astype(target.dtype) - target
    weight_right = 1.0 - weight_left

    log_probs = jax.nn.log_softmax(pred_dist, axis=-1)
    nbins = pred_dist.shape[-1]
    ce_left = -jnp.take_along_axis(
        log_probs, jnp.clip(target_left, 0, nbins - 1)[..., None], axis=-1
    )[..., 0]
    ce_right = -jnp.take_along_axis(
        log_probs, jnp.clip(target_right, 0, nbins - 1)[..., None], axis=-1
    )[..., 0]
    return (ce_left * weight_left + ce_right * weight_right).mean(-1, keepdims=True)


def normalize_to_cube(v: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Normalise vertex sets to the unit cube [-1, 1]^3 per instance
    (ref ``vertices_loss.py:normalize_to_cube``; eps guards padded rows)."""
    v = v - v.min(axis=-2, keepdims=True)
    v = v - 0.5 * v.max(axis=-2, keepdims=True)
    denom = v.max(axis=-1, keepdims=True).max(axis=-2, keepdims=True)
    return v / jnp.maximum(denom, eps)


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def vertices_3d_loss(
    pred: jnp.ndarray, target: jnp.ndarray, criterion: str = "smooth_l1"
) -> jnp.ndarray:
    """Per-element loss between cube-normalised vertex sets [..., V, 3]."""
    p = normalize_to_cube(pred.astype(jnp.float32))
    t = normalize_to_cube(target.astype(jnp.float32))
    if criterion == "l1":
        return jnp.abs(p - t)
    if criterion == "l2":
        return (p - t) ** 2
    if criterion == "smooth_l1":
        return smooth_l1(p, t)
    raise ValueError(f"Unsupported vertices loss {criterion!r}")


def rotation_loss(
    pred: jnp.ndarray, target: jnp.ndarray, kind: str = "geodesic", eps: float = 1e-7
) -> jnp.ndarray:
    """Per-instance rotation distance for [..., 3, 3] matrices -> [...]."""
    if kind == "frobenius":
        return jnp.linalg.norm(pred - target, axis=(-2, -1))
    if kind == "geodesic":
        diffs = jnp.einsum("...ij,...kj->...ik", pred, target)  # R1 @ R2^T
        traces = jnp.trace(diffs, axis1=-2, axis2=-1)
        return jnp.arccos(jnp.clip((traces - 1.0) / 2.0, -1.0 + eps, 1.0 - eps))
    if kind == "cosine":
        product = jnp.einsum("...ji,...jk->...ik", pred, target)  # R1^T @ R2
        trace = jnp.trace(product, axis1=-2, axis2=-1)
        return 1.0 - trace / 3.0
    raise ValueError(f"Unsupported rotation loss {kind!r}")


def oks_keypoint_loss(
    pred_coords: jnp.ndarray,  # [..., K, 2]
    target_coords: jnp.ndarray,  # [..., K, 2]
    area: jnp.ndarray,  # [..., 1]
    sigma: float,
    eps: float = 1e-9,
) -> jnp.ndarray:
    """OKS-style keypoint loss, reduced over keypoints -> [...]
    (ref ``_keypoint_loss``, yolo_head_loss.py:566-607)."""
    d = ((pred_coords - target_coords) ** 2).sum(-1)  # [..., K]
    e = d / (2 * sigma) ** 2 / (area + eps) / 2
    return (1.0 - jnp.exp(-e)).mean(-1)
