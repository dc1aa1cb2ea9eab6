"""Model export: QARepVGG fusion (deploy mode) + serialized jitted graphs.

Reference equivalents:
* ``model.export(..., engine='torch')`` producing the ``.trcd`` TorchScript
  used by the HF checkpoints (``exportable_mesh_model.py:440-442``) — here
  :func:`export_serialized` emits a portable serialized StableHLO program via
  ``jax.export`` (the TPU-native deployment artifact),
  :func:`head_detector_tpu.torch_mirror.export_torchscript` traces a flax
  checkpoint through the live-torch mirror into the same ``.trcd`` format the
  reference publishes (tested parity: tests/test_torch_mirror.py), and
  :func:`save_variables` / :func:`load_variables` store weights as flax
  msgpack.
* RepVGG-style structural reparameterization: the training-time QARepVGG
  block (3x3+BN, alpha*1x1+bias, optional identity, post-BN) folds into ONE
  3x3 conv + bias for inference.  On TPU this removes two of three convs and
  the branch adds from every block of the backbone/neck/towers.
  Fusion math: fold BN into the 3x3 branch, pad the 1x1 kernel to 3x3
  (center tap), add an identity center-tap kernel when the residual branch
  exists, sum, then fold the post-BN affine.

Identity-branch detection: a QARepVGG block uses the residual branch iff
``use_residual_connection`` and in==out and stride==1.  In every preset the
only stride-2 blocks (stem / stage downsamples) change channel count, and the
alpha-carrying FLAME towers set ``use_residual_connection=False`` — so the
rule "has identity iff in_channels == out_channels and no alpha param" holds
structurally; it is asserted below.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from head_detector_tpu.models.presets import ArchCfg
from head_detector_tpu.models.yolo_heads import YoloHeads, build_model


def _is_qarepvgg_scope(p: Dict[str, Any]) -> bool:
    return isinstance(p, dict) and "branch_3x3_conv" in p and "post_bn" in p


def _fuse_one(params: Dict[str, Any], stats: Dict[str, Any], eps: float) -> Dict[str, Any]:
    w3 = np.asarray(params["branch_3x3_conv"]["kernel"])  # [3,3,in,out]
    g1 = np.asarray(params["branch_3x3_bn"]["scale"])
    b1 = np.asarray(params["branch_3x3_bn"]["bias"])
    m1 = np.asarray(stats["branch_3x3_bn"]["mean"])
    v1 = np.asarray(stats["branch_3x3_bn"]["var"])

    w1 = np.asarray(params["branch_1x1"]["kernel"])  # [1,1,in,out]
    bias1 = np.asarray(params["branch_1x1"]["bias"])
    alpha = float(np.asarray(params["alpha"])) if "alpha" in params else 1.0

    g2 = np.asarray(params["post_bn"]["scale"])
    b2 = np.asarray(params["post_bn"]["bias"])
    m2 = np.asarray(stats["post_bn"]["mean"])
    v2 = np.asarray(stats["post_bn"]["var"])

    # fold BN into the 3x3 branch
    s1 = g1 / np.sqrt(v1 + eps)
    w = w3 * s1[None, None, None, :]
    b = b1 - m1 * s1

    # alpha * 1x1 branch, padded to the 3x3 center tap
    w_pad = np.zeros_like(w)
    w_pad[1, 1] = alpha * w1[0, 0]
    w = w + w_pad
    b = b + alpha * bias1

    # identity branch (center-tap identity kernel)
    cin, cout = w3.shape[2], w3.shape[3]
    if cin == cout and "alpha" not in params:
        ident = np.zeros_like(w)
        ident[1, 1, np.arange(cin), np.arange(cin)] = 1.0
        w = w + ident

    # fold post-BN
    s2 = g2 / np.sqrt(v2 + eps)
    w = w * s2[None, None, None, :]
    b = (b - m2) * s2 + b2

    return {"rbr_reparam": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}


def s2d_stem_kernel(w: np.ndarray) -> np.ndarray:
    """Re-lay a fused 3x3/s2 stem kernel for the space-to-depth stem form.

    The dense stem convolves [3,3,C,O] over (H, W, C) at stride 2 with
    torch pad 1: output (i, j) reads input rows/cols 2i-1..2i+1.  After a
    2x2 space-to-depth (channel order ``(di*2+dj)*C + c`` — see
    ``QARepVGGBlock.s2d``), those taps live in s2d rows {i-1, i}, so the
    SAME arithmetic is a 2x2/s1 conv with pad (1,0) whose kernel is this
    scatter of the 9 dense taps into 9 of the 16 (ky, kx, di, dj) slots
    (the rest stay zero).  MXU contraction dim: 9*C -> 4*4C.
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3), f"stem kernel must be 3x3, got {w.shape}"
    k = np.zeros((2, 2, 4 * cin, cout), w.dtype)
    for ky in range(2):
        for di in range(2):
            u = 2 * ky + di - 1  # dense tap row index (0..2), -1 = zero pad
            if not 0 <= u <= 2:
                continue
            for kx in range(2):
                for dj in range(2):
                    v = 2 * kx + dj - 1
                    if not 0 <= v <= 2:
                        continue
                    blk = (di * 2 + dj) * cin
                    k[ky, kx, blk : blk + cin] = w[u, v]
    return k


def fuse_qarepvgg(
    variables: Dict[str, Any], arch: ArchCfg
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Training variables -> (deploy params, deploy batch_stats).

    Walks the variable tree, replacing every QARepVGG scope with its fused
    single-conv parameters; all other scopes (ConvBNAct, preds, upsamples)
    pass through untouched.
    """
    eps = arch.bn_eps

    def walk(p, s):
        """Parallel walk of (params, batch_stats) subtrees rooted at the same
        module path.  BN scopes hold {scale, bias} in params and {mean, var}
        in stats under the SAME key, so the union of keys is traversed;
        stats-only leaves (mean/var) are kept verbatim."""
        if _is_qarepvgg_scope(p):
            return _fuse_one(p, s, eps), None  # stats consumed by the fuse
        if isinstance(p, dict):
            new_p, new_s = {}, {}
            s = s if isinstance(s, dict) else {}
            for key in sorted(set(p) | set(s)):
                sub_p = p.get(key)
                sub_s = s.get(key)
                if sub_p is None:  # stats-only subtree (BN mean/var)
                    new_s[key] = sub_s
                    continue
                fp, fs = walk(sub_p, sub_s)
                new_p[key] = fp
                if fs is not None and fs != {}:
                    new_s[key] = fs
            return new_p, new_s
        return p, s

    params, batch_stats = walk(variables["params"], variables["batch_stats"])
    return {"params": params, "batch_stats": batch_stats or {}}


def build_deploy(
    name_or_arch,
    variables: Dict[str, Any],
    dtype: Any = jnp.bfloat16,
    defer_globalization: bool = False,
    skip_flame: bool = False,
    s2d_stem: bool = False,
) -> Tuple[YoloHeads, Dict[str, Any]]:
    """Convenience: (deploy model, fused variables) from training variables."""
    model = build_model(
        name_or_arch,
        deploy=True,
        dtype=dtype,
        defer_globalization=defer_globalization,
        skip_flame=skip_flame,
        s2d_stem=s2d_stem,
    )
    fused = fuse_qarepvgg(variables, model.arch)
    if s2d_stem:
        stem = fused["params"]["backbone"]["stem"]["conv"]["rbr_reparam"]
        stem["kernel"] = jnp.asarray(
            s2d_stem_kernel(np.asarray(stem["kernel"]))
        )
    return model, fused


def export_serialized(fn, example_args, path: str) -> None:
    """Serialize a jitted function to portable StableHLO bytes
    (the TPU-native analogue of the reference's .trcd TorchScript export)."""
    from jax import export as jax_export

    exported = jax_export.export(jax.jit(fn))(*example_args)
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_serialized(path: str):
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call
