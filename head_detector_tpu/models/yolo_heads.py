"""YoloHeads: full model assembly (backbone -> neck -> heads) + init helpers.

Reference: ``yolo_head_training/yolo_head/yolo_heads.py:18-183`` (a
SuperGradients ``CustomizableDetector`` wired from the arch YAML) and the
variant constructors ``yolo_heads_variants.py:13-58``.

The model is a pure flax module: ``apply(variables, images)`` with NHWC
float input (already letterboxed/normalised) returns
``(DecodedPredictions, RawOutputs)``.  The whole forward — backbone, PAN
neck, DFL decode, FLAME globalisation — is one XLA program; under ``jit``
anchor grids fold to constants and bf16 matmuls hit the MXU.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from head_detector_tpu.models.backbone import NStageBackbone
from head_detector_tpu.models.blocks import BlockCfg
from head_detector_tpu.models.heads import (
    DecodedPredictions,
    RawOutputs,
    YoloHeadsNDFLHeads,
)
from head_detector_tpu.models.neck import YoloNASPANNeckWithC2
from head_detector_tpu.models.presets import ArchCfg, get_arch


class YoloHeads(nn.Module):
    """Single-shot multi-head 3D head detector.

    :param arch: structural preset (see ``presets.PRESETS``).
    :param deploy: use reparameterised single-conv QARepVGG blocks
                   (inference-only parameter layout).
    :param dtype: computation dtype for conv/BN (params stay float32).
    """

    arch: ArchCfg
    deploy: bool = False
    dtype: Any = jnp.float32
    defer_globalization: bool = False
    skip_flame: bool = False
    s2d_stem: bool = False

    def setup(self):
        cfg = BlockCfg(
            bn_eps=self.arch.bn_eps,
            bn_momentum=self.arch.bn_momentum,
            dtype=self.dtype,
        )
        self.backbone = NStageBackbone(
            self.arch, deploy=self.deploy, s2d_stem=self.s2d_stem, cfg=cfg
        )
        self.neck = YoloNASPANNeckWithC2(self.arch, deploy=self.deploy, cfg=cfg)
        self.heads = YoloHeadsNDFLHeads(
            self.arch,
            deploy=self.deploy,
            defer_globalization=self.defer_globalization,
            skip_flame=self.skip_flame,
            cfg=cfg,
        )

    def __call__(
        self, images: jnp.ndarray, train: bool = False, return_feats: bool = False
    ):
        """:param images: [B, H, W, 3] float (0..1 range), H/W multiples of 32.
        :param return_feats: additionally return the neck pyramid (p3, p4, p5)
            — the inputs to the per-scale heads, consumed by the sparse
            post-NMS FLAME-tower path (ops/sparse_towers.py)."""
        if images.shape[1] % 32 or images.shape[2] % 32:
            raise ValueError(
                f"Input spatial dims must be divisible by 32, got {images.shape}"
            )
        x = images.astype(self.dtype)
        c2, c3, c4, c5 = self.backbone(x, train)
        p3, p4, p5 = self.neck([c2, c3, c4, c5], train)
        decoded, raw = self.heads([p3, p4, p5], train)
        if return_feats:
            return decoded, raw, (p3, p4, p5)
        return decoded, raw


def build_model(
    name_or_arch,
    deploy: bool = False,
    dtype: Any = jnp.float32,
    defer_globalization: bool = False,
    skip_flame: bool = False,
    s2d_stem: bool = False,
) -> YoloHeads:
    if isinstance(name_or_arch, str) and name_or_arch.lower() in (
        "segformer", "segformeryoloheads", "segformer_b5_yolo"
    ):
        # reference `architecture: SegFormerYoloHeads` (configs/segformer.yaml)
        from head_detector_tpu.models.segformer import SegFormerYoloHeads

        return SegFormerYoloHeads(dtype=dtype)
    arch = name_or_arch if isinstance(name_or_arch, ArchCfg) else get_arch(name_or_arch)
    return YoloHeads(
        arch=arch,
        deploy=deploy,
        dtype=dtype,
        defer_globalization=defer_globalization,
        skip_flame=skip_flame,
        s2d_stem=s2d_stem,
    )


def calibrate_batch_stats(model: YoloHeads, variables: dict, sample: jnp.ndarray) -> dict:
    """Set BN running stats to the statistics of one calibration batch.

    Freshly-initialised BN has running (mean=0, var=1), which does not
    normalise anything in eval mode — the QARepVGG branch sums then grow
    multiplicatively through ~30 blocks and saturate the heads.  One train-mode
    pass normalises every layer by its *batch* stats; the flax update writes
    ``new = m*old + (1-m)*batch``, so the batch statistics are recovered
    exactly as ``(new - m*old) / (1-m)`` and installed as the running stats.
    """
    # a twin model whose BN momentum writes the batch statistics verbatim
    # (torch-convention momentum 1.0 == flax momentum 0.0); parameters and
    # module tree are identical, so the variables pytree is shared.  flax
    # modules are frozen dataclasses, so the twin is a field replacement —
    # works for YoloHeads and the SegFormer variant alike (both read BN
    # momentum from their ``arch`` donor).
    import dataclasses as _dc

    arch = model.arch or get_arch("yolo_heads_l")
    twin = model.clone(arch=_dc.replace(arch, bn_momentum=1.0))

    @jax.jit
    def _calibrate(variables, sample):
        _, mutated = twin.apply(variables, sample, train=True, mutable=["batch_stats"])
        return mutated["batch_stats"]

    out = dict(variables)
    out["batch_stats"] = _calibrate(variables, sample)
    return out


def init_model(
    model: YoloHeads,
    rng: jax.Array,
    image_size: Tuple[int, int] = (640, 640),
    batch: int = 1,
    calibrate: bool = True,
) -> dict:
    """Initialise variables ({'params', 'batch_stats'}) with a dummy batch.

    The init is jitted: un-jitted flax init dispatches one tiny XLA program
    per parameter (hundreds of round trips); one fused compile is ~50x faster.
    BN running stats are calibrated on one random batch (see
    :func:`calibrate_batch_stats`) so eval-mode forwards are numerically sane
    even before training.
    """
    dummy = jax.random.uniform(
        jax.random.PRNGKey(7), (max(batch, 8), image_size[0], image_size[1], 3)
    )
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(rng, dummy)
    if calibrate:
        variables = calibrate_batch_stats(model, variables, dummy)
    return variables


@functools.partial(jax.jit, static_argnums=(0,))
def forward(model: YoloHeads, variables: dict, images: jnp.ndarray):
    """Jitted inference forward returning decoded predictions only."""
    decoded, _ = model.apply(variables, images, train=False)
    return decoded


def param_count(variables: dict) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(variables.get("params", variables)))
