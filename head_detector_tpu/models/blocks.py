"""YOLO-NAS building blocks in flax.linen, NHWC, TPU-native.

These modules re-derive the *semantics* of the SuperGradients modules that the
reference wires together purely from YAML (reference
``yolo_head_training/configs/arch_params/yolo_heads_l_arch_params.yaml:5-86``
names ``YoloNASStem/YoloNASStage/SPP/YoloNASUpStage/YoloNASDownStage`` and the
blocks reference ``QARepVGGBlock``/``ConvBNReLU`` at
``yolo_head_training/yolo_head/yolo_head_dfl_head.py:9,91-135``).  The module
internals are re-derived from the public SuperGradients YOLO-NAS design
(QARepVGG = "Make RepVGG Greater Again", arXiv:2212.01593) and written
TPU-first:

* NHWC layout (XLA's native convolution layout on TPU).
* A compute ``dtype`` threaded through every block so the whole backbone can
  run in bfloat16 on the MXU while parameters/BN stats stay float32.
* QARepVGG blocks carry a structural-reparameterization rule
  (:func:`fuse_qarepvgg_params`) that collapses the 3x3+1x1+identity training
  branches into a single 3x3 conv for inference — on TPU this removes two of
  three convolutions and all branch adds from the hot path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class BlockCfg:
    """Static knobs shared by every block (reference arch YAML tail keys
    ``bn_eps: 1e-6 / bn_momentum: 0.03``, yolo_heads_l_arch_params.yaml:139-140).

    ``bn_momentum`` uses the torch convention (fraction of the *new* batch
    statistic); flax's BatchNorm momentum is the fraction of the *old* running
    statistic, so the translation is ``flax_momentum = 1 - torch_momentum``.
    """

    bn_eps: float = 1e-6
    bn_momentum: float = 0.03  # torch convention
    dtype: Any = jnp.float32

    @property
    def flax_momentum(self) -> float:
        return 1.0 - self.bn_momentum


def width_multiplier(value: int, factor: float, divisor: int = 8) -> int:
    """Channel scaling (SG ``modules.utils.width_multiplier`` semantics)."""
    scaled = value * factor
    return int(np.ceil(scaled / divisor) * divisor)


class ConvBNAct(nn.Module):
    """Conv2d(bias=False) + BatchNorm + optional ReLU (SG ``ConvBNReLU``)."""

    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    groups: int = 1
    use_act: bool = True
    cfg: BlockCfg = BlockCfg()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.cfg.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.cfg.flax_momentum,
            epsilon=self.cfg.bn_eps,
            dtype=self.cfg.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        if self.use_act:
            x = nn.relu(x)
        return x


class QARepVGGBlock(nn.Module):
    """Quantization-aware RepVGG block.

    Training-time structure (public QARepVGG-A2 design, used throughout
    YOLO-NAS):

        y = relu( post_bn( bn(conv3x3(x)) + alpha * conv1x1(x) [+ x] ) )

    * 3x3 branch: conv(bias=False) + BN
    * 1x1 branch: conv with bias, **no** BN (the QA part), optionally scaled
      by a learnable scalar ``alpha`` (the reference's FLAME towers construct
      it with ``use_alpha=True``, ``yolo_head_dfl_head.py:129``).
    * identity branch only when shapes allow and ``use_residual_connection``.
    * ``post_bn`` after the sum.

    With ``deploy=True`` the block is a single 3x3 conv (+bias) + ReLU whose
    parameters come from :func:`fuse_qarepvgg_params`.
    """

    out_channels: int
    stride: int = 1
    groups: int = 1
    use_residual_connection: bool = True
    use_alpha: bool = False
    use_act: bool = True
    deploy: bool = False
    s2d: bool = False
    cfg: BlockCfg = BlockCfg()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.deploy and self.s2d:
            # Space-to-depth form of the stride-2 3x3 conv (deploy only):
            # rearrange (H, W, C) -> (H/2, W/2, 4C) and convolve 2x2/s1 with
            # the fused kernel re-laid by export.s2d_stem_kernel — exactly
            # the same arithmetic, but the MXU contraction dim grows from
            # 9*C to 4*4C (3 -> 48 lanes at the RGB stem, where the dense
            # form populates 3/128 lanes; BENCHMARKS.md roofline memo).
            assert self.stride == 2 and self.groups == 1
            b, h, w, c = x.shape
            y = x.reshape(b, h // 2, 2, w // 2, 2, c)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
            y = nn.Conv(
                self.out_channels,
                (2, 2),
                strides=(1, 1),
                # torch-pad-1 semantics of the dense 3x3/s2: output (i, j)
                # reads input rows 2i-1..2i+1 == s2d rows {i-1, i}
                padding=[(1, 0), (1, 0)],
                use_bias=True,
                dtype=self.cfg.dtype,
                param_dtype=jnp.float32,
                name="rbr_reparam",
            )(y)
            return nn.relu(y) if self.use_act else y

        if self.deploy:
            y = nn.Conv(
                self.out_channels,
                (3, 3),
                strides=(self.stride, self.stride),
                padding=[(1, 1), (1, 1)],
                feature_group_count=self.groups,
                use_bias=True,
                dtype=self.cfg.dtype,
                param_dtype=jnp.float32,
                name="rbr_reparam",
            )(x)
            return nn.relu(y) if self.use_act else y

        in_channels = x.shape[-1]
        identity_ok = (
            self.use_residual_connection
            and in_channels == self.out_channels
            and self.stride == 1
        )

        y3 = nn.Conv(
            self.out_channels,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.cfg.dtype,
            param_dtype=jnp.float32,
            name="branch_3x3_conv",
        )(x)
        y3 = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.cfg.flax_momentum,
            epsilon=self.cfg.bn_eps,
            dtype=self.cfg.dtype,
            param_dtype=jnp.float32,
            name="branch_3x3_bn",
        )(y3)

        y1 = nn.Conv(
            self.out_channels,
            (1, 1),
            strides=(self.stride, self.stride),
            padding="VALID",
            feature_group_count=self.groups,
            use_bias=True,
            dtype=self.cfg.dtype,
            param_dtype=jnp.float32,
            name="branch_1x1",
        )(x)
        if self.use_alpha:
            alpha = self.param("alpha", nn.initializers.ones, (), jnp.float32)
            y1 = y1 * alpha.astype(y1.dtype)

        y = y3 + y1
        if identity_ok:
            y = y + x

        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.cfg.flax_momentum,
            epsilon=self.cfg.bn_eps,
            dtype=self.cfg.dtype,
            param_dtype=jnp.float32,
            name="post_bn",
        )(y)
        return nn.relu(y) if self.use_act else y


class YoloNASBottleneck(nn.Module):
    """Two QARepVGG blocks with an optional residual add."""

    out_channels: int
    shortcut: bool = True
    deploy: bool = False
    cfg: BlockCfg = BlockCfg()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_channels = x.shape[-1]
        y = QARepVGGBlock(
            self.out_channels, deploy=self.deploy, cfg=self.cfg, name="cv1"
        )(x, train)
        y = QARepVGGBlock(
            self.out_channels, deploy=self.deploy, cfg=self.cfg, name="cv2"
        )(y, train)
        if self.shortcut and in_channels == self.out_channels:
            y = x + y
        return y


class YoloNASCSPLayer(nn.Module):
    """Cross-stage-partial layer over YoloNASBottlenecks.

    ``concat_intermediates=True`` concatenates the main-branch input and every
    bottleneck output (n+2 tensors of ``hidden`` channels) before the final
    1x1 projection — the dense-aggregation variant used by the L config
    (yolo_heads_l_arch_params.yaml:17).
    """

    out_channels: int
    num_bottlenecks: int
    hidden_channels: Optional[int] = None
    concat_intermediates: bool = False
    expansion: float = 0.5
    deploy: bool = False
    cfg: BlockCfg = BlockCfg()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = self.hidden_channels or int(self.out_channels * self.expansion)
        main = ConvBNAct(hidden, 1, cfg=self.cfg, name="conv1")(x, train)
        bypass = ConvBNAct(hidden, 1, cfg=self.cfg, name="conv2")(x, train)

        outs = [main]
        h = main
        for i in range(self.num_bottlenecks):
            h = YoloNASBottleneck(
                hidden, shortcut=True, deploy=self.deploy, cfg=self.cfg,
                name=f"bottleneck{i}",
            )(h, train)
            outs.append(h)

        if self.concat_intermediates:
            merged = jnp.concatenate(outs + [bypass], axis=-1)
        else:
            merged = jnp.concatenate([h, bypass], axis=-1)
        return ConvBNAct(self.out_channels, 1, cfg=self.cfg, name="conv3")(
            merged, train
        )


class SPP(nn.Module):
    """Spatial pyramid pooling (kernel sizes from the arch YAML, [5, 9, 13])."""

    out_channels: int
    k: Tuple[int, ...] = (5, 9, 13)
    cfg: BlockCfg = BlockCfg()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = x.shape[-1] // 2
        x = ConvBNAct(hidden, 1, cfg=self.cfg, name="cv1")(x, train)
        pools = [x]
        for ks in self.k:
            pools.append(
                nn.max_pool(
                    x,
                    window_shape=(ks, ks),
                    strides=(1, 1),
                    padding=[(ks // 2, ks // 2), (ks // 2, ks // 2)],
                )
            )
        x = jnp.concatenate(pools, axis=-1)
        return ConvBNAct(self.out_channels, 1, cfg=self.cfg, name="cv2")(x, train)


class YoloNASStem(nn.Module):
    """Stride-2 QARepVGG stem (arch YAML ``YoloNASStem``)."""

    out_channels: int
    deploy: bool = False
    s2d: bool = False
    cfg: BlockCfg = BlockCfg()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return QARepVGGBlock(
            self.out_channels,
            stride=2,
            use_residual_connection=False,
            deploy=self.deploy,
            s2d=self.s2d,
            cfg=self.cfg,
            name="conv",
        )(x, train)


class YoloNASStage(nn.Module):
    """Stride-2 downsample block + CSP layer (arch YAML ``YoloNASStage``)."""

    out_channels: int
    num_blocks: int
    hidden_channels: Optional[int] = None
    concat_intermediates: bool = False
    deploy: bool = False
    cfg: BlockCfg = BlockCfg()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = QARepVGGBlock(
            self.out_channels,
            stride=2,
            use_residual_connection=False,
            deploy=self.deploy,
            cfg=self.cfg,
            name="downsample",
        )(x, train)
        return YoloNASCSPLayer(
            self.out_channels,
            self.num_blocks,
            hidden_channels=self.hidden_channels,
            concat_intermediates=self.concat_intermediates,
            deploy=self.deploy,
            cfg=self.cfg,
            name="blocks",
        )(x, train)


class YoloNASUpStage(nn.Module):
    """PAN top-down stage: 1x1 reduce -> 2x transposed-conv upsample -> concat
    with (reduced) skip(s) -> CSP.  Returns ``(x_inter, x)`` where ``x_inter``
    is the pre-upsample tensor consumed by the symmetric down path.

    Three-input form (first neck stage) additionally downsamples the
    second skip so three same-resolution tensors are concatenated.
    """

    out_channels: int
    num_blocks: int
    hidden_channels: Optional[int] = None
    width_mult: float = 1.0
    depth_mult: float = 1.0
    reduce_channels: bool = False
    deploy: bool = False
    cfg: BlockCfg = BlockCfg()

    @nn.compact
    def __call__(
        self, inputs: Sequence[jnp.ndarray], train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        out_ch = width_multiplier(self.out_channels, self.width_mult, 8)
        num_blocks = (
            max(round(self.num_blocks * self.depth_mult), 1)
            if self.num_blocks > 1
            else self.num_blocks
        )

        if len(inputs) == 2:
            x, skip = inputs
            if self.reduce_channels:
                skip = ConvBNAct(out_ch, 1, cfg=self.cfg, name="reduce_skip")(
                    skip, train
                )
            skips = [skip]
        else:
            x, skip1, skip2 = inputs
            if self.reduce_channels:
                skip1 = ConvBNAct(out_ch, 1, cfg=self.cfg, name="reduce_skip1")(
                    skip1, train
                )
                skip2 = ConvBNAct(out_ch, 1, cfg=self.cfg, name="reduce_skip2")(
                    skip2, train
                )
            skip2 = ConvBNAct(out_ch, 3, stride=2, cfg=self.cfg, name="downsample")(
                skip2, train
            )
            skips = [skip1, skip2]

        x_inter = ConvBNAct(out_ch, 1, cfg=self.cfg, name="conv")(x, train)
        x = nn.ConvTranspose(
            out_ch,
            (2, 2),
            strides=(2, 2),
            padding="VALID",
            use_bias=True,
            dtype=self.cfg.dtype,
            param_dtype=jnp.float32,
            name="upsample",
        )(x_inter)
        x = jnp.concatenate([x, *skips], axis=-1)
        if self.reduce_channels:
            x = ConvBNAct(out_ch, 1, cfg=self.cfg, name="reduce_after_concat")(
                x, train
            )
        x = YoloNASCSPLayer(
            out_ch,
            num_blocks,
            hidden_channels=self.hidden_channels,
            deploy=self.deploy,
            cfg=self.cfg,
            name="blocks",
        )(x, train)
        return x_inter, x


class YoloNASDownStage(nn.Module):
    """PAN bottom-up stage: stride-2 3x3 conv -> concat skip -> CSP."""

    out_channels: int
    num_blocks: int
    hidden_channels: Optional[int] = None
    width_mult: float = 1.0
    depth_mult: float = 1.0
    deploy: bool = False
    cfg: BlockCfg = BlockCfg()

    @nn.compact
    def __call__(
        self, inputs: Sequence[jnp.ndarray], train: bool = False
    ) -> jnp.ndarray:
        x, skip = inputs
        out_ch = width_multiplier(self.out_channels, self.width_mult, 8)
        num_blocks = (
            max(round(self.num_blocks * self.depth_mult), 1)
            if self.num_blocks > 1
            else self.num_blocks
        )
        x = ConvBNAct(out_ch // 2, 3, stride=2, cfg=self.cfg, name="conv")(x, train)
        x = jnp.concatenate([x, skip], axis=-1)
        return YoloNASCSPLayer(
            out_ch,
            num_blocks,
            hidden_channels=self.hidden_channels,
            deploy=self.deploy,
            cfg=self.cfg,
            name="blocks",
        )(x, train)
