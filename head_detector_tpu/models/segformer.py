"""SegFormer (MiT) backbone variant feeding the YoloHeads NDFL heads.

Functional spec: reference ``yolo_head_training/yolo_head/segformer_heads.py``
+ ``configs/arch_params/segformer_b5_yolo.yaml``: a MiT-B5 hierarchical
transformer encoder (overlap patch embeds; efficient self-attention with
spatial-reduction ratios 8/4/2/1 and heads 1/2/5/8; Mix-FFN with a depthwise
3x3; embed dims 64/128/320/512, depths 3/6/40/3), whose last three stages
(strides 8/16/32) drive the same detection + FLAME heads.

TPU notes: attention over the stage-1 sequence (160x160 tokens at 640px)
is made MXU-friendly by the spatial reduction (KV sequence len / R^2); all
matmuls run in the model dtype (bf16-capable) with fp32 params.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from head_detector_tpu.models.blocks import BlockCfg
from head_detector_tpu.models.heads import DecodedPredictions, RawOutputs, YoloHeadsNDFLHeads
from head_detector_tpu.models.presets import ArchCfg, HeadCfg


@dataclasses.dataclass(frozen=True)
class MiTCfg:
    embed_dims: Tuple[int, ...] = (64, 128, 320, 512)
    depths: Tuple[int, ...] = (3, 6, 40, 3)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    num_heads: Tuple[int, ...] = (1, 2, 5, 8)
    patch_sizes: Tuple[int, ...] = (7, 3, 3, 3)
    patch_strides: Tuple[int, ...] = (4, 2, 2, 2)
    patch_pads: Tuple[int, ...] = (3, 1, 1, 1)
    mlp_ratio: int = 4


MIT_B5 = MiTCfg()
MIT_B0 = MiTCfg(embed_dims=(32, 64, 160, 256), depths=(2, 2, 2, 2))


class OverlapPatchEmbed(nn.Module):
    dim: int
    patch: int
    stride: int
    pad: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.dim, (self.patch, self.patch), strides=(self.stride, self.stride),
            padding=[(self.pad, self.pad), (self.pad, self.pad)],
            dtype=self.dtype, param_dtype=jnp.float32, name="proj",
        )(x)
        return nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm")(x)


class EfficientSelfAttention(nn.Module):
    dim: int
    heads: int
    sr_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        head_dim = self.dim // self.heads
        q = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="q")(x)
        q = q.reshape(b, h * w, self.heads, head_dim)

        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.Conv(
                self.dim, (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio), padding="VALID",
                dtype=self.dtype, param_dtype=jnp.float32, name="sr",
            )(x)
            kv_in = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                                 name="sr_norm")(kv_in)
        kh, kw = kv_in.shape[1], kv_in.shape[2]
        k = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="k")(kv_in)
        v = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="v")(kv_in)
        k = k.reshape(b, kh * kw, self.heads, head_dim)
        v = v.reshape(b, kh * kw, self.heads, head_dim)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, self.dtype)
        )
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class MixFFN(nn.Module):
    dim: int
    mlp_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = self.dim * self.mlp_ratio
        y = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        y = nn.Conv(
            hidden, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=hidden,
            dtype=self.dtype, param_dtype=jnp.float32, name="dwconv",
        )(y)
        y = nn.gelu(y)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(y)


class MiTBlock(nn.Module):
    dim: int
    heads: int
    sr_ratio: int
    mlp_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)
        x = x + EfficientSelfAttention(
            self.dim, self.heads, self.sr_ratio, dtype=self.dtype, name="attn"
        )(y)
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        return x + MixFFN(self.dim, self.mlp_ratio, dtype=self.dtype, name="ffn")(y)


class MiTBackbone(nn.Module):
    cfg: MiTCfg = MIT_B5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        outs = []
        for stage in range(4):
            x = OverlapPatchEmbed(
                self.cfg.embed_dims[stage],
                self.cfg.patch_sizes[stage],
                self.cfg.patch_strides[stage],
                self.cfg.patch_pads[stage],
                dtype=self.dtype,
                name=f"patch_embed{stage + 1}",
            )(x)
            for blk in range(self.cfg.depths[stage]):
                x = MiTBlock(
                    self.cfg.embed_dims[stage],
                    self.cfg.num_heads[stage],
                    self.cfg.sr_ratios[stage],
                    self.cfg.mlp_ratio,
                    dtype=self.dtype,
                    name=f"stage{stage + 1}_block{blk}",
                )(x)
            x = nn.LayerNorm(
                dtype=self.dtype, param_dtype=jnp.float32, name=f"norm{stage + 1}"
            )(x)
            outs.append(x)
        return tuple(outs)


def _segformer_heads(arch_like: ArchCfg) -> Tuple[HeadCfg, HeadCfg, HeadCfg]:
    # segformer_b5_yolo.yaml head params == the L heads
    return arch_like.heads


class SegFormerYoloHeads(nn.Module):
    """MiT backbone -> stages[1:] -> YoloHeadsNDFLHeads (ref forward drops
    the stride-4 stage)."""

    mit: MiTCfg = MIT_B5
    arch: ArchCfg = None  # head/bn config donor (defaults to the L preset)
    dtype: Any = jnp.float32

    def setup(self):
        from head_detector_tpu.models.presets import YOLO_HEADS_L

        arch = self.arch or YOLO_HEADS_L
        self.backbone = MiTBackbone(self.mit, dtype=self.dtype)
        self.heads = YoloHeadsNDFLHeads(
            arch,
            cfg=BlockCfg(bn_eps=arch.bn_eps, bn_momentum=arch.bn_momentum,
                         dtype=self.dtype),
        )

    def __call__(
        self, images: jnp.ndarray, train: bool = False
    ) -> Tuple[DecodedPredictions, RawOutputs]:
        x = images.astype(self.dtype)
        stages = self.backbone(x, train)
        return self.heads(list(stages[1:]), train)
