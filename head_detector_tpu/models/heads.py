"""Detection + FLAME regression heads with on-graph DFL decode.

Functional spec:
* per-scale head — reference ``yolo_head_training/yolo_head/yolo_head_dfl_head.py:17-191``
  (stems, cls/reg towers, six QARepVGG FLAME regression towers with the
  activation zoo: shape/expression ``tanh*3``, scale ``exp/0.05``,
  rotation/jaw/translation linear; shape/expr zero-padded to 300/100 channels;
  classifier bias initialised to the focal prior ``-log((1-p)/p), p=0.01``).
* multi-scale merge + decode — reference ``yolo_head_ndfl_heads.py:117-236``
  (DFL ``softmax(bins) @ proj`` expectation, ``distance2bbox * stride``,
  FLAME globalisation ``translation.xy += anchor centers; scale *= stride``).

TPU-first differences from the reference:
* NHWC feature maps; every per-anchor tensor is ``[B, A, C]`` so the DFL
  expectation and box decode are single fused einsums over all scales.
* Anchor grids are compile-time constants (shapes are static under jit), so
  there is no eval/tracing `cache_anchors` split — the cached-anchor export
  path and the dynamic path are the same code.
* The FLAME globalisation indexes the packed 413-vector directly:
  translation occupies ``[409:412]`` and scale ``[412:413]`` in *both* wire
  conventions (the from_3dmm/to_3dmm jaw/rotation swap only permutes
  ``[400:409]``), so no unpack/repack round trip is needed.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from head_detector_tpu.head_info import FLAME_CONSTS
from head_detector_tpu.models.blocks import (
    BlockCfg,
    ConvBNAct,
    QARepVGGBlock,
    width_multiplier,
)
from head_detector_tpu.models.presets import ArchCfg, HeadCfg

# packed-vector offsets (see module docstring)
_TRANSLATION_SLICE = slice(409, 412)
_SCALE_INDEX = 412


class DecodedPredictions(NamedTuple):
    """Reference ``YoloHeadsDecodedPredictions`` (yolo_head_ndfl_heads.py:20-31)."""

    boxes_xyxy: jnp.ndarray  # [B, A, 4]
    scores: jnp.ndarray  # [B, A, 1]
    flame_params: jnp.ndarray  # [B, A, 413]


class RawOutputs(NamedTuple):
    """Reference ``YoloHeadsRawOutputs`` (yolo_head_ndfl_heads.py:34-47)."""

    cls_score_list: jnp.ndarray  # [B, A, 1] logits
    reg_distri_list: jnp.ndarray  # [B, A, 4*(reg_max+1)]
    flame_params: jnp.ndarray  # [B, A, 413] (globalised)
    anchors: jnp.ndarray  # [A, 4] grid-cell boxes (scale 5) in pixels
    anchor_points: jnp.ndarray  # [A, 2] cell centers in pixels
    num_anchors_list: Tuple[int, ...]
    stride_tensor: jnp.ndarray  # [A, 1]


class FlameRegressionTower(nn.Module):
    """N QARepVGG blocks (no residual, learnable alpha) + 1x1 conv
    (reference ``build_flame_regression_layers``, yolo_head_dfl_head.py:128-135)."""

    inter_channels: int
    out_channels: int
    num_blocks: int
    deploy: bool = False
    cfg: BlockCfg = BlockCfg()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(self.num_blocks):
            x = QARepVGGBlock(
                self.inter_channels,
                use_residual_connection=False,
                use_alpha=True,
                deploy=self.deploy,
                cfg=self.cfg,
                name=f"block{i}",
            )(x, train)
        return nn.Conv(
            self.out_channels,
            (1, 1),
            use_bias=True,
            dtype=self.cfg.dtype,
            param_dtype=jnp.float32,
            name="pred",
        )(x)


class YoloHeadsDFLHead(nn.Module):
    """Single-scale head. Input [B, H, W, C] -> (reg, cls, flame) NHWC maps.

    ``skip_flame``: skip the six FLAME regression towers entirely and emit a
    zero-width flame map — the sparse inference path (ops/sparse_towers.py)
    re-runs the towers post-NMS on patches at the kept anchors only, so the
    dense [B, A, 413] tensor is never computed."""

    head: HeadCfg
    deploy: bool = False
    skip_flame: bool = False
    cfg: BlockCfg = BlockCfg()

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        h = self.head
        bbox_ch = width_multiplier(h.bbox_inter_channels, h.width_mult, 8)
        flame_ch = width_multiplier(h.flame_inter_channels, h.width_mult, 8)

        if h.first_conv_group_size == 0:
            groups = 0
        elif h.first_conv_group_size == -1:
            groups = 1
        else:
            groups = bbox_ch // h.first_conv_group_size

        if h.shared_stem:
            max_input = max(bbox_ch, flame_ch)
            stem = ConvBNAct(max_input, 1, cfg=self.cfg, name="stem")(x, train)
            pose_feat = stem
            bbox_feat = stem
            if max_input != flame_ch and not self.skip_flame:
                pose_feat = nn.Conv(
                    flame_ch, (1, 1), use_bias=False, dtype=self.cfg.dtype,
                    param_dtype=jnp.float32, name="pose_stem",
                )(stem)
            if max_input != bbox_ch:
                bbox_feat = nn.Conv(
                    bbox_ch, (1, 1), use_bias=False, dtype=self.cfg.dtype,
                    param_dtype=jnp.float32, name="bbox_stem",
                )(stem)
        else:
            if not self.skip_flame:
                pose_feat = ConvBNAct(flame_ch, 1, cfg=self.cfg, name="pose_stem")(
                    x, train
                )
            bbox_feat = ConvBNAct(bbox_ch, 1, cfg=self.cfg, name="bbox_stem")(
                x, train
            )

        cls_feat = bbox_feat
        reg_feat = bbox_feat
        if groups:
            cls_feat = ConvBNAct(
                bbox_ch, 3, groups=groups, cfg=self.cfg, name="cls_conv_grouped"
            )(cls_feat, train)
            reg_feat = ConvBNAct(
                bbox_ch, 3, groups=groups, cfg=self.cfg, name="reg_conv_grouped"
            )(reg_feat, train)
        cls_feat = ConvBNAct(bbox_ch, 3, cfg=self.cfg, name="cls_conv")(
            cls_feat, train
        )
        reg_feat = ConvBNAct(bbox_ch, 3, cfg=self.cfg, name="reg_conv")(
            reg_feat, train
        )

        prior_bias = -math.log((1 - 0.01) / 0.01)
        cls_out = nn.Conv(
            1, (1, 1), use_bias=True,
            bias_init=nn.initializers.constant(prior_bias),
            dtype=self.cfg.dtype, param_dtype=jnp.float32, name="cls_pred",
        )(cls_feat)
        reg_out = nn.Conv(
            4 * (h.reg_max + 1), (1, 1), use_bias=True,
            dtype=self.cfg.dtype, param_dtype=jnp.float32, name="reg_pred",
        )(reg_feat)

        if self.skip_flame:
            b_, hh, ww, _ = x.shape
            flame_empty = jnp.zeros((b_, hh, ww, 0), reg_out.dtype)
            return reg_out, cls_out, flame_empty

        def tower(name, inter, out):
            return FlameRegressionTower(
                inter, out, h.flame_regression_blocks,
                deploy=self.deploy, cfg=self.cfg, name=name,
            )(pose_feat, train)

        shape = jnp.tanh(
            tower("flame_shape_pred", h.flame_shape_inter_channels,
                  h.flame_shape_out_channels)
        ) * 3
        expression = jnp.tanh(
            tower("flame_expression_pred", h.flame_expression_inter_channels,
                  h.flame_expression_out_channels)
        ) * 3
        rotation = tower(
            "flame_rotation_pred", h.flame_transformation_inter_channels,
            FLAME_CONSTS["rotation"],
        )
        jaw = tower(
            "flame_jaw_pred", h.flame_transformation_inter_channels,
            FLAME_CONSTS["jaw"],
        )
        translation = tower(
            "flame_translation_pred", h.flame_transformation_inter_channels,
            FLAME_CONSTS["translation"],
        )
        # exp clipped to +-15: identical to the reference activation
        # (exp(x)/0.05, yolo_head_dfl_head.py:167) over the entire range a
        # trained model uses, but keeps untrained/garbage activations finite.
        scale = jnp.exp(
            jnp.clip(
                tower("flame_scale_pred", h.flame_transformation_inter_channels,
                      FLAME_CONSTS["scale"]),
                -15.0,
                15.0,
            )
        ) / 0.05

        # channel-pad shape/expression to the full FLAME widths
        pad = lambda t, w: jnp.pad(t, [(0, 0)] * 3 + [(0, w - t.shape[-1])])
        shape = pad(shape, FLAME_CONSTS["shape"])
        expression = pad(expression, FLAME_CONSTS["expression"])

        flame_out = jnp.concatenate(
            [shape, expression, rotation, jaw, translation, scale], axis=-1
        )
        return reg_out, cls_out, flame_out


def make_anchors(
    feat_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    grid_cell_scale: float = 5.0,
    grid_cell_offset: float = 0.5,
) -> Tuple[np.ndarray, np.ndarray, Tuple[int, ...], np.ndarray]:
    """Anchor grids as numpy compile-time constants.

    Returns (anchors [A,4] pixel boxes of size ``grid_cell_scale*stride``,
    anchor_points [A,2] cell centers in *grid units* (+offset),
    num_anchors_list, stride_tensor [A,1]).  The reference computes the same
    two flavours in ``generate_anchors_for_grid_cell`` (training, pixels) and
    ``_generate_anchors`` (eval, grid units) — yolo_head_ndfl_heads.py:206-236.
    """
    anchors, points, strides_out, counts = [], [], [], []
    for (h, w), stride in zip(feat_shapes, strides):
        sx = (np.arange(w, dtype=np.float32) + grid_cell_offset)
        sy = (np.arange(h, dtype=np.float32) + grid_cell_offset)
        gy, gx = np.meshgrid(sy, sx, indexing="ij")
        pts = np.stack([gx, gy], axis=-1).reshape(-1, 2)
        points.append(pts)
        half = grid_cell_scale * stride * 0.5
        center_px = pts * stride
        anchors.append(
            np.concatenate([center_px - half, center_px + half], axis=-1)
        )
        strides_out.append(np.full((h * w, 1), stride, dtype=np.float32))
        counts.append(h * w)
    return (
        np.concatenate(anchors, 0),
        np.concatenate(points, 0),
        tuple(counts),
        np.concatenate(strides_out, 0),
    )


def globalize_flame(
    flame_rows: jnp.ndarray,  # [..., K, 413] anchor-local params (f32)
    anchor_idx: jnp.ndarray,  # [..., K] int indices into the anchor axis
    anchor_points_px: jnp.ndarray,  # [A, 2] cell centers in pixels
    stride_tensor: jnp.ndarray,  # [A, 1]
) -> jnp.ndarray:
    """Apply the FLAME globalisation to already-selected anchor rows.

    Reference semantics (``yolo_head_ndfl_heads.py:168-171``): translation.xy
    += anchor centers in pixels, scale *= stride.  The reference (and the
    eager decode path here) applies this to the dense ``[B, A, 413]`` tensor
    before NMS; doing it *after* selection touches ``K`` rows instead of
    ``A`` (8400) and lets the dense tensor stay in model dtype — identical
    results in f32, ~16 ms less HBM traffic per batch-32 step at 640px.
    """
    centers = anchor_points_px[anchor_idx].astype(flame_rows.dtype)  # [..., K, 2]
    strides = stride_tensor[..., 0][anchor_idx].astype(flame_rows.dtype)  # [..., K]
    t0 = _TRANSLATION_SLICE.start
    out = flame_rows.at[..., t0 : t0 + 2].add(centers)
    return out.at[..., _SCALE_INDEX].multiply(strides)


class YoloHeadsNDFLHeads(nn.Module):
    """``defer_globalization``: skip the dense f32 cast + translation/scale
    globalisation of the [B, A, 413] FLAME tensor; callers select rows first
    (NMS) and apply :func:`globalize_flame` to the K kept rows."""

    arch: ArchCfg
    deploy: bool = False
    defer_globalization: bool = False
    skip_flame: bool = False
    cfg: BlockCfg = BlockCfg()

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], train: bool = False
    ) -> Tuple[DecodedPredictions, RawOutputs]:
        arch = self.arch
        reg_max = arch.reg_max
        b = feats[0].shape[0]

        cls_list: List[jnp.ndarray] = []
        reg_list: List[jnp.ndarray] = []
        flame_list: List[jnp.ndarray] = []
        feat_shapes: List[Tuple[int, int]] = []

        for i, (feat, hcfg) in enumerate(zip(feats, arch.heads)):
            _, h, w, _ = feat.shape
            feat_shapes.append((h, w))
            reg_out, cls_out, flame_out = YoloHeadsDFLHead(
                hcfg, deploy=self.deploy, skip_flame=self.skip_flame,
                cfg=self.cfg, name=f"head{i + 1}",
            )(feat, train)
            reg_list.append(reg_out.reshape(b, h * w, 4 * (reg_max + 1)))
            cls_list.append(cls_out.reshape(b, h * w, 1))
            flame_list.append(flame_out.reshape(b, h * w, flame_out.shape[-1]))

        cls_scores = jnp.concatenate(cls_list, axis=1)  # [B, A, 1]
        reg_distri = jnp.concatenate(reg_list, axis=1)  # [B, A, 4*(m+1)]
        flame = jnp.concatenate(flame_list, axis=1)  # [B, A, 413]

        # anchors are compile-time constants under jit
        strides = tuple(h.stride for h in arch.heads)
        anchors_np, points_np, counts, stride_np = make_anchors(
            feat_shapes, strides, arch.grid_cell_scale, arch.grid_cell_offset
        )
        anchor_points = jnp.asarray(points_np)  # [A, 2] grid units
        stride_tensor = jnp.asarray(stride_np)  # [A, 1]

        # DFL expectation: softmax over bins dot [0..reg_max]
        a = reg_distri.shape[1]
        dist = reg_distri.reshape(b, a, 4, reg_max + 1).astype(jnp.float32)
        proj = jnp.arange(reg_max + 1, dtype=jnp.float32)
        expected = jnp.einsum(
            "bakm,m->bak", nn.softmax(dist, axis=-1), proj
        )  # [B, A, 4] ltrb in grid units

        # distance2bbox * stride (batch_distance2bbox semantics)
        x1y1 = anchor_points[None] - expected[..., :2]
        x2y2 = anchor_points[None] + expected[..., 2:]
        pred_bboxes = jnp.concatenate([x1y1, x2y2], axis=-1) * stride_tensor[None]

        pred_scores = nn.sigmoid(cls_scores.astype(jnp.float32))

        # FLAME globalisation on the packed vector (see module docstring).
        # When deferred, the dense [B, A, 413] tensor stays anchor-local in
        # model dtype; consumers NMS-select rows then call globalize_flame.
        if not self.defer_globalization and flame.shape[-1]:
            centers = anchor_points * stride_tensor  # [A, 2] pixels
            flame = flame.astype(jnp.float32)
            flame = flame.at[
                ..., _TRANSLATION_SLICE.start : _TRANSLATION_SLICE.start + 2
            ].add(centers[None])
            flame = flame.at[..., _SCALE_INDEX].multiply(stride_tensor[None, :, 0])

        decoded = DecodedPredictions(
            boxes_xyxy=pred_bboxes, scores=pred_scores, flame_params=flame
        )
        raw = RawOutputs(
            cls_score_list=cls_scores.astype(jnp.float32),
            reg_distri_list=reg_distri.astype(jnp.float32),
            flame_params=flame,
            anchors=jnp.asarray(anchors_np),
            anchor_points=jnp.asarray(points_np * stride_np),  # pixels
            num_anchors_list=counts,
            stride_tensor=stride_tensor,
        )
        return decoded, raw
