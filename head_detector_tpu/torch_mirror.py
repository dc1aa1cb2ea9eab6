"""Torch twin of YoloHeads with SuperGradients state-dict naming.

Three jobs, none of which the flax model can do alone:

1. **Converter validation at full-model scale** — the mirror's
   ``state_dict()`` uses the exact SuperGradients module-path conventions the
   reference trains/ships (``<wrapper>.backbone/neck/heads``, ``.seq.``
   ConvBNReLU wrapping, ``branch_3x3.conv``/``bn`` QARepVGG children,
   ``bottlenecks.N`` (+``alpha``), ``flame_*_pred.N`` towers — the mapping
   table of ``tools/convert_torch_checkpoint.py``), so converting it must
   cover every leaf of the flax tree (tests/test_torch_mirror.py).
2. **End-to-end numeric parity against live torch** — the mirror's forward
   reproduces the reference decode (DFL expectation -> distance2bbox * stride,
   FLAME activation zoo + globalisation: reference
   ``yolo_head_training/yolo_head/yolo_head_ndfl_heads.py:117-236``,
   ``yolo_head_dfl_head.py:141-186``), so converted weights must produce the
   same (boxes, scores, flame) from both frameworks.
3. **TorchScript export** — :func:`export_torchscript` loads a flax
   checkpoint into the mirror and ``torch.jit.trace``s it, producing the
   ``.trcd`` artifact format the reference publishes on HF hub
   (reference ``exportable_mesh_model.py:440-442``:
   ``torch.jit.trace -> save`` is exactly how those checkpoints were made).

The mirror is intentionally torch-idiomatic NCHW — it exists to interoperate
with the torch ecosystem, not to run on TPU; the TPU path is the flax model.

Structural deltas (shared with the flax model, both documented there):
* FLAME ``scale`` tower activation clips its pre-exp input to +-15
  (``models/heads.py:209-219``) — identical to the reference activation over
  the range a trained model uses.
* anchor grids are recomputed from feature shapes each forward (the trace
  bakes them as constants — the reference's ``cache_anchors`` has the same
  effect on the traced graph).
"""

from __future__ import annotations

import math
from collections import OrderedDict
from typing import List, Sequence, Tuple

import numpy as np
import torch
from torch import nn

from head_detector_tpu.head_info import FLAME_CONSTS
from head_detector_tpu.models.blocks import width_multiplier
from head_detector_tpu.models.presets import ArchCfg, HeadCfg, get_arch


# --------------------------------------------------------------------- #
# blocks (SG naming)
# --------------------------------------------------------------------- #
class ConvBNReLU(nn.Module):
    """SG ConvBNReLU: children live under ``seq`` (seq.conv / seq.bn)."""

    def __init__(self, in_ch, out_ch, k=1, stride=1, groups=1, use_act=True,
                 eps=1e-6):
        super().__init__()
        self.seq = nn.Sequential(OrderedDict([
            ("conv", nn.Conv2d(in_ch, out_ch, k, stride, k // 2,
                               groups=groups, bias=False)),
            ("bn", nn.BatchNorm2d(out_ch, eps=eps)),
        ]))
        self.use_act = use_act
        self.out_channels = out_ch

    def forward(self, x):
        x = self.seq(x)
        return torch.relu(x) if self.use_act else x


class QARepVGGBlock(nn.Module):
    """QARepVGG training structure (see flax twin, models/blocks.py:94-192):
    relu(post_bn(bn(conv3x3(x)) + alpha * conv1x1(x) [+ x]))."""

    def __init__(self, in_ch, out_ch, stride=1, use_residual_connection=True,
                 use_alpha=False, use_act=True, eps=1e-6):
        super().__init__()
        self.branch_3x3 = nn.Sequential(OrderedDict([
            ("conv", nn.Conv2d(in_ch, out_ch, 3, stride, 1, bias=False)),
            ("bn", nn.BatchNorm2d(out_ch, eps=eps)),
        ]))
        self.branch_1x1 = nn.Conv2d(in_ch, out_ch, 1, stride, 0, bias=True)
        if use_alpha:
            self.alpha = nn.Parameter(torch.ones(()))
        else:
            self.alpha = 1.0
        self.identity = use_residual_connection and in_ch == out_ch and stride == 1
        self.post_bn = nn.BatchNorm2d(out_ch, eps=eps)
        self.use_act = use_act
        self.out_channels = out_ch

    def forward(self, x):
        y = self.branch_3x3(x) + self.alpha * self.branch_1x1(x)
        if self.identity:
            y = y + x
        y = self.post_bn(y)
        return torch.relu(y) if self.use_act else y


class YoloNASBottleneck(nn.Module):
    """cv1/cv2 QARepVGG pair with SG's learnable residual-branch ``alpha``
    (``x + alpha * cv2(cv1(x))``) — the converter folds alpha into
    cv2/post_bn since the flax twin carries no alpha parameter."""

    def __init__(self, in_ch, out_ch, shortcut=True, eps=1e-6):
        super().__init__()
        self.cv1 = QARepVGGBlock(in_ch, out_ch, eps=eps)
        self.cv2 = QARepVGGBlock(out_ch, out_ch, eps=eps)
        self.shortcut = shortcut and in_ch == out_ch
        self.alpha = nn.Parameter(torch.ones(()))

    def forward(self, x):
        y = self.alpha * self.cv2(self.cv1(x))
        return x + y if self.shortcut else y


class YoloNASCSPLayer(nn.Module):
    def __init__(self, in_ch, out_ch, num_bottlenecks, hidden_ch=None,
                 concat_intermediates=False, eps=1e-6):
        super().__init__()
        hidden = hidden_ch or int(out_ch * 0.5)
        self.conv1 = ConvBNReLU(in_ch, hidden, 1, eps=eps)
        self.conv2 = ConvBNReLU(in_ch, hidden, 1, eps=eps)
        self.bottlenecks = nn.Sequential(*[
            YoloNASBottleneck(hidden, hidden, eps=eps)
            for _ in range(num_bottlenecks)
        ])
        self.concat_intermediates = concat_intermediates
        n_cat = (num_bottlenecks + 2) if concat_intermediates else 2
        self.conv3 = ConvBNReLU(hidden * n_cat, out_ch, 1, eps=eps)
        self.out_channels = out_ch

    def forward(self, x):
        main = self.conv1(x)
        bypass = self.conv2(x)
        outs = [main]
        h = main
        for b in self.bottlenecks:
            h = b(h)
            outs.append(h)
        merged = torch.cat(outs + [bypass], 1) if self.concat_intermediates \
            else torch.cat([h, bypass], 1)
        return self.conv3(merged)


class SPP(nn.Module):
    def __init__(self, in_ch, out_ch, k=(5, 9, 13), eps=1e-6):
        super().__init__()
        hidden = in_ch // 2
        self.cv1 = ConvBNReLU(in_ch, hidden, 1, eps=eps)
        self.pools = nn.ModuleList(
            [nn.MaxPool2d(ks, 1, ks // 2) for ks in k]
        )
        self.cv2 = ConvBNReLU(hidden * (len(k) + 1), out_ch, 1, eps=eps)
        self.out_channels = out_ch

    def forward(self, x):
        x = self.cv1(x)
        return self.cv2(torch.cat([x] + [p(x) for p in self.pools], 1))


class YoloNASStem(nn.Module):
    def __init__(self, in_ch, out_ch, eps=1e-6):
        super().__init__()
        self.conv = QARepVGGBlock(in_ch, out_ch, stride=2,
                                  use_residual_connection=False, eps=eps)
        self.out_channels = out_ch

    def forward(self, x):
        return self.conv(x)


class YoloNASStage(nn.Module):
    def __init__(self, in_ch, st, eps=1e-6):
        super().__init__()
        self.downsample = QARepVGGBlock(in_ch, st.out_channels, stride=2,
                                        use_residual_connection=False, eps=eps)
        self.blocks = YoloNASCSPLayer(
            st.out_channels, st.out_channels, st.num_blocks,
            hidden_ch=st.hidden_channels,
            concat_intermediates=st.concat_intermediates, eps=eps,
        )
        self.out_channels = st.out_channels

    def forward(self, x):
        return self.blocks(self.downsample(x))


class NStageBackbone(nn.Module):
    def __init__(self, arch: ArchCfg):
        super().__init__()
        eps = arch.bn_eps
        self.stem = YoloNASStem(3, arch.stem_channels, eps=eps)
        ch = arch.stem_channels
        for i, st in enumerate(arch.stages):
            stage = YoloNASStage(ch, st, eps=eps)
            self.add_module(f"stage{i + 1}", stage)
            ch = st.out_channels
        self.context_module = SPP(ch, arch.spp_channels, k=arch.spp_k, eps=eps)

    def forward(self, x):
        x = self.stem(x)
        c2 = self.stage1(x)
        c3 = self.stage2(c2)
        c4 = self.stage3(c3)
        c5 = self.stage4(c4)
        return c2, c3, c4, self.context_module(c5)


class YoloNASUpStage(nn.Module):
    """PAN top-down stage; see flax twin models/blocks.py:333-407."""

    def __init__(self, in_chs: Sequence[int], cfgstage, eps=1e-6):
        super().__init__()
        out_ch = width_multiplier(cfgstage.out_channels, cfgstage.width_mult, 8)
        num_blocks = (
            max(round(cfgstage.num_blocks * cfgstage.depth_mult), 1)
            if cfgstage.num_blocks > 1 else cfgstage.num_blocks
        )
        self.three_inputs = len(in_chs) == 3
        skip_total = 0
        if self.three_inputs:
            x_ch, skip1_ch, skip2_ch = in_chs
            if cfgstage.reduce_channels:
                self.reduce_skip1 = ConvBNReLU(skip1_ch, out_ch, 1, eps=eps)
                self.reduce_skip2 = ConvBNReLU(skip2_ch, out_ch, 1, eps=eps)
                skip1_ch = skip2_ch = out_ch
            self.downsample = ConvBNReLU(skip2_ch, out_ch, 3, 2, eps=eps)
            skip_total = skip1_ch + out_ch
        else:
            x_ch, skip_ch = in_chs
            if cfgstage.reduce_channels:
                self.reduce_skip = ConvBNReLU(skip_ch, out_ch, 1, eps=eps)
                skip_ch = out_ch
            skip_total = skip_ch
        self.conv = ConvBNReLU(x_ch, out_ch, 1, eps=eps)
        self.upsample = nn.ConvTranspose2d(out_ch, out_ch, 2, 2, bias=True)
        cat_ch = out_ch + skip_total
        if cfgstage.reduce_channels:
            self.reduce_after_concat = ConvBNReLU(cat_ch, out_ch, 1, eps=eps)
            cat_ch = out_ch
        self.reduce_channels = cfgstage.reduce_channels
        self.blocks = YoloNASCSPLayer(
            cat_ch, out_ch, num_blocks, hidden_ch=cfgstage.hidden_channels,
            eps=eps,
        )
        self.out_channels = out_ch

    def forward(self, inputs: List[torch.Tensor]):
        if self.three_inputs:
            x, skip1, skip2 = inputs
            if self.reduce_channels:
                skip1 = self.reduce_skip1(skip1)
                skip2 = self.reduce_skip2(skip2)
            skips = [skip1, self.downsample(skip2)]
        else:
            x, skip = inputs
            if self.reduce_channels:
                skip = self.reduce_skip(skip)
            skips = [skip]
        x_inter = self.conv(x)
        x = torch.cat([self.upsample(x_inter)] + skips, 1)
        if self.reduce_channels:
            x = self.reduce_after_concat(x)
        return x_inter, self.blocks(x)


class YoloNASDownStage(nn.Module):
    def __init__(self, in_chs: Sequence[int], cfgstage, eps=1e-6):
        super().__init__()
        x_ch, skip_ch = in_chs
        out_ch = width_multiplier(cfgstage.out_channels, cfgstage.width_mult, 8)
        num_blocks = (
            max(round(cfgstage.num_blocks * cfgstage.depth_mult), 1)
            if cfgstage.num_blocks > 1 else cfgstage.num_blocks
        )
        self.conv = ConvBNReLU(x_ch, out_ch // 2, 3, 2, eps=eps)
        self.blocks = YoloNASCSPLayer(
            out_ch // 2 + skip_ch, out_ch, num_blocks,
            hidden_ch=cfgstage.hidden_channels, eps=eps,
        )
        self.out_channels = out_ch

    def forward(self, inputs: List[torch.Tensor]):
        x, skip = inputs
        return self.blocks(torch.cat([self.conv(x), skip], 1))


class YoloNASPANNeckWithC2(nn.Module):
    def __init__(self, arch: ArchCfg, in_chs: Sequence[int]):
        super().__init__()
        eps = arch.bn_eps
        c2, c3, c4, c5 = in_chs
        up1, up2 = arch.neck_up
        down1, down2 = arch.neck_down
        self.neck1 = YoloNASUpStage([c5, c4, c3], up1, eps=eps)
        self.neck2 = YoloNASUpStage([self.neck1.out_channels, c3, c2], up2,
                                    eps=eps)
        # down-path skips are the up stages' pre-upsample intermediates,
        # whose channel counts equal the up stages' out_channels
        self.neck3 = YoloNASDownStage(
            [self.neck2.out_channels, self.neck2.out_channels], down1, eps=eps)
        self.neck4 = YoloNASDownStage(
            [self.neck3.out_channels, self.neck1.out_channels], down2, eps=eps)
        self.out_channels = (
            self.neck2.out_channels, self.neck3.out_channels,
            self.neck4.out_channels,
        )

    def forward(self, inputs: List[torch.Tensor]):
        c2, c3, c4, c5 = inputs
        x_n1_inter, x = self.neck1([c5, c4, c3])
        x_n2_inter, p3 = self.neck2([x, c3, c2])
        p4 = self.neck3([p3, x_n2_inter])
        p5 = self.neck4([p4, x_n1_inter])
        return p3, p4, p5


def _flame_tower(in_ch, inter_ch, out_ch, num_blocks, eps):
    """N QARepVGG blocks (no residual, learnable alpha) + final 1x1 conv —
    a Sequential so keys are ``flame_*_pred.{0..N}`` (SG naming)."""
    layers = []
    ch = in_ch
    for _ in range(num_blocks):
        layers.append(QARepVGGBlock(ch, inter_ch,
                                    use_residual_connection=False,
                                    use_alpha=True, eps=eps))
        ch = inter_ch
    layers.append(nn.Conv2d(ch, out_ch, 1, bias=True))
    return nn.Sequential(*layers)


class YoloHeadsDFLHead(nn.Module):
    def __init__(self, in_ch: int, h: HeadCfg, eps=1e-6):
        super().__init__()
        if h.shared_stem or h.first_conv_group_size != 0:
            raise NotImplementedError(
                "mirror covers the shipped presets (non-shared stem, no "
                "grouped convs)"
            )
        bbox_ch = width_multiplier(h.bbox_inter_channels, h.width_mult, 8)
        flame_ch = width_multiplier(h.flame_inter_channels, h.width_mult, 8)
        self.pose_stem = ConvBNReLU(in_ch, flame_ch, 1, eps=eps)
        self.bbox_stem = ConvBNReLU(in_ch, bbox_ch, 1, eps=eps)
        self.cls_convs = nn.Sequential(ConvBNReLU(bbox_ch, bbox_ch, 3, eps=eps))
        self.reg_convs = nn.Sequential(ConvBNReLU(bbox_ch, bbox_ch, 3, eps=eps))
        self.cls_pred = nn.Conv2d(bbox_ch, 1, 1, bias=True)
        self.reg_pred = nn.Conv2d(bbox_ch, 4 * (h.reg_max + 1), 1, bias=True)
        with torch.no_grad():
            self.cls_pred.bias.fill_(-math.log((1 - 0.01) / 0.01))
        t = h
        self.flame_shape_pred = _flame_tower(
            flame_ch, t.flame_shape_inter_channels, t.flame_shape_out_channels,
            t.flame_regression_blocks, eps)
        self.flame_expression_pred = _flame_tower(
            flame_ch, t.flame_expression_inter_channels,
            t.flame_expression_out_channels, t.flame_regression_blocks, eps)
        self.flame_rotation_pred = _flame_tower(
            flame_ch, t.flame_transformation_inter_channels,
            FLAME_CONSTS["rotation"], t.flame_regression_blocks, eps)
        self.flame_jaw_pred = _flame_tower(
            flame_ch, t.flame_transformation_inter_channels,
            FLAME_CONSTS["jaw"], t.flame_regression_blocks, eps)
        self.flame_translation_pred = _flame_tower(
            flame_ch, t.flame_transformation_inter_channels,
            FLAME_CONSTS["translation"], t.flame_regression_blocks, eps)
        self.flame_scale_pred = _flame_tower(
            flame_ch, t.flame_transformation_inter_channels,
            FLAME_CONSTS["scale"], t.flame_regression_blocks, eps)
        self._pads = (FLAME_CONSTS["shape"] - t.flame_shape_out_channels,
                      FLAME_CONSTS["expression"] - t.flame_expression_out_channels)

    def forward(self, x):
        pose_feat = self.pose_stem(x)
        bbox_feat = self.bbox_stem(x)
        cls_out = self.cls_pred(self.cls_convs(bbox_feat))
        reg_out = self.reg_pred(self.reg_convs(bbox_feat))

        shape = torch.tanh(self.flame_shape_pred(pose_feat)) * 3
        expression = torch.tanh(self.flame_expression_pred(pose_feat)) * 3
        rotation = self.flame_rotation_pred(pose_feat)
        jaw = self.flame_jaw_pred(pose_feat)
        translation = self.flame_translation_pred(pose_feat)
        # +-15 clip: same delta as the flax head (models/heads.py:209-219)
        scale = torch.exp(
            torch.clamp(self.flame_scale_pred(pose_feat), -15.0, 15.0)
        ) / 0.05
        pad_s, pad_e = self._pads
        shape = torch.nn.functional.pad(shape, (0, 0, 0, 0, 0, pad_s))
        expression = torch.nn.functional.pad(expression, (0, 0, 0, 0, 0, pad_e))
        flame = torch.cat(
            [shape, expression, rotation, jaw, translation, scale], 1)
        return reg_out, cls_out, flame


class YoloHeadsNDFLHeads(nn.Module):
    def __init__(self, arch: ArchCfg, in_chs: Sequence[int]):
        super().__init__()
        self.arch = arch
        for i, (ch, h) in enumerate(zip(in_chs, arch.heads)):
            self.add_module(f"head{i + 1}", YoloHeadsDFLHead(ch, h,
                                                             eps=arch.bn_eps))
        self.reg_max = arch.reg_max
        self.strides = [h.stride for h in arch.heads]
        self.grid_cell_offset = arch.grid_cell_offset

    def forward(self, feats: List[torch.Tensor]):
        cls_list, reg_list, flame_list = [], [], []
        points_list, stride_list = [], []
        b = feats[0].shape[0]
        for i, feat in enumerate(feats):
            head = getattr(self, f"head{i + 1}")
            reg_out, cls_out, flame_out = head(feat)
            _, _, hh, ww = feat.shape
            # NCHW -> [B, A, C] (channel-last rows, same ordering as the
            # flax NHWC reshape)
            reg_list.append(
                reg_out.permute(0, 2, 3, 1).reshape(b, hh * ww, -1))
            cls_list.append(
                cls_out.permute(0, 2, 3, 1).reshape(b, hh * ww, 1))
            flame_list.append(
                flame_out.permute(0, 2, 3, 1).reshape(b, hh * ww, -1))
            sy = torch.arange(hh, dtype=torch.float32) + self.grid_cell_offset
            sx = torch.arange(ww, dtype=torch.float32) + self.grid_cell_offset
            gy, gx = torch.meshgrid(sy, sx, indexing="ij")
            points_list.append(torch.stack([gx, gy], -1).reshape(-1, 2))
            stride_list.append(
                torch.full((hh * ww, 1), float(self.strides[i])))

        cls_scores = torch.cat(cls_list, 1)
        reg_distri = torch.cat(reg_list, 1)
        flame = torch.cat(flame_list, 1)
        anchor_points = torch.cat(points_list, 0)
        stride_tensor = torch.cat(stride_list, 0)

        a = reg_distri.shape[1]
        dist = reg_distri.reshape(b, a, 4, self.reg_max + 1)
        proj = torch.arange(self.reg_max + 1, dtype=torch.float32)
        expected = torch.einsum(
            "bakm,m->bak", torch.softmax(dist, -1), proj)
        x1y1 = anchor_points[None] - expected[..., :2]
        x2y2 = anchor_points[None] + expected[..., 2:]
        pred_bboxes = torch.cat([x1y1, x2y2], -1) * stride_tensor[None]
        pred_scores = torch.sigmoid(cls_scores)

        # FLAME globalisation (yolo_head_ndfl_heads.py:168-171)
        centers = anchor_points * stride_tensor  # [A, 2] pixels
        translation = flame[..., 409:411] + centers[None]
        scale = flame[..., 412:413] * stride_tensor[None]
        flame = torch.cat(
            [flame[..., :409], translation, flame[..., 411:412], scale], -1)
        return pred_bboxes, pred_scores, flame


class TorchYoloHeads(nn.Module):
    """Full mirror: NCHW float images (0..1) ->
    (boxes_xyxy [B,A,4], scores [B,A,1], flame [B,A,413])."""

    def __init__(self, arch: ArchCfg):
        super().__init__()
        self.backbone = NStageBackbone(arch)
        bb_out = (arch.stages[0].out_channels, arch.stages[1].out_channels,
                  arch.stages[2].out_channels, arch.spp_channels)
        self.neck = YoloNASPANNeckWithC2(arch, bb_out)
        self.heads = YoloHeadsNDFLHeads(arch, self.neck.out_channels)

    def forward(self, images):
        c2, c3, c4, c5 = self.backbone(images)
        p3, p4, p5 = self.neck([c2, c3, c4, c5])
        return self.heads([p3, p4, p5])


def build_torch_mirror(name_or_arch) -> TorchYoloHeads:
    arch = name_or_arch if isinstance(name_or_arch, ArchCfg) else get_arch(
        name_or_arch)
    return TorchYoloHeads(arch)


# --------------------------------------------------------------------- #
# flax -> torch loading (reverse of tools/convert_torch_checkpoint.py)
# --------------------------------------------------------------------- #
def _flax_path_for(torch_key: str, bn_leaves: bool) -> Tuple[List[str], str]:
    """Translate a mirror state-dict key into (flax scope path, flax leaf)."""
    from head_detector_tpu.detector import _load_converter

    _translate_segments = _load_converter()._translate_segments

    scope, leaf = torch_key.rsplit(".", 1)
    parts = _translate_segments(scope.split("."), set())
    new_parts: List[str] = []
    for i, p in enumerate(parts):
        if (p.isdigit() and i > 0 and parts[i - 1].startswith("flame_")
                and parts[i - 1].endswith("_pred")):
            is_final_conv = i == len(parts) - 1 and leaf in ("weight", "bias")
            new_parts.append("pred" if is_final_conv else f"block{p}")
        else:
            new_parts.append(p)
    if bn_leaves:
        flax_leaf = {"weight": "scale", "bias": "bias",
                     "running_mean": "mean", "running_var": "var"}[leaf]
    else:
        flax_leaf = {"weight": "kernel", "bias": "bias", "alpha": "alpha"}[leaf]
    return new_parts, flax_leaf


def load_flax_variables(mirror: TorchYoloHeads, variables: dict) -> None:
    """Copy a flax variable tree ({'params', 'batch_stats'}) into the mirror.

    Inverse of the converter's layout rules: conv kernels [kh,kw,I,O] ->
    [O,I,kh,kw], upsample transpose kernels additionally un-flip, BN
    scale/bias/mean/var -> weight/bias/running stats.  CSP bottleneck alphas
    do not exist in the flax tree (the converter folds them into cv2/post_bn)
    — mirror alphas are set to 1.0, which composes to the same function.
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {}))

    bn_modules = {
        name for name, mod in mirror.named_modules()
        if isinstance(mod, nn.BatchNorm2d)
    }

    def fetch(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    new_state = {}
    for key, cur in mirror.state_dict().items():
        if key.endswith("num_batches_tracked"):
            new_state[key] = torch.zeros_like(cur)
            continue
        scope = key.rsplit(".", 1)[0]
        is_bn = scope in bn_modules
        # CSP bottleneck alpha: folded away in flax — neutral element here
        if key.endswith(".alpha") and "flame" not in key:
            new_state[key] = torch.ones_like(cur)
            continue
        path, leaf = _flax_path_for(key, is_bn)
        tree = stats if leaf in ("mean", "var") else params
        value = np.asarray(fetch(tree, path + [leaf]))
        if leaf == "kernel" and value.ndim == 4:
            if "upsample" in path:
                value = np.transpose(
                    np.ascontiguousarray(value[::-1, ::-1]), (2, 3, 0, 1))
            else:
                value = np.transpose(value, (3, 2, 0, 1))
        elif leaf == "alpha":
            value = value.reshape(())
        new_state[key] = torch.from_numpy(np.ascontiguousarray(value)).to(
            cur.dtype)
    mirror.load_state_dict(new_state)


def export_torchscript(
    model_name: str, variables: dict, path: str,
    image_size: Tuple[int, int] = (640, 640),
) -> "torch.jit.ScriptModule":
    """Trace the flax checkpoint through the torch mirror and save a
    TorchScript module — the ``.trcd`` artifact format of the reference
    (exportable_mesh_model.py:440-442).  Input: [B, 3, H, W] float 0..1."""
    mirror = build_torch_mirror(model_name)
    load_flax_variables(mirror, variables)
    mirror.eval()
    example = torch.rand(1, 3, image_size[0], image_size[1])
    with torch.no_grad():
        traced = torch.jit.trace(mirror, example)
    traced.save(path)
    return traced
