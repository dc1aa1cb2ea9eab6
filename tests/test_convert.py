"""torch->flax checkpoint converter: layout rules proven numerically.

Each test builds a small *torch* module with the SuperGradients structure
(state-dict key names included), runs the converter on its state dict, loads
the result into the corresponding flax module, and compares eval-mode
outputs on the same input.  This validates the transposes, the BN split, the
QARepVGG naming map, and the bottleneck-alpha fold against live torch — not
against our own inverse mapping.

Full-checkpoint numeric parity against real reference weights is gated on
``HDT_TORCH_CKPT`` (no weights are downloadable in this environment).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import jax
import jax.numpy as jnp
from flax import linen as nn

from convert_torch_checkpoint import (
    convert,
    convert_state_dict,
    normalize_state_dict,
)
from head_detector_tpu.models.blocks import BlockCfg, QARepVGGBlock, YoloNASBottleneck

CFG = BlockCfg(bn_eps=1e-5, bn_momentum=0.03)


def _nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def _nhwc(x_nchw):
    return jnp.asarray(np.transpose(np.asarray(x_nchw), (0, 2, 3, 1)))


def _randomize_bn(bn, rng):
    bn.weight.data = torch.tensor(rng.rand(bn.num_features).astype(np.float32) + 0.5)
    bn.bias.data = torch.tensor(rng.randn(bn.num_features).astype(np.float32))
    bn.running_mean.data = torch.tensor(rng.randn(bn.num_features).astype(np.float32))
    bn.running_var.data = torch.tensor(rng.rand(bn.num_features).astype(np.float32) + 0.5)


class TorchConvBNReLU(torch.nn.Module):
    """SG ConvBNReLU twin: Sequential named 'seq' holding conv/bn/act."""

    def __init__(self, cin, cout, k, rng):
        super().__init__()
        self.seq = torch.nn.Sequential()
        self.seq.add_module(
            "conv", torch.nn.Conv2d(cin, cout, k, padding=k // 2, bias=False)
        )
        self.seq.add_module("bn", torch.nn.BatchNorm2d(cout, eps=CFG.bn_eps))
        self.seq.add_module("act", torch.nn.ReLU())
        _randomize_bn(self.seq.bn, rng)

    def forward(self, x):
        return self.seq(x)


class TorchQARepVGG(torch.nn.Module):
    """SG QARepVGGBlock twin: branch_3x3(conv+bn) + branch_1x1(conv w/ bias)
    [*alpha] [+ identity] -> post_bn -> relu."""

    def __init__(self, cin, cout, rng, use_alpha=False, residual=True):
        super().__init__()
        self.branch_3x3 = torch.nn.Sequential()
        self.branch_3x3.add_module(
            "conv", torch.nn.Conv2d(cin, cout, 3, padding=1, bias=False)
        )
        self.branch_3x3.add_module("bn", torch.nn.BatchNorm2d(cout, eps=CFG.bn_eps))
        self.branch_1x1 = torch.nn.Conv2d(cin, cout, 1, bias=True)
        self.post_bn = torch.nn.BatchNorm2d(cout, eps=CFG.bn_eps)
        self.use_alpha = use_alpha
        self.residual = residual and cin == cout
        if use_alpha:
            self.alpha = torch.nn.Parameter(
                torch.tensor(rng.rand() + 0.5, dtype=torch.float32)
            )
        _randomize_bn(self.branch_3x3.bn, rng)
        _randomize_bn(self.post_bn, rng)

    def forward(self, x):
        y = self.branch_3x3(x) + (
            self.alpha * self.branch_1x1(x) if self.use_alpha else self.branch_1x1(x)
        )
        if self.residual:
            y = y + x
        return torch.relu(self.post_bn(y))


def _convert_prefixed(module, prefix):
    """state dict of `module` keyed under a backbone.* path -> flax variables."""
    sd = {f"{prefix}.{k}": v for k, v in module.state_dict().items()}
    params, stats, _ = convert_state_dict(normalize_state_dict(sd))
    return params, stats


def _dig(tree, path):
    for p in path.split("."):
        tree = tree[p]
    return tree


def test_convtranspose_weight_mapping_exact():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 5, 5).astype(np.float32)
    t = torch.nn.ConvTranspose2d(4, 6, 2, stride=2)
    ref = t(torch.tensor(x)).detach().numpy()

    sd = {f"neck.neck1.upsample.{k}": v for k, v in t.state_dict().items()}
    params, _, _ = convert_state_dict(normalize_state_dict(sd))
    leaf = _dig(params, "neck.neck1.upsample")

    m = nn.ConvTranspose(6, (2, 2), strides=(2, 2), padding="VALID")
    out = m.apply({"params": {"kernel": jnp.asarray(leaf["kernel"]),
                              "bias": jnp.asarray(leaf["bias"])}}, _nhwc(x))
    np.testing.assert_allclose(_nchw(out), ref, atol=1e-5)


def test_convbnrelu_parity():
    rng = np.random.RandomState(1)
    t = TorchConvBNReLU(3, 8, 3, rng).eval()
    x = rng.randn(2, 3, 9, 9).astype(np.float32)
    ref = t(torch.tensor(x)).detach().numpy()

    params, stats = _convert_prefixed(t, "backbone.stage1.blocks.conv1")
    scope = "backbone.stage1.blocks.conv1"
    variables = {"params": _dig(params, scope), "batch_stats": _dig(stats, scope)}

    from head_detector_tpu.models.blocks import ConvBNAct

    m = ConvBNAct(8, kernel_size=3, cfg=CFG)
    out = m.apply(variables, _nhwc(x), train=False)
    np.testing.assert_allclose(_nchw(out), ref, atol=1e-4)


@pytest.mark.parametrize("use_alpha,residual", [(False, True), (True, False)])
def test_qarepvgg_block_parity(use_alpha, residual):
    rng = np.random.RandomState(2)
    t = TorchQARepVGG(8, 8, rng, use_alpha=use_alpha, residual=residual).eval()
    x = rng.randn(2, 8, 7, 7).astype(np.float32)
    ref = t(torch.tensor(x)).detach().numpy()

    params, stats = _convert_prefixed(t, "backbone.stem.conv")
    variables = {
        "params": _dig(params, "backbone.stem.conv"),
        "batch_stats": _dig(stats, "backbone.stem.conv"),
    }
    m = QARepVGGBlock(
        8, use_residual_connection=residual, use_alpha=use_alpha, cfg=CFG
    )
    out = m.apply(variables, _nhwc(x), train=False)
    np.testing.assert_allclose(_nchw(out), ref, atol=1e-4)


def test_bottleneck_alpha_fold_parity():
    """SG YoloNASBottleneck: x + alpha*cv2(cv1(x)).  Our flax bottleneck has
    an unweighted residual; the converter folds alpha into cv2's post_bn."""
    rng = np.random.RandomState(3)

    class TorchBottleneck(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.cv1 = TorchQARepVGG(8, 8, rng, residual=True)
            self.cv2 = TorchQARepVGG(8, 8, rng, residual=True)
            self.alpha = torch.nn.Parameter(torch.tensor(0.7))

        def forward(self, x):
            return x + self.alpha * self.cv2(self.cv1(x))

    t = TorchBottleneck().eval()
    x = rng.randn(2, 8, 6, 6).astype(np.float32)
    ref = t(torch.tensor(x)).detach().numpy()

    sd = {f"backbone.stage1.blocks.bottlenecks.0.{k}": v for k, v in t.state_dict().items()}
    params, stats, notes = convert_state_dict(normalize_state_dict(sd))
    assert any("folded" in n for n in notes), notes
    scope = "backbone.stage1.blocks.bottleneck0"
    variables = {"params": _dig(params, scope), "batch_stats": _dig(stats, scope)}

    m = YoloNASBottleneck(8, shortcut=True, cfg=CFG)
    out = m.apply(variables, _nhwc(x), train=False)
    np.testing.assert_allclose(_nchw(out), ref, atol=1e-4)


def test_head_tower_and_pred_key_mapping():
    """flame tower numeric children map to blockN / pred; cls_convs.0 to
    cls_conv; linear-style 1x1 conv weights transpose to flax kernels."""
    rng = np.random.RandomState(4)
    block = TorchQARepVGG(8, 16, rng, use_alpha=True, residual=False)
    final = torch.nn.Conv2d(16, 3, 1, bias=True)
    sd = {}
    sd.update({f"heads.head1.flame_jaw_pred.0.{k}": v for k, v in block.state_dict().items()})
    sd.update({f"heads.head1.flame_jaw_pred.1.{k}": v for k, v in final.state_dict().items()})
    cls_tower = TorchConvBNReLU(16, 16, 3, rng)
    sd.update({f"heads.head1.cls_convs.0.{k}": v for k, v in cls_tower.state_dict().items()})

    params, stats, _ = convert_state_dict(normalize_state_dict(sd))
    tower = _dig(params, "heads.head1.flame_jaw_pred")
    assert set(tower) == {"block0", "pred"}
    assert tower["pred"]["kernel"].shape == (1, 1, 16, 3)
    assert tower["block0"]["branch_3x3_conv"]["kernel"].shape == (3, 3, 8, 16)
    assert np.asarray(tower["block0"]["alpha"]).shape == ()
    assert "cls_conv" in _dig(params, "heads.head1")
    assert _dig(stats, "heads.head1.cls_conv.bn")["mean"].shape == (16,)


def test_sg_checkpoint_wrapper_unwrapping():
    """SG ckpt payloads ({'net': sd, 'ema_net': sd}) unwrap; prefixes like
    'module.' / '1.model.' are cut at the backbone/neck/heads root."""
    rng = np.random.RandomState(5)
    conv = torch.nn.Conv2d(3, 4, 3, padding=1, bias=False)
    w = conv.state_dict()["weight"]
    raw = {
        "net": {"module.model.backbone.stem.conv.branch_1x1.weight": w,
                "module.model.backbone.stem.conv.branch_1x1.bias": torch.zeros(4)},
        "ema_net": {"module.model.backbone.stem.conv.branch_1x1.weight": w * 2,
                    "module.model.backbone.stem.conv.branch_1x1.bias": torch.zeros(4)},
    }
    variables, _ = convert(raw)
    k = _dig(variables["params"], "backbone.stem.conv.branch_1x1")["kernel"]
    assert k.shape == (3, 3, 3, 4)
    np.testing.assert_allclose(k, np.transpose(w.numpy(), (2, 3, 1, 0)))

    ema, _ = convert(raw, prefer_ema=True)
    k2 = _dig(ema["params"], "backbone.stem.conv.branch_1x1")["kernel"]
    np.testing.assert_allclose(k2, 2 * np.asarray(k))


def test_full_checkpoint_numeric_parity_if_available():
    ckpt = os.environ.get("HDT_TORCH_CKPT")
    if not ckpt:
        pytest.skip("set HDT_TORCH_CKPT=/path/to/reference.pth to run")
    arch = os.environ.get("HDT_TORCH_ARCH", "yolo_heads_l")
    raw = torch.load(ckpt, map_location="cpu", weights_only=False)
    variables, notes = convert(raw, prefer_ema=True)

    from head_detector_tpu.models import build_model
    from head_detector_tpu.train.checkpoint import restore_key_matching

    model = build_model(arch)
    target = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)), train=False)
    )
    merged, matched, total = restore_key_matching(target, variables)
    assert matched / total > 0.99, f"only {matched}/{total} leaves matched: {notes[:20]}"
