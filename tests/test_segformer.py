"""SegFormer (MiT) variant: shapes + decode contract (tiny config, CPU-fast)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from head_detector_tpu.head_info import NUM_FLAME_PARAMS
from head_detector_tpu.models.segformer import MiTCfg, SegFormerYoloHeads
from test_model import TINY

TINY_MIT = MiTCfg(
    embed_dims=(8, 16, 24, 32),
    depths=(1, 1, 1, 1),
    sr_ratios=(8, 4, 2, 1),
    num_heads=(1, 2, 3, 4),
)


@pytest.fixture(scope="module")
def seg_model():
    model = SegFormerYoloHeads(mit=TINY_MIT, arch=TINY)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda r, xx: model.init(r, xx, train=False))(
        jax.random.PRNGKey(0), x
    )
    return model, variables


def test_segformer_forward_shapes(seg_model):
    model, variables = seg_model
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    decoded, raw = model.apply(variables, x, train=False)
    a = 8 * 8 + 4 * 4 + 2 * 2  # strides 8/16/32 (stage-4 of MiT is stride 32)
    assert decoded.boxes_xyxy.shape == (2, a, 4)
    assert decoded.scores.shape == (2, a, 1)
    assert decoded.flame_params.shape == (2, a, NUM_FLAME_PARAMS)
    assert np.isfinite(np.asarray(decoded.boxes_xyxy)).all()


def test_segformer_spatial_reduction_shapes(seg_model):
    # stage 1 at stride 4 on 64px input -> 16x16 tokens, sr 8 -> 2x2 kv:
    # just assert the forward is consistent across input sizes (static shapes)
    model, variables = seg_model
    x = jnp.zeros((1, 96, 64, 3), jnp.float32)
    decoded, _ = model.apply(variables, x, train=False)
    a = 12 * 8 + 6 * 4 + 3 * 2
    assert decoded.boxes_xyxy.shape == (1, a, 4)


def test_build_model_routes_segformer_and_calibrates():
    """`architecture: segformer` (configs/segformer.yaml) resolves through
    build_model to SegFormerYoloHeads, and init_model's BN calibration works
    on the variant (model.clone twin with bn_momentum=1.0)."""
    from head_detector_tpu.models import build_model, init_model

    model = build_model("SegFormerYoloHeads")
    assert isinstance(model, SegFormerYoloHeads)
    tiny = model.clone(mit=TINY_MIT, arch=TINY)
    variables = init_model(tiny, jax.random.PRNGKey(0), (64, 64), batch=1)
    assert "batch_stats" in variables
    decoded, _ = tiny.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert bool(jnp.isfinite(decoded.scores).all())


def test_segformer_train_step_learns(seg_model):
    """The SegFormer variant runs through the same train step as YoloHeads
    (loss decreases on a single batch) — row §2.2/17 gradient evidence."""
    from head_detector_tpu.flame import FlameModel
    from head_detector_tpu.train import (
        LossConfig,
        TrainConfig,
        create_train_state,
        make_train_step,
    )
    from head_detector_tpu.train.dataset import (
        SyntheticHeadsDataset,
        collate_samples,
    )

    model, variables = seg_model
    flame = FlameModel.from_assets()
    tcfg = TrainConfig(max_steps=20, lr_warmup_steps=2, initial_lr=3e-3,
                       ema=False)
    lcfg = LossConfig(max_positives=16)
    state = create_train_state(model, variables, tcfg)
    step = jax.jit(make_train_step(model, flame, lcfg, tcfg))

    ds = SyntheticHeadsDataset(flame, image_size=64, length=2, max_heads=1)
    images, targets = collate_samples([ds[0], ds[1]], max_boxes=2)
    imgs = jnp.asarray(images, jnp.float32) / 255.0

    losses = []
    for _ in range(10):
        state, comps = step(state, imgs, targets)
        losses.append(float(comps["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
