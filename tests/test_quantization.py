"""INT8 PTQ + FP16 (reference exportable_mesh_model.py:141-184 semantics).

Verifies, on the nano deploy graph:
* per-channel symmetric int8 weight quantization error bounds,
* percentile activation calibration via the flax interceptor,
* W8 / W8A8 fake-quant forwards stay close to the f32 deploy forward,
* the selective-quantizer escape hatch (skip regexes),
* the int8 artifact round-trip and its size win,
* FP16 weight conversion.
"""

import numpy as np
import pytest
import flax.linen as nn
import jax
import jax.numpy as jnp

from head_detector_tpu.export import build_deploy
from head_detector_tpu.models import build_model, init_model
from head_detector_tpu.quantization import (
    PTQResult,
    calibrate_activations,
    dequantize_array,
    fake_quant_variables,
    fp16_variables,
    load_quantized,
    ptq,
    quantize_array,
    quantize_weights,
    quantized_apply,
    save_quantized,
)

SIZE = 64


@pytest.fixture(scope="module")
def base():
    model = build_model("yolo_heads_n", dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(3), (SIZE, SIZE), batch=2)
    return model, variables


@pytest.fixture(scope="module")
def deploy(base):
    _, variables = base
    dmodel, dvars = build_deploy("yolo_heads_n", variables)
    return dmodel, dvars


@pytest.fixture(scope="module")
def images():
    # own fixed seed: the shared rng fixture's state depends on test order,
    # and the correlation bounds below are calibrated on this exact batch
    r = np.random.RandomState(11)
    return jnp.asarray(
        r.randint(0, 255, (2, SIZE, SIZE, 3)).astype(np.float32) / 255.0
    )


def test_quantize_array_per_channel_bound(rng):
    # channels with wildly different ranges: per-channel scales keep the
    # error at the per-channel quantization step, not the global one
    w = rng.randn(3, 3, 8, 4).astype(np.float32)
    w[..., 0] *= 100.0
    w[..., 3] *= 0.01
    q, scale = quantize_array(w, axis=-1)
    assert q.dtype == np.int8 and scale.shape == (1, 1, 1, 4)
    dq = dequantize_array(q, scale)
    step = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0
    err = np.max(np.abs(w - dq), axis=(0, 1, 2))
    assert np.all(err <= step / 2 + 1e-7)
    # a global (per-tensor) scale would put channel-3's error near its own
    # amax; per-channel keeps it 1e4x smaller
    assert err[3] < np.max(np.abs(w)) / 127.0 / 100.0


def test_quantize_weights_covers_all_kernels(deploy):
    _, dvars = deploy
    qmap = quantize_weights(dvars)
    assert len(qmap) > 20  # every conv in backbone/neck/heads/towers
    for key, entry in qmap.items():
        assert entry["q"].dtype == np.int8
        assert entry["scale"].ndim == entry["q"].ndim


def test_fake_quant_variables_structure_and_bound(deploy):
    _, dvars = deploy
    fq, qmap = fake_quant_variables(dvars)
    assert jax.tree_util.tree_structure(fq) == jax.tree_util.tree_structure(
        dvars
    )
    # batch_stats and biases untouched
    np.testing.assert_array_equal(
        jax.tree_util.tree_leaves(fq["batch_stats"])[0],
        jax.tree_util.tree_leaves(dvars["batch_stats"])[0],
    )

    def check(orig, new, path=()):
        for k in orig:
            if isinstance(orig[k], dict):
                check(orig[k], new[k], path + (k,))
            elif k == "kernel" and "/".join(path) in qmap:
                w = np.asarray(orig[k], np.float32)
                step = np.max(np.abs(w)) / 127.0
                assert np.max(np.abs(w - np.asarray(new[k]))) <= step / 2 + 1e-7

    check(dvars["params"], fq["params"])


def test_skip_regex_exempts_layers(deploy):
    _, dvars = deploy
    qmap_all = quantize_weights(dvars)
    some_key = sorted(qmap_all)[0]
    qmap = quantize_weights(dvars, skip=[some_key.split("/")[-1] + "$"])
    assert len(qmap) < len(qmap_all)


def test_calibration_records_conv_inputs(deploy, images):
    dmodel, dvars = deploy
    scales = calibrate_activations(
        lambda b: dmodel.apply(dvars, b, train=False),
        [images, images * 0.5],
        percentile=99.99,
        max_batches=16,
    )
    assert len(scales) > 20
    assert all(v >= 0.0 for v in scales.values())
    # the stem conv sees the raw input: amax ~ the image range
    stem_keys = [k for k in scales if "stem" in k.lower()]
    assert stem_keys and scales[stem_keys[0]] > 0.1


class _ToyNet(nn.Module):
    """Four stacked convs, no normalisation — a well-conditioned net where
    int8 error bounds are analyzable (unlike the random-init detector,
    whose saturated logits amplify any weight perturbation chaotically)."""

    @nn.compact
    def __call__(self, x):
        for feat in (8, 16, 16, 4):
            x = nn.Conv(feat, (3, 3), padding="SAME")(x)
            x = nn.silu(x)
        return x


def _corr(a, b):
    return float(np.corrcoef(np.asarray(a).ravel(), np.asarray(b).ravel())[0, 1])


def test_w8_toynet_tight_bound(rng):
    model = _ToyNet()
    x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(variables, x)
    fq, qmap = fake_quant_variables(variables)
    assert len(qmap) == 4
    out = model.apply(fq, x)
    # 4 tame layers: int8 per-channel weight error stays ~per-layer scale
    assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) < 5e-2
    assert _corr(out, ref) > 0.9999


def test_w8_forward_close_to_f32(base, images):
    # The detector's random-init logits reach |65| (sigmoid-saturated),
    # so ~0.2% per-weight int8 noise can flip individual post-sigmoid scores
    # and reorder NMS slots.  The meaningful invariants on this graph are
    # distributional: the DENSE per-anchor outputs stay the same function
    # (high correlation, small median move).  Tight per-element bounds live
    # in test_w8_toynet_tight_bound.
    model, dvars = base
    dec_ref, raw_ref = model.apply(dvars, images, train=False)
    fq, _ = fake_quant_variables(dvars)
    dec, raw = model.apply(fq, images, train=False)
    assert _corr(raw.cls_score_list, raw_ref.cls_score_list) > 0.98
    assert _corr(raw.reg_distri_list, raw_ref.reg_distri_list) > 0.99
    med = np.median(np.abs(np.asarray(dec.scores) - np.asarray(dec_ref.scores)))
    assert med < 1e-2


def test_w8a8_ptq_end_to_end(base, images):
    model, dvars = base
    result = ptq(model, dvars, [images], train=False)
    assert isinstance(result, PTQResult)
    assert result.report["kernels_quantized"] > 20
    assert result.report["activations_calibrated"] > 20
    assert result.report["max_weight_err_rel"] < 0.01

    dec_ref, raw_ref = model.apply(dvars, images, train=False)
    fn = jax.jit(
        quantized_apply(model, result.variables, result.act_scales, train=False)
    )
    dec, raw = fn(images)
    # W8A8 fake-quant through the jitted graph: same function distributionally
    assert _corr(raw.cls_score_list, raw_ref.cls_score_list) > 0.95
    assert _corr(raw.reg_distri_list, raw_ref.reg_distri_list) > 0.97
    med = np.median(np.abs(np.asarray(dec.scores) - np.asarray(dec_ref.scores)))
    assert med < 2e-2


def test_artifact_roundtrip_and_size(deploy, tmp_path):
    _, dvars = deploy
    path = str(tmp_path / "nano_int8")
    sizes = save_quantized(path, dvars)
    assert sizes["quantized_bytes"] < 0.45 * sizes["f32_bytes"]
    restored = load_quantized(path)
    fq, _ = fake_quant_variables(dvars)
    for a, b in zip(
        jax.tree_util.tree_leaves(fq), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


def test_fp16_variables(base, images):
    model, dvars = base
    half = fp16_variables(dvars)
    leaves = jax.tree_util.tree_leaves(half)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    dec_ref, _ = model.apply(dvars, images, train=False)
    dec, _ = model.apply(half, images, train=False)
    # f16 weight rounding (~5e-4 rel): dense per-anchor scores barely move
    d = np.abs(np.asarray(dec.scores) - np.asarray(dec_ref.scores))
    assert float(np.percentile(d, 99)) < 5e-2
    assert float(np.median(d)) < 1e-3
