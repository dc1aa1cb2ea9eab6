"""Dependency-free ONNX export: round-trip, mirror parity, flax parity.

The ``onnx`` package is absent in this environment and torch.onnx hard-
requires it (head_detector_tpu/onnx_export.py module doc), so the exporter
hand-serializes ModelProto bytes and these tests verify them with the
in-repo interpreter: the exported graph must reproduce the torch mirror AND
the flax model it was exported from."""

import numpy as np
import pytest
import torch

from head_detector_tpu.onnx_export import OnnxGraph, export_onnx, run_onnx


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    torch.manual_seed(0)
    from head_detector_tpu.torch_mirror import build_torch_mirror

    mirror = build_torch_mirror("yolo_heads_n")
    mirror.eval()
    path = str(tmp_path_factory.mktemp("onnx") / "n.onnx")
    graph = export_onnx("yolo_heads_n", image_size=(64, 64), mirror=mirror,
                        path=path)
    return mirror, graph, path


def test_serialization_roundtrip(exported):
    mirror, graph, path = exported
    parsed = OnnxGraph.parse(open(path, "rb").read())
    assert len(parsed.nodes) == len(graph.nodes)
    assert [n["op"] for n in parsed.nodes] == [n["op"] for n in graph.nodes]
    assert set(parsed.initializers) == set(graph.initializers)
    for k, v in graph.initializers.items():
        np.testing.assert_array_equal(parsed.initializers[k], v)
    assert parsed.inputs == graph.inputs
    assert parsed.outputs == graph.outputs


def test_opset_is_standard(exported):
    """The emitted ops are all core ONNX opset-13 operators (a real runtime
    could execute this file — none is installable here, documented delta)."""
    _, graph, _ = exported
    allowed = {
        "Conv", "ConvTranspose", "BatchNormalization", "Relu", "MaxPool",
        "Concat", "Clip", "Pad", "Transpose", "Reshape", "Slice", "Softmax",
        "Sigmoid", "Tanh", "Exp", "Add", "Sub", "Mul", "Div", "MatMul",
        "Unsqueeze",
    }
    assert {n["op"] for n in graph.nodes} <= allowed


def test_parity_vs_mirror(exported):
    mirror, _, path = exported
    parsed = OnnxGraph.parse(open(path, "rb").read())
    x = np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = [o.numpy() for o in mirror(torch.from_numpy(x))]
    out = run_onnx(parsed, {"image": x})
    assert len(out) == 3
    for r, o in zip(ref, out):
        assert r.shape == o.shape
        np.testing.assert_allclose(r, o, atol=2e-4)


def test_parity_vs_flax():
    """flax variables -> mirror -> ONNX file -> interpreter == flax model."""
    import jax
    import jax.numpy as jnp

    from head_detector_tpu.models import build_model, init_model
    from head_detector_tpu.torch_mirror import build_torch_mirror, load_flax_variables

    model = build_model("yolo_heads_n")
    variables = init_model(model, jax.random.PRNGKey(2), (64, 64))
    mirror = build_torch_mirror("yolo_heads_n")
    load_flax_variables(mirror, variables)
    mirror.eval()
    graph = export_onnx("yolo_heads_n", image_size=(64, 64), mirror=mirror)

    x = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    decoded, _ = model.apply(variables, jnp.asarray(x), train=False)
    out = run_onnx(graph, {"image": x.transpose(0, 3, 1, 2)})

    # pixel-unit outputs: f32 accumulation order across ~200 convs differs
    # between XLA and torch — bound at 0.05 px absolute / 1e-3 relative
    np.testing.assert_allclose(
        np.asarray(decoded.boxes_xyxy), out[0], atol=5e-2, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(decoded.scores), out[1], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(decoded.flame_params), out[2], atol=5e-2, rtol=1e-3)


def test_int8_qdq_leg(exported):
    """quantize='int8' (reference exportable_mesh_model.py:175-184): Conv
    weights become per-channel int8 + DequantizeLinear.  The QDQ graph must
    (a) round-trip through serialization with int8 tensors intact, (b) run
    in the interpreter, (c) match the f32 graph within int8 weight error,
    and (d) match EXACTLY the f32 graph run with pre-dequantized weights
    (DequantizeLinear semantics check)."""
    mirror, graph, _ = exported
    from head_detector_tpu.onnx_export import export_onnx as _export

    g8 = _export("yolo_heads_n", image_size=(64, 64), mirror=mirror,
                 quantize="int8")
    dq_nodes = [n for n in g8.nodes if n["op"] == "DequantizeLinear"]
    convs = [n for n in graph.nodes if n["op"] == "Conv"]
    assert len(dq_nodes) == len(convs)

    data = g8.serialize()
    parsed = OnnxGraph.parse(data)
    qs = [k for k in parsed.initializers if k.endswith("_q8")]
    assert qs and all(parsed.initializers[k].dtype == np.int8 for k in qs)

    x = np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32)
    ref = run_onnx(graph, {"image": x})
    out = run_onnx(parsed, {"image": x})

    # (d) exact DQL semantics: fold each DQL by hand, compare bit-identical
    import copy
    folded = copy.deepcopy(parsed)
    for n in list(folded.nodes):
        if n["op"] != "DequantizeLinear":
            continue
        q = folded.initializers[n["inputs"][0]].astype(np.float32)
        scale = folded.initializers[n["inputs"][1]]
        shape = [1] * q.ndim
        shape[n["attrs"]["axis"]] = scale.shape[0]
        folded.initializers[n["outputs"][0]] = q * scale.reshape(shape)
        folded.nodes.remove(n)
    out_folded = run_onnx(folded, {"image": x})
    for a, b in zip(out, out_folded):
        np.testing.assert_array_equal(a, b)

    # (c) bounded drift vs f32 weights
    np.testing.assert_allclose(ref[1], out[1], atol=5e-2)  # scores
    box_scale = max(float(np.max(np.abs(ref[0]))), 1.0)
    assert np.max(np.abs(ref[0] - out[0])) / box_scale < 5e-2


def test_fp16_leg(exported):
    """quantize='fp16': weights stored half precision + Cast back — the
    reference's QuantizationMode.FP16 ('weights converted to half')."""
    mirror, graph, _ = exported
    from head_detector_tpu.onnx_export import export_onnx as _export

    g16 = _export("yolo_heads_n", image_size=(64, 64), mirror=mirror,
                  quantize="fp16")
    parsed = OnnxGraph.parse(g16.serialize())
    halves = [k for k in parsed.initializers if k.endswith("_f16")]
    assert halves
    assert all(parsed.initializers[k].dtype == np.float16 for k in halves)
    casts = [n for n in parsed.nodes if n["op"] == "Cast"]
    assert len(casts) == len(halves)

    x = np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32)
    ref = run_onnx(graph, {"image": x})
    out = run_onnx(parsed, {"image": x})
    np.testing.assert_allclose(ref[1], out[1], atol=1e-2)


def test_pre_nms_topk_leg(exported):
    """pre_nms_top_k: the reference's export decoding module
    (yolo_heads.py:47-86) — top-k anchors by score, boxes/scores/flame
    gathered at those indices, emitted as the graph outputs."""
    mirror, graph, _ = exported
    from head_detector_tpu.onnx_export import export_onnx as _export

    k = 20
    g = _export("yolo_heads_n", image_size=(64, 64), mirror=mirror,
                pre_nms_top_k=k)
    parsed = OnnxGraph.parse(g.serialize())
    assert [n for n, _ in parsed.outputs] == [
        "pre_nms_boxes", "pre_nms_scores", "pre_nms_flame"]

    x = np.random.RandomState(1).rand(1, 3, 64, 64).astype(np.float32)
    dense = run_onnx(graph, {"image": x})
    out = run_onnx(parsed, {"image": x})

    scores = dense[1].reshape(dense[1].shape[0], -1)  # [B, A]
    for b in range(scores.shape[0]):
        order = np.argsort(-scores[b], kind="stable")[:k]
        np.testing.assert_array_equal(out[0][b], dense[0][b][order])
        np.testing.assert_allclose(
            np.asarray(out[1][b]).reshape(-1), scores[b][order])
        np.testing.assert_array_equal(out[2][b], dense[2][b][order])
    # sorted descending
    assert (np.diff(np.asarray(out[1]).reshape(-1)) <= 0).all()


def test_attribute_negative_ints_roundtrip():
    from head_detector_tpu.onnx_export import _attribute, _parse_attribute

    name, vals = _parse_attribute(_attribute("perm", [0, 2, -1, -2]))
    assert name == "perm" and vals == [0, 2, -1, -2]
    name, val = _parse_attribute(_attribute("axis", -3))
    assert name == "axis" and val == -3


def test_quantize_graph_rejects_unknown_mode():
    import pytest

    from head_detector_tpu.onnx_export import OnnxGraph, quantize_graph

    g = OnnxGraph()
    with pytest.raises(ValueError, match="unknown quantize mode"):
        quantize_graph(g, mode="int4")
