"""Dependency-free ONNX export of the detection graph.

The reference's richest export path is ONNX (``yolo_head_training/yolo_head/
exportable_mesh_model.py:29-504``: onnx + onnxsim + TensorRT/INT8 legs).  In
this environment the ``onnx`` python package is absent and cannot be
installed, and ``torch.onnx.export`` hard-requires it even for the legacy
exporter (measured: ``OnnxExporterError: Module onnx is not installed!``).
ONNX is, however, just a protobuf — so this module implements the export
end-to-end without the package:

1. **Graph capture**: ``torch.jit.trace`` + ``freeze`` of the live-torch
   mirror (``torch_mirror.py`` — SG-naming twin of the flax model, parity
   tested), then a partial evaluator folds every shape-dependent subgraph
   (arange/meshgrid/full/stack anchor generation) into constants — the same
   fixed-shape pre-baking the reference does via ``heads.cache_anchors``
   before export (``yolo_heads.py:136-144``).
2. **Translation**: remaining aten ops map 1:1 onto ONNX opset-13 ops
   (Conv, BatchNormalization, Relu, MaxPool, Concat, Clip, Pad, Transpose,
   Reshape, Slice, Softmax, Sigmoid, Tanh, Exp, Add/Sub/Mul/Div, MatMul,
   Unsqueeze); the single ``einsum('bakm,m->bak')`` (DFL expectation)
   becomes MatMul.
3. **Serialization**: a hand-rolled protobuf writer emits a standard
   ``ModelProto`` (ir_version 7, opset 13) byte stream; a matching minimal
   reader re-parses it for round-trip tests.
4. **Verification**: with no onnxruntime available, :func:`run_onnx`
   executes the exported graph with a numpy/torch-functional interpreter —
   output parity vs the mirror AND the flax model is asserted in
   ``tests/test_onnx_export.py``.
5. **Quantized legs** (``quantize='int8'|'fp16'``, :func:`quantize_graph`):
   the reference's export ``quantization_mode`` (INT8 PTQ / FP16,
   ``exportable_mesh_model.py:175-184``) as portable weight-QDQ ONNX
   (per-channel int8 initializers + DequantizeLinear) or f16 initializers +
   Cast — calibration/fake-quant accuracy lives in
   ``head_detector_tpu/quantization.py``.  (TensorRT engines are a
   GPU-vendor runtime with no TPU counterpart — out of scope, PARITY.md.)
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

# --------------------------------------------------------------------------- #
# Minimal protobuf wire-format writer / reader
# --------------------------------------------------------------------------- #


def _varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _int_field(field: int, value: int) -> bytes:
    return _key(field, 0) + _varint(value)


def _str_field(field: int, value: str) -> bytes:
    return _len_delim(field, value.encode())


class _Reader:
    """Just enough protobuf parsing to round-trip our own ModelProto."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def eof(self) -> bool:
        return self.pos >= len(self.data)

    def varint(self) -> int:
        shift = n = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                return n
            shift += 7

    def field(self) -> Tuple[int, int, Any]:
        k = self.varint()
        field, wire = k >> 3, k & 7
        if wire == 0:
            return field, wire, self.varint()
        if wire == 2:
            ln = self.varint()
            payload = self.data[self.pos : self.pos + ln]
            self.pos += ln
            return field, wire, payload
        if wire == 5:
            v = struct.unpack("<f", self.data[self.pos : self.pos + 4])[0]
            self.pos += 4
            return field, wire, v
        raise ValueError(f"unsupported wire type {wire}")


# ONNX TensorProto data types
_DT_FLOAT, _DT_INT64, _DT_INT32, _DT_BOOL = 1, 7, 6, 9
_DT_INT8, _DT_FLOAT16 = 3, 10
_NP_TO_DT = {
    np.dtype(np.float32): _DT_FLOAT,
    np.dtype(np.int64): _DT_INT64,
    np.dtype(np.int32): _DT_INT32,
    np.dtype(np.bool_): _DT_BOOL,
    np.dtype(np.int8): _DT_INT8,
    np.dtype(np.float16): _DT_FLOAT16,
}
_DT_TO_NP = {v: k for k, v in _NP_TO_DT.items()}


def _tensor_proto(name: str, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    out = b"".join(_int_field(1, int(d)) for d in arr.shape)
    out += _int_field(2, _NP_TO_DT[arr.dtype])
    out += _str_field(8, name)
    out += _len_delim(9, arr.tobytes())
    return out


def _parse_tensor(payload: bytes) -> Tuple[str, np.ndarray]:
    r = _Reader(payload)
    dims: List[int] = []
    dtype = _DT_FLOAT
    name = ""
    raw = b""
    while not r.eof():
        field, wire, val = r.field()
        if field == 1:
            dims.append(val)
        elif field == 2:
            dtype = val
        elif field == 8:
            name = val.decode()
        elif field == 9:
            raw = val
    arr = np.frombuffer(raw, dtype=_DT_TO_NP[dtype]).reshape(dims)
    return name, arr


_ATTR_FLOAT, _ATTR_INT, _ATTR_STRING, _ATTR_INTS = 1, 2, 3, 7


def _attribute(name: str, value) -> bytes:
    out = _str_field(1, name)
    if isinstance(value, str):
        out += _len_delim(4, value.encode()) + _int_field(20, _ATTR_STRING)
    elif isinstance(value, float):
        out += _key(2, 5) + struct.pack("<f", value) + _int_field(20, _ATTR_FLOAT)
    elif isinstance(value, (list, tuple)):
        out += b"".join(_int_field(8, int(v)) for v in value)
        out += _int_field(20, _ATTR_INTS)
    elif isinstance(value, (int, np.integer)):
        out += _int_field(3, int(value)) + _int_field(20, _ATTR_INT)
    else:
        raise TypeError(f"attribute {name}: {type(value)}")
    return out


def _parse_attribute(payload: bytes):
    r = _Reader(payload)
    name, atype = "", None
    ints: List[int] = []
    sval = fval = ival = None
    while not r.eof():
        field, wire, val = r.field()
        if field == 1:
            name = val.decode()
        elif field == 2:
            fval = val
        elif field == 3:
            ival = val
        elif field == 4:
            sval = val.decode()
        elif field == 8:
            ints.append(val)
        elif field == 20:
            atype = val
    if atype == _ATTR_INTS:
        # same unsigned-varint sign correction as the single-INT case
        return name, [v - (1 << 64) if v >= (1 << 63) else v for v in ints]
    if atype == _ATTR_INT:
        # varints are unsigned on the wire; ONNX ints are int64
        return name, ival - (1 << 64) if ival >= (1 << 63) else ival
    if atype == _ATTR_FLOAT:
        return name, fval
    if atype == _ATTR_STRING:
        return name, sval
    return name, ints or ival or fval or sval


def _node_proto(node: Dict) -> bytes:
    out = b"".join(_str_field(1, i) for i in node["inputs"])
    out += b"".join(_str_field(2, o) for o in node["outputs"])
    out += _str_field(4, node["op"])
    for k, v in node.get("attrs", {}).items():
        out += _len_delim(5, _attribute(k, v))
    return out


def _parse_node(payload: bytes) -> Dict:
    r = _Reader(payload)
    node = {"inputs": [], "outputs": [], "op": "", "attrs": {}}
    while not r.eof():
        field, wire, val = r.field()
        if field == 1:
            node["inputs"].append(val.decode())
        elif field == 2:
            node["outputs"].append(val.decode())
        elif field == 4:
            node["op"] = val.decode()
        elif field == 5:
            k, v = _parse_attribute(val)
            node["attrs"][k] = v
    return node


def _value_info(name: str, shape: Sequence[int]) -> bytes:
    dims = b"".join(_len_delim(1, _int_field(1, int(d))) for d in shape)
    tshape = _len_delim(2, dims)
    ttype = _len_delim(1, _int_field(1, _DT_FLOAT) + tshape)
    return _str_field(1, name) + _len_delim(2, ttype)


def _parse_value_info(payload: bytes) -> Tuple[str, List[int]]:
    r = _Reader(payload)
    name, shape = "", []
    while not r.eof():
        field, wire, val = r.field()
        if field == 1:
            name = val.decode()
        elif field == 2:
            rt = _Reader(val)
            while not rt.eof():
                f2, w2, v2 = rt.field()
                if f2 == 1:  # tensor_type
                    rtt = _Reader(v2)
                    while not rtt.eof():
                        f3, w3, v3 = rtt.field()
                        if f3 == 2:  # shape
                            rs = _Reader(v3)
                            while not rs.eof():
                                f4, w4, v4 = rs.field()
                                if f4 == 1:
                                    rd = _Reader(v4)
                                    while not rd.eof():
                                        f5, w5, v5 = rd.field()
                                        if f5 == 1:
                                            shape.append(v5)
    return name, shape


class OnnxGraph:
    """In-memory representation: nodes + initializers + graph IO."""

    def __init__(self):
        self.nodes: List[Dict] = []
        self.initializers: Dict[str, np.ndarray] = {}
        self.inputs: List[Tuple[str, List[int]]] = []
        self.outputs: List[Tuple[str, List[int]]] = []
        self.name = "head_detector_tpu"

    def serialize(self) -> bytes:
        g = b"".join(_len_delim(1, _node_proto(n)) for n in self.nodes)
        g += _str_field(2, self.name)
        g += b"".join(
            _len_delim(5, _tensor_proto(k, v)) for k, v in self.initializers.items()
        )
        g += b"".join(_len_delim(11, _value_info(n, s)) for n, s in self.inputs)
        g += b"".join(_len_delim(12, _value_info(n, s)) for n, s in self.outputs)

        model = _int_field(1, 7)  # ir_version 7
        model += _str_field(2, "head_detector_tpu")
        model += _str_field(3, "0.3")
        model += _len_delim(8, _str_field(1, "") + _int_field(2, 13))  # opset 13
        model += _len_delim(7, g)
        return model

    @classmethod
    def parse(cls, data: bytes) -> "OnnxGraph":
        out = cls()
        r = _Reader(data)
        graph_payload = None
        while not r.eof():
            field, wire, val = r.field()
            if field == 7:
                graph_payload = val
        if graph_payload is None:
            raise ValueError("no GraphProto in model")
        rg = _Reader(graph_payload)
        while not rg.eof():
            field, wire, val = rg.field()
            if field == 1:
                out.nodes.append(_parse_node(val))
            elif field == 2:
                out.name = val.decode()
            elif field == 5:
                k, v = _parse_tensor(val)
                out.initializers[k] = v
            elif field == 11:
                out.inputs.append(_parse_value_info(val))
            elif field == 12:
                out.outputs.append(_parse_value_info(val))
        return out


# --------------------------------------------------------------------------- #
# torch JIT graph -> OnnxGraph translation
# --------------------------------------------------------------------------- #


def _const_value(node) -> Any:
    """Value of a prim::Constant node (tensor / scalar / list / str / None)."""
    import torch

    ty = node.output().type().kind()
    if ty == "NoneType":
        return None
    attr_names = node.attributeNames()
    if not attr_names:
        return None
    kind = node.kindOf("value")
    return getattr(node, kind)("value")


def quantize_graph(graph: "OnnxGraph", mode: str = "int8") -> int:
    """Post-pass: convert Conv weight initializers to the requested
    quantized storage — the reference's export ``quantization_mode``
    (``exportable_mesh_model.py:175-184``) re-done as standard portable
    ONNX instead of a TensorRT engine:

    * ``int8``: per-output-channel symmetric int8 initializer +
      ``DequantizeLinear`` (weight-QDQ form; axis 0 = OIHW out channels).
    * ``fp16``: float16 initializer + ``Cast`` back to float.

    Inserted nodes are prepended (their inputs are initializers only, so
    topological order is preserved).  Returns the number of weights
    converted.  ConvTranspose weights are left in f32: their ONNX layout
    puts output channels on axis 1 of a grouped tensor — the reference's
    selective quantizer exempts odd layouts the same way."""
    from head_detector_tpu.quantization import quantize_array

    if mode not in ("int8", "fp16"):
        raise ValueError(f"unknown quantize mode {mode!r}")
    new_nodes: List[Dict] = []
    count = 0
    for node in graph.nodes:
        if node["op"] != "Conv":
            continue
        wname = node["inputs"][1]
        w = graph.initializers.get(wname)
        if w is None or w.dtype != np.float32:
            continue
        count += 1
        if mode == "fp16":
            graph.initializers[wname + "_f16"] = w.astype(np.float16)
            del graph.initializers[wname]
            new_nodes.append({
                "op": "Cast", "inputs": [wname + "_f16"],
                "outputs": [wname], "attrs": {"to": _DT_FLOAT},
            })
        elif mode == "int8":
            q, scale = quantize_array(w, axis=0)
            graph.initializers[wname + "_q8"] = q
            graph.initializers[wname + "_scale"] = (
                scale.reshape(-1).astype(np.float32)
            )
            del graph.initializers[wname]
            new_nodes.append({
                "op": "DequantizeLinear",
                "inputs": [wname + "_q8", wname + "_scale"],
                "outputs": [wname], "attrs": {"axis": 0},
            })
        else:
            raise ValueError(f"unknown quantize mode {mode!r}")
    graph.nodes[:0] = new_nodes
    return count


def attach_pre_nms_topk(graph: "OnnxGraph", k: int) -> None:
    """Append the reference's export decoding module to the graph.

    Functional spec ``yolo_head_training/yolo_head/yolo_heads.py:47-86``
    (``VGGHeadDecodingModule``): select the top-``k`` anchors per image by
    score and gather boxes/scores/flame at those indices, so the artifact
    emits pre-NMS candidate sets ``[B, k, *]`` — the reference's actual
    exported ONNX surface.  (Its ``attach_onnx_pose_nms`` stitching is dead
    code: ``attach_nms_postprocessing`` is False on every branch of
    ``exportable_mesh_model.py:342-390``; ``postprocessing=True`` exports
    the top-k decoding module only.)

    Appends ``TopK`` + ``GatherND(batch_dims=1)`` nodes and REPLACES the
    graph outputs with ``pre_nms_boxes/pre_nms_scores/pre_nms_flame``.
    """
    (bname, bshape), (sname, sshape), (fname, fshape) = graph.outputs
    num_anchors = int(sshape[1])
    k = int(min(k, num_anchors))
    graph.initializers["pre_nms_k"] = np.asarray([k], np.int64)

    score_2d = sname
    if len(sshape) == 3:  # [B, A, 1] -> [B, A] for TopK over anchors
        graph.initializers["pre_nms_shape2d"] = np.asarray(
            [int(sshape[0]), num_anchors], np.int64
        )
        graph.nodes.append({
            "op": "Reshape", "inputs": [sname, "pre_nms_shape2d"],
            "outputs": ["pre_nms_scores2d"], "attrs": {},
        })
        score_2d = "pre_nms_scores2d"
    graph.nodes.append({
        "op": "TopK", "inputs": [score_2d, "pre_nms_k"],
        "outputs": ["pre_nms_scores_topk", "pre_nms_idx"],
        "attrs": {"axis": 1, "largest": 1, "sorted": 1},
    })
    graph.initializers["pre_nms_unsq_axes"] = np.asarray([2], np.int64)
    graph.nodes.append({
        "op": "Unsqueeze", "inputs": ["pre_nms_idx", "pre_nms_unsq_axes"],
        "outputs": ["pre_nms_idx3"], "attrs": {},
    })
    new_outputs = []
    for src, shape, out in (
        (bname, bshape, "pre_nms_boxes"),
        (sname, sshape, "pre_nms_scores"),
        (fname, fshape, "pre_nms_flame"),
    ):
        if out == "pre_nms_scores" and len(sshape) == 2:
            # [B, A] scores: the sorted TopK values ARE the gathered scores
            new_outputs.append(("pre_nms_scores_topk", [int(shape[0]), k]))
            continue
        graph.nodes.append({
            "op": "GatherND", "inputs": [src, "pre_nms_idx3"],
            "outputs": [out], "attrs": {"batch_dims": 1},
        })
        new_outputs.append((out, [int(shape[0]), k] + [int(d) for d in shape[2:]]))
    graph.outputs = new_outputs


def export_onnx(
    model_name: str,
    variables: Optional[dict] = None,
    image_size: Tuple[int, int] = (640, 640),
    path: Optional[str] = None,
    mirror=None,
    quantize: Optional[str] = None,
    pre_nms_top_k: Optional[int] = None,
) -> OnnxGraph:
    """Export the detection graph as ONNX via the torch mirror.

    :param variables: flax variables to load into the mirror (None = the
        mirror's default init)
    :param mirror: optional prebuilt TorchYoloHeads (overrides model_name /
        variables weight sourcing)
    :param quantize: None | 'int8' | 'fp16' — see :func:`quantize_graph`
        (the reference's export quantization_mode)
    :return: the in-memory OnnxGraph (also written to ``path`` if given)
    """
    import torch

    from head_detector_tpu.torch_mirror import build_torch_mirror, load_flax_variables

    if mirror is None:
        mirror = build_torch_mirror(model_name)
        if variables is not None:
            load_flax_variables(mirror, variables)
    mirror.eval()
    example = torch.rand(1, 3, image_size[0], image_size[1])
    with torch.no_grad():
        traced = torch.jit.trace(mirror, example)
    frozen = torch.jit.freeze(traced)
    graph = frozen.graph
    torch._C._jit_pass_constant_propagation(graph)
    torch._C._jit_pass_dce(graph)

    og = OnnxGraph()
    env: Dict = {}  # torch Value -> ("const", obj) | ("rt", onnx_name)
    counter = [0]

    def fresh(prefix: str) -> str:
        counter[0] += 1
        return f"{prefix}_{counter[0]}"

    def add_init(arr, prefix="const") -> str:
        name = fresh(prefix)
        a = arr.detach().cpu().numpy() if hasattr(arr, "detach") else np.asarray(arr)
        if a.dtype == np.float64:
            a = a.astype(np.float32)
        if a.dtype not in _NP_TO_DT:
            a = a.astype(np.int64) if np.issubdtype(a.dtype, np.integer) else a.astype(np.float32)
        og.initializers[name] = a
        return name

    def as_rt(value) -> str:
        """ONNX name for a torch Value (materializing constants)."""
        tag, obj = env[value]
        if tag == "rt":
            return obj
        name = add_init(obj)
        env[value] = ("rt", name)
        return name

    def const_of(value):
        tag, obj = env[value]
        if tag != "const":
            raise ValueError(f"expected constant, got runtime value {value}")
        return obj

    def is_const(value) -> bool:
        return env[value][0] == "const"

    # Concrete evaluation during translation: every emitted node runs on the
    # example immediately (the same interpreter the tests use), so shapes
    # for aten::size come from real tensors and every translated op is
    # validated the moment it is produced.
    concrete: Dict[str, np.ndarray] = {}

    def emit(op: str, inputs: List[str], n_out: int = 1, attrs: Dict = None,
             prefix: str = None) -> List[str]:
        outs = [fresh(prefix or op.lower()) for _ in range(n_out)]
        node = {"op": op, "inputs": inputs, "outputs": outs,
                "attrs": attrs or {}}
        og.nodes.append(node)
        missing = [i for i in inputs if i and i not in concrete]
        for name in missing:
            concrete[name] = og.initializers[name]
        _exec_node(node, concrete)
        return outs

    # graph inputs: [self?, image] — frozen graphs drop self
    g_inputs = [i for i in graph.inputs() if "self" not in i.debugName()]
    assert len(g_inputs) == 1, [i.debugName() for i in g_inputs]
    img_v = g_inputs[0]
    env[img_v] = ("rt", "image")
    og.inputs.append(("image", [1, 3, image_size[0], image_size[1]]))
    concrete["image"] = example.numpy()

    import torch as _t

    def fold(kind: str, node) -> bool:
        """Partial evaluation: compute constant-input nodes with torch."""
        ins = list(node.inputs())
        if not all((i in env and is_const(i)) for i in ins):
            return False
        vals = [const_of(i) for i in ins]
        def _dt(enum):
            """torch ScalarType enum -> dtype (None passes through)."""
            table = {0: _t.uint8, 1: _t.int8, 2: _t.int16, 3: _t.int32,
                     4: _t.int64, 5: _t.float16, 6: _t.float32,
                     7: _t.float64, 11: _t.bool, 15: _t.bfloat16}
            return table.get(enum) if isinstance(enum, int) else None

        def _to(x, *a):
            for arg in a:
                d = _dt(arg) if isinstance(arg, int) else None
                if d is not None:
                    return _t.as_tensor(x).to(d)
            return x

        fns = {
            # overloads by arity: (end,dtype,layout,dev,pin) /
            # (start,end,dtype,...) / (start,end,step,dtype,...)
            "aten::arange": lambda *a: (
                _t.arange(a[0], dtype=_dt(a[1])) if len(a) == 5
                else _t.arange(a[0], a[1], dtype=_dt(a[2])) if len(a) == 6
                else _t.arange(a[0], a[1], a[2], dtype=_dt(a[3]))
            ),
            "aten::full": lambda size, v, *a: _t.full(
                size, v, dtype=_dt(a[0]) if a else None),
            "aten::meshgrid": lambda tensors, indexing=None: list(
                _t.meshgrid(*tensors, indexing=indexing or "ij")),
            "aten::stack": lambda tensors, dim=0: _t.stack(tensors, dim),
            "aten::cat": lambda tensors, dim=0: _t.cat(tensors, dim),
            "aten::unsqueeze": lambda x, d: _t.unsqueeze(_t.as_tensor(x), d),
            "aten::reshape": lambda x, s: _t.reshape(x, s),
            "aten::permute": lambda x, p: x.permute(p),
            "aten::mul": lambda a, b: _t.mul(_t.as_tensor(a), _t.as_tensor(b)),
            "aten::add": lambda a, b, alpha=1: _t.add(_t.as_tensor(a), _t.as_tensor(b), alpha=alpha),
            "aten::sub": lambda a, b, alpha=1: _t.sub(_t.as_tensor(a), _t.as_tensor(b), alpha=alpha),
            "aten::div": lambda a, b: _t.div(_t.as_tensor(a), _t.as_tensor(b)),
            "aten::slice": lambda x, dim, start, end, step: _slice_t(x, dim, start, end, step),
            "aten::Int": lambda x: int(x),
            "prim::NumToTensor": lambda x: _t.tensor(x),
            "aten::to": _to,
        }
        if kind == "prim::ListConstruct":
            env[node.output()] = ("const", vals)
            return True
        if kind == "prim::ListUnpack":
            for o, v in zip(node.outputs(), vals[0]):
                env[o] = ("const", v)
            return True
        if kind not in fns:
            return False
        result = fns[kind](*vals)
        outs = list(node.outputs())
        if len(outs) == 1:
            env[outs[0]] = ("const", result)
        else:
            for o, v in zip(outs, result):
                env[o] = ("const", v)
        return True

    def _slice_t(x, dim, start, end, step):
        idx = [slice(None)] * x.dim()
        idx[dim] = slice(start, end if end is not None and end < 2**62 else None, step)
        return x[tuple(idx)]

    for node in graph.nodes():
        kind = node.kind()
        if kind == "prim::Constant":
            env[node.output()] = ("const", _const_value(node))
            continue
        if kind == "aten::size":
            # shapes come from the concrete evaluation of the translated
            # graph (fixed-size export, like the reference's cache_anchors)
            src = node.inputsAt(0)
            if src in env and env[src][0] == "const":
                sizes = list(np.asarray(const_of(src)).shape)
            else:
                sizes = list(concrete[as_rt(src)].shape)
            if node.inputsSize() > 1:
                env[node.output()] = ("const", sizes[const_of(node.inputsAt(1))])
            else:
                env[node.output()] = ("const", sizes)
            continue
        if fold(kind, node):
            continue

        ins = list(node.inputs())
        if kind == "prim::ListConstruct":
            # runtime tensor list (concat inputs): keep the Value list
            env[node.output()] = ("const_list_rt", ins)
            continue
        if kind == "prim::TupleConstruct":
            for i_v in ins:
                nm = as_rt(i_v)
                og.outputs.append((nm, list(concrete[nm].shape)))
            continue

        def out1(name):
            env[node.output()] = ("rt", name)

        if kind == "aten::_convolution":
            x = as_rt(ins[0])
            w = add_init(const_of(ins[1]), "weight")
            stride = const_of(ins[3])
            padding = const_of(ins[4])
            dilation = const_of(ins[5])
            transposed = bool(const_of(ins[6]))
            output_padding = const_of(ins[7])
            groups = const_of(ins[8])
            inputs = [x, w]
            if const_of(ins[2]) is not None:
                inputs.append(add_init(const_of(ins[2]), "bias"))
            attrs = {
                "strides": stride, "dilations": dilation, "group": groups,
                "pads": list(padding) + list(padding),
            }
            if transposed:  # the PAN neck's ConvTranspose2d(2, 2) upsample
                attrs["output_padding"] = output_padding
                (o,) = emit("ConvTranspose", inputs, attrs=attrs)
            else:
                (o,) = emit("Conv", inputs, attrs=attrs)
            out1(o)
        elif kind == "aten::batch_norm":
            x = as_rt(ins[0])
            scale = add_init(const_of(ins[1]), "bn_scale")
            bias = add_init(const_of(ins[2]), "bn_bias")
            mean = add_init(const_of(ins[3]), "bn_mean")
            var = add_init(const_of(ins[4]), "bn_var")
            eps = float(const_of(ins[7]))
            (o,) = emit("BatchNormalization", [x, scale, bias, mean, var],
                        attrs={"epsilon": eps})
            out1(o)
        elif kind in ("aten::relu", "aten::relu_"):
            (o,) = emit("Relu", [as_rt(ins[0])])
            out1(o)
        elif kind == "aten::tanh":
            (o,) = emit("Tanh", [as_rt(ins[0])])
            out1(o)
        elif kind == "aten::sigmoid":
            (o,) = emit("Sigmoid", [as_rt(ins[0])])
            out1(o)
        elif kind == "aten::exp":
            (o,) = emit("Exp", [as_rt(ins[0])])
            out1(o)
        elif kind == "aten::max_pool2d":
            k = const_of(ins[1])
            stride = const_of(ins[2]) or k
            padding = const_of(ins[3])
            dilation = const_of(ins[4]) if len(ins) > 4 else None
            ceil_mode = const_of(ins[5]) if len(ins) > 5 else 0
            if ceil_mode or (
                dilation is not None
                and any(d != 1 for d in np.atleast_1d(dilation))
            ):
                # not a bare assert: stripped under -O would export a
                # silently wrong MaxPool
                raise NotImplementedError(
                    "max_pool2d: dilation>1 / ceil_mode not translated"
                )
            (o,) = emit("MaxPool", [as_rt(ins[0])], attrs={
                "kernel_shape": k, "strides": stride,
                "pads": list(padding) + list(padding),
            })
            out1(o)
        elif kind == "aten::cat":
            tag, lst = env[ins[0]]
            vals = lst if tag == "const_list_rt" else [v for v in lst]
            names = [as_rt(v) if tag == "const_list_rt" else add_init(v)
                     for v in vals]
            (o,) = emit("Concat", names, attrs={"axis": const_of(ins[1])})
            out1(o)
        elif kind in ("aten::add", "aten::sub", "aten::mul", "aten::div"):
            opmap = {"aten::add": "Add", "aten::sub": "Sub",
                     "aten::mul": "Mul", "aten::div": "Div"}
            a = as_rt(ins[0]) if not is_const(ins[0]) else add_init(
                _t.as_tensor(const_of(ins[0]), dtype=_t.float32))
            b = as_rt(ins[1]) if not is_const(ins[1]) else add_init(
                _t.as_tensor(const_of(ins[1]), dtype=_t.float32))
            if kind in ("aten::add", "aten::sub") and len(ins) > 2:
                alpha = const_of(ins[2])
                assert alpha in (1, 1.0), f"alpha={alpha} unsupported"
            (o,) = emit(opmap[kind], [a, b])
            out1(o)
        elif kind == "aten::clamp":
            x = as_rt(ins[0])
            lo, hi = const_of(ins[1]), const_of(ins[2])
            names = [x]
            names.append(add_init(np.float32(lo)) if lo is not None else "")
            if hi is not None:
                names.append(add_init(np.float32(hi)))
            (o,) = emit("Clip", names)
            out1(o)
        elif kind == "aten::pad":
            x = as_rt(ins[0])
            tpad = list(const_of(ins[1]))  # torch order: last dim first, pairs
            mode = const_of(ins[2]) or "constant"
            value = const_of(ins[3]) or 0.0
            rank = concrete[x].ndim
            begins = [0] * rank
            ends = [0] * rank
            for i in range(len(tpad) // 2):
                begins[rank - 1 - i] = tpad[2 * i]
                ends[rank - 1 - i] = tpad[2 * i + 1]
            pads = add_init(np.asarray(begins + ends, np.int64))
            cval = add_init(np.float32(value))
            (o,) = emit("Pad", [x, pads, cval], attrs={"mode": mode})
            out1(o)
        elif kind == "aten::permute":
            (o,) = emit("Transpose", [as_rt(ins[0])],
                        attrs={"perm": const_of(ins[1])})
            out1(o)
        elif kind == "aten::reshape":
            shape = add_init(np.asarray(const_of(ins[1]), np.int64))
            (o,) = emit("Reshape", [as_rt(ins[0]), shape])
            out1(o)
        elif kind == "aten::softmax":
            (o,) = emit("Softmax", [as_rt(ins[0])],
                        attrs={"axis": const_of(ins[1])})
            out1(o)
        elif kind == "aten::unsqueeze":
            axes = add_init(np.asarray([const_of(ins[1])], np.int64))
            (o,) = emit("Unsqueeze", [as_rt(ins[0]), axes])
            out1(o)
        elif kind == "aten::slice":
            dim = const_of(ins[1])
            start = const_of(ins[2]) or 0
            end = const_of(ins[3])
            step = const_of(ins[4])
            end = min(end if end is not None else 2**62, 2**62)
            names = [as_rt(ins[0]),
                     add_init(np.asarray([start], np.int64)),
                     add_init(np.asarray([end], np.int64)),
                     add_init(np.asarray([dim], np.int64)),
                     add_init(np.asarray([step], np.int64))]
            (o,) = emit("Slice", names)
            out1(o)
        elif kind == "aten::einsum":
            eq = const_of(ins[0])
            tag, lst = env[ins[1]]
            assert eq.replace(" ", "") == "bakm,m->bak", eq
            operands = lst
            x = as_rt(operands[0])
            proj = const_of(operands[1]).reshape(-1, 1)
            w = add_init(proj, "einsum_w")
            (mm,) = emit("MatMul", [x, w])  # [b,a,k,1]
            out_shape = list(concrete[mm].shape[:-1])
            rshape = add_init(np.asarray(out_shape, np.int64))
            (o,) = emit("Reshape", [mm, rshape])
            out1(o)
        elif kind == "aten::stack":
            tag, lst = env[ins[0]]
            dim = const_of(ins[1])
            unsq = []
            for v in lst:
                axes = add_init(np.asarray([dim], np.int64))
                (u,) = emit("Unsqueeze", [as_rt(v), axes])
                unsq.append(u)
            (o,) = emit("Concat", unsq, attrs={"axis": dim})
            out1(o)
        else:
            raise NotImplementedError(f"untranslated op {kind}: {node}")

    if pre_nms_top_k:
        attach_pre_nms_topk(og, pre_nms_top_k)
    if quantize:
        quantize_graph(og, mode=quantize)

    if path:
        with open(path, "wb") as f:
            f.write(og.serialize())
    return og


# --------------------------------------------------------------------------- #
# Numpy/torch-functional interpreter (verification harness, not a runtime)
# --------------------------------------------------------------------------- #


def run_onnx(graph: OnnxGraph, feeds: Dict[str, np.ndarray]) -> List[np.ndarray]:
    vals: Dict[str, np.ndarray] = dict(graph.initializers)
    vals.update({k: np.asarray(v) for k, v in feeds.items()})
    for node in graph.nodes:
        _exec_node(node, vals)
    return [vals[name] for name, _ in graph.outputs]


def _exec_node(node: Dict, vals: Dict[str, np.ndarray]) -> None:
    import torch
    import torch.nn.functional as F

    def t(name):
        # np.array copy: raw_data buffers parsed from the file are read-only
        return torch.from_numpy(np.array(vals[name]))

    if True:
        op, ins, outs, attrs = (node["op"], node["inputs"], node["outputs"],
                                node.get("attrs", {}))
        if op == "Conv":
            pads = attrs.get("pads", [0, 0, 0, 0])
            assert pads[:2] == pads[2:], pads
            y = F.conv2d(
                t(ins[0]), t(ins[1]),
                t(ins[2]) if len(ins) > 2 else None,
                stride=attrs.get("strides", [1, 1]),
                padding=pads[:2],
                dilation=attrs.get("dilations", [1, 1]),
                groups=attrs.get("group", 1),
            )
        elif op == "ConvTranspose":
            pads = attrs.get("pads", [0, 0, 0, 0])
            assert pads[:2] == pads[2:], pads
            y = F.conv_transpose2d(
                t(ins[0]), t(ins[1]),
                t(ins[2]) if len(ins) > 2 else None,
                stride=attrs.get("strides", [1, 1]),
                padding=pads[:2],
                output_padding=attrs.get("output_padding", [0, 0]),
                dilation=attrs.get("dilations", [1, 1]),
                groups=attrs.get("group", 1),
            )
        elif op == "BatchNormalization":
            y = F.batch_norm(
                t(ins[0]), t(ins[3]), t(ins[4]), t(ins[1]), t(ins[2]),
                training=False, eps=attrs.get("epsilon", 1e-5),
            )
        elif op == "Relu":
            y = torch.relu(t(ins[0]))
        elif op == "Tanh":
            y = torch.tanh(t(ins[0]))
        elif op == "Sigmoid":
            y = torch.sigmoid(t(ins[0]))
        elif op == "Exp":
            y = torch.exp(t(ins[0]))
        elif op == "MaxPool":
            pads = attrs.get("pads", [0, 0, 0, 0])
            y = F.max_pool2d(
                t(ins[0]), attrs["kernel_shape"], stride=attrs.get("strides"),
                padding=pads[:2],
            )
        elif op == "Concat":
            y = torch.cat([t(i) for i in ins], dim=attrs["axis"])
        elif op in ("Add", "Sub", "Mul", "Div"):
            fn = {"Add": torch.add, "Sub": torch.sub, "Mul": torch.mul,
                  "Div": torch.div}[op]
            y = fn(t(ins[0]), t(ins[1]))
        elif op == "Clip":
            lo = t(ins[1]).item() if len(ins) > 1 and ins[1] else None
            hi = t(ins[2]).item() if len(ins) > 2 and ins[2] else None
            y = torch.clamp(t(ins[0]), lo, hi)
        elif op == "Pad":
            pads = vals[ins[1]]
            rank = len(pads) // 2
            tpad = []
            for i in range(rank - 1, -1, -1):
                tpad += [int(pads[i]), int(pads[i + rank])]
            y = F.pad(t(ins[0]), tpad, mode=attrs.get("mode", "constant"),
                      value=float(vals[ins[2]]) if len(ins) > 2 else 0.0)
        elif op == "Transpose":
            y = t(ins[0]).permute(attrs["perm"])
        elif op == "Reshape":
            y = t(ins[0]).reshape([int(d) for d in vals[ins[1]]])
        elif op == "Softmax":
            y = torch.softmax(t(ins[0]), dim=attrs["axis"])
        elif op == "Unsqueeze":
            y = t(ins[0]).unsqueeze(int(vals[ins[1]][0]))
        elif op == "Slice":
            x = t(ins[0])
            start = int(vals[ins[1]][0])
            end = int(vals[ins[2]][0])
            dim = int(vals[ins[3]][0])
            step = int(vals[ins[4]][0])
            idx = [slice(None)] * x.dim()
            idx[dim] = slice(start, None if end >= 2**62 else end, step)
            y = x[tuple(idx)]
        elif op == "MatMul":
            y = torch.matmul(t(ins[0]), t(ins[1]))
        elif op == "DequantizeLinear":
            # weight-QDQ leg (quantize_graph): int8 q * per-channel scale
            q = np.array(vals[ins[0]], np.float32)
            scale = np.array(vals[ins[1]], np.float32)
            axis = attrs.get("axis", 1)
            if scale.ndim == 1 and q.ndim > 1:
                shape = [1] * q.ndim
                shape[axis] = scale.shape[0]
                scale = scale.reshape(shape)
            zp = np.array(vals[ins[2]], np.float32) if len(ins) > 2 else 0.0
            y = torch.from_numpy((q - zp) * scale)
        elif op == "Cast":
            y = torch.from_numpy(
                np.array(vals[ins[0]]).astype(_DT_TO_NP[attrs["to"]])
            )
        elif op == "TopK":
            kk = int(np.asarray(vals[ins[1]]).reshape(-1)[0])
            v, idx = torch.topk(
                t(ins[0]), kk, dim=attrs.get("axis", -1),
                largest=bool(attrs.get("largest", 1)),
                sorted=bool(attrs.get("sorted", 1)),
            )
            vals[outs[0]] = v.numpy()
            vals[outs[1]] = idx.numpy().astype(np.int64)
            return
        elif op == "GatherND":
            data = np.array(vals[ins[0]])
            idx = np.asarray(vals[ins[1]], np.int64)
            assert int(attrs.get("batch_dims", 0)) == 1, attrs
            y = torch.from_numpy(np.stack([
                data[i][tuple(np.moveaxis(idx[i], -1, 0))]
                for i in range(data.shape[0])
            ]))
        else:
            raise NotImplementedError(f"interpreter op {op}")
        vals[outs[0]] = y.numpy()
