"""Minimal ONNX protobuf WRITER (test support) — inverse of eval/onnx_graph.

torch.onnx.export is unusable in this image (the ``onnx``/``onnxscript``
packages are absent), so the interpreter golden tests build their .onnx
files by hand with this encoder and compare eval/onnx_jax.py's execution
against torch/numpy reference computations.

Emits the subset of ModelProto/GraphProto/NodeProto/AttributeProto/
TensorProto that eval/onnx_graph.py parses (raw_data tensors, i/f/s/ints/
floats/tensor attributes).
"""

from __future__ import annotations

import struct

import numpy as np

_NP_TO_ONNX = {np.dtype(np.float32): 1, np.dtype(np.uint8): 2,
               np.dtype(np.int8): 3, np.dtype(np.int16): 5,
               np.dtype(np.int32): 6, np.dtype(np.int64): 7,
               np.dtype(np.bool_): 9, np.dtype(np.float16): 10,
               np.dtype(np.float64): 11}

INT64_MIN = -(2 ** 63)
INT64_MAX = 2 ** 63 - 1


def _varint(v: int) -> bytes:
    v &= (1 << 64) - 1  # two's-complement for negatives (proto int64)
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        out += bytes([b | (0x80 if v else 0)])
        if not v:
            return out


def _tag(fno: int, wire: int) -> bytes:
    return _varint((fno << 3) | wire)


def _ld(fno: int, payload: bytes) -> bytes:
    return _tag(fno, 2) + _varint(len(payload)) + payload


def tensor(name: str, arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    out = b"".join(_tag(1, 0) + _varint(d) for d in arr.shape)
    out += _tag(2, 0) + _varint(_NP_TO_ONNX[arr.dtype])
    out += _ld(8, name.encode())
    out += _ld(9, arr.tobytes())
    return out


def _attr(name: str, value) -> bytes:
    out = _ld(1, name.encode())
    if isinstance(value, bytes):
        out += _ld(4, value)
    elif isinstance(value, str):
        out += _ld(4, value.encode())
    elif isinstance(value, bool):
        out += _tag(3, 0) + _varint(int(value))
    elif isinstance(value, int):
        out += _tag(3, 0) + _varint(value)
    elif isinstance(value, float):
        out += _tag(2, 5) + struct.pack("<f", value)
    elif isinstance(value, np.ndarray):
        out += _ld(5, tensor("", value))
    elif isinstance(value, (list, tuple)):
        if all(isinstance(v, (int, np.integer)) for v in value):
            out += _ld(8, b"".join(_varint(int(v)) for v in value))
        else:
            out += _ld(7, b"".join(struct.pack("<f", float(v)) for v in value))
    else:
        raise TypeError(f"attribute {name}: {type(value)}")
    return out


def node(op_type: str, inputs, outputs, **attrs) -> bytes:
    out = b"".join(_ld(1, i.encode()) for i in inputs)
    out += b"".join(_ld(2, o.encode()) for o in outputs)
    out += _ld(4, op_type.encode())
    out += b"".join(_ld(5, _attr(k, v)) for k, v in attrs.items())
    return out


def model(nodes, initializers: dict, inputs, outputs) -> bytes:
    """nodes: list of node() bytes; initializers: {name: np.ndarray}."""
    graph = b"".join(_ld(1, n) for n in nodes)
    graph += b"".join(_ld(5, tensor(k, v)) for k, v in initializers.items())
    graph += b"".join(_ld(11, _ld(1, i.encode())) for i in inputs)
    graph += b"".join(_ld(12, _ld(1, o.encode())) for o in outputs)
    return _ld(7, graph)


def write_model(path, nodes, initializers, inputs, outputs):
    with open(path, "wb") as f:
        f.write(model(nodes, initializers, inputs, outputs))
    return str(path)
