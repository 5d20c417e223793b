"""Execute a parsed ONNX graph with JAX — enough ops for the DNSMOS models.

The graphs (see onnx_graph.load_model) are topologically sorted; execution
binds each node's output in an environment dict. Convs run through
``lax.conv_general_dilated`` (ONNX NCHW / OIHW layout), dense layers through
``jnp.matmul`` — on TPU the whole scorer compiles to one XLA program, so
batched DNSMOS evaluation replaces the reference's per-file thread pool
(DNSMOS/dnsmos_local.py:129-138).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from dl_speech_enhancement_tpu.eval.onnx_graph import Graph, load_model


def _attr(node, name, default=None):
    a = node.attrs.get(name)
    return default if a is None else a.value


def _opt_input(env, node, i):
    """Optional input i, or None — ONNX encodes omitted optionals either by
    truncating the input list or with an empty-string placeholder."""
    if len(node.inputs) > i and node.inputs[i]:
        return env[node.inputs[i]]
    return None


def _axes_of(env, node):
    """Reduce/Squeeze axes: attribute form (opset < 13/18), input form
    (opset >= 13/18), or None = all axes (the ONNX default)."""
    axes = _attr(node, "axes")
    if axes is None:
        inp = _opt_input(env, node, 1)
        if inp is not None:
            axes = np.asarray(inp).tolist()
    if axes is None or axes == []:
        return None
    return tuple(int(a) for a in axes)


def _conv(env, node):
    x = env[node.inputs[0]]
    w = env[node.inputs[1]]
    b = env[node.inputs[2]] if len(node.inputs) > 2 else None
    spatial = w.ndim - 2
    strides = tuple(_attr(node, "strides", [1] * spatial))
    dilations = tuple(_attr(node, "dilations", [1] * spatial))
    group = int(_attr(node, "group", 1))
    auto_pad = _attr(node, "auto_pad", b"NOTSET")
    if isinstance(auto_pad, bytes):
        auto_pad = auto_pad.decode()
    if auto_pad in ("VALID", "NOTSET"):
        pads = _attr(node, "pads", [0] * (2 * spatial))
        padding = [(int(pads[i]), int(pads[i + spatial])) for i in range(spatial)]
    elif auto_pad in ("SAME_UPPER", "SAME_LOWER"):
        # explicit asymmetric padding: ONNX puts the extra pad at the END for
        # SAME_UPPER and at the START for SAME_LOWER (shapes are static under
        # jit, so this is computable at trace time)
        padding = []
        for i in range(spatial):
            in_dim = x.shape[2 + i]
            eff_k = (w.shape[2 + i] - 1) * dilations[i] + 1
            out_dim = -(-in_dim // strides[i])
            total = max((out_dim - 1) * strides[i] + eff_k - in_dim, 0)
            small, big = total // 2, total - total // 2
            padding.append((small, big) if auto_pad == "SAME_UPPER"
                           else (big, small))
    else:
        raise NotImplementedError(f"auto_pad {auto_pad}")
    if spatial == 1:
        dn = ("NCH", "OIH", "NCH")
    elif spatial == 2:
        dn = ("NCHW", "OIHW", "NCHW")
    else:
        raise NotImplementedError(f"{spatial}-D conv")
    y = lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        rhs_dilation=dilations, dimension_numbers=dn,
        feature_group_count=group,
    )
    if b is not None:
        y = y + b.reshape((1, -1) + (1,) * spatial)
    return y


def _maxpool(env, node):
    x = env[node.inputs[0]]
    kernel = tuple(_attr(node, "kernel_shape"))
    strides = tuple(_attr(node, "strides", kernel))
    pads = _attr(node, "pads", [0] * (2 * len(kernel)))
    if int(_attr(node, "ceil_mode", 0)):
        raise NotImplementedError("MaxPool ceil_mode")
    if any(int(d) != 1 for d in _attr(node, "dilations", [1] * len(kernel))):
        raise NotImplementedError("MaxPool dilations")
    sp = len(kernel)
    padding = [(0, 0), (0, 0)] + [
        (int(pads[i]), int(pads[i + sp])) for i in range(sp)
    ]
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 1) + kernel, (1, 1) + strides, padding
    )


def _avgpool(env, node):
    x = env[node.inputs[0]]
    kernel = tuple(_attr(node, "kernel_shape"))
    strides = tuple(_attr(node, "strides", kernel))
    if int(_attr(node, "ceil_mode", 0)):
        raise NotImplementedError("AveragePool ceil_mode")
    if any(int(p) != 0 for p in _attr(node, "pads", [0] * (2 * len(kernel)))):
        raise NotImplementedError("AveragePool explicit pads")
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, 1) + kernel, (1, 1) + strides, "VALID"
    )
    return summed / np.prod(kernel)


def _slice(env, node):
    x = env[node.inputs[0]]
    starts = np.asarray(env[node.inputs[1]]).astype(np.int64)
    ends = np.asarray(env[node.inputs[2]]).astype(np.int64)
    axes = (np.asarray(env[node.inputs[3]]).astype(np.int64)
            if len(node.inputs) > 3 else np.arange(len(starts)))
    steps = (np.asarray(env[node.inputs[4]]).astype(np.int64)
             if len(node.inputs) > 4 else np.ones(len(starts), np.int64))
    idx = [slice(None)] * x.ndim
    for s, e, a, st in zip(starts, ends, axes, steps):
        dim = x.shape[int(a)]
        s, e, st = int(s), int(e), int(st)
        if st == 0:
            raise NotImplementedError("Slice step 0")
        # ONNX semantics: negative indices wrap once, then clamp — including
        # the INT64_MIN/INT64_MAX sentinels ("from the very start/end").
        if s < 0:
            s += dim
        if e < 0:
            e += dim
        if st > 0:
            s = min(max(s, 0), dim)
            stop = min(max(e, 0), dim)
        else:
            s = min(max(s, 0), dim - 1)
            # e < 0 after wrapping means "past the first element": Python
            # needs None there (slice(s, -1, -1) would be empty)
            stop = None if e < 0 else min(e, dim - 1)
        idx[int(a)] = slice(s, stop, st)
    return x[tuple(idx)]


_ELEMENTWISE = {
    "Relu": lambda x: jnp.maximum(x, 0),
    "Sigmoid": jax.nn.sigmoid,
    "Tanh": jnp.tanh,
    "Sqrt": jnp.sqrt,
    "Log": jnp.log,
    "Exp": jnp.exp,
    "Abs": jnp.abs,
    "Neg": jnp.negative,
    "Identity": lambda x: x,
}

_BINARY = {
    "Add": jnp.add,
    "Sub": jnp.subtract,
    "Mul": jnp.multiply,
    "Div": jnp.divide,
    "Pow": jnp.power,
    "Max": jnp.maximum,
    "Min": jnp.minimum,
    "MatMul": jnp.matmul,
}


def run_graph(graph: Graph, feeds: dict) -> list:
    """Execute the graph on the given input dict; returns output arrays."""
    env = {}
    for name, data in graph.initializers.items():
        env[name] = jnp.asarray(data) if data.dtype != np.int64 else data
    env.update({k: jnp.asarray(v) for k, v in feeds.items()})

    # only the primary output of each node is computed; fail at the
    # PRODUCING node (a clear error) if a secondary output (Dropout mask,
    # Split parts, MaxPool indices) is actually consumed downstream
    consumed = set(graph.outputs)
    for node in graph.nodes:
        consumed.update(node.inputs)

    for node in graph.nodes:
        op = node.op_type
        if op in _ELEMENTWISE:
            out = _ELEMENTWISE[op](env[node.inputs[0]])
        elif op in _BINARY:
            out = _BINARY[op](env[node.inputs[0]], env[node.inputs[1]])
        elif op == "Conv":
            out = _conv(env, node)
        elif op == "MaxPool":
            out = _maxpool(env, node)
        elif op == "AveragePool":
            out = _avgpool(env, node)
        elif op == "GlobalAveragePool":
            x = env[node.inputs[0]]
            out = jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True)
        elif op == "Transpose":
            out = jnp.transpose(env[node.inputs[0]], _attr(node, "perm"))
        elif op == "Reshape":
            shape = np.asarray(env[node.inputs[1]]).astype(np.int64).tolist()
            out = jnp.reshape(env[node.inputs[0]], shape)
        elif op == "Flatten":
            x = env[node.inputs[0]]
            axis = int(_attr(node, "axis", 1))
            out = x.reshape(int(np.prod(x.shape[:axis])), -1)
        elif op == "Concat":
            out = jnp.concatenate([env[i] for i in node.inputs],
                                  axis=int(_attr(node, "axis")))
        elif op == "Unsqueeze":
            axes = _attr(node, "axes")
            if axes is None:
                axes = np.asarray(env[node.inputs[1]]).tolist()
            out = env[node.inputs[0]]
            for a in sorted(int(a) for a in axes):
                out = jnp.expand_dims(out, a)
        elif op == "Squeeze":
            out = jnp.squeeze(env[node.inputs[0]], axis=_axes_of(env, node))
        elif op == "Slice":
            out = _slice(env, node)
        elif op == "ReduceMax":
            out = jnp.max(env[node.inputs[0]], axis=_axes_of(env, node),
                          keepdims=bool(_attr(node, "keepdims", 1)))
        elif op == "ReduceMean":
            out = jnp.mean(env[node.inputs[0]], axis=_axes_of(env, node),
                           keepdims=bool(_attr(node, "keepdims", 1)))
        elif op == "Gemm":
            a, b = env[node.inputs[0]], env[node.inputs[1]]
            if _attr(node, "transA", 0):
                a = a.T
            if _attr(node, "transB", 0):
                b = b.T
            out = _attr(node, "alpha", 1.0) * (a @ b)
            if len(node.inputs) > 2:
                out = out + _attr(node, "beta", 1.0) * env[node.inputs[2]]
        elif op == "Softmax":
            out = jax.nn.softmax(env[node.inputs[0]],
                                 axis=int(_attr(node, "axis", -1)))
        elif op == "Clip":
            lo = _opt_input(env, node, 1)
            hi = _opt_input(env, node, 2)
            out = jnp.clip(env[node.inputs[0]],
                           -jnp.inf if lo is None else lo,
                           jnp.inf if hi is None else hi)
        elif op == "Dropout":
            out = env[node.inputs[0]]
        elif op == "Cast":
            # onnx.TensorProto dtype codes
            to = int(_attr(node, "to"))
            dtypes = {1: jnp.float32, 2: jnp.uint8, 3: jnp.int8,
                      4: jnp.uint16, 5: jnp.int16, 6: jnp.int32,
                      7: jnp.int64, 9: jnp.bool_, 10: jnp.float16,
                      11: jnp.float64, 12: jnp.uint32, 13: jnp.uint64,
                      16: jnp.bfloat16}
            if to not in dtypes:
                raise NotImplementedError(f"Cast to dtype code {to}")
            out = env[node.inputs[0]].astype(dtypes[to])
        elif op == "Constant":
            out = jnp.asarray(_attr(node, "value").data
                              if node.attrs["value"].t is not None
                              else _attr(node, "value"))
        else:
            raise NotImplementedError(f"ONNX op: {op}")
        for extra in node.outputs[1:]:
            if extra and extra in consumed:
                raise NotImplementedError(
                    f"{op} secondary output '{extra}' is consumed by the "
                    f"graph — only primary outputs are computed")
        env[node.outputs[0]] = out
    return [env[o] for o in graph.outputs]


class OnnxModel:
    """Jit-compiled ONNX model: ``model(**feeds) -> [outputs]``."""

    def __init__(self, path: str):
        self.graph = load_model(path)
        self.input_names = [
            n for n in self.graph.inputs if n not in self.graph.initializers
        ]
        self._run = jax.jit(lambda feeds: run_graph(self.graph, feeds))

    def __call__(self, *args):
        feeds = dict(zip(self.input_names, args))
        return self._run(feeds)
