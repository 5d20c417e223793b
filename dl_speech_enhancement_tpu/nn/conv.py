"""Functional 1-D/2-D convolutions with streaming caches, TPU-first.

Design (vs the reference's torch layers in layers/conv_layer.py):

- **Layout**: activations are ``(B, T, C)`` — channels last, so the channel
  axis maps onto TPU lanes (all channel counts here are multiples of 32/64/
  128) and time maps onto sublanes. The reference uses torch's (B, C, T).
- **Params**: plain nested dicts of ``jnp`` arrays. Each layer object holds
  only static config and exposes ``init(key) -> params``,
  ``__call__(params, x)`` (parallel training path), and for causal layers
  ``init_cache(batch) -> cache`` / ``step(params, cache, x) -> (y, cache)``
  (streaming path). The reference's mutable ``pad_buffer`` registered buffers
  (layers/conv_layer.py:134-151,176-191) become explicit cache pytrees that
  are carried through jitted chunk steps — shape-static, scan-able.
- **Weight norm** is a parametrization: params store ``{v, g}`` and the
  effective weight ``g * v / ||v||`` is computed inside ``__call__``
  (replacing torch's forward pre-hooks, models/vocoder/HiFiGAN.py:193-203).

Semantics parity (checked by tests/test_conv.py against torch):

- ``CausalConv1d.__call__`` left-pads ``(k-1)*dilation`` zeros
  (conv_layer.py:139-142); ``step`` concatenates the cache and keeps the last
  ``(k-1)*dilation`` input samples as the new cache (conv_layer.py:144-147).
- ``CausalConvTranspose1d.__call__`` replication-pads one frame on the left,
  runs a stride-``s`` transposed conv and trims ``s`` samples from both ends
  (conv_layer.py:180-183); ``step`` replaces the replication pad with a
  one-frame cache (conv_layer.py:185-188). Both are fused into a single
  ``conv_general_dilated`` with ``lhs_dilation`` — no materialized upsample,
  no post-trim.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = dict


def _split(key, n):
    return jax.random.split(key, n)


def _norm_weight(v: jax.Array, g: jax.Array, axes: Sequence[int]) -> jax.Array:
    """w = g * v / ||v|| with the norm taken over ``axes`` (weight norm)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=tuple(axes), keepdims=True))
    return v * (g / jnp.maximum(norm, 1e-12))


def _kaiming_uniform_bound(fan_in: int) -> float:
    # torch Conv default init: kaiming_uniform(a=sqrt(5)) -> U(-1/sqrt(fan_in), ...)
    return 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0


def _spectral_norm_weight(w: jax.Array, out_axis: int,
                          n_iters: int = 100, eps: float = 1e-12) -> jax.Array:
    """w / sigma_max(W), W = w as an (out, fan_in) matrix — spectral norm.

    Deviation from torch nn.utils.spectral_norm (which persists a ``u``
    buffer advanced one power iteration per forward): the iteration here is
    **stateless** — it restarts from a fixed pseudo-random unit vector every
    call and runs to convergence (default 100 iterations, ~1e-4 sigma error
    even for near-degenerate spectra like fresh kaiming inits with
    sigma2/sigma1 ~ 0.97; the matvecs are negligible next to the conv
    itself). Both estimate the same converged
    sigma; staying stateless keeps discriminator params a plain pytree with
    no mutable buffer to thread, and keeps the param structure ({'w','b'})
    identical whether or not the flag is set, so checkpoints load across
    the flag. As in torch, u/v are constants for the gradient; grads flow
    through ``sigma = u^T W v`` w.r.t. W only.
    """
    wm = jnp.moveaxis(w, out_axis, 0).reshape(w.shape[out_axis], -1)
    u = jax.random.normal(jax.random.PRNGKey(0), (wm.shape[0],), w.dtype)
    u = u / jnp.linalg.norm(u)
    for _ in range(n_iters):
        v = wm.T @ u
        v = v / jnp.maximum(jnp.linalg.norm(v), eps)
        u = wm @ v
        u = u / jnp.maximum(jnp.linalg.norm(u), eps)
    u = lax.stop_gradient(u)
    v = lax.stop_gradient(v)
    sigma = u @ (wm @ v)
    return w / sigma


class Conv1d:
    """Plain 1-D convolution over (B, T, C), optionally weight-normed.

    ``padding < 0`` selects torch-style "same" padding
    ``(k - 1) // 2 * dilation`` (reference NonCausalConv1d,
    layers/conv_layer.py:43-44).
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int,
        stride: int = 1,
        padding: int = -1,
        dilation: int = 1,
        groups: int = 1,
        bias: bool = True,
        weight_norm: bool = False,
        spectral_norm: bool = False,
        w_init: str = "torch",
        w_init_scale: float = 0.01,
    ):
        if padding < 0:
            padding = (kernel_size - 1) // 2 * dilation
        assert not (weight_norm and spectral_norm)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.bias = bias
        self.weight_norm = weight_norm
        self.spectral_norm = spectral_norm
        self.w_init = w_init
        self.w_init_scale = w_init_scale

    # weight layout: (k, in/groups, out) == 'HIO'
    def _w_shape(self):
        return (self.kernel_size, self.in_channels // self.groups, self.out_channels)

    def _init_weight(self, key):
        fan_in = self.kernel_size * self.in_channels // self.groups
        if self.w_init == "normal":
            # HiFiGAN official init (models/vocoder/HiFiGAN.py:164-177)
            return self.w_init_scale * jax.random.normal(
                key, self._w_shape(), jnp.float32
            )
        bound = _kaiming_uniform_bound(fan_in)
        return jax.random.uniform(
            key, self._w_shape(), jnp.float32, minval=-bound, maxval=bound
        )

    def init(self, key) -> Params:
        # spectral norm adds no params (stateless iteration), so the param
        # structure and the key split are identical with the flag on or off
        # — same-seed inits and checkpoints are interchangeable across it
        kw, kb = _split(key, 2)
        w = self._init_weight(kw)
        p: Params = {}
        if self.weight_norm:
            # norm over (k, in) per output channel — torch weight_norm dim=0
            g = jnp.sqrt(jnp.sum(jnp.square(w), axis=(0, 1), keepdims=True))
            p["v"], p["g"] = w, g
        else:
            p["w"] = w
        if self.bias:
            fan_in = self.kernel_size * self.in_channels // self.groups
            bound = _kaiming_uniform_bound(fan_in)
            p["b"] = jax.random.uniform(
                kb, (self.out_channels,), jnp.float32, minval=-bound, maxval=bound
            )
        return p

    def weight(self, params: Params) -> jax.Array:
        if self.weight_norm:
            return _norm_weight(params["v"], params["g"], (0, 1))
        if self.spectral_norm:
            return _spectral_norm_weight(params["w"], 2)
        return params["w"]

    def _conv(self, x, w, pad_lo, pad_hi):
        return lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(self.stride,),
            padding=[(pad_lo, pad_hi)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
        )

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        y = self._conv(x, self.weight(params), self.padding, self.padding)
        if self.bias:
            y = y + params["b"].astype(y.dtype)
        return y


class Conv1d1x1(Conv1d):
    """1x1 conv (reference layers/conv_layer.py:19-23)."""

    def __init__(self, in_channels, out_channels, bias=True, **kw):
        super().__init__(in_channels, out_channels, kernel_size=1, padding=0, bias=bias, **kw)


class CausalConv1d(Conv1d):
    """Causal conv: train path pads left; stream path carries a cache.

    Streaming chunk lengths must be multiples of ``stride`` (the frame-based
    runtime guarantees this, as in the reference)."""

    def __init__(
        self,
        in_channels,
        out_channels,
        kernel_size,
        stride: int = 1,
        dilation: int = 1,
        groups: int = 1,
        bias: bool = True,
        **kw,
    ):
        super().__init__(
            in_channels,
            out_channels,
            kernel_size,
            stride=stride,
            padding=0,
            dilation=dilation,
            groups=groups,
            bias=bias,
            **kw,
        )
        self.pad_length = (kernel_size - 1) * dilation

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        y = self._conv(x, self.weight(params), self.pad_length, 0)
        if self.bias:
            y = y + params["b"].astype(y.dtype)
        return y

    def init_cache(self, batch: int, dtype=jnp.float32) -> jax.Array:
        return jnp.zeros((batch, self.pad_length, self.in_channels), dtype)

    def step(self, params: Params, cache: jax.Array, x: jax.Array):
        if self.stride > 1 and x.shape[1] % self.stride != 0:
            # A partial chunk would desynchronise the window phase of the
            # cache against the offline path (silent drift, not an error, in
            # the reference) — fail loudly instead.
            raise ValueError(
                f"streaming chunk length {x.shape[1]} must be a multiple of "
                f"stride {self.stride}"
            )
        x = jnp.concatenate([cache, x], axis=1)
        new_cache = x[:, x.shape[1] - self.pad_length :, :]
        y = self._conv(x, self.weight(params), 0, 0)
        if self.bias:
            y = y + params["b"].astype(y.dtype)
        return y, new_cache


class ConvTranspose1d:
    """Transposed 1-D conv over (B, T, C) (torch ConvTranspose1d semantics).

    Implemented as ``conv_general_dilated`` with ``lhs_dilation=stride`` and a
    pre-flipped kernel, so output length is ``(T-1)*s - 2p + k + op`` without
    materializing the zero-stuffed intermediate.

    ``padding < 0`` / ``output_padding < 0`` select the reference's
    NonCausalConvTranspose1d defaults (layers/conv_layer.py:83-86).
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int,
        stride: int,
        padding: int = -1,
        output_padding: int = -1,
        groups: int = 1,
        bias: bool = True,
        weight_norm: bool = False,
        w_init: str = "torch",
        w_init_scale: float = 0.01,
    ):
        if padding < 0:
            padding = (stride + 1) // 2
        if output_padding < 0:
            output_padding = 1 if stride % 2 else 0
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.output_padding = output_padding
        self.groups = groups
        self.bias = bias
        self.weight_norm = weight_norm
        self.w_init = w_init
        self.w_init_scale = w_init_scale
        # Effective symmetric conv padding after lhs_dilation:
        self.pad_lo = kernel_size - 1 - padding
        self.pad_hi = kernel_size - 1 - padding + output_padding
        assert self.pad_lo >= 0 and self.pad_hi >= 0

    # weight layout: (k, out/groups?, ...) — we store conv-ready flipped kernel
    # (k, in, out) for dimension_numbers ('NHC','HIO','NHC') with
    # lhs_dilation. torch stores (in, out/groups, k); tests do the transpose
    # + flip when comparing.
    def _w_shape(self):
        return (self.kernel_size, self.in_channels, self.out_channels // self.groups)

    def init(self, key) -> Params:
        kw, kb = _split(key, 2)
        fan_in = self.kernel_size * self.out_channels // self.groups
        if self.w_init == "normal":
            w = self.w_init_scale * jax.random.normal(kw, self._w_shape(), jnp.float32)
        else:
            bound = _kaiming_uniform_bound(fan_in)
            w = jax.random.uniform(
                kw, self._w_shape(), jnp.float32, minval=-bound, maxval=bound
            )
        p: Params = {}
        if self.weight_norm:
            # torch weight_norm dim=0 on (in, out, k): per-*input*-channel norm.
            # Our layout is (k, in, out) -> norm over (k, out) per in channel.
            g = jnp.sqrt(jnp.sum(jnp.square(w), axis=(0, 2), keepdims=True))
            p["v"], p["g"] = w, g
        else:
            p["w"] = w
        if self.bias:
            bound = _kaiming_uniform_bound(fan_in)
            p["b"] = jax.random.uniform(
                kb, (self.out_channels,), jnp.float32, minval=-bound, maxval=bound
            )
        return p

    def weight(self, params: Params) -> jax.Array:
        if self.weight_norm:
            return _norm_weight(params["v"], params["g"], (0, 2))
        return params["w"]

    def _deconv(self, x, w, pad_lo, pad_hi):
        if self.groups != 1:
            raise NotImplementedError("grouped transposed conv not needed by parity")
        return lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(1,),
            padding=[(pad_lo, pad_hi)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        y = self._deconv(x, self.weight(params), self.pad_lo, self.pad_hi)
        if self.bias:
            y = y + params["b"].astype(y.dtype)
        return y


class CausalConvTranspose1d(ConvTranspose1d):
    """Causal transposed conv (upsampler) with a one-frame streaming cache.

    Train path == reference conv_layer.py:180-183 (replication-pad 1, deconv,
    trim ``[stride:-stride]``); the pad+trim are folded into conv padding
    ``k-1-s`` on both sides, which is exact for the reference's ``k = 2s``
    blocks and anything with ``k >= s+1``.
    """

    def __init__(self, in_channels, out_channels, kernel_size, stride, bias=True, **kw):
        super().__init__(
            in_channels,
            out_channels,
            kernel_size,
            stride,
            padding=0,
            output_padding=0,
            bias=bias,
            **kw,
        )
        self.pad_length = 1
        # With one frame prepended, output of the full deconv is T*s + k;
        # trimming s both sides == conv padding (k-1-s, k-1-s) on the
        # dilated input of length T*s + 1.
        self.trim = self.stride
        assert kernel_size - 1 - stride >= 0, "causal deconv requires k > s"
        self.cpad = kernel_size - 1 - stride

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        first = x[:, :1, :]  # replication pad (train path)
        x = jnp.concatenate([first, x], axis=1)
        y = self._deconv(x, self.weight(params), self.cpad, self.cpad)
        if self.bias:
            y = y + params["b"].astype(y.dtype)
        return y

    def init_cache(self, batch: int, dtype=jnp.float32) -> jax.Array:
        return jnp.zeros((batch, self.pad_length, self.in_channels), dtype)

    def step(self, params: Params, cache: jax.Array, x: jax.Array):
        new_cache = x[:, x.shape[1] - self.pad_length :, :]
        x = jnp.concatenate([cache, x], axis=1)
        y = self._deconv(x, self.weight(params), self.cpad, self.cpad)
        if self.bias:
            y = y + params["b"].astype(y.dtype)
        return y, new_cache


class Conv2d:
    """2-D conv over (B, H, W, C) for the discriminator zoo (MPD / MRSD)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: tuple[int, int],
        stride: tuple[int, int] = (1, 1),
        padding: tuple[int, int] = (0, 0),
        bias: bool = True,
        weight_norm: bool = False,
        spectral_norm: bool = False,
    ):
        assert not (weight_norm and spectral_norm)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.bias = bias
        self.weight_norm = weight_norm
        self.spectral_norm = spectral_norm

    def _w_shape(self):
        kh, kw = self.kernel_size
        return (kh, kw, self.in_channels, self.out_channels)

    def init(self, key) -> Params:
        kw_, kb = _split(key, 2)
        fan_in = self.kernel_size[0] * self.kernel_size[1] * self.in_channels
        bound = _kaiming_uniform_bound(fan_in)
        w = jax.random.uniform(
            kw_, self._w_shape(), jnp.float32, minval=-bound, maxval=bound
        )
        p: Params = {}
        if self.weight_norm:
            g = jnp.sqrt(jnp.sum(jnp.square(w), axis=(0, 1, 2), keepdims=True))
            p["v"], p["g"] = w, g
        else:
            p["w"] = w
        if self.bias:
            p["b"] = jax.random.uniform(
                kb, (self.out_channels,), jnp.float32, minval=-bound, maxval=bound
            )
        return p

    def weight(self, params: Params) -> jax.Array:
        if self.weight_norm:
            return _norm_weight(params["v"], params["g"], (0, 1, 2))
        if self.spectral_norm:
            return _spectral_norm_weight(params["w"], 3)
        return params["w"]

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        y = lax.conv_general_dilated(
            x,
            self.weight(params).astype(x.dtype),
            window_strides=self.stride,
            padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.bias:
            y = y + params["b"].astype(y.dtype)
        return y
