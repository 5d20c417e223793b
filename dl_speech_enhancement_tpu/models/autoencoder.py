"""AudioDec symmetric codec — encoder / RVQ / decoder, PQC and without-PQC.

Re-designs the reference model family (models/autoencoder/AudioDec.py and
models/autoencoder_without_PQC/AudioDec.py) as pure-functional JAX modules:

- ``AudioDecGenerator(use_pqc=True)`` == the full symAD codec: causal conv
  encoder -> Projector -> ResidualVQ -> decoder (AudioDec.py:95-103).
- ``AudioDecGenerator(use_pqc=False)`` == the course's proposed denoiser: the
  projector/quantizer and the decoder input conv are removed, the decoder
  consumes the 512-ch encoder features directly
  (autoencoder_without_PQC/AudioDec.py:95-100, modules/decoder.py:117-119).

Streaming: every sub-layer exposes ``init_cache``/``step``; the generator
aggregates them into one cache pytree. The reference's split-phase streaming
API (``initial_encoder``/``encode``/``quantize``/``lookup``/``decode``,
AudioDec.py:151-191) maps to :meth:`prime`, :meth:`encode_step`,
:meth:`quantize`, :meth:`lookup`, :meth:`decode_step`.

TPU notes: activations are (B, T, C) so channels ride the 128-lane axis;
chunk steps are shape-static and jit once per chunk size; whole encode or
decode stacks run as a single fused XLA computation per chunk.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from dl_speech_enhancement_tpu.nn.conv import (
    CausalConv1d,
    CausalConvTranspose1d,
    Conv1d,
    Conv1d1x1,
    ConvTranspose1d,
)
from dl_speech_enhancement_tpu.nn.vq import Quantizer, VQState

Params = dict


def _split_dict(key, names):
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))


class ResidualUnit:
    """ELU -> dilated conv (k=7) -> ELU -> 1x1 conv, residual add.

    Reference models/autoencoder/modules/residual_unit.py:20-81 (causal and
    noncausal variants selected by ``mode``).
    """

    def __init__(self, channels: int, kernel_size: int = 7, dilation: int = 1,
                 bias: bool = False, mode: str = "causal"):
        if mode == "causal":
            self.conv1 = CausalConv1d(channels, channels, kernel_size,
                                      dilation=dilation, bias=bias)
        else:
            self.conv1 = Conv1d(channels, channels, kernel_size,
                                dilation=dilation, padding=-1, bias=bias)
        self.conv2 = Conv1d1x1(channels, channels, bias=bias)
        self.mode = mode

    def init(self, key) -> Params:
        k = _split_dict(key, ["conv1", "conv2"])
        return {"conv1": self.conv1.init(k["conv1"]), "conv2": self.conv2.init(k["conv2"])}

    def __call__(self, p: Params, x):
        y = self.conv1(p["conv1"], jax.nn.elu(x))
        y = self.conv2(p["conv2"], jax.nn.elu(y))
        return x + y

    def init_cache(self, batch):
        return {"conv1": self.conv1.init_cache(batch)}

    def step(self, p: Params, cache, x):
        y, c1 = self.conv1.step(p["conv1"], cache["conv1"], jax.nn.elu(x))
        y = self.conv2(p["conv2"], jax.nn.elu(y))
        return x + y, {"conv1": c1}


class EncoderBlock:
    """3 residual units (dilations 1,3,9) + strided downsampling conv
    (k = 2*stride). Reference modules/encoder.py:24-72."""

    def __init__(self, in_channels, out_channels, stride,
                 dilations=(1, 3, 9), bias=True, mode="causal"):
        self.res_units = [
            ResidualUnit(in_channels, dilation=d, mode=mode) for d in dilations
        ]
        if mode == "causal":
            self.conv = CausalConv1d(in_channels, out_channels, 2 * stride,
                                     stride=stride, bias=bias)
        else:
            self.conv = Conv1d(in_channels, out_channels, 2 * stride,
                               stride=stride, padding=-1, bias=bias)

    def init(self, key) -> Params:
        keys = jax.random.split(key, len(self.res_units) + 1)
        return {
            "res": [u.init(k) for u, k in zip(self.res_units, keys[:-1])],
            "conv": self.conv.init(keys[-1]),
        }

    def __call__(self, p, x):
        for u, up in zip(self.res_units, p["res"]):
            x = u(up, x)
        return self.conv(p["conv"], x)

    def init_cache(self, batch):
        return {
            "res": [u.init_cache(batch) for u in self.res_units],
            "conv": self.conv.init_cache(batch),
        }

    def step(self, p, cache, x):
        new_res = []
        for u, up, uc in zip(self.res_units, p["res"], cache["res"]):
            x, c = u.step(up, uc, x)
            new_res.append(c)
        x, cc = self.conv.step(p["conv"], cache["conv"], x)
        return x, {"res": new_res, "conv": cc}


class Encoder:
    """Input conv (k=7) + downsampling blocks. Reference modules/encoder.py:75-123."""

    def __init__(self, input_channels=1, encode_channels=32,
                 channel_ratios=(2, 4, 8, 16), strides=(3, 4, 5, 5),
                 kernel_size=7, bias=True, mode="causal", remat=False):
        assert len(channel_ratios) == len(strides)
        conv_cls = CausalConv1d if mode == "causal" else Conv1d
        self.conv = conv_cls(input_channels, encode_channels, kernel_size, bias=False)
        self.remat = remat
        self.blocks = []
        in_ch = encode_channels
        for ratio, stride in zip(channel_ratios, strides):
            out_ch = encode_channels * ratio
            self.blocks.append(EncoderBlock(in_ch, out_ch, stride, bias=bias, mode=mode))
            in_ch = out_ch
        self.out_channels = in_ch
        self.hop = 1
        for s in strides:
            self.hop *= s

    def init(self, key) -> Params:
        keys = jax.random.split(key, len(self.blocks) + 1)
        return {
            "conv": self.conv.init(keys[0]),
            "blocks": [b.init(k) for b, k in zip(self.blocks, keys[1:])],
        }

    def __call__(self, p, x):
        x = self.conv(p["conv"], x)
        for b, bp in zip(self.blocks, p["blocks"]):
            # remat: store only the block-boundary activations and recompute
            # the ~16 intra-block intermediates in the backward pass —
            # required to fit large-batch (>=64 x 1 s) training in 16 GB HBM
            x = jax.checkpoint(b.__call__)(bp, x) if self.remat else b(bp, x)
        return x

    def init_cache(self, batch):
        return {
            "conv": self.conv.init_cache(batch),
            "blocks": [b.init_cache(batch) for b in self.blocks],
        }

    def step(self, p, cache, x):
        x, cc = self.conv.step(p["conv"], cache["conv"], x)
        new_blocks = []
        for b, bp, bc in zip(self.blocks, p["blocks"], cache["blocks"]):
            x, c = b.step(bp, bc, x)
            new_blocks.append(c)
        return x, {"conv": cc, "blocks": new_blocks}


class DecoderBlock:
    """Transposed-conv upsample + 3 residual units. Reference modules/decoder.py:24-72."""

    def __init__(self, in_channels, out_channels, stride,
                 dilations=(1, 3, 9), bias=True, mode="causal"):
        if mode == "causal":
            self.conv = CausalConvTranspose1d(in_channels, out_channels,
                                              2 * stride, stride, bias=bias)
        else:
            self.conv = ConvTranspose1d(in_channels, out_channels, 2 * stride,
                                        stride, padding=-1, output_padding=-1,
                                        bias=bias)
        self.res_units = [
            ResidualUnit(out_channels, dilation=d, mode=mode) for d in dilations
        ]

    def init(self, key) -> Params:
        keys = jax.random.split(key, len(self.res_units) + 1)
        return {
            "conv": self.conv.init(keys[0]),
            "res": [u.init(k) for u, k in zip(self.res_units, keys[1:])],
        }

    def __call__(self, p, x):
        x = self.conv(p["conv"], x)
        for u, up in zip(self.res_units, p["res"]):
            x = u(up, x)
        return x

    def init_cache(self, batch):
        return {
            "conv": self.conv.init_cache(batch),
            "res": [u.init_cache(batch) for u in self.res_units],
        }

    def step(self, p, cache, x):
        x, cc = self.conv.step(p["conv"], cache["conv"], x)
        new_res = []
        for u, up, uc in zip(self.res_units, p["res"], cache["res"]):
            x, c = u.step(up, uc, x)
            new_res.append(c)
        return x, {"conv": cc, "res": new_res}


class Decoder:
    """Input conv + upsampling blocks + output conv.

    ``use_input_conv=False`` reproduces the without-PQC variant where conv1 is
    bypassed and the decoder consumes encoder features directly
    (autoencoder_without_PQC/modules/decoder.py:117-119).
    Reference modules/decoder.py:75-129.
    """

    def __init__(self, code_dim=64, output_channels=1, decode_channels=32,
                 channel_ratios=(16, 8, 4, 2), strides=(5, 5, 4, 3),
                 kernel_size=7, bias=True, mode="causal", use_input_conv=True,
                 remat=False):
        assert len(channel_ratios) == len(strides)
        conv_cls = CausalConv1d if mode == "causal" else Conv1d
        self.use_input_conv = use_input_conv
        self.remat = remat
        if use_input_conv:
            self.conv1 = conv_cls(code_dim, decode_channels * channel_ratios[0],
                                  kernel_size, bias=False)
        self.blocks = []
        for i, stride in enumerate(strides):
            in_ch = decode_channels * channel_ratios[i]
            out_ch = (decode_channels * channel_ratios[i + 1]
                      if i < len(channel_ratios) - 1 else decode_channels)
            self.blocks.append(DecoderBlock(in_ch, out_ch, stride, bias=bias, mode=mode))
        self.conv2 = conv_cls(out_ch, output_channels, kernel_size, bias=False)

    def init(self, key) -> Params:
        keys = jax.random.split(key, len(self.blocks) + 2)
        p: Params = {
            "blocks": [b.init(k) for b, k in zip(self.blocks, keys[1:-1])],
            "conv2": self.conv2.init(keys[-1]),
        }
        if self.use_input_conv:
            p["conv1"] = self.conv1.init(keys[0])
        return p

    def __call__(self, p, z):
        x = self.conv1(p["conv1"], z) if self.use_input_conv else z
        for b, bp in zip(self.blocks, p["blocks"]):
            # see Encoder.__call__: trade recompute for activation memory
            x = jax.checkpoint(b.__call__)(bp, x) if self.remat else b(bp, x)
        return self.conv2(p["conv2"], x)

    def init_cache(self, batch):
        cache = {
            "blocks": [b.init_cache(batch) for b in self.blocks],
            "conv2": self.conv2.init_cache(batch),
        }
        if self.use_input_conv:
            cache["conv1"] = self.conv1.init_cache(batch)
        return cache

    def step(self, p, cache, z):
        new = {}
        if self.use_input_conv:
            x, new["conv1"] = self.conv1.step(p["conv1"], cache["conv1"], z)
        else:
            x = z
        new_blocks = []
        for b, bp, bc in zip(self.blocks, p["blocks"], cache["blocks"]):
            x, c = b.step(bp, bc, x)
            new_blocks.append(c)
        new["blocks"] = new_blocks
        x, new["conv2"] = self.conv2.step(p["conv2"], cache["conv2"], x)
        return x, new


class Projector:
    """Causal conv (k=3) 512 -> code_dim. Reference modules/projector.py:20-54."""

    def __init__(self, input_channels, code_dim, kernel_size=3, stride=1,
                 bias=False, mode="causal"):
        conv_cls = CausalConv1d if mode == "causal" else Conv1d
        self.conv = conv_cls(input_channels, code_dim, kernel_size,
                             stride=stride, bias=bias)

    def init(self, key) -> Params:
        return {"conv": self.conv.init(key)}

    def __call__(self, p, x):
        return self.conv(p["conv"], x)

    def init_cache(self, batch):
        return {"conv": self.conv.init_cache(batch)}

    def step(self, p, cache, x):
        y, c = self.conv.step(p["conv"], cache["conv"], x)
        return y, {"conv": c}


class AudioDecGenerator:
    """The symmetric AudioDec generator, PQC (codec) or plain (denoiser).

    ``__call__`` returns ``(y, zq, z, vqloss, perplexity, new_vq_state)`` —
    the reference tuple (AudioDec.py:95-103) plus the functionalized VQ EMA
    state. For ``use_pqc=False`` the VQ outputs are zeros and the state is
    empty (autoencoder_without_PQC/AudioDec.py:95-100 returns the same tuple
    shape with dummy loss/perplexity).
    """

    def __init__(self, input_channels=1, output_channels=1, encode_channels=32,
                 decode_channels=32, code_dim=64, codebook_num=8,
                 codebook_size=1024, bias=True,
                 enc_ratios=(2, 4, 8, 16), dec_ratios=(16, 8, 4, 2),
                 enc_strides=(3, 4, 5, 5), dec_strides=(5, 5, 4, 3),
                 mode="causal", codec="audiodec", projector="conv1d",
                 quantier="residual_vq", use_pqc=True, remat=False):
        if codec != "audiodec":
            raise NotImplementedError(f"Codec ({codec}) is not supported!")
        if projector not in ("conv1d",):
            raise NotImplementedError(f"Projector ({projector}) is not supported!")
        if quantier != "residual_vq":
            raise NotImplementedError(f"Quantizer ({quantier}) is not supported!")
        self.mode = mode
        self.use_pqc = use_pqc
        self.input_channels = input_channels
        self.codebook_num = codebook_num
        self.encoder = Encoder(input_channels, encode_channels, enc_ratios,
                               enc_strides, 7, bias, mode, remat=remat)
        self.decoder = Decoder(code_dim, output_channels, decode_channels,
                               dec_ratios, dec_strides, 7, bias, mode,
                               use_input_conv=use_pqc, remat=remat)
        if use_pqc:
            self.projector = Projector(self.encoder.out_channels, code_dim,
                                       3, 1, False, mode)
            self.quantizer = Quantizer(code_dim, codebook_num, codebook_size)
        # Encoder total hop (samples per code frame); 300 for the vctk config.
        self.hop = self.encoder.hop
        # Streaming receptive length in samples (used to prime caches).
        self.receptive_length = self._derive_receptive_length()

    def _derive_receptive_length(self) -> int:
        """Exact tx receptive field in input samples for ONE code frame,
        walked backwards through projector + encoder with
        ``R_in = (R_out - 1) * stride + (kernel - 1) * dilation + 1``.

        Reproduces the reference's per-model constants from the architecture
        instead of hardcoding them: 7209 for symAD_vctk_48000_hop300
        (comment at reference utils/audiodec.py:23) and 6609 for the
        without-PQC denoiser (no projector).
        """
        r = 1
        if self.use_pqc:
            c = self.projector.conv
            r = (r - 1) * c.stride + (c.kernel_size - 1) * c.dilation + 1
        for blk in reversed(self.encoder.blocks):
            c = blk.conv
            r = (r - 1) * c.stride + (c.kernel_size - 1) * c.dilation + 1
            for u in reversed(blk.res_units):
                r += (u.conv1.kernel_size - 1) * u.conv1.dilation
        c = self.encoder.conv
        r += (c.kernel_size - 1) * c.dilation
        return r

    # ---------------- parameters ----------------

    def init(self, key):
        names = ["encoder", "decoder", "projector", "quantizer"]
        keys = _split_dict(key, names)
        params: Params = {
            "encoder": self.encoder.init(keys["encoder"]),
            "decoder": self.decoder.init(keys["decoder"]),
        }
        vq_state = None
        if self.use_pqc:
            params["projector"] = self.projector.init(keys["projector"])
            vq_state = self.quantizer.init(keys["quantizer"])
        return params, vq_state

    # ---------------- parallel (training) path ----------------

    def __call__(self, params, vq_state, x, train: bool = True, axis_name=None):
        """x: (B, T, C_in). Returns (y, zq, z, vqloss, ppl, new_vq_state)."""
        if x.shape[-1] != self.input_channels:
            x = x.reshape(x.shape[0], -1, self.input_channels)
        e = self.encoder(params["encoder"], x)
        if self.use_pqc:
            z = self.projector(params["projector"], e)
            zq, new_state, vqloss, ppl = self.quantizer(
                vq_state, z, train=train, axis_name=axis_name
            )
        else:
            z = e
            zq = e
            new_state = vq_state
            vqloss = jnp.zeros((self.codebook_num,), x.dtype)
            ppl = jnp.zeros((self.codebook_num,), x.dtype)
        y = self.decoder(params["decoder"], zq)
        return y, zq, z, vqloss, ppl, new_state

    # ---------------- streaming path ----------------

    def init_cache(self, batch: int):
        cache = {
            "encoder": self.encoder.init_cache(batch),
            "decoder": self.decoder.init_cache(batch),
        }
        if self.use_pqc:
            cache["projector"] = self.projector.init_cache(batch)
        return cache

    def encode_step(self, params, cache, x):
        """Streaming encode of one chunk -> (z, new_cache_parts)."""
        if x.shape[-1] != self.input_channels:
            x = x.reshape(x.shape[0], -1, self.input_channels)
        e, enc_c = self.encoder.step(params["encoder"], cache["encoder"], x)
        if self.use_pqc:
            z, proj_c = self.projector.step(params["projector"], cache["projector"], e)
            return z, {"encoder": enc_c, "projector": proj_c}
        return e, {"encoder": enc_c}

    def quantize(self, vq_state: VQState, z):
        """z -> flattened tx indices (AudioDec.py:172-174)."""
        _, idx = self.quantizer.encode(vq_state, z)
        return idx

    def flat_codebook(self, vq_state: VQState):
        return self.quantizer.rvq.flat_codebook(vq_state)

    def lookup(self, flat_codebook, idx):
        return self.quantizer.decode(flat_codebook, idx)

    def decode_step(self, params, cache, zq):
        y, dec_c = self.decoder.step(params["decoder"], cache["decoder"], zq)
        return y, {"decoder": dec_c}

    def prime(self, params, vq_state, batch: int = 1, receptive_length=None):
        """Prime all caches with zeros (reference initial_encoder/initial_decoder,
        AudioDec.py:151-160). Returns a warmed-up cache pytree."""
        rl = receptive_length or self.receptive_length
        # round UP to a whole number of code frames (the chunk step needs
        # hop-aligned input; 7209 -> 7500, matching the reference's
        # hardcoded priming length at utils/audiodec.py:24)
        rl = -(-rl // self.hop) * self.hop
        cache = self.init_cache(batch)
        zeros = jnp.zeros((batch, rl, self.input_channels), jnp.float32)
        z, enc_cache = self.encode_step(params, cache, zeros)
        cache.update(enc_cache)
        if self.use_pqc:
            idx = self.quantize(vq_state, z)
            zq = self.lookup(self.flat_codebook(vq_state), idx)
        else:
            zq = z
        _, dec_cache = self.decode_step(params, cache, zq)
        cache.update(dec_cache)
        return cache
