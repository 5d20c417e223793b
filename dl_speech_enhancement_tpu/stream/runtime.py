"""Chunked streaming runtime — the real-time tx/rx path.

Re-designs the reference streaming stack (bin/stream.py:23-365 +
utils/audiodec.py:32-103) TPU-first:

- The per-layer mutable ``pad_buffer`` state becomes one cache pytree carried
  through a **single jitted chunk step per side**: the whole
  encode->quantize chain (tx) and lookup->decode chain (rx) each compile to
  one XLA program, so a 25 ms frame costs one device dispatch, not dozens.
- The int32 code indices are the wire format crossing the tx->rx boundary
  (utils/audiodec.py:96-103), exactly as upstream.
- **Multi-stream batching**: the cache pytree has a leading batch dim, so one
  chip serves B concurrent streams at almost the cost of one (the
  streams/chip headline metric).
- The host loop keeps the reference's thread/queue architecture
  (encoder/decoder daemon threads + 3 queues, latency tracking with
  queue-flush frame dropping, underflow zeros — bin/stream.py:184-310).
  Audio hardware I/O (sounddevice) is optional; a file/array-driven mode
  covers tests and benchmarks.
"""

from __future__ import annotations

import logging
import queue
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class StreamingTransmitter:
    """Tx side: audio chunk -> flattened code indices (one jitted step).

    ``device`` places this endpoint's weights, cache and compute on a
    specific device (the reference's ``tx_device``, bin/stream.py:26-35);
    default is the process default device. Code indices produced here are
    the wire format — a paired receiver on another device pulls them across.
    """

    def __init__(self, gen, params, vq_state, batch: int = 1, device=None):
        self.gen = gen
        self.device = device
        # Pin weights/codebooks on device once — checkpoint restores hand
        # back numpy arrays, and passing those to a jitted step would
        # re-upload every parameter on every frame (catastrophic through a
        # tunneled chip: ~400 ms/frame observed).
        self.params = jax.device_put(params, device)
        self.vq_state = (jax.device_put(vq_state, device)
                         if vq_state is not None else None)
        self.batch = batch
        self.use_pqc = gen.use_pqc

        def _step(params, vq_state, cache, chunk):
            z, new_cache = gen.encode_step(params, cache, chunk)
            if self.use_pqc:
                idx = gen.quantize(vq_state, z)
                return idx, new_cache
            return z, new_cache

        # execution device follows the committed params/cache placement
        self._step = jax.jit(_step)
        self.reset_buffer()

    def reset_buffer(self):
        self.cache = jax.device_put(
            {
                k: v for k, v in self.gen.init_cache(self.batch).items()
                if k in ("encoder", "projector")
            },
            self.device,
        )

    def initial_encoder(self, receptive_length: int):
        """Prime caches with a zero receptive field (AudioDec.py:151-157).
        Returns the priming output (codes) like the reference."""
        # hop-aligned, rounded UP so the full receptive field is covered
        rl = -(-receptive_length // self.gen.hop) * self.gen.hop
        zeros = jnp.zeros((self.batch, rl, self.gen.input_channels), jnp.float32)
        out = self.encode(zeros)
        return out

    def encode(self, chunk) -> jax.Array:
        out, new_cache = self._step(self.params, self.vq_state, self.cache, chunk)
        self.cache.update(new_cache)
        return out


class StreamingReceiver:
    """Rx side: code indices -> audio chunk (one jitted step).

    ``device`` places this endpoint on a specific device (the reference's
    ``rx_device``); int32 code indices arriving from a transmitter on a
    different device are re-committed here before decode (the tx->rx wire).
    """

    def __init__(self, gen, params, vq_state, batch: int = 1, device=None):
        self.gen = gen
        self.device = device
        self.params = jax.device_put(params, device)  # see StreamingTransmitter
        self.batch = batch
        self.use_pqc = gen.use_pqc
        self.flat_cb = (jax.device_put(gen.flat_codebook(jax.device_put(vq_state)),
                                       device)
                        if self.use_pqc else None)

        def _step(params, flat_cb, cache, idx):
            zq = gen.lookup(flat_cb, idx) if self.use_pqc else idx
            y, new_cache = gen.decode_step(params, cache, zq)
            return y, new_cache

        self._step = jax.jit(_step)
        self.reset_buffer()

    def reset_buffer(self):
        self.cache = jax.device_put(
            {"decoder": self.gen.init_cache(self.batch)["decoder"]}, self.device
        )

    def initial_decoder(self, idx):
        return self.decode(idx)

    def decode(self, idx) -> jax.Array:
        if self.device is not None:
            idx = jax.device_put(idx, self.device)  # tx -> rx device transfer
        y, new_cache = self._step(self.params, self.flat_cb, self.cache, idx)
        self.cache.update(new_cache)
        return y


class VocoderReceiver:
    """Rx side backed by a HiFiGAN/UnivNet vocoder generator: code indices ->
    codebook lookup -> vocoder streaming decode (the reference's v0-v3
    presets pair a symAD analyzer tx with a vocoder rx,
    utils/audiodec.py:96-103 + models/vocoder/HiFiGAN.py:268-296)."""

    def __init__(self, codec_gen, vocoder, vocoder_params, vq_state,
                 batch: int = 1, device=None, backend: str = "xla",
                 weight_dtype=None, seg_budget_bytes: int = 9_000_000,
                 interpret: bool = False):
        """``backend='pallas'`` (or 'auto' -> pallas on TPU) runs decode
        through the fused segment pipeline (ops/vocoder_kernel.py) with the
        codebook lookup in-kernel — single stream on the default device
        only; ``batch > 1`` routes through the stacked batched vocoder
        kernel (ops/vocoder_stacked.py, v1 MultiGroupConv1d family, B
        streams stacked along sublanes). Other cases (and topologies the
        kernels can't assemble — the AssertionError fallback) use the
        jitted XLA step.  The fused/stacked caches are chunk-size-agnostic
        ``(ctx, lanes)`` / ``(B*ctx, lanes)`` tails, so the long priming
        call and the steady-state frames compile separately but share one
        cache. Measured guidance (docs/SCALING.md): the single-stream
        pipeline beats XLA ~7x; the stacked kernel is a completeness
        surface — at B=4 it measures ~95 us/stream-frame vs the XLA batch
        path, so 'auto' on TPU is only flipped for batch == 1."""
        self.codec_gen = codec_gen
        self.vocoder = vocoder
        self.device = device
        self.params = jax.device_put(vocoder_params, device)
        self.batch = batch
        self.use_pqc = codec_gen.use_pqc
        vq_state = jax.device_put(vq_state) if self.use_pqc else None
        self._vq_embed = vq_state.embed if self.use_pqc else None
        self.flat_cb = (jax.device_put(codec_gen.flat_codebook(vq_state),
                                       device)
                        if self.use_pqc else None)
        if backend == "auto":
            backend = ("pallas" if jax.default_backend() not in ("cpu",)
                       else "xla")
        self._fused_ok = backend == "pallas" and batch == 1 and device is None
        self._fused_runs = {}  # T_codes -> jitted run
        self._fused_init = None
        self._stacked_ok = backend == "pallas" and batch > 1 and device is None
        self._stacked_runs = {}  # T_codes -> jitted run
        self._stacked_init = None
        self._weight_dtype = weight_dtype
        self._seg_budget = seg_budget_bytes
        self._interpret = interpret

        def _step(params, flat_cb, cache, idx):
            zq = codec_gen.lookup(flat_cb, idx) if self.use_pqc else idx
            return vocoder.step(params, cache, zq)

        self._step = jax.jit(_step)
        self.reset_buffer()

    def reset_buffer(self):
        self.cache = jax.device_put(self.vocoder.init_cache(self.batch),
                                    self.device)
        if self._fused_init is not None:
            self._fused_cache = self._fused_init()
        if self._stacked_init is not None:
            self._stacked_cache = self._stacked_init()

    def initial_decoder(self, idx):
        return self.decode(idx)

    def _get_stacked(self, t_codes: int):
        run = self._stacked_runs.get(t_codes)
        if run is None:
            from dl_speech_enhancement_tpu.ops.vocoder_stacked import (
                make_stacked_vocoder,
            )
            kw = ({} if self._weight_dtype is None
                  else {"weight_dtype": self._weight_dtype})
            init, run = make_stacked_vocoder(
                self.vocoder, self.params,
                chunk=t_codes * self.vocoder.total_upsample,
                batch=self.batch, vq_embed=self._vq_embed,
                interpret=self._interpret, **kw)
            run = jax.jit(run)
            if self._stacked_init is None:
                self._stacked_init = init
                self._stacked_cache = init()
            self._stacked_runs[t_codes] = run
        return run

    def _get_fused(self, t_codes: int):
        run = self._fused_runs.get(t_codes)
        if run is None:
            from dl_speech_enhancement_tpu.ops.vocoder_kernel import (
                make_mega_vocoder,
            )
            kw = ({} if self._weight_dtype is None
                  else {"weight_dtype": self._weight_dtype})
            init, run = make_mega_vocoder(
                self.vocoder, self.params,
                chunk=t_codes * self.vocoder.total_upsample,
                vq_embed=self._vq_embed, interpret=self._interpret,
                seg_budget_bytes=self._seg_budget, **kw)
            run = jax.jit(run)
            if self._fused_init is None:
                self._fused_init = init
                self._fused_cache = init()
            self._fused_runs[t_codes] = run
        return run

    def decode(self, idx) -> jax.Array:
        if self.device is not None:
            idx = jax.device_put(idx, self.device)  # tx -> rx device transfer
        if self._fused_ok:
            # wire idx (L, 1, T) -> (1, T, L); raw features stay (1, T, D)
            arr = jnp.transpose(idx, (1, 2, 0)) if self.use_pqc else idx
            try:
                run = self._get_fused(arr.shape[1])
            except AssertionError:  # topology the kernel doesn't cover
                self._fused_ok = False
            else:
                y, self._fused_cache = run(self._fused_cache, arr)
                return y[:, :, None]
        if self._stacked_ok:
            # wire idx (L, B, T) -> (B, T, L); raw features stay (B, T, D);
            # the stacked run consumes one N=1 frame block (N, B, T, .)
            arr = jnp.transpose(idx, (1, 2, 0)) if self.use_pqc else idx
            try:
                run = self._get_stacked(arr.shape[1])
            except AssertionError:  # topology the kernel doesn't cover
                self._stacked_ok = False
            else:
                y, self._stacked_cache = run(self._stacked_cache, arr[None])
                return y[0][:, :, None]
        y, new_cache = self._step(self.params, self.flat_cb, self.cache, idx)
        self.cache = new_cache
        return y


def resolve_scan_backend(backend: str, *, on_accelerator: bool, batch: int,
                         use_pqc: bool) -> str:
    """Resolve ``make_scan_stream``'s ``backend='auto'`` to a concrete path.

    Policy, from the on-chip A/Bs (docs/SCALING.md "Stacked-region batched
    kernels" + bench legs ``stacked_16`` / ``stacked_pqc_16``):

    - batch == 1 on an accelerator -> ``'pallas'`` (whole-stack mega
      kernel, ~3.5x the XLA scan single-stream; covers PQC too).
    - batch > 1 -> ``'xla'`` for BOTH codecs: XLA batching wins every
      controlled point. Without-PQC: stacked 21.4 us/stream-frame at
      B=16 vs XLA 12.9 (B=16) / 5.6 (B=128). PQC (symAD): the round-5
      control arm measured XLA batched at 16.4 us/stream-frame vs
      stacked 22.8 at B=16 — reversing round 4's 14.4 us stacked
      reading, which did not reproduce under the single-compile
      RTT-subtracted methodology (the old two-point fit overstated the
      stacked arm). ``use_pqc`` stays a parameter so a future win can
      flip one branch, and explicit ``'pallas'`` still reaches the
      stacked kernel for study.

    Explicit ``'pallas'``/``'xla'`` requests are honored unchanged.
    """
    if backend != "auto":
        return backend
    if not on_accelerator:
        return "xla"
    if batch > 1:
        return "xla"
    return "pallas"


def make_scan_stream(gen, params, vq_state=None, batch: int = 1,
                     backend: str = "auto", frame_size: int | None = None,
                     interpret: bool = False, weight_dtype=None):
    """On-device multi-frame streaming: ``f(cache, frames (N, B, F, C)) ->
    (audio (N, B, F', C), cache)`` as one jitted ``lax.scan`` dispatch.

    Exact chunked-streaming semantics (same cache math as the frame-by-frame
    runtime) but amortizes host<->device round trips over N frames — use for
    offline evaluation with streaming semantics and for RTF measurement.

    ``backend='pallas'`` (or 'auto' on TPU) uses hand-fused kernels for the
    single-stream case; other cases fall back to the XLA step. When
    ``frame_size`` is given (the kernel needs the static chunk length at
    assembly time) the whole-stack mega kernel (ops/mega_kernel.py) runs
    the encoder and decoder as ONE Pallas kernel each with weights resident
    in VMEM across frames — ~22 us/frame on v5e vs 77 us XLA (~3.5x) — and
    covers the PQC codec too (in-kernel projector + residual-VQ wire
    indices + lookup); without it, the per-frame fused residual-chain
    kernels (ops/stream_kernel.py) still give ~1.2-1.7x over XLA for the
    without-PQC case. For ``batch > 1`` with ``frame_size``,
    ``backend='pallas'`` uses the stacked-region batched mega kernel
    (ops/mega_stacked.py — B streams stacked along the sublane axis,
    VMEM-packed segment pipeline); ``'auto'`` keeps the XLA scan for
    batch > 1 — XLA batching wins the controlled A/B for BOTH codecs
    (see ``resolve_scan_backend`` for the measured points).

    ``weight_dtype`` is forwarded to the mega kernel (default bf16 —
    halves VMEM weight residency). For a PQC transmitter that must emit
    bit-identical wire codes to an XLA peer, pass ``jnp.float32`` (see
    make_mega_stream's docstring on near-tie codeword assignment).

    PQC wire-code access: when the returned callable is a fused PQC
    route (mega batch=1 or stacked batch>1), it carries a
    ``run_with_codes(cache, frames) -> (audio, cache, codes)`` attribute
    returning the int32 flattened wire indices the kernel computed in
    the same dispatch (``(N, T_code, n_books)`` for batch=1,
    ``(N, B, T_code, n_books)`` for batch>1) — use it for transmitters
    that must emit the bitstream (reference utils/audiodec.py:96-103).
    """
    backend = resolve_scan_backend(
        backend, on_accelerator=jax.default_backend() not in ("cpu",),
        batch=batch, use_pqc=gen.use_pqc)
    if backend == "pallas" and batch == 1:
        if frame_size is not None:
            try:
                from dl_speech_enhancement_tpu.ops.mega_kernel import (
                    make_mega_stream,
                )
                mega_kw = ({} if weight_dtype is None
                           else {"weight_dtype": weight_dtype})
                init_mega, mega_run = make_mega_stream(
                    gen, jax.device_put(params), chunk=frame_size,
                    interpret=interpret,
                    vq_state=(jax.device_put(vq_state)
                              if gen.use_pqc else None),
                    **mega_kw,
                )
            except AssertionError:  # topology the kernel doesn't cover
                init_mega = None
            if init_mega is not None:
                if gen.use_pqc:
                    @jax.jit
                    def run_mega(cache, frames):
                        out, new_cache, _codes = mega_run(
                            cache, frames[:, 0, :, 0])
                        return out[:, None, :, None], new_cache

                    # PQC transmitters need the wire bitstream the kernel
                    # just computed (ADVICE r4): same dispatch, three
                    # returns — codes (N, T_code, n_books) int32
                    @jax.jit
                    def run_mega_codes(cache, frames):
                        out, new_cache, codes = mega_run(
                            cache, frames[:, 0, :, 0])
                        return out[:, None, :, None], new_cache, codes

                    run_mega.run_with_codes = run_mega_codes
                else:
                    @jax.jit
                    def run_mega(cache, frames):
                        out, new_cache = mega_run(cache, frames[:, 0, :, 0])
                        return out[:, None, :, None], new_cache

                run_mega.init_cache = init_mega
                return run_mega
    if backend == "pallas" and batch > 1 and frame_size is not None:
        # multi-stream: the stacked-region batched mega kernel
        # (ops/mega_stacked.py) — B streams stacked along sublanes, one
        # VMEM-packed segment pipeline. Explicit 'pallas' only: 'auto'
        # keeps XLA for batch > 1, which wins the controlled A/B for both
        # codecs (resolve_scan_backend / docs/SCALING.md).
        try:
            from dl_speech_enhancement_tpu.ops.mega_stacked import (
                make_mega_stream_stacked,
            )
            stk_kw = ({} if weight_dtype is None
                      else {"weight_dtype": weight_dtype})
            init_stk, stk_run = make_mega_stream_stacked(
                gen, jax.device_put(params), chunk=frame_size, batch=batch,
                interpret=interpret,
                vq_state=(jax.device_put(vq_state) if gen.use_pqc
                          else None), **stk_kw)
        except AssertionError:  # topology the kernel doesn't cover
            init_stk = None
        if init_stk is not None:
            if gen.use_pqc:
                @jax.jit
                def run_stacked(cache, frames):
                    out, new_cache, _codes = stk_run(cache,
                                                     frames[:, :, :, 0])
                    return out[:, :, :, None], new_cache

                # wire-code access for batched PQC transmitters (ADVICE
                # r4): codes (N, B, T_code, n_books) int32
                @jax.jit
                def run_stacked_codes(cache, frames):
                    out, new_cache, codes = stk_run(cache,
                                                    frames[:, :, :, 0])
                    return out[:, :, :, None], new_cache, codes

                run_stacked.run_with_codes = run_stacked_codes
            else:
                @jax.jit
                def run_stacked(cache, frames):
                    out, new_cache = stk_run(cache, frames[:, :, :, 0])
                    return out[:, :, :, None], new_cache

            run_stacked.init_cache = init_stk
            return run_stacked
    if backend == "pallas" and not gen.use_pqc and batch == 1:
        from dl_speech_enhancement_tpu.ops.stream_kernel import (
            make_fused_chunk_step,
        )
        init_fused, fstep = make_fused_chunk_step(gen, jax.device_put(params),
                                           interpret=interpret)

        def step_fused(cache, frame):
            y, new_cache = fstep(cache, frame[0])
            return new_cache, y[None]

        @jax.jit
        def run_fused(cache, frames):
            cache, ys = jax.lax.scan(step_fused, cache, frames)
            return ys, cache

        run_fused.init_cache = init_fused
        return run_fused

    params = jax.device_put(params)
    if vq_state is not None:
        vq_state = jax.device_put(vq_state)
        flat_cb = jax.device_put(gen.flat_codebook(vq_state))
    else:
        flat_cb = None

    def step(cache, frame):
        z, enc_cache = gen.encode_step(params, cache, frame)
        if gen.use_pqc:
            idx = gen.quantize(vq_state, z)
            zq = gen.lookup(flat_cb, idx)
        else:
            zq = z
        y, dec_cache = gen.decode_step(params, cache, zq)
        new_cache = dict(cache)
        new_cache.update(enc_cache)
        new_cache.update(dec_cache)
        return new_cache, y

    @jax.jit
    def run(cache, frames):
        cache, ys = jax.lax.scan(step, cache, frames)
        return ys, cache

    def init_cache():
        return gen.init_cache(batch)

    run.init_cache = init_cache
    return run


def make_vocoder_scan_stream(codec_gen, codec_params, vq_state, voc,
                             voc_params, frame_size: int, backend: str = "auto",
                             interpret: bool = False, weight_dtype=None,
                             seg_budget_bytes: int = 9_000_000):
    """On-device multi-frame streaming of a full vocoder-paired preset
    (the reference's v0-v3: symAD analyzer tx -> wire codes -> HiFiGAN
    vocoder rx, utils/audiodec.py:96-103): ``f(cache, frames
    (N, frame_size)) -> (audio (N, frame_size * up // hop), cache)`` as one
    jitted dispatch.

    ``backend='pallas'`` (or 'auto' on TPU) runs the analyzer through the
    PQC mega kernel (ops/mega_kernel.py) and the vocoder through the fused
    segment pipeline (ops/vocoder_kernel.py) with the codebook lookup
    in-kernel — the int32 wire codes are the only hand-off.  Topologies a
    kernel can't assemble fall back to the XLA per-frame steps.

    ``weight_dtype`` is forwarded to both kernels (default bf16; pass
    ``jnp.float32`` for bit-exact wire parity with an XLA transmitter, see
    make_mega_stream's docstring)."""
    assert frame_size % codec_gen.hop == 0
    z_rows = frame_size // codec_gen.hop
    use_pqc = codec_gen.use_pqc
    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    if backend == "pallas":
        try:
            from dl_speech_enhancement_tpu.ops.mega_kernel import (
                make_mega_stream,
            )
            from dl_speech_enhancement_tpu.ops.vocoder_kernel import (
                make_mega_vocoder,
            )
            mega_kw = ({} if weight_dtype is None
                       else {"weight_dtype": weight_dtype})
            enc_init, enc_run = make_mega_stream(
                codec_gen, jax.device_put(codec_params), chunk=frame_size,
                interpret=interpret,
                vq_state=(jax.device_put(vq_state) if use_pqc else None),
                **mega_kw,
            )
            rx_init, rx_run = make_mega_vocoder(
                voc, jax.device_put(voc_params), frame_size,
                interpret=interpret,
                vq_embed=(jax.device_put(vq_state.embed) if use_pqc else None),
                seg_budget_bytes=seg_budget_bytes, **mega_kw,
            )
        except AssertionError:  # topology a kernel doesn't cover
            enc_init = None
        if enc_init is not None:
            if use_pqc:
                @jax.jit
                def run_fused(cache, frames):
                    _, enc_new, codes = enc_run(cache["enc"], frames)
                    y, rx_new = rx_run(cache["rx"], codes)
                    return y, {"enc": enc_new, "rx": rx_new}
            else:
                @jax.jit
                def run_fused(cache, frames):
                    z, enc_new = enc_run(cache["enc"], frames)
                    y, rx_new = rx_run(cache["rx"], z)
                    return y, {"enc": enc_new, "rx": rx_new}

            def init_fused():
                return {"enc": enc_init(), "rx": rx_init()}

            run_fused.init_cache = init_fused
            return run_fused

    codec_params = jax.device_put(codec_params)
    voc_params = jax.device_put(voc_params)
    if use_pqc:
        vq_state = jax.device_put(vq_state)
        flat_cb = jax.device_put(codec_gen.flat_codebook(vq_state))

    def step(cache, frame):
        x = frame[None, :, None]
        z, enc_cache = codec_gen.encode_step(codec_params, cache["codec"], x)
        if use_pqc:
            idx = codec_gen.quantize(vq_state, z)
            zq = codec_gen.lookup(flat_cb, idx)
        else:
            zq = z
        y, voc_cache = voc.step(voc_params, cache["voc"], zq)
        new_codec = dict(cache["codec"])
        new_codec.update(enc_cache)
        return {"codec": new_codec, "voc": voc_cache}, y[0, :, 0]

    @jax.jit
    def run(cache, frames):
        cache, ys = jax.lax.scan(step, cache, frames)
        return ys, cache

    def init_cache():
        return {"codec": codec_gen.init_cache(1), "voc": voc.init_cache(1)}

    run.init_cache = init_cache
    return run


class AudioCodec:
    """Facade pairing a transmitter and receiver around one generator
    (bin/stream.py AudioCodec / utils/audiodec.py AudioDec)."""

    def __init__(self, gen, params, vq_state, batch: int = 1,
                 receptive_length: int | None = None, tx=None, rx=None,
                 tx_device=None, rx_device=None):
        """Pass prebuilt ``tx``/``rx`` to pair different endpoints (e.g. an
        analyzer transmitter with a VocoderReceiver, the v0-v3 presets).
        ``tx_device``/``rx_device`` place the endpoints on distinct devices
        (reference bin/stream.py:26-35); the int32 code indices are the
        payload crossing the boundary."""
        self.gen = gen
        self.tx_encoder = tx or StreamingTransmitter(gen, params, vq_state,
                                                     batch, device=tx_device)
        self.rx_encoder = rx or StreamingReceiver(gen, params, vq_state,
                                                  batch, device=rx_device)
        self.receptive_length = receptive_length or gen.receptive_length

    def load(self):
        """Prime both sides' buffers (bin/stream.py:56-77)."""
        codes = self.tx_encoder.initial_encoder(self.receptive_length)
        self.rx_encoder.initial_decoder(codes)

    def reset(self):
        self.tx_encoder.reset_buffer()
        self.rx_encoder.reset_buffer()

    def _encode(self, x):
        return self.tx_encoder.encode(x)

    def _decode(self, idx):
        return self.rx_encoder.decode(idx)


class AudioCodecStreamer(AudioCodec):
    """Full-duplex streamer: audio in -> tx thread -> codes -> rx thread ->
    audio out, with latency tracking and overload frame-dropping
    (bin/stream.py:107-365)."""

    def __init__(self, gen, params, vq_state, *, frame_size: int = 1200,
                 sample_rate: int = 48000, max_latency: float = 0.1,
                 batch: int = 1, receptive_length: int | None = None,
                 input_dump=None, output_dump=None, fused: bool = True,
                 calibrate_split: bool = False,
                 tx=None, rx=None, tx_device=None, rx_device=None):
        """``fused=True`` (default) runs encode->quantize->lookup->decode as
        ONE jitted dispatch per frame in a single worker — half the
        host<->device round trips of the two-thread tx/rx split. Custom
        ``tx``/``rx`` endpoints (e.g. a VocoderReceiver) or distinct
        ``tx_device``/``rx_device`` placements use the two-stage pipeline.

        ``calibrate_split=True`` additionally times separate enc/dec
        dispatches at warmup to split the fused frame time into per-side
        stats (two extra program compiles + 8 fenced round trips at
        startup; on a tunneled backend the host round trip dominates both
        sides, so the calibrated ratio degenerates to ~0.5 anyway). Off by
        default: per-side stats then carry the labeled 50/50 estimate."""
        super().__init__(gen, params, vq_state, batch, receptive_length,
                         tx=tx, rx=rx, tx_device=tx_device, rx_device=rx_device)
        self.fused = (fused and tx is None and rx is None
                      and tx_device is rx_device)
        if self.fused:
            tx, rx = self.tx_encoder, self.rx_encoder

            def _fused(params, flat_cb, vq_state, tx_cache, rx_cache, chunk):
                z, tx_new = gen.encode_step(params, tx_cache, chunk)
                if gen.use_pqc:
                    idx = gen.quantize(vq_state, z)
                    zq = gen.lookup(flat_cb, idx)
                else:
                    zq = z
                y, rx_new = gen.decode_step(params, rx_cache, zq)
                return y, tx_new, rx_new

            self._fused_step = jax.jit(_fused)
        assert frame_size % gen.hop == 0, (
            f"frame_size {frame_size} must be a multiple of hop {gen.hop}"
        )
        self.frame_size = frame_size
        self.sample_rate = sample_rate
        self.max_latency = max_latency
        self.encoder_queue: queue.Queue = queue.Queue()
        self.decoder_queue: queue.Queue = queue.Queue()
        self.output_queue: queue.Queue = queue.Queue()
        self.enc_times: list[float] = []
        self.dec_times: list[float] = []
        self.fused_times: list[float] = []
        # fused mode runs enc+dec as ONE dispatch; per-side numbers are the
        # measured frame time split by this ratio — a labeled 50/50
        # estimate by default, or calibrated at warmup() from real separate
        # enc/dec dispatches when calibrate_split=True
        self._enc_frac = 0.5
        self._calibrate_split = calibrate_split
        self.latencies: list[float] = []
        self.frame_drops = 0
        self.n_frames = 0
        self.input_dump = [] if input_dump else None
        self.output_dump = [] if output_dump else None
        self._stop = threading.Event()
        # frames inside the pipeline (enqueued but not yet emitted/dropped),
        # including ones currently being processed by a worker thread
        self._inflight = 0
        self._inflight_lock = threading.Lock()

    def warmup(self):
        """Compile the frame-shaped tx/rx steps ahead of the worker threads
        (XLA first-compile would otherwise stall the pipeline for seconds),
        then restore the pre-warmup cache state."""
        tx_cache = jax.tree_util.tree_map(lambda x: x, self.tx_encoder.cache)
        rx_cache = jax.tree_util.tree_map(lambda x: x, self.rx_encoder.cache)
        zeros = jnp.zeros((self.tx_encoder.batch, self.frame_size,
                           self.gen.input_channels), jnp.float32)
        if self.fused:
            y = self._run_fused(zeros)
            _ = np.asarray(y)  # value fetch = reliable fence on this backend
            if self._calibrate_split:
                # calibrate the enc/dec split from real separate dispatches
                # (compiles the split steps too; np.asarray fences each)
                enc_t = dec_t = 0.0
                for _i in range(4):
                    t0 = time.perf_counter()
                    idx = self._encode(zeros)
                    _ = np.asarray(idx)
                    t1 = time.perf_counter()
                    y = self._decode(idx)
                    _ = np.asarray(y)
                    t2 = time.perf_counter()
                    if _i:  # skip the compile iteration
                        enc_t += t1 - t0
                        dec_t += t2 - t1
                if enc_t + dec_t > 0:
                    self._enc_frac = enc_t / (enc_t + dec_t)
        else:
            idx = self._encode(zeros)
            y = self._decode(idx)
            _ = np.asarray(y)
        self.tx_encoder.cache = tx_cache
        self.rx_encoder.cache = rx_cache

    # ---------------- worker threads (bin/stream.py:184-239) ----------------

    def _run_fused(self, frame):
        tx, rx = self.tx_encoder, self.rx_encoder
        y, tx_new, rx_new = self._fused_step(
            tx.params, rx.flat_cb, tx.vq_state, tx.cache, rx.cache, frame
        )
        tx.cache.update(tx_new)
        rx.cache.update(rx_new)
        return y

    def _encoder_worker(self):
        while not self._stop.is_set():
            try:
                frame, t_in = self.encoder_queue.get(timeout=0.1)
            except queue.Empty:
                continue
            t0 = time.perf_counter()
            if self.fused:
                y = np.asarray(self._run_fused(frame))
                dt = time.perf_counter() - t0
                self.fused_times.append(dt)
                self.enc_times.append(dt * self._enc_frac)
                self.dec_times.append(dt * (1.0 - self._enc_frac))
                self.output_queue.put((y, t_in))
                continue
            idx = self._encode(frame)
            # value fetch, not block_until_ready: the latter is NOT a
            # reliable fence on the tunneled backend (CLAUDE.md), which
            # would credit encoder work to the decoder's later fetch. The
            # fetched values are also the real tx->rx wire format (the
            # reference sends indices between threads, audiodec.py:96-103).
            idx = np.asarray(idx)
            self.enc_times.append(time.perf_counter() - t0)
            self.decoder_queue.put((idx, t_in))

    def _decoder_worker(self):
        while not self._stop.is_set():
            try:
                idx, t_in = self.decoder_queue.get(timeout=0.1)
            except queue.Empty:
                continue
            t0 = time.perf_counter()
            y = np.asarray(self._decode(idx))  # fetch = fence (CLAUDE.md)
            self.dec_times.append(time.perf_counter() - t0)
            self.output_queue.put((y, t_in))

    # ---------------- frame processing (bin/stream.py:242-282) --------------

    def _process(self, indata: np.ndarray) -> np.ndarray:
        """One audio-callback step: enqueue input frame, dequeue an output
        frame (zeros on underflow), flush queues when latency exceeds the
        bound (frame dropping, bin/stream.py:253-267)."""
        self.n_frames += 1
        if self.input_dump is not None:
            self.input_dump.append(indata.copy())
        with self._inflight_lock:
            self._inflight += 1
        self.encoder_queue.put((jnp.asarray(indata), time.perf_counter()))

        try:
            out, t_in = self.output_queue.get_nowait()
            with self._inflight_lock:
                self._inflight -= 1
            latency = time.perf_counter() - t_in
            self.latencies.append(latency)
            if latency > self.max_latency:
                dropped = self._flush_queues()
                self.frame_drops += dropped
                with self._inflight_lock:
                    self._inflight -= dropped
        except queue.Empty:
            out = np.zeros_like(indata)
        if self.output_dump is not None:
            self.output_dump.append(out.copy())
        return out

    def _flush_queues(self) -> int:
        dropped = 0
        for q in (self.encoder_queue, self.decoder_queue, self.output_queue):
            while True:
                try:
                    q.get_nowait()
                    dropped += 1
                except queue.Empty:
                    break
        return dropped

    # ---------------- run modes ----------------

    def run_array(self, audio: np.ndarray, realtime: bool = False,
                  drain_timeout: float = 10.0):
        """Drive the streamer from an in-memory array (B, T, C) — the
        file-driven analogue of the sounddevice loop; used by tests/bench."""
        self.warmup()
        threads = [
            threading.Thread(target=self._encoder_worker, daemon=True),
            threading.Thread(target=self._decoder_worker, daemon=True),
        ]
        for t in threads:
            t.start()
        outs = []
        n = audio.shape[1] // self.frame_size
        frame_time = self.frame_size / self.sample_rate
        try:
            for i in range(n):
                t0 = time.perf_counter()
                frame = audio[:, i * self.frame_size : (i + 1) * self.frame_size]
                outs.append(self._process(frame))
                if realtime:
                    dt = time.perf_counter() - t0
                    if dt < frame_time:
                        time.sleep(frame_time - dt)
            # drain the pipeline: collect every in-flight frame (including
            # ones still inside a worker thread, not yet in any queue)
            deadline = time.perf_counter() + drain_timeout
            while self._inflight > 0 and time.perf_counter() < deadline:
                try:
                    out, t_in = self.output_queue.get(timeout=0.1)
                    self.latencies.append(time.perf_counter() - t_in)
                    outs.append(out)
                    with self._inflight_lock:
                        self._inflight -= 1
                except queue.Empty:
                    continue
        finally:
            self._stop.set()
            for t in threads:
                t.join(timeout=1.0)
        return np.concatenate(outs, axis=1) if outs else np.zeros_like(audio[:, :0])

    def _pending(self) -> int:
        return (self.encoder_queue.qsize() + self.decoder_queue.qsize()
                + self.output_queue.qsize())

    def run(self, latency: float = 0.1, duration: float | None = None):
        """Live sounddevice loop (bin/stream.py:335-365). Requires the
        optional ``sounddevice`` package + audio hardware."""
        try:
            import sounddevice as sd
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "sounddevice is not available in this environment; use "
                "run_array() for file-driven streaming"
            ) from e
        # compile ahead of the audio callback — first-compile through the
        # remote compile service takes ~100 s and would stall live audio
        self.warmup()
        threads = [
            threading.Thread(target=self._encoder_worker, daemon=True),
            threading.Thread(target=self._decoder_worker, daemon=True),
        ]
        for t in threads:
            t.start()

        def callback(indata, outdata, frames, time_info, status):  # pragma: no cover
            if status:
                logger.warning("%s", status)
            out = self._process(indata[None, :, :1].astype(np.float32))
            outdata[:] = out[0]

        with sd.Stream(channels=1, samplerate=self.sample_rate,
                       blocksize=self.frame_size, latency=latency,
                       callback=callback):  # pragma: no cover
            if duration is None:
                input("Streaming... press Enter to stop.\n")
            else:
                time.sleep(duration)
        self._stop.set()

    # ---------------- stats (bin/stream.py:284-310) ----------------

    def stats(self) -> dict:
        def ms(xs):
            return (float(np.mean(xs) * 1e3), float(np.std(xs) * 1e3)) if xs else (0.0, 0.0)

        enc_mean, enc_std = ms(self.enc_times)
        dec_mean, dec_std = ms(self.dec_times)
        lat_mean, lat_std = ms(self.latencies)
        out = {
            "encoder_ms_mean": enc_mean, "encoder_ms_std": enc_std,
            "decoder_ms_mean": dec_mean, "decoder_ms_std": dec_std,
            "latency_ms_mean": lat_mean, "latency_ms_std": lat_std,
            "frame_drops": self.frame_drops,
            "frames": self.n_frames,
            "drop_pct": 100.0 * self.frame_drops / max(self.n_frames, 1),
        }
        if self.fused_times:
            fused_mean, fused_std = ms(self.fused_times)
            out.update(
                fused_ms_mean=fused_mean, fused_ms_std=fused_std,
                # per-side numbers above are fused frame time split by a
                # ratio (warmup-calibrated or the 50/50 estimate), not
                # per-frame measurements
                timing_mode=("fused-calibrated-split"
                             if self._calibrate_split
                             else "fused-estimated-split"),
                enc_frac=round(self._enc_frac, 4),
            )
        else:
            out["timing_mode"] = "per-side"
        return out
