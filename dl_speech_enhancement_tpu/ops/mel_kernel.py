"""Fused Pallas log-mel front-end kernel (TPU).

The mel loss runs twice per training step (y_hat and y) and its torch
counterpart is the hot spot of the reference loss stack
(losses/mel_loss.py:88-94: stft -> power -> amplitude -> mel matmul -> log).
On TPU the STFT-as-FFT route materializes the (frames, n_fft//2+1) complex
spectrogram in HBM between the FFT and the mel matmul. This kernel instead
evaluates the real DFT as **two MXU matmuls** against precomputed
windowed-cosine/sine bases and fuses power, mel projection, clamp and log in
VMEM — one HBM read of the frames, one HBM write of (frames, n_mels):

    frames (Bf, n_fft) @ [win*cos, win*sin] (n_fft, n_freq)  -> re, im (MXU)
    power = re^2 + im^2                                       (VPU)
    mel   = clamp(sqrt(clamp(power)) @ melmat, eps)           (MXU)
    out   = log(mel)                                          (VPU)

The DFT-as-matmul costs ~100x the FLOPs of an FFT but runs on the 128x128
systolic array at full utilization, while the fused pipeline saves the
intermediate HBM round-trips; for n_fft <= 2048 this is the right trade on
v5e. A pure-XLA fallback (dsp.mel pipeline) remains the default off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

from dl_speech_enhancement_tpu.dsp.stft import hann_window, frame_signal
from dl_speech_enhancement_tpu.dsp.mel import mel_filterbank


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _freq_block(n_freq_p: int, target: int = 256) -> int:
    """Largest 128-multiple divisor of the padded freq axis <= target.

    The windowed-DFT bases are streamed through VMEM in freq blocks: keeping
    BOTH full bases resident (2 x n_fft x n_freq_p f32 — 18.9 MB at fft
    2048) sat right at the ~16 MB scoped-VMEM limit and aborted compiles in
    larger surrounding programs (observed: the remat B=64 training step).
    """
    nb = n_freq_p // 128
    best = 128
    for k in range(1, nb + 1):
        if nb % k == 0 and 128 * k <= target:
            best = 128 * k
    return best


@functools.lru_cache(maxsize=8)
def _dft_bases(n_fft: int, win_length: int):
    """Windowed real-DFT cos/sin bases, freq axis padded to lane multiples."""
    n_freq = n_fft // 2 + 1
    win = np.zeros(n_fft, np.float32)
    w = np.asarray(hann_window(win_length))
    left = (n_fft - win_length) // 2
    win[left : left + win_length] = w
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_freq)[None, :]
    ang = 2.0 * np.pi * t * k / n_fft
    cos_b = (np.cos(ang) * win[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * win[:, None]).astype(np.float32)
    # pad freq axis to a multiple of 128 so MXU tiles cleanly
    n_freq_p = _round_up(n_freq, 128)
    pad = n_freq_p - n_freq
    cos_b = np.pad(cos_b, ((0, 0), (0, pad)))
    sin_b = np.pad(sin_b, ((0, 0), (0, pad)))
    return jnp.asarray(cos_b), jnp.asarray(sin_b)


@functools.lru_cache(maxsize=8)
def _bases(n_fft: int, win_length: int, sr: int, n_mels: int, fmin: float,
           fmax: float):
    """DFT bases + mel matrix, padded to lane multiples."""
    cos_b, sin_b = _dft_bases(n_fft, win_length)
    n_freq = n_fft // 2 + 1
    mel = mel_filterbank(sr, n_fft, n_mels, fmin=fmin, fmax=fmax)
    mel = np.pad(mel, ((0, cos_b.shape[1] - n_freq), (0, 0)))
    n_mels_p = _round_up(n_mels, 128)
    mel = np.pad(mel, ((0, 0), (0, n_mels_p - n_mels)))
    return cos_b, sin_b, jnp.asarray(mel)


# Above ~5k frame rows per pallas call the TPU backend starts staging the
# full operands on the scoped-VMEM stack and the compile aborts (seen at
# batch-64 training: 10368 rows OOM, 5248 rows fine); big inputs are fed
# through the kernels in equal chunks via lax.map — same blocks, same
# numerics, one extra scan level. Chunk count/size are derived from the
# (static) row total so padding waste stays under one block per chunk.
_MAX_CHUNK_ROWS = 4096


def _run_chunked(core, flat, total: int, block_frames: int, out_cols: int):
    if total > _MAX_CHUNK_ROWS:
        n = -(-total // _MAX_CHUNK_ROWS)
        rows = _round_up(-(-total // n), block_frames)
        total_p = rows * n
        flat = jnp.pad(flat, ((0, total_p - total), (0, 0)))
        # STATIC python loop, not lax.map: the map's while-loop body gets
        # fused with neighboring ops and XLA stages the full (n, rows, .)
        # operands on the scoped-VMEM stack — observed aborting the remat
        # B=64 training compile at 18.12M vs the 16M limit (round 5).
        # Separate pallas_calls keep each chunk's buffers in HBM; n is
        # static and small (total/4096), so program-size growth is mild.
        chunks = [core(flat[i * rows : (i + 1) * rows]) for i in range(n)]
        return jnp.concatenate(chunks, axis=0)
    total_p = _round_up(total, block_frames)
    flat = jnp.pad(flat, ((0, total_p - total), (0, 0)))
    return core(flat)


def _kernel(frames_ref, cos_ref, sin_ref, mel_ref, out_ref, *, eps,
            log_base, nb):
    """Grid (frame_blocks, freq_blocks): per j-step the block's partial mel
    projection accumulates into the revisited output block; the clamp+log
    epilogue runs on the last freq block. Padded freq columns contribute
    sqrt(eps) amplitudes against all-zero mel rows, exactly like the
    unblocked kernel did."""
    j = pl.program_id(1)
    f = frames_ref[...]
    re = jnp.dot(f, cos_ref[...], preferred_element_type=jnp.float32)
    im = jnp.dot(f, sin_ref[...], preferred_element_type=jnp.float32)
    amp = jnp.sqrt(jnp.maximum(re * re + im * im, eps))
    partial = jnp.dot(amp, mel_ref[...], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[...] = partial

    @pl.when(j > 0)
    def _():
        out_ref[...] = out_ref[...] + partial

    @pl.when(j == nb - 1)
    def _():
        mel = jnp.maximum(out_ref[...], eps)
        if log_base is None:
            out_ref[...] = jnp.log(mel)
        elif log_base == 2.0:
            out_ref[...] = jnp.log2(mel)
        else:
            out_ref[...] = jnp.log10(mel)


def make_fused_log_mel(sr: int, n_fft: int, hop: int, win_length: int | None,
                       n_mels: int, fmin: float = 0.0, fmax: float | None = None,
                       eps: float = 1e-10, log_base: float | None = None,
                       block_frames: int = 128, interpret: bool = False):
    """Build ``f(x (B, T)) -> (B, n_frames, n_mels)`` using the fused kernel.

    Matches dsp.mel.log_mel_spectrogram (center=True reflect padding).
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests)."""
    if win_length is None:
        win_length = n_fft
    if fmax is None:
        fmax = sr / 2
    if log_base not in (None, 2.0, 10.0):
        # match the XLA path (dsp.mel) — fail loudly instead of silently
        # computing log10 for an unsupported base
        raise ValueError(f"unsupported log_base: {log_base}")
    cos_b, sin_b, mel_m = _bases(n_fft, win_length, sr, n_mels, fmin, fmax)
    n_freq_p = cos_b.shape[1]
    n_mels_p = mel_m.shape[1]
    fb = _freq_block(n_freq_p)
    nb = n_freq_p // fb

    def _pallas_core(flat):
        total_p = flat.shape[0]
        grid = (total_p // block_frames, nb)
        return pl.pallas_call(
            functools.partial(_kernel, eps=eps, log_base=log_base, nb=nb),
            out_shape=jax.ShapeDtypeStruct((total_p, n_mels_p), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_frames, n_fft), lambda i, j: (i, 0)),
                pl.BlockSpec((n_fft, fb), lambda i, j: (0, j)),
                pl.BlockSpec((n_fft, fb), lambda i, j: (0, j)),
                pl.BlockSpec((fb, n_mels_p), lambda i, j: (j, 0)),
            ],
            out_specs=pl.BlockSpec((block_frames, n_mels_p),
                                   lambda i, j: (i, 0)),
            interpret=interpret,
        )(flat, cos_b, sin_b, mel_m)

    # The kernel itself is not reverse-differentiable; give it an analytic
    # VJP (training losses backprop through the mel front-end). Backward is
    # three MXU matmuls in plain XLA — the forward residual is just the
    # frame block.
    @jax.custom_vjp
    def core(flat):
        return _pallas_core(flat)

    def core_fwd(flat):
        return _pallas_core(flat), flat

    def core_bwd(flat, g):
        re = flat @ cos_b
        im = flat @ sin_b
        power = re * re + im * im
        amp = jnp.sqrt(jnp.maximum(power, eps))
        mel_raw = amp @ mel_m
        mel = jnp.maximum(mel_raw, eps)
        if log_base is None:
            scale = 1.0
        elif log_base == 2.0:
            scale = 1.0 / np.log(2.0)
        else:
            scale = 1.0 / np.log(10.0)
        d_mel = jnp.where(mel_raw >= eps, g * scale / mel, 0.0)
        d_amp = d_mel @ mel_m.T
        d_power = jnp.where(power >= eps, d_amp * 0.5 / amp, 0.0)
        d_flat = (2.0 * re * d_power) @ cos_b.T + (2.0 * im * d_power) @ sin_b.T
        return (d_flat,)

    core.defvjp(core_fwd, core_bwd)

    def fn(x: jax.Array) -> jax.Array:
        if x.ndim == 3:  # (B, C, T) -> (B*C, T), like MelSpectrogram
            x = x.reshape(-1, x.shape[-1])
        b, t = x.shape
        pad = n_fft // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        frames = frame_signal(xp, n_fft, hop)  # (B, n_frames, n_fft)
        n_frames = frames.shape[1]
        flat = frames.reshape(b * n_frames, n_fft)
        total = flat.shape[0]
        out = _run_chunked(core, flat, total, block_frames, n_mels_p)
        return out[:total, :n_mels].reshape(b, n_frames, n_mels)

    return fn


def fused_log_mel(x, sr, n_fft, hop, win_length=None, n_mels=80, fmin=0.0,
                  fmax=None, eps=1e-10, log_base=None):
    """One-shot convenience wrapper around :func:`make_fused_log_mel`."""
    return make_fused_log_mel(sr, n_fft, hop, win_length, n_mels, fmin, fmax,
                              eps, log_base)(x)


def _mag_kernel(frames_ref, cos_ref, sin_ref, out_ref, *, eps):
    # freq-blocked like _kernel, but the output IS per-freq so each (i, j)
    # step writes its own output block — no accumulation needed
    f = frames_ref[...]
    re = jnp.dot(f, cos_ref[...], preferred_element_type=jnp.float32)
    im = jnp.dot(f, sin_ref[...], preferred_element_type=jnp.float32)
    out_ref[...] = jnp.sqrt(jnp.maximum(re * re + im * im, eps))


def make_fused_stft_magnitude(n_fft: int, hop: int, win_length: int,
                              eps: float = 1e-7, block_frames: int = 128,
                              interpret: bool = False):
    """Fused magnitude spectrogram ``f(x (B, T)) -> (B, frames, n_fft//2+1)``
    via the same DFT-as-MXU-matmul trick — for the multi-resolution STFT
    loss front-end (dsp.stft.stft_magnitude semantics)."""
    cos_b, sin_b = _dft_bases(n_fft, win_length)
    n_freq = n_fft // 2 + 1
    n_freq_p = cos_b.shape[1]
    fb = _freq_block(n_freq_p)
    nb = n_freq_p // fb

    def _pallas_core(flat):
        total_p = flat.shape[0]
        return pl.pallas_call(
            functools.partial(_mag_kernel, eps=eps),
            out_shape=jax.ShapeDtypeStruct((total_p, n_freq_p), jnp.float32),
            grid=(total_p // block_frames, nb),
            in_specs=[
                pl.BlockSpec((block_frames, n_fft), lambda i, j: (i, 0)),
                pl.BlockSpec((n_fft, fb), lambda i, j: (0, j)),
                pl.BlockSpec((n_fft, fb), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((block_frames, fb), lambda i, j: (i, j)),
            interpret=interpret,
        )(flat, cos_b, sin_b)

    @jax.custom_vjp
    def core(flat):
        return _pallas_core(flat)

    def core_fwd(flat):
        return _pallas_core(flat), flat

    def core_bwd(flat, g):
        re = flat @ cos_b
        im = flat @ sin_b
        power = re * re + im * im
        amp = jnp.sqrt(jnp.maximum(power, eps))
        # g always has the lane-padded width: core's primal output is
        # (rows, n_freq_p); the unpadded slice lives outside core in fn()
        d_power = jnp.where(power >= eps, g * 0.5 / amp, 0.0)
        d_flat = (2.0 * re * d_power) @ cos_b.T + (2.0 * im * d_power) @ sin_b.T
        return (d_flat,)

    core.defvjp(core_fwd, core_bwd)

    def fn(x: jax.Array) -> jax.Array:
        if x.ndim == 3:
            x = x.reshape(-1, x.shape[-1])
        b, t = x.shape
        pad = n_fft // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        frames = frame_signal(xp, n_fft, hop)
        n_frames = frames.shape[1]
        flat = frames.reshape(b * n_frames, n_fft)
        total = flat.shape[0]
        # same compile-cliff chunking as the log-mel path (the STFT loss
        # runs at training batch shapes too)
        out = _run_chunked(core, flat, total, block_frames, n_freq_p)
        return out[:total, :n_freq].reshape(b, n_frames, n_freq)

    return fn
