"""Whole-stack mega-kernel equivalence tests (interpreter mode).

The mega kernel must reproduce gen.encode_step + gen.decode_step frame by
frame (reference streaming semantics, bin/stream.py) with the cache carried
in VMEM across grid steps and across dispatches.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dl_speech_enhancement_tpu.models import AudioDecGenerator
from dl_speech_enhancement_tpu.ops.mega_kernel import make_mega_stream


def _small_gen():
    return AudioDecGenerator(
        encode_channels=8, decode_channels=8, code_dim=16, codebook_num=2,
        codebook_size=32, enc_ratios=(2, 4), dec_ratios=(4, 2),
        enc_strides=(3, 4), dec_strides=(4, 3), use_pqc=False,
    )


def _xla_stream(gen, params, frames):
    """Reference per-frame streaming via the XLA step path."""
    cache = gen.init_cache(1)
    outs = []
    for x in frames:
        z, ec = gen.encode_step(params, cache, jnp.asarray(x[None, :, None]))
        cache.update(ec)
        y, dc = gen.decode_step(params, cache, z)
        cache.update(dc)
        outs.append(np.asarray(y)[0, :, 0])
    return np.stack(outs)


def test_mega_stream_matches_xla_streaming(rng):
    gen = _small_gen()
    params, _ = gen.init(jax.random.PRNGKey(0))
    chunk = gen.hop * 4
    init_cache, run = make_mega_stream(gen, params, chunk,
                                       weight_dtype=jnp.float32,
                                       interpret=True)
    frames = rng.standard_normal((3, chunk)).astype(np.float32) * 0.3
    out, _ = run(init_cache(), jnp.asarray(frames))
    ref = _xla_stream(gen, params, frames)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_mega_stream_cache_continues_across_dispatches(rng):
    gen = _small_gen()
    params, _ = gen.init(jax.random.PRNGKey(1))
    chunk = gen.hop * 2
    init_cache, run = make_mega_stream(gen, params, chunk,
                                       weight_dtype=jnp.float32,
                                       interpret=True)
    frames = rng.standard_normal((4, chunk)).astype(np.float32) * 0.3
    whole, _ = run(init_cache(), jnp.asarray(frames))
    first, cache = run(init_cache(), jnp.asarray(frames[:2]))
    second, _ = run(cache, jnp.asarray(frames[2:]))
    np.testing.assert_allclose(np.asarray(first), np.asarray(whole)[:2],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(second), np.asarray(whole)[2:],
                               atol=1e-6)


def test_mega_stream_flagship_topology(rng):
    """One frame through the full-size denoiser (25 ms @ 48 kHz)."""
    gen = AudioDecGenerator(use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(2))
    chunk = 1200
    init_cache, run = make_mega_stream(gen, params, chunk,
                                       weight_dtype=jnp.float32,
                                       interpret=True)
    frames = rng.standard_normal((2, chunk)).astype(np.float32) * 0.3
    out, _ = run(init_cache(), jnp.asarray(frames))
    ref = _xla_stream(gen, params, frames)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def _small_pqc_gen():
    return AudioDecGenerator(
        encode_channels=8, decode_channels=8, code_dim=16, codebook_num=3,
        codebook_size=32, enc_ratios=(2, 4), dec_ratios=(4, 2),
        enc_strides=(3, 4), dec_strides=(4, 3), use_pqc=True,
    )


def _xla_pqc_stream(gen, params, vq_state, frames):
    """Reference per-frame PQC streaming: encode -> quantize (wire idx) ->
    lookup -> decode, via the XLA step path."""
    cache = gen.init_cache(1)
    flat_cb = gen.flat_codebook(vq_state)
    outs, codes = [], []
    for x in frames:
        z, ec = gen.encode_step(params, cache, jnp.asarray(x[None, :, None]))
        cache.update(ec)
        idx = gen.quantize(vq_state, z)  # (L, B, T)
        zq = gen.lookup(flat_cb, idx)
        y, dc = gen.decode_step(params, cache, zq)
        cache.update(dc)
        outs.append(np.asarray(y)[0, :, 0])
        codes.append(np.asarray(idx)[:, 0, :].T)  # (T_code, L)
    return np.stack(outs), np.stack(codes)


def test_mega_stream_pqc_matches_xla_streaming(rng):
    """The PQC mega kernel must reproduce the full symAD streaming chain:
    same wire indices (exact) and same audio out."""
    gen = _small_pqc_gen()
    params, vq_state = gen.init(jax.random.PRNGKey(3))
    chunk = gen.hop * 4
    init_cache, run = make_mega_stream(gen, params, chunk,
                                       weight_dtype=jnp.float32,
                                       interpret=True, vq_state=vq_state)
    frames = rng.standard_normal((3, chunk)).astype(np.float32) * 0.3
    out, _, codes = run(init_cache(), jnp.asarray(frames))
    ref_out, ref_codes = _xla_pqc_stream(gen, params, vq_state, frames)
    np.testing.assert_array_equal(np.asarray(codes), ref_codes)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5)


def test_mega_stream_pqc_cache_continues(rng):
    gen = _small_pqc_gen()
    params, vq_state = gen.init(jax.random.PRNGKey(4))
    chunk = gen.hop * 2
    init_cache, run = make_mega_stream(gen, params, chunk,
                                       weight_dtype=jnp.float32,
                                       interpret=True, vq_state=vq_state)
    frames = rng.standard_normal((4, chunk)).astype(np.float32) * 0.3
    whole, _, codes_w = run(init_cache(), jnp.asarray(frames))
    first, cache, codes_1 = run(init_cache(), jnp.asarray(frames[:2]))
    second, _, codes_2 = run(cache, jnp.asarray(frames[2:]))
    np.testing.assert_allclose(np.asarray(first), np.asarray(whole)[:2],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(second), np.asarray(whole)[2:],
                               atol=1e-6)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(codes_1), np.asarray(codes_2)]),
        np.asarray(codes_w))


# ---------------- batched (multi-stream) mega kernel ----------------

from dl_speech_enhancement_tpu.ops.mega_kernel import make_mega_stream_batched


def _xla_stream_batched(gen, params, frames):
    """Per-frame XLA streaming of B independent streams at once."""
    n, b, chunk = frames.shape
    cache = gen.init_cache(b)
    outs = []
    for x in frames:
        z, ec = gen.encode_step(params, cache, jnp.asarray(x[:, :, None]))
        cache.update(ec)
        y, dc = gen.decode_step(params, cache, z)
        cache.update(dc)
        outs.append(np.asarray(y)[:, :, 0])
    return np.stack(outs)


def test_mega_batched_matches_xla_streams(rng):
    """B independent streams through the batched kernel == B separate XLA
    streaming runs (streams must not leak into each other)."""
    gen = _small_gen()
    params, _ = gen.init(jax.random.PRNGKey(5))
    chunk = gen.hop * 3
    B = 3
    init_cache, run = make_mega_stream_batched(
        gen, params, chunk, batch=B, weight_dtype=jnp.float32,
        interpret=True)
    frames = rng.standard_normal((4, B, chunk)).astype(np.float32) * 0.3
    out, _ = run(init_cache(), jnp.asarray(frames))
    ref = _xla_stream_batched(gen, params, frames)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_mega_batched_cache_continues(rng):
    gen = _small_gen()
    params, _ = gen.init(jax.random.PRNGKey(6))
    chunk = gen.hop * 2
    B = 2
    init_cache, run = make_mega_stream_batched(
        gen, params, chunk, batch=B, weight_dtype=jnp.float32,
        interpret=True)
    frames = rng.standard_normal((4, B, chunk)).astype(np.float32) * 0.3
    whole, _ = run(init_cache(), jnp.asarray(frames))
    first, cache = run(init_cache(), jnp.asarray(frames[:2]))
    second, _ = run(cache, jnp.asarray(frames[2:]))
    np.testing.assert_allclose(np.asarray(first), np.asarray(whole)[:2],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(second), np.asarray(whole)[2:],
                               atol=1e-6)


def test_mega_batched_pqc_matches_xla(rng):
    """Batched PQC: per-stream wire indices and audio match the XLA chain."""
    gen = _small_pqc_gen()
    params, vq_state = gen.init(jax.random.PRNGKey(7))
    chunk = gen.hop * 2
    B = 2
    init_cache, run = make_mega_stream_batched(
        gen, params, chunk, batch=B, weight_dtype=jnp.float32,
        interpret=True, vq_state=vq_state)
    frames = rng.standard_normal((3, B, chunk)).astype(np.float32) * 0.3
    out, _, codes = run(init_cache(), jnp.asarray(frames))
    for b in range(B):
        ref_out, ref_codes = _xla_pqc_stream(
            gen, params, vq_state, frames[:, b])
        np.testing.assert_array_equal(np.asarray(codes)[:, b], ref_codes)
        np.testing.assert_allclose(np.asarray(out)[:, b], ref_out, atol=2e-5)
