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
