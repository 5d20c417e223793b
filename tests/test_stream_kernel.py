"""Fused streaming-chain Pallas kernel tests (interpreter mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dl_speech_enhancement_tpu.models import AudioDecGenerator
from dl_speech_enhancement_tpu.models.autoencoder import ResidualUnit
from dl_speech_enhancement_tpu.ops.stream_kernel import (
    fused_residual_chain,
    make_fused_chunk_step,
)


def test_fused_residual_chain_matches_streaming(rng):
    units = [ResidualUnit(32, dilation=d) for d in (1, 3, 9)]
    ps = [u.init(jax.random.PRNGKey(i)) for i, u in enumerate(units)]
    T, ctx = 120, 78
    chunk = rng.standard_normal((T, 32)).astype(np.float32)

    h = jnp.asarray(chunk[None])
    for u, p in zip(units, ps):
        h, _ = u.step(p, u.init_cache(1), h)
    ref = np.asarray(h)[0]

    x = np.concatenate([np.zeros((ctx, 32), np.float32), chunk])
    got = np.asarray(fused_residual_chain(ps, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_fused_chunk_step_matches_xla_streaming(rng):
    gen = AudioDecGenerator(
        encode_channels=8, decode_channels=8, code_dim=16, codebook_num=2,
        codebook_size=32, enc_ratios=(2, 4), dec_ratios=(4, 2),
        enc_strides=(3, 4), dec_strides=(4, 3), use_pqc=False,
    )
    params, _ = gen.init(jax.random.PRNGKey(0))
    init_cache, step = make_fused_chunk_step(gen, params, interpret=True)
    cache = init_cache()
    ref_cache = gen.init_cache(1)
    T = gen.hop * 4
    for _ in range(4):
        x = rng.standard_normal((T, 1)).astype(np.float32) * 0.3
        y, cache = step(cache, jnp.asarray(x))
        z, ec = gen.encode_step(params, ref_cache, jnp.asarray(x[None]))
        ref_cache.update(ec)
        yr, dc = gen.decode_step(params, ref_cache, z)
        ref_cache.update(dc)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr)[0], atol=1e-5)
