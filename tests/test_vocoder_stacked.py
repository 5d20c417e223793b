"""Stacked batched vocoder kernel equivalence tests (interpreter mode).

ops/vocoder_stacked.py must reproduce ``voc.step`` frame by frame for
every stream, with per-stream cache regions carried across grid steps
and dispatches. Reference streaming semantics: HiFiGAN.py:268-296
(decode_norm -> decode_input -> decode_upsample -> decode_output).
"""

import numpy as np

import jax
import jax.numpy as jnp

from dl_speech_enhancement_tpu.models import HiFiGANGenerator
from dl_speech_enhancement_tpu.ops.vocoder_stacked import make_stacked_vocoder


def _small_voc(stats=None):
    # v1-family topology (MultiGroupConv1d fusion) at toy size; strides
    # mirror the real preset's (5, 5, 4, 3) shape
    return HiFiGANGenerator(
        in_channels=12, out_channels=1, channels=32, kernel_size=7,
        upsample_scales=(5, 4, 3), upsample_kernel_sizes=(10, 8, 6),
        resblock_kernel_sizes=(5,), resblock_dilations=((1, 3),),
        groups=3, stats=stats)


def _xla_stream(voc, params, zs):
    cache = voc.init_cache(1)
    outs = []
    for z in zs:
        y, cache = voc.step(params, cache, jnp.asarray(z[None]))
        outs.append(np.asarray(y)[0, :, 0])
    return np.stack(outs)


def test_vocoder_stacked_matches_xla_streams(rng):
    voc = _small_voc()
    params = voc.init(jax.random.PRNGKey(0))
    chunk = voc.total_upsample * 2
    B = 3
    init_cache, run = make_stacked_vocoder(
        voc, params, chunk, batch=B, weight_dtype=jnp.float32,
        interpret=True)
    z_rows = chunk // voc.total_upsample
    zs = rng.standard_normal((3, B, z_rows, 12)).astype(np.float32) * 0.5
    out, _ = run(init_cache(), jnp.asarray(zs))
    out = np.asarray(out)
    for b in range(B):
        ref = _xla_stream(voc, params, zs[:, b])
        np.testing.assert_allclose(out[:, b], ref, atol=3e-5,
                                   err_msg=f"stream {b}")


def test_vocoder_stacked_cache_continues(rng):
    voc = _small_voc()
    params = voc.init(jax.random.PRNGKey(1))
    chunk = voc.total_upsample
    B = 2
    init_cache, run = make_stacked_vocoder(
        voc, params, chunk, batch=B, weight_dtype=jnp.float32,
        interpret=True)
    zs = rng.standard_normal((4, B, 1, 12)).astype(np.float32) * 0.5
    whole, _ = run(init_cache(), jnp.asarray(zs))
    cache = init_cache()
    first, cache = run(cache, jnp.asarray(zs[:2]))
    second, _ = run(cache, jnp.asarray(zs[2:]))
    np.testing.assert_allclose(
        np.asarray(whole),
        np.concatenate([np.asarray(first), np.asarray(second)]), atol=3e-5)


def test_vocoder_stacked_stats_norm(rng):
    """Analyzer-statistics input normalization folded into the input
    conv must match the model's explicit (c - mean)/scale."""
    stats = np.stack([rng.standard_normal(12).astype(np.float32) * 0.1,
                      1.0 + 0.2 * rng.random(12).astype(np.float32)])
    voc = _small_voc(stats=stats)
    params = voc.init(jax.random.PRNGKey(2))
    chunk = voc.total_upsample
    init_cache, run = make_stacked_vocoder(
        voc, params, chunk, batch=1, weight_dtype=jnp.float32,
        interpret=True)
    zs = rng.standard_normal((2, 1, 1, 12)).astype(np.float32)
    out, _ = run(init_cache(), jnp.asarray(zs))
    ref = _xla_stream(voc, params, zs[:, 0])
    np.testing.assert_allclose(np.asarray(out)[:, 0], ref, atol=3e-5)
