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


def test_vocoder_stacked_wide_group_stage(rng):
    """gc > 512 stages take the per-group (native-weight) path with the
    scratch lane-block assembly — must still match voc.step exactly."""
    voc = HiFiGANGenerator(
        in_channels=16, out_channels=1, channels=512, kernel_size=7,
        upsample_scales=(5, 3), upsample_kernel_sizes=(10, 6),
        resblock_kernel_sizes=(5,), resblock_dilations=((1, 2),),
        groups=3)  # stage 0: c=256, gc=768 -> wide
    params = voc.init(jax.random.PRNGKey(3))
    chunk = voc.total_upsample
    B = 2
    init_cache, run = make_stacked_vocoder(
        voc, params, chunk, batch=B, weight_dtype=jnp.float32,
        interpret=True)
    zs = rng.standard_normal((3, B, 1, 16)).astype(np.float32) * 0.5
    out, cache = run(init_cache(), jnp.asarray(zs))
    out2, _ = run(cache, jnp.asarray(zs))  # continuation exercises tails
    out = np.asarray(out)
    for b in range(B):
        ref = _xla_stream(voc, params, zs[:, b])
        np.testing.assert_allclose(out[:, b], ref, atol=3e-5,
                                   err_msg=f"stream {b}")


def test_vocoder_stacked_paired_wire_codes(rng):
    """Stacked paired fleet: PQC codec tx codes -> in-kernel lookup ->
    vocoder rx, vs the XLA encode->quantize->lookup->voc.step chain."""
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.ops.mega_stacked import (
        make_mega_stream_stacked,
    )

    codec = AudioDecGenerator(
        encode_channels=8, decode_channels=8, code_dim=12, codebook_num=2,
        codebook_size=16, enc_ratios=(2, 4), dec_ratios=(4, 2),
        enc_strides=(3, 4), dec_strides=(4, 3), use_pqc=True)
    cparams, vq = codec.init(jax.random.PRNGKey(5))
    voc = _small_voc()
    assert voc.total_upsample == codec.hop * 5  # toy shapes differ; use
    # the vocoder's own rate for the code stream below
    vparams = voc.init(jax.random.PRNGKey(6))
    B = 2
    chunk = codec.hop * 2  # 2 code rows per dispatch for the codec tx
    tx_init, tx_run = make_mega_stream_stacked(
        codec, cparams, chunk, batch=B, weight_dtype=jnp.float32,
        interpret=True, vq_state=vq)
    # vocoder consumes the SAME code stream shape: chunk_v such that
    # chunk_v / total_upsample == chunk / hop
    chunk_v = voc.total_upsample * (chunk // codec.hop)
    rx_init, rx_run = make_stacked_vocoder(
        voc, vparams, chunk_v, batch=B, weight_dtype=jnp.float32,
        interpret=True, vq_embed=vq.embed)
    frames = rng.standard_normal((2, B, chunk)).astype(np.float32) * 0.3
    _, _, codes = tx_run(tx_init(), jnp.asarray(frames))
    out, _ = rx_run(rx_init(), codes)
    out = np.asarray(out)
    # XLA reference per stream
    flat_cb = codec.flat_codebook(vq)
    for b in range(B):
        ccache = codec.init_cache(1)
        vcache = voc.init_cache(1)
        ref = []
        for f in np.asarray(frames)[:, b]:
            z, ec = codec.encode_step(cparams, ccache,
                                      jnp.asarray(f[None, :, None]))
            ccache.update(ec)
            idx = codec.quantize(vq, z)
            zq = codec.lookup(flat_cb, idx)
            y, vcache = voc.step(vparams, vcache, zq)
            ref.append(np.asarray(y)[0, :, 0])
        np.testing.assert_allclose(out[:, b], np.stack(ref), atol=3e-5,
                                   err_msg=f"stream {b}")


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
