"""Exact-equivalence tests for the fused HiFiGAN vocoder pipeline
(ops/vocoder_kernel.py) against the XLA streaming path
(models/hifigan.py::HiFiGANGenerator.step), in Pallas interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dl_speech_enhancement_tpu.models.hifigan import HiFiGANGenerator
from dl_speech_enhancement_tpu.ops.vocoder_kernel import make_mega_vocoder


def _mgc_voc(stats=None):
    # v1-style: single kernel size + groups -> MultiGroupConv1d fast decoder
    return HiFiGANGenerator(
        in_channels=8, out_channels=1, channels=16, kernel_size=7,
        upsample_scales=(2, 3), upsample_kernel_sizes=(4, 6),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 2),),
        groups=2, bias=True, use_additional_convs=True, stats=stats,
    )


def _mrf_voc():
    # v0-style: several kernel sizes -> MultiReceptiveField average
    return HiFiGANGenerator(
        in_channels=8, out_channels=1, channels=16, kernel_size=7,
        upsample_scales=(2, 3), upsample_kernel_sizes=(4, 6),
        resblock_kernel_sizes=(3, 5), resblock_dilations=((1, 2), (1, 2)),
        groups=1, bias=True, use_additional_convs=True,
    )


def _xla_stream(voc, params, zq_frames):
    """zq_frames: (n, z_rows, in_ch) -> (n, chunk) via voc.step."""
    cache = voc.init_cache(1)
    outs = []
    for i in range(zq_frames.shape[0]):
        y, cache = voc.step(params, cache, zq_frames[i][None])
        outs.append(np.asarray(y[0, :, 0]))
    return np.stack(outs)


@pytest.mark.parametrize("make_voc", [_mgc_voc, _mrf_voc],
                         ids=["mgc", "mrf"])
def test_vocoder_kernel_matches_xla_streaming(rng, make_voc):
    voc = make_voc()
    params = voc.init(jax.random.PRNGKey(0))
    chunk = 3 * voc.total_upsample
    z_rows = chunk // voc.total_upsample
    init_cache, run = make_mega_vocoder(voc, params, chunk,
                                        weight_dtype=jnp.float32,
                                        interpret=True)
    zq = jnp.asarray(rng.standard_normal((4, z_rows, 8)), jnp.float32)
    out, _ = run(init_cache(), zq)
    ref = _xla_stream(voc, params, zq)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_vocoder_kernel_group_pack_off_matches_xla_and_packed(rng):
    """The unpacked per-group path (group_pack_max_lanes=0) stays exact,
    and the packed block-diagonal path agrees with it bit-for-bit in f32
    (block-diag zeros contribute exactly 0 to each tap accumulation)."""
    voc = _mgc_voc()
    params = voc.init(jax.random.PRNGKey(3))
    chunk = 3 * voc.total_upsample
    z_rows = chunk // voc.total_upsample
    zq = jnp.asarray(rng.standard_normal((4, z_rows, 8)), jnp.float32)
    ic0, run0 = make_mega_vocoder(voc, params, chunk,
                                  weight_dtype=jnp.float32,
                                  interpret=True, group_pack_max_lanes=0)
    icp, runp = make_mega_vocoder(voc, params, chunk,
                                  weight_dtype=jnp.float32,
                                  interpret=True)
    out0, _ = run0(ic0(), zq)
    outp, _ = runp(icp(), zq)
    ref = _xla_stream(voc, params, zq)
    np.testing.assert_allclose(np.asarray(out0), ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(outp), np.asarray(out0), atol=2e-6)


def test_vocoder_kernel_stats_normalization_folded(rng):
    stats = np.stack([rng.standard_normal(8).astype(np.float32),
                      0.5 + rng.random(8).astype(np.float32)])
    voc = _mgc_voc(stats=stats)
    params = voc.init(jax.random.PRNGKey(1))
    chunk = 2 * voc.total_upsample
    init_cache, run = make_mega_vocoder(voc, params, chunk,
                                        weight_dtype=jnp.float32,
                                        interpret=True)
    zq = jnp.asarray(rng.standard_normal((3, 2, 8)), jnp.float32)
    out, _ = run(init_cache(), zq)
    ref = _xla_stream(voc, params, zq)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_vocoder_kernel_cache_continues_across_dispatches(rng):
    voc = _mgc_voc()
    params = voc.init(jax.random.PRNGKey(2))
    chunk = 2 * voc.total_upsample
    init_cache, run = make_mega_vocoder(voc, params, chunk,
                                        weight_dtype=jnp.float32,
                                        interpret=True)
    zq = jnp.asarray(rng.standard_normal((6, 2, 8)), jnp.float32)
    full, _ = run(init_cache(), zq)
    cache = init_cache()
    a, cache = run(cache, zq[:3])
    b, _ = run(cache, zq[3:])
    np.testing.assert_allclose(np.asarray(jnp.concatenate([a, b])),
                               np.asarray(full), atol=1e-6)


def test_vocoder_kernel_lookup_consumes_wire_codes(rng):
    """With vq_embed the pipeline consumes flattened int32 wire indices and
    matches codebook-lookup -> vocoder streaming decode (the reference rx,
    utils/audiodec.py:96-103)."""
    voc = _mgc_voc()
    params = voc.init(jax.random.PRNGKey(3))
    n_books, code_dim, book_k = 2, 8, 12
    embed = jnp.asarray(rng.standard_normal((n_books, code_dim, book_k)),
                        jnp.float32)
    chunk = 2 * voc.total_upsample
    init_cache, run = make_mega_vocoder(voc, params, chunk,
                                        weight_dtype=jnp.float32,
                                        interpret=True, vq_embed=embed)
    idx = rng.integers(0, book_k, size=(4, 2, n_books)).astype(np.int32)
    idx = idx + (np.arange(n_books) * book_k)[None, None, :]  # wire format
    out, _ = run(init_cache(), jnp.asarray(idx))
    # reference lookup: sum per-book embeddings (vq_module.py:151-161)
    flat = jnp.concatenate([embed[l].T for l in range(n_books)])  # (L*K, D)
    zq = flat[jnp.asarray(idx)].sum(axis=2)  # (n, z_rows, D)
    ref = _xla_stream(voc, params, zq)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_vocoder_kernel_flagship_assembles_and_segments(rng):
    """The AudioDec v1 vocoder (19M params) must split into several
    VMEM-budget segments and still match XLA streaming."""
    voc = HiFiGANGenerator(
        in_channels=64, out_channels=1, channels=512, kernel_size=7,
        upsample_scales=(5, 5, 4, 3), upsample_kernel_sizes=(10, 10, 8, 6),
        resblock_kernel_sizes=(11,), resblock_dilations=((1, 3, 5),),
        groups=3, bias=True, use_additional_convs=True,
    )
    params = voc.init(jax.random.PRNGKey(4))
    chunk = voc.total_upsample  # one 300-sample frame per grid step
    init_cache, run = make_mega_vocoder(voc, params, chunk,
                                        weight_dtype=jnp.float32,
                                        interpret=True)
    assert run.num_segments >= 4  # ~19M params can't fit one kernel
    zq = jnp.asarray(rng.standard_normal((2, 1, 64)), jnp.float32)
    out, _ = run(init_cache(), zq)
    ref = _xla_stream(voc, params, zq)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_vocoder_scan_stream_chain_matches_xla(rng):
    """make_vocoder_scan_stream: the full preset chain (symAD PQC tx ->
    wire codes -> vocoder rx) through the fused kernels must match the XLA
    per-frame fallback exactly (f32 weights)."""
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.stream import make_vocoder_scan_stream

    codec = AudioDecGenerator(
        encode_channels=8, decode_channels=8, code_dim=16, codebook_num=3,
        codebook_size=32, enc_ratios=(2, 4), dec_ratios=(4, 2),
        enc_strides=(3, 4), dec_strides=(4, 3), use_pqc=True,
    )
    codec_params, vq_state = codec.init(jax.random.PRNGKey(0))
    voc = HiFiGANGenerator(
        in_channels=16, out_channels=1, channels=16, kernel_size=7,
        upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 2),), groups=2,
    )
    voc_params = voc.init(jax.random.PRNGKey(1))
    frame = 2 * codec.hop
    frames = jnp.asarray(rng.standard_normal((5, frame)), jnp.float32)

    run_xla = make_vocoder_scan_stream(codec, codec_params, vq_state,
                                       voc, voc_params, frame, backend="xla")
    ref, _ = run_xla(run_xla.init_cache(), frames)

    run_fused = make_vocoder_scan_stream(
        codec, codec_params, vq_state, voc, voc_params, frame,
        backend="pallas", interpret=True, weight_dtype=jnp.float32)
    out, _ = run_fused(run_fused.init_cache(), frames)
    assert run_fused is not run_xla
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_vocoder_receiver_fused_backend_matches_xla(rng):
    """VocoderReceiver(backend='pallas'): priming (long chunk) and
    steady-state frames share one chunk-agnostic cache and match the XLA
    receiver, wire codes in."""
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.stream.runtime import VocoderReceiver

    codec = AudioDecGenerator(
        encode_channels=8, decode_channels=8, code_dim=16, codebook_num=3,
        codebook_size=32, enc_ratios=(2, 4), dec_ratios=(4, 2),
        enc_strides=(3, 4), dec_strides=(4, 3), use_pqc=True,
    )
    _, vq_state = codec.init(jax.random.PRNGKey(0))
    voc = HiFiGANGenerator(
        in_channels=16, out_channels=1, channels=16, kernel_size=7,
        upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 2),), groups=2,
    )
    voc_params = voc.init(jax.random.PRNGKey(1))

    rx_xla = VocoderReceiver(codec, voc, voc_params, vq_state, batch=1)
    rx_fused = VocoderReceiver(codec, voc, voc_params, vq_state, batch=1,
                               backend="pallas", weight_dtype=jnp.float32,
                               interpret=True)
    assert rx_fused._fused_ok

    L, K = 3, 32
    def wire(t):  # (L, 1, t) flattened wire indices
        base = rng.integers(0, K, size=(L, 1, t)).astype(np.int32)
        return jnp.asarray(base + (np.arange(L) * K)[:, None, None])

    prime = wire(5)   # long priming chunk
    frames = [wire(2) for _ in range(3)]  # steady-state frames
    outs_x = [np.asarray(rx_xla.initial_decoder(prime))]
    outs_f = [np.asarray(rx_fused.initial_decoder(prime))]
    for f in frames:
        outs_x.append(np.asarray(rx_xla.decode(f)))
        outs_f.append(np.asarray(rx_fused.decode(f)))
    assert len(rx_fused._fused_runs) == 2  # one build per chunk size
    for a, b in zip(outs_f, outs_x):
        np.testing.assert_allclose(a, b, atol=2e-5)
