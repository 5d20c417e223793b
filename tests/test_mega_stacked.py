"""Stacked-region batched mega-kernel equivalence tests (interpreter mode).

The stacked kernel (ops/mega_stacked.py) must reproduce gen.encode_step +
gen.decode_step frame by frame FOR EVERY STREAM in the batch, with the
per-stream cache regions carried in VMEM across grid steps and across
dispatches. Reference streaming semantics: bin/stream.py frame loop.
"""

import numpy as np

import jax
import jax.numpy as jnp

from dl_speech_enhancement_tpu.models import AudioDecGenerator
from dl_speech_enhancement_tpu.ops.mega_stacked import make_mega_stream_stacked


def _small_gen():
    return AudioDecGenerator(
        encode_channels=8, decode_channels=8, code_dim=16, codebook_num=2,
        codebook_size=32, enc_ratios=(2, 4), dec_ratios=(4, 2),
        enc_strides=(3, 4), dec_strides=(4, 3), use_pqc=False,
    )


def _xla_stream(gen, params, frames):
    """Reference per-frame streaming via the XLA step path (1 stream)."""
    cache = gen.init_cache(1)
    outs = []
    for x in frames:
        z, ec = gen.encode_step(params, cache, jnp.asarray(x[None, :, None]))
        cache.update(ec)
        y, dc = gen.decode_step(params, cache, z)
        cache.update(dc)
        outs.append(np.asarray(y)[0, :, 0])
    return np.stack(outs)


def test_mega_stacked_matches_xla_streams(rng):
    gen = _small_gen()
    params, _ = gen.init(jax.random.PRNGKey(0))
    chunk = gen.hop * 4
    B = 3
    init_cache, run = make_mega_stream_stacked(
        gen, params, chunk, batch=B, weight_dtype=jnp.float32,
        interpret=True)
    frames = rng.standard_normal((3, B, chunk)).astype(np.float32) * 0.3
    out, _ = run(init_cache(), jnp.asarray(frames))
    out = np.asarray(out)
    for b in range(B):
        ref = _xla_stream(gen, params, frames[:, b])
        np.testing.assert_allclose(out[:, b], ref, atol=2e-5,
                                   err_msg=f"stream {b}")


def test_mega_stacked_cache_continues_across_dispatches(rng):
    gen = _small_gen()
    params, _ = gen.init(jax.random.PRNGKey(1))
    chunk = gen.hop * 2
    B = 2
    init_cache, run = make_mega_stream_stacked(
        gen, params, chunk, batch=B, weight_dtype=jnp.float32,
        interpret=True)
    frames = rng.standard_normal((4, B, chunk)).astype(np.float32) * 0.3
    whole, _ = run(init_cache(), jnp.asarray(frames))
    cache = init_cache()
    first, cache = run(cache, jnp.asarray(frames[:2]))
    second, _ = run(cache, jnp.asarray(frames[2:]))
    np.testing.assert_allclose(
        np.asarray(whole), np.concatenate(
            [np.asarray(first), np.asarray(second)]), atol=2e-5)


def _small_pqc_gen():
    return AudioDecGenerator(
        encode_channels=8, decode_channels=8, code_dim=16, codebook_num=3,
        codebook_size=32, enc_ratios=(2, 4), dec_ratios=(4, 2),
        enc_strides=(3, 4), dec_strides=(4, 3), use_pqc=True,
    )


def _xla_pqc_stream(gen, params, vq_state, frames):
    """Reference per-frame PQC streaming (1 stream): encode -> quantize
    (wire idx) -> lookup -> decode, via the XLA step path."""
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


def test_mega_stacked_pqc_matches_xla(rng):
    """PQC stacked kernel: same wire indices (exact) and same audio for
    every stream in the batch."""
    gen = _small_pqc_gen()
    params, vq_state = gen.init(jax.random.PRNGKey(4))
    chunk = gen.hop * 3
    B = 2
    init_cache, run = make_mega_stream_stacked(
        gen, params, chunk, batch=B, weight_dtype=jnp.float32,
        interpret=True, vq_state=vq_state)
    frames = rng.standard_normal((3, B, chunk)).astype(np.float32) * 0.3
    out, cache, codes = run(init_cache(), jnp.asarray(frames))
    out2, _, codes2 = run(cache, jnp.asarray(frames))  # cache continuation
    out, codes = np.asarray(out), np.asarray(codes)
    for b in range(B):
        ref_out, ref_codes = _xla_pqc_stream(gen, params, vq_state,
                                             frames[:, b])
        np.testing.assert_array_equal(codes[:, b], ref_codes,
                                      err_msg=f"stream {b}")
        np.testing.assert_allclose(out[:, b], ref_out, atol=2e-5,
                                   err_msg=f"stream {b}")


def test_scan_stream_routes_batched_pallas(rng):
    """make_scan_stream(backend='pallas', batch>1) must route to the
    stacked kernel and match the XLA backend bit-for-bit semantics."""
    from dl_speech_enhancement_tpu.stream import make_scan_stream

    gen = _small_gen()
    params, _ = gen.init(jax.random.PRNGKey(3))
    chunk = gen.hop * 2
    B = 2
    run_p = make_scan_stream(gen, params, batch=B, backend="pallas",
                             frame_size=chunk, interpret=True,
                             weight_dtype=jnp.float32)
    run_x = make_scan_stream(gen, params, batch=B, backend="xla")
    frames = rng.standard_normal((3, B, chunk, 1)).astype(np.float32) * 0.3
    yp, _ = run_p(run_p.init_cache(), jnp.asarray(frames))
    yx, _ = run_x(gen.init_cache(B), jnp.asarray(frames))
    assert yp.shape == yx.shape == frames.shape
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yx), atol=2e-5)


def test_mega_stacked_bf16_boundaries(rng):
    """bf16 inter-segment activations: same audio within bf16 tolerance
    (the int32 wire/code path and final audio dtype are unaffected)."""
    gen = _small_gen()
    params, _ = gen.init(jax.random.PRNGKey(7))
    chunk = gen.hop * 2
    B = 2
    init32, run32 = make_mega_stream_stacked(
        gen, params, chunk, batch=B, weight_dtype=jnp.float32,
        interpret=True, vmem_budget=1)  # force one segment per stage
    init16, run16 = make_mega_stream_stacked(
        gen, params, chunk, batch=B, weight_dtype=jnp.float32,
        interpret=True, vmem_budget=1, boundary_dtype=jnp.bfloat16)
    frames = rng.standard_normal((2, B, chunk)).astype(np.float32) * 0.3
    y32, _ = run32(init32(), jnp.asarray(frames))
    y16, _ = run16(init16(), jnp.asarray(frames))
    assert y16.dtype == jnp.float32
    scale = float(np.max(np.abs(np.asarray(y32)))) + 1e-6
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32),
                               atol=0.05 * scale)


def test_mega_stacked_flagship_topology(rng):
    """The real flagship (32..512 channels, strides 3/4/5/5) — the
    topology the bench measures; one frame, 2 streams, vs the XLA step."""
    gen = AudioDecGenerator(use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(2))
    chunk = gen.hop
    B = 2
    init_cache, run = make_mega_stream_stacked(
        gen, params, chunk, batch=B, weight_dtype=jnp.float32,
        interpret=True)
    frames = rng.standard_normal((2, B, chunk)).astype(np.float32) * 0.3
    out, _ = run(init_cache(), jnp.asarray(frames))
    out = np.asarray(out)
    for b in range(B):
        ref = _xla_stream(gen, params, frames[:, b])
        np.testing.assert_allclose(out[:, b], ref, atol=3e-4,
                                   err_msg=f"stream {b}")
