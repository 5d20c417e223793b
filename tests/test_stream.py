"""Streaming runtime tests: codec roundtrip, streamer pipeline, stats,
frame-drop protection, multi-stream batching."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dl_speech_enhancement_tpu.models import AudioDecGenerator
from dl_speech_enhancement_tpu.stream import (
    AudioCodec,
    AudioCodecStreamer,
    StreamingTransmitter,
    StreamingReceiver,
)

SMALL = dict(
    encode_channels=8, decode_channels=8, code_dim=16, codebook_num=2,
    codebook_size=32, enc_ratios=(2, 4), dec_ratios=(4, 2),
    enc_strides=(3, 4), dec_strides=(4, 3),
)


@pytest.fixture(scope="module")
def pqc_model():
    gen = AudioDecGenerator(**SMALL, use_pqc=True)
    params, vq_state = gen.init(jax.random.PRNGKey(0))
    return gen, params, vq_state


@pytest.fixture(scope="module")
def plain_model():
    gen = AudioDecGenerator(**SMALL, use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(0))
    return gen, params, None


def test_codec_tx_rx_roundtrip(pqc_model, rng):
    gen, params, vq_state = pqc_model
    codec = AudioCodec(gen, params, vq_state, receptive_length=gen.hop * 8)
    codec.load()  # primes both sides
    chunk = rng.standard_normal((1, gen.hop * 4, 1)).astype(np.float32)
    idx = codec._encode(jnp.asarray(chunk))
    assert idx.dtype in (jnp.int32, jnp.int64)
    assert idx.shape == (2, 1, 4)  # (codebooks, batch, frames)
    y = codec._decode(idx)
    assert y.shape == (1, gen.hop * 4, 1)
    assert np.all(np.isfinite(np.asarray(y)))


def test_codec_without_pqc_roundtrip(plain_model, rng):
    gen, params, _ = plain_model
    codec = AudioCodec(gen, params, None, receptive_length=gen.hop * 8)
    codec.load()
    chunk = rng.standard_normal((1, gen.hop * 4, 1)).astype(np.float32)
    z = codec._encode(jnp.asarray(chunk))
    assert z.shape == (1, 4, 32)  # raw features cross the boundary
    y = codec._decode(z)
    assert y.shape == (1, gen.hop * 4, 1)


def test_streamer_pipeline_processes_all_frames(pqc_model, rng):
    gen, params, vq_state = pqc_model
    frame = gen.hop * 2
    streamer = AudioCodecStreamer(
        gen, params, vq_state, frame_size=frame, sample_rate=4800,
        max_latency=10.0, receptive_length=gen.hop * 8,
    )
    streamer.load()
    audio = rng.standard_normal((1, frame * 10, 1)).astype(np.float32) * 0.3
    out = streamer.run_array(audio)
    stats = streamer.stats()
    assert stats["frames"] == 10
    assert stats["frame_drops"] == 0
    assert stats["encoder_ms_mean"] > 0
    assert stats["decoder_ms_mean"] > 0
    # output has the same total length (underflow zeros at the head)
    assert out.shape[1] >= frame * 9
    # default fused mode: per-side numbers are the labeled 50/50 estimate,
    # no calibration dispatches at warmup
    assert stats["timing_mode"] == "fused-estimated-split"
    assert stats["enc_frac"] == 0.5


def test_streamer_calibrated_split_opt_in(pqc_model, rng):
    """calibrate_split=True times real separate enc/dec dispatches at
    warmup and labels the stats accordingly."""
    gen, params, vq_state = pqc_model
    frame = gen.hop * 2
    streamer = AudioCodecStreamer(
        gen, params, vq_state, frame_size=frame, sample_rate=4800,
        max_latency=10.0, receptive_length=gen.hop * 8,
        calibrate_split=True,
    )
    streamer.load()
    audio = rng.standard_normal((1, frame * 4, 1)).astype(np.float32) * 0.3
    streamer.run_array(audio)
    stats = streamer.stats()
    assert stats["timing_mode"] == "fused-calibrated-split"
    assert 0.0 < stats["enc_frac"] < 1.0


def test_streamer_equivalence_with_direct_codec(pqc_model, rng):
    """run_array output must equal direct chunked tx->rx (modulo the pipeline
    delay of initial underflow zero-frames)."""
    gen, params, vq_state = pqc_model
    frame = gen.hop * 2
    audio = rng.standard_normal((1, frame * 8, 1)).astype(np.float32) * 0.3

    codec = AudioCodec(gen, params, vq_state, receptive_length=gen.hop * 8)
    codec.load()
    direct = []
    for i in range(8):
        idx = codec._encode(jnp.asarray(audio[:, i * frame : (i + 1) * frame]))
        direct.append(np.asarray(codec._decode(idx)))
    direct = np.concatenate(direct, axis=1)

    streamer = AudioCodecStreamer(
        gen, params, vq_state, frame_size=frame, sample_rate=4800,
        max_latency=10.0, receptive_length=gen.hop * 8,
    )
    streamer.load()
    out = streamer.run_array(audio)
    # underflow zero-frames may interleave anywhere (output queue empty while
    # the encoder catches up) — the *produced* frames must match the direct
    # sequence in order.
    produced = [out[:, i * frame : (i + 1) * frame]
                for i in range(out.shape[1] // frame)]
    nonzero = [p for p in produced if np.abs(p).sum() > 0]
    assert len(nonzero) >= 4, "too few frames produced"
    got = np.concatenate(nonzero[:8], axis=1)
    np.testing.assert_allclose(got, direct[:, : got.shape[1]], atol=1e-5)


def test_streamer_drops_frames_under_overload(pqc_model, rng):
    """Latency above max_latency flushes all queues and counts drops
    (bin/stream.py:253-267 semantics), exercised deterministically."""
    import time

    gen, params, vq_state = pqc_model
    frame = gen.hop * 2
    streamer = AudioCodecStreamer(
        gen, params, vq_state, frame_size=frame, sample_rate=4800,
        max_latency=0.01, receptive_length=gen.hop * 8,
    )
    # no worker threads: enqueue a stale output + backlog manually
    stale = np.zeros((1, frame, 1), np.float32)
    streamer.output_queue.put((stale, time.perf_counter() - 1.0))  # 1 s late
    streamer.decoder_queue.put(("backlog", time.perf_counter()))
    streamer.encoder_queue.put(("backlog", time.perf_counter()))
    out = streamer._process(stale)
    stats = streamer.stats()
    assert stats["frame_drops"] >= 2  # the two backlog entries were flushed
    assert streamer.encoder_queue.qsize() == 0
    assert streamer.decoder_queue.qsize() == 0
    assert stats["latency_ms_mean"] > 100


def test_vocoder_receiver_streaming(pqc_model, rng):
    """Analyzer tx + HiFiGAN vocoder rx: codes cross the boundary, the
    vocoder streams the audio (the reference's v0-v3 preset pairing)."""
    import jax
    from dl_speech_enhancement_tpu.models import HiFiGANGenerator
    from dl_speech_enhancement_tpu.stream.runtime import (
        StreamingTransmitter, VocoderReceiver,
    )

    gen, params, vq_state = pqc_model
    voc = HiFiGANGenerator(
        in_channels=16, out_channels=1, channels=32, kernel_size=7,
        upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
    )
    v_params = voc.init(jax.random.PRNGKey(9))
    tx = StreamingTransmitter(gen, params, vq_state, batch=1)
    rx = VocoderReceiver(gen, voc, v_params, vq_state, batch=1)
    frame = gen.hop * 2
    outs = []
    for i in range(4):
        chunk = jnp.asarray(
            rng.standard_normal((1, frame, 1)).astype(np.float32) * 0.3)
        idx = tx.encode(chunk)
        y = rx.decode(idx)
        assert y.shape == (1, frame, 1)  # vocoder upsample 4*3 == hop
        outs.append(np.asarray(y))
    assert np.all(np.isfinite(np.concatenate(outs, axis=1)))


def test_scan_stream_mega_path_matches_xla(plain_model, rng):
    """make_scan_stream with frame_size routes single-stream without-PQC
    through the whole-stack mega kernel (interpret mode here); outputs must
    match the XLA scan path at bf16-weight tolerance."""
    from dl_speech_enhancement_tpu.stream import make_scan_stream

    gen, params, _ = plain_model
    frame = gen.hop * 2
    n = 4
    frames = jnp.asarray(
        rng.standard_normal((n, 1, frame, 1)).astype(np.float32) * 0.3)

    run_xla = make_scan_stream(gen, params, batch=1, backend="xla")
    ys_ref, _ = run_xla(run_xla.init_cache(), frames)

    run_mega = make_scan_stream(gen, params, batch=1, backend="pallas",
                                frame_size=frame, interpret=True)
    assert run_mega.__name__ == "run_mega"  # the kernel path was taken
    ys, _ = run_mega(run_mega.init_cache(), frames)
    assert ys.shape == ys_ref.shape
    # default mega weights are bf16 (activations f32) -> ~1e-2 tolerance
    scale = float(np.max(np.abs(np.asarray(ys_ref)))) + 1e-9
    np.testing.assert_allclose(np.asarray(ys) / scale,
                               np.asarray(ys_ref) / scale, atol=2e-2)


def test_scan_stream_auto_routing_policy():
    """'auto' resolution follows the measured A/Bs (docs/SCALING.md):
    mega for batch==1 on an accelerator; XLA for batch>1 (XLA batching
    wins the controlled A/B for BOTH codecs — the round-5 control arm
    reversed round 4's stacked-PQC reading); XLA on CPU. Explicit
    requests pass through untouched."""
    from dl_speech_enhancement_tpu.stream.runtime import resolve_scan_backend

    r = resolve_scan_backend
    # on an accelerator
    assert r("auto", on_accelerator=True, batch=1, use_pqc=False) == "pallas"
    assert r("auto", on_accelerator=True, batch=1, use_pqc=True) == "pallas"
    assert r("auto", on_accelerator=True, batch=16, use_pqc=True) == "xla"
    assert r("auto", on_accelerator=True, batch=16, use_pqc=False) == "xla"
    # CPU backend: always XLA
    assert r("auto", on_accelerator=False, batch=1, use_pqc=True) == "xla"
    assert r("auto", on_accelerator=False, batch=16, use_pqc=True) == "xla"
    # explicit requests are honored unchanged
    assert r("pallas", on_accelerator=True, batch=16, use_pqc=False) == \
        "pallas"
    assert r("xla", on_accelerator=True, batch=1, use_pqc=True) == "xla"


def test_scan_stream_mega_falls_back_on_uncovered_topology(rng):
    """Topologies the mega kernel can't assemble (first encoder stride not
    dividing 6) must fall back to the fused-chain/XLA path, not crash."""
    from dl_speech_enhancement_tpu.stream import make_scan_stream

    gen = AudioDecGenerator(
        encode_channels=8, decode_channels=8, code_dim=16, codebook_num=2,
        codebook_size=32, enc_ratios=(2, 4), dec_ratios=(4, 2),
        enc_strides=(4, 3), dec_strides=(3, 4), use_pqc=False,
    )
    params, _ = gen.init(jax.random.PRNGKey(0))
    frame = gen.hop * 2
    run = make_scan_stream(gen, params, batch=1, backend="pallas",
                           frame_size=frame, interpret=True)
    frames = jnp.asarray(
        rng.standard_normal((2, 1, frame, 1)).astype(np.float32) * 0.3)
    ys, _ = run(run.init_cache(), frames)
    assert np.all(np.isfinite(np.asarray(ys)))


def test_scan_stream_matches_framewise(pqc_model, rng):
    """The on-device lax.scan streaming path == the frame-by-frame runtime."""
    from dl_speech_enhancement_tpu.stream import make_scan_stream

    gen, params, vq_state = pqc_model
    frame = gen.hop * 2
    n = 6
    audio = rng.standard_normal((1, frame * n, 1)).astype(np.float32) * 0.3

    codec = AudioCodec(gen, params, vq_state, receptive_length=gen.hop * 8)
    framewise = []
    for i in range(n):
        idx = codec._encode(jnp.asarray(audio[:, i * frame : (i + 1) * frame]))
        framewise.append(np.asarray(codec._decode(idx)))
    framewise = np.concatenate(framewise, axis=1)

    run = make_scan_stream(gen, params, vq_state, batch=1)
    frames = jnp.asarray(audio.reshape(1, n, frame, 1).transpose(1, 0, 2, 3))
    ys, _ = run(run.init_cache(), frames)  # (N, B, frame, 1)
    scanned = np.asarray(ys).transpose(1, 0, 2, 3).reshape(1, n * frame, 1)
    np.testing.assert_allclose(scanned, framewise, atol=1e-5)


def test_streamer_concurrent_sessions_thread_safety(pqc_model, rng):
    """Two streamers running simultaneously in one process must not corrupt
    each other's caches/queues (thread-safety stress; the reference relies
    on queue.Queue with no isolation guarantees, SURVEY §5.2)."""
    import threading

    gen, params, vq_state = pqc_model
    frame = gen.hop * 2
    audio = rng.standard_normal((1, frame * 8, 1)).astype(np.float32) * 0.3

    def make():
        s = AudioCodecStreamer(gen, params, vq_state, frame_size=frame,
                               sample_rate=4800, max_latency=10.0,
                               receptive_length=gen.hop * 8)
        s.load()
        return s

    results = {}

    def run(name):
        s = make()
        # generous drain: under full-suite CPU contention the first jit
        # compiles can eat most of the default 10 s window (seen flaky)
        results[name] = s.run_array(audio, drain_timeout=120.0)

    threads = [threading.Thread(target=run, args=(f"s{i}",)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert set(results) == {"s0", "s1"}
    # identical inputs + identical models => identical produced frames
    def produced(out):
        frames = [out[:, i * frame : (i + 1) * frame]
                  for i in range(out.shape[1] // frame)]
        return np.concatenate([f for f in frames if np.abs(f).sum() > 0], axis=1)

    a, b = produced(results["s0"]), produced(results["s1"])
    n = min(a.shape[1], b.shape[1])
    np.testing.assert_allclose(a[:, :n], b[:, :n], atol=1e-5)


def test_multi_stream_batching(pqc_model, rng):
    """B streams batched through one cache: each stream's output equals its
    single-stream run (stream independence)."""
    gen, params, vq_state = pqc_model
    frame = gen.hop * 2
    tx4 = StreamingTransmitter(gen, params, vq_state, batch=4)
    rx4 = StreamingReceiver(gen, params, vq_state, batch=4)
    audio = rng.standard_normal((4, frame * 4, 1)).astype(np.float32) * 0.3

    outs_batched = []
    for i in range(4):
        idx = tx4.encode(jnp.asarray(audio[:, i * frame : (i + 1) * frame]))
        outs_batched.append(np.asarray(rx4.decode(idx)))
    batched = np.concatenate(outs_batched, axis=1)

    tx1 = StreamingTransmitter(gen, params, vq_state, batch=1)
    rx1 = StreamingReceiver(gen, params, vq_state, batch=1)
    outs_single = []
    for i in range(4):
        idx = tx1.encode(jnp.asarray(audio[2:3, i * frame : (i + 1) * frame]))
        outs_single.append(np.asarray(rx1.decode(idx)))
    single = np.concatenate(outs_single, axis=1)
    np.testing.assert_allclose(batched[2:3], single, atol=1e-5)


def test_tx_rx_distinct_devices(pqc_model, rng):
    """tx and rx endpoints pinned to different devices (the reference's
    tx_device/rx_device API, bin/stream.py:26-35): the int32 code indices
    cross the device boundary; results equal the same-device codec."""
    devs = jax.devices()
    assert len(devs) >= 2, "conftest provides 8 virtual CPU devices"
    gen, params, vq_state = pqc_model
    frame = gen.hop * 2

    codec2 = AudioCodec(gen, params, vq_state, receptive_length=gen.hop * 8,
                        tx_device=devs[0], rx_device=devs[1])
    codec2.load()
    codec1 = AudioCodec(gen, params, vq_state, receptive_length=gen.hop * 8)
    codec1.load()

    audio = rng.standard_normal((1, frame * 4, 1)).astype(np.float32) * 0.3
    for i in range(4):
        chunk = jnp.asarray(audio[:, i * frame : (i + 1) * frame])
        idx2 = codec2._encode(chunk)
        assert list(idx2.devices()) == [devs[0]]  # produced on tx device
        y2 = codec2._decode(idx2)
        assert list(y2.devices()) == [devs[1]]  # decoded on rx device
        y1 = codec1._decode(codec1._encode(chunk))
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-6)


def test_streamer_distinct_devices_pipeline(plain_model, rng):
    """Full streamer pipeline across two devices (fused mode is disabled
    automatically; the two-thread tx/rx pipeline carries the codes over)."""
    devs = jax.devices()
    gen, params, _ = plain_model
    frame = gen.hop * 2
    streamer = AudioCodecStreamer(
        gen, params, None, frame_size=frame, sample_rate=4800,
        max_latency=10.0, receptive_length=gen.hop * 8,
        tx_device=devs[0], rx_device=devs[1],
    )
    assert not streamer.fused
    streamer.load()
    audio = rng.standard_normal((1, frame * 6, 1)).astype(np.float32) * 0.3
    out = streamer.run_array(audio)
    stats = streamer.stats()
    assert stats["frames"] == 6
    assert stats["timing_mode"] == "per-side"
    assert np.all(np.isfinite(out))


def test_scan_stream_pqc_mega_path_matches_xla(pqc_model, rng):
    """make_scan_stream with frame_size routes the PQC codec through the
    mega kernel too (in-kernel projector + RVQ + lookup)."""
    from dl_speech_enhancement_tpu.stream import make_scan_stream

    gen, params, vq_state = pqc_model
    frame = gen.hop * 2
    frames = jnp.asarray(
        rng.standard_normal((3, 1, frame, 1)).astype(np.float32) * 0.3)

    run_xla = make_scan_stream(gen, params, vq_state, batch=1, backend="xla")
    ys_ref, _ = run_xla(run_xla.init_cache(), frames)

    run_mega = make_scan_stream(gen, params, vq_state, batch=1,
                                backend="pallas", frame_size=frame,
                                interpret=True)
    assert run_mega.__name__ == "run_mega"
    ys, _ = run_mega(run_mega.init_cache(), frames)
    scale = float(np.max(np.abs(np.asarray(ys_ref)))) + 1e-9
    np.testing.assert_allclose(np.asarray(ys) / scale,
                               np.asarray(ys_ref) / scale, atol=2e-2)

    # weight_dtype=f32 is the bit-exact-wire-parity configuration (see
    # make_mega_stream docstring): much tighter output agreement
    run_f32 = make_scan_stream(gen, params, vq_state, batch=1,
                               backend="pallas", frame_size=frame,
                               interpret=True, weight_dtype=jnp.float32)
    assert run_f32.__name__ == "run_mega"
    ys32, _ = run_f32(run_f32.init_cache(), frames)
    np.testing.assert_allclose(np.asarray(ys32) / scale,
                               np.asarray(ys_ref) / scale, atol=1e-4)


def test_vocoder_receiver_stacked_batch(pqc_model, rng):
    """VocoderReceiver(batch>1, backend='pallas') routes through the
    stacked batched vocoder kernel (ops/vocoder_stacked.py — VERDICT r4
    #5) and matches the XLA batched receiver stream for stream."""
    import jax
    from dl_speech_enhancement_tpu.models import HiFiGANGenerator
    from dl_speech_enhancement_tpu.stream.runtime import (
        StreamingTransmitter, VocoderReceiver,
    )

    gen, params, vq_state = pqc_model
    # v1-family topology (MultiGroupConv1d fusion) at toy size; the
    # stacked kernel covers exactly this decoder family
    voc = HiFiGANGenerator(
        in_channels=16, out_channels=1, channels=24, kernel_size=7,
        upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
        resblock_kernel_sizes=(5,), resblock_dilations=((1, 3),),
        groups=3)
    v_params = voc.init(jax.random.PRNGKey(9))
    B = 3
    tx = StreamingTransmitter(gen, params, vq_state, batch=B)
    rx_stk = VocoderReceiver(gen, voc, v_params, vq_state, batch=B,
                             backend="pallas", weight_dtype=jnp.float32,
                             interpret=True)
    rx_xla = VocoderReceiver(gen, voc, v_params, vq_state, batch=B,
                             backend="xla")
    frame = gen.hop * 2
    for i in range(3):
        chunk = jnp.asarray(
            rng.standard_normal((B, frame, 1)).astype(np.float32) * 0.3)
        idx = tx.encode(chunk)
        y_stk = rx_stk.decode(idx)
        y_xla = rx_xla.decode(idx)
        assert rx_stk._stacked_ok, "stacked route must be taken"
        assert y_stk.shape == y_xla.shape == (B, frame, 1)
        np.testing.assert_allclose(np.asarray(y_stk), np.asarray(y_xla),
                                   atol=3e-5, err_msg=f"chunk {i}")


def test_vocoder_receiver_stacked_mrf_falls_back(pqc_model, rng):
    """v0/v2/v3-family MultiReceptiveField decoders are outside the stacked
    batched kernel's coverage (a recorded negative: ~3x the audio-rate
    cache sites of the v1 grouped family — docs/SCALING.md round-5 MRF
    note). The receiver must fall back to the XLA batch path gracefully
    and still produce the right audio."""
    import jax
    from dl_speech_enhancement_tpu.models import HiFiGANGenerator
    from dl_speech_enhancement_tpu.stream.runtime import (
        StreamingTransmitter, VocoderReceiver,
    )

    gen, params, vq_state = pqc_model
    # groups=1 => MultiReceptiveField fusion (the v0 topology shape)
    voc = HiFiGANGenerator(
        in_channels=16, out_channels=1, channels=24, kernel_size=7,
        upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
        resblock_kernel_sizes=(3, 5), resblock_dilations=((1, 3), (1, 3)),
        groups=1)
    v_params = voc.init(jax.random.PRNGKey(9))
    B = 2
    tx = StreamingTransmitter(gen, params, vq_state, batch=B)
    rx = VocoderReceiver(gen, voc, v_params, vq_state, batch=B,
                         backend="pallas", interpret=True)
    rx_ref = VocoderReceiver(gen, voc, v_params, vq_state, batch=B,
                             backend="xla")
    chunk = jnp.asarray(
        rng.standard_normal((B, gen.hop * 2, 1)).astype(np.float32) * 0.3)
    idx = tx.encode(chunk)
    y = rx.decode(idx)
    assert not rx._stacked_ok  # fell back, stays off
    y_ref = rx_ref.decode(idx)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)
