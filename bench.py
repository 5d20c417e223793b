#!/usr/bin/env python3
"""Headline benchmark: 48 kHz streaming denoise real-time factor per chip.

Runs the flagship without-PQC streaming denoiser (the reference's proposed
model, 48 kHz / hop 300) over 25 ms frames with the full encode->decode
chain and a carried cache pytree — the exact chunked-streaming semantics of
the runtime — as a ``lax.scan`` over N frames in ONE device dispatch, so the
measurement reflects chip throughput rather than the host<->device tunnel
round-trip of this environment (a production deployment drives the chip
locally). Completion is serialized by fetching a scalar reduction of the
output (``block_until_ready`` is not a reliable fence on the tunneled
backend).

Baseline: the reference's live demo sustains ~1.0x real time on a laptop CPU
(25 ms windows; encode 21.57 ms + decode 24.83 ms overlapped across two
threads — DeepLearning_Poster.pdf Table 2). ``vs_baseline`` is the
single-stream x-real-time number. The driver's north star is >50x.

Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from dl_speech_enhancement_tpu.models import AudioDecGenerator

    sample_rate = 48000
    frame_size = 1200  # 25 ms @ 48 kHz, 4 code frames at hop 300
    n_frames = 1600    # 40 s of audio per long dispatch

    gen = AudioDecGenerator(use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(0))

    def chunk_step(cache, x):
        """Full tx+rx chain for one frame: encode -> (features) -> decode."""
        z, enc_cache = gen.encode_step(params, cache, x)
        y, dec_cache = gen.decode_step(params, cache, z)
        new_cache = dict(cache)
        new_cache.update(enc_cache)
        new_cache.update(dec_cache)
        return new_cache, jnp.sum(jnp.square(y))

    @jax.jit
    def run_stream(cache, frames):
        cache, energies = lax.scan(chunk_step, cache, frames)
        return jnp.sum(energies)

    # single-stream fast path: hand-fused Pallas residual chains
    from dl_speech_enhancement_tpu.ops.stream_kernel import make_fused_chunk_step
    fused_init_cache, fused_step = make_fused_chunk_step(gen, params)

    def fused_chunk(cache, x):
        y, new_cache = fused_step(cache, x[0])
        return new_cache, jnp.sum(jnp.square(y))

    @jax.jit
    def run_stream_fused(cache, frames):
        cache, energies = lax.scan(fused_chunk, cache, frames)
        return jnp.sum(energies)

    rng = np.random.default_rng(0)

    def measure(batch, trials=3, fused=False):
        """Per-frame device time via a two-point fit: the scalar-fetch fence
        costs one host<->device round trip (~30 ms through this
        environment's tunnel), so time scans of two lengths and take the
        slope — the RTT intercept cancels."""
        n1, n2 = n_frames // 4, n_frames

        run = run_stream_fused if fused else run_stream

        def timed(n):
            cache = fused_init_cache() if fused else gen.init_cache(batch)
            frames = jax.device_put(
                rng.standard_normal((n, batch, frame_size, 1)).astype(np.float32)
            )
            _ = float(run(cache, frames))  # compile + settle
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                _ = float(run(cache, frames))  # scalar fetch = fence
                best = min(best, time.perf_counter() - t0)
            return best

        return (timed(n2) - timed(n1)) / (n2 - n1)

    frame_time = frame_size / sample_rate
    t_single_xla = measure(1)
    t_single = min(t_single_xla, measure(1, fused=True))
    x_rt_single = frame_time / t_single

    streams = 16
    t_batch = measure(streams)
    x_rt_per_stream = frame_time / t_batch
    realtime_streams = x_rt_per_stream * streams

    # single-dispatch end-to-end latency (incl. host round trip): one frame
    single = jax.jit(lambda c, x: chunk_step(c, x))
    cache = gen.init_cache(1)
    frame = jax.device_put(rng.standard_normal((1, frame_size, 1)).astype(np.float32))
    _, e = single(cache, frame)
    _ = float(e)
    lats = []
    for _ in range(20):
        t0 = time.perf_counter()
        _, e = single(cache, frame)
        _ = float(e)
        lats.append(time.perf_counter() - t0)
    dispatch_latency_ms = float(np.median(lats) * 1e3)

    # offline (parallel, non-streaming) denoise throughput: 16 x 2 s batch,
    # K forwards scanned per dispatch (same RTT-cancelling two-point fit)
    def offline_scan(k):
        @jax.jit
        def run(xb):
            def body(c, _):
                y = gen(params, None, xb + c * 1e-20, train=False)[0]
                return jnp.sum(jnp.square(y)) * 1e-20, None
            s, _ = jax.lax.scan(body, 0.0, None, length=k)
            return s
        xb = jax.device_put(
            rng.standard_normal((16, 96000, 1)).astype(np.float32))
        _ = float(run(xb))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(run(xb))
            best = min(best, time.perf_counter() - t0)
        return best

    t_off = (offline_scan(8) - offline_scan(2)) / 6
    offline_x_rt = (16 * 2.0) / t_off

    result = {
        "metric": "streaming_denoise_x_realtime_48k",
        "value": round(x_rt_single, 2),
        "unit": "x_realtime_per_stream",
        "vs_baseline": round(x_rt_single / 1.0, 2),
        "detail": {
            "frame_ms_device": round(t_single * 1e3, 3),
            "frame_ms_device_xla": round(t_single_xla * 1e3, 3),
            "frame_size": frame_size,
            "streams_16_frame_ms": round(t_batch * 1e3, 3),
            "realtime_streams_per_chip_at_16": round(realtime_streams, 1),
            "offline_denoise_x_realtime": round(offline_x_rt, 1),
            "single_dispatch_latency_ms": round(dispatch_latency_ms, 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
