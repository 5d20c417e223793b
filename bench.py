#!/usr/bin/env python3
"""Headline benchmark: 48 kHz streaming denoise real-time factor per chip.

Runs the flagship without-PQC streaming denoiser (the reference's proposed
model, 48 kHz / hop 300) frame-by-frame — 1200-sample (25 ms) frames, the
whole encode->decode chain fused into ONE jitted chunk step with a carried
cache pytree — on the real TPU chip, and reports how many times faster than
real time a single stream runs, plus multi-stream throughput.

Baseline: the reference's live demo sustains ~1.0x real time on a laptop CPU
(25 ms windows; encode 21.57 ms + decode 24.83 ms overlapped across two
threads — DeepLearning_Poster.pdf Table 2). ``vs_baseline`` is therefore the
single-stream x-real-time number itself. The driver's north star is >50x.

Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from dl_speech_enhancement_tpu.models import AudioDecGenerator

    sample_rate = 48000
    frame_size = 1200  # 25 ms @ 48 kHz, 4 code frames at hop 300
    n_warmup, n_frames = 20, 200

    gen = AudioDecGenerator(use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(0))

    def chunk_step(params, cache, x):
        """Full tx+rx chain for one frame: encode -> (features) -> decode."""
        z, enc_cache = gen.encode_step(params, cache, x)
        y, dec_cache = gen.decode_step(params, cache, z)
        new_cache = dict(cache)
        new_cache.update(enc_cache)
        new_cache.update(dec_cache)
        return y, new_cache

    step = jax.jit(chunk_step, donate_argnums=(1,))

    rng = np.random.default_rng(0)

    def run(batch, trials=5):
        """Per-frame wall time: best sustained rate over several trials
        (the tunnel to the chip adds dispatch jitter between runs)."""
        cache = gen.init_cache(batch)
        frames = [
            jnp.asarray(rng.standard_normal((batch, frame_size, 1)).astype(np.float32))
            for _ in range(8)
        ]
        y, cache = step(params, cache, frames[0])
        jax.block_until_ready((y, cache))
        for i in range(n_warmup):
            y, cache = step(params, cache, frames[i % 8])
        jax.block_until_ready(y)
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            for i in range(n_frames):
                y, cache = step(params, cache, frames[i % 8])
            jax.block_until_ready(y)
            best = min(best, (time.perf_counter() - t0) / n_frames)
        return best

    frame_time = frame_size / sample_rate
    t_single = run(1)
    x_rt_single = frame_time / t_single

    streams = 16
    t_batch = run(streams)
    x_rt_per_stream = frame_time / t_batch  # each stream advances per step
    realtime_streams = x_rt_per_stream * streams

    # offline (parallel, non-streaming) denoise throughput: batch of 8x 2s
    fwd = jax.jit(lambda p, x: gen(p, None, x, train=False)[0])
    xb = jnp.asarray(rng.standard_normal((8, 96000, 1)).astype(np.float32))
    y = fwd(params, xb)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(20):
        y = fwd(params, xb)
    jax.block_until_ready(y)
    t_off = (time.perf_counter() - t0) / 20
    offline_x_rt = (8 * 2.0) / t_off

    result = {
        "metric": "streaming_denoise_x_realtime_48k",
        "value": round(x_rt_single, 2),
        "unit": "x_realtime_per_stream",
        "vs_baseline": round(x_rt_single / 1.0, 2),
        "detail": {
            "frame_ms": round(t_single * 1e3, 3),
            "frame_size": frame_size,
            "streams_16_frame_ms": round(t_batch * 1e3, 3),
            "realtime_streams_per_chip_at_16": round(realtime_streams, 1),
            "offline_denoise_x_realtime": round(offline_x_rt, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
