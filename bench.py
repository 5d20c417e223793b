#!/usr/bin/env python3
"""Headline benchmark: 48 kHz streaming denoise real-time factor per chip.

Runs the flagship without-PQC streaming denoiser (the reference's proposed
model, 48 kHz / hop 300) over 25 ms frames with the full encode->decode
chain and carried streaming caches — the exact chunked-streaming semantics
of the runtime — scanning N frames per device dispatch so the measurement
reflects chip throughput rather than the host<->device tunnel round-trip of
this environment (a production deployment drives the chip locally).
Completion is serialized by fetching a scalar reduction of the output
(``block_until_ready`` is not a reliable fence on the tunneled backend).

Two single-stream paths are timed and the faster wins the headline:

- **mega** (ops/mega_kernel.py): the whole encoder and decoder each as ONE
  Pallas kernel with ``grid=(n_frames,)`` — weights resident in VMEM for
  the whole dispatch, caches in VMEM scratch across frames. ~22 us/frame.
- **XLA**: ``lax.scan`` over the per-frame ``encode_step``/``decode_step``.
  ~77 us/frame — kept as the comparison arm and the fallback.

Methodology (round 5): each leg compiles ONE program (a long scan) and
times repeated value-fenced calls; the tunnel round-trip (~30 ms) is
measured separately with tiny scalar fetches and subtracted, and the scan
is sized so device time is >=10x the RTT. This replaces the round 2-4
two-length slope fits — same numbers (cross-checked on-chip, see
docs/SCALING.md round-5 table) at HALF the compiles, which matters because
cold-compile cost is what starved rounds 3 and 4.

**Capture hardening (round 5).** Two consecutive driver captures lost the
headline: round 3 was killed with nothing printed (rc=124), round 4 spent
688.7 s cold-compiling the then-first ``xla_single`` leg and budget-skipped
everything else, recording the 77 us fallback instead of the 22 us mega
path (VERDICT r4 #1). Defenses now in place:

- the MEGA leg runs FIRST and is the only required leg — if cold compiles
  eat the budget they buy the real headline, not the fallback;
- the JSON line is emitted from a ``finally``/``atexit`` path, from
  SIGTERM/SIGINT handlers, AND from a watchdog thread that fires at
  ``BENCH_HARD_S`` (default 2x budget) and hard-exits — so an external
  kill or a wedged device fetch still reports every leg collected so far;
- legs run under a wall-clock budget (``BENCH_BUDGET_S``, default 420 s)
  with cost estimates (warm-cache leg walls + compile slack); between
  timing walls a leg re-checks the budget and degrades to fewer walls
  instead of overrunning;
- ``tools/bench_seed_cache/`` (committed) pre-seeds the persistent compile
  cache with the headline legs' executables so even a fresh clone starts
  warm (entries are copied into the active cache dir before first use).

Roofline context in ``detail``: model FLOPs/frame (utils/profiling.py::
codec_flops_per_sample), achieved TFLOP/s, MFU vs the v5e bf16 peak
(394 TFLOP/s), and the mega path's HBM bytes/frame (cache spill + audio
I/O + feature hand-off + amortized weights).

Baseline: the reference's live demo sustains ~1.0x real time on a laptop
CPU (25 ms windows; encode 21.57 ms + decode 24.83 ms overlapped across two
threads — DeepLearning_Poster.pdf Table 2). ``vs_baseline`` is the
single-stream x-real-time number. The driver's north star is >50x.

Lower-priority legs (captured when budget allows):

- ``pqc_*``: the symAD codec (encode -> RVQ wire codes -> decode) through
  the same mega-kernel path;
- ``streams_{16,128}_*``: multi-stream XLA batching (streams/chip metric;
  128 is the measured serving sweet spot);
- ``stacked_16`` / ``stacked_pqc_16``: the stacked-region batched Pallas
  kernel (ops/mega_stacked.py) for both codecs, vs the XLA batch arm;
- ``train_*``: adversarial course-training throughput (audio-s/s) and
  XLA-cost-model MFU — the plain B=16 step and the large-batch arm
  (B=64 with per-block generator remat + per-sub-D checkpointed
  losses, the docs/SCALING.md memory levers);
- ``vocoder_rx_*``: the AudioDec v1 HiFiGAN vocoder receiver (19 M params)
  as the fused Pallas segment pipeline vs XLA scan;
- ``paired_v1_*``: the full paired-preset pipeline (symAD tx -> codes ->
  v1 vocoder rx), 16 streams batched (utils/audiodec.py v1 pairing);
- ``frame600_*``: frame 600 (12.5 ms) with the honest encode/decode split
  (poster Table 2 presentation);
- ``latency_offline``: single-dispatch end-to-end latency + offline
  (non-streaming) denoise throughput.

Prints ONE JSON line (always — see capture hardening above).
"""

import atexit
import json
import os
import shutil
import signal
import sys
import threading
import time

import numpy as np

N_WALLS = 5
V5E_PEAK_FLOPS = 394e12  # bf16 MXU peak, TPU v5e
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "420"))
HARD_S = float(os.environ.get("BENCH_HARD_S", str(2.0 * BUDGET_S)))
T0 = time.time()

# ------------------------------------------------------------ emission
# Shared mutable state read by the emitter. Leg code fills `detail` and
# `S` in place so a kill at ANY point reports everything collected.
detail = {"n_walls": N_WALLS, "budget_s": BUDGET_S, "hard_s": HARD_S}
legs_report = {}
S = {}  # cross-leg shared state (timings, models, step fns)
_emit_lock = threading.Lock()
_emitted = [False]
_finished = [False]


def _headline():
    ts = [S[k] for k in ("t_mega", "t_xla") if k in S]
    if not ts:
        return None
    return (1200 / 48000) / min(ts)


def emit(tag=None):
    with _emit_lock:
        if _emitted[0]:
            return
        _emitted[0] = True
    detail["legs"] = legs_report
    detail["elapsed_s"] = round(time.time() - T0, 1)
    if tag:
        detail["emitted_by"] = tag
    x_rt = _headline()
    result = {
        "metric": "streaming_denoise_x_realtime_48k",
        "value": round(x_rt, 2) if x_rt else None,
        "unit": "x_realtime_per_stream",
        "vs_baseline": round(x_rt / 1.0, 2) if x_rt else None,
        "detail": detail,
    }
    print(json.dumps(result))
    sys.stdout.flush()


def _watchdog():
    # Fires if the main thread is still going (or wedged in a blocked
    # device fetch/compile) at the hard deadline: emit what we have and
    # hard-exit so the driver's own timeout never sees an empty run.
    while True:
        left = HARD_S - (time.time() - T0)
        if _finished[0]:
            return
        if left <= 0:
            emit("watchdog")
            os._exit(0)
        time.sleep(min(left, 2.0))


def _on_signal(signum, frame):
    emit(f"signal_{signum}")
    os._exit(0)


def remaining():
    return BUDGET_S - (time.time() - T0)


def median_spread(xs):
    med = float(np.median(xs))
    spread = float((np.max(xs) - np.min(xs)) / med * 100.0) if med else 0.0
    return med, spread


def seed_compile_cache(cache_dir):
    """Copy committed seed executables into the active compile cache.

    The compile cache lives under gitignored ``.cache/`` — a fresh clone
    starts fully cold and the headline leg's first compile alone can eat
    the budget (round 4: 688.7 s). ``tools/bench_seed_cache/`` holds the
    cache entries for the headline legs, harvested from a cold run of this
    exact code; keys are content-addressed so copying them in is safe.
    """
    seed_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tools", "bench_seed_cache")
    try:
        if not os.path.isdir(seed_dir):
            return 0
        os.makedirs(cache_dir, exist_ok=True)
        n = 0
        for name in os.listdir(seed_dir):
            src = os.path.join(seed_dir, name)
            if name.endswith(".gz"):  # entries are committed gzipped
                dst = os.path.join(cache_dir, name[:-3])
                if not os.path.exists(dst):
                    import gzip
                    with gzip.open(src, "rb") as f:
                        data = f.read()
                    tmp = dst + ".tmp"
                    with open(tmp, "wb") as f:
                        f.write(data)
                    os.replace(tmp, dst)
                    n += 1
                continue
            dst = os.path.join(cache_dir, name)
            if not os.path.exists(dst):
                shutil.copyfile(src, dst)
                n += 1
        return n
    except Exception:
        return -1


def main():
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.utils.profiling import (
        codec_flops_per_sample,
        enable_compile_cache,
    )

    # persist compiled executables across runs: makes repeated bench runs
    # start measuring in seconds instead of minutes, and removes compile
    # noise from the driver's capture
    enable_compile_cache()
    cache_dir = jax.config.jax_compilation_cache_dir
    if cache_dir:
        detail["cache_seeded"] = seed_compile_cache(cache_dir)

    sample_rate = 48000
    frame_size = 1200  # 25 ms @ 48 kHz, 4 code frames at hop 300
    frame_time = frame_size / sample_rate

    gen = AudioDecGenerator(use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(0))

    # device-side frame synthesis: timing inputs are random audio, so
    # generate them ON the device (one tiny compile per shape) instead of
    # uploading through the ~77 MB/s tunnel (streams_128 frames alone
    # would be ~300 MB)
    _dev_cache = {}

    def dev_frames(shape):
        key = tuple(shape)
        if key not in _dev_cache:
            mk = jax.jit(lambda k: 0.1 * jax.random.normal(
                k, shape, jnp.float32))
            arr = mk(jax.random.PRNGKey(len(_dev_cache)))
            _ = float(arr.ravel()[0])  # settle
            _dev_cache[key] = arr
        return _dev_cache[key]

    _rtt_probe = [None]

    def measure_rtt(n=5):
        if _rtt_probe[0] is None:
            _rtt_probe[0] = jax.device_put(jnp.zeros(()))
            _ = float(_rtt_probe[0] + 1.0)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            _ = float(_rtt_probe[0] + 1.0)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def fit_n(run, make_cache, frames_shape_fn, n_hi, n_walls=N_WALLS):
        """Per-step device time for ``run(cache, frames)`` over ``n_hi``
        scan steps: one compile, repeated value-fenced walls, tunnel RTT
        measured separately and subtracted. ``n_hi`` is sized so device
        time >= 10x the ~30 ms RTT. Degrades to fewer walls (min 2) when
        the leg budget runs out mid-measurement."""
        frames = dev_frames(frames_shape_fn(n_hi))
        cache = make_cache()
        _ = float(run(cache, frames))  # compile + settle
        _ = float(run(cache, frames))  # warm
        rtt = measure_rtt()
        walls = []
        for _ in range(n_walls):
            t0 = time.perf_counter()
            _ = float(run(cache, frames))  # scalar fetch = fence
            walls.append(time.perf_counter() - t0)
            if len(walls) >= 2 and remaining() < 0:
                break  # intra-leg budget degradation
        med, spread = median_spread(walls)
        return max(med - rtt, 1e-9) / n_hi, spread

    # ---------------------------------------------------------------- legs

    def leg_mega_single():
        from dl_speech_enhancement_tpu.ops.mega_kernel import make_mega_stream

        mega_init_cache, mega_run = make_mega_stream(
            gen, params, chunk=frame_size)

        @jax.jit
        def run_stream_mega(cache, frames):
            out, _ = mega_run(cache, frames)
            return jnp.sum(jnp.square(out))

        n = 6400  # r4-compiled grid (cache hit); ~0.14 s device time
        t, spread = fit_n(run_stream_mega, mega_init_cache,
                          lambda k: (k, frame_size), n)
        S["t_mega"] = t
        detail["frame_us_mega"] = round(t * 1e6, 2)
        detail["frame_us_mega_spread_pct"] = round(spread, 1)

        # roofline accounting — attributed to the MEGA path specifically:
        # the HBM byte model below (cache drain, amortized VMEM-resident
        # bf16 weights) describes the mega kernel's traffic
        flops_frame = codec_flops_per_sample(gen) * frame_size
        cache_bytes = sum(int(np.prod(v.shape)) * 4
                          for v in mega_init_cache().values())
        n_params = sum(int(np.prod(np.asarray(l).shape))
                       for l in jax.tree_util.tree_leaves(params))
        z_bytes = (frame_size // gen.hop) * gen.encoder.out_channels * 4
        hbm_frame = (2 * frame_size * 4      # audio in + out (f32)
                     + 2 * z_bytes           # feature hand-off write + read
                     + cache_bytes           # cache drain (write every frame)
                     + 2 * n_params / n)     # bf16 weights / dispatch
        detail["flops_per_frame"] = int(flops_frame)
        detail["achieved_tflops_mega"] = round(flops_frame / t / 1e12, 2)
        detail["mfu_pct_v5e_bf16_mega"] = round(
            100.0 * flops_frame / t / V5E_PEAK_FLOPS, 2)
        detail["hbm_bytes_per_frame"] = int(hbm_frame)
        detail["hbm_gb_s"] = round(hbm_frame / t / 1e9, 2)

    def leg_xla_single():
        def chunk_step(cache, x):
            z, enc_cache = gen.encode_step(params, cache, x)
            y, dec_cache = gen.decode_step(params, cache, z)
            new_cache = dict(cache)
            new_cache.update(enc_cache)
            new_cache.update(dec_cache)
            return new_cache, jnp.sum(jnp.square(y))

        S["chunk_step"] = chunk_step

        @jax.jit
        def run_stream(cache, frames):
            cache, energies = lax.scan(chunk_step, cache, frames)
            return jnp.sum(energies)

        S["run_stream"] = run_stream
        t, spread = fit_n(run_stream, lambda: gen.init_cache(1),
                          lambda k: (k, 1, frame_size, 1), 6400)
        S["t_xla"] = t
        detail["frame_us_xla"] = round(t * 1e6, 2)
        detail["frame_us_xla_spread_pct"] = round(spread, 1)

    def leg_pqc():
        # PQC (symAD) codec single-stream: the full encode->RVQ->decode
        # chain through the same mega-kernel path (reference AudioDec v1
        # runs this at ~74 ms per 25 ms frame on its laptop baseline).
        from dl_speech_enhancement_tpu.ops.mega_kernel import make_mega_stream

        pqc_gen = AudioDecGenerator(use_pqc=True)
        pqc_params, pqc_vq = pqc_gen.init(jax.random.PRNGKey(0))
        S["pqc"] = (pqc_gen, pqc_params, pqc_vq)
        pqc_init_cache, pqc_run = make_mega_stream(
            pqc_gen, pqc_params, chunk=frame_size, vq_state=pqc_vq)

        @jax.jit
        def run_stream_pqc(cache, frames):
            out, _, codes = pqc_run(cache, frames)
            return jnp.sum(jnp.square(out)) + jnp.sum(codes)

        t, spread = fit_n(run_stream_pqc, pqc_init_cache,
                          lambda k: (k, frame_size), 6400)
        detail["pqc_frame_us"] = round(t * 1e6, 2)
        detail["pqc_frame_us_spread_pct"] = round(spread, 1)
        detail["pqc_x_realtime"] = round(frame_time / t, 1)

    def leg_streams16():
        # multi-stream batching (XLA path; streams/chip metric). Swept
        # on-chip 16..1024: per-stream time keeps improving to batch 128
        # (MXU rows), then regresses — 128 is the serving sweet spot, 16
        # kept for round-over-round continuity.
        t, spread = fit_n(S["run_stream"], lambda: gen.init_cache(16),
                          lambda k: (k, 16, frame_size, 1), 400)
        detail["streams_16_frame_ms"] = round(t * 1e3, 3)
        detail["streams_16_spread_pct"] = round(spread, 1)
        detail["realtime_streams_per_chip_at_16"] = round(
            frame_time / t * 16, 1)

    def leg_streams128():
        t, spread = fit_n(S["run_stream"], lambda: gen.init_cache(128),
                          lambda k: (k, 128, frame_size, 1), 200)
        detail["streams_128_frame_ms"] = round(t * 1e3, 3)
        detail["streams_128_spread_pct"] = round(spread, 1)
        detail["realtime_streams_per_chip_at_128"] = round(
            frame_time / t * 128, 1)

    def leg_stacked16():
        # stacked-region batched mega kernel (ops/mega_stacked.py): 16
        # streams stacked along sublanes, VMEM-packed segment pipeline,
        # chunk 300 (the hop) per grid step. Competes with the XLA batch
        # path for the streams/chip metric.
        from dl_speech_enhancement_tpu.ops.mega_stacked import (
            make_mega_stream_stacked,
        )

        B, ck = 16, 300
        stk_init, stk_run = make_mega_stream_stacked(gen, params, ck, B)

        @jax.jit
        def run_stk(cache, frames):
            out, _ = stk_run(cache, frames)
            return jnp.sum(jnp.square(out))

        t, spread = fit_n(run_stk, stk_init, lambda k: (k, B, ck), 1600)
        # per 25 ms (1200-sample) frame per stream, for apples-to-apples
        us_sf = t / B * (1200 / ck) * 1e6
        detail["stacked_16_us_frame_per_stream"] = round(us_sf, 2)
        detail["stacked_16_spread_pct"] = round(spread, 1)
        detail["realtime_streams_per_chip_stacked_16"] = round(
            (ck / sample_rate) / t * B, 1)

    def leg_stacked_pqc16():
        # batched PQC serving A/B (VERDICT r4 #4): the stacked Pallas
        # kernel vs the XLA batched scan for the symAD codec at B=16 —
        # the control arm that decides make_scan_stream's 'auto' routing.
        from dl_speech_enhancement_tpu.ops.mega_stacked import (
            make_mega_stream_stacked,
        )

        pqc_gen, pqc_params, pqc_vq = S["pqc"]
        B, ck = 16, 300
        stk_init, stk_run = make_mega_stream_stacked(
            pqc_gen, pqc_params, ck, B, vq_state=pqc_vq)

        @jax.jit
        def run_stk(cache, frames):
            out, _, codes = stk_run(cache, frames)
            return jnp.sum(jnp.square(out)) + jnp.sum(codes)

        t, spread = fit_n(run_stk, stk_init, lambda k: (k, B, ck), 1600)
        us_sf = t / B * (1200 / ck) * 1e6
        detail["stacked_pqc_16_us_frame_per_stream"] = round(us_sf, 2)
        detail["stacked_pqc_16_spread_pct"] = round(spread, 1)

        # XLA batched PQC control arm
        flat_cb = pqc_gen.flat_codebook(pqc_vq)

        def pqc_step(cache, x):
            z, enc_cache = pqc_gen.encode_step(pqc_params, cache, x)
            codes = pqc_gen.quantize(pqc_vq, z)
            zq = pqc_gen.lookup(flat_cb, codes)
            y, dec_cache = pqc_gen.decode_step(pqc_params, cache, zq)
            new_cache = dict(cache)
            new_cache.update(enc_cache)
            new_cache.update(dec_cache)
            return new_cache, jnp.sum(jnp.square(y)) + jnp.sum(codes)

        @jax.jit
        def run_pqc_xla(cache, frames):
            cache, es = lax.scan(pqc_step, cache, frames)
            return jnp.sum(es)

        t_x, spread_x = fit_n(run_pqc_xla, lambda: pqc_gen.init_cache(B),
                              lambda k: (k, B, 1200, 1), 400)
        detail["xla_pqc_16_us_frame_per_stream"] = round(t_x / B * 1e6, 2)
        detail["xla_pqc_16_spread_pct"] = round(spread_x, 1)

    def leg_latency_offline():
        # single-dispatch end-to-end latency (incl. host round trip)
        single = jax.jit(S["chunk_step"])
        cache = gen.init_cache(1)
        frame = dev_frames((1, frame_size, 1))
        _, e = single(cache, frame)
        _ = float(e)
        lats = []
        for _ in range(20):
            t0 = time.perf_counter()
            _, e = single(cache, frame)
            _ = float(e)
            lats.append(time.perf_counter() - t0)
        detail["single_dispatch_latency_ms"] = round(
            float(np.median(lats) * 1e3), 2)

        # offline (parallel, non-streaming) denoise throughput: 16 x 2 s
        # batch, K forwards scanned per dispatch, RTT-subtracted
        k_off = 8

        @jax.jit
        def run_off(xb):
            def body(c, _):
                y = gen(params, None, xb + c * 1e-20, train=False)[0]
                return jnp.sum(jnp.square(y)) * 1e-20, None
            s, _ = jax.lax.scan(body, 0.0, None, length=k_off)
            return s

        xb = dev_frames((16, 96000, 1))
        _ = float(run_off(xb))
        rtt = measure_rtt()
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(run_off(xb))
            walls.append(time.perf_counter() - t0)
        t_off = (float(np.median(walls)) - rtt) / k_off
        detail["offline_denoise_x_realtime"] = round((16 * 2.0) / t_off, 1)

    def leg_vocoder():
        # vocoder receiver (AudioDec v1 pairing): Pallas pipeline vs XLA
        from dl_speech_enhancement_tpu.models import HiFiGANGenerator
        from dl_speech_enhancement_tpu.ops.vocoder_kernel import (
            make_mega_vocoder,
        )

        voc = HiFiGANGenerator(
            in_channels=64, out_channels=1, channels=512, kernel_size=7,
            upsample_scales=(5, 5, 4, 3), upsample_kernel_sizes=(10, 10, 8, 6),
            resblock_kernel_sizes=(11,), resblock_dilations=((1, 3, 5),),
            groups=3)
        v_params = voc.init(jax.random.PRNGKey(1))
        S["voc"] = (voc, v_params)
        voc_z_rows = frame_size // voc.total_upsample
        voc_init, voc_run = make_mega_vocoder(voc, v_params, frame_size)

        @jax.jit
        def run_voc_mega(cache, z):
            out, _ = voc_run(cache, z)
            return jnp.sum(jnp.square(out))

        def voc_step(cache, z):
            y, new_cache = voc.step(v_params, cache, z[None])
            return new_cache, jnp.sum(jnp.square(y))

        @jax.jit
        def run_voc_xla(cache, z):
            cache, es = lax.scan(voc_step, cache, z)
            return jnp.sum(es)

        t_voc, spread_voc = fit_n(
            run_voc_mega, voc_init, lambda k: (k, voc_z_rows, 64), 4000)
        t_voc_xla, spread_voc_xla = fit_n(
            run_voc_xla, lambda: voc.init_cache(1),
            lambda k: (k, voc_z_rows, 64), 200)
        detail["vocoder_rx_pallas_us_frame"] = round(t_voc * 1e6, 2)
        detail["vocoder_rx_pallas_spread_pct"] = round(spread_voc, 1)
        detail["vocoder_rx_xla_us_frame"] = round(t_voc_xla * 1e6, 2)
        detail["vocoder_rx_xla_spread_pct"] = round(spread_voc_xla, 1)
        detail["vocoder_rx_x_realtime"] = round(
            frame_time / min(t_voc, t_voc_xla), 1)

    def leg_paired():
        # paired-preset fleet (symAD tx -> codes -> v1 vocoder rx), 16
        # streams batched — the parallel/serve.py per-chip composition
        pqc_gen, pqc_params, pqc_vq = S["pqc"]
        voc, v_params = S["voc"]
        flat_cb = pqc_gen.flat_codebook(pqc_vq)

        def pair_step(cache, frame):
            enc_cache, rx_cache = cache
            z, enc_parts = pqc_gen.encode_step(pqc_params, enc_cache, frame)
            enc_cache = dict(enc_cache)
            enc_cache.update(enc_parts)
            codes = pqc_gen.quantize(pqc_vq, z)
            zq = pqc_gen.lookup(flat_cb, codes)
            y, rx_cache = voc.step(v_params, rx_cache, zq)
            return (enc_cache, rx_cache), jnp.sum(jnp.square(y))

        @jax.jit
        def run_pair(cache, frames):
            cache, es = lax.scan(pair_step, cache, frames)
            return jnp.sum(es)

        t, spread = fit_n(
            run_pair,
            lambda: (pqc_gen.init_cache(16), voc.init_cache(16)),
            lambda k: (k, 16, frame_size, 1), 100)
        detail["paired_v1_stream_ms_at_16"] = round(t * 1e3, 3)
        detail["paired_v1_spread_pct_at_16"] = round(spread, 1)
        detail["paired_v1_streams_per_chip_at_16"] = round(
            frame_time / t * 16, 1)

    def leg_frame600():
        # frame 600 (12.5 ms): the hop-aligned streaming point nearest the
        # reference's 512-sample (10.67 ms) window, with the honest
        # encode/decode split (poster Table 2 presentation)
        f600 = 600
        chunk_step = S["chunk_step"]

        def chunk_step_enc(cache, x):
            z, enc_cache = gen.encode_step(params, cache, x)
            new_cache = dict(cache)
            new_cache.update(enc_cache)
            return new_cache, jnp.sum(jnp.square(z))

        @jax.jit
        def run_enc(cache, frames):
            cache, es = lax.scan(chunk_step_enc, cache, frames)
            return jnp.sum(es)

        @jax.jit
        def run_full(cache, frames):
            cache, es = lax.scan(chunk_step, cache, frames)
            return jnp.sum(es)

        t_600, spread_600 = fit_n(run_full, lambda: gen.init_cache(1),
                                  lambda k: (k, 1, f600, 1), 1600)
        t_600_enc, _ = fit_n(run_enc, lambda: gen.init_cache(1),
                             lambda k: (k, 1, f600, 1), 1600)
        detail["frame600_us"] = round(t_600 * 1e6, 2)
        detail["frame600_spread_pct"] = round(spread_600, 1)
        detail["frame600_x_realtime"] = round(f600 / sample_rate / t_600, 1)
        detail["frame600_enc_us"] = round(t_600_enc * 1e6, 2)
        detail["frame600_dec_us"] = round(max(t_600 - t_600_enc, 0.0) * 1e6,
                                          2)

    def _train_leg(suffix, B, remat, disc_remat):
        # training throughput: full adversarial course step (G then D),
        # per-step device time via RTT-subtracted value-fenced walls
        # (queue depth 1 — deep donated-step queues wedge the tunneled
        # backend)
        from dl_speech_enhancement_tpu.models import HiFiGANDiscriminator
        from dl_speech_enhancement_tpu.train.denoise_course import (
            make_course_steps,
        )
        from dl_speech_enhancement_tpu.train.optim import build_optimizer

        rng = np.random.default_rng(0)
        tg = AudioDecGenerator(use_pqc=False, remat=remat)
        seg = 48000 // tg.hop * tg.hop
        tcfg = dict(
            mel_loss_params=dict(fs=48000, fft_sizes=[2048], hop_sizes=[300],
                                 win_lengths=[None], num_mels=80, fmin=0,
                                 fmax=24000, log_base=None),
            lambda_mel_loss=45.0, lambda_snr_loss=1.0, lambda_adv=1.0,
            lambda_feat_match=2.0,
            generator_adv_loss_params={"average_by_discriminators": False},
            discriminator_adv_loss_params={"average_by_discriminators": False},
            discriminator_remat=disc_remat,
        )
        disc = HiFiGANDiscriminator()
        kg, kd = jax.random.split(jax.random.PRNGKey(0))
        pg, _ = tg.init(kg)
        pd = disc.init(kd)
        og = build_optimizer("Adam", {"lr": 1e-3, "betas": [0.5, 0.9]},
                             grad_norm=10.0)
        od = build_optimizer("Adam", {"lr": 2e-4, "betas": [0.5, 0.9]},
                             grad_norm=10.0)
        stepfn = make_course_steps(tg, disc, tcfg, og, od)["train_disc"]
        x = jax.device_put(
            rng.standard_normal((B, seg, 1)).astype(np.float32) * 0.1)
        y = jax.device_put(
            rng.standard_normal((B, seg, 1)).astype(np.float32) * 0.1)
        st = {"params_generator": jax.device_put(pg),
              "params_discriminator": jax.device_put(pd),
              "opt_generator": jax.device_put(og.init(pg)),
              "opt_discriminator": jax.device_put(od.init(pd))}
        st, g, d, _, _ = stepfn(st, x, y)
        _ = float(g)
        step_flops = None
        try:
            an = stepfn.lower(st, x, y).compile().cost_analysis()
            if an and an.get("flops"):
                step_flops = float(an["flops"])
        except Exception:
            pass
        # fence on the LAST-written outputs (a D-phase optimizer leaf +
        # a G param leaf, one tiny dispatch = one RTT): fetching the
        # early-produced g scalar can under-measure schedules where the
        # loss materializes before the D phase finishes (round-5 fence
        # probe, docs/SCALING.md training profile)
        @jax.jit
        def _leafsum(a, b):
            return jnp.sum(a) + jnp.sum(b)

        def fence(st_):
            return float(_leafsum(
                jax.tree_util.tree_leaves(st_["opt_discriminator"])[-1],
                jax.tree_util.tree_leaves(st_["params_generator"])[-1]))

        _ = fence(st)
        rtt = measure_rtt(6)
        walls = []
        for _ in range(6):
            t0 = time.perf_counter()
            st, g, d, _, _ = stepfn(st, x, y)
            _ = fence(st)
            walls.append(time.perf_counter() - t0)
            if len(walls) >= 3 and remaining() < 0:
                break
        dev = float(np.median(walls)) - rtt
        detail[f"train_audio_s_per_s_{suffix}"] = round(
            B * seg / 48000 / dev, 1)
        detail[f"train_step_ms_{suffix}"] = round(dev * 1e3, 1)
        detail[f"train_mfu_pct_v5e_bf16_{suffix}"] = (
            round(100.0 * step_flops / dev / V5E_PEAK_FLOPS, 2)
            if step_flops else None)
        del st, x, y

    def leg_train():
        _train_leg("b16", 16, remat=False, disc_remat=False)

    def leg_train_remat64():
        # the large-batch arm: per-block generator remat + per-sub-D
        # checkpointed losses unlock B=64 (the plain step OOMs at B=32)
        # at ~1.5x the B=16 throughput — docs/SCALING.md memory levers
        _train_leg("b64_remat", 64, remat=True, disc_remat=True)

    # priority order: the mega-kernel HEADLINE leg first (required — if
    # cold compiles eat the budget, they buy the real number, not the
    # fallback; VERDICT r4 #1), then the comparison/continuity legs.
    # Cost estimates are warm-cache leg walls + compile slack; a leg only
    # starts if the estimate fits the remaining budget.
    legs = [
        ("mega_single", 60, leg_mega_single),
        ("xla_single", 50, leg_xla_single),
        ("pqc", 60, leg_pqc),
        ("streams_128", 30, leg_streams128),
        ("streams_16", 30, leg_streams16),
        ("stacked_16", 50, leg_stacked16),
        ("stacked_pqc_16", 60, leg_stacked_pqc16),
        # train MFU (VERDICT r3 #5 / r4 #2) outranks the remaining
        # inference legs
        ("train_b16", 110, leg_train),
        ("train_b64_remat", 110, leg_train_remat64),
        ("vocoder_rx", 110, leg_vocoder),
        ("paired_v1", 40, leg_paired),
        ("frame600", 50, leg_frame600),
        ("latency_offline", 40, leg_latency_offline),
    ]
    required = {"mega_single"}  # the headline always runs
    deps = {"streams_16": {"xla_single"}, "streams_128": {"xla_single"},
            "latency_offline": {"xla_single"},
            "frame600": {"xla_single"},
            "stacked_pqc_16": {"pqc"},
            "paired_v1": {"pqc", "vocoder_rx"}}

    done = set()
    for name, est, fn in legs:
        missing = deps.get(name, set()) - done
        if missing:
            legs_report[name] = {"status": f"skipped_deps:{sorted(missing)}"}
            continue
        if name not in required and remaining() < est:
            legs_report[name] = {"status": "skipped_budget",
                                 "remaining_s": round(remaining(), 1)}
            continue
        t0 = time.time()
        try:
            fn()
            legs_report[name] = {"status": "ok",
                                 "s": round(time.time() - t0, 1)}
            done.add(name)
        except Exception as e:  # noqa: BLE001 — a failed leg must not
            # forfeit the legs that already ran or the JSON line itself
            legs_report[name] = {"status": f"error:{type(e).__name__}: {e}"
                                 [:200],
                                 "s": round(time.time() - t0, 1)}
        _dev_cache.clear()

    _finished[0] = True
    emit("main")


if __name__ == "__main__":
    atexit.register(emit, "atexit")
    try:
        main()
    except BaseException:
        emit("exception")
        raise
