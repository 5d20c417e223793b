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

- **XLA**: ``lax.scan`` over the per-frame ``encode_step``/``decode_step``.
- **mega** (ops/mega_kernel.py): the whole encoder and decoder each as ONE
  Pallas kernel with ``grid=(n_frames,)`` — weights resident in VMEM for
  the whole dispatch, caches in VMEM scratch across frames.

Methodology: per-frame device time comes from a **two-point fit** (time a
long scan and a short scan, take the slope) so the ~30 ms tunnel RTT of the
scalar-fetch fence cancels. The fit is repeated ``N_FITS`` times and the
median is reported with its spread — single fits were seen to wobble ~20%
run-to-run (VERDICT round 1), medians agree within a few percent.

Roofline context in ``detail``: model FLOPs/frame (utils/profiling.py::
codec_flops_per_sample), achieved TFLOP/s, MFU vs the v5e bf16 peak
(394 TFLOP/s), and the mega path's HBM bytes/frame (cache spill + audio
I/O + feature hand-off + amortized weights).

Baseline: the reference's live demo sustains ~1.0x real time on a laptop
CPU (25 ms windows; encode 21.57 ms + decode 24.83 ms overlapped across two
threads — DeepLearning_Poster.pdf Table 2). ``vs_baseline`` is the
single-stream x-real-time number. The driver's north star is >50x.

Round-3 additions to ``detail`` (every round-2 headline is now
driver-captured rather than probe-only):

- ``vocoder_rx_{pallas,xla}_us_frame``: the AudioDec v1 HiFiGAN vocoder
  receiver (19 M params) as the fused Pallas segment pipeline vs XLA scan;
- ``paired_v1_*``: the full paired-preset pipeline (symAD analyzer tx ->
  RVQ codes -> v1 vocoder rx), 16 streams batched — the reference's
  AudioDec v1 demo composition (utils/audiodec.py v1 pairing);
- ``frame600_*``: the reference's streaming operating point — smallest
  hop-aligned frame near its 512-sample window (12.5 ms), with the honest
  encode/decode split (poster Table 2 presents enc ms / dec ms);
- ``train_*_b16``: adversarial course-training throughput (audio-s/s) and
  XLA-cost-model MFU at batch 16 x 1 s.

Prints ONE JSON line.
"""

import json
import time

import numpy as np

N_FITS = 5
V5E_PEAK_FLOPS = 394e12  # bf16 MXU peak, TPU v5e


def median_spread(xs):
    med = float(np.median(xs))
    spread = float((np.max(xs) - np.min(xs)) / med * 100.0) if med else 0.0
    return med, spread


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.ops.mega_kernel import make_mega_stream
    from dl_speech_enhancement_tpu.utils.profiling import (
        codec_flops_per_sample,
        enable_compile_cache,
    )

    # persist compiled executables across runs: makes repeated bench runs
    # start measuring in seconds instead of minutes, and removes compile
    # noise from the driver's capture
    enable_compile_cache()

    sample_rate = 48000
    frame_size = 1200  # 25 ms @ 48 kHz, 4 code frames at hop 300
    n_frames = 1600    # 40 s of audio per long dispatch

    gen = AudioDecGenerator(use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    # ---- XLA path: scan over the per-frame streaming steps ----
    def chunk_step(cache, x):
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

    # ---- mega path: whole-stack Pallas kernels, frames (N, frame_size) ----
    mega_init_cache, mega_run = make_mega_stream(gen, params, chunk=frame_size)

    @jax.jit
    def run_stream_mega(cache, frames):
        out, _ = mega_run(cache, frames)
        return jnp.sum(jnp.square(out))

    def fit_once(batch, mode, trials=3, n_hi=None):
        """One two-point fit: the scalar-fetch fence costs one host<->device
        round trip (~30 ms through this environment's tunnel), so time scans
        of two lengths and take the slope — the RTT intercept cancels. The
        mega path is ~3x faster per frame, so its scans are 4x longer to
        keep the slope well above the fence jitter; large batches use fewer
        frames so the host->device frame upload stays bounded."""
        if n_hi is None:
            n_hi = n_frames * 4 if mode == "mega" else n_frames
        n1, n2 = n_hi // 4, n_hi

        def timed(n):
            if mode == "mega":
                cache = mega_init_cache()
                frames = jax.device_put(
                    rng.standard_normal((n, frame_size)).astype(np.float32))
                run = run_stream_mega
            else:
                cache = gen.init_cache(batch)
                frames = jax.device_put(
                    rng.standard_normal((n, batch, frame_size, 1))
                    .astype(np.float32))
                run = run_stream
            _ = float(run(cache, frames))  # compile + settle
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                _ = float(run(cache, frames))  # scalar fetch = fence
                best = min(best, time.perf_counter() - t0)
            return best

        return (timed(n2) - timed(n1)) / (n2 - n1)

    def measure(batch, mode="xla", n_hi=None):
        fits = [fit_once(batch, mode, n_hi=n_hi) for _ in range(N_FITS)]
        return median_spread(fits)

    frame_time = frame_size / sample_rate
    t_xla, spread_xla = measure(1, "xla")
    t_mega, spread_mega = measure(1, "mega")
    t_single = min(t_xla, t_mega)
    x_rt_single = frame_time / t_single

    # roofline accounting — attributed to the MEGA path specifically: the
    # HBM byte model below (cache drain, amortized VMEM-resident bf16
    # weights) describes the mega kernel's traffic, so divide by t_mega,
    # not by whichever path won the headline
    flops_frame = codec_flops_per_sample(gen) * frame_size
    tflops = flops_frame / t_mega / 1e12
    mfu_pct = 100.0 * flops_frame / t_mega / V5E_PEAK_FLOPS
    cache_bytes = sum(int(np.prod(v.shape)) * 4
                      for v in mega_init_cache().values())
    n_params = sum(int(np.prod(np.asarray(l).shape))
                   for l in jax.tree_util.tree_leaves(params))
    z_bytes = (frame_size // gen.hop) * gen.encoder.out_channels * 4
    hbm_frame = (2 * frame_size * 4      # audio in + out (f32)
                 + 2 * z_bytes           # feature hand-off write + read
                 + cache_bytes           # cache drain (write every frame)
                 + 2 * n_params / (n_frames * 4))  # bf16 weights / dispatch
    hbm_gb_s = hbm_frame / t_mega / 1e9

    # PQC (symAD) codec single-stream: the full encode->RVQ->decode chain
    # through the same mega-kernel path (reference AudioDec v1 runs this at
    # ~74 ms per 25 ms frame on its laptop baseline).
    from dl_speech_enhancement_tpu.models import AudioDecGenerator as _G
    pqc_gen = _G(use_pqc=True)
    pqc_params, pqc_vq = pqc_gen.init(jax.random.PRNGKey(0))
    pqc_init_cache, pqc_run = make_mega_stream(
        pqc_gen, pqc_params, chunk=frame_size, vq_state=pqc_vq)

    @jax.jit
    def run_stream_pqc(cache, frames):
        out, _, codes = pqc_run(cache, frames)
        return jnp.sum(jnp.square(out)) + jnp.sum(codes)

    def fit_pqc_once(trials=3):
        n_hi = n_frames * 4
        n1, n2 = n_hi // 4, n_hi

        def timed(n):
            cache = pqc_init_cache()
            frames = jax.device_put(
                rng.standard_normal((n, frame_size)).astype(np.float32))
            _ = float(run_stream_pqc(cache, frames))
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                _ = float(run_stream_pqc(cache, frames))
                best = min(best, time.perf_counter() - t0)
            return best

        return (timed(n2) - timed(n1)) / (n2 - n1)

    t_pqc, spread_pqc = median_spread([fit_pqc_once() for _ in range(N_FITS)])

    # multi-stream batching (XLA path; streams/chip metric). Swept on-chip
    # 16..1024: per-stream time keeps improving to batch 128 (MXU rows),
    # then regresses — 128 is the serving sweet spot, 16 kept for
    # round-over-round continuity.
    streams = 16
    t_batch, spread_batch = measure(streams, "xla")
    x_rt_per_stream = frame_time / t_batch
    realtime_streams = x_rt_per_stream * streams
    streams_hi = 128
    t_batch_hi, spread_batch_hi = measure(streams_hi, "xla", n_hi=200)
    realtime_streams_hi = frame_time / t_batch_hi * streams_hi

    # ---- vocoder receiver (AudioDec v1 pairing): Pallas pipeline vs XLA ----
    # (round-2 headline was probe-only; captured by the driver from r3 on)
    from dl_speech_enhancement_tpu.models import HiFiGANGenerator
    from dl_speech_enhancement_tpu.ops.vocoder_kernel import make_mega_vocoder

    voc = HiFiGANGenerator(
        in_channels=64, out_channels=1, channels=512, kernel_size=7,
        upsample_scales=(5, 5, 4, 3), upsample_kernel_sizes=(10, 10, 8, 6),
        resblock_kernel_sizes=(11,), resblock_dilations=((1, 3, 5),),
        groups=3)
    v_params = voc.init(jax.random.PRNGKey(1))
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

    def fit_voc_once(run, cache_fn, n_hi, trials=3):
        n1, n2 = n_hi // 4, n_hi

        def timed(n):
            z = jax.device_put(
                rng.standard_normal((n, voc_z_rows, 64)).astype(np.float32))
            _ = float(run(cache_fn(), z))
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                _ = float(run(cache_fn(), z))
                best = min(best, time.perf_counter() - t0)
            return best

        return (timed(n2) - timed(n1)) / (n2 - n1)

    t_voc, spread_voc = median_spread(
        [fit_voc_once(run_voc_mega, voc_init, 800) for _ in range(3)])
    t_voc_xla, spread_voc_xla = median_spread(
        [fit_voc_once(run_voc_xla, lambda: voc.init_cache(1), 400)
         for _ in range(3)])

    # ---- paired-preset fleet (symAD tx -> codes -> v1 vocoder rx),
    # 16 streams batched, the parallel/serve.py per-chip composition ----
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

    def fit_pair_once(b, n_hi=100, trials=3):
        n1, n2 = n_hi // 4, n_hi

        def timed(n):
            cache = (pqc_gen.init_cache(b), voc.init_cache(b))
            frames = jax.device_put(
                rng.standard_normal((n, b, frame_size, 1)).astype(np.float32))
            _ = float(run_pair(cache, frames))
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                _ = float(run_pair(cache, frames))
                best = min(best, time.perf_counter() - t0)
            return best

        return (timed(n2) - timed(n1)) / (n2 - n1)

    t_pair16, spread_pair16 = median_spread(
        [fit_pair_once(16) for _ in range(3)])
    pair_streams_16 = frame_time / t_pair16 * 16

    # ---- reference operating point: frame 512 (10.67 ms), single stream,
    # with the honest encode/decode split (poster Table 2 presentation) ----
    f512 = 600  # 12.5 ms: the hop-aligned frame nearest the reference's
    #             512-sample (10.67 ms) streaming window (hop 300 divides it)
    def chunk_step_512_enc(cache, x):
        z, enc_cache = gen.encode_step(params, cache, x)
        new_cache = dict(cache)
        new_cache.update(enc_cache)
        return new_cache, jnp.sum(jnp.square(z))

    @jax.jit
    def run_enc_512(cache, frames):
        cache, es = lax.scan(chunk_step_512_enc, cache, frames)
        return jnp.sum(es)

    @jax.jit
    def run_full_512(cache, frames):
        cache, es = lax.scan(chunk_step, cache, frames)
        return jnp.sum(es)

    def fit_512_once(run, n_hi=1600, trials=3):
        n1, n2 = n_hi // 4, n_hi

        def timed(n):
            cache = gen.init_cache(1)
            frames = jax.device_put(
                rng.standard_normal((n, 1, f512, 1)).astype(np.float32))
            _ = float(run(cache, frames))
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                _ = float(run(cache, frames))
                best = min(best, time.perf_counter() - t0)
            return best

        return (timed(n2) - timed(n1)) / (n2 - n1)

    t_512, spread_512 = median_spread(
        [fit_512_once(run_full_512) for _ in range(3)])
    t_512_enc, _ = median_spread(
        [fit_512_once(run_enc_512) for _ in range(3)])
    t_512_dec = max(t_512 - t_512_enc, 0.0)

    # ---- training throughput: full adversarial course step (G then D),
    # B x 1 s, per-step device time via RTT-subtracted value-fenced walls
    # (tools/train_bench.py methodology; queue depth 1 — deep donated-step
    # queues wedge the tunneled backend) ----
    from dl_speech_enhancement_tpu.models import HiFiGANDiscriminator
    from dl_speech_enhancement_tpu.train.denoise_course import make_course_steps
    from dl_speech_enhancement_tpu.train.optim import build_optimizer

    def train_leg(B, remat):
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
            discriminator_remat=remat,
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
        z = jax.device_put(jnp.zeros(()))
        rtts = []
        for _ in range(10):
            t0 = time.perf_counter()
            _ = float(z + 1.0)
            rtts.append(time.perf_counter() - t0)
        rtt = float(np.median(rtts))
        walls = []
        for _ in range(12):
            t0 = time.perf_counter()
            st, g, d, _, _ = stepfn(st, x, y)
            _ = float(g)
            walls.append(time.perf_counter() - t0)
        dev = float(np.median(walls)) - rtt
        audio_s = B * seg / 48000 / dev
        mfu = (100.0 * step_flops / dev / V5E_PEAK_FLOPS
               if step_flops else None)
        del st, x, y
        return audio_s, mfu, dev

    train_audio_16, train_mfu_16, train_dev_16 = train_leg(16, False)

    # single-dispatch end-to-end latency (incl. host round trip): one frame
    single = jax.jit(chunk_step)
    cache = gen.init_cache(1)
    frame = jax.device_put(
        rng.standard_normal((1, frame_size, 1)).astype(np.float32))
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

    off_fits = [(offline_scan(8) - offline_scan(2)) / 6 for _ in range(3)]
    t_off, _ = median_spread(off_fits)
    offline_x_rt = (16 * 2.0) / t_off

    result = {
        "metric": "streaming_denoise_x_realtime_48k",
        "value": round(x_rt_single, 2),
        "unit": "x_realtime_per_stream",
        "vs_baseline": round(x_rt_single / 1.0, 2),
        "detail": {
            "frame_us_mega": round(t_mega * 1e6, 2),
            "frame_us_mega_spread_pct": round(spread_mega, 1),
            "frame_us_xla": round(t_xla * 1e6, 2),
            "frame_us_xla_spread_pct": round(spread_xla, 1),
            "n_fits": N_FITS,
            "frame_size": frame_size,
            "flops_per_frame": int(flops_frame),
            "achieved_tflops_mega": round(tflops, 2),
            "mfu_pct_v5e_bf16_mega": round(mfu_pct, 2),
            "hbm_bytes_per_frame": int(hbm_frame),
            "hbm_gb_s": round(hbm_gb_s, 2),
            "streams_16_frame_ms": round(t_batch * 1e3, 3),
            "streams_16_spread_pct": round(spread_batch, 1),
            "realtime_streams_per_chip_at_16": round(realtime_streams, 1),
            "streams_128_frame_ms": round(t_batch_hi * 1e3, 3),
            "streams_128_spread_pct": round(spread_batch_hi, 1),
            "realtime_streams_per_chip_at_128": round(realtime_streams_hi, 1),
            "pqc_frame_us": round(t_pqc * 1e6, 2),
            "pqc_frame_us_spread_pct": round(spread_pqc, 1),
            "pqc_x_realtime": round(frame_time / t_pqc, 1),
            "offline_denoise_x_realtime": round(offline_x_rt, 1),
            "single_dispatch_latency_ms": round(dispatch_latency_ms, 2),
            "vocoder_rx_pallas_us_frame": round(t_voc * 1e6, 2),
            "vocoder_rx_pallas_spread_pct": round(spread_voc, 1),
            "vocoder_rx_xla_us_frame": round(t_voc_xla * 1e6, 2),
            "vocoder_rx_xla_spread_pct": round(spread_voc_xla, 1),
            "vocoder_rx_x_realtime": round(frame_time / min(t_voc, t_voc_xla), 1),
            "paired_v1_stream_ms_at_16": round(t_pair16 * 1e3, 3),
            "paired_v1_spread_pct_at_16": round(spread_pair16, 1),
            "paired_v1_streams_per_chip_at_16": round(pair_streams_16, 1),
            "frame600_us": round(t_512 * 1e6, 2),
            "frame600_spread_pct": round(spread_512, 1),
            "frame600_x_realtime": round(f512 / sample_rate / t_512, 1),
            "frame600_enc_us": round(t_512_enc * 1e6, 2),
            "frame600_dec_us": round(t_512_dec * 1e6, 2),
            "train_audio_s_per_s_b16": round(train_audio_16, 1),
            "train_step_ms_b16": round(train_dev_16 * 1e3, 1),
            "train_mfu_pct_v5e_bf16_b16": (round(train_mfu_16, 2)
                                           if train_mfu_16 else None),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
