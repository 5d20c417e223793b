"""Fleet serving CLI: N concurrent streams sharded over the device mesh.

Makes the scale-out serving layer (``parallel/serve.py``) user-drivable,
the way ``cli.stream`` drives the single-chip runtime. The reference tops
out at two torch devices (tx/rx split, ``/root/reference/bin/stream.py:
26-35``); this runs an arbitrary fleet of independent streams batch-sharded
over every visible chip — parameters replicated, ONE jitted dispatch per
frame block for the whole fleet, no collectives (linear ICI scaling; see
docs/SCALING.md).

    python -m dl_speech_enhancement_tpu.cli.serve \
        --checkpoint exp/denoise/<tag>/checkpoint-200000steps \
        --streams 256 -i noisy.wav -o enhanced.wav

Input wavs are tiled round-robin across the fleet; per-stream outputs are
bit-identical to the single-chip batched runtime (pinned by
tests/test_parallel.py). Prints fleet stats: per-stream frame time,
realtime stream-equivalents, devices used.
"""

from __future__ import annotations

import logging
import time
from argparse import ArgumentParser

import numpy as np

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s (%(module)s) %(message)s")
logger = logging.getLogger(__name__)


def main(argv=None):
    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    parser = ArgumentParser()
    parser.add_argument("--checkpoint", default=None,
                        help="checkpoint directory (config.yml beside it)")
    parser.add_argument("--model", default=None,
                        help="named preset (utils/audiodec.py zoo) instead "
                             "of --checkpoint; paired presets (vctk_v0-v2, "
                             "vctk_univ, vctk_denoise) serve their vocoder "
                             "receiver in the same fleet dispatch")
    parser.add_argument("--exp-root", default="exp",
                        help="experiment root for --model preset paths")
    parser.add_argument("--without-pqc", action="store_true",
                        help="denoiser variant (no quantizer in the chain)")
    parser.add_argument("--streams", type=int, default=None,
                        help="TOTAL stream count across the mesh (must "
                             "divide by the device count; default: one "
                             "stream per device)")
    parser.add_argument("--devices", type=int, default=None,
                        help="mesh size (default: all visible devices)")
    parser.add_argument("-i", "--input", action="append", required=True,
                        help="input wav; repeat to give streams distinct "
                             "sources (tiled round-robin across the fleet)")
    parser.add_argument("-o", "--output", default=None,
                        help="output wav; streams write <root>-<n>.wav. "
                             "Omit to benchmark without host readback")
    parser.add_argument("--frame-size", type=int, default=1200)
    parser.add_argument("--block-frames", type=int, default=16,
                        help="frames queued per device dispatch (amortizes "
                             "the host round-trip; latency = block x frame)")
    parser.add_argument("--max-outputs", type=int, default=8,
                        help="cap on per-stream output files written")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from dl_speech_enhancement_tpu.data import load_audio, write_wav
    from dl_speech_enhancement_tpu.parallel.mesh import make_mesh
    from dl_speech_enhancement_tpu.parallel.serve import make_sharded_stream
    from dl_speech_enhancement_tpu.utils.audiodec import (
        load_generator_from_checkpoint,
        load_pair_models,
    )

    if (args.checkpoint is None) == (args.model is None):
        raise SystemExit("give exactly one of --checkpoint or --model")
    if args.model is not None and args.without_pqc:
        # presets carry their own architecture (the denoise preset's tx is
        # already the fine-tuned PQC encoder) — silently loading the tx
        # with use_pqc=True would ignore the flag
        raise SystemExit("--without-pqc applies to --checkpoint loads only; "
                         "presets define their own architecture")

    mesh = make_mesh(args.devices)
    n_dev = int(mesh.devices.size)
    streams = n_dev if args.streams is None else args.streams

    if args.model is not None:
        pair = load_pair_models(args.model, args.exp_root)
        sample_rate = pair.pop("sample_rate")
        run = make_sharded_stream(pair.pop("gen"), pair.pop("params"),
                                  pair.pop("vq_state"),
                                  mesh=mesh, batch=streams, **pair)
    else:
        gen, params, vq_state, config = load_generator_from_checkpoint(
            args.checkpoint, use_pqc=not args.without_pqc)
        sample_rate = config.get("sampling_rate",
                                 config.get("sample_rate", 48000))
        run = make_sharded_stream(gen, params, vq_state,
                                  mesh=mesh, batch=streams)
    logger.info("fleet: %d streams over %d device%s (%d/chip)", streams,
                n_dev, "s" if n_dev > 1 else "", streams // n_dev)

    clips = [load_audio(p, sample_rate)[:, :1] for p in args.input]
    t = min(c.shape[0] for c in clips)
    n_frames = t // args.frame_size
    if n_frames == 0:
        raise SystemExit(
            f"inputs shorter than one frame ({args.frame_size} samples)")
    t = n_frames * args.frame_size
    # (n_frames, B, F, 1): stream b plays input file b % len(inputs)
    audio = np.stack([clips[b % len(clips)][:t] for b in range(streams)])
    frames_host = (audio.reshape(streams, n_frames, args.frame_size, 1)
                   .transpose(1, 0, 2, 3).astype(np.float32))

    cache = run.init_cache()
    block = max(1, args.block_frames)
    outs, walls = [], []
    for start in range(0, n_frames, block):
        fb = run.shard_frames(frames_host[start:start + block])
        t0 = time.perf_counter()
        ys, cache = run(cache, fb)
        # a value fetch is the only reliable fence on remote backends
        _ = float(jnp.sum(ys[-1, 0, :4, 0]))
        walls.append(time.perf_counter() - t0)
        if args.output:
            outs.append(np.asarray(ys))

    frame_s = args.frame_size / sample_rate
    # steady-state per-frame wall: drop the first block (compile + warmup)
    steady = walls[1:] if len(walls) > 1 else walls
    blocks_frames = [min(block, n_frames - s)
                     for s in range(0, n_frames, block)][1:] or [n_frames]
    per_frame = float(np.sum(steady)) / max(int(np.sum(blocks_frames)), 1)
    per_stream_us = per_frame / streams * 1e6
    x_rt = frame_s / per_frame * streams

    if args.output:
        import os

        y = np.concatenate(outs, axis=0)  # (n_frames, B, F, 1)
        y = y.transpose(1, 0, 2, 3).reshape(streams, -1)
        root, ext = os.path.splitext(args.output)
        n_out = min(streams, args.max_outputs)
        for b in range(n_out):
            write_wav(f"{root}-{b}{ext}" if streams > 1 else args.output,
                      y[b], sample_rate)
        logger.info("wrote %d/%d stream outputs (%d samples each)",
                    n_out, streams, y.shape[1])

    stats = {
        "streams": streams,
        "devices": n_dev,
        "frames": n_frames,
        "fleet_frame_ms": round(per_frame * 1e3, 3),
        "us_per_stream_frame": round(per_stream_us, 2),
        "realtime_stream_equivalents": round(x_rt, 1),
    }
    logger.info("fleet frame time: %.3f ms (%d streams -> %.2f us/stream)",
                stats["fleet_frame_ms"], streams, stats["us_per_stream_frame"])
    logger.info("realtime stream-equivalents: %.1f", x_rt)
    return stats


if __name__ == "__main__":
    main()
