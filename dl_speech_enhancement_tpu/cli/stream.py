"""Streaming demo / denoise CLI (bin/stream.py + demoStream/denoiseStream
equivalents; ``--without-pqc`` covers bin/stream_without_PQC.py).

File-driven mode (default; audio hardware is optional):
    python -m dl_speech_enhancement_tpu.cli.stream \
        --checkpoint exp/denoise/<tag>/checkpoint-200000steps \
        -i noisy.wav -o enhanced.wav --frame-size 1200

Live mode (needs the optional sounddevice package): add ``--live``.
Prints the reference's end-of-run stats: encoder/decoder ms mean±std,
latency, frame-drop % (bin/stream.py:284-310).
"""

from __future__ import annotations

import logging
from argparse import ArgumentParser

import numpy as np

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s (%(module)s) %(message)s")
logger = logging.getLogger(__name__)


def main(argv=None):
    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()  # persist jitted programs across CLI runs
    parser = ArgumentParser()
    parser.add_argument("--model", default=None,
                        help="named preset (utils.audiodec.assign_model)")
    parser.add_argument("--checkpoint", default=None,
                        help="explicit checkpoint directory")
    parser.add_argument("--without-pqc", action="store_true",
                        help="denoiser variant: raw features cross tx->rx")
    parser.add_argument("-i", "--input", action="append", default=None,
                        help="input wav (repeat for multi-stream batching: "
                             "N files stream concurrently through one chip)")
    parser.add_argument("-o", "--output", default="output.wav",
                        help="output wav (multi-stream: one numbered file "
                             "per input)")
    parser.add_argument("--frame-size", type=int, default=1200)
    parser.add_argument("--rx-backend", default="xla",
                        choices=["xla", "pallas", "auto"],
                        help="vocoder-rx compute path: 'pallas'/'auto' fuses "
                             "the whole receiver into resident-weight "
                             "kernels (ops/vocoder_kernel.py)")
    parser.add_argument("--max-latency", type=float, default=0.1)
    parser.add_argument("--live", action="store_true")
    parser.add_argument("--realtime", action="store_true",
                        help="pace file-driven streaming at wall-clock rate")
    args = parser.parse_args(argv)

    from dl_speech_enhancement_tpu.utils.audiodec import (
        load_pair, load_generator_from_checkpoint,
    )
    from dl_speech_enhancement_tpu.stream import AudioCodecStreamer
    from dl_speech_enhancement_tpu.data import load_audio, write_wav

    inputs = args.input or []
    batch = max(len(inputs), 1)

    if args.checkpoint:
        gen, params, vq_state, config = load_generator_from_checkpoint(
            args.checkpoint, use_pqc=not args.without_pqc
        )
        sample_rate = config.get("sampling_rate", config.get("sample_rate", 48000))
        streamer = AudioCodecStreamer(
            gen, params, vq_state, frame_size=args.frame_size,
            sample_rate=sample_rate, max_latency=args.max_latency, batch=batch,
        )
    elif args.model:
        # named preset: may pair an analyzer tx with a vocoder rx
        tx, rx, sample_rate = load_pair(args.model, batch=batch,
                                        rx_backend=args.rx_backend)
        streamer = AudioCodecStreamer(
            tx.gen, tx.params, tx.vq_state, frame_size=args.frame_size,
            sample_rate=sample_rate, max_latency=args.max_latency,
            batch=batch, tx=tx, rx=rx,
        )
    else:
        raise SystemExit("need --model or --checkpoint")
    streamer.load()
    logger.info("primed buffers (receptive %d samples, %d stream%s)",
                streamer.receptive_length, batch, "s" if batch > 1 else "")

    if args.live:
        streamer.run(latency=args.max_latency)
    else:
        assert inputs, "file mode needs -i input.wav"
        clips = [load_audio(p, sample_rate)[:, :1] for p in inputs]
        t = min(c.shape[0] for c in clips)
        t = (t // args.frame_size) * args.frame_size
        audio = np.stack([c[:t] for c in clips])  # (B, T, 1)
        out = streamer.run_array(audio, realtime=args.realtime)
        if batch == 1:
            write_wav(args.output, out[0, :, 0], sample_rate)
            logger.info("wrote %s (%d samples)", args.output, out.shape[1])
        else:
            import os
            root, ext = os.path.splitext(args.output)
            for b in range(batch):
                path = f"{root}-{b}{ext}"
                write_wav(path, out[b, :, 0], sample_rate)
            logger.info("wrote %d streams to %s-*%s (%d samples each)",
                        batch, root, ext, out.shape[1])

    stats = streamer.stats()
    logger.info("encoder: %.2f ± %.2f ms", stats["encoder_ms_mean"], stats["encoder_ms_std"])
    logger.info("decoder: %.2f ± %.2f ms", stats["decoder_ms_mean"], stats["decoder_ms_std"])
    logger.info("latency: %.2f ± %.2f ms", stats["latency_ms_mean"], stats["latency_ms_std"])
    logger.info("frame drops: %d/%d (%.2f%%)", stats["frame_drops"],
                stats["frames"], stats["drop_pct"])
    return stats


if __name__ == "__main__":
    main()
