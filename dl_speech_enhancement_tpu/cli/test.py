"""Offline codec test driver (bin/test.py TestGEN equivalent).

Loads encoder/decoder checkpoints with their sibling config.yml, runs
encode -> decode over a wav dataset, measures the real-time factor per
utterance and the mean, and writes PCM_16 wavs (bin/test.py:89-115).

Usage:
    python -m dl_speech_enhancement_tpu.cli.test \
        --encoder exp/autoencoder/<tag>/checkpoint-200000steps \
        --input corpus/48000/clean_testset_wav --output test_out/codec
"""

from __future__ import annotations

import logging
import os
import time
from argparse import ArgumentParser

import numpy as np

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s (%(module)s) %(message)s")
logger = logging.getLogger(__name__)


def run_codec_test(encoder_ckpt: str, input_path: str, output_dir: str,
                   decoder_ckpt: str | None = None, subset_num: int = -1):
    import jax
    import jax.numpy as jnp
    from dl_speech_enhancement_tpu.utils.config import load_config_beside
    from dl_speech_enhancement_tpu.train.checkpoint import load_checkpoint
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.data import SingleDataset, write_wav

    config = load_config_beside(encoder_ckpt)
    sr = config["sampling_rate"]
    gen = AudioDecGenerator(**config["generator_params"], use_pqc=True)
    params_like, vq_like = gen.init(jax.random.PRNGKey(0))
    restored = load_checkpoint(
        encoder_ckpt, like={"params_generator": params_like, "vq_state": vq_like}
    )
    params, vq_state = restored["params_generator"], restored["vq_state"]
    del decoder_ckpt  # symmetric codec: same checkpoint holds both sides

    @jax.jit
    def forward(x):
        e = gen.encoder(params["encoder"], x)
        z = gen.projector(params["projector"], e)
        zq, _ = gen.quantizer.inference(vq_state, z)
        return gen.decoder(params["decoder"], zq)

    dataset = SingleDataset(input_path, return_utt_id=True, subset_num=subset_num,
                            sample_rate=sr)
    os.makedirs(output_dir, exist_ok=True)
    rtfs = []
    for utt_id, audio in dataset:
        t = (audio.shape[0] // gen.hop) * gen.hop
        if t == 0:
            continue
        # pad to a power-of-two count of hop frames: the jitted forward
        # would otherwise recompile for nearly every distinct clip length
        # (~100 s each through the remote compile service), and the
        # compile would land inside the timed region. RTF is reported
        # against the TRUE length, so padded compute makes the number
        # conservative (at most ~2x the exact-length work).
        frames = t // gen.hop
        t_pad = (1 << (frames - 1).bit_length()) * gen.hop
        x = np.zeros((1, t_pad, 1), np.float32)
        x[0, :t, 0] = audio[:t, 0]
        x = jnp.asarray(x)
        y = forward(x)  # warm the compile cache outside the timed region
        float(jnp.sum(y))
        t0 = time.time()
        y = forward(x)
        # value fetch = the timing fence (block_until_ready is not a
        # reliable fence on the tunneled backend — CLAUDE.md)
        y = np.asarray(y)
        wall = time.time() - t0
        rtf = wall / (t / sr)
        rtfs.append(rtf)
        logger.info("%s: RTF = %.4f", utt_id, rtf)
        write_wav(os.path.join(output_dir, f"{utt_id}_output.wav"),
                  y[0, :t, 0], sr)
    mean_rtf = float(np.mean(rtfs)) if rtfs else float("nan")
    logger.info("Mean RTF = %.4f (N=%d)", mean_rtf, len(rtfs))
    return mean_rtf


def main(argv=None):
    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()  # persist jitted programs across CLI runs
    parser = ArgumentParser()
    parser.add_argument("--encoder", required=True,
                        help="analyzer checkpoint directory")
    parser.add_argument("--decoder", default=None)
    parser.add_argument("--input", required=True, help="wav dir / list / file")
    parser.add_argument("--output", default="test_out")
    parser.add_argument("--subset-num", type=int, default=-1)
    args = parser.parse_args(argv)
    run_codec_test(args.encoder, args.input, args.output, args.decoder,
                   args.subset_num)


if __name__ == "__main__":
    main()
