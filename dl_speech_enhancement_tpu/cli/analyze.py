"""Offline analysis (sandbox.py + mel_spectrogram.py equivalents).

Mix one clean/noise pair at a chosen SNR, run it through a model checkpoint,
write the wavs, print the objective metric battery (STOI / SI-SDR / SDR /
SNR / Mel-L1 — sandbox.py:101-115), and optionally save spectrogram +
waveform plots (sandbox.py:194-252).

Usage:
    python -m dl_speech_enhancement_tpu.cli.analyze \
        --checkpoint job_out/<task>checkpoint-<steps> --without-pqc \
        --clean clean1.wav --noise noise1.wav --snr 15 --plots out/
"""

from __future__ import annotations

import json
import os
from argparse import ArgumentParser

import numpy as np


def metric_battery(pred: np.ndarray, clean: np.ndarray, sr: int) -> dict:
    from dl_speech_enhancement_tpu.eval import (
        stoi, sdr, signal_noise_ratio, scale_invariant_sdr, mel_l1,
    )
    import jax.numpy as jnp

    p = jnp.asarray(pred.reshape(1, -1))
    c = jnp.asarray(clean.reshape(1, -1))
    return {
        "STOI": round(stoi(clean, pred, sr), 4),
        "ESTOI": round(stoi(clean, pred, sr, extended=True), 4),
        "SI-SDR": round(float(scale_invariant_sdr(p, c)), 3),
        "SDR": round(sdr(pred, clean), 3),
        "SNR": round(float(signal_noise_ratio(p, c)), 3),
        "Mel-L1": round(mel_l1(pred, clean, sr), 4),
    }


def save_plots(out_dir: str, sr: int, signals: dict):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp
    from dl_speech_enhancement_tpu.dsp import MelSpectrogram

    mel = MelSpectrogram(fs=sr, fft_size=2048, hop_size=300, num_mels=80,
                         fmin=0, fmax=sr // 2, log_base=None)
    os.makedirs(out_dir, exist_ok=True)
    fig, axes = plt.subplots(len(signals), 2, figsize=(12, 3 * len(signals)))
    if len(signals) == 1:
        axes = axes[None, :]
    for row, (name, x) in enumerate(signals.items()):
        t = np.arange(len(x)) / sr
        axes[row, 0].plot(t, x, linewidth=0.3)
        axes[row, 0].set_title(f"{name} waveform")
        m = np.asarray(mel(jnp.asarray(x.reshape(1, -1)))[0]).T
        axes[row, 1].imshow(m, origin="lower", aspect="auto")
        axes[row, 1].set_title(f"{name} log-mel")
    fig.tight_layout()
    path = os.path.join(out_dir, "analysis.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def eval_wavs(clean_path: str, wav_paths: list, sr: int | None = None,
              plots_dir: str | None = None) -> dict:
    """Metric battery over already-saved wavs against a clean reference
    (the reference's mel_spectrogram.py workflow)."""
    from dl_speech_enhancement_tpu.data import load_audio, read_wav

    clean, file_sr = read_wav(clean_path)
    sr = sr or file_sr
    clean = load_audio(clean_path, sr)[:, 0]
    results = {}
    signals = {"clean": clean}
    for path in wav_paths:
        x = load_audio(path, sr)[:, 0]
        t = min(len(x), len(clean))
        results[path] = metric_battery(x[:t], clean[:t], sr)
        signals[os.path.basename(path)] = x[:t]
    if plots_dir:
        save_plots(plots_dir, sr, signals)
    return results


def main(argv=None):
    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()  # persist jitted programs across CLI runs
    parser = ArgumentParser()
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--without-pqc", action="store_true")
    parser.add_argument("--clean", required=True)
    parser.add_argument("--noise", default=None)
    parser.add_argument("--eval-wavs", nargs="*", default=None,
                        help="score saved wavs against --clean instead of "
                             "running a model (mel_spectrogram.py mode)")
    parser.add_argument("--snr", type=float, default=15.0)
    parser.add_argument("--out-dir", default="analysis_out")
    parser.add_argument("--plots", action="store_true")
    args = parser.parse_args(argv)

    if args.eval_wavs is not None:
        results = eval_wavs(args.clean, args.eval_wavs,
                            plots_dir=args.out_dir if args.plots else None)
        print(json.dumps(results, indent=2))
        return results
    assert args.checkpoint and args.noise, \
        "model mode needs --checkpoint and --noise"

    import jax
    import jax.numpy as jnp
    from dl_speech_enhancement_tpu.data import load_audio, write_wav, add_noise
    from dl_speech_enhancement_tpu.utils.audiodec import (
        load_generator_from_checkpoint,
    )

    gen, params, vq_state, config = load_generator_from_checkpoint(
        args.checkpoint, use_pqc=not args.without_pqc
    )
    sr = config.get("sampling_rate", config.get("sample_rate", 48000))
    clean = load_audio(args.clean, sr)[:, :1]
    noise = load_audio(args.noise, sr)[:, :1]
    t = min(len(clean), len(noise))
    t = (t // gen.hop) * gen.hop
    clean, noise = clean[:t], noise[:t]
    mixed = add_noise(clean, noise, args.snr)

    @jax.jit
    def infer(x):
        y, *_ = gen(params, vq_state, x, train=False)
        return y

    pred = np.asarray(infer(jnp.asarray(mixed[None])))[0]

    os.makedirs(args.out_dir, exist_ok=True)
    for name, x in (("clean", clean), ("mixed", mixed), ("denoised", pred)):
        write_wav(os.path.join(args.out_dir, f"{name}.wav"), x[:, 0], sr)

    results = {
        "mixed_vs_clean": metric_battery(mixed[:, 0], clean[:, 0], sr),
        "denoised_vs_clean": metric_battery(pred[:, 0], clean[:, 0], sr),
    }
    print(json.dumps(results, indent=2))
    if args.plots:
        path = save_plots(args.out_dir, sr, {
            "clean": clean[:, 0], "mixed": mixed[:, 0], "denoised": pred[:, 0],
        })
        print("plots:", path)
    return results


if __name__ == "__main__":
    main()
