"""DNSMOS P.835 / P.808 scoring in pure JAX (no onnxruntime).

Re-designs reference DNSMOS/dnsmos_local.py:22-100: the two ONNX graphs are
parsed (eval/onnx_graph.py) and executed as jitted XLA programs
(eval/onnx_jax.py); the P.808 mel front-end reproduces
``librosa.feature.melspectrogram(n_fft=321, hop=160, n_mels=120)`` +
``power_to_db(ref=max)`` semantics. Segments of a clip are scored in ONE
batched device call instead of the reference's per-file thread pool.

Model files are the ONNX assets bundled with the reference checkout
(default: /root/reference/DNSMOS); point ``primary_model_path`` /
``p808_model_path`` elsewhere to use your own copies.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from dl_speech_enhancement_tpu.dsp.stft import hann_window, stft
from dl_speech_enhancement_tpu.dsp.mel import mel_filterbank
from dl_speech_enhancement_tpu.eval.onnx_jax import OnnxModel
from dl_speech_enhancement_tpu.data.audio_io import load_audio

SAMPLING_RATE = 16000
INPUT_LENGTH = 9.01

_DEFAULT_MODEL_DIR = "/root/reference/DNSMOS"

# P.835 polynomial calibration (dnsmos_local.py:33-47)
_POLY = {
    False: {"ovr": [-0.06766283, 1.11546468, 0.04602535],
            "sig": [-0.08397278, 1.22083953, 0.0052439],
            "bak": [-0.13166888, 1.60915514, -0.39604546]},
    True: {"ovr": [-0.00533021, 0.005101, 1.18058466, -0.11236046],
           "sig": [-0.01019296, 0.02751166, 1.19576786, -0.24348726],
           "bak": [-0.04976499, 0.44276479, -0.1644611, 0.96883132]},
}


def _polyval(coeffs, x):
    y = 0.0
    for c in coeffs:
        y = y * x + c
    return y


def default_model_paths(personalized: bool = False,
                        model_dir: str = _DEFAULT_MODEL_DIR):
    sub = "pDNSMOS" if personalized else "DNSMOS"
    return (os.path.join(model_dir, sub, "sig_bak_ovr.onnx"),
            os.path.join(model_dir, "DNSMOS", "model_v8.onnx"))


class ComputeScore:
    """DNSMOS scorer (drop-in for dnsmos_local.ComputeScore)."""

    def __init__(self, primary_model_path: str | None = None,
                 p808_model_path: str | None = None,
                 personalized: bool = False):
        if primary_model_path is None or p808_model_path is None:
            primary_model_path, p808_model_path = default_model_paths(personalized)
        self.personalized = personalized
        self.primary = OnnxModel(primary_model_path)
        self.p808 = OnnxModel(p808_model_path)
        # librosa.feature.melspectrogram(n_fft=321, hop=160, n_mels=120):
        # power-2 magnitude, slaney mel, fmax=sr/2.
        self._n_fft, self._hop = 321, 160
        self._window = hann_window(self._n_fft)
        self._melmat = jnp.asarray(
            mel_filterbank(SAMPLING_RATE, self._n_fft, 120, fmin=0.0)
        )
        self._audio_melspec = jax.jit(self._audio_melspec_impl)

    def _audio_melspec_impl(self, audio):
        """(B, T) -> (B, frames, 120), librosa power_to_db(ref=max)+40)/40."""
        z = stft(audio, self._window, n_fft=self._n_fft, hop=self._hop,
                 center=True, pad_mode="reflect")
        power = jnp.square(z.real) + jnp.square(z.imag)
        mel = power @ self._melmat  # (B, frames, 120)
        amin = 1e-10
        db = 10.0 * jnp.log10(jnp.maximum(mel, amin))
        ref = jnp.max(db, axis=(1, 2), keepdims=True)
        db = db - ref
        db = jnp.maximum(db, db.max(axis=(1, 2), keepdims=True) - 80.0)
        return (db + 40.0) / 40.0

    def score_segments(self, segments: np.ndarray) -> dict:
        """segments: (N, 144160) float32 at 16 kHz -> per-segment raw MOS."""
        segs = jnp.asarray(segments, jnp.float32)
        mel_in = self._audio_melspec(segs[:, :-160])
        p808 = np.asarray(self.p808(mel_in)[0])[:, 0]
        sig_bak_ovr = np.asarray(self.primary(segs)[0])
        return {
            "p808": p808,
            "sig_raw": sig_bak_ovr[:, 0],
            "bak_raw": sig_bak_ovr[:, 1],
            "ovr_raw": sig_bak_ovr[:, 2],
        }

    def __call__(self, fpath_or_audio, sampling_rate: int = SAMPLING_RATE,
                 is_personalized_MOS: bool | None = None) -> dict:
        """Score one clip (path or waveform array). Returns the reference's
        clip dict (dnsmos_local.py:91-100)."""
        if is_personalized_MOS is None:
            is_personalized_MOS = self.personalized
        if isinstance(fpath_or_audio, str):
            audio = load_audio(fpath_or_audio, SAMPLING_RATE)[:, 0]
            fname = fpath_or_audio
        else:
            audio = np.asarray(fpath_or_audio, np.float32).reshape(-1)
            if sampling_rate != SAMPLING_RATE:
                from dl_speech_enhancement_tpu.data.audio_io import resample
                audio = resample(audio[:, None], sampling_rate, SAMPLING_RATE)[:, 0]
            fname = "<array>"
        fs = SAMPLING_RATE
        actual_len = len(audio)
        len_samples = int(INPUT_LENGTH * fs)
        while len(audio) < len_samples:
            audio = np.append(audio, audio)
        num_hops = int(np.floor(len(audio) / fs) - INPUT_LENGTH) + 1
        segs = []
        for idx in range(num_hops):
            seg = audio[int(idx * fs): int((idx + INPUT_LENGTH) * fs)]
            if len(seg) >= len_samples:
                segs.append(seg[:len_samples])
        segs = np.stack(segs)
        n = segs.shape[0]
        # bucket the batch to the next power of two: score_segments (three
        # jitted programs) specializes on N, so unbucketed calls recompile
        # for every distinct clip length when scoring a directory; the pad
        # rows repeat the last segment and are dropped before the means
        bucket = 1 << (n - 1).bit_length()
        if bucket != n:
            segs = np.concatenate(
                [segs, np.repeat(segs[-1:], bucket - n, axis=0)])
        raw = self.score_segments(segs)
        raw = {k: v[:n] for k, v in raw.items()}
        poly = _POLY[bool(is_personalized_MOS)]
        sig = _polyval(poly["sig"], raw["sig_raw"])
        bak = _polyval(poly["bak"], raw["bak_raw"])
        ovr = _polyval(poly["ovr"], raw["ovr_raw"])
        return {
            "filename": fname,
            "len_in_sec": actual_len / fs,
            "sr": fs,
            "num_hops": num_hops,
            "OVRL_raw": float(np.mean(raw["ovr_raw"])),
            "SIG_raw": float(np.mean(raw["sig_raw"])),
            "BAK_raw": float(np.mean(raw["bak_raw"])),
            "OVRL": float(np.mean(ovr)),
            "SIG": float(np.mean(sig)),
            "BAK": float(np.mean(bak)),
            "P808_MOS": float(np.mean(raw["p808"])),
        }
