"""Eval tests: ONNX parser/interpreter, DNSMOS behavior, metric battery."""

import numpy as np
import pytest

from conftest import requires_reference

DNSMOS_DIR = "/root/reference/DNSMOS"


def test_onnx_interpreter_on_synthetic_graph():
    """Round-trip a tiny hand-built protobuf model through parse + run."""
    import struct

    def tag(fno, wire):
        return bytes([(fno << 3) | wire])

    def varint(v):
        out = b""
        while True:
            b = v & 0x7F
            v >>= 7
            out += bytes([b | (0x80 if v else 0)])
            if not v:
                return out

    def ld(fno, payload):
        return tag(fno, 2) + varint(len(payload)) + payload

    # TensorProto initializer: name="w", dims=[1], float_data=[2.0]
    w = ld(8, b"w") + tag(1, 0) + varint(1) + tag(2, 0) + varint(1) \
        + ld(4, struct.pack("<f", 2.0))
    # NodeProto: Mul(x, w) -> y
    node = ld(1, b"x") + ld(1, b"w") + ld(2, b"y") + ld(4, b"Mul")
    # value infos
    vi_x = ld(1, b"x")
    vi_y = ld(1, b"y")
    graph = ld(1, node) + ld(5, w) + ld(11, vi_x) + ld(12, vi_y)
    model = ld(7, graph)

    import tempfile, os
    from dl_speech_enhancement_tpu.eval.onnx_jax import OnnxModel
    with tempfile.NamedTemporaryFile(suffix=".onnx", delete=False) as f:
        f.write(model)
        path = f.name
    m = OnnxModel(path)
    out = m(np.asarray([3.0], np.float32))
    np.testing.assert_allclose(np.asarray(out[0]), [6.0])
    os.unlink(path)


@requires_reference
def test_dnsmos_models_parse_and_run(rng):
    from dl_speech_enhancement_tpu.eval.onnx_jax import OnnxModel

    m = OnnxModel(f"{DNSMOS_DIR}/DNSMOS/sig_bak_ovr.onnx")
    x = rng.standard_normal((2, 144160)).astype(np.float32) * 0.05
    out = np.asarray(m(x)[0])
    assert out.shape == (2, 3)
    assert np.all(np.isfinite(out))

    p = OnnxModel(f"{DNSMOS_DIR}/DNSMOS/model_v8.onnx")
    feats = rng.standard_normal((2, 900, 120)).astype(np.float32)
    out = np.asarray(p(feats)[0])
    assert out.shape == (2, 1)


@requires_reference
def test_dnsmos_separates_clean_from_noise():
    from dl_speech_enhancement_tpu.eval.dnsmos import ComputeScore

    cs = ComputeScore()
    clean = cs("/root/reference/notebook_files/clean1.wav")
    noise = cs("/root/reference/notebook_files/noise1.wav")
    assert clean["OVRL"] > noise["OVRL"] + 1.0
    assert clean["SIG"] > 3.0
    assert noise["SIG"] < 2.0
    for key in ("OVRL", "SIG", "BAK", "P808_MOS", "OVRL_raw", "num_hops"):
        assert key in clean


def test_stoi_behavior(rng):
    sr = 10000
    t = np.arange(sr * 2) / sr
    clean = (np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float64)
    from dl_speech_enhancement_tpu.eval import stoi

    same = stoi(clean, clean, sr)
    assert same > 0.99
    noisy = clean + 0.8 * rng.standard_normal(len(clean))
    mid = stoi(clean, noisy, sr)
    assert 0.2 < mid < same
    garbage = stoi(clean, rng.standard_normal(len(clean)), sr)
    assert garbage < mid


def test_sdr_behavior(rng):
    from dl_speech_enhancement_tpu.eval import sdr

    x = rng.standard_normal(8000)
    assert sdr(x, x) > 60
    # filtered version of target is NOT distortion for BSS-eval SDR
    h = np.zeros(16); h[3] = 0.8; h[7] = -0.2
    filtered = np.convolve(x, h)[: len(x)]
    assert sdr(filtered, x) > 40
    noisy = x + rng.standard_normal(len(x))
    assert sdr(noisy, x) < 5


def test_si_sdr_best_lag(rng):
    """Aligned SI-SDR recovers the true shift and the unshifted score."""
    from dl_speech_enhancement_tpu.eval import scale_invariant_sdr, si_sdr_best_lag

    sr = 48000
    t = np.arange(sr) / sr
    clean = (np.sin(2 * np.pi * 220 * t)
             * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float64)
    noisy = clean + 0.01 * rng.standard_normal(len(clean))

    # identity: lag 0, aligned == raw (high)
    val0, lag0 = si_sdr_best_lag(noisy, clean)
    assert lag0 == 0
    raw0 = float(scale_invariant_sdr(noisy[None], clean[None]))
    assert abs(val0 - raw0) < 0.2 and val0 > 20

    # a 1.5 ms delay: raw SI-SDR collapses, aligned recovers shift + score
    d = 72
    delayed = np.concatenate([np.zeros(d), noisy[:-d]])
    raw = float(scale_invariant_sdr(delayed[None], clean[None]))
    assert raw < 5
    val, lag = si_sdr_best_lag(delayed, clean)
    assert lag == d
    assert val > 20

    # negative lag (estimate ahead of target)
    advanced = np.concatenate([noisy[d:], np.zeros(d)])
    val, lag = si_sdr_best_lag(advanced, clean)
    assert lag == -d and val > 20

    # polarity flip must not fool the |xcorr| peak search
    val, lag = si_sdr_best_lag(-delayed, clean)
    assert lag == d and val > 20


@requires_reference
def test_analyze_cli_metric_battery(tmp_path, rng):
    """Full analysis battery on real audio through a tiny trained-ish model."""
    import jax
    from dl_speech_enhancement_tpu.cli.analyze import metric_battery

    sr = 48000
    from dl_speech_enhancement_tpu.data import load_audio
    clean = load_audio("/root/reference/notebook_files/clean1.wav", sr)[:sr, 0]
    # ~26 dB SNR relative to the clip's measured RMS (the clip peaks low);
    # published STOI sits near 1 there and drops through ~0.6 at 0-5 dB
    rms = float(np.sqrt(np.mean(clean**2)))
    noisy = clean + 0.05 * rms * rng.standard_normal(sr).astype(np.float32)
    m = metric_battery(noisy, clean, sr)
    for key in ("STOI", "ESTOI", "SI-SDR", "SDR", "SNR", "Mel-L1"):
        assert np.isfinite(m[key]), m
    assert m["STOI"] > 0.9
    assert m["ESTOI"] > 0.8


def test_estoi_behavior(rng):
    """ESTOI (extended=True): 1.0 on identical signals, monotone
    degradation with noise — pins the double (row-then-column)
    normalization estimator."""
    sr = 10000
    t = np.arange(sr * 2) / sr
    clean = (np.sin(2 * np.pi * 220 * t)
             * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float64)
    from dl_speech_enhancement_tpu.eval import stoi

    same = stoi(clean, clean, sr, extended=True)
    assert same > 0.99
    mid = stoi(clean, clean + 0.5 * rng.standard_normal(len(clean)), sr,
               extended=True)
    bad = stoi(clean, clean + 2.0 * rng.standard_normal(len(clean)), sr,
               extended=True)
    assert bad < mid < same
    assert mid < 0.95
