"""Data pipeline tests: wav io round-trip, datasets, collaters, mixing, loaders."""

import os

import numpy as np
import pytest

from dl_speech_enhancement_tpu.data import (
    read_wav,
    write_wav,
    resample,
    load_audio,
    AudioDataset,
    SingleDataset,
    MultiDataset,
    CollaterAudio,
    CollaterAudioPair,
    add_noise,
    noise_dropout,
    get_dataloaders,
    random_split,
)

from conftest import requires_reference


def _make_wavs(tmp_path, n=6, sr=16000, seconds=1.0, subdir="clean"):
    rng = np.random.default_rng(7)
    d = tmp_path / subdir / "spk1"
    d.mkdir(parents=True, exist_ok=True)
    paths = []
    for i in range(n):
        x = (rng.standard_normal(int(sr * seconds)) * 0.1).astype(np.float32)
        p = str(d / f"utt{i}.wav")
        write_wav(p, x, sr)
        paths.append(p)
    return paths


def test_wav_roundtrip(tmp_path):
    x = np.sin(np.linspace(0, 100, 16000)).astype(np.float32) * 0.5
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000 and y.shape == (16000, 1)
    np.testing.assert_allclose(y[:, 0], x, atol=1.0 / 32767)


def _write_raw_wav(path, fmt_tag, bits, sr, ch, payload: bytes):
    import struct
    fmt = struct.pack("<HHIIHH", fmt_tag, ch, sr, sr * ch * bits // 8,
                      ch * bits // 8, bits)
    data = (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    with open(path, "wb") as f:
        f.write(data)


def test_wav_formats_24bit_float_stereo(tmp_path, rng):
    """24-bit PCM, IEEE float32, and stereo decode identically via the
    native C++ reader and the Python RIFF fallback."""
    import dl_speech_enhancement_tpu.data.native as native

    x = np.clip(rng.standard_normal((64, 2)) * 0.3, -0.99, 0.99).astype(np.float32)
    # float32 stereo
    pf = str(tmp_path / "f32.wav")
    _write_raw_wav(pf, 3, 32, 16000, 2, x.astype("<f4").tobytes())
    # 24-bit PCM stereo
    ints = np.clip(np.round(x * 8388608.0), -8388608, 8388607).astype(np.int32)
    b24 = b"".join(int(v).to_bytes(3, "little", signed=True)
                   for v in ints.reshape(-1))
    p24 = str(tmp_path / "p24.wav")
    _write_raw_wav(p24, 1, 24, 16000, 2, b24)

    for path, atol in ((pf, 0.0), (p24, 1.5 / 8388608)):
        got_py = None
        # python path
        saved = (native._LIB, native._TRIED)
        native._LIB, native._TRIED = None, True
        try:
            got_py, sr = read_wav(path)
        finally:
            native._LIB, native._TRIED = saved
        assert sr == 16000 and got_py.shape == (64, 2)
        np.testing.assert_allclose(got_py, x, atol=atol or 1e-7)
        if native.available():
            got_nat, sr2 = native.read_wav(path)
            np.testing.assert_allclose(got_nat, got_py, atol=1e-7)


def test_resample_preserves_tone(tmp_path):
    sr, target = 48000, 24000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)[:, None]
    y = resample(x, sr, target)
    assert y.shape[0] == target
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(y[:, 0]))
    assert abs(np.argmax(spec) - 440) <= 1


def test_audio_dataset_scan(tmp_path):
    _make_wavs(tmp_path, n=4)
    ds = AudioDataset(str(tmp_path / "clean"), "clean", 16000)
    assert len(ds) == 4
    item = ds[0]
    assert item.ndim == 2 and item.shape[1] == 1


def test_single_and_multi_dataset(tmp_path):
    paths = _make_wavs(tmp_path, n=4)
    ds = SingleDataset(str(tmp_path / "clean"), return_utt_id=True)
    assert len(ds) == 4
    uid, audio = ds[0]
    assert uid.startswith("utt") and audio.ndim == 2

    md = MultiDataset([paths, paths], return_utt_id=False)
    a, b = md[1]
    np.testing.assert_array_equal(a, b)


def test_collater_shapes_and_pair_alignment(rng):
    clips = [rng.standard_normal((5000, 1)).astype(np.float32) for _ in range(4)]
    c = CollaterAudio(batch_length=1200, rng=np.random.default_rng(0))
    out = c(clips)
    assert out.shape == (4, 1200, 1)

    pairs = [(x, x * 2.0) for x in clips]
    cp = CollaterAudioPair(batch_length=1200, rng=np.random.default_rng(0))
    n_batch, x_batch = cp(pairs)
    np.testing.assert_allclose(x_batch * 2.0, n_batch, atol=1e-6)

    # short clips filtered
    assert c([rng.standard_normal((100, 1))]) is None


def test_add_noise_reference_formula(rng):
    s = rng.standard_normal((2, 1200, 1)).astype(np.float32)
    n = rng.standard_normal((2, 1200, 1)).astype(np.float32)
    m = add_noise(s, n, 15)
    scale = np.exp(15 / 10) * np.linalg.norm(n) / np.linalg.norm(s)
    np.testing.assert_allclose(m, (scale * s + n) / 2, rtol=1e-5)
    # standard mode hits the requested SNR
    m2 = add_noise(s, n, 10, mode="db")
    noise_part = m2 - s
    snr = 20 * np.log10(np.linalg.norm(s) / np.linalg.norm(noise_part))
    np.testing.assert_allclose(snr, 10, atol=0.1)


def test_noise_dropout_pre_mix_semantics(rng):
    clean = np.ones((8, 10, 1), np.float32)
    noise = np.zeros((8, 10, 1), np.float32)
    out = noise_dropout(clean, noise, 1.0, np.random.default_rng(0))
    np.testing.assert_array_equal(out, clean)  # rate=1 -> all replaced
    out0 = noise_dropout(clean, noise, 0.0, np.random.default_rng(0))
    np.testing.assert_array_equal(out0, noise)


def test_split_determinism_and_disjointness(tmp_path):
    _make_wavs(tmp_path, n=10)
    ds = AudioDataset(str(tmp_path / "clean"), "clean", 16000)
    s1 = random_split(ds, [0.7, 0.15, 0.15], seed=82)
    s2 = random_split(ds, [0.7, 0.15, 0.15], seed=82)
    assert [x.indices for x in s1] == [x.indices for x in s2]
    all_idx = sorted(sum((list(x.indices) for x in s1), []))
    assert all_idx == list(range(10))


def test_dataloader_determinism_same_seed(tmp_path):
    """Two loaders with the same seed yield identical batch sequences
    (the reference's reproducibility contract, data_utils.py:38-51)."""
    _make_wavs(tmp_path, n=8, seconds=0.5)
    from dl_speech_enhancement_tpu.data import AudioDataset, create_dataloader

    ds = AudioDataset(str(tmp_path / "clean"), "clean", 16000)
    a = list(create_dataloader(ds, 2, 1600, seed=7))
    b = list(create_dataloader(ds, 2, 1600, seed=7))
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = list(create_dataloader(ds, 2, 1600, seed=8))
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_prefetch_empty_iterator():
    from dl_speech_enhancement_tpu.data.loader import prefetch_to_device
    assert list(prefetch_to_device([])) == []
    assert list(prefetch_to_device([np.ones(3)], size=5))[0].shape == (3,)


def test_dataloader_end_to_end(tmp_path):
    _make_wavs(tmp_path, n=8, seconds=0.5)
    ds = AudioDataset(str(tmp_path / "clean"), "clean", 16000)
    train, val, test = get_dataloaders(ds, [0.5, 0.25, 0.25], batch_size=2,
                                       batch_length=1600, seed=3)
    batches = list(train)
    assert len(batches) == 2
    for b in batches:
        assert b.shape == (2, 1600, 1)


def test_random_split_matches_torch_remainder_distribution():
    """torch.random_split round-robins the rounding remainder starting at
    the FIRST split; n=10 @ [0.7, 0.15, 0.15] must give 8/1/1, not 7/1/2."""
    from dl_speech_enhancement_tpu.data.dataset import random_split

    subsets = random_split(list(range(10)), [0.7, 0.15, 0.15], seed=0)
    assert [len(s) for s in subsets] == [8, 1, 1]
    # all indices used exactly once
    seen = sorted(i for s in subsets for i in s.indices)
    assert seen == list(range(10))


def test_prefetch_worker_exception_propagates():
    """A dataset error inside the prefetch thread must re-raise in the
    consumer, not masquerade as a truncated epoch."""
    from dl_speech_enhancement_tpu.data.loader import DataLoader

    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise ValueError("corrupt clip")
            return np.zeros((100, 1), np.float32)

    dl = DataLoader(Bad(), 2, lambda items: np.stack(items), shuffle=False,
                    prefetch=2)
    with pytest.raises(ValueError, match="corrupt clip"):
        list(dl)


def test_wav_odd_fmt_chunk_pad(tmp_path):
    """RIFF pads odd-sized chunks; the pad byte after a non-data chunk must
    be skipped or every later chunk header parses one byte off."""
    from dl_speech_enhancement_tpu.data.audio_io import read_wav
    from dl_speech_enhancement_tpu.data import native as nat

    pcm = (np.arange(10, dtype=np.int16) * 100).tobytes()
    # fmt chunk artificially 17 bytes (odd) + 1 pad byte
    fmt = (np.int16(1).tobytes() + np.int16(1).tobytes()
           + np.int32(8000).tobytes() + np.int32(16000).tobytes()
           + np.int16(2).tobytes() + np.int16(16).tobytes() + b"\x00")
    body = (b"fmt " + len(fmt).to_bytes(4, "little") + fmt + b"\x00"
            + b"data" + len(pcm).to_bytes(4, "little") + pcm)
    blob = b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body
    p = tmp_path / "odd_fmt.wav"
    p.write_bytes(blob)
    nat.available()  # ensure _TRIED is set before disabling
    lib = nat._LIB
    try:
        nat._LIB = None  # force the pure-Python RIFF parser
        x, sr = read_wav(str(p))
    finally:
        nat._LIB = lib
    assert sr == 8000 and x.shape == (10, 1)
    np.testing.assert_allclose(x[:, 0], np.arange(10) * 100 / 32768.0,
                               atol=1e-7)


def test_native_write_wav_bit_identical(tmp_path):
    """The native C++ PCM16 encoder and the stdlib-wave fallback must
    produce byte-identical files (same layout, same half-to-even
    rounding)."""
    from dl_speech_enhancement_tpu.data import native
    from dl_speech_enhancement_tpu.data.audio_io import write_wav

    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(4096).astype(np.float32) * 0.3)
    # include exact-tie values that distinguish rounding modes
    x[:4] = np.asarray([0.5, 1.5, -0.5, 2.5], np.float32) / 32768.0
    p_native = tmp_path / "n.wav"
    p_python = tmp_path / "p.wav"
    assert native.write_wav(str(p_native), x, 16000)
    # force the pure-Python path
    import dl_speech_enhancement_tpu.data.native as nat
    lib = nat._LIB
    try:
        nat._LIB = None
        write_wav(str(p_python), x, 16000)
    finally:
        nat._LIB = lib
    assert p_native.read_bytes() == p_python.read_bytes()
