"""CLI tests: stream, testing_denoise, dnsmos, analyze on a tiny setup."""

import os

import numpy as np
import pytest
import yaml

from conftest import requires_reference
from dl_speech_enhancement_tpu.data import write_wav

SR = 4800

TINY_GEN = dict(
    input_channels=1, output_channels=1, encode_channels=8, decode_channels=8,
    code_dim=16, codebook_num=2, codebook_size=32, bias=True,
    enc_ratios=[2, 4], dec_ratios=[4, 2], enc_strides=[3, 4],
    dec_strides=[4, 3], mode="causal", codec="audiodec",
    projector="conv1d", quantier="residual_vq",
)


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """A saved tiny PQC checkpoint with config.yml beside it."""
    import jax
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.train.checkpoint import save_checkpoint

    root = tmp_path_factory.mktemp("ckpt_root")
    gen = AudioDecGenerator(**TINY_GEN, use_pqc=True)
    params, vqs = gen.init(jax.random.PRNGKey(0))
    config = {"sampling_rate": SR, "generator_params": TINY_GEN,
              "model_type": "symAudioDec"}
    path = str(root / "checkpoint-1steps")
    save_checkpoint(path, {"params_generator": params, "vq_state": vqs},
                    config=config)
    return path


def test_stream_cli_file_mode(tiny_ckpt, tmp_path, rng):
    from dl_speech_enhancement_tpu.cli import stream as stream_cli

    wav_in = str(tmp_path / "in.wav")
    write_wav(wav_in, (0.3 * rng.standard_normal(SR * 2)).astype(np.float32), SR)
    wav_out = str(tmp_path / "out.wav")
    stats = stream_cli.main([
        "--checkpoint", tiny_ckpt, "-i", wav_in, "-o", wav_out,
        "--frame-size", "24", "--max-latency", "10",
    ])
    assert os.path.exists(wav_out)
    assert stats["frames"] > 0
    assert stats["encoder_ms_mean"] > 0


def test_stream_cli_without_pqc(tmp_path, rng):
    import jax
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.train.checkpoint import save_checkpoint
    from dl_speech_enhancement_tpu.cli import stream as stream_cli

    gen = AudioDecGenerator(**TINY_GEN, use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(1))
    ckpt = str(tmp_path / "dn" / "checkpoint-1steps")
    save_checkpoint(ckpt, {"params_generator": params},
                    config={"sample_rate": SR, "generator_params": TINY_GEN})
    wav_in = str(tmp_path / "in.wav")
    write_wav(wav_in, (0.3 * rng.standard_normal(SR)).astype(np.float32), SR)
    stats = stream_cli.main([
        "--checkpoint", ckpt, "--without-pqc", "-i", wav_in,
        "-o", str(tmp_path / "out.wav"), "--frame-size", "24",
        "--max-latency", "10",
    ])
    assert stats["frames"] > 0


def test_stream_cli_live_without_sounddevice(tiny_ckpt, tmp_path, rng):
    """--live without the optional sounddevice package fails with a clear
    message instead of a bare ImportError."""
    from dl_speech_enhancement_tpu.cli import stream as stream_cli

    with pytest.raises(RuntimeError, match="sounddevice"):
        stream_cli.main(["--checkpoint", tiny_ckpt, "--live",
                         "--frame-size", "24"])


def test_audiodec_facade_and_model_zoo(tiny_ckpt, tmp_path, rng):
    """utils.audiodec: facade load/prime/stream + preset table sanity."""
    import jax.numpy as jnp
    from dl_speech_enhancement_tpu.utils.audiodec import AudioDec, assign_model

    ad = AudioDec(tiny_ckpt, use_pqc=True)
    assert ad.sample_rate == SR
    chunk = jnp.asarray(rng.standard_normal((1, 24, 1)).astype(np.float32))
    idx = ad.codec._encode(chunk)
    y = ad.codec._decode(idx)
    assert y.shape == (1, 24, 1)
    streamer = ad.streamer(frame_size=24, max_latency=10.0)
    out = streamer.run_array(np.asarray(
        rng.standard_normal((1, 24 * 4, 1)).astype(np.float32)))
    assert out.shape[1] >= 24 * 3

    # preset table: all 10 names resolve, unknown raises
    for name in ("libritts_v1", "libritts_sym", "vctk_v0", "vctk_v1",
                 "vctk_v2", "vctk_sym", "vctk_univ", "vctk_v3",
                 "vctk_univ_sym", "vctk_denoise"):
        sr, tx, rx = assign_model(name)
        assert sr in (24000, 48000) and "checkpoint" in tx
    with pytest.raises(NotImplementedError):
        assign_model("nope")


def test_stream_cli_multi_stream(tiny_ckpt, tmp_path, rng):
    """Multiple -i inputs batch through one streamer, one output each."""
    from dl_speech_enhancement_tpu.cli import stream as stream_cli

    ins = []
    for i in range(3):
        p = str(tmp_path / f"in{i}.wav")
        write_wav(p, (0.3 * rng.standard_normal(SR)).astype(np.float32), SR)
        ins.append(p)
    stats = stream_cli.main([
        "--checkpoint", tiny_ckpt,
        "-i", ins[0], "-i", ins[1], "-i", ins[2],
        "-o", str(tmp_path / "out.wav"),
        "--frame-size", "24", "--max-latency", "10",
    ])
    assert stats["frames"] > 0
    for i in range(3):
        assert os.path.exists(str(tmp_path / f"out-{i}.wav"))


@requires_reference
def test_dnsmos_cli_scores_directory(tmp_path):
    from dl_speech_enhancement_tpu.cli import dnsmos as dnsmos_cli
    from dl_speech_enhancement_tpu.data import load_audio

    d = tmp_path / "modelA"
    d.mkdir()
    x = load_audio("/root/reference/notebook_files/clean1.wav", 16000)
    write_wav(str(d / "test-0.wav"), x[:, 0], 16000)
    df = dnsmos_cli.main(["-t", str(tmp_path), "-o", str(tmp_path / "s.csv")])
    assert len(df) == 1
    assert os.path.exists(str(tmp_path / "s.csv"))
    assert df.iloc[0]["SIG"] > 2.5


def test_testing_denoise_flagship_dump(tmp_path, rng):
    """infer_split writes per-model wavs with the expected naming."""
    import jax
    import jax.numpy as jnp
    from dl_speech_enhancement_tpu.cli.testing_denoise import infer_split
    from dl_speech_enhancement_tpu.models import AudioDecGenerator

    gen = AudioDecGenerator(**TINY_GEN, use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(0))

    @jax.jit
    def infer(x):
        y, *_ = gen(params, None, x, train=False)
        return y

    clean = [rng.standard_normal((2, 240, 1)).astype(np.float32) for _ in range(2)]
    noise = [0.1 * rng.standard_normal((2, 240, 1)).astype(np.float32) for _ in range(2)]
    counters = infer_split(
        {"flag": (infer, gen.hop)}, clean, noise, str(tmp_path), SR,
        np.random.default_rng(0),
    )
    assert counters["flag"] == 4
    assert os.path.exists(str(tmp_path / "flag" / "test-3.wav"))
    assert os.path.exists(str(tmp_path / "noisy" / "test-0.wav"))
    assert os.path.exists(str(tmp_path / "clean" / "test-0.wav"))


def test_serve_cli_fleet(tiny_ckpt, tmp_path, rng):
    """cli.serve: a 16-stream fleet sharded over the 8-device mesh, inputs
    tiled round-robin, per-stream outputs written and correctly paired."""
    from dl_speech_enhancement_tpu.cli import serve as serve_cli

    ins = []
    for i in range(2):
        p = str(tmp_path / f"in{i}.wav")
        write_wav(p, (0.3 * rng.standard_normal(24 * 40)).astype(np.float32),
                  SR)
        ins.append(p)
    out = str(tmp_path / "fleet.wav")
    stats = serve_cli.main([
        "--checkpoint", tiny_ckpt, "--streams", "16",
        "-i", ins[0], "-i", ins[1], "-o", out,
        "--frame-size", "24", "--block-frames", "4", "--max-outputs", "4",
    ])
    assert stats["streams"] == 16 and stats["devices"] == 8
    assert stats["frames"] == 40
    assert stats["realtime_stream_equivalents"] > 0
    y = [np.fromfile(str(tmp_path / f"fleet-{b}.wav"), dtype=np.int16)[22:]
         for b in range(4)]
    # stream b plays input b % 2: 0==2, 1==3, 0!=1
    assert np.array_equal(y[0], y[2]) and np.array_equal(y[1], y[3])
    assert not np.array_equal(y[0], y[1])


def test_serve_cli_stream_count_validation(tiny_ckpt, tmp_path, rng):
    """Total streams must divide over the mesh devices."""
    import pytest as _pytest
    from dl_speech_enhancement_tpu.cli import serve as serve_cli

    p = str(tmp_path / "in.wav")
    write_wav(p, (0.3 * rng.standard_normal(240)).astype(np.float32), SR)
    with _pytest.raises(ValueError, match="divide"):
        serve_cli.main(["--checkpoint", tiny_ckpt, "--streams", "3",
                        "-i", p, "--frame-size", "24"])
