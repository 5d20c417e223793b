"""AudioDec facade + named model zoo.

Re-designs reference utils/audiodec.py:17-164: a convenience wrapper that
loads transmitter/receiver models from checkpoints (with their sibling
config.yml) and the ``assign_model`` preset table mapping model names to
experiment checkpoints + sample rates.

The without-PQC variant (utils/audiodec_without_PQC.py) is the same facade
with ``use_pqc=False`` — codes crossing tx->rx are raw encoder features
instead of int indices.
"""

from __future__ import annotations

import os

import jax

from dl_speech_enhancement_tpu.stream.runtime import AudioCodec, AudioCodecStreamer

# Streaming receptive lengths are derived from the architecture
# (AudioDecGenerator._derive_receptive_length: 7209 for
# symAD_vctk_48000_hop300, matching the reference's documented constant at
# utils/audiodec.py:23) — no per-preset table needed.


def assign_model(model: str, exp_root: str = "exp"):
    """Named presets -> (sample_rate, tx_steps, rx_steps checkpoints).

    Mirrors utils/audiodec.py:106-164. Checkpoints are orbax directories
    produced by cli.train; the vocoder presets pair an autoencoder analyzer
    (tx) with a vocoder generator (rx)."""
    def ae(tag, steps=200000):
        return os.path.join(exp_root, "autoencoder", tag,
                            f"checkpoint-{steps}steps")

    def voc(tag, steps=500000):
        return os.path.join(exp_root, "vocoder", tag,
                            f"checkpoint-{steps}steps")

    def dn(tag, steps=200000):
        return os.path.join(exp_root, "denoise", tag,
                            f"checkpoint-{steps}steps")

    presets = {
        "libritts_v1": (24000, ae("symAD_libritts_24000_hop300", 500000),
                        voc("AudioDec_v1_symAD_libritts_24000_hop300_clean")),
        "libritts_sym": (24000, ae("symAD_libritts_24000_hop300", 500000),
                         ae("symAD_libritts_24000_hop300", 500000)),
        "vctk_v0": (48000, ae("symAD_vctk_48000_hop300"),
                    voc("AudioDec_v0_symAD_vctk_48000_hop300_clean")),
        "vctk_v1": (48000, ae("symAD_vctk_48000_hop300"),
                    voc("AudioDec_v1_symAD_vctk_48000_hop300_clean")),
        "vctk_v2": (48000, ae("symAD_vctk_48000_hop300"),
                    voc("AudioDec_v2_symAD_vctk_48000_hop300_clean")),
        "vctk_sym": (48000, ae("symAD_vctk_48000_hop300", 500000),
                     ae("symAD_vctk_48000_hop300", 500000)),
        "vctk_univ": (48000, ae("symADuniv_vctk_48000_hop300", 500000),
                      voc("AudioDec_v3_symADuniv_vctk_48000_hop300_clean")),
        "vctk_univ_sym": (48000, ae("symADuniv_vctk_48000_hop300", 500000),
                          ae("symADuniv_vctk_48000_hop300", 500000)),
        # the reference pairs the fine-tuned denoise tx with the AudioDec_v1
        # VOCODER rx (utils/audiodec.py:144-149), decoding the tx's indices
        # with the tx codebook embeddings — not with a second codec
        "vctk_denoise": (48000, dn("symAD_vctk_48000_hop300"),
                         voc("AudioDec_v1_symAD_vctk_48000_hop300_clean")),
    }
    # historical alias from earlier rounds (the reference name is vctk_univ)
    presets["vctk_v3"] = presets["vctk_univ"]
    if model not in presets:
        raise NotImplementedError(f"Model {model} is not supported!")
    return presets[model]


def load_generator_from_checkpoint(checkpoint: str, use_pqc: bool = True):
    """Build an AudioDecGenerator + restore (params, vq_state) from an orbax
    checkpoint with its sibling config.yml."""
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.train.checkpoint import load_checkpoint
    from dl_speech_enhancement_tpu.utils.config import load_config_beside

    config = load_config_beside(checkpoint)
    gen = AudioDecGenerator(**config["generator_params"], use_pqc=use_pqc)
    params_like, vq_like = gen.init(jax.random.PRNGKey(0))
    like = {"params_generator": params_like}
    if use_pqc:
        like["vq_state"] = vq_like
    restored = load_checkpoint(checkpoint, like=like)
    # orbax returns numpy — pin on device so jitted consumers don't re-upload
    # the weights on every call
    params = jax.device_put(restored["params_generator"])
    vq_state = (jax.device_put(restored["vq_state"])
                if "vq_state" in restored else None)
    return gen, params, vq_state, config


def load_pair_models(model: str, exp_root: str = "exp"):
    """Load the raw model objects behind a named preset pair.

    Returns a dict with ``sample_rate`` plus the tx codec
    (``gen``/``params``/``vq_state``) and — for asymmetric presets — the
    receiver: ``vocoder``/``vocoder_params`` (v0-v3 and denoise presets) or
    ``rx_gen``/``rx_params``/``rx_vq_state`` (the mismatched-checkpoint
    extension mode — reached when an rx checkpoint names a codec rather
    than a vocoder; no named preset maps there since vctk_denoise was
    re-paired onto the vocoder rx). Symmetric presets carry only the tx
    codec. The receiver keys line up with
    ``parallel.serve.make_sharded_stream``'s keyword arguments so fleets
    can be built directly from a preset name."""
    import jax as _jax
    from dl_speech_enhancement_tpu.utils.config import load_config_beside
    from dl_speech_enhancement_tpu.utils.model_factory import build_generator
    from dl_speech_enhancement_tpu.train.checkpoint import load_checkpoint

    sample_rate, tx_ckpt, rx_ckpt = assign_model(model, exp_root)
    gen, params, vq_state, _ = load_generator_from_checkpoint(tx_ckpt)
    out = {"sample_rate": sample_rate, "gen": gen, "params": params,
           "vq_state": vq_state}
    if rx_ckpt == tx_ckpt:
        return out
    rx_config = load_config_beside(rx_ckpt)
    if rx_config.get("train_mode") == "vocoder":
        voc = build_generator(rx_config["model_type"],
                              rx_config["generator_params"])
        v_like = voc.init(_jax.random.PRNGKey(0))
        v_params = load_checkpoint(
            rx_ckpt, like={"params_generator": v_like})["params_generator"]
        out.update(vocoder=voc, vocoder_params=jax.device_put(v_params))
        return out
    rx_gen, rx_params, rx_vq, _ = load_generator_from_checkpoint(rx_ckpt)
    out.update(rx_gen=rx_gen, rx_params=rx_params, rx_vq_state=rx_vq)
    return out


def load_pair(model: str, exp_root: str = "exp", batch: int = 1,
              rx_backend: str = "xla"):
    """Build the tx/rx pair for a named preset: symmetric presets pair the
    codec with itself; v0-v3 presets pair the symAD analyzer (tx) with a
    HiFiGAN/UnivNet vocoder (rx) — utils/audiodec.py:32-57 semantics.

    ``rx_backend='pallas'`` (or 'auto') routes a vocoder rx through the
    fused segment pipeline (ops/vocoder_kernel.py) when possible.

    Returns (transmitter, receiver, sample_rate)."""
    from dl_speech_enhancement_tpu.stream.runtime import (
        StreamingTransmitter, StreamingReceiver, VocoderReceiver,
    )

    pair = load_pair_models(model, exp_root)
    gen, params, vq_state = pair["gen"], pair["params"], pair["vq_state"]
    sample_rate = pair["sample_rate"]
    tx = StreamingTransmitter(gen, params, vq_state, batch=batch)
    if "vocoder" in pair:
        rx = VocoderReceiver(gen, pair["vocoder"], pair["vocoder_params"],
                             vq_state, batch=batch, backend=rx_backend)
    elif "rx_gen" in pair:
        rx = StreamingReceiver(pair["rx_gen"], pair["rx_params"],
                               pair["rx_vq_state"], batch=batch)
    else:
        rx = StreamingReceiver(gen, params, vq_state, batch=batch)
    return tx, rx, sample_rate


class AudioDec:
    """High-level codec facade (utils/audiodec.py:17-103)."""

    def __init__(self, checkpoint: str, use_pqc: bool = True, batch: int = 1):
        gen, params, vq_state, config = load_generator_from_checkpoint(
            checkpoint, use_pqc=use_pqc
        )
        self.gen = gen
        self.config = config
        self.sample_rate = config.get("sampling_rate", 48000)
        self.codec = AudioCodec(gen, params, vq_state, batch=batch)
        self.codec.load()

    def streamer(self, frame_size: int = 1200, **kw) -> AudioCodecStreamer:
        tx = self.codec.tx_encoder
        s = AudioCodecStreamer(
            self.gen, tx.params, tx.vq_state, frame_size=frame_size,
            sample_rate=self.sample_rate,
            receptive_length=self.codec.receptive_length, **kw,
        )
        s.load()
        return s
