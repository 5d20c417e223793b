"""Export this framework's param trees as reference (PyTorch) state_dicts.

The inverse of :mod:`.torch_import`: our functional params become the exact
``state_dict`` key/value layout the reference's torch modules load with
``strict=True``, so models trained here can be deployed or fine-tuned with
the reference stack (or any AudioDec-compatible torch code):

- channels-last conv weights ``(k, in, out)`` become torch Conv1d
  ``(out, in, k)``; our dilated-conv-layout transposed weights are
  tap-flipped back to ConvTranspose1d ``(in, out, k)``; ``(kh, kw, in,
  out)`` becomes Conv2d ``(out, in, kh, kw)``.
- our weight-norm ``{g, v}`` params map onto torch ``weight_g``/``weight_v``
  parametrizations (models/vocoder/HiFiGAN.py:193-203).
- every causal (transposed) conv's streaming ``pad_buffer`` is emitted as
  zeros of the reference shape ((k-1)*dilation / 1 taps,
  layers/conv_layer.py:134-137,176-180) — the reference zeroes them before
  streaming anyway (reset_buffer).
- the stacked residual-VQ :class:`~..nn.vq.VQState` unstacks into per-layer
  ``embed``/``cluster_size``/``embed_avg`` buffers (vq_module.py:40-43).
- **without-PQC**: the reference Generator still *constructs* the projector,
  quantizer and decoder input conv (models/autoencoder_without_PQC/
  modules/decoder.py:96-101 — unused in forward), so its state_dict demands
  those entries. They are synthesized as seeded-random placeholders, exactly
  as untrained-but-present as in a reference course checkpoint.

Values are numpy; the CLI (cli/export_checkpoint.py) wraps them in torch
tensors for ``torch.save``. Round-trips are pinned by
tests/test_torch_export.py (strict ``load_state_dict`` into the reference's
own modules + forward agreement).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "export_audiodec_generator",
    "export_hifigan_generator",
    "export_hifigan_discriminator",
    "export_univnet_discriminator",
]


# ---------------------------------------------------------------- low level

def _np(x) -> np.ndarray:
    return np.asarray(x)


def _w_out(w) -> np.ndarray:
    """ours (k, in, out) -> torch Conv1d (out, in, k)."""
    return _np(w).transpose(2, 1, 0)


def _dw_out(w) -> np.ndarray:
    """ours flipped (k, in, out) -> torch ConvTranspose1d (in, out, k)."""
    return _np(w).transpose(1, 2, 0)[:, :, ::-1].copy()


def _w2d_out(w) -> np.ndarray:
    """ours (kh, kw, in, out) -> torch Conv2d (out, in, kh, kw)."""
    return _np(w).transpose(3, 2, 0, 1)


def _emit_conv(out: dict, prefix: str, p: dict, *, transposed: bool = False,
               two_d: bool = False) -> None:
    """Write the torch keys of one conv at ``prefix`` from our params ``p``
    ({w} or {v, g}, optional {b})."""
    wf = _w2d_out if two_d else (_dw_out if transposed else _w_out)
    if "v" in p:
        out[f"{prefix}.weight_g"] = wf(p["g"])
        out[f"{prefix}.weight_v"] = wf(p["v"])
    else:
        out[f"{prefix}.weight"] = wf(p["w"])
    if "b" in p:
        out[f"{prefix}.bias"] = _np(p["b"])


def _emit_pad(out: dict, prefix: str, conv, *, transposed: bool = False) -> None:
    """Zero pad_buffer of the reference shape for the causal conv module
    ``conv`` (ours; exposes in_channels/kernel_size/dilation)."""
    taps = 1 if transposed else (conv.kernel_size - 1) * conv.dilation
    out[f"{prefix}.pad_buffer"] = np.zeros(
        (1, conv.in_channels, taps), np.float32)


# ------------------------------------------------------------- generators

def _emit_res_unit(out: dict, base: str, unit, p: dict) -> None:
    # conv1 = CausalConv1d (inner .conv + pad_buffer), conv2 = bare 1x1
    _emit_pad(out, f"{base}.conv1", unit.conv1)
    _emit_conv(out, f"{base}.conv1.conv", p["conv1"])
    _emit_conv(out, f"{base}.conv2", p["conv2"])


def export_audiodec_generator(params: dict, vq_state, gen,
                              generator_config: dict | None = None) -> dict:
    """Our AudioDec generator params -> reference state_dict (numpy values).

    ``gen`` is the :class:`~..models.autoencoder.AudioDecGenerator` the
    params belong to. For ``use_pqc=False``, ``generator_config`` (the
    config's ``generator_params``) supplies ``code_dim``/``codebook_num``/
    ``codebook_size`` for the placeholder PQ entries the reference module
    constructs but never uses.
    """
    sd: dict = {}
    enc = params["encoder"]
    _emit_pad(sd, "encoder.conv", gen.encoder.conv)
    _emit_conv(sd, "encoder.conv.conv", enc["conv"])
    for i, (blk, bp) in enumerate(zip(gen.encoder.blocks, enc["blocks"])):
        b = f"encoder.conv_blocks.{i}"
        for j, (u, up) in enumerate(zip(blk.res_units, bp["res"])):
            _emit_res_unit(sd, f"{b}.res_units.{j}", u, up)
        _emit_pad(sd, f"{b}.conv", blk.conv)
        _emit_conv(sd, f"{b}.conv.conv", bp["conv"])

    dec = params["decoder"]
    rng = np.random.default_rng(0)
    if gen.use_pqc:
        _emit_pad(sd, "decoder.conv1", gen.decoder.conv1)
        _emit_conv(sd, "decoder.conv1.conv", dec["conv1"])
    else:
        cfg = dict(generator_config or {})
        code_dim = int(cfg.get("code_dim", 64))
        decode_channels = int(cfg.get("decode_channels", 32))
        dec_ratios = list(cfg.get("dec_ratios", (16, 8, 4, 2)))
        enc_out = decode_channels * dec_ratios[0]
        k = gen.decoder.conv2.kernel_size
        # placeholder (constructed-but-unused in the reference, see module
        # docstring) — seeded random like an untrained torch module
        sd["decoder.conv1.pad_buffer"] = np.zeros(
            (1, code_dim, (k - 1)), np.float32)
        sd["decoder.conv1.conv.weight"] = (
            rng.standard_normal((enc_out, code_dim, k)).astype(np.float32)
            * 0.01)
    for i, (blk, bp) in enumerate(zip(gen.decoder.blocks, dec["blocks"])):
        b = f"decoder.conv_blocks.{i}"
        _emit_pad(sd, f"{b}.conv", blk.conv, transposed=True)
        _emit_conv(sd, f"{b}.conv.deconv", bp["conv"], transposed=True)
        for j, (u, up) in enumerate(zip(blk.res_units, bp["res"])):
            _emit_res_unit(sd, f"{b}.res_units.{j}", u, up)
    _emit_pad(sd, "decoder.conv2", gen.decoder.conv2)
    _emit_conv(sd, "decoder.conv2.conv", dec["conv2"])

    if gen.use_pqc:
        _emit_pad(sd, "projector.project", gen.projector.conv)
        _emit_conv(sd, "projector.project.conv", params["projector"]["conv"])
        embed = _np(vq_state.embed)
        cluster = _np(vq_state.cluster_size)
        avg = _np(vq_state.embed_avg)
        for i in range(embed.shape[0]):
            base = f"quantizer.codebook.layers.{i}"
            sd[f"{base}.embed"] = embed[i]
            sd[f"{base}.cluster_size"] = cluster[i]
            sd[f"{base}.embed_avg"] = avg[i]
    else:
        cfg = dict(generator_config or {})
        code_dim = int(cfg.get("code_dim", 64))
        n_books = int(cfg.get("codebook_num", 8))
        book = int(cfg.get("codebook_size", 1024))
        # the reference Projector's in_channels is the ENCODER output width
        # (models/autoencoder/AudioDec.py:78-86) — not the decoder's; they
        # only coincide for symmetric channel plans
        enc_out = gen.encoder.out_channels
        sd["projector.project.pad_buffer"] = np.zeros(
            (1, enc_out, 2), np.float32)
        sd["projector.project.conv.weight"] = (
            rng.standard_normal((code_dim, enc_out, 3)).astype(np.float32)
            * 0.01)
        for i in range(n_books):
            base = f"quantizer.codebook.layers.{i}"
            embed = rng.standard_normal((code_dim, book)).astype(np.float32)
            sd[f"{base}.embed"] = embed
            sd[f"{base}.cluster_size"] = np.zeros((book,), np.float32)
            sd[f"{base}.embed_avg"] = embed.copy()
    return sd


def export_hifigan_generator(params: dict, gen, stats=None) -> dict:
    """Our HiFiGAN vocoder params -> reference state_dict (numpy values).

    Handles both multi-fusion forms (MRF resblock lists and the AudioDec-v1
    grouped fast decoder). ``stats`` — a ``(2, C)`` [mean; scale] array —
    becomes the ``mean``/``scale`` input-norm buffers
    (models/vocoder/HiFiGAN.py:206-219); pass the array the generator was
    built with (``gen`` itself carries it as ``mean``/``scale`` when
    ``norm`` is set).
    """
    sd: dict = {}

    def emit_resblock(base: str, blk, p: dict) -> None:
        for k, (c, cp) in enumerate(zip(blk.convs1, p["convs1"])):
            _emit_pad(sd, f"{base}.convs1.{k}", c)
            _emit_conv(sd, f"{base}.convs1.{k}.conv", cp)
        for k, (c, cp) in enumerate(zip(blk.convs2, p.get("convs2", []))):
            _emit_pad(sd, f"{base}.convs2.{k}", c)
            _emit_conv(sd, f"{base}.convs2.{k}.conv", cp)

    if getattr(gen, "norm", False) and stats is None:
        stats = np.stack([_np(gen.mean), _np(gen.scale)])
    if stats is not None:
        sd["mean"] = _np(stats[0]).reshape(-1)
        sd["scale"] = _np(stats[1]).reshape(-1)

    _emit_pad(sd, "input_conv", gen.input_conv)
    _emit_conv(sd, "input_conv.conv", params["input_conv"])
    for i, (u, up) in enumerate(zip(gen.upsamples, params["upsamples"])):
        _emit_pad(sd, f"upsamples.{i}", u, transposed=True)
        _emit_conv(sd, f"upsamples.{i}.deconv", up, transposed=True)
    for i, (blk, bp) in enumerate(zip(gen.blocks, params["blocks"])):
        base = f"blocks.{i}"
        if "conv_out" in bp:  # grouped fast decoder (multi_fusion.py:82-141)
            emit_resblock(base, blk.block, bp["block"])
            _emit_conv(sd, f"{base}.conv_out", bp["conv_out"])
        else:
            for j, (rb, rp) in enumerate(zip(blk.blocks, bp["blocks"])):
                emit_resblock(f"{base}.blocks.{j}", rb, rp)
    _emit_pad(sd, "output_conv", gen.output_conv)
    _emit_conv(sd, "output_conv.conv", params["output_conv"])
    return sd


# ---------------------------------------------------------- discriminators

def export_hifigan_discriminator(params: dict, disc) -> dict:
    """Our MSD+MPD combo params -> reference state_dict
    (models/vocoder/HiFiGAN.py:308-395).

    MSD layers emit plain ``weight``/``bias`` (the reference's norm
    application is a documented no-op on its Conv1d layers,
    discriminator.py:354-372); MPD convs live in Sequentials
    (``convs.j.0``) and are weight-normed Conv2d.
    """
    sd: dict = {}
    msd = params["msd"]["discriminators"]
    for i, dp in enumerate(msd):
        layers = dp["layers"]
        for j, lp in enumerate(layers):
            if "v" in lp:
                raise ValueError(
                    "MSD layers trained with explicit weight norm cannot be "
                    "exported: the reference's scale discriminator carries "
                    "plain weights (its norm application is a no-op, "
                    "discriminator.py:354-372)"
                )
            base = f"msd.discriminators.{i}.layers.{j}"
            # all but the final conv sit inside Sequential(conv, activation)
            if j < len(layers) - 1:
                base += ".0"
            _emit_conv(sd, base, lp)
    _emit_mpd(sd, params["mpd"])
    return sd


def _emit_mpd(sd: dict, mpd_params: dict) -> None:
    for i, dp in enumerate(mpd_params["discriminators"]):
        b = f"mpd.discriminators.{i}"
        for j, cp in enumerate(dp["convs"]):
            _emit_conv(sd, f"{b}.convs.{j}.0", cp, two_d=True)
        _emit_conv(sd, f"{b}.output_conv", dp["output_conv"], two_d=True)


def export_univnet_discriminator(params: dict, disc) -> dict:
    """Our MRSD+MPD combo params -> reference state_dict
    (models/vocoder/UnivNet.py:23-103).

    MRSD layers sit in Sequentials except the bare final Conv2d
    (discriminator.py:495-545); each resolution also registers its Hann
    ``window`` buffer, emitted from our module's identical window.
    """
    sd: dict = {}
    mrsd = params["mrsd"]["discriminators"]
    for i, (d, dp) in enumerate(zip(disc.mrsd.discriminators, mrsd)):
        b = f"mrsd.discriminators.{i}"
        sd[f"{b}.window"] = _np(d.window)
        layers = dp["layers"]
        for j, lp in enumerate(layers):
            base = f"{b}.layers.{j}" + (".0" if j < len(layers) - 1 else "")
            _emit_conv(sd, base, lp, two_d=True)
    _emit_mpd(sd, params["mpd"])
    return sd
