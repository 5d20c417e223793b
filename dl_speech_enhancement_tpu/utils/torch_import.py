"""Import reference (PyTorch) checkpoints into this framework's param trees.

The reference ships two pickle formats (both ``torch.save``):

1. **Framework format** (trainer/trainerGAN.py:95-121): a dict with
   ``model.generator`` / ``model.discriminator`` state_dicts plus optimizer /
   scheduler / steps / epochs entries.
2. **Course format** (train_denoise.py:350-355): a bare generator
   ``state_dict``.

This module converts those state_dicts — by *key name*, no torch modules
needed — into this framework's functional param trees so a reference user can
bring their trained models across:

- torch ``Conv1d`` weights ``(out, in, k)`` become channels-last ``(k, in,
  out)``; ``ConvTranspose1d`` weights ``(in, out, k)`` are tap-flipped to the
  equivalent dilated-conv layout ``(k, in, out)`` (see nn/conv.py);
  ``Conv2d`` ``(out, in, kh, kw)`` becomes ``(kh, kw, in, out)``.
- torch ``weight_norm`` parametrizations (``weight_g``/``weight_v``,
  models/vocoder/HiFiGAN.py:193-203) map onto our ``{g, v}`` params.
- the EMA residual-VQ buffers (``embed`` / ``cluster_size`` / ``embed_avg``
  per layer, layers/vq_module.py:40-43) stack into a :class:`~..nn.vq.VQState`.
- HiFiGAN analyzer-statistics buffers (``mean``/``scale``,
  models/vocoder/HiFiGAN.py:206-219) are returned as a ``(2, C)`` stats array
  for ``HiFiGANGenerator(stats=...)``.

Every import is validated against the target model's own ``init`` tree:
structure and per-leaf shapes must match exactly, so a topology mismatch
fails loudly with the offending path instead of silently mis-loading.

Numerical parity of the mappings is pinned by tests/test_torch_import.py
(state_dict round-trips vs live torch forwards) on top of the transplant
parity suite (tests/test_upstream_parity.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..nn.vq import VQState

__all__ = [
    "load_torch_pickle",
    "import_audiodec_generator",
    "import_hifigan_generator",
    "import_hifigan_discriminator",
    "import_univnet_discriminator",
]


# ---------------------------------------------------------------- low level

def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv1d_w(w) -> jnp.ndarray:
    """torch Conv1d (out, in, k) -> ours (k, in, out)."""
    return jnp.asarray(_np(w).transpose(2, 1, 0))


def _deconv1d_w(w) -> jnp.ndarray:
    """torch ConvTranspose1d (in, out, k) -> flipped (k, in, out)."""
    return jnp.asarray(_np(w)[:, :, ::-1].transpose(2, 0, 1).copy())


def _conv2d_w(w) -> jnp.ndarray:
    """torch Conv2d (out, in, kh, kw) -> ours (kh, kw, in, out)."""
    return jnp.asarray(_np(w).transpose(2, 3, 1, 0))


def _conv(sd: dict, prefix: str, *, transposed: bool = False,
          two_d: bool = False) -> dict:
    """Params of the torch conv at ``prefix`` (the raw nn.ConvNd, i.e. the
    ``.conv``/``.deconv`` inner module or a bare Conv1d1x1), weight-normed
    (``weight_g``/``weight_v``) or plain, with optional bias."""
    wf = _conv2d_w if two_d else (_deconv1d_w if transposed else _conv1d_w)
    out = {}
    if f"{prefix}.weight_v" in sd:
        out["v"] = wf(sd[f"{prefix}.weight_v"])
        out["g"] = wf(sd[f"{prefix}.weight_g"])
    elif f"{prefix}.weight" in sd:
        out["w"] = wf(sd[f"{prefix}.weight"])
    else:
        raise KeyError(
            f"no conv weight at '{prefix}.weight[_v]' in the state_dict"
        )
    if f"{prefix}.bias" in sd:
        out["b"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return out


def _seq_conv_prefix(sd: dict, base: str) -> str:
    """Resolve a conv that may sit inside an nn.Sequential (``base.0``), a
    Causal wrapper (``base.conv``) or directly at ``base``."""
    for cand in (f"{base}.0", f"{base}.conv", base):
        if f"{cand}.weight" in sd or f"{cand}.weight_v" in sd:
            return cand
    raise KeyError(f"no conv found under '{base}' in the state_dict")


def _count(sd: dict, fmt: str) -> int:
    """Number of consecutive indices i for which fmt.format(i) prefixes a key."""
    n = 0
    while any(k.startswith(fmt.format(n) + ".") for k in sd):
        n += 1
    return n


def _check_like(got, template, what: str) -> None:
    """Assert identical tree structure and per-leaf shapes vs the model's own
    init tree, so topology mismatches fail loudly with a path."""
    gs = jax.tree_util.tree_structure(got)
    ts = jax.tree_util.tree_structure(template)
    if gs != ts:
        raise ValueError(
            f"{what}: imported tree structure does not match the model's "
            f"init tree.\n  imported: {gs}\n  expected: {ts}"
        )
    for (path, g), (_, t) in zip(
        jax.tree_util.tree_flatten_with_path(got)[0],
        jax.tree_util.tree_flatten_with_path(template)[0],
    ):
        if tuple(np.shape(g)) != tuple(np.shape(t)):
            name = jax.tree_util.keystr(path)
            raise ValueError(
                f"{what}: shape mismatch at {name}: imported "
                f"{tuple(np.shape(g))}, model expects {tuple(np.shape(t))}"
            )


def load_torch_pickle(path: str) -> dict:
    """torch.load a reference checkpoint pickle (CPU)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


# ------------------------------------------------------------- generators

def _res_unit(sd: dict, base: str) -> dict:
    # CausalResidualUnit: conv1 = CausalConv1d (inner .conv),
    # conv2 = Conv1d1x1 (a bare nn.Conv1d subclass) — residual_unit.py:20-81
    return {
        "conv1": _conv(sd, f"{base}.conv1.conv"),
        "conv2": _conv(sd, f"{base}.conv2"),
    }


def import_audiodec_generator(sd: dict, gen):
    """Reference AudioDec generator state_dict -> ``(params, vq_state)``.

    ``gen`` is the target :class:`~..models.autoencoder.AudioDecGenerator`;
    its ``use_pqc`` decides whether projector / quantizer / decoder input
    conv are imported (the reference's without-PQC Generator still
    *constructs* them, so its state_dict carries unused entries —
    models/autoencoder_without_PQC/AudioDec.py:77-87 vs modules/decoder.py:
    117-119).  Returns ``vq_state=None`` for without-PQC.
    """
    enc = {"conv": _conv(sd, "encoder.conv.conv"), "blocks": []}
    for i in range(_count(sd, "encoder.conv_blocks.{}")):
        b = f"encoder.conv_blocks.{i}"
        enc["blocks"].append({
            "res": [
                _res_unit(sd, f"{b}.res_units.{j}")
                for j in range(_count(sd, b + ".res_units.{}"))
            ],
            "conv": _conv(sd, f"{b}.conv.conv"),
        })

    dec = {"blocks": [], "conv2": _conv(sd, "decoder.conv2.conv")}
    if gen.use_pqc:
        dec["conv1"] = _conv(sd, "decoder.conv1.conv")
    for i in range(_count(sd, "decoder.conv_blocks.{}")):
        b = f"decoder.conv_blocks.{i}"
        dec["blocks"].append({
            "conv": _conv(sd, f"{b}.conv.deconv", transposed=True),
            "res": [
                _res_unit(sd, f"{b}.res_units.{j}")
                for j in range(_count(sd, b + ".res_units.{}"))
            ],
        })

    params = {"encoder": enc, "decoder": dec}
    vq_state = None
    if gen.use_pqc:
        params["projector"] = {"conv": _conv(sd, "projector.project.conv")}
        layers = _count(sd, "quantizer.codebook.layers.{}")
        embed = np.stack([
            _np(sd[f"quantizer.codebook.layers.{i}.embed"])
            for i in range(layers)
        ])
        cluster = np.stack([
            _np(sd[f"quantizer.codebook.layers.{i}.cluster_size"])
            for i in range(layers)
        ])
        avg = np.stack([
            _np(sd[f"quantizer.codebook.layers.{i}.embed_avg"])
            for i in range(layers)
        ])
        vq_state = VQState(jnp.asarray(embed), jnp.asarray(cluster),
                           jnp.asarray(avg))

    t_params, t_vq = gen.init(jax.random.PRNGKey(0))
    _check_like(params, t_params, "AudioDec generator")
    if gen.use_pqc:
        _check_like(tuple(vq_state), tuple(t_vq), "residual VQ state")
    return params, vq_state


def import_hifigan_generator(sd: dict, gen):
    """Reference HiFiGAN vocoder state_dict -> ``(params, stats)``.

    Handles both multi-fusion forms: MultiReceptiveField (``blocks.i.blocks.j``
    resblocks) and the AudioDec-v1 grouped fast decoder (``MultiGroupConv1d``:
    grouped resblock + 1x1 fuse, multi_fusion.py:82-141).  ``stats`` is the
    ``(2, C)`` [mean; scale] array when the checkpoint carries input-norm
    buffers (HiFiGAN.py:206-219), else None — pass it to
    ``HiFiGANGenerator(stats=...)``.
    """

    def resblock(base: str) -> dict:
        out = {
            "convs1": [
                _conv(sd, f"{base}.convs1.{k}.conv")
                for k in range(_count(sd, base + ".convs1.{}"))
            ],
        }
        # use_additional_convs=False checkpoints carry no convs2 at all;
        # our init tree omits the key then (models/hifigan.py) — an empty
        # list here would fail the like-tree structure check on import
        n2 = _count(sd, base + ".convs2.{}")
        if n2:
            out["convs2"] = [
                _conv(sd, f"{base}.convs2.{k}.conv") for k in range(n2)
            ]
        return out

    blocks = []
    for i in range(_count(sd, "blocks.{}")):
        b = f"blocks.{i}"
        if any(k.startswith(f"{b}.conv_out.") for k in sd):
            # grouped fast decoder: one grouped resblock + 1x1 fuse
            blocks.append({
                "block": resblock(b),
                "conv_out": _conv(sd, f"{b}.conv_out"),
            })
        else:
            blocks.append({
                "blocks": [
                    resblock(f"{b}.blocks.{j}")
                    for j in range(_count(sd, b + ".blocks.{}"))
                ],
            })

    params = {
        "input_conv": _conv(sd, "input_conv.conv"),
        "upsamples": [
            _conv(sd, f"upsamples.{i}.deconv", transposed=True)
            for i in range(_count(sd, "upsamples.{}"))
        ],
        "blocks": blocks,
        "output_conv": _conv(sd, "output_conv.conv"),
    }
    stats = None
    if "mean" in sd and "scale" in sd:
        stats = np.stack([_np(sd["mean"]).reshape(-1),
                          _np(sd["scale"]).reshape(-1)])
    _check_like(params, gen.init(jax.random.PRNGKey(0)), "HiFiGAN generator")
    return params, stats


# ---------------------------------------------------------- discriminators

def _mpd_params(sd: dict, root: str) -> dict:
    ds = []
    for i in range(_count(sd, root + ".discriminators.{}")):
        b = f"{root}.discriminators.{i}"
        ds.append({
            "convs": [
                _conv(sd, _seq_conv_prefix(sd, f"{b}.convs.{j}"), two_d=True)
                for j in range(_count(sd, b + ".convs.{}"))
            ],
            "output_conv": _conv(sd, f"{b}.output_conv", two_d=True),
        })
    return {"discriminators": ds}


def _msd_params(sd: dict, root: str) -> dict:
    ds = []
    for i in range(_count(sd, root + ".discriminators.{}")):
        b = f"{root}.discriminators.{i}"
        ds.append({
            "layers": [
                _conv(sd, _seq_conv_prefix(sd, f"{b}.layers.{j}"))
                for j in range(_count(sd, b + ".layers.{}"))
            ],
        })
    return {"discriminators": ds}


def import_hifigan_discriminator(sd: dict, disc) -> dict:
    """Reference HiFiGAN MSD+MPD combo state_dict -> our params
    (models/vocoder/HiFiGAN.py:308-395)."""
    params = {
        "msd": _msd_params(sd, "msd"),
        "mpd": _mpd_params(sd, "mpd"),
    }
    _check_like(params, disc.init(jax.random.PRNGKey(0)),
                "HiFiGAN discriminator")
    return params


def import_univnet_discriminator(sd: dict, disc) -> dict:
    """Reference UnivNet MRSD+MPD combo state_dict -> our params
    (models/vocoder/UnivNet.py:23-103)."""
    ds = []
    for i in range(_count(sd, "mrsd.discriminators.{}")):
        b = f"mrsd.discriminators.{i}"
        ds.append({
            "layers": [
                _conv(sd, _seq_conv_prefix(sd, f"{b}.layers.{j}"), two_d=True)
                for j in range(_count(sd, b + ".layers.{}"))
            ],
        })
    params = {
        "mrsd": {"discriminators": ds},
        "mpd": _mpd_params(sd, "mpd"),
    }
    _check_like(params, disc.init(jax.random.PRNGKey(0)),
                "UnivNet discriminator")
    return params
