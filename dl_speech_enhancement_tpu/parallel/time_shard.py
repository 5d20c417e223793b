"""Sequence-parallel (time-sharded) training over a ``time`` mesh axis.

The reference trains on fixed random crops only (batch_length 9600-96000
samples, /root/reference/dataloader/collater.py:33-60) because a single
device cannot hold activations for minutes-long clips; long audio exists
solely as serial chunked *inference* with O(1) cache state
(/root/reference/layers/conv_layer.py:144-151, SURVEY §5.7). On a TPU mesh
we instead shard the TIME axis of a long training example across devices
and train on the whole clip at once — the halo-exchange pattern, riding
ICI:

- every model in this family is **causal** with finite receptive fields,
  so device ``p`` computes its shard exactly from its own samples plus a
  **left halo** fetched from device ``p-1`` with ``lax.ppermute``. Two
  halos are exchanged per step: a waveform halo covering the tx
  (encoder [+ projector]) receptive field (``gen.receptive_length``), and
  a code-frame halo of the already-computed features/codes covering the
  decoder's receptive field — so the quantizer sees every code frame
  exactly once (no double-counted EMA statistics at shard boundaries).
- halo and shard lengths are multiples of the code hop, so every shard
  lands on the same stride phase as the full signal.
- shard 0's halos are the ``ppermute`` fill value (zeros): the stream
  start behaves like the model's own *streaming* path from zero-primed
  caches (nn/conv.py ``step``), whose intermediate activations over the
  zero context are ``f(0) != 0`` (biases, replication pads) while the
  offline forward pads true zeros at every layer — the same startup
  transient the reference's streaming runtime has vs its offline forward
  (it primes with zeros too, /root/reference/bin/stream.py:61). The
  transient is confined to the first tx-receptive-field of code frames
  plus their decoder receptive spread; beyond that warm-up prefix the
  sharded forward equals the full-signal offline forward exactly
  (pinned in tests/test_time_shard.py).
- gradients are exact for the objective below: every output sample's loss
  term is computed on exactly one device, halo cotangents flow back to
  the producing device through the ``ppermute`` transpose (for the code
  halo: through the neighbour's quantizer straight-through estimator into
  its encoder), and parameter gradients ``pmean``-reduce over the axis
  (each device's local gradient already carries the full global cotangent
  through the in-loss collective transposes — the mean, not the sum, is
  the exact gradient; pinned with a scale-sensitive SGD optimizer in the
  tests). Recomputing the tx receptive field once per boundary is the only
  overhead — the same trade rematerialization makes, ~0.15 s of audio per
  boundary for the 48 kHz flagship.

The training objective is the *blocked* form of the course/denoise metric
loss (reference train_denoise.py:138-154): the mel term is the mean over
per-shard mel L1 (each shard frames its own segment — a valid objective,
NOT claimed identical to whole-clip framing), the SNR gate uses psum'd
global energy sums, and for PQC generators the VQ commitment loss / EMA
codebook statistics reduce over the mesh through the quantizer's existing
``axis_name`` hooks (nn/vq.py). Step-for-step equivalence (loss, updated
params, advanced EMA state) against a single-device implementation of the
same objective is pinned on the 8-device CPU mesh.

Use :func:`time_sharded_forward` for sharded inference and
:func:`make_time_sharded_steps` for training/eval. A 2-D ``(data, time)``
mesh shards batch and sequence simultaneously.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from dl_speech_enhancement_tpu.losses import MultiMelSpectrogramLoss

_EPS = 1e-8


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def decoder_receptive_frames(dec) -> int:
    """Decoder receptive field in CODE frames (conservative by design —
    one extra frame per upsampling block): walked backwards through
    output conv, residual units and the 2-tap causal transposed convs
    (``y[s*r+p]`` depends on input frames ``r-1`` and ``r``,
    nn/conv.py::CausalConvTranspose1d)."""
    r = 1
    r += (dec.conv2.kernel_size - 1) * dec.conv2.dilation
    for blk in reversed(dec.blocks):
        for u in reversed(blk.res_units):
            r += (u.conv1.kernel_size - 1) * u.conv1.dilation
        r = _ceil_div(r, blk.conv.stride) + 1
    if dec.use_input_conv:
        r += (dec.conv1.kernel_size - 1) * dec.conv1.dilation
    return r


def _halos(gen, overlap=None):
    """(waveform halo samples, encoder halo frames, decoder halo frames)."""
    r_tx = gen.receptive_length if overlap is None else overlap
    he_frames = _ceil_div(r_tx, gen.hop)
    hd_frames = decoder_receptive_frames(gen.decoder)
    return he_frames * gen.hop, he_frames, hd_frames


def _left_halo(x, halo: int, axis_name: str, n_shards: int):
    """Last ``halo`` steps of the left neighbour's shard (axis 1).
    Shard 0 receives zeros — the stream-start state."""
    tail = x[:, x.shape[1] - halo:]
    if n_shards == 1:
        return jnp.zeros_like(tail)
    perm = [(i, i + 1) for i in range(n_shards - 1)]
    return lax.ppermute(tail, axis_name, perm)


def _shard_forward(gen, params, vq_state, x, *, he, he_frames, hd_frames,
                   axis, n_shards, train, vq_axes):
    """One device's exact forward: waveform halo -> encoder/projector,
    quantize CORE frames only, code halo -> decoder. Returns
    (y, vqloss, ppl, new_vq_state) for the local shard."""
    if x.shape[-1] != gen.input_channels:
        x = x.reshape(x.shape[0], -1, gen.input_channels)
    left = _left_halo(x, he, axis, n_shards)
    e = gen.encoder(params["encoder"], jnp.concatenate([left, x], axis=1))
    if gen.use_pqc:
        z = gen.projector(params["projector"], e)[:, he_frames:]
        zq, new_vq, vqloss, ppl = gen.quantizer(
            vq_state, z, train=train, axis_name=vq_axes if train else None)
    else:
        zq = e[:, he_frames:]
        new_vq = vq_state
        vqloss = jnp.zeros((gen.codebook_num,), x.dtype)
        ppl = jnp.zeros((gen.codebook_num,), x.dtype)
    zleft = _left_halo(zq, hd_frames, axis, n_shards)
    y = gen.decoder(params["decoder"], jnp.concatenate([zleft, zq], axis=1))
    return y[:, hd_frames * gen.hop:], vqloss, ppl, new_vq


def _check_shapes(x, n_shards, hop, he, hd_frames):
    if x.shape[1] % (n_shards * hop):
        raise ValueError(
            f"T={x.shape[1]} must be a multiple of {n_shards} shards x "
            f"hop {hop}")
    t_shard = x.shape[1] // n_shards
    if t_shard < max(he, hd_frames * hop):
        raise ValueError(
            f"shards of {t_shard} samples are shorter than the halo "
            f"(enc {he} / dec {hd_frames * hop} samples) — use fewer time "
            f"shards")


def time_sharded_forward(gen, mesh, axis: str = "time", overlap=None,
                         batch_axis: str | None = None):
    """Sharded inference ``f(params, vq_state, x)`` with ``x`` (B, T, C)
    sharded over ``axis`` along T (and optionally ``batch_axis`` along B).
    T must be a multiple of ``mesh.shape[axis] * gen.hop``. Equals the
    full-signal offline forward beyond the first ``receptive_length``
    samples (the stream-start transient — see module docstring)."""
    he, he_frames, hd_frames = _halos(gen, overlap)
    n_shards = mesh.shape[axis]
    xspec = P(batch_axis, axis, None)

    def local(params, vq_state, x):
        y, *_ = _shard_forward(
            gen, params, vq_state, x, he=he, he_frames=he_frames,
            hd_frames=hd_frames, axis=axis, n_shards=n_shards,
            train=False, vq_axes=None)
        return y

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), xspec), out_specs=xspec)


    @jax.jit
    def forward(params, vq_state, x):
        _check_shapes(x, n_shards, gen.hop, he, hd_frames)
        return fn(params, vq_state, x)

    return forward


def make_time_sharded_steps(gen, config: dict, optimizer, mesh,
                            axis: str = "time", overlap=None,
                            batch_axis: str | None = None):
    """Jitted train/eval steps for the blocked metric objective on a
    time-sharded clip.

    ``state`` is ``{"params_generator", "opt_generator"[, "vq_state"]}``
    (replicated); ``x``/``target`` are (B, T, C) global arrays sharded
    over ``axis`` (and ``batch_axis`` when given). ``train(state, x,
    target) -> (state, loss, frags)``; ``eval(state, x, target) -> loss``.

    Loss = lambda_mel_loss * blocked MultiMel
         + lambda_snr_loss * (1 - sigmoid(global SNR))
         [+ lambda_vq_loss * VQ commitment, PQC generators only].
    """
    mel_loss = MultiMelSpectrogramLoss(**config["mel_loss_params"])
    l_mel = config.get("lambda_mel_loss", 45.0)
    l_snr = config.get("lambda_snr_loss", 0.0)
    l_vq = config.get("lambda_vq_loss", 1.0)
    he, he_frames, hd_frames = _halos(gen, overlap)
    n_shards = mesh.shape[axis]
    all_axes = (axis,) if batch_axis is None else (axis, batch_axis)
    xspec = P(batch_axis, axis, None)

    def _local_loss(params, vq_state, x, target, train):
        y, vqloss, ppl, new_vq = _shard_forward(
            gen, params, vq_state, x, he=he, he_frames=he_frames,
            hd_frames=hd_frames, axis=axis, n_shards=n_shards,
            train=train, vq_axes=all_axes)
        mel = l_mel * lax.pmean(mel_loss(y, target), all_axes)
        total = mel
        frags = {"mel_loss": mel}
        if l_snr:
            s_t = lax.psum(jnp.sum(jnp.square(target)), all_axes)
            s_n = lax.psum(jnp.sum(jnp.square(target - y)), all_axes)
            snr = 10.0 * (jnp.log10(s_t + _EPS) - jnp.log10(s_n + _EPS))
            snr_term = l_snr * (1.0 - jax.nn.sigmoid(snr))
            total = total + snr_term
            frags["snr_loss"] = snr_term
        if gen.use_pqc:
            vq = l_vq * jnp.sum(lax.pmean(vqloss, all_axes))
            total = total + vq
            frags["vq_loss"] = vq
            frags["perplexity"] = jnp.sum(lax.pmean(ppl, all_axes))
        return total, (frags, new_vq)

    def _train_local(params, vq_state, x, target):
        (loss, (frags, new_vq)), grads = jax.value_and_grad(
            _local_loss, has_aux=True)(params, vq_state, x, target, True)
        # pmean, NOT psum: differentiating inside shard_map seeds every
        # device's (replicated) loss output with cotangent 1, and the
        # psum/pmean transposes inside _local_loss already route the full
        # global cotangent to each device — summing the per-device grads
        # would scale them by the mesh size (invisible under Adam +
        # global-norm clip, which are scale-invariant; pinned by the SGD
        # equivalence test against blocked_reference_step).
        return loss, frags, lax.pmean(grads, all_axes), new_vq

    # check_vma=False: the FFT transpose rule inside the mel loss trips the
    # static varying-axes checker under grad (cotangent typed as varying
    # over the mesh axis); the outputs below are explicitly psum/pmean'd,
    # so replication holds by construction.
    train_sharded = shard_map(
        _train_local, mesh=mesh,
        in_specs=(P(), P(), xspec, xspec),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    eval_sharded = shard_map(
        lambda p, v, x, t: _local_loss(p, v, x, t, False)[0],
        mesh=mesh, in_specs=(P(), P(), xspec, xspec), out_specs=P(),
        check_vma=False,
    )

    def train(state, x, target):
        _check_shapes(x, n_shards, gen.hop, he, hd_frames)
        loss, frags, grads, new_vq = train_sharded(
            state["params_generator"], state.get("vq_state"), x, target)
        updates, new_opt = optimizer.update(
            grads, state["opt_generator"], state["params_generator"])
        new_state = dict(state)
        new_state["params_generator"] = optax.apply_updates(
            state["params_generator"], updates)
        new_state["opt_generator"] = new_opt
        if gen.use_pqc:
            new_state["vq_state"] = new_vq
        return new_state, loss, frags

    def evaluate(state, x, target):
        _check_shapes(x, n_shards, gen.hop, he, hd_frames)
        return eval_sharded(
            state["params_generator"], state.get("vq_state"), x, target)

    return {
        "train": jax.jit(train, donate_argnums=(0,)),
        "eval": jax.jit(evaluate),
        "halo_samples": he,
        "decoder_halo_frames": hd_frames,
    }


def blocked_reference_step(gen, config: dict, optimizer, n_shards: int,
                           overlap=None):
    """Single-device implementation of the SAME computation the sharded
    step distributes — a serial walk over the shards with the identical
    halo windows (zeros for shard 0) — used by the equivalence tests and
    as readable documentation of the objective."""
    mel_loss = MultiMelSpectrogramLoss(**config["mel_loss_params"])
    l_mel = config.get("lambda_mel_loss", 45.0)
    l_snr = config.get("lambda_snr_loss", 0.0)
    l_vq = config.get("lambda_vq_loss", 1.0)

    def _forward(params, vq_state, x, train):
        he, he_frames, hd_frames = _halos(gen, overlap)
        ts = x.shape[1] // n_shards
        tf = ts // gen.hop
        # encoder/projector on every shard with its true left halo
        zs = []
        for p in range(n_shards):
            lo = p * ts
            xw = jnp.concatenate(
                [jnp.zeros((x.shape[0], he, x.shape[2]), x.dtype)
                 if p == 0 else x[:, lo - he: lo], x[:, lo: lo + ts]], axis=1)
            e = gen.encoder(params["encoder"], xw)
            if gen.use_pqc:
                zs.append(gen.projector(params["projector"], e)[:, he_frames:])
            else:
                zs.append(e[:, he_frames:])
        z = jnp.concatenate(zs, axis=1)
        if gen.use_pqc:
            zq, new_vq, vqloss, ppl = gen.quantizer(vq_state, z, train=train)
        else:
            zq, new_vq = z, vq_state
            vqloss = jnp.zeros((gen.codebook_num,), x.dtype)
            ppl = jnp.zeros((gen.codebook_num,), x.dtype)
        ys = []
        for p in range(n_shards):
            lo = p * tf
            zw = jnp.concatenate(
                [jnp.zeros((zq.shape[0], hd_frames, zq.shape[2]), zq.dtype)
                 if p == 0 else zq[:, lo - hd_frames: lo],
                 zq[:, lo: lo + tf]], axis=1)
            ys.append(gen.decoder(params["decoder"], zw)[:,
                      hd_frames * gen.hop:])
        return jnp.concatenate(ys, axis=1), vqloss, new_vq

    def _loss(params, vq_state, x, target):
        y, vqloss, new_vq = _forward(params, vq_state, x, True)
        ts = x.shape[1] // n_shards
        mel = sum(
            mel_loss(y[:, p * ts:(p + 1) * ts],
                     target[:, p * ts:(p + 1) * ts])
            for p in range(n_shards)) / n_shards
        total = l_mel * mel
        if l_snr:
            s_t = jnp.sum(jnp.square(target))
            s_n = jnp.sum(jnp.square(target - y))
            snr = 10.0 * (jnp.log10(s_t + _EPS) - jnp.log10(s_n + _EPS))
            total = total + l_snr * (1.0 - jax.nn.sigmoid(snr))
        if gen.use_pqc:
            total = total + l_vq * jnp.sum(vqloss)
        return total, new_vq

    @jax.jit
    def step(state, x, target):
        (loss, new_vq), grads = jax.value_and_grad(_loss, has_aux=True)(
            state["params_generator"], state.get("vq_state"), x, target)
        updates, new_opt = optimizer.update(
            grads, state["opt_generator"], state["params_generator"])
        new_state = dict(state)
        new_state["params_generator"] = optax.apply_updates(
            state["params_generator"], updates)
        new_state["opt_generator"] = new_opt
        if gen.use_pqc:
            new_state["vq_state"] = new_vq
        return new_state, loss, grads

    return step
