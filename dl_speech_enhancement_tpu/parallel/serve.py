"""Multi-chip streaming serving: shard concurrent streams over a mesh.

The single-chip runtime already batches concurrent streams through one
dispatch (stream/runtime.py — the streams/chip headline). This module is
the scale-out layer the reference has no analogue of (it runs tx/rx on at
most two torch devices, bin/stream.py:26-35): N independent streams are
sharded over the ``data`` axis of a ``jax.sharding.Mesh``, parameters are
replicated, and the whole fleet advances with ONE jitted dispatch per
frame — no collectives are needed (streams are independent), so per-stream
work stays local to its chip and scaling over ICI is linear by
construction. XLA's SPMD partitioner confirms that: the lowered program
contains no cross-device communication.

Layouts (a ``B``-stream fleet on ``D`` devices, ``B % D == 0``):

- frames ``(N, B, F, C)``: sharded ``P(None, 'data')`` — each chip owns
  ``B/D`` streams for all N queued frames;
- cache pytree (leading batch dim): sharded ``P('data')``;
- params / VQ state: replicated ``P()``.

Beyond the symmetric codec, the fleet serves the reference's *paired*
presets (utils/audiodec.py:96-164 semantics) in the same one-dispatch
shape:

- **vocoder rx** (v0-v3 + denoise presets): codec analyzer tx (for the
  denoise preset, the fine-tuned encoder) -> lookup in the TX codebook ->
  HiFiGAN/UnivNet vocoder streaming decode, via ``vocoder=``/
  ``vocoder_params=`` — exactly the reference's load_receiver pairing
  (utils/audiodec.py:49-57,96-103: indices are always looked up with the
  tx checkpoint's codebook);
- **asymmetric codec rx** (an extension mode with no reference analogue):
  tx quantizes with its own quantizer, a DIFFERENT rx codec looks the
  indices up in its OWN codebook and decodes, via ``rx_gen=``/
  ``rx_params=``/``rx_vq_state=``. Useful for serving mismatched
  tx/rx codec checkpoints; no named preset maps to it.

In both paired modes the int32 code indices are the tx->rx hand-off
exactly as in the reference wire format — they just never leave the chip.

Use :func:`make_sharded_stream` exactly like ``make_scan_stream`` — the
returned ``run(cache, frames)`` has the same signature and bit-identical
per-stream results (pinned by tests/test_parallel.py).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dl_speech_enhancement_tpu.parallel.mesh import make_mesh

__all__ = ["make_sharded_stream"]


def make_sharded_stream(gen, params, vq_state=None, *, mesh: Mesh | None = None,
                        batch: int | None = None,
                        vocoder=None, vocoder_params=None,
                        rx_gen=None, rx_params=None, rx_vq_state=None):
    """Build a mesh-sharded multi-stream chunk runner.

    ``batch`` is the TOTAL stream count across the mesh (default: one
    stream per device). Returns ``run(cache, frames) -> (audio, cache)``
    (jitted, shardings pinned on inputs and outputs) with helpers
    ``run.init_cache()`` (mesh-sharded cache) and ``run.shard_frames(x)``
    (device_put a host ``(N, B, F, C)`` array with the stream sharding).

    Receiver selection (mutually exclusive):

    - default: the codec decodes its own codes (symmetric presets);
    - ``vocoder``/``vocoder_params``: a HiFiGAN/UnivNet generator decodes
      the tx codebook embeddings (v0-v3 presets);
    - ``rx_gen``/``rx_params``/``rx_vq_state``: a second codec receives
      the tx indices and decodes with its own codebook (denoise preset).
    """
    if vocoder is not None and rx_gen is not None:
        raise ValueError("give either a vocoder rx or a codec rx, not both")
    if (vocoder is None) != (vocoder_params is None):
        raise ValueError("vocoder and vocoder_params must be given together")
    if rx_gen is not None and rx_params is None:
        raise ValueError("rx_gen requires rx_params")
    if rx_gen is None and (rx_params is not None or rx_vq_state is not None):
        # a caller typo would otherwise degrade silently to a symmetric fleet
        raise ValueError("rx_params/rx_vq_state require rx_gen")
    if rx_gen is not None and gen.use_pqc and rx_vq_state is None:
        raise ValueError(
            "a PQC tx sends code indices: the codec rx needs rx_vq_state "
            "to look them up")
    mesh = mesh if mesh is not None else make_mesh()
    n_dev = int(mesh.devices.size)
    batch = n_dev if batch is None else int(batch)
    if batch % n_dev != 0:
        raise ValueError(
            f"total stream count {batch} must divide over {n_dev} devices")

    rep = NamedSharding(mesh, P())
    cache_sh = NamedSharding(mesh, P("data"))
    frames_sh = NamedSharding(mesh, P(None, "data"))

    params = jax.device_put(params, rep)
    if vq_state is not None:
        vq_state = jax.device_put(vq_state, rep)
        flat_cb = jax.device_put(gen.flat_codebook(vq_state), rep)
    else:
        flat_cb = None
    paired = vocoder is not None or rx_gen is not None
    if vocoder is not None:
        vocoder_params = jax.device_put(vocoder_params, rep)
    if rx_gen is not None:
        rx_params = jax.device_put(rx_params, rep)
        rx_flat_cb = (jax.device_put(rx_gen.flat_codebook(
            jax.device_put(rx_vq_state, rep)), rep)
            if gen.use_pqc else None)

    def step(cache, frame):
        z, enc_cache = gen.encode_step(params, cache, frame)
        if gen.use_pqc:
            idx = gen.quantize(vq_state, z)
            zq = gen.lookup(flat_cb, idx)
        else:
            zq = z
        y, dec_cache = gen.decode_step(params, cache, zq)
        new_cache = dict(cache)
        new_cache.update(enc_cache)
        new_cache.update(dec_cache)
        return new_cache, y

    def step_paired(cache, frame):
        tx_cache, rx_cache = cache["tx"], cache["rx"]
        z, enc_cache = gen.encode_step(params, tx_cache, frame)
        # the tx->rx hand-off is the reference wire format: int32 indices
        # for PQC presets, raw features without (utils/audiodec.py:96-103)
        wire = gen.quantize(vq_state, z) if gen.use_pqc else z
        if vocoder is not None:
            zq = gen.lookup(flat_cb, wire) if gen.use_pqc else wire
            y, new_rx = vocoder.step(vocoder_params, rx_cache, zq)
        else:
            zq = (rx_gen.lookup(rx_flat_cb, wire)
                  if gen.use_pqc else wire)
            y, dec_cache = rx_gen.decode_step(rx_params, rx_cache, zq)
            new_rx = dict(rx_cache)
            new_rx.update(dec_cache)
        new_tx = dict(tx_cache)
        new_tx.update(enc_cache)
        return {"tx": new_tx, "rx": new_rx}, y

    @jax.jit
    def run(cache, frames):
        cache, ys = jax.lax.scan(step_paired if paired else step,
                                 cache, frames)
        ys = jax.lax.with_sharding_constraint(ys, frames_sh)
        cache = jax.lax.with_sharding_constraint(cache, cache_sh)
        return ys, cache

    def init_cache():
        if not paired:
            return jax.device_put(gen.init_cache(batch), cache_sh)
        tx = {k: v for k, v in gen.init_cache(batch).items()
              if k in ("encoder", "projector")}
        if vocoder is not None:
            rx = vocoder.init_cache(batch)
        else:
            rx = {"decoder": rx_gen.init_cache(batch)["decoder"]}
        return jax.device_put({"tx": tx, "rx": rx}, cache_sh)

    def shard_frames(x):
        return jax.device_put(x, frames_sh)

    run.init_cache = init_cache
    run.shard_frames = shard_frames
    run.mesh = mesh
    run.batch = batch
    return run
