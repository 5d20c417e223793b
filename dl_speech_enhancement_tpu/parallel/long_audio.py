"""Parallel long-audio inference: overlap-discard chunking over the mesh.

The reference handles unbounded audio only serially (chunked streaming with
O(1) state, SURVEY §5.7). On a multi-chip mesh we can do better for offline
jobs: causal convolutions have a finite receptive field R, so output sample
``t`` depends only on inputs ``[t-R+1, t]``. Splitting a long signal into N
chunks that each carry R samples of left context, batching the chunks, and
sharding the batch over the ``data`` axis computes every chunk's core region
*exactly* as the full-signal forward — embarrassingly parallel, no halo
exchange needed at conv granularity (one gather at the boundaries instead).

Used by batch evaluation over hour-long recordings; also a speedup on a
single chip (better utilization than one long sequence).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def parallel_forward(forward, audio: np.ndarray, hop: int,
                     context: int, n_chunks: int, mesh=None):
    """Run ``forward((N, T, C)) -> (N, T, C)`` over ``audio (T, C)`` split
    into ``n_chunks`` equal chunks with ``context`` samples of left overlap.

    ``context`` must cover the model's receptive field and be a multiple of
    ``hop``; chunk boundaries are aligned to ``hop``. Returns (T', C) with
    T' = usable length (multiple of n_chunks * hop)."""
    t_total = audio.shape[0]
    context = ((context + hop - 1) // hop) * hop
    core = (t_total - context) // (n_chunks * hop) * hop
    assert core > 0, "audio too short for this many chunks"
    used = context + core * n_chunks

    chunks = np.stack([
        audio[i * core : i * core + context + core] for i in range(n_chunks)
    ])  # (N, context+core, C)

    x = jnp.asarray(chunks)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        x = jax.device_put(x, NamedSharding(mesh, P("data")))
    y = np.asarray(forward(x))  # (N, context+core, C)

    head = y[0, :context]          # chunk 0 keeps its warmup region
    body = y[:, context:]          # every chunk's exact core region
    return np.concatenate([head, body.reshape(-1, y.shape[-1])], axis=0)


def parallel_denoise(gen, params, vq_state, audio: np.ndarray,
                     n_chunks: int | None = None, context: int | None = None,
                     mesh=None):
    """Chunk-parallel offline inference of an AudioDecGenerator."""
    if n_chunks is None:
        n_chunks = len(jax.devices()) if mesh is None else mesh.size
    if context is None:
        context = gen.receptive_length

    @jax.jit
    def forward(x):
        y, *_ = gen(params, vq_state, x, train=False)
        return y

    return parallel_forward(forward, audio, gen.hop, context, n_chunks, mesh)
