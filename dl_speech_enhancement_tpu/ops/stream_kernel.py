"""Fused Pallas kernels for the streaming conv chain (single-chunk path).

The jitted streaming chunk step is HBM-bandwidth-bound: XLA materializes
every layer's activations (and weight layout copies) in HBM — ~154 MB moved
per 25 ms frame against ~30 MB of weights (see bench.py / CLAUDE.md). This
kernel keeps a whole **causal residual chain** (the 3 residual units at
dilations 1/3/9 that dominate each encoder/decoder block) resident in VMEM:
one read of the (cache-prepended) input, one write of the output. The
strided/transposed boundary convs stay in XLA (Mosaic cannot lower strided
vector slices), which costs one extra HBM round-trip per block boundary.

Causal convs are evaluated as k accumulated MXU matmuls over shifted time
windows (tap-matmul form):

    y[t, :] = sum_j  act(x)[t + j*d, :] @ W[j]          (dilation d)

Channels are padded to the 128-lane width; time is the sublane axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _elu(x):
    # expm1 has no Mosaic lowering; exp(x)-1 is fine in f32 for x <= 0
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def fused_residual_chain(res_params: list, x: jax.Array, *,
                         dilations=(1, 3, 9), kernel_size: int = 7,
                         interpret: bool = False,
                         weight_dtype=jnp.float32) -> jax.Array:
    """N chained causal residual units (ELU -> dilated conv -> ELU -> 1x1 ->
    add) on a cache-prepended chunk, fully fused in VMEM.

    x: (T_in, C) with T_in = sum_i (k-1)*d_i + T. res_params: list of
    {"conv1": {w}, "conv2": {w}} (models/autoencoder.py::ResidualUnit).
    ``weight_dtype=jnp.bfloat16`` halves the dominant HBM traffic (chain
    weights) for inference; activations and accumulation stay f32.
    Returns (T, C)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = kernel_size
    c = x.shape[1]
    cp = _round_up(c, 128)
    pads = [(k - 1) * d for d in dilations]
    t_in = x.shape[0]
    t_out = t_in - sum(pads)
    assert t_out > 0

    def pad_w(w):
        w = jnp.pad(w, ((0, 0), (0, cp - w.shape[1]), (0, cp - w.shape[2])))
        return w.astype(weight_dtype)

    w1 = jnp.stack([pad_w(p["conv1"]["w"]) for p in res_params])  # (n,k,cp,cp)
    w2 = jnp.stack([pad_w(p["conv2"]["w"]) for p in res_params])  # (n,1,cp,cp)

    t_pad = _round_up(t_in, 8)
    xp = jnp.pad(x, ((0, t_pad - t_in), (0, cp - c)))
    t_out_pad = _round_up(t_out, 8)

    def kernel(x_ref, w1_ref, w2_ref, out_ref, buf):
        buf[:, :] = x_ref[...]
        t_cur = t_in
        for i, d in enumerate(dilations):
            pad = (k - 1) * d
            t_next = t_cur - pad
            a = _elu(buf[:t_cur, :]).astype(weight_dtype)
            acc = jnp.dot(a[0:t_next, :], w1_ref[i, 0],
                          preferred_element_type=jnp.float32)
            for j in range(1, k):
                acc += jnp.dot(a[j * d : j * d + t_next, :], w1_ref[i, j],
                               preferred_element_type=jnp.float32)
            y = jnp.dot(_elu(acc).astype(weight_dtype), w2_ref[i, 0],
                        preferred_element_type=jnp.float32)
            buf[:t_next, :] = buf[pad : pad + t_next, :] + y
            t_cur = t_next
        out_ref[:, :] = buf[:t_out_pad, :]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_out_pad, cp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((t_pad, cp), jnp.float32)],
        interpret=interpret,
    )(xp, w1, w2)
    return out[:t_out, :c]


def fused_residual_chain_folded(res_params: list, x: jax.Array, fold: int, *,
                                dilations=(1, 3, 9), kernel_size: int = 7,
                                interpret: bool = False) -> jax.Array:
    """Time-folded variant of :func:`fused_residual_chain` for narrow layers.

    Packs ``fold`` consecutive timesteps into one 128-lane row
    (row r = [x[fold*r], ..., x[fold*r+fold-1]], each ``C`` lanes wide), so a
    32-channel chain uses 96/128 lanes at fold=3 instead of 32/128. The
    dilated conv becomes a sum over **row** offsets of dense
    (fold*C, fold*C) block matrices assembled host-side from the taps:

        y[fold*r'+p] = sum_j x[fold*r'+p+j*d] @ W_j
                     = sum_o A[r'+o] @ M_o,   M_o[b-block, p-block] = W_j
          where (o, b) = divmod(p + j*d, fold)

    Constraints: ``fold`` must divide every unit's pad (6*d — fold in
    {1, 2, 3, 6}) and the input length. Returns (T, C) like the unfolded
    kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = kernel_size
    c = x.shape[1]
    assert fold * c <= 128
    pads = [(k - 1) * d for d in dilations]
    assert all(p % fold == 0 for p in pads), (fold, pads)
    t_in = x.shape[0]
    assert t_in % fold == 0
    t_out = t_in - sum(pads)
    cp = 128

    def assemble(unit, d):
        w1 = np.asarray(unit["conv1"]["w"])  # (k, c, c)
        pad_rows = (k - 1) * d // fold
        m1 = np.zeros((pad_rows + 1, cp, cp), np.float32)
        for j in range(k):
            s = j * d
            for p in range(fold):
                o, b = divmod(p + s, fold)
                m1[o, b * c : (b + 1) * c, p * c : (p + 1) * c] = w1[j]
        w2 = np.asarray(unit["conv2"]["w"])[0]  # (c, c)
        m2 = np.zeros((cp, cp), np.float32)
        for b in range(fold):
            m2[b * c : (b + 1) * c, b * c : (b + 1) * c] = w2
        return jnp.asarray(m1), jnp.asarray(m2)

    ms = [assemble(u, d) for u, d in zip(res_params, dilations)]
    rows_in = t_in // fold
    # fold: (T, C) -> (rows, fold*C) -> pad lanes to 128
    xf = x.reshape(rows_in, fold * c)
    xf = jnp.pad(xf, ((0, _round_up(rows_in, 8) - rows_in),
                      (0, cp - fold * c)))
    rows_out = t_out // fold
    rows_out_pad = _round_up(rows_out, 8)

    # stack per-unit M_o tensors (ragged offsets -> pad to max)
    max_off = max(m1.shape[0] for m1, _ in ms)
    w1 = jnp.stack([jnp.pad(m1, ((0, max_off - m1.shape[0]), (0, 0), (0, 0)))
                    for m1, _ in ms])
    w2 = jnp.stack([m2 for _, m2 in ms])
    offs = [m1.shape[0] - 1 for m1, _ in ms]  # pad_rows per unit (static)

    def kernel(x_ref, w1_ref, w2_ref, out_ref, buf):
        buf[:, :] = x_ref[...]
        r_cur = rows_in
        for i, d in enumerate(dilations):
            pad_rows = offs[i]
            r_next = r_cur - pad_rows
            a = _elu(buf[:r_cur, :])
            acc = jnp.dot(a[0:r_next, :], w1_ref[i, 0],
                          preferred_element_type=jnp.float32)
            for o in range(1, pad_rows + 1):
                acc += jnp.dot(a[o : o + r_next, :], w1_ref[i, o],
                               preferred_element_type=jnp.float32)
            y = jnp.dot(_elu(acc), w2_ref[i],
                        preferred_element_type=jnp.float32)
            buf[:r_next, :] = buf[pad_rows : pad_rows + r_next, :] + y
            r_cur = r_next
        out_ref[:, :] = buf[:rows_out_pad, :]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows_out_pad, cp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((xf.shape[0], cp), jnp.float32)],
        interpret=interpret,
    )(xf, w1, w2)
    return out[:rows_out, : fold * c].reshape(t_out, c)


def _chain(res_params, x, interpret):
    """Chain dispatch. Measured on v5e-lite: the time-folded variant is ~10%
    SLOWER end-to-end (49 vs 44 us/frame) — the chains are VPU/VMEM-bound,
    not MXU-bound, and folding multiplies the d=9 unit's matmul count — so
    the unfolded kernel is the default; the folded one stays available for
    experimentation."""
    return fused_residual_chain(res_params, x, interpret=interpret)


def make_fused_chunk_step(gen, params, interpret: bool = False):
    """Streaming chunk step (without-PQC denoiser) with every residual chain
    fused in Pallas; boundary convs (input/strided/transposed/output) run in
    XLA. Cache layout: {"chains": [arr...], "convs": {name: arr}} — one
    contiguous (pad, C) array per chain / boundary conv.

    Returns (init_cache(batch=1-row layout), step(cache, chunk (T,C)) ->
    (y (T,C), cache)). Chunk length must be a multiple of gen.hop.
    Semantics match gen.encode_step + decode_step exactly (tested)."""
    assert not gen.use_pqc, "fused step covers the without-PQC denoiser"
    k = 7
    dil = (1, 3, 9)
    chain_pad = sum((k - 1) * d for d in dil)

    enc_blocks = gen.encoder.blocks
    dec_blocks = gen.decoder.blocks
    # this builder hardcodes the AudioDec residual-unit topology (k=7,
    # dilations 1/3/9) and 6-row input/output conv caches; fail loudly for
    # anything else instead of returning correctly-shaped wrong audio
    for blk in list(enc_blocks) + list(dec_blocks):
        for u in blk.res_units:
            if u.conv1.kernel_size != k:
                raise ValueError(
                    f"fused chunk step supports residual kernel_size {k}, "
                    f"got {u.conv1.kernel_size}")
        if tuple(u.conv1.dilation for u in blk.res_units) != dil:
            raise ValueError(
                f"fused chunk step supports residual dilations {dil}, got "
                f"{tuple(u.conv1.dilation for u in blk.res_units)}")
    if gen.encoder.conv.kernel_size != 7 or gen.decoder.conv2.kernel_size != 7:
        raise ValueError(
            "fused chunk step supports kernel_size-7 input/output convs, "
            f"got {gen.encoder.conv.kernel_size}/"
            f"{gen.decoder.conv2.kernel_size}")
    enc_p = params["encoder"]
    dec_p = params["decoder"]

    def init_cache():
        cache = {"chains": [], "convs": {}}
        # encoder input conv
        cache["convs"]["enc_in"] = np.zeros((6, gen.input_channels), np.float32)
        ch = gen.encoder.conv.out_channels
        for bi, blk in enumerate(enc_blocks):
            cache["chains"].append(np.zeros((chain_pad, blk.conv.in_channels),
                                            np.float32))
            cache["convs"][f"enc_down{bi}"] = np.zeros(
                (blk.conv.pad_length, blk.conv.in_channels), np.float32)
        for bi, blk in enumerate(dec_blocks):
            cache["convs"][f"dec_up{bi}"] = np.zeros(
                (1, blk.conv.in_channels), np.float32)
            cache["chains"].append(np.zeros(
                (chain_pad, blk.res_units[0].conv1.in_channels), np.float32))
        cache["convs"]["dec_out"] = np.zeros(
            (6, gen.decoder.conv2.in_channels), np.float32)
        return jax.tree_util.tree_map(jnp.asarray, cache)

    def _conv_step(layer, p, cache, x):
        y, new_cache = layer.step(p, cache[None], x[None])
        return y[0], new_cache[0]

    def step(cache, x):
        new_chains = []
        new_convs = {}
        h, new_convs["enc_in"] = _conv_step(
            gen.encoder.conv, enc_p["conv"], cache["convs"]["enc_in"], x)
        ci = 0
        for bi, blk in enumerate(enc_blocks):
            xin = jnp.concatenate([cache["chains"][ci], h], axis=0)
            new_chains.append(xin[xin.shape[0] - chain_pad :])
            h = _chain(enc_p["blocks"][bi]["res"], xin, interpret)
            ci += 1
            h, new_convs[f"enc_down{bi}"] = _conv_step(
                blk.conv, enc_p["blocks"][bi]["conv"],
                cache["convs"][f"enc_down{bi}"], h)
        for bi, blk in enumerate(dec_blocks):
            h, new_convs[f"dec_up{bi}"] = _conv_step(
                blk.conv, dec_p["blocks"][bi]["conv"],
                cache["convs"][f"dec_up{bi}"], h)
            xin = jnp.concatenate([cache["chains"][ci], h], axis=0)
            new_chains.append(xin[xin.shape[0] - chain_pad :])
            h = _chain(dec_p["blocks"][bi]["res"], xin, interpret)
            ci += 1
        y, new_convs["dec_out"] = _conv_step(
            gen.decoder.conv2, dec_p["conv2"], cache["convs"]["dec_out"], h)
        return y, {"chains": new_chains, "convs": new_convs}

    return init_cache, step
