"""Fused Pallas streaming kernels for the HiFiGAN vocoder receiver.

The reference's v0-v3 presets pair a symAD analyzer transmitter with a
HiFiGAN vocoder receiver (utils/audiodec.py:96-103 + models/vocoder/
HiFiGAN.py:268-296).  :func:`make_mega_vocoder` compiles that receiver —
optional codebook lookup, input conv (with the analyzer-statistics
normalization folded into its weights), every transposed-conv upsample,
every multi-fusion residual block (both the MultiGroupConv1d fast-decoder
variant and the MultiReceptiveField average) and the tanh output conv —
into a short **pipeline of Pallas kernels**, each with ``grid=(n_frames,)``.

Unlike the denoiser mega kernel (ops/mega_kernel.py, ~7.6 M params split
across two kernels), the AudioDec v1 vocoder carries ~19 M parameters —
too big for one kernel's VMEM residency (~16 MB/core).  The builder
therefore packs the layer sequence greedily into segments under a
per-kernel scoped-VMEM budget (weights + scratch + temporaries estimate);
weights stay VMEM-resident *within* each segment
across every frame of the dispatch, and only tiny per-frame activation
blocks (≤ ~60 KB) cross between segments through HBM.  Streaming caches
use the same VMEM-scratch site pattern as the mega kernel: seeded from
small HBM arrays at grid step 0, drained back every step, so a returned
cache continues an ongoing stream across dispatches exactly like
``HiFiGANGenerator.init_cache`` does for the XLA path.

Value convention inside a kernel: the activation is a python LIST of 2-D
``(rows, lanes)`` arrays —

- length 1 for plain layers,
- length ``groups`` inside a MultiGroupConv1d block (the reference tiles
  the input ``groups`` times and runs one grouped resblock,
  multi_fusion.py:82-141; per-group slices of a grouped conv are dense
  matmuls, so no Mosaic lane-concatenation is ever needed),
- length 2 (entrance, partial sum) between MultiReceptiveField resblocks.

Segment boundaries stack the list on a new major axis, so hand-offs are
``(n, len, rows, lanes)`` HBM arrays.

Weights default to bfloat16 (activations and accumulation stay f32);
biases, the codebook and the output stay f32.

Tested in tests/test_vocoder_kernel.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from dl_speech_enhancement_tpu.ops.mega_kernel import _Bag, _rep_matrix


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


class _Seg:
    """One Pallas kernel: consts + cache sites + an op chain."""

    def __init__(self, name):
        self.name = name
        self.consts = _Bag()
        self.caches = []   # (site_name, (ctx, lanes))
        self.scratch = []  # (site_name, (ctx + rows, lanes))
        self.ops = []      # closures: (i, hs, site, C) -> hs
        self.in_len = None
        self.in_rows = None
        self.in_lanes = None
        self.in_dtype = jnp.float32
        self.out_len = None
        self.out_rows = None
        self.out_lanes = None

    def cache(self, name, ctx, lanes, rows):
        self.caches.append((name, (ctx, lanes)))
        self.scratch.append((name, (ctx + rows, lanes)))


class _Plan:
    """Collects logical ops, then packs them into segments by VMEM cost."""

    def __init__(self, weight_dtype, budget_bytes, transient_mode="max"):
        self.wd = weight_dtype
        self.wbytes = 2 if weight_dtype == jnp.bfloat16 else 4
        self.budget = budget_bytes
        assert transient_mode in ("max", "sum")
        self.transient_mode = transient_mode
        # (persist_bytes, trans_bytes, entry_len, rows_in, lanes_in, build)
        self.pending = []
        self.t = None      # current rows
        self.hlen = 1      # current list length
        self.lanes = None

    def add(self, weight_params, build, out_len, out_rows, out_lanes,
            persist_bytes=0, trans_bytes=0):
        """Two-part scoped-VMEM estimate per op (the deep 1200-row stages
        are dominated by non-weight demand, and the TPU's scoped-VMEM
        stack (~16 MB) OOMs if the packer counts weights alone — observed
        on-chip for the AudioDec v1 tail segment: 18.5 MB scoped demand
        from <1 MB of weights):

        - ``persist_bytes``: demand live for the whole kernel — cache-site
          scratch buffers and f32/wd consts beyond the weights (e.g. the
          upsample interleave matrices). Summed across the segment's ops.
        - ``trans_bytes``: live f32 temporaries *during* this op only
          (activation windows, masks, accumulators). Mosaic reuses this
          space between ops, so the segment charge is the MAX over its ops
          (round-5 repack: sum-counting transients forced the v1 preset
          into 14 segments and the pipeline is segment-issue bound —
          docs/SCALING.md vocoder roofline). ``transient_mode='sum'``
          restores the conservative round-4 accounting for A/B.
        """
        self.pending.append(
            (weight_params * self.wbytes + persist_bytes, trans_bytes,
             self.hlen, self.t, self.lanes, build)
        )
        self.hlen, self.t, self.lanes = out_len, out_rows, out_lanes

    def pack(self, in_rows, in_lanes, in_dtype):
        segs = []
        cur = None
        persist = 0
        trans = 0
        for p_cost, t_cost, elen, rows, lanes, build in self.pending:
            if self.transient_mode == "max":
                new_trans = max(trans, t_cost)
            else:
                new_trans = trans + t_cost
            if cur is None or (persist + p_cost + new_trans > self.budget
                               and cur.ops):
                if cur is not None:
                    segs.append(cur)
                cur = _Seg(f"voc{len(segs)}")
                cur.in_len, cur.in_rows, cur.in_lanes = elen, rows, lanes
                persist = 0
                new_trans = t_cost
            build(cur)
            persist += p_cost
            trans = new_trans
        segs.append(cur)
        segs[0].in_rows, segs[0].in_lanes = in_rows, in_lanes
        segs[0].in_dtype = in_dtype
        for seg in segs:
            seg.out_len, seg.out_rows, seg.out_lanes = None, None, None
        for a, b in zip(segs, segs[1:]):
            a.out_len, a.out_rows, a.out_lanes = b.in_len, b.in_rows, b.in_lanes
        segs[-1].out_len, segs[-1].out_rows, segs[-1].out_lanes = (
            self.hlen, self.t, self.lanes)
        return segs


def _pad_lanes(lanes):
    """Mosaic stores f32 values in (8, 128) tiles: a 32-lane array still
    occupies full 128-lane tiles, so scoped-VMEM estimates must use the
    padded lane count (observed on-chip: a 2-unit 32-channel stage-3
    segment estimated ~7 MB unpadded actually demanded 16.8 MB)."""
    return -(-lanes // 128) * 128


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _tap_conv(v, w, rows, taps, dilation, bias=None):
    """Causal tap-matmul: y[t] = sum_j v[t + j*d] @ w[j] (+ bias)."""
    acc = _dot(v[0:rows], w[0])
    for j in range(1, taps):
        acc = acc + _dot(v[j * dilation : j * dilation + rows], w[j])
    if bias is not None:
        acc = acc + bias
    return acc


def make_mega_vocoder(voc, params, chunk, weight_dtype=jnp.bfloat16,
                      interpret=False, vq_embed=None,
                      seg_budget_bytes=9_000_000,
                      group_pack_max_lanes=128,
                      transient_mode="max"):
    """Build the fused streaming pipeline for a causal HiFiGAN generator.

    Returns ``(init_cache, run)``:

    - ``run(cache, zq (n, chunk//hop, in_channels) f32) -> (audio (n, chunk),
      new_cache)`` — per-frame semantics match ``voc.step`` from zero
      caches (models/hifigan.py::HiFiGANGenerator.step);
    - with ``vq_embed`` (the analyzer's ``VQState.embed``, shape
      ``(n_books, code_dim, book_size)``) the first kernel prepends the
      flattened-index codebook lookup, so ``run(cache, codes (n, chunk//hop,
      n_books) int32)`` consumes the tx wire bitstream directly
      (reference utils/audiodec.py:96-103: lookup sums per-quantizer
      embeddings, vq_module.py:151-161).

    ``chunk`` is the per-frame *audio* sample count (must be a multiple of
    ``voc.total_upsample``).  Analyzer-statistics input normalization
    (HiFiGAN.py:206-219) is folded into the input conv's weights at
    assembly.  ``seg_budget_bytes`` caps each kernel's estimated
    scoped-VMEM cost (weights + cache-site scratch + live temporaries).
    ``group_pack_max_lanes``: MultiGroupConv1d stages whose
    ``groups * per-group channels`` fit within this lane count run
    group-packed — block-diagonal dense tap matmuls instead of per-group
    ones (3x fewer matmul issues on the deep narrow stages; 0 disables).
    ``transient_mode``: how per-op live-temporary estimates combine within
    a segment — 'max' (default; Mosaic reuses temp space between ops, so
    the tail stages merge into few fat segments) or 'sum' (the
    conservative round-4 accounting; 14 segments on the v1 preset).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from dl_speech_enhancement_tpu.models.hifigan import (
        HiFiGANGenerator,
        MultiGroupConv1d,
        MultiReceptiveField,
    )

    assert isinstance(voc, HiFiGANGenerator)
    hop = voc.total_upsample
    assert chunk % hop == 0 and chunk > 0, (chunk, hop)
    z_rows = chunk // hop
    wd = weight_dtype
    slope = voc.negative_slope

    plan = _Plan(wd, seg_budget_bytes, transient_mode=transient_mode)
    plan.t = z_rows
    in_ch = voc.input_conv.in_channels

    # ---- optional codebook lookup (wire codes -> zq) ----
    if vq_embed is not None:
        embed = np.asarray(vq_embed)  # (L, D, K)
        n_books, code_dim, book_k = embed.shape
        assert code_dim == in_ch, (code_dim, in_ch)
        plan.lanes = n_books

        def build_lookup(seg, embed=embed):
            for l in range(n_books):
                seg.consts.add(f"cbk{l}", embed[l].T.astype(np.float32))

            def body(i, hs, site, C):
                (idx,) = hs  # (z_rows, L) int32 flattened wire indices
                lane = lax.broadcasted_iota(jnp.int32, (z_rows, book_k), 1)
                zq = None
                for l in range(n_books):
                    ind = idx[:, l] - l * book_k
                    onehot = (lane == ind[:, None]).astype(jnp.float32)
                    q = _dot(onehot, C[f"cbk{l}"][...])
                    zq = q if zq is None else zq + q
                return [zq]

            seg.ops.append(body)

        plan.add(0, build_lookup, 1, z_rows, in_ch,
                 persist_bytes=embed.size * 4,  # codebooks stay f32 consts
                 trans_bytes=6 * z_rows * _pad_lanes(book_k) * 4)
        in_dtype = jnp.int32
        in_lanes = n_books
    else:
        plan.lanes = in_ch
        in_dtype = jnp.float32
        in_lanes = in_ch

    # ---- input conv (k, in -> channels), stats normalization folded ----
    cin = voc.input_conv
    assert cin.stride == 1 and cin.dilation == 1 and cin.groups == 1
    w_in = np.asarray(cin.weight(params["input_conv"]))  # (k, in, ch)
    b_in = np.asarray(params["input_conv"].get("b", np.zeros(w_in.shape[2])))
    if voc.norm:
        mean = np.asarray(voc.mean)
        scale = np.asarray(voc.scale)
        # y = sum_j (x-mean)/scale @ W[j] + b
        #   = sum_j x @ (W[j]/scale[:,None]) + (b - sum_j (mean/scale) @ W[j])
        b_in = b_in - np.einsum("i,kio->o", mean / scale, w_in)
        w_in = w_in / scale[None, :, None]
    k_in = w_in.shape[0]
    ch0 = w_in.shape[2]

    def build_input(seg, w_in=w_in, b_in=b_in, rows=z_rows):
        seg.consts.add("inW", w_in.astype(wd))
        seg.consts.add("inB", b_in.reshape(1, -1).astype(np.float32))
        seg.cache("cin", k_in - 1, w_in.shape[1], rows)

        def body(i, hs, site, C):
            v = site("cin", k_in - 1, hs[0])
            return [_tap_conv(v.astype(wd), C["inW"], rows, k_in, 1,
                              C["inB"][...])]

        seg.ops.append(body)

    plan.add(w_in.size, build_input, 1, z_rows, ch0,
             persist_bytes=(k_in - 1 + z_rows) * _pad_lanes(w_in.shape[1]) * 4,
             trans_bytes=6 * z_rows * _pad_lanes(ch0) * 4)

    # ---- per-stage: leaky -> upsample -> fusion ----
    def add_upsample(si, up, up_p, t_in):
        s = up.stride
        cpad = up.kernel_size - 1 - s
        c_in = up.in_channels
        c_out = up.out_channels
        wup = np.asarray(up.weight(up_p))  # (k, in, out) conv-ready
        bup = np.asarray(up_p.get("b", np.zeros(c_out)))
        t_out = t_in * s

        def build(seg):
            seg.consts.add(f"s{si}uW", wup.astype(wd))
            seg.consts.add(f"s{si}ub", bup.reshape(1, -1).astype(np.float32))
            # the 0/1 replication matrix is exact in ANY float dtype, so it
            # rides the weight dtype: in bf16 the big (t_out, t_in) gather
            # matmul takes single-pass MXU instead of the 3-pass f32
            # decomposition (yp is freshly accumulated f32 — one rounding
            # to wd here, same as every tap matmul input)
            seg.consts.add(f"s{si}U", _rep_matrix(t_in, s).astype(wd))
            seg.cache(f"s{si}u", 1, c_in, t_in)

            def body(i, hs, site, C):
                v = site(f"s{si}u", 1, _leaky(hs[0], slope))
                vw = v.astype(wd)
                w = C[f"s{si}uW"]
                urep = C[f"s{si}U"][...]
                h = None
                for p in range(s):
                    yp = (_dot(vw[0:t_in], w[cpad - p])
                          + _dot(vw[1 : t_in + 1], w[cpad + s - p]))
                    rp = _dot(urep, yp.astype(wd))
                    mask = (lax.broadcasted_iota(jnp.int32, (t_out, 1), 0)
                            % s) == p
                    t = jnp.where(mask, rp, 0.0)
                    h = t if h is None else h + t
                return [h + C[f"s{si}ub"][...]]

            seg.ops.append(body)

        plan.add(wup.size, build, 1, t_out, c_out,
                 persist_bytes=(t_out * _pad_lanes(t_in)  # rep-matrix const
                                + (t_in + 1) * _pad_lanes(c_in)) * 4,
                 trans_bytes=(s + 4) * t_out * _pad_lanes(c_out) * 4)
        return t_out

    def add_resunit(uid, conv1, conv2, p1, p2, groups, c, rows, entry_len,
                    slot=None):
        """One dilation unit of a HiFiGANResidualBlock:
        x <- x + conv2(leaky(conv1(leaky(x)))) (residual_block.py:23-106).
        With ``slot=None`` the unit's grouped convs update list slots
        0..groups-1 in place (per-group slices of a grouped conv are dense
        matmuls); with ``slot=k`` a dense unit updates that one slot."""
        k1, d1 = conv1.kernel_size, conv1.dilation
        pad1 = (k1 - 1) * d1
        w1 = np.asarray(conv1.weight(p1))  # (k, c, groups*c)
        b1 = np.asarray(p1.get("b", np.zeros(w1.shape[2])))
        if conv2 is not None:
            k2, d2 = conv2.kernel_size, conv2.dilation
            pad2 = (k2 - 1) * d2
            w2 = np.asarray(conv2.weight(p2))
            b2 = np.asarray(p2.get("b", np.zeros(w2.shape[2])))
        wsize = w1.size + (w2.size if conv2 is not None else 0)
        slots = list(range(groups)) if slot is None else [slot]
        persist = groups * ((pad1 + rows)
                            + ((pad2 + rows) if conv2 is not None else 0)
                            ) * _pad_lanes(c) * 4
        trans = groups * 6 * rows * _pad_lanes(c) * 4

        def build(seg):
            for g in range(groups):
                seg.consts.add(f"{uid}w1g{g}",
                               w1[:, :, g * c : (g + 1) * c].astype(wd))
                seg.consts.add(f"{uid}b1g{g}",
                               b1[g * c : (g + 1) * c].reshape(1, -1)
                               .astype(np.float32))
                seg.cache(f"{uid}c1g{g}", pad1, c, rows)
                if conv2 is not None:
                    seg.consts.add(f"{uid}w2g{g}",
                                   w2[:, :, g * c : (g + 1) * c].astype(wd))
                    seg.consts.add(f"{uid}b2g{g}",
                                   b2[g * c : (g + 1) * c].reshape(1, -1)
                                   .astype(np.float32))
                    seg.cache(f"{uid}c2g{g}", pad2, c, rows)

            def body(i, hs, site, C):
                out = list(hs)
                for g, sl in enumerate(slots):
                    x = hs[sl]
                    v = site(f"{uid}c1g{g}", pad1, _leaky(x, slope))
                    xt = _tap_conv(v.astype(wd), C[f"{uid}w1g{g}"], rows,
                                   k1, d1, C[f"{uid}b1g{g}"][...])
                    if conv2 is not None:
                        v = site(f"{uid}c2g{g}", pad2, _leaky(xt, slope))
                        xt = _tap_conv(v.astype(wd), C[f"{uid}w2g{g}"], rows,
                                       k2, d2, C[f"{uid}b2g{g}"][...])
                    out[sl] = xt + x
                return out

            seg.ops.append(body)

        plan.add(wsize, build, entry_len, rows, c, persist_bytes=persist,
                 trans_bytes=trans)

    def add_resunit_packed(uid, conv1, conv2, p1, p2, groups, c, rows,
                           entry_len):
        """Group-packed dilation unit: the ``groups`` per-group (c -> c)
        convs of a MultiGroupConv1d unit run as ONE dense
        ``(groups*c -> groups*c)`` tap matmul with block-diagonal weights.
        For groups*c within a lane-tile multiple this trades a little
        block-diag zero-padding FLOP for a ``groups``-fold cut in matmul
        issues and cache sites — the deep 1200-row stages of the v1 preset
        are issue-bound on 32-lane (pad-128) operands, so packing cuts
        stage 3 from 198 to 66 matmul issues. On-chip on/off A/B:
        docs/SCALING.md "Group-pack A/B" table (round 4)."""
        gc = groups * c
        k1, d1 = conv1.kernel_size, conv1.dilation
        pad1 = (k1 - 1) * d1
        w1 = np.asarray(conv1.weight(p1))  # (k, c, groups*c)
        b1 = np.asarray(p1.get("b", np.zeros(w1.shape[2])))
        w1bd = np.zeros((k1, gc, gc), w1.dtype)
        for g in range(groups):
            w1bd[:, g * c : (g + 1) * c, g * c : (g + 1) * c] = (
                w1[:, :, g * c : (g + 1) * c])
        if conv2 is not None:
            k2, d2 = conv2.kernel_size, conv2.dilation
            pad2 = (k2 - 1) * d2
            w2 = np.asarray(conv2.weight(p2))
            b2 = np.asarray(p2.get("b", np.zeros(w2.shape[2])))
            w2bd = np.zeros((k2, gc, gc), w2.dtype)
            for g in range(groups):
                w2bd[:, g * c : (g + 1) * c, g * c : (g + 1) * c] = (
                    w2[:, :, g * c : (g + 1) * c])
        wsize = w1bd.size + (w2bd.size if conv2 is not None else 0)
        persist = ((pad1 + rows)
                   + ((pad2 + rows) if conv2 is not None else 0)
                   ) * _pad_lanes(gc) * 4
        trans = 6 * rows * _pad_lanes(gc) * 4

        def build(seg):
            seg.consts.add(f"{uid}w1", w1bd.astype(wd))
            seg.consts.add(f"{uid}b1",
                           b1.reshape(1, -1).astype(np.float32))
            seg.cache(f"{uid}c1", pad1, gc, rows)
            if conv2 is not None:
                seg.consts.add(f"{uid}w2", w2bd.astype(wd))
                seg.consts.add(f"{uid}b2",
                               b2.reshape(1, -1).astype(np.float32))
                seg.cache(f"{uid}c2", pad2, gc, rows)

            def body(i, hs, site, C):
                x = hs[0]
                v = site(f"{uid}c1", pad1, _leaky(x, slope))
                xt = _tap_conv(v.astype(wd), C[f"{uid}w1"], rows, k1, d1,
                               C[f"{uid}b1"][...])
                if conv2 is not None:
                    v = site(f"{uid}c2", pad2, _leaky(xt, slope))
                    xt = _tap_conv(v.astype(wd), C[f"{uid}w2"], rows, k2,
                                   d2, C[f"{uid}b2"][...])
                return [xt + x]

            seg.ops.append(body)

        plan.add(wsize, build, entry_len, rows, gc, persist_bytes=persist,
                 trans_bytes=trans)

    def add_resunit_chunked(uid, conv1, conv2, p1, p2, sizes, groups, c,
                            rows):
        """Chunk-packed dilation unit: the per-group convs run as
        ``len(sizes)`` block-diagonal dense matmuls of ``size*c`` lanes
        each (the last chunk may carry zero-weight dummy groups so all
        chunks share a lane count — segment boundaries stack the carry
        list, which requires uniform shapes).  Rationale: Mosaic pads
        every matmul operand to 128 lanes, so a per-group (rows, c<128)
        tap matmul costs the same as a (rows, 128) one — fusing ``size``
        groups per issue cuts the stage's padded FLOPs by ``size``x
        (docs/SCALING.md round-5 'Vocoder segment merging' roofline)."""
        n_chunks = len(sizes)
        gpc = sizes[0]
        cc = gpc * c  # uniform chunk lanes
        k1, d1 = conv1.kernel_size, conv1.dilation
        pad1 = (k1 - 1) * d1
        w1 = np.asarray(conv1.weight(p1))  # (k, c, groups*c)
        b1 = np.asarray(p1.get("b", np.zeros(w1.shape[2])))
        if conv2 is not None:
            k2, d2 = conv2.kernel_size, conv2.dilation
            pad2 = (k2 - 1) * d2
            w2 = np.asarray(conv2.weight(p2))
            b2 = np.asarray(p2.get("b", np.zeros(w2.shape[2])))

        def chunk_blockdiag(w, j):
            bd = np.zeros((w.shape[0], cc, cc), w.dtype)
            for gi in range(sizes[j]):
                g = j * gpc + gi
                if g < groups:
                    bd[:, gi * c : (gi + 1) * c, gi * c : (gi + 1) * c] = (
                        w[:, :, g * c : (g + 1) * c])
            return bd

        def chunk_bias(b, j):
            cb = np.zeros(cc, b.dtype)
            for gi in range(sizes[j]):
                g = j * gpc + gi
                if g < groups:
                    cb[gi * c : (gi + 1) * c] = b[g * c : (g + 1) * c]
            return cb

        wsize = n_chunks * (k1 * cc * cc
                            + (k2 * cc * cc if conv2 is not None else 0))
        persist = n_chunks * ((pad1 + rows)
                              + ((pad2 + rows) if conv2 is not None else 0)
                              ) * _pad_lanes(cc) * 4
        trans = 6 * rows * _pad_lanes(cc) * 4

        def build(seg):
            for j in range(n_chunks):
                seg.consts.add(f"{uid}w1x{j}", chunk_blockdiag(w1, j)
                               .astype(wd))
                seg.consts.add(f"{uid}b1x{j}", chunk_bias(b1, j)
                               .reshape(1, -1).astype(np.float32))
                seg.cache(f"{uid}c1x{j}", pad1, cc, rows)
                if conv2 is not None:
                    seg.consts.add(f"{uid}w2x{j}", chunk_blockdiag(w2, j)
                                   .astype(wd))
                    seg.consts.add(f"{uid}b2x{j}", chunk_bias(b2, j)
                                   .reshape(1, -1).astype(np.float32))
                    seg.cache(f"{uid}c2x{j}", pad2, cc, rows)

            def body(i, hs, site, C):
                out = list(hs)
                for j in range(n_chunks):
                    x = hs[j]
                    v = site(f"{uid}c1x{j}", pad1, _leaky(x, slope))
                    xt = _tap_conv(v.astype(wd), C[f"{uid}w1x{j}"], rows,
                                   k1, d1, C[f"{uid}b1x{j}"][...])
                    if conv2 is not None:
                        v = site(f"{uid}c2x{j}", pad2, _leaky(xt, slope))
                        xt = _tap_conv(v.astype(wd), C[f"{uid}w2x{j}"],
                                       rows, k2, d2, C[f"{uid}b2x{j}"][...])
                    out[j] = xt + x
                return out

            seg.ops.append(body)

        plan.add(wsize, build, n_chunks, rows, cc, persist_bytes=persist,
                 trans_bytes=trans)

    def add_mgc(si, mgc, p, rows, group_pack_max_lanes=128):
        """MultiGroupConv1d: tile x groups-fold, grouped resblock, 1x1 fuse
        (multi_fusion.py:82-141).  When ``groups * c`` fits within
        ``group_pack_max_lanes`` the whole block runs group-packed (see
        add_resunit_packed): tile is a lane-concat, units are block-diag
        dense matmuls, and the 1x1 fuse is its natural single dense
        ``(groups*c, c)`` matmul.  When only PART of the groups fit a
        128-lane tile (e.g. the v1 preset's stage 2: groups=3, c=64),
        the block runs CHUNK-packed: ceil(groups/(max_lanes//c)) uniform
        block-diagonal chunks, dummy zero-weight groups padding the last
        chunk (see add_resunit_chunked)."""
        groups = mgc.groups
        blk = mgc.block
        bp = p["block"]
        c = blk.convs1[0].in_channels // groups
        gc = groups * c
        packed = gc <= group_pack_max_lanes
        gpc = (max(1, group_pack_max_lanes // c)
               if group_pack_max_lanes else 1)
        wf = np.asarray(mgc.conv_out.weight(p["conv_out"]))[0]  # (g*c, c)

        if packed:
            def build_tile_packed(seg):
                def body(i, hs, site, C):
                    return [jnp.concatenate([hs[0]] * groups, axis=1)]

                seg.ops.append(body)

            plan.add(0, build_tile_packed, 1, rows, gc,
                     trans_bytes=2 * rows * _pad_lanes(gc) * 4)

            for ui, conv1 in enumerate(blk.convs1):
                conv2 = blk.convs2[ui] if blk.use_additional_convs else None
                p2 = bp["convs2"][ui] if blk.use_additional_convs else None
                add_resunit_packed(f"s{si}u{ui}", conv1, conv2,
                                   bp["convs1"][ui], p2, groups, c, rows, 1)

            def build_fuse_packed(seg):
                seg.consts.add(f"s{si}f", wf.astype(wd))

                def body(i, hs, site, C):
                    return [_dot(hs[0].astype(wd), C[f"s{si}f"][...])]

                seg.ops.append(body)

            plan.add(wf.size, build_fuse_packed, 1, rows, c,
                     trans_bytes=3 * rows * _pad_lanes(gc) * 4)
            return

        if gpc >= 2:
            # chunk-packed: uniform chunks of gpc groups (last padded with
            # zero-weight dummies), each a block-diag dense matmul
            n_chunks = -(-groups // gpc)
            sizes = [gpc] * n_chunks
            cc = gpc * c

            def build_tile_chunked(seg):
                def body(i, hs, site, C):
                    return [jnp.concatenate([hs[0]] * gpc, axis=1)
                            for _ in range(n_chunks)]

                seg.ops.append(body)

            plan.add(0, build_tile_chunked, n_chunks, rows, cc,
                     trans_bytes=2 * rows * _pad_lanes(cc) * 4)

            for ui, conv1 in enumerate(blk.convs1):
                conv2 = blk.convs2[ui] if blk.use_additional_convs else None
                p2 = bp["convs2"][ui] if blk.use_additional_convs else None
                add_resunit_chunked(f"s{si}u{ui}", conv1, conv2,
                                    bp["convs1"][ui], p2, sizes, groups, c,
                                    rows)

            def build_fuse_chunked(seg):
                for j in range(n_chunks):
                    wfj = np.zeros((cc, wf.shape[1]), wf.dtype)
                    for gi in range(gpc):
                        g = j * gpc + gi
                        if g < groups:
                            wfj[gi * c : (gi + 1) * c] = (
                                wf[g * c : (g + 1) * c])
                    seg.consts.add(f"s{si}fx{j}", wfj.astype(wd))

                def body(i, hs, site, C):
                    y = None
                    for j in range(n_chunks):
                        t = _dot(hs[j].astype(wd), C[f"s{si}fx{j}"][...])
                        y = t if y is None else y + t
                    return [y]

                seg.ops.append(body)

            plan.add(wf.size, build_fuse_chunked, 1, rows, c,
                     trans_bytes=(n_chunks + 2) * rows * _pad_lanes(cc) * 4)
            return

        def build_tile(seg):
            def body(i, hs, site, C):
                return [hs[0]] * groups

            seg.ops.append(body)

        plan.add(0, build_tile, groups, rows, c)

        for ui, conv1 in enumerate(blk.convs1):
            conv2 = blk.convs2[ui] if blk.use_additional_convs else None
            p2 = bp["convs2"][ui] if blk.use_additional_convs else None
            add_resunit(f"s{si}u{ui}", conv1, conv2, bp["convs1"][ui], p2,
                        groups, c, rows, groups)

        def build_fuse(seg):
            for g in range(groups):
                seg.consts.add(f"s{si}fg{g}",
                               wf[g * c : (g + 1) * c].astype(wd))

            def body(i, hs, site, C):
                y = None
                for g in range(groups):
                    t = _dot(hs[g].astype(wd), C[f"s{si}fg{g}"][...])
                    y = t if y is None else y + t
                return [y]

            seg.ops.append(body)

        plan.add(wf.size, build_fuse, 1, rows, c,
                 trans_bytes=(groups + 2) * rows * _pad_lanes(c) * 4)

    def add_mrf(si, mrf, p, rows):
        """MultiReceptiveField: average of resblocks over the SAME entrance
        (multi_fusion.py:23-79).  Carry convention: ``[x, acc]`` between
        blocks, ``[x, acc, work]`` inside one (``acc`` starts at zeros)."""
        n_blocks = len(mrf.blocks)
        c = mrf.blocks[0].convs1[0].in_channels
        for bi, blk in enumerate(mrf.blocks):
            bp = p["blocks"][bi]
            first, last = bi == 0, bi == n_blocks - 1

            def build_enter(seg, first=first):
                def body(i, hs, site, C):
                    if first:
                        x = hs[0]
                        return [x, jnp.zeros_like(x), x]
                    x, acc = hs
                    return [x, acc, x]

                seg.ops.append(body)

            plan.add(0, build_enter, 3, rows, c)

            # the block's dilation units run on slot 2 (a copy of x)
            for ui, conv1 in enumerate(blk.convs1):
                conv2 = blk.convs2[ui] if blk.use_additional_convs else None
                p2 = bp["convs2"][ui] if blk.use_additional_convs else None
                add_resunit(f"s{si}b{bi}u{ui}", conv1, conv2,
                            bp["convs1"][ui], p2, 1, c, rows, 3, slot=2)

            def build_exit(seg, last=last):
                def body(i, hs, site, C):
                    x, acc, y = hs
                    acc = acc + y
                    if last:
                        return [acc / float(n_blocks)]
                    return [x, acc]

                seg.ops.append(body)

            plan.add(0, build_exit, 1 if last else 2, rows, c)

    t = z_rows
    for si in range(voc.num_upsamples):
        t = add_upsample(si, voc.upsamples[si], params["upsamples"][si], t)
        blkmod = voc.blocks[si]
        if isinstance(blkmod, MultiGroupConv1d):
            add_mgc(si, blkmod, params["blocks"][si], t,
                    group_pack_max_lanes=group_pack_max_lanes)
        else:
            assert isinstance(blkmod, MultiReceptiveField)
            add_mrf(si, blkmod, params["blocks"][si], t)
    assert t == chunk, (t, chunk)

    # ---- output conv: leaky(0.01) -> conv (k, c -> out) -> tanh ----
    cout = voc.output_conv
    assert cout.stride == 1 and cout.dilation == 1 and cout.groups == 1
    w_out = np.asarray(cout.weight(params["output_conv"]))  # (k, c, 1)
    b_out = np.asarray(params["output_conv"].get("b", np.zeros(w_out.shape[2])))
    k_out = w_out.shape[0]
    c_last = w_out.shape[1]
    n_out = w_out.shape[2]

    def build_output(seg, rows=chunk):
        seg.consts.add("outW", w_out.astype(wd))
        seg.consts.add("outB", b_out.reshape(1, -1).astype(np.float32))
        seg.cache("cout", k_out - 1, c_last, rows)

        def body(i, hs, site, C):
            # upstream uses the default LeakyReLU slope (0.01) before the
            # output conv (HiFiGAN.py:116), unlike the 0.1 used elsewhere
            v = site("cout", k_out - 1, _leaky(hs[0], 0.01))
            y = _tap_conv(v.astype(wd), C["outW"], rows, k_out, 1,
                          C["outB"][...])
            return [jnp.tanh(y)]

        seg.ops.append(body)

    plan.add(w_out.size, build_output, 1, chunk, n_out,
             persist_bytes=(k_out - 1 + chunk) * _pad_lanes(c_last) * 4,
             trans_bytes=6 * chunk * _pad_lanes(c_last) * 4)

    segs = plan.pack(z_rows, in_lanes, in_dtype)

    # ---------------- kernels ----------------
    def make_kernel(seg):
        n_c = len(seg.consts.arrays)
        n_cache = len(seg.caches)
        cache_names = [nm for nm, _ in seg.caches]

        def kernel(*refs):
            x_ref = refs[0]
            cr = refs[1 : 1 + n_c]
            ci = refs[1 + n_c : 1 + n_c + n_cache]
            y_ref = refs[1 + n_c + n_cache]
            co = refs[2 + n_c + n_cache : 2 + n_c + 2 * n_cache]
            scratch = refs[2 + n_c + 2 * n_cache :]
            C = {nm: cr[i] for i, nm in enumerate(seg.consts.names)}
            S = {nm: scratch[i] for i, (nm, _) in enumerate(seg.scratch)}
            CI = {nm: ci[i] for i, nm in enumerate(cache_names)}
            CO = {nm: co[i] for i, nm in enumerate(cache_names)}
            i = pl.program_id(0)

            def site(name, ctx, x_val):
                buf = S[name]

                @pl.when(i == 0)
                def _():
                    buf[0:ctx] = CI[name][...]

                buf[ctx:] = x_val
                v = buf[...]
                tail = v[v.shape[0] - ctx :]
                buf[0:ctx] = tail
                CO[name][...] = tail
                return v

            if seg.in_len == 1:
                hs = [x_ref[0]]
            else:
                hs = [x_ref[0, j] for j in range(seg.in_len)]
            if seg.in_dtype != jnp.int32:
                hs = [h.astype(jnp.float32) for h in hs]
            for op in seg.ops:
                hs = op(i, hs, site, C)
            assert len(hs) == seg.out_len, (seg.name, len(hs), seg.out_len)
            if seg.out_len == 1:
                y_ref[0] = hs[0]
            else:
                for j in range(seg.out_len):
                    y_ref[0, j] = hs[j]

        return kernel

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernels = [make_kernel(seg) for seg in segs]

    def init_cache():
        cache = {}
        for seg in segs:
            for nm, (ctx, lanes) in seg.caches:
                cache[nm] = jnp.zeros((ctx, lanes), jnp.float32)
        return cache

    def run(cache, x):
        n = x.shape[0]
        assert x.shape[1] == z_rows, (x.shape, z_rows)
        h = x
        new_cache = {}
        for seg, kernel in zip(segs, kernels):
            cache_names = [nm for nm, _ in seg.caches]
            if seg.in_len == 1:
                in_block = pl.BlockSpec((1, seg.in_rows, seg.in_lanes),
                                        lambda i: (i, 0, 0))
            else:
                in_block = pl.BlockSpec(
                    (1, seg.in_len, seg.in_rows, seg.in_lanes),
                    lambda i: (i, 0, 0, 0))
            if seg.out_len == 1:
                out_block = pl.BlockSpec((1, seg.out_rows, seg.out_lanes),
                                         lambda i: (i, 0, 0))
                out_shape = jax.ShapeDtypeStruct(
                    (n, seg.out_rows, seg.out_lanes), jnp.float32)
            else:
                out_block = pl.BlockSpec(
                    (1, seg.out_len, seg.out_rows, seg.out_lanes),
                    lambda i: (i, 0, 0, 0))
                out_shape = jax.ShapeDtypeStruct(
                    (n, seg.out_len, seg.out_rows, seg.out_lanes),
                    jnp.float32)
            outs = pl.pallas_call(
                kernel,
                grid=(n,),
                in_specs=([in_block]
                          + [vmem] * (len(seg.consts.arrays)
                                      + len(seg.caches))),
                out_specs=[out_block] + [vmem] * len(seg.caches),
                out_shape=([out_shape]
                           + [jax.ShapeDtypeStruct(shape, jnp.float32)
                              for _, shape in seg.caches]),
                scratch_shapes=[pltpu.VMEM(shape, jnp.float32)
                                for _, shape in seg.scratch],
                interpret=interpret,
            )(h, *seg.consts.arrays, *[cache[nm] for nm in cache_names])
            h = outs[0]
            new_cache.update(dict(zip(cache_names, outs[1:])))
        assert h.shape == (n, chunk, n_out), h.shape
        return h[:, :, 0] if n_out == 1 else h, new_cache

    run.num_segments = len(segs)
    # roofline introspection (docs/SCALING.md vocoder section): per-segment
    # boundary geometry + resident weight bytes
    run.segments_io = [
        {"name": seg.name,
         "in_rows": seg.in_rows, "in_lanes": seg.in_lanes,
         "in_len": seg.in_len,
         "out_rows": seg.out_rows, "out_lanes": seg.out_lanes,
         "out_len": seg.out_len,
         "weight_bytes": sum(int(np.prod(a.shape)) * a.dtype.itemsize
                             for a in seg.consts.arrays),
         "n_caches": len(seg.caches),
         "cache_bytes": sum(int(np.prod(shape)) * 4
                            for _, shape in seg.caches)}
        for seg in segs]
    return init_cache, run
