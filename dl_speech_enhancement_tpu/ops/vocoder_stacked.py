"""Stacked-region batched HiFiGAN vocoder kernel (round 4).

Extends the stacked-region design (ops/mega_stacked.py — B streams
concatenated along the sublane axis, fixed-length regions, global
windowed tap matmuls, VMEM-budgeted segment pipeline) to the causal
HiFiGAN vocoder receiver, so paired-preset fleets (symAD analyzer tx ->
codes -> v1 vocoder rx, utils/audiodec.py pairing) get the same
multi-stream Pallas treatment as the codec:

- **input conv** (k=7, code_dim -> channels) with the analyzer-statistics
  normalization folded into the weights/bias at assembly
  (models/hifigan.py:238-241 semantics);
- **upsample stages**: LeakyReLU -> causal transposed conv (k=2s) as the
  phase-emit matmul pair + sublane unfold (mega_stacked's decoder-block
  machinery), output lane-padded to >=128 where the stage channel count
  is smaller (the Mosaic reshape support boundary), then compressed back
  to native lanes with a 0/1 projection matmul so the chains never pay
  padded-lane FLOPs;
- **MultiGroupConv1d resblocks** (the AudioDec v1 fast-decoder trick,
  reference modules/multi_fusion.py:82-141): the group tile is a 0/1
  tiling matmul fused with the pad compression (a lane concat of
  sub-128-lane pieces does not lower through Mosaic — measured on-chip),
  each grouped conv a block-diagonal dense tap matmul (the
  ops/vocoder_kernel.py group-pack), each dilation unit its own stage
  (conv1 + optional conv2 + residual in one fixed-region shift), and the
  1x1 fuse a pointwise matmul;
- **output conv**: LeakyReLU(0.01) -> k=7 conv -> tanh, computed folded
  (pad to 128 lanes, fold x3, 3-tap padded basis) so the audio leaves the
  kernel as (rows/3, 3) like the codec kernels.

Covers generators whose fusion blocks are all MultiGroupConv1d (the v1
preset family); MultiReceptiveField presets keep the single-stream
segment pipeline (ops/vocoder_kernel.py) and the XLA batch path. Raises
AssertionError on uncovered topologies so callers can fall back.

Equivalence vs ``voc.step`` per stream: tests/test_vocoder_stacked.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from dl_speech_enhancement_tpu.models.hifigan import (
    MultiGroupConv1d,
    _leaky,
)
from dl_speech_enhancement_tpu.ops.mega_kernel import _last_upsample_mats
from dl_speech_enhancement_tpu.ops.mega_stacked import (
    _Stage,
    _assemble,
    _pad_lanes,
    _pad_w3,
)


# grouped stages with more lanes than this use native per-group weights
# (block-diag inflation would blow VMEM; Mosaic also cannot window-slice
# matmul-produced values past 512 lanes)
_WIDE_THRESHOLD = 512


def _blockdiag3(w, groups, blk):
    """(k, c, groups*c) grouped-conv weight -> (k, groups*blk, groups*blk)
    block-diagonal dense (zero-padded per-group blocks of size blk)."""
    k, c, gc = w.shape
    assert gc == groups * c
    out = np.zeros((k, groups * blk, groups * blk), w.dtype)
    for g in range(groups):
        out[:, g * blk : g * blk + c, g * blk : g * blk + c] = (
            w[:, :, g * c : (g + 1) * c])
    return out


def _tile_bias(b, groups, blk):
    c = b.shape[0] // groups
    out = np.zeros(groups * blk, np.float32)
    for g in range(groups):
        out[g * blk : g * blk + c] = b[g * c : (g + 1) * c]
    return out


def _fuse_blockdiag(w, groups, blk, out_pad):
    """(groups*c, c) 1x1 fuse weight -> (groups*blk, out_pad)."""
    gc, c = w.shape
    g_c = gc // groups
    out = np.zeros((groups * blk, out_pad), np.float32)
    for g in range(groups):
        out[g * blk : g * blk + g_c, :c] = w[g * g_c : (g + 1) * g_c]
    return out


def _folded_out_basis_padded(w_out, fold, cp):
    """Tap basis for the folded output conv on a lane-PADDED input:
    buffer rows folded as F[u] = buf[fold*u .. fold*u+fold-1] with each
    raw row occupying a cp-lane block (valid channels in [0, c)). With
    ctx = k-1 = 6 rows: y[fold*t + p] = sum_o F[t+o] @ basis[o][:, p],
    basis[o][q*cp : q*cp+c, p] = w_out[fold*o + q - p] for the causal
    k-tap conv y[tau] = sum_j buf[tau + j] @ W[j]."""
    k, c, n_out = w_out.shape
    assert n_out == 1
    basis = np.zeros((3, fold * cp, fold), np.float32)
    assert k - 1 == 6 and fold == 3  # the supported geometry (ctx 6 rows)
    for o in range(3):
        for q in range(fold):
            for p in range(fold):
                j = fold * o + q - p
                if 0 <= j < k:
                    basis[o, q * cp : q * cp + c, p] = w_out[j, :, 0]
    return basis


def make_stacked_vocoder(voc, params, chunk: int, batch: int,
                         weight_dtype=jnp.bfloat16,
                         interpret: bool = False,
                         vmem_budget: int = 12 * 2**20,
                         vq_embed=None,
                         boundary_dtype=jnp.float32,
                         _debug_n_stages: int | None = None):
    """Build the stacked batched vocoder pipeline.

    Returns ``(init_cache, run)``: ``init_cache() -> {name: (B*ctx,
    lanes) f32}``; ``run(cache, z (N, B, chunk//total_upsample,
    in_channels)) -> (audio (N, B, chunk), new_cache)``. Per-frame
    semantics per stream match ``voc.step`` from zero caches.

    With ``vq_embed`` (the tx analyzer's ``VQState.embed``, shape
    ``(n_books, code_dim, book_k)``) the first stage prepends the
    flattened-index codebook lookup, so ``run(cache, codes (N, B,
    chunk//total_upsample, n_books) int32)`` consumes the tx wire
    bitstream directly (reference utils/audiodec.py:96-103) — the
    stacked paired-fleet composition with make_mega_stream_stacked's
    PQC codes output.
    """
    assert chunk % voc.total_upsample == 0 and chunk > 0
    assert batch >= 1
    for blk in voc.blocks:
        assert isinstance(blk, MultiGroupConv1d), (
            "stacked vocoder covers MultiGroupConv1d (v1-family) decoders")
    out_k = voc.output_conv.kernel_size
    assert out_k == 7, "output conv k=7 is the supported geometry"
    fold_out = 3
    assert chunk % fold_out == 0
    bsz = batch
    wd = weight_dtype
    slope = voc.negative_slope
    z_rows = chunk // voc.total_upsample
    in_ch = voc.input_conv.in_channels

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    stages = []

    # ---------------- optional codebook lookup (wire codes in) ---------
    if vq_embed is not None:
        embed = np.asarray(vq_embed)  # (L, D, K)
        n_books, code_dim, book_k = embed.shape
        assert code_dim == in_ch, (code_dim, in_ch)
        st = _Stage("vlk", z_rows, in_ch)
        for l in range(n_books):
            st.add_const(f"vcbk{l}", embed[l].T.astype(np.float32))

        def vlk_body(C, site, h, stride, off):
            import jax.lax as lax
            # h: dense int32 codes (B*z_rows, n_books)
            rn = h.shape[0]
            lane = lax.broadcasted_iota(jnp.int32, (rn, book_k), 1)
            zq = None
            for l in range(n_books):
                ind = h[:, l] - l * book_k
                onehot = (lane == ind[:, None]).astype(jnp.float32)
                q = dot(onehot, C[f"vcbk{l}"][...])
                zq = q if zq is None else zq + q
            return zq, stride, off

        st.body = vlk_body
        stages.append(st)

    # ---------------- input conv (stats-normalization folded) ----------
    w_in = np.asarray(voc.input_conv.weight(params["input_conv"]))
    b_in = np.asarray(params["input_conv"].get(
        "b", np.zeros(w_in.shape[2]))).astype(np.float64)
    if voc.norm:
        mean = np.asarray(voc.mean, np.float64)
        scale = np.asarray(voc.scale, np.float64)
        b_in = b_in - sum((mean / scale) @ np.asarray(w_in[j], np.float64)
                          for j in range(w_in.shape[0]))
        w_in = (w_in / scale[None, :, None]).astype(np.float32)
    k_in = w_in.shape[0]
    ch0 = w_in.shape[2]
    st = _Stage("vin", z_rows, ch0)
    st.add_const("vinW", w_in.astype(wd))
    st.add_const("vinb", b_in.reshape(1, -1).astype(np.float32))
    st.add_site("vins", k_in - 1, in_ch, z_rows)

    def vin_body(C, site, h, stride, off):
        v = site("vins", h, stride, off)
        vw = v.astype(wd)
        L = (k_in - 1) + z_rows
        rn = bsz * L - (k_in - 1)
        y = dot(vw[0:rn], C["vinW"][0])
        for j in range(1, k_in):
            y += dot(vw[j : j + rn], C["vinW"][j])
        return y + C["vinb"][...], L, 0

    st.body = vin_body
    stages.append(st)

    # ---------------- upsample + grouped-resblock stages ----------------
    t_rows = z_rows
    cin = ch0
    for si, (up, blk) in enumerate(zip(voc.upsamples, voc.blocks)):
        s = up.stride
        assert up.kernel_size == 2 * s
        cpad = up.kernel_size - 1 - s
        cout = up.out_channels
        co_p = _pad_lanes(cout)
        wup = np.asarray(up.weight(params["upsamples"][si]))
        bup = np.asarray(params["upsamples"][si].get("b", np.zeros(cout)))
        m0, m1 = _last_upsample_mats(_pad_w3(wup, cin, co_p), cpad, s)
        bup_p = np.zeros(co_p, np.float32)
        bup_p[:cout] = bup
        t_out = t_rows * s
        g = blk.groups
        st = _Stage(f"v{si}u", t_out, g * cout)
        st.add_const(f"v{si}uM0", m0.astype(wd))
        st.add_const(f"v{si}uM1", m1.astype(wd))
        st.add_const(f"v{si}ub",
                     np.tile(bup_p, s).reshape(1, -1).astype(np.float32))
        # group tile as a 0/1 matmul: a lane concat of sub-128-lane
        # pieces does not lower through Mosaic, and this also compresses
        # the reshape pad in the same pass: (co_p padded lanes) ->
        # (groups * cout native-block lanes)
        tile_t = np.zeros((co_p, g * cout), np.float32)
        for gi in range(g):
            tile_t[:cout, gi * cout : (gi + 1) * cout] = np.eye(cout)
        st.add_const(f"v{si}uT", tile_t)
        st.add_site(f"v{si}us", 1, cin, t_rows)

        def up_body(C, site, h, stride, off, si=si, s=s, t_in=t_rows,
                    co_p=co_p):
            v = site(f"v{si}us", h, stride, off)
            a = _leaky(v, slope).astype(wd)
            Lu = 1 + t_in
            rn = bsz * Lu - 1
            e = (dot(a[0:rn], C[f"v{si}uM0"][...])
                 + dot(a[1 : rn + 1], C[f"v{si}uM1"][...])
                 + C[f"v{si}ub"][...])
            u = e.reshape(rn * s, co_p)
            u = dot(u.astype(wd), C[f"v{si}uT"][...].astype(wd))
            return u, Lu * s, 0

        st.body = up_body
        stages.append(st)
        t_rows = t_out

        # grouped resblock: one stage per dilation unit, on the tiled
        # (groups*cout)-lane representation; fuse folds into the last unit
        bp = params["blocks"][si]["block"]
        gc = g * cout
        n_units = len(blk.block.convs1)
        add2 = blk.block.use_additional_convs
        # wide stages (gc > 512): block-diagonalizing the grouped convs
        # 3x-inflates their weights past VMEM (stage 0 of the v1 preset:
        # 2 x 12.9 MB per unit) — keep NATIVE per-group (k, c, c)
        # weights there and assemble group outputs through a scratch
        # buffer via 128-aligned lane-block stores. Narrow stages keep
        # the block-diagonal dense pack (the group-pack win).
        wide = gc > _WIDE_THRESHOLD
        assert not wide or cout % 128 == 0, (
            "wide grouped stages need 128-aligned per-group lanes")
        for ui in range(n_units):
            c1 = blk.block.convs1[ui]
            w1 = np.asarray(c1.weight(bp["convs1"][ui]))
            b1 = np.asarray(bp["convs1"][ui].get("b", np.zeros(gc)))
            k1, d1 = c1.kernel_size, c1.dilation
            p1 = (k1 - 1) * d1
            pad_total = p1
            st = _Stage(f"v{si}r{ui}", t_out, cout if ui == n_units - 1
                        else gc)
            if wide:
                for gi in range(g):
                    st.add_const(f"v{si}r{ui}w1g{gi}",
                                 w1[:, :, gi * cout : (gi + 1) * cout]
                                 .astype(wd))
            else:
                st.add_const(f"v{si}r{ui}w1",
                             _blockdiag3(w1, g, cout).astype(wd))
            st.add_const(f"v{si}r{ui}b1",
                         _tile_bias(b1, g, cout).reshape(1, -1)
                         .astype(np.float32))
            if add2:
                c2 = blk.block.convs2[ui]
                w2 = np.asarray(c2.weight(bp["convs2"][ui]))
                b2 = np.asarray(bp["convs2"][ui].get("b", np.zeros(gc)))
                k2, d2 = c2.kernel_size, c2.dilation
                p2 = (k2 - 1) * d2
                pad_total += p2
                if wide:
                    for gi in range(g):
                        st.add_const(f"v{si}r{ui}w2g{gi}",
                                     w2[:, :, gi * cout : (gi + 1) * cout]
                                     .astype(wd))
                else:
                    st.add_const(f"v{si}r{ui}w2",
                                 _blockdiag3(w2, g, cout).astype(wd))
                st.add_const(f"v{si}r{ui}b2",
                             _tile_bias(b2, g, cout).reshape(1, -1)
                             .astype(np.float32))
            # TWO sites per unit: conv1's input x-history and conv2's
            # t-history. A single fixed-region site would synthesize
            # conv2's first-frame context as conv1(zero-history)+bias,
            # but the reference conv2 cache is literal zeros — with
            # nonzero biases the first p2 output rows of a fresh stream
            # diverge (measured 1.3e-2). Uniform ctx c* = max(p1, p2)
            # keeps both sites on one region stride so the residual add
            # stays a global shift.
            c_star = max(p1, (k2 - 1) * d2) if add2 else p1
            st.add_site(f"v{si}r{ui}s1", c_star, gc, t_out)
            if add2:
                st.add_site(f"v{si}r{ui}s2", c_star, gc, t_out)
            if wide:
                st.add_scratch(f"v{si}r{ui}x",
                               bsz * (c_star + t_out), gc)
            if ui == n_units - 1:
                wf = np.asarray(blk.conv_out.weight(
                    params["blocks"][si]["conv_out"]))[0]  # (gc, cout)
                st.add_const(f"v{si}fW",
                             _fuse_blockdiag(wf, g, cout, cout).astype(wd))

            def r_body(C, site, h, stride, off, si=si, ui=ui, g=g,
                       wide=wide, c_blk=cout,
                       k1=k1, d1=d1, p1=p1, add2=add2,
                       k2=(c2.kernel_size if add2 else 0),
                       d2=(c2.dilation if add2 else 0),
                       c_star=c_star, last=(ui == n_units - 1),
                       t_out=t_out):
                # (group tile already applied by the upsample stage's
                # 0/1 tiling matmul — h arrives at groups*cout lanes)
                v1 = site(f"v{si}r{ui}s1", h, stride, off)
                R = v1.shape[0]
                L = c_star + t_out
                a = _leaky(v1, slope).astype(wd)

                def grouped_conv(src, wname, k, d, rn):
                    """Wide: per-group tap matmuls assembled through the
                    round-trip scratch via 128-aligned lane-block stores
                    (also forces the sliceable layout Mosaic needs for
                    the next windowed conv). Narrow: one block-diagonal
                    dense tap matmul."""
                    if not wide:
                        w = C[wname]
                        acc = dot(src[0:rn], w[0])
                        for j in range(1, k):
                            acc += dot(src[j * d : j * d + rn], w[j])
                        return acc
                    sref = site.aux[f"v{si}r{ui}x"]
                    for gi in range(g):
                        sg = src[:, gi * c_blk : (gi + 1) * c_blk]
                        wg = C[f"{wname}g{gi}"]
                        accg = dot(sg[0:rn], wg[0])
                        for j in range(1, k):
                            accg += dot(sg[j * d : j * d + rn], wg[j])
                        sref[0:rn, gi * c_blk : (gi + 1) * c_blk] = accg
                    return sref[...][0:rn]

                rn1 = R - p1
                y1 = (grouped_conv(a, f"v{si}r{ui}w1", k1, d1, rn1)
                      + C[f"v{si}r{ui}b1"][...])
                # y1 valid at region-local c* - p1 + m (window starts)
                if add2:
                    t_all = _leaky(y1, slope)
                    v2 = site(f"v{si}r{ui}s2", t_all, L, c_star - p1)
                    p2 = (k2 - 1) * d2
                    rn2 = R - p2
                    y2 = (grouped_conv(v2.astype(wd), f"v{si}r{ui}w2",
                                       k2, d2, rn2)
                          + C[f"v{si}r{ui}b2"][...])
                    shift = p2
                else:
                    y2, shift = y1, p1
                v = v1 + jnp.concatenate(
                    [jnp.zeros((shift, v1.shape[1]), v1.dtype), y2],
                    axis=0)
                stride, off = L, c_star
                if last:  # 1x1 fuse back to cout lanes (no bias)
                    v = dot(v.astype(wd), C[f"v{si}fW"][...])
                return v, stride, off

            st.body = r_body
            stages.append(st)
        cin = cout

    # ---------------- output conv (folded, lane-padded) ----------------
    w_out = np.asarray(voc.output_conv.weight(params["output_conv"]))
    b_out = float(np.asarray(params["output_conv"].get("b", np.zeros(1)))[0])
    c_last = w_out.shape[1]
    cp = _pad_lanes(c_last)
    out_rows = t_rows // fold_out
    st = _Stage("vout", out_rows, fold_out)
    st.add_const("voutO", _folded_out_basis_padded(w_out, fold_out, cp)
                 .astype(wd))
    st.add_const("voutP", np.eye(c_last, cp, dtype=np.float32))
    st.add_site("vouts", out_k - 1, cp, t_rows)

    def vout_body(C, site, h, stride, off):
        # expand native lanes to the 128-pad the fold reshape needs
        h = dot(_leaky(h, 0.01).astype(wd), C["voutP"][...].astype(wd))
        v = site("vouts", h, stride, off)
        L = (out_k - 1) + t_rows
        f = v.reshape((bsz * L) // fold_out, fold_out * cp)
        Lf = L // fold_out
        fw_ = f.astype(wd)
        rn = bsz * Lf - 2
        ob = C["voutO"]
        y = dot(fw_[0:rn], ob[0])
        for o in (1, 2):
            y += dot(fw_[o : o + rn], ob[o])
        return jnp.tanh(y + b_out), Lf, 0

    st.body = vout_body
    stages.append(st)

    # ---------------- assemble + wrappers ----------------
    if _debug_n_stages is not None:  # lowering bisection aid
        stages = stages[:_debug_n_stages]
    in_lanes = in_ch if vq_embed is None else n_books
    in_dtype = jnp.float32 if vq_embed is None else jnp.int32
    all_sites, seg_calls, segments = _assemble(
        stages, bsz, z_rows, in_lanes, vmem_budget, interpret,
        in_dtype=in_dtype, boundary_dtype=boundary_dtype)

    def init_cache():
        return {name: jnp.zeros((bsz * ctx, lanes), jnp.float32)
                for name, ctx, lanes, _ in all_sites}

    def run(cache, z):
        n, b, t, c = z.shape
        assert (t, b, c) == (z_rows, bsz, in_lanes), (z.shape, bsz, z_rows)
        h = z.reshape(n, bsz * z_rows, in_lanes)
        new_cache = {}
        for call, _ in seg_calls:
            h, upd = call(h, cache, n)
            new_cache.update(upd)
        if _debug_n_stages is not None:
            return h, new_cache  # raw stacked intermediate
        return h.reshape(n, bsz, chunk), new_cache

    run.n_segments = len(segments)
    run.segment_names = [[stg.name for stg in seg] for seg in segments]
    return init_cache, run
