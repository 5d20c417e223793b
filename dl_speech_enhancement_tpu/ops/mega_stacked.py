"""Stacked-region batched mega kernel (round-4 stream-major rebuild).

:func:`make_mega_stream_stacked` is the third design of the multi-stream
whole-model Pallas path (VERDICT r3 #4). The round-2 batched kernel
(ops/mega_kernel.py::make_mega_stream_batched) kept a ``(B, time, C)``
3-D layout and lost to XLA because Mosaic's 3-D multi-page ref
restrictions forced every cache site and boundary conv through
value-space staging copies and per-stream python loops; it also OOMed
past B=4 because every buffer scaled with B inside two monolithic
kernels. This design removes all of that:

- **Stacked regions, everything 2-D.** All B streams are concatenated
  along the sublane (row) axis: a site buffer is ``(B*(ctx+rows),
  lanes)`` where stream b owns rows ``[b*L, (b+1)*L)``, ``L = ctx +
  rows``. Residual-chain convs become *global* windowed tap matmuls over
  all ``B*L`` rows — the same index arithmetic as the single-stream
  kernel, with ``B×`` the MXU rows (the deep 512-channel levels go from
  4-20 rows to ``B×`` that). Rows whose window crosses a region boundary
  produce garbage, but the garbage provably lands only in the
  *consumed-context zone* of the next region: a chain unit with left-pad
  ``p`` reads valid rows ``[c, L)`` of each region and writes
  ``[c+p, L)``, so garbage written at ``[0, c+p)`` is never read again.
  (The single-stream kernel computes over its context rows too — the
  stacked overhead is proportionally identical.)
- **Boundary convs via sublane<->lane reshapes.** A stride-s downsample
  folds its input ``(R, C) -> (R/s, s*C)`` and becomes a 3-tap basis
  matmul (the level-0 trick of the single-stream kernel, generalized to
  any stride via a context pad that makes each region length divisible
  by s). A stride-s upsample emits all s phases lane-concatenated
  (``(cin, s*cout)`` matmuls on 2 input rows — the single-stream
  kernel's *last-block* trick, generalized to every block) and unfolds
  ``(R, s*C) -> (R*s, C)`` back to time-major rows. Mosaic lowers both
  reshapes iff **both lane counts are >=128** (measured on-chip,
  tools/reshape_probe.py) — so sub-128-channel levels run lane-padded to
  128 (zero-padded weights; zeros are preserved by the ELU/residual
  algebra). No selection/permutation matmuls, no 3-D scratch, no
  per-stream compute loops; the only B-indexed code is the static
  unrolled site bookkeeping (2-D sub-extent ref copies).
- **Segment pipeline under a VMEM budget.** The stage list (input conv,
  4 encoder levels, 4 decoder blocks, output conv) is greedily packed
  into as few Pallas kernels as fit a per-kernel scoped-VMEM budget
  (weights + cache sites + live-temporary estimate — the
  ops/vocoder_kernel.py packing idea), so large B compiles: the
  monolithic two-kernel variant OOMed at B>=8 because the 512-channel
  levels' ~6 MB of weights had to cohabit with every level's B-scaled
  buffers. Dense stacked activations ``(B*rows, lanes)`` cross segment
  boundaries through HBM (~hundreds of KB per grid step — noise against
  HBM bandwidth); weights stay VMEM-resident across each segment's whole
  ``grid=(n_frames,)``; streaming caches live in VMEM scratch seeded
  from ``(B*ctx, lanes)`` arrays at grid step 0 and drained back every
  step.

Covers BOTH generator families: the without-PQC flagship denoiser
(models/autoencoder_without_PQC/AudioDec.py:95-100 streamed frame-by-
frame as bin/stream.py does) and, with ``vq_state``, the PQC (symAD)
codec — in-kernel projector + residual-VQ nearest-codeword search
emitting the int32 wire codes + codebook lookup + decoder input conv,
exactly as make_mega_stream's single-stream path does. Equivalence vs
``gen.encode_step``/``decode_step`` per stream is pinned in
tests/test_mega_stacked.py (incl. test_mega_stacked_pqc_matches_xla);
on-chip A/B vs the XLA batch path in docs/SCALING.md: XLA batching wins
for BOTH codecs (round-5 control arm — XLA batched PQC 16.4 vs stacked
22.8 us/stream-frame at B=16; the earlier 14.4 stacked reading was a
two-point-fit artifact), so 'auto' keeps the XLA scan for batch>1 and
this kernel family is reached by explicit backend='pallas' only
(stream/runtime.py::resolve_scan_backend).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from dl_speech_enhancement_tpu.ops.stream_kernel import _elu
from dl_speech_enhancement_tpu.ops.mega_kernel import (
    _Bag,
    _folded_input_basis,
    _folded_output_basis,
    _folded_unit_mats,
    _last_upsample_mats,
    _unit_weights,
)

_MIN_LANES = 128  # Mosaic fold/unfold reshapes need >=128 lanes each side


def _pad_lanes(c):
    return max(c, _MIN_LANES)


def _pad_w3(w, cin_p, cout_p):
    """Zero-pad a (k, cin, cout) weight to (k, cin_p, cout_p)."""
    k, ci, co = w.shape
    out = np.zeros((k, cin_p, cout_p), w.dtype)
    out[:, :ci, :co] = w
    return out


def _pad_w2(w, cin_p, cout_p):
    ci, co = w.shape
    out = np.zeros((cin_p, cout_p), w.dtype)
    out[:ci, :co] = w
    return out


def _down_basis(wdn, s, g, cin_blk):
    """3-tap folded basis for a stride-s k=2s causal downsample whose
    input buffer carries ``g`` extra rows in front of the 2s-1 context
    rows (g in [1, s] makes ctx+rows divisible by s). With folded rows
    F[u] = buf[s*u : s*u+s] (lane blocks of cin_blk), the output is
    ``y[t] = sum_o F[t+o] @ basis[o]``:
    basis[o, p*cin_blk:(p+1)*cin_blk] = wdn[s*o + p - g]."""
    cout = wdn.shape[2]
    basis = np.zeros((3, s * cin_blk, cout), np.float32)
    for o in range(3):
        for p in range(s):
            j = s * o + p - g
            if 0 <= j < 2 * s:
                basis[o, p * cin_blk : (p + 1) * cin_blk] = wdn[j]
    return basis


class _Stage:
    """One model stage: declares constants + cache sites at build time,
    and a ``body(C, site, h, stride, off) -> (h, stride, off)`` that
    transforms the stacked activation value inside the kernel. ``h`` is
    dense-garbage-aware: regions of length ``stride`` with valid rows
    ``[off, off + rows)`` per stream. ``force_break`` ends the segment
    after this stage (the PQC wire-code boundary); ``out_dtype`` is the
    dense inter-segment dtype if this stage ends a segment."""

    def __init__(self, name, out_rows, out_lanes, out_dtype=jnp.float32,
                 force_break=False):
        self.name = name
        self.consts = []   # (name, array)
        self.sites = []    # (name, ctx, lanes, rows)
        self.scratch = []  # (name, rows, lanes) extra VMEM scratch
        self.out_rows = out_rows
        self.out_lanes = out_lanes
        self.out_dtype = out_dtype
        self.force_break = force_break
        self.body = None

    def add_const(self, name, arr):
        self.consts.append((name, arr))

    def add_site(self, name, ctx, lanes, rows):
        self.sites.append((name, ctx, lanes, rows))

    def add_scratch(self, name, rows, lanes):
        """Extra VMEM scratch reachable in the body via ``site.aux[name]``
        — e.g. a layout round-trip buffer (Mosaic cannot window-slice a
        matmul-produced value at >512 lanes; storing and reloading it
        forces a sliceable layout)."""
        self.scratch.append((name, rows, lanes))

    def cost_bytes(self, bsz):
        """Scoped-VMEM demand estimate: weights + B-scaled cache-site
        buffers + live f32 temporaries (~4 concurrent values the size of
        the largest site window: v, elu(v), acc, y)."""
        w = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                for _, a in self.consts)
        w += sum(rows * lanes * 4 for _, rows, lanes in self.scratch)
        sites = sum(bsz * (ctx + rows) * lanes * 4
                    for _, ctx, lanes, rows in self.sites)
        biggest = max((bsz * (ctx + rows) * max(lanes, 128) * 4
                       for _, ctx, lanes, rows in self.sites), default=0)
        return w + sites + 4 * biggest


def _assemble(stages, bsz, in_rows, in_lanes, vmem_budget, interpret,
              in_dtype=jnp.float32, boundary_dtype=jnp.float32):
    """Pack a stage list into VMEM-budgeted segments and build one
    pallas_call per segment. Model-agnostic: shared by the codec
    (:func:`make_mega_stream_stacked`) and the vocoder
    (ops/vocoder_stacked.py) pipelines.

    ``boundary_dtype`` is the dense inter-segment activation dtype
    (int32 wire-code boundaries are never converted): bf16 halves the
    boundary HBM traffic — relevant for the audio-rate vocoder stages —
    at the usual ~40 dB cost the TPU's internal matmul precision already
    imposes. Compute inside segments stays f32-accumulated either way.

    Returns ``(all_sites, seg_calls, segments)`` where ``seg_calls`` is a
    list of ``(call(x, cache, n) -> (out, new_cache_dict), out_dtype)``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    segments = []
    cur = []
    cur_cost = 0
    for stg in stages:
        c = stg.cost_bytes(bsz)
        if cur and cur_cost + c > vmem_budget:
            segments.append(cur)
            cur, cur_cost = [], 0
        cur.append(stg)
        cur_cost += c
        if stg.force_break:
            segments.append(cur)
            cur, cur_cost = [], 0
    if cur:
        segments.append(cur)

    all_sites = [site for stg in stages for site in stg.sites]

    def build_segment(seg_stages, in_rows, in_lanes, in_dtype):
        bag = _Bag()
        sites = []
        extras = []
        for stg in seg_stages:
            for name, arr in stg.consts:
                bag.add(name, arr)
            sites.extend(stg.sites)
            extras.extend(stg.scratch)
        site_names = [n for n, *_ in sites]
        n_c, n_s = len(bag.arrays), len(sites)
        o_rows = seg_stages[-1].out_rows
        o_lanes = seg_stages[-1].out_lanes
        o_dtype = seg_stages[-1].out_dtype
        is_last = seg_stages[-1] is stages[-1]
        if o_dtype == jnp.float32 and not is_last:
            o_dtype = boundary_dtype  # final audio stays f32
        geom = {n: (ctx, lanes, rows) for n, ctx, lanes, rows in sites}

        def kernel(*refs):
            x_ref = refs[0]
            cr = refs[1 : 1 + n_c]
            ci = refs[1 + n_c : 1 + n_c + n_s]
            out_ref = refs[1 + n_c + n_s]
            co = refs[2 + n_c + n_s : 2 + n_c + 2 * n_s]
            scratch = refs[2 + n_c + 2 * n_s :]
            C = {n: cr[i] for i, n in enumerate(bag.names)}
            S = {n: scratch[i] for i, n in enumerate(site_names)}
            CI = {n: ci[i] for i, n in enumerate(site_names)}
            CO = {n: co[i] for i, n in enumerate(site_names)}
            obuf = scratch[n_s]
            aux = {nm: scratch[n_s + 1 + k]
                   for k, (nm, _, _) in enumerate(extras)}
            i = pl.program_id(0)

            def site(name, src, src_stride, src_off):
                """Compose [ctx | new rows] per region into the site
                buffer, drain the tail for the next frame/dispatch,
                return the full (B*L, lanes) buffer value."""
                ctx, lanes, rows = geom[name]
                buf = S[name]
                L = ctx + rows

                @pl.when(i == 0)
                def _():
                    for b in range(bsz):
                        buf[b * L : b * L + ctx] = (
                            CI[name][b * ctx : (b + 1) * ctx])

                for b in range(bsz):
                    buf[b * L + ctx : (b + 1) * L] = (
                        src[b * src_stride + src_off
                            : b * src_stride + src_off + rows])
                v = buf[...]
                for b in range(bsz):
                    buf[b * L : b * L + ctx] = (
                        v[(b + 1) * L - ctx : (b + 1) * L])

                # the returned cache only needs the LAST grid step's
                # tails (the grid is sequential); draining every step
                # would cost B x sites VPU copies per frame
                @pl.when(i == pl.num_programs(0) - 1)
                def _():
                    for b in range(bsz):
                        CO[name][b * ctx : (b + 1) * ctx] = (
                            v[(b + 1) * L - ctx : (b + 1) * L])
                return v

            site.aux = aux
            h = x_ref[0]
            if in_dtype != jnp.int32:
                h = h.astype(jnp.float32)
            stride, off = in_rows, 0
            for stg in seg_stages:
                h, stride, off = stg.body(C, site, h, stride, off)
            if h.dtype != o_dtype:
                h = h.astype(o_dtype)
            for b in range(bsz):
                obuf[b * o_rows : (b + 1) * o_rows] = (
                    h[b * stride + off : b * stride + off + o_rows])
            out_ref[0] = obuf[...]

        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

        def call(x, cache, n):
            outs = pl.pallas_call(
                kernel,
                grid=(n,),
                in_specs=([pl.BlockSpec((1, bsz * in_rows, in_lanes),
                                        lambda i: (i, 0, 0))]
                          + [vmem] * (n_c + n_s)),
                out_specs=([pl.BlockSpec((1, bsz * o_rows, o_lanes),
                                         lambda i: (i, 0, 0))]
                           + [vmem] * n_s),
                out_shape=([jax.ShapeDtypeStruct((n, bsz * o_rows, o_lanes),
                                                 o_dtype)]
                           + [jax.ShapeDtypeStruct((bsz * ctx, lanes),
                                                   jnp.float32)
                              for _, ctx, lanes, _ in sites]),
                scratch_shapes=(
                    [pltpu.VMEM((bsz * (ctx + rows), lanes), jnp.float32)
                     for _, ctx, lanes, rows in sites]
                    + [pltpu.VMEM((bsz * o_rows, o_lanes), o_dtype)]
                    + [pltpu.VMEM((rows, lanes), jnp.float32)
                       for _, rows, lanes in extras]),
                interpret=interpret,
            )(x, *bag.arrays, *[cache[nm] for nm in site_names])
            out, *new = outs
            return out, dict(zip(site_names, new))

        return call, o_rows, o_lanes, o_dtype

    seg_calls = []
    for seg_stages in segments:
        call, in_rows, in_lanes, in_dtype = build_segment(
            seg_stages, in_rows, in_lanes, in_dtype)
        seg_calls.append((call, in_dtype))
    return all_sites, seg_calls, segments


def make_mega_stream_stacked(gen, params, chunk: int, batch: int,
                             weight_dtype=jnp.bfloat16,
                             interpret: bool = False,
                             vmem_budget: int = 12 * 2**20,
                             vq_state=None,
                             boundary_dtype=jnp.float32):
    """Build the stacked-region batched streaming pipeline.

    Returns ``(init_cache, run)``: ``init_cache() -> {name: (B*ctx,
    lanes) f32}``; without PQC ``run(cache, frames (N, B, chunk)) ->
    (out (N, B, chunk), new_cache)``; with PQC (pass ``vq_state``)
    ``run`` additionally returns ``codes (N, B, chunk/hop,
    codebook_num) int32`` — the flattened tx wire indices (reference
    utils/audiodec.py:96-103) — and the in-kernel pipeline includes the
    projector conv, the residual-VQ nearest-codeword assignment (f32
    distances, lowest-index tie-break like jnp.argmin / vq_module.py),
    the codebook lookup, and the decoder input conv, with the int32
    code stream as a forced segment boundary. Per-frame semantics per
    stream match ``gen.encode_step`` (+ ``quantize``/``lookup``) +
    ``gen.decode_step`` from zero caches. ``vmem_budget`` is the
    per-kernel packing budget; stages that exceed it alone still get
    their own kernel.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert gen.mode == "causal"
    assert gen.input_channels == 1
    assert chunk % gen.hop == 0 and chunk > 0
    assert batch >= 1
    use_pqc = gen.use_pqc
    if use_pqc:
        assert vq_state is not None, "PQC stacked kernel needs the VQ state"
    bsz = batch
    wd = weight_dtype

    enc, dec = gen.encoder, gen.decoder
    enc_p, dec_p = params["encoder"], params["decoder"]

    fold = enc.blocks[0].conv.stride
    assert 6 % fold == 0, f"first encoder stride {fold} must divide 6"
    for blk in enc.blocks:
        assert blk.conv.kernel_size == 2 * blk.conv.stride
        for u in blk.res_units:
            assert u.conv1.kernel_size == 7
    rows0 = chunk // fold
    fold_d = dec.blocks[-1].conv.stride
    assert 6 % fold_d == 0, f"last decoder stride {fold_d} must divide 6"

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def run_chain(v, units, C):
        """Global fixed-region chain: valid data per region shifts from
        offset 0 to offset chain_ctx; garbage stays behind the shift."""
        for w1n, w2n, pad, d in units:
            R = v.shape[0]
            rn = R - pad
            a = _elu(v).astype(wd)
            w1 = C[w1n]
            n_taps = w1.shape[0]
            acc = dot(a[0:rn], w1[0])
            for j in range(1, n_taps):
                acc += dot(a[j * d : j * d + rn], w1[j])
            y = dot(_elu(acc).astype(wd), C[w2n][...])
            v = v + jnp.concatenate(
                [jnp.zeros((pad, v.shape[1]), v.dtype), y], axis=0)
        return v

    stages = []

    # ---------------- input conv stage ----------------
    w_in = np.asarray(enc.conv.weight(enc_p["conv"]))  # (7, 1, C0)
    a_in, ctx_in = _folded_input_basis(w_in, fold)
    st = _Stage("in", rows0, fold * w_in.shape[2])
    st.add_const("in_A", a_in.astype(wd))
    st.add_site("cin", ctx_in, fold, rows0)

    def in_body(C, site, h, stride, off, _st=st):
        v = site("cin", h, stride, off)
        vw = v.astype(wd)
        Lc = ctx_in + rows0
        rn = bsz * Lc - ctx_in
        h = dot(vw[0:rn], C["in_A"][0])
        for o in range(1, ctx_in + 1):
            h += dot(vw[o : o + rn], C["in_A"][o])
        return h, Lc, 0

    st.body = in_body
    stages.append(st)

    def add_unit_stage(prefix, ui, u, up, lanes_p, unit_fold, t_io):
        """One residual unit as its own stage (packer granularity: the
        deep 512-channel chains are too heavy for one kernel at large B
        otherwise). ``unit_fold`` > 1 builds folded block matrices."""
        st = _Stage(f"{prefix}u{ui}", t_io, lanes_p)
        w1n, w2n = f"{prefix}u{ui}w1", f"{prefix}u{ui}w2"
        if unit_fold > 1:
            m1, m2, pad = _folded_unit_mats(u, up, unit_fold)
            st.add_const(w1n, m1.astype(wd))
            st.add_const(w2n, m2.astype(wd))
            d = 1
        else:
            w1, w2 = _unit_weights(u, up)
            d = u.conv1.dilation
            pad = 6 * d
            st.add_const(w1n, _pad_w3(w1, lanes_p, lanes_p).astype(wd))
            st.add_const(w2n, _pad_w2(w2, lanes_p, lanes_p).astype(wd))
        sn = f"{prefix}u{ui}s"
        st.add_site(sn, pad, lanes_p, t_io)

        def u_body(C, site, h, stride, off, sn=sn, unit=(w1n, w2n, pad, d),
                   t_io=t_io):
            v = site(sn, h, stride, off)
            v = run_chain(v, [unit], C)
            return v, unit[2] + t_io, unit[2]

        st.body = u_body
        stages.append(st)

    # ---------------- encoder level stages ----------------
    t_rows = rows0
    for bi, blk in enumerate(enc.blocks):
        bp = enc_p["blocks"][bi]
        s = blk.conv.stride
        cin_ch = blk.conv.in_channels
        cout_ch = blk.conv.out_channels
        wdn = np.asarray(blk.conv.weight(bp["conv"]))
        bdn = np.asarray(bp["conv"].get("b", np.zeros(cout_ch)))
        folded = bi == 0
        cin_p = fold * cin_ch if folded else _pad_lanes(cin_ch)
        cout_p = (_pad_lanes(cout_ch) if bi + 1 < len(enc.blocks)
                  else enc.out_channels)  # z stays native
        if folded:
            assert s == fold
            g, d_ctx, cin_blk = 1, 2, cin_ch  # 2 folded rows = 2s raw
            t_out = t_rows
        else:
            g = ((-t_rows) % s) + 1
            d_ctx = (2 * s - 1) + g
            assert (d_ctx + t_rows) % s == 0
            cin_blk = cin_p
            t_out = t_rows // s
        for ui, u in enumerate(blk.res_units):
            add_unit_stage(f"e{bi}", ui, u, bp["res"][ui], cin_p,
                           fold if folded else 1, t_rows)
        st = _Stage(f"e{bi}d", t_out, cout_p)
        wdn_p = _pad_w3(wdn, cin_blk, cout_p)
        st.add_const(f"e{bi}dB", _down_basis(wdn_p, s, g, cin_blk).astype(wd))
        st.add_const(f"e{bi}db",
                     _pad_w2(bdn.reshape(1, -1), 1, cout_p)
                     .astype(np.float32))
        st.add_site(f"e{bi}ds", d_ctx, cin_p, t_rows)

        def e_body(C, site, h, stride, off, bi=bi, s=s, folded=folded,
                   d_ctx=d_ctx, t_in=t_rows, t_out=t_out):
            v = site(f"e{bi}ds", h, stride, off)
            Ld = d_ctx + t_in
            if folded:
                f, Lf = v, Ld
            else:
                f = v.reshape((bsz * Ld) // s, s * v.shape[1])
                Lf = Ld // s
            fw_ = f.astype(wd)
            rn = bsz * Lf - 2
            h = dot(fw_[0:rn], C[f"e{bi}dB"][0])
            for o in (1, 2):
                h += dot(fw_[o : o + rn], C[f"e{bi}dB"][o])
            return h + C[f"e{bi}db"][...], Lf, 0

        st.body = e_body
        stages.append(st)
        t_rows = t_out
    z_rows = t_rows

    # ---------------- PQC: projector + residual VQ / lookup + conv1 ----
    if use_pqc:
        pr = gen.projector.conv
        assert pr.stride == 1 and pr.dilation == 1
        w_pr = np.asarray(pr.weight(params["projector"]["conv"]))
        k_pr = w_pr.shape[0]
        # k==1 would create a zero-row cache site, which Mosaic may only
        # reject at lowering — assert here so make_scan_stream's documented
        # AssertionError fallback path fires instead (ADVICE r4)
        assert k_pr > 1, "stacked PQC assumes projector kernel_size > 1"
        embed = np.asarray(vq_state.embed)  # (L, D, K)
        n_books, code_dim, book_k = embed.shape
        st = _Stage("pq", z_rows, n_books, out_dtype=jnp.int32,
                    force_break=True)
        st.add_const("prW", w_pr.astype(wd))
        for l in range(n_books):
            st.add_const(f"vqE{l}", embed[l].astype(np.float32))
            st.add_const(f"vqN{l}", np.sum(embed[l] ** 2, axis=0,
                                           keepdims=True).astype(np.float32))
            st.add_const(f"vqT{l}", embed[l].T.astype(np.float32))
        st.add_site("prjs", k_pr - 1, enc.out_channels, z_rows)

        def pq_body(C, site, h, stride, off):
            import jax.lax as lax
            v = site("prjs", h, stride, off)
            vw = v.astype(wd)
            Lp = (k_pr - 1) + z_rows
            rn = bsz * Lp - (k_pr - 1)
            z = dot(vw[0:rn], C["prW"][0])
            for j in range(1, k_pr):
                z += dot(vw[j : j + rn], C["prW"][j])
            # residual VQ on all rows (garbage rows -> garbage codes,
            # confined to each region's tail like every other stage)
            residual = z
            lane = lax.broadcasted_iota(jnp.int32, (rn, book_k), 1)
            cols = []
            for l in range(n_books):
                e_l = C[f"vqE{l}"][...]
                dist = (jnp.sum(jnp.square(residual), axis=1, keepdims=True)
                        - 2.0 * dot(residual, e_l) + C[f"vqN{l}"][...])
                m = jnp.min(dist, axis=1, keepdims=True)
                ind = jnp.min(jnp.where(dist <= m, lane, book_k), axis=1)
                onehot = (lane == ind[:, None]).astype(jnp.float32)
                residual = residual - dot(onehot, C[f"vqT{l}"][...])
                cols.append((ind + l * book_k)[:, None])
            return jnp.concatenate(cols, axis=1), Lp, 0

        st.body = pq_body
        stages.append(st)

        d1 = dec.conv1
        assert d1.stride == 1 and d1.dilation == 1
        w_d1 = np.asarray(d1.weight(dec_p["conv1"]))
        k_d1 = w_d1.shape[0]
        assert k_d1 > 1, "stacked PQC assumes decoder conv1 kernel_size > 1"
        st = _Stage("lk", z_rows, dec.blocks[0].conv.in_channels)
        for l in range(n_books):
            st.add_const(f"cbk{l}", embed[l].T.astype(np.float32))  # (K, D)
        st.add_const("dc1W", w_d1.astype(wd))
        st.add_site("dc1s", k_d1 - 1, code_dim, z_rows)

        def lk_body(C, site, h, stride, off):
            import jax.lax as lax
            # h: dense int32 codes (B*z_rows, n_books)
            rn = h.shape[0]
            lane = lax.broadcasted_iota(jnp.int32, (rn, book_k), 1)
            zq = None
            for l in range(n_books):
                ind = h[:, l] - l * book_k
                onehot = (lane == ind[:, None]).astype(jnp.float32)
                q = dot(onehot, C[f"cbk{l}"][...])
                zq = q if zq is None else zq + q
            v = site("dc1s", zq, stride, off)
            vw = v.astype(wd)
            Ld1 = (k_d1 - 1) + z_rows
            rn2 = bsz * Ld1 - (k_d1 - 1)
            g = dot(vw[0:rn2], C["dc1W"][0])
            for j in range(1, k_d1):
                g += dot(vw[j : j + rn2], C["dc1W"][j])
            return g, Ld1, 0

        st.body = lk_body
        stages.append(st)

    # ---------------- decoder block stages ----------------
    n_blocks = len(dec.blocks)
    prev_cout_p = dec.blocks[0].conv.in_channels
    for bi, blk in enumerate(dec.blocks):
        bp = dec_p["blocks"][bi]
        s = blk.conv.stride
        assert blk.conv.kernel_size == 2 * s
        cpad = blk.conv.kernel_size - 1 - s
        cout_ch = blk.conv.out_channels
        wup = np.asarray(blk.conv.weight(bp["conv"]))
        bup = np.asarray(bp["conv"].get("b", np.zeros(cout_ch)))
        last = bi == n_blocks - 1
        cin_p = prev_cout_p
        cout_p = fold_d * cout_ch if last else _pad_lanes(cout_ch)
        t_out = t_rows if last else t_rows * s
        st = _Stage(f"d{bi}u", t_out, cout_p)
        st.add_site(f"d{bi}us", 1, cin_p, t_rows)
        if last:
            m0, m1 = _last_upsample_mats(
                _pad_w3(wup, cin_p, cout_ch), cpad, s)
            st.add_const(f"d{bi}uM0", m0.astype(wd))
            st.add_const(f"d{bi}uM1", m1.astype(wd))
            st.add_const(f"d{bi}ub", np.tile(bup, fold_d).reshape(1, -1)
                         .astype(np.float32))
        else:
            co_p = _pad_lanes(cout_ch)
            m0, m1 = _last_upsample_mats(_pad_w3(wup, cin_p, co_p), cpad, s)
            st.add_const(f"d{bi}uM0", m0.astype(wd))
            st.add_const(f"d{bi}uM1", m1.astype(wd))
            bup_p = np.zeros(co_p, np.float32)
            bup_p[:cout_ch] = bup
            st.add_const(f"d{bi}ub", np.tile(bup_p, s).reshape(1, -1)
                         .astype(np.float32))

        def d_body(C, site, h, stride, off, bi=bi, s=s, last=last,
                   t_in=t_rows):
            v = site(f"d{bi}us", h, stride, off)
            vw = v.astype(wd)
            Lu = 1 + t_in
            rn = bsz * Lu - 1
            e = (dot(vw[0:rn], C[f"d{bi}uM0"][...])
                 + dot(vw[1 : rn + 1], C[f"d{bi}uM1"][...])
                 + C[f"d{bi}ub"][...])
            if last:
                return e, Lu, 0
            return e.reshape(rn * s, e.shape[1] // s), Lu * s, 0

        st.body = d_body
        stages.append(st)
        for ui, u in enumerate(blk.res_units):
            add_unit_stage(f"d{bi}", ui, u, bp["res"][ui], cout_p,
                           fold_d if last else 1, t_out)
        t_rows = t_out
        prev_cout_p = cout_p

    # ---------------- output conv stage ----------------
    w_out = np.asarray(dec.conv2.weight(dec_p["conv2"]))  # (7, C, 1)
    o_out, ctx_out = _folded_output_basis(w_out, fold_d)
    out_rows = t_rows
    st = _Stage("out", out_rows, fold_d)
    st.add_const("outO", o_out.astype(wd))
    st.add_site("cout", ctx_out, fold_d * w_out.shape[1], out_rows)

    def out_body(C, site, h, stride, off):
        v = site("cout", h, stride, off)
        vw = v.astype(wd)
        Lo = ctx_out + out_rows
        rn = bsz * Lo - ctx_out
        y = dot(vw[0:rn], C["outO"][0])
        for o in range(1, ctx_out + 1):
            y += dot(vw[o : o + rn], C["outO"][o])
        return y, Lo, 0

    st.body = out_body
    stages.append(st)

    all_sites, seg_calls, segments = _assemble(
        stages, bsz, rows0, fold, vmem_budget, interpret,
        boundary_dtype=boundary_dtype)

    # ---------------- wrappers ----------------
    def init_cache():
        return {name: jnp.zeros((bsz * ctx, lanes), jnp.float32)
                for name, ctx, lanes, _ in all_sites}

    def run(cache, frames):
        n, b, t = frames.shape
        assert t == chunk and b == bsz, (frames.shape, bsz, chunk)
        h = frames.reshape(n, bsz * rows0, fold)
        new_cache = {}
        codes = None
        for call, o_dtype in seg_calls:
            h, upd = call(h, cache, n)
            new_cache.update(upd)
            if o_dtype == jnp.int32:  # the PQC wire-code boundary
                codes = h
        out = h.reshape(n, bsz, t)
        if use_pqc:
            return out, new_cache, codes.reshape(n, bsz, z_rows, -1)
        return out, new_cache

    run.n_segments = len(segments)
    run.segment_names = [[stg.name for stg in seg] for seg in segments]
    return init_cache, run
