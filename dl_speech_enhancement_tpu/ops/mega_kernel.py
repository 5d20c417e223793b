"""Whole-stack fused Pallas streaming kernels (the "mega kernel").

:func:`make_mega_stream` compiles the ENTIRE without-PQC denoiser — input
conv, every residual chain, every strided downsample, every transposed
upsample, output conv — into exactly TWO Pallas kernels (one encoder, one
decoder), each with ``grid=(n_frames,)``:

- **Weights are loaded into VMEM once per dispatch** (constant block index
  maps — Mosaic elides the re-fetch between grid steps) and amortized over
  every frame in the scan. The per-frame ``make_fused_chunk_step`` path
  re-streams all ~30 MB of weights from HBM every frame, which is its
  measured bottleneck; here per-frame HBM traffic is just the raw audio in
  and out plus the tiny (frames, T/hop, 512) feature hand-off between the
  two kernels.
- **Streaming caches live in VMEM scratch** that persists across grid
  steps (TPU grids are sequential), seeded from small HBM cache arrays at
  step 0 and drained back every step, so the returned cache continues an
  ongoing stream across dispatches exactly like ``gen.init_cache`` does for
  the XLA path.
- **Boundary convs never leave VMEM.** Strided downsamples are evaluated
  as phase-decomposed tap matmuls — phases are gathered with a 0/1 banded
  selection matrix on the MXU (Mosaic has no strided vector slice; a
  selection matmul costs <1 us and keeps everything resident). Transposed
  upsamples are per-phase matmuls re-interleaved with a shared replication
  matrix and an iota phase mask. The first encoder level and last decoder
  level instead run **time-folded by the boundary stride** (fold * C
  lanes), which makes the stride-3 boundary convs plain 2-3-tap matmuls
  and fixes the 32-channel chains' lane utilisation.

Math notes (all host-assembled, zero-filled for out-of-range taps):

- causal conv, stride s, k = 2s:  ``y[t] = sum_j x_ext[s*t + j] @ W[j]``
  with ``x_ext = [cache(2s-1); x]`` (nn/conv.py::CausalConv1d.step).
  Phase split ``j = o*s + p``: ``y[t] = sum_p sum_{o in 0,1}
  g_p[t+o] @ W[o*s+p]`` where ``g_p[t] = x_ext[s*t + p]``.
- causal transposed conv, k = 2s, conv-ready kernel Wc and cpad = k-1-s
  (nn/conv.py::CausalConvTranspose1d): ``y[s*r+p] = x_ext[r] @ Wc[cpad-p]
  + x_ext[r+1] @ Wc[cpad+s-p]`` with ``x_ext = [cache(1); x]``.
- folded layouts pack ``fold`` consecutive samples into one row of
  ``fold*C`` lanes; residual-chain block matrices follow
  ops/stream_kernel.py::fused_residual_chain_folded (fold must divide the
  per-unit pad 6*d, i.e. fold in {1, 2, 3, 6} — every AudioDec config's
  boundary strides at these levels are 3).

Weights default to bfloat16 (halves the one-time VMEM residency and load;
activations and accumulation stay f32). The reference model family this
covers: models/autoencoder_without_PQC/AudioDec.py:95-100 (full
encode->decode chain), streamed as bin/stream.py does frame-by-frame.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


# one canonical Mosaic-safe ELU for the ops package
from dl_speech_enhancement_tpu.ops.stream_kernel import _elu  # noqa: E402


def _ceil_div(a, b):
    return -(-a // b)


class _Bag:
    """Ordered name -> array registry for kernel operands."""

    def __init__(self):
        self.names = []
        self.arrays = []

    def add(self, name, arr):
        assert name not in self.names, name
        self.names.append(name)
        self.arrays.append(jnp.asarray(arr))

    def index(self, name):
        return self.names.index(name)


def _unit_weights(unit, p):
    w1 = np.asarray(unit.conv1.weight(p["conv1"]))  # (7, C, C)
    w2 = np.asarray(unit.conv2.weight(p["conv2"]))[0]  # (C, C)
    return w1, w2


def _folded_unit_mats(unit, p, fold):
    """Block matrices for one folded residual unit (see
    stream_kernel.fused_residual_chain_folded.assemble)."""
    w1, w2 = _unit_weights(unit, p)
    k, c, _ = w1.shape
    d = unit.conv1.dilation
    pad = (k - 1) * d
    assert pad % fold == 0, (fold, pad)
    pad_rows = pad // fold
    fc = fold * c
    m1 = np.zeros((pad_rows + 1, fc, fc), np.float32)
    for j in range(k):
        for pp in range(fold):
            o, b = divmod(pp + j * d, fold)
            m1[o, b * c : (b + 1) * c, pp * c : (pp + 1) * c] = w1[j]
    m2 = np.zeros((fc, fc), np.float32)
    for b in range(fold):
        m2[b * c : (b + 1) * c, b * c : (b + 1) * c] = w2
    return m1, m2, pad_rows


def _folded_input_basis(w_in, fold):
    """Tap basis ``(ctx+1, fold, fold*C0)`` for the folded k=7 input conv:
    output row o', lane block q' of folded output page p accumulates
    ``x[fold*o + p - q - extra] @ w_in[j]``. Shared by the single-stream
    and batched mega kernels (one copy of the index math)."""
    c0 = w_in.shape[2]
    ctx_in = _ceil_div(6, fold)
    extra = ctx_in * fold - 6
    a = np.zeros((ctx_in + 1, fold, fold * c0), np.float32)
    for o in range(ctx_in + 1):
        for p in range(fold):
            for q in range(fold):
                j = fold * o + p - q - extra
                if 0 <= j <= 6:
                    a[o, p, q * c0 : (q + 1) * c0] = w_in[j, 0]
    return a, ctx_in


def _folded_downsample_basis(wdn, fold, cin_ch):
    """Basis ``(3, fold*cin, cout)`` for the level-0 folded strided conv
    (stride == fold, kernel 2*stride): row window o of the folded input
    contributes ``wdn[fold*o + p - 1]`` at page p."""
    s = fold
    cout_ch = wdn.shape[2]
    b_dn = np.zeros((3, fold * cin_ch, cout_ch), np.float32)
    for o in range(3):
        for p in range(fold):
            j = fold * o + p - 1
            if 0 <= j < 2 * s:
                b_dn[o, p * cin_ch : (p + 1) * cin_ch] = wdn[j]
    return b_dn


def _last_upsample_mats(wup, cpad, s):
    """Folded-emit transposed conv for the LAST decoder block: two
    ``(cin, s*cout)`` matmuls (current and next input row) emit all s
    phases of one folded output row."""
    m0 = np.concatenate([wup[cpad - p] for p in range(s)], axis=1)
    m1 = np.concatenate([wup[cpad + s - p] for p in range(s)], axis=1)
    return m0, m1


def _folded_output_basis(w_out, fold_d):
    """Tap basis ``(ctx+1, fold_d*C, fold_d)`` for the folded k=7 output
    conv (C -> 1 audio sample per folded lane)."""
    c_last = w_out.shape[1]
    ctx_out = _ceil_div(6, fold_d)
    extra = ctx_out * fold_d - 6
    o_out = np.zeros((ctx_out + 1, fold_d * c_last, fold_d), np.float32)
    for o in range(ctx_out + 1):
        for p in range(fold_d):
            for q in range(fold_d):
                j = fold_d * o + p - q - extra
                if 0 <= j <= 6:
                    o_out[o, p * c_last : (p + 1) * c_last, q] = w_out[j, :, 0]
    return o_out, ctx_out


def _sel_matrix(t_out, stride):
    """(t_out+1, stride*t_out+1) banded 0/1 gather: row i selects s*i."""
    d = np.zeros((t_out + 1, stride * t_out + 1), np.float32)
    d[np.arange(t_out + 1), stride * np.arange(t_out + 1)] = 1.0
    return d


def _rep_matrix(t_in, stride):
    """(s*t_in, t_in) 0/1 replication: row r selects r // s."""
    u = np.zeros((stride * t_in, t_in), np.float32)
    u[np.arange(stride * t_in), np.arange(stride * t_in) // stride] = 1.0
    return u


def make_mega_stream(gen, params, chunk: int, weight_dtype=jnp.bfloat16,
                     interpret: bool = False, vq_state=None):
    """Whole-model streaming scan for the AudioDec generator family.

    Returns ``(init_cache, run)`` with ``init_cache() -> cache dict`` and

    - without PQC: ``run(cache, frames (N, chunk)) -> (out (N, chunk),
      new_cache)`` — semantics per frame match ``gen.encode_step`` +
      ``gen.decode_step`` from zero caches;
    - with PQC (pass ``vq_state``): ``run(cache, frames) -> (out, new_cache,
      codes (N, chunk/hop, codebook_num) int32)`` — the encoder kernel
      additionally runs the projector conv and the full residual-VQ
      nearest-codeword assignment (flattened ``+ l*K`` wire indices, the
      tx bitstream of utils/audiodec.py:96-103), and the decoder kernel
      starts with the codebook lookup and the decoder input conv; per-frame
      semantics match ``encode_step -> quantize -> lookup -> decode_step``.
      Codebooks and distances stay f32 regardless of ``weight_dtype``.
      Code agreement with the XLA quantize path is exact at
      ``weight_dtype=float32`` (what the equivalence tests pin); at the
      default bf16 the encoder/projector matmuls perturb ``z``, so a
      near-tie codeword can resolve differently than the XLA transmitter —
      pass ``weight_dtype=jnp.float32`` when bit-exact wire parity with an
      XLA peer matters. (Note the TPU's default f32 convs run at reduced
      internal precision too — see CLAUDE.md — so "exact" holds per-path,
      not vs CPU math.)

    Tested in tests/test_mega_kernel.py.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert gen.mode == "causal"
    assert gen.input_channels == 1
    assert chunk % gen.hop == 0 and chunk > 0
    use_pqc = gen.use_pqc
    if use_pqc:
        assert vq_state is not None, "PQC mega kernel needs the VQ state"
    wd = weight_dtype

    enc = gen.encoder
    dec = gen.decoder
    enc_p = params["encoder"]
    dec_p = params["decoder"]

    # ---------------- encoder build ----------------
    fold = enc.blocks[0].conv.stride
    assert 6 % fold == 0, f"first encoder stride {fold} must divide 6"
    for blk in enc.blocks:
        assert blk.conv.kernel_size == 2 * blk.conv.stride
        for u in blk.res_units:
            assert u.conv1.kernel_size == 7
    rows0 = chunk // fold

    econsts = _Bag()
    ecaches = []  # (name, (ctx, lanes))
    escratch = []  # (name, (rows, lanes))

    def ecache(name, ctx, lanes, t_rows):
        ecaches.append((name, (ctx, lanes)))
        escratch.append((name, (ctx + t_rows, lanes)))
        return ctx

    # input conv (k=7, 1 -> C0), folded output
    w_in = np.asarray(enc.conv.weight(enc_p["conv"]))  # (7, 1, C0)
    a_in, ctx_in = _folded_input_basis(w_in, fold)
    econsts.add("in_A", a_in.astype(wd))
    ecache("cin", ctx_in, fold, rows0)

    # per-block: residual chain + downsample
    enc_plan = []  # list of dicts with static info per block
    t_rows = rows0  # current folded rows (level 0) / plain rows (level >0)
    for bi, blk in enumerate(enc.blocks):
        bp = enc_p["blocks"][bi]
        s = blk.conv.stride
        cin_ch = blk.conv.in_channels
        cout_ch = blk.conv.out_channels
        wdn = np.asarray(blk.conv.weight(bp["conv"]))  # (2s, cin, cout)
        bdn = np.asarray(bp["conv"].get("b", np.zeros(cout_ch)))
        info = {"bi": bi, "stride": s, "folded": bi == 0}
        if bi == 0:
            fc = fold * cin_ch
            units = []
            for ui, u in enumerate(blk.res_units):
                m1, m2, pad_rows = _folded_unit_mats(u, bp["res"][ui], fold)
                econsts.add(f"e0u{ui}m1", m1.astype(wd))
                econsts.add(f"e0u{ui}m2", m2.astype(wd))
                units.append((f"e0u{ui}m1", f"e0u{ui}m2", pad_rows))
            info["units"] = units
            chain_ctx = sum(pr for _, _, pr in units)
            ecache("e0ch", chain_ctx, fc, t_rows)
            info["chain_ctx"] = chain_ctx
            # folded downsample: cache 2 rows (= 2*fold >= 2s-1 samples)
            assert s == fold
            econsts.add("e0dB",
                        _folded_downsample_basis(wdn, fold, cin_ch).astype(wd))
            econsts.add("e0db", bdn.reshape(1, -1).astype(np.float32))
            ecache("e0d", 2, fc, t_rows)
            t_out = t_rows  # one output per folded row
        else:
            units = []
            for ui, u in enumerate(blk.res_units):
                w1, w2 = _unit_weights(u, bp["res"][ui])
                econsts.add(f"e{bi}u{ui}w1", w1.astype(wd))
                econsts.add(f"e{bi}u{ui}w2", w2.astype(wd))
                units.append((f"e{bi}u{ui}w1", f"e{bi}u{ui}w2",
                              u.conv1.dilation))
            info["units"] = units
            chain_ctx = sum(6 * d for _, _, d in units)
            ecache(f"e{bi}ch", chain_ctx, cin_ch, t_rows)
            info["chain_ctx"] = chain_ctx
            t_out = t_rows // s
            econsts.add(f"e{bi}dW", wdn.astype(wd))
            econsts.add(f"e{bi}db", bdn.reshape(1, -1).astype(np.float32))
            econsts.add(f"e{bi}D", _sel_matrix(t_out, s))
            ecache(f"e{bi}d", 2 * s - 1, cin_ch, t_rows)
        info["t_in"] = t_rows
        info["t_out"] = t_out
        enc_plan.append(info)
        t_rows = t_out
    z_rows, z_ch = t_rows, enc.out_channels

    # projector + residual-VQ (PQC only): causal k=3 conv 512 -> code_dim,
    # then L nearest-codeword assignments on f32 distances
    if use_pqc:
        pr = gen.projector.conv
        assert pr.stride == 1 and pr.dilation == 1
        w_pr = np.asarray(pr.weight(params["projector"]["conv"]))  # (k,512,D)
        k_pr = w_pr.shape[0]
        econsts.add("prW", w_pr.astype(wd))
        ecache("prj", k_pr - 1, z_ch, z_rows)
        embed = np.asarray(vq_state.embed)  # (L, D, K)
        n_books, code_dim, book_k = embed.shape
        for l in range(n_books):
            econsts.add(f"vqE{l}", embed[l].astype(np.float32))
            econsts.add(f"vqN{l}", np.sum(embed[l] ** 2, axis=0,
                                          keepdims=True).astype(np.float32))
            econsts.add(f"vqT{l}", embed[l].T.astype(np.float32))  # (K, D)

    ecache_names = [n for n, _ in ecaches]
    n_ec, n_ecache = len(econsts.arrays), len(ecaches)

    def enc_kernel(*refs):
        x_ref = refs[0]
        cr = refs[1 : 1 + n_ec]
        ci = refs[1 + n_ec : 1 + n_ec + n_ecache]
        z_ref = refs[1 + n_ec + n_ecache]
        co = refs[2 + n_ec + n_ecache : 2 + n_ec + n_ecache + n_ecache]
        scratch = refs[2 + n_ec + 2 * n_ecache :]
        C = {n: cr[i] for i, n in enumerate(econsts.names)}
        S = {n: scratch[i] for i, (n, _) in enumerate(escratch)}
        CI = {n: ci[i] for i, n in enumerate(ecache_names)}
        CO = {n: co[i] for i, n in enumerate(ecache_names)}
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

        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        # input conv (folded)
        v = site("cin", ctx_in, x_ref[0].astype(jnp.float32))
        vw = v.astype(wd)
        h = dot(vw[0:rows0], C["in_A"][0])
        for o in range(1, ctx_in + 1):
            h += dot(vw[o : o + rows0], C["in_A"][o])

        for info in enc_plan:
            bi, s = info["bi"], info["stride"]
            t_in, t_out = info["t_in"], info["t_out"]
            # residual chain
            v = site("e0ch" if bi == 0 else f"e{bi}ch",
                     info["chain_ctx"], h)
            r = v.shape[0]
            if info["folded"]:
                for m1n, m2n, pad_rows in info["units"]:
                    rn = r - pad_rows
                    a = _elu(v).astype(wd)
                    m1 = C[m1n]
                    acc = dot(a[0:rn], m1[0])
                    for o in range(1, pad_rows + 1):
                        acc += dot(a[o : o + rn], m1[o])
                    y = dot(_elu(acc).astype(wd), C[m2n][...])
                    v = v[pad_rows:] + y
                    r = rn
            else:
                for w1n, w2n, d in info["units"]:
                    pad = 6 * d
                    rn = r - pad
                    a = _elu(v).astype(wd)
                    w1 = C[w1n]
                    acc = dot(a[0:rn], w1[0])
                    for j in range(1, 7):
                        acc += dot(a[j * d : j * d + rn], w1[j])
                    y = dot(_elu(acc).astype(wd), C[w2n][...])
                    v = v[pad:] + y
                    r = rn
            # downsample
            if info["folded"]:
                v = site("e0d", 2, v)
                vw = v.astype(wd)
                h = dot(vw[0:t_out], C["e0dB"][0])
                for o in (1, 2):
                    h += dot(vw[o : o + t_out], C["e0dB"][o])
                h += C["e0db"][...]
            else:
                v = site(f"e{bi}d", 2 * s - 1, v)
                d_sel = C[f"e{bi}D"][...]
                w = C[f"e{bi}dW"]
                h = None
                for p in range(s):
                    g = dot(d_sel, v[p : p + s * t_out + 1]).astype(wd)
                    t = dot(g[0:t_out], w[p]) + dot(g[1 : t_out + 1], w[s + p])
                    h = t if h is None else h + t
                h += C[f"e{bi}db"][...]
        if not use_pqc:
            z_ref[0] = h
            return
        # projector conv (k=3, causal, no bias)
        v = site("prj", k_pr - 1, h)
        vw = v.astype(wd)
        z = dot(vw[0:z_rows], C["prW"][0])
        for j in range(1, k_pr):
            z += dot(vw[j : j + z_rows], C["prW"][j])
        # residual VQ: L nearest-codeword assignments (f32 distances; ties
        # break to the lowest index, matching jnp.argmin / vq_module.py)
        residual = z
        lane = lax.broadcasted_iota(jnp.int32, (z_rows, book_k), 1)
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
        z_ref[0] = jnp.concatenate(cols, axis=1)

    # ---------------- decoder build ----------------
    dconsts = _Bag()
    dcaches = []
    dscratch = []

    def dcache(name, ctx, lanes, t_rows):
        dcaches.append((name, (ctx, lanes)))
        dscratch.append((name, (ctx + t_rows, lanes)))

    if use_pqc:
        # codebook lookup (sum of per-layer embeddings) + input conv (k=7)
        for l in range(n_books):
            dconsts.add(f"cbk{l}", embed[l].T.astype(np.float32))  # (K, D)
        d1 = dec.conv1
        assert d1.stride == 1 and d1.dilation == 1
        w_d1 = np.asarray(d1.weight(dec_p["conv1"]))  # (k, D, 512)
        k_d1 = w_d1.shape[0]
        dconsts.add("dc1W", w_d1.astype(wd))
        dcache("dc1", k_d1 - 1, code_dim, z_rows)

    dec_plan = []
    t_rows = z_rows
    n_blocks = len(dec.blocks)
    fold_d = dec.blocks[-1].conv.stride
    assert 6 % fold_d == 0, f"last decoder stride {fold_d} must divide 6"
    for bi, blk in enumerate(dec.blocks):
        bp = dec_p["blocks"][bi]
        s = blk.conv.stride
        assert blk.conv.kernel_size == 2 * s
        cpad = blk.conv.kernel_size - 1 - s
        cin_ch = blk.conv.in_channels
        cout_ch = blk.conv.out_channels
        wup = np.asarray(blk.conv.weight(bp["conv"]))  # (2s, cin, cout)
        bup = np.asarray(bp["conv"].get("b", np.zeros(cout_ch)))
        last = bi == n_blocks - 1
        info = {"bi": bi, "stride": s, "cpad": cpad, "last": last,
                "t_in": t_rows}
        dcache(f"d{bi}u", 1, cin_ch, t_rows)
        if last:
            # folded-emit upsample: 2 matmuls into fold_d * C_out lanes
            fc = fold_d * cout_ch
            m0, m1 = _last_upsample_mats(wup, cpad, s)
            dconsts.add("duM0", m0.astype(wd))
            dconsts.add("duM1", m1.astype(wd))
            dconsts.add("dub", np.tile(bup, fold_d).reshape(1, -1)
                        .astype(np.float32))
            t_out = t_rows  # folded rows
            units = []
            for ui, u in enumerate(blk.res_units):
                m1u, m2u, pad_rows = _folded_unit_mats(u, bp["res"][ui],
                                                       fold_d)
                dconsts.add(f"d{bi}u{ui}m1", m1u.astype(wd))
                dconsts.add(f"d{bi}u{ui}m2", m2u.astype(wd))
                units.append((f"d{bi}u{ui}m1", f"d{bi}u{ui}m2", pad_rows))
            info["units"] = units
            chain_ctx = sum(pr for _, _, pr in units)
            dcache(f"d{bi}ch", chain_ctx, fc, t_out)
        else:
            dconsts.add(f"d{bi}uW", wup.astype(wd))
            dconsts.add(f"d{bi}ub", bup.reshape(1, -1).astype(np.float32))
            dconsts.add(f"d{bi}U", _rep_matrix(t_rows, s))
            t_out = t_rows * s
            units = []
            for ui, u in enumerate(blk.res_units):
                w1, w2 = _unit_weights(u, bp["res"][ui])
                dconsts.add(f"d{bi}u{ui}w1", w1.astype(wd))
                dconsts.add(f"d{bi}u{ui}w2", w2.astype(wd))
                units.append((f"d{bi}u{ui}w1", f"d{bi}u{ui}w2",
                              u.conv1.dilation))
            info["units"] = units
            chain_ctx = sum(6 * d for _, _, d in units)
            dcache(f"d{bi}ch", chain_ctx, cout_ch, t_out)
        info["chain_ctx"] = chain_ctx
        info["t_out"] = t_out
        dec_plan.append(info)
        t_rows = t_out

    # output conv (k=7, C -> 1), folded
    w_out = np.asarray(dec.conv2.weight(dec_p["conv2"]))  # (7, C, 1)
    c_last = w_out.shape[1]
    o_out, ctx_out = _folded_output_basis(w_out, fold_d)
    dconsts.add("outO", o_out.astype(wd))
    out_rows = t_rows  # folded rows of the final chain
    dcache("cout", ctx_out, fold_d * c_last, out_rows)

    dcache_names = [n for n, _ in dcaches]
    n_dc, n_dcache = len(dconsts.arrays), len(dcaches)

    def dec_kernel(*refs):
        z_ref = refs[0]
        cr = refs[1 : 1 + n_dc]
        ci = refs[1 + n_dc : 1 + n_dc + n_dcache]
        y_ref = refs[1 + n_dc + n_dcache]
        co = refs[2 + n_dc + n_dcache : 2 + n_dc + n_dcache + n_dcache]
        scratch = refs[2 + n_dc + 2 * n_dcache :]
        C = {n: cr[i] for i, n in enumerate(dconsts.names)}
        S = {n: scratch[i] for i, (n, _) in enumerate(dscratch)}
        CI = {n: ci[i] for i, n in enumerate(dcache_names)}
        CO = {n: co[i] for i, n in enumerate(dcache_names)}
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

        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        if use_pqc:
            idx = z_ref[0]  # (z_rows, L) int32, flattened wire indices
            lane = lax.broadcasted_iota(jnp.int32, (z_rows, book_k), 1)
            zq = None
            for l in range(n_books):
                ind = idx[:, l] - l * book_k
                onehot = (lane == ind[:, None]).astype(jnp.float32)
                q = dot(onehot, C[f"cbk{l}"][...])
                zq = q if zq is None else zq + q
            v = site("dc1", k_d1 - 1, zq)
            vw = v.astype(wd)
            h = dot(vw[0:z_rows], C["dc1W"][0])
            for j in range(1, k_d1):
                h += dot(vw[j : j + z_rows], C["dc1W"][j])
        else:
            h = z_ref[0].astype(jnp.float32)
        for info in dec_plan:
            bi, s, cpad = info["bi"], info["stride"], info["cpad"]
            t_in, t_out = info["t_in"], info["t_out"]
            v = site(f"d{bi}u", 1, h)
            vw = v.astype(wd)
            if info["last"]:
                h = (dot(vw[0:t_in], C["duM0"][...])
                     + dot(vw[1 : t_in + 1], C["duM1"][...])
                     + C["dub"][...])
            else:
                w = C[f"d{bi}uW"]
                urep = C[f"d{bi}U"][...]
                h = None
                for p in range(s):
                    yp = (dot(vw[0:t_in], w[cpad - p])
                          + dot(vw[1 : t_in + 1], w[cpad + s - p]))
                    rp = dot(urep, yp)
                    mask = (lax.broadcasted_iota(jnp.int32, (t_out, 1), 0)
                            % s) == p
                    t = jnp.where(mask, rp, 0.0)
                    h = t if h is None else h + t
                h += C[f"d{bi}ub"][...]
            # residual chain
            v = site(f"d{bi}ch", info["chain_ctx"], h)
            r = v.shape[0]
            if info["last"]:
                for m1n, m2n, pad_rows in info["units"]:
                    rn = r - pad_rows
                    a = _elu(v).astype(wd)
                    m1 = C[m1n]
                    acc = dot(a[0:rn], m1[0])
                    for o in range(1, pad_rows + 1):
                        acc += dot(a[o : o + rn], m1[o])
                    y = dot(_elu(acc).astype(wd), C[m2n][...])
                    v = v[pad_rows:] + y
                    r = rn
            else:
                for w1n, w2n, d in info["units"]:
                    pad = 6 * d
                    rn = r - pad
                    a = _elu(v).astype(wd)
                    w1 = C[w1n]
                    acc = dot(a[0:rn], w1[0])
                    for j in range(1, 7):
                        acc += dot(a[j * d : j * d + rn], w1[j])
                    y = dot(_elu(acc).astype(wd), C[w2n][...])
                    v = v[pad:] + y
                    r = rn
            h = v

        # output conv (folded)
        v = site("cout", ctx_out, h)
        vw = v.astype(wd)
        y = dot(vw[0:out_rows], C["outO"][0])
        for o in range(1, ctx_out + 1):
            y += dot(vw[o : o + out_rows], C["outO"][o])
        y_ref[0] = y

    # ---------------- wrappers ----------------
    def init_cache():
        cache = {}
        for name, (ctx, lanes) in ecaches + dcaches:
            cache[name] = jnp.zeros((ctx, lanes), jnp.float32)
        return cache

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    # wire format between the two kernels: raw features without PQC,
    # flattened int32 code indices (the tx bitstream) with PQC
    if use_pqc:
        z_lanes, z_dtype = n_books, jnp.int32
    else:
        z_lanes, z_dtype = z_ch, jnp.float32

    def run(cache, frames):
        n, t = frames.shape
        assert t == chunk, (t, chunk)
        xf = frames.reshape(n, rows0, fold)
        enc_out = pl.pallas_call(
            enc_kernel,
            grid=(n,),
            in_specs=([pl.BlockSpec((1, rows0, fold), lambda i: (i, 0, 0))]
                      + [vmem] * (n_ec + n_ecache)),
            out_specs=([pl.BlockSpec((1, z_rows, z_lanes), lambda i: (i, 0, 0))]
                       + [vmem] * n_ecache),
            out_shape=([jax.ShapeDtypeStruct((n, z_rows, z_lanes), z_dtype)]
                       + [jax.ShapeDtypeStruct(shape, jnp.float32)
                          for _, shape in ecaches]),
            scratch_shapes=[pltpu.VMEM(shape, jnp.float32)
                            for _, shape in escratch],
            interpret=interpret,
        )(xf, *econsts.arrays, *[cache[nm] for nm in ecache_names])
        z, *enc_new = enc_out
        dec_out = pl.pallas_call(
            dec_kernel,
            grid=(n,),
            in_specs=([pl.BlockSpec((1, z_rows, z_lanes), lambda i: (i, 0, 0))]
                      + [vmem] * (n_dc + n_dcache)),
            out_specs=([pl.BlockSpec((1, out_rows, fold_d),
                                     lambda i: (i, 0, 0))]
                       + [vmem] * n_dcache),
            out_shape=([jax.ShapeDtypeStruct((n, out_rows, fold_d),
                                             jnp.float32)]
                       + [jax.ShapeDtypeStruct(shape, jnp.float32)
                          for _, shape in dcaches]),
            scratch_shapes=[pltpu.VMEM(shape, jnp.float32)
                            for _, shape in dscratch],
            interpret=interpret,
        )(z, *dconsts.arrays, *[cache[nm] for nm in dcache_names])
        yf, *dec_new = dec_out
        out = yf.reshape(n, t)
        new_cache = dict(zip(ecache_names, enc_new))
        new_cache.update(dict(zip(dcache_names, dec_new)))
        if use_pqc:
            return out, new_cache, z
        return out, new_cache

    return init_cache, run


def _phase_major_matrix(t_out, stride, t_ext):
    """(s*(t_out+1), t_ext) 0/1 gather into phase-major order: row
    p*(t_out+1)+i selects source row p + s*i."""
    m = np.zeros((stride * (t_out + 1), t_ext), np.float32)
    for p in range(stride):
        for i in range(t_out + 1):
            m[p * (t_out + 1) + i, p + stride * i] = 1.0
    return m


def _interleave_matrix(t_in, stride):
    """(s*t_in, s*t_in) 0/1 permutation: output (time-major) row r selects
    phase-major row (r % s) * t_in + r // s."""
    n = stride * t_in
    m = np.zeros((n, n), np.float32)
    r = np.arange(n)
    m[r, (r % stride) * t_in + r // stride] = 1.0
    return m


def make_mega_stream_batched(gen, params, chunk: int, batch: int,
                             weight_dtype=jnp.bfloat16,
                             interpret: bool = False, vq_state=None,
                             _debug_skip=None):
    """Multi-stream variant of :func:`make_mega_stream`: B concurrent
    independent streams per dispatch, still ONE Pallas kernel per side.

    Motivation: at batch 16 the XLA scan re-streams ~30 MB of weights from
    HBM every frame and pays per-op overheads ~50x per frame; here weights
    stay VMEM-resident across the whole (frames) grid and every residual-
    chain matmul runs on ``B*rows`` rows — 16x better MXU row utilisation
    at the deep levels, where a single stream has only 4-20 rows against
    512 channels.

    Layout: every streaming cache site becomes a ``(B, ctx+rows, lanes)``
    VMEM scratch; chain convs slice windows on the middle (time) axis and
    flatten ``(B, rn, C) -> (B*rn, C)`` for the MXU (stream boundaries
    never mix because each stream owns its context rows). The only
    per-stream work is one 0/1 permutation matmul per boundary conv:
    strided downsamples gather their input phases into phase-major order
    (``_phase_major_matrix``), transposed upsamples permute phase-major
    outputs back to time order (``_interleave_matrix``); the tap matmuls
    around them are batched flat.

    API: ``init_cache() -> {name: (B, ctx, lanes)}``;
    ``run(cache, frames (N, B, chunk)) -> (out (N, B, chunk), new_cache)``
    (+ ``codes (N, B, chunk/hop, L)`` with PQC). Per-frame semantics match
    ``gen.encode_step``/``decode_step`` per stream, like the single-stream
    kernel.

    Status (measured, v5e): the flagship topology compiles only up to
    B=4 (B=6 exceeds the 16 MB scoped-VMEM stack, B=8/16 OOM the Mosaic
    compiler) and runs 41.6 us/stream-frame there — slower than both the
    single-stream kernel (21.9 us) and the XLA batch path (12.9 us/stream
    at batch 16): the value-space staging the <8-sublane-row Mosaic
    workaround forces outweighs the extra MXU rows. Kept as a tested
    exact-equivalent experimental path; ``make_scan_stream`` uses XLA for
    ``batch > 1``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert gen.mode == "causal"
    assert gen.input_channels == 1
    assert chunk % gen.hop == 0 and chunk > 0
    assert batch >= 1
    bsz = batch
    use_pqc = gen.use_pqc
    if use_pqc:
        assert vq_state is not None, "PQC mega kernel needs the VQ state"
    wd = weight_dtype

    enc = gen.encoder
    dec = gen.decoder
    enc_p = params["encoder"]
    dec_p = params["decoder"]

    # ---------------- encoder build ----------------
    fold = enc.blocks[0].conv.stride
    assert 6 % fold == 0, f"first encoder stride {fold} must divide 6"
    for blk in enc.blocks:
        assert blk.conv.kernel_size == 2 * blk.conv.stride
        for u in blk.res_units:
            assert u.conv1.kernel_size == 7
    rows0 = chunk // fold

    econsts = _Bag()
    ecaches = []   # (name, (ctx, lanes)) -> cache arrays (B, ctx, lanes)
    escratch = []  # (name, 3d shape)

    # full-extent ops on 3-D (multi-page) refs crash the Mosaic lowering
    # when the ref has only 1-2 sublane rows; caches that small are padded
    # to 8 rows (real tail in the LAST ctx rows, zero prefix)
    def _pctx(ctx):
        return ctx if ctx >= 3 else 8

    def ecache(name, ctx, lanes, t_rows):
        ecaches.append((name, (ctx, lanes)))
        escratch.append((name, (bsz, _pctx(ctx), lanes), jnp.float32))
        return ctx

    def escratch_extra(name, shape, dtype=jnp.float32):
        escratch.append((name, shape, dtype))

    # input conv (k=7, 1 -> C0), folded output
    w_in = np.asarray(enc.conv.weight(enc_p["conv"]))  # (7, 1, C0)
    c0 = w_in.shape[2]
    a_in, ctx_in = _folded_input_basis(w_in, fold)
    econsts.add("in_A", a_in.astype(wd))
    ecache("cin", ctx_in, fold, rows0)
    escratch_extra("_h0", (bsz, rows0, fold * c0))

    enc_plan = []
    t_rows = rows0
    for bi, blk in enumerate(enc.blocks):
        bp = enc_p["blocks"][bi]
        s = blk.conv.stride
        cin_ch = blk.conv.in_channels
        cout_ch = blk.conv.out_channels
        wdn = np.asarray(blk.conv.weight(bp["conv"]))
        bdn = np.asarray(bp["conv"].get("b", np.zeros(cout_ch)))
        info = {"bi": bi, "stride": s, "folded": bi == 0}
        if bi == 0:
            fc = fold * cin_ch
            units = []
            for ui, u in enumerate(blk.res_units):
                m1, m2, pad_rows = _folded_unit_mats(u, bp["res"][ui], fold)
                econsts.add(f"e0u{ui}m1", m1.astype(wd))
                econsts.add(f"e0u{ui}m2", m2.astype(wd))
                units.append((f"e0u{ui}m1", f"e0u{ui}m2", pad_rows))
            info["units"] = units
            chain_ctx = sum(pr for _, _, pr in units)
            ecache("e0ch", chain_ctx, fc, t_rows)
            info["chain_ctx"] = chain_ctx
            assert s == fold
            econsts.add("e0dB",
                        _folded_downsample_basis(wdn, fold, cin_ch).astype(wd))
            econsts.add("e0db", bdn.reshape(1, -1).astype(np.float32))
            ecache("e0d", 2, fc, t_rows)
            t_out = t_rows
        else:
            units = []
            for ui, u in enumerate(blk.res_units):
                w1, w2 = _unit_weights(u, bp["res"][ui])
                econsts.add(f"e{bi}u{ui}w1", w1.astype(wd))
                econsts.add(f"e{bi}u{ui}w2", w2.astype(wd))
                units.append((f"e{bi}u{ui}w1", f"e{bi}u{ui}w2",
                              u.conv1.dilation))
            info["units"] = units
            chain_ctx = sum(6 * d for _, _, d in units)
            ecache(f"e{bi}ch", chain_ctx, cin_ch, t_rows)
            info["chain_ctx"] = chain_ctx
            t_out = t_rows // s
            t_ext = (2 * s - 1) + t_rows
            econsts.add(f"e{bi}dW", wdn.astype(wd))
            econsts.add(f"e{bi}db", bdn.reshape(1, -1).astype(np.float32))
            econsts.add(f"e{bi}P", _phase_major_matrix(t_out, s, t_ext))
            ecache(f"e{bi}d", 2 * s - 1, cin_ch, t_rows)
            escratch_extra(f"e{bi}G", (bsz, s * (t_out + 1), cin_ch))
        info["t_in"] = t_rows
        info["t_out"] = t_out
        enc_plan.append(info)
        t_rows = t_out
    z_rows, z_ch = t_rows, enc.out_channels

    if use_pqc:
        pr = gen.projector.conv
        assert pr.stride == 1 and pr.dilation == 1
        w_pr = np.asarray(pr.weight(params["projector"]["conv"]))
        k_pr = w_pr.shape[0]
        econsts.add("prW", w_pr.astype(wd))
        ecache("prj", k_pr - 1, z_ch, z_rows)
        embed = np.asarray(vq_state.embed)  # (L, D, K)
        n_books, code_dim, book_k = embed.shape
        for l in range(n_books):
            econsts.add(f"vqE{l}", embed[l].astype(np.float32))
            econsts.add(f"vqN{l}", np.sum(embed[l] ** 2, axis=0,
                                          keepdims=True).astype(np.float32))
            econsts.add(f"vqT{l}", embed[l].T.astype(np.float32))

    ecache_names = [n for n, _ in ecaches]
    n_ec, n_ecache = len(econsts.arrays), len(ecaches)

    def enc_kernel(*refs):
        x_ref = refs[0]
        cr = refs[1 : 1 + n_ec]
        ci = refs[1 + n_ec : 1 + n_ec + n_ecache]
        z_ref = refs[1 + n_ec + n_ecache]
        co = refs[2 + n_ec + n_ecache : 2 + n_ec + n_ecache + n_ecache]
        scratch = refs[2 + n_ec + 2 * n_ecache :]
        C = {n: cr[i] for i, n in enumerate(econsts.names)}
        S = {n: scratch[i] for i, (n, *_) in enumerate(escratch)}
        CI = {n: ci[i] for i, n in enumerate(ecache_names)}
        CO = {n: co[i] for i, n in enumerate(ecache_names)}
        i = pl.program_id(0)

        def site(name, ctx, x_val):
            """Streaming cache site, value-based: the Mosaic lowering
            crashes ('d >> 32 == 0' in lower_to_llo.cc) on 3-D multi-page
            ref loads/stores that are sub-extent, have <=8 lanes, or have
            only 1-2 rows — so the cache scratch holds the (row-padded)
            context and is only ever accessed full-extent; the [cache; x]
            composition, tail extraction and i==0 seeding happen in value
            space."""
            cbuf = S[name]
            pctx = cbuf.shape[1]
            cfull = jnp.where(i == 0, CI[name][...], cbuf[...])
            v = jnp.concatenate([cfull[:, pctx - ctx :, :], x_val], axis=1)
            tail = v[:, v.shape[1] - ctx :, :]
            if pctx != ctx:
                tail = jnp.concatenate(
                    [jnp.zeros((bsz, pctx - ctx, v.shape[2]), v.dtype),
                     tail], axis=1)
            cbuf[...] = tail
            CO[name][...] = tail
            return v

        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        def fw(v3, o, rn):
            """Window rows o:o+rn of every stream, flattened for the MXU
            (value-space reshape; page collapse is fine on values)."""
            return v3[:, o : o + rn, :].reshape(bsz * rn, v3.shape[2])

        def unflat(f2, rn):
            return f2.reshape(bsz, rn, f2.shape[1])

        # input conv (folded), page by page: lane counts below ~16 (the
        # 3-lane audio layout) crash the multi-page lowering, so the cin
        # cache site and the tap matmuls run 2-D per stream
        hbuf = S["_h0"]
        pcin = S["cin"].shape[1]
        for b in range(bsz):
            cb = jnp.where(i == 0, CI["cin"][b], S["cin"][b])
            vb = jnp.concatenate([cb[pcin - ctx_in :, :],
                                  x_ref[0, b].astype(jnp.float32)], axis=0)
            tb = vb[vb.shape[0] - ctx_in :, :]
            tb = jnp.concatenate(
                [jnp.zeros((pcin - ctx_in, vb.shape[1]), jnp.float32), tb],
                axis=0) if pcin != ctx_in else tb
            S["cin"][b] = tb
            CO["cin"][b] = tb
            vw = vb.astype(wd)
            hb = dot(vw[0:rows0], C["in_A"][0])
            for o in range(1, ctx_in + 1):
                hb += dot(vw[o : o + rows0], C["in_A"][o])
            hbuf[b] = hb
        h = hbuf[...]

        for info in enc_plan:
            bi, s = info["bi"], info["stride"]
            t_in, t_out = info["t_in"], info["t_out"]
            v = site("e0ch" if bi == 0 else f"e{bi}ch",
                     info["chain_ctx"], h)
            r = v.shape[1]
            if info["folded"]:
                for m1n, m2n, pad_rows in info["units"]:
                    rn = r - pad_rows
                    a = _elu(v).astype(wd)
                    m1 = C[m1n]
                    acc = dot(fw(a, 0, rn), m1[0])
                    for o in range(1, pad_rows + 1):
                        acc += dot(fw(a, o, rn), m1[o])
                    y = dot(_elu(acc).astype(wd), C[m2n][...])
                    v = v[:, pad_rows:, :] + unflat(y, rn)
                    r = rn
            else:
                for w1n, w2n, d in info["units"]:
                    pad = 6 * d
                    rn = r - pad
                    a = _elu(v).astype(wd)
                    w1 = C[w1n]
                    acc = dot(fw(a, 0, rn), w1[0])
                    for j in range(1, 7):
                        acc += dot(fw(a, j * d, rn), w1[j])
                    y = dot(_elu(acc).astype(wd), C[w2n][...])
                    v = v[:, pad:, :] + unflat(y, rn)
                    r = rn
            # downsample
            if info["folded"]:
                v = site("e0d", 2, v)
                vw = v.astype(wd)
                h = dot(fw(vw, 0, t_out), C["e0dB"][0])
                for o in (1, 2):
                    h += dot(fw(vw, o, t_out), C["e0dB"][o])
                h = unflat(h + C["e0db"][...], t_out)
            else:
                v = site(f"e{bi}d", 2 * s - 1, v)
                pmat = C[f"e{bi}P"][...]
                gbuf = S[f"e{bi}G"]
                for b in range(bsz):
                    gbuf[b] = dot(pmat, v[b])
                g3 = gbuf[...].astype(wd)
                w = C[f"e{bi}dW"]
                t1 = t_out + 1
                h = None
                for p in range(s):
                    gp = g3[:, p * t1 : (p + 1) * t1, :]
                    t = (dot(fw(gp, 0, t_out), w[p])
                         + dot(fw(gp, 1, t_out), w[s + p]))
                    h = t if h is None else h + t
                h = unflat(h + C[f"e{bi}db"][...], t_out)
        if not use_pqc:
            z_ref[0] = h
            return
        # projector conv
        v = site("prj", k_pr - 1, h)
        vw = v.astype(wd)
        z = dot(fw(vw, 0, z_rows), C["prW"][0])
        for j in range(1, k_pr):
            z += dot(fw(vw, j, z_rows), C["prW"][j])
        # residual VQ on (B*z_rows, D) rows
        residual = z
        nrows = bsz * z_rows
        lane = lax.broadcasted_iota(jnp.int32, (nrows, book_k), 1)
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
        idx_flat = jnp.concatenate(cols, axis=1)  # (bsz*z_rows, L) int32
        for b in range(bsz):  # 8-lane int32: store page by page
            z_ref[0, b] = idx_flat[b * z_rows : (b + 1) * z_rows, :]

    # ---------------- decoder build ----------------
    dconsts = _Bag()
    dcaches = []
    dscratch = []

    def dcache(name, ctx, lanes, t_rows):
        dcaches.append((name, (ctx, lanes)))
        dscratch.append((name, (bsz, _pctx(ctx), lanes), jnp.float32))

    def dscratch_extra(name, shape, dtype=jnp.float32):
        dscratch.append((name, shape, dtype))

    if use_pqc:
        for l in range(n_books):
            dconsts.add(f"cbk{l}", embed[l].T.astype(np.float32))
        d1 = dec.conv1
        assert d1.stride == 1 and d1.dilation == 1
        w_d1 = np.asarray(d1.weight(dec_p["conv1"]))
        k_d1 = w_d1.shape[0]
        dconsts.add("dc1W", w_d1.astype(wd))
        dcache("dc1", k_d1 - 1, code_dim, z_rows)

    dec_plan = []
    t_rows = z_rows
    n_blocks = len(dec.blocks)
    fold_d = dec.blocks[-1].conv.stride
    assert 6 % fold_d == 0, f"last decoder stride {fold_d} must divide 6"
    for bi, blk in enumerate(dec.blocks):
        bp = dec_p["blocks"][bi]
        s = blk.conv.stride
        assert blk.conv.kernel_size == 2 * s
        cpad = blk.conv.kernel_size - 1 - s
        cin_ch = blk.conv.in_channels
        cout_ch = blk.conv.out_channels
        wup = np.asarray(blk.conv.weight(bp["conv"]))
        bup = np.asarray(bp["conv"].get("b", np.zeros(cout_ch)))
        last = bi == n_blocks - 1
        info = {"bi": bi, "stride": s, "cpad": cpad, "last": last,
                "t_in": t_rows}
        dcache(f"d{bi}u", 1, cin_ch, t_rows)
        if last:
            fc = fold_d * cout_ch
            m0, m1 = _last_upsample_mats(wup, cpad, s)
            dconsts.add("duM0", m0.astype(wd))
            dconsts.add("duM1", m1.astype(wd))
            dconsts.add("dub", np.tile(bup, fold_d).reshape(1, -1)
                        .astype(np.float32))
            t_out = t_rows
            units = []
            for ui, u in enumerate(blk.res_units):
                m1u, m2u, pad_rows = _folded_unit_mats(u, bp["res"][ui],
                                                       fold_d)
                dconsts.add(f"d{bi}u{ui}m1", m1u.astype(wd))
                dconsts.add(f"d{bi}u{ui}m2", m2u.astype(wd))
                units.append((f"d{bi}u{ui}m1", f"d{bi}u{ui}m2", pad_rows))
            info["units"] = units
            chain_ctx = sum(pr for _, _, pr in units)
            dcache(f"d{bi}ch", chain_ctx, fc, t_out)
        else:
            dconsts.add(f"d{bi}uW", wup.astype(wd))
            dconsts.add(f"d{bi}ub", bup.reshape(1, -1).astype(np.float32))
            dconsts.add(f"d{bi}I", _interleave_matrix(t_rows, s))
            t_out = t_rows * s
            units = []
            for ui, u in enumerate(blk.res_units):
                w1, w2 = _unit_weights(u, bp["res"][ui])
                dconsts.add(f"d{bi}u{ui}w1", w1.astype(wd))
                dconsts.add(f"d{bi}u{ui}w2", w2.astype(wd))
                units.append((f"d{bi}u{ui}w1", f"d{bi}u{ui}w2",
                              u.conv1.dilation))
            info["units"] = units
            chain_ctx = sum(6 * d for _, _, d in units)
            dcache(f"d{bi}ch", chain_ctx, cout_ch, t_out)
            dscratch_extra(f"d{bi}Y", (bsz, t_out, cout_ch))
        info["chain_ctx"] = chain_ctx
        info["t_out"] = t_out
        dec_plan.append(info)
        t_rows = t_out

    w_out = np.asarray(dec.conv2.weight(dec_p["conv2"]))
    c_last = w_out.shape[1]
    o_out, ctx_out = _folded_output_basis(w_out, fold_d)
    dconsts.add("outO", o_out.astype(wd))
    out_rows = t_rows
    dcache("cout", ctx_out, fold_d * c_last, out_rows)

    dcache_names = [n for n, _ in dcaches]
    n_dc, n_dcache = len(dconsts.arrays), len(dcaches)

    def dec_kernel(*refs):
        z_ref = refs[0]
        cr = refs[1 : 1 + n_dc]
        ci = refs[1 + n_dc : 1 + n_dc + n_dcache]
        y_ref = refs[1 + n_dc + n_dcache]
        co = refs[2 + n_dc + n_dcache : 2 + n_dc + n_dcache + n_dcache]
        scratch = refs[2 + n_dc + 2 * n_dcache :]
        C = {n: cr[i] for i, n in enumerate(dconsts.names)}
        S = {n: scratch[i] for i, (n, *_) in enumerate(dscratch)}
        CI = {n: ci[i] for i, n in enumerate(dcache_names)}
        CO = {n: co[i] for i, n in enumerate(dcache_names)}
        i = pl.program_id(0)

        def site(name, ctx, x_val):
            """Streaming cache site, value-based: the Mosaic lowering
            crashes ('d >> 32 == 0' in lower_to_llo.cc) on 3-D multi-page
            ref loads/stores that are sub-extent, have <=8 lanes, or have
            only 1-2 rows — so the cache scratch holds the (row-padded)
            context and is only ever accessed full-extent; the [cache; x]
            composition, tail extraction and i==0 seeding happen in value
            space."""
            cbuf = S[name]
            pctx = cbuf.shape[1]
            cfull = jnp.where(i == 0, CI[name][...], cbuf[...])
            v = jnp.concatenate([cfull[:, pctx - ctx :, :], x_val], axis=1)
            tail = v[:, v.shape[1] - ctx :, :]
            if pctx != ctx:
                tail = jnp.concatenate(
                    [jnp.zeros((bsz, pctx - ctx, v.shape[2]), v.dtype),
                     tail], axis=1)
            cbuf[...] = tail
            CO[name][...] = tail
            return v

        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        def fw(v3, o, rn):
            """Window rows o:o+rn of every stream, flattened for the MXU
            (value-space reshape; page collapse is fine on values)."""
            return v3[:, o : o + rn, :].reshape(bsz * rn, v3.shape[2])

        def unflat(f2, rn):
            return f2.reshape(bsz, rn, f2.shape[1])

        if use_pqc:
            idx = jnp.concatenate([z_ref[0, b] for b in range(bsz)], axis=0)
            nrows = bsz * z_rows
            lane = lax.broadcasted_iota(jnp.int32, (nrows, book_k), 1)
            zq = None
            for l in range(n_books):
                ind = idx[:, l] - l * book_k
                onehot = (lane == ind[:, None]).astype(jnp.float32)
                q = dot(onehot, C[f"cbk{l}"][...])
                zq = q if zq is None else zq + q
            v = site("dc1", k_d1 - 1, unflat(zq, z_rows))
            vw = v.astype(wd)
            h = dot(fw(vw, 0, z_rows), C["dc1W"][0])
            for j in range(1, k_d1):
                h += dot(fw(vw, j, z_rows), C["dc1W"][j])
            h = unflat(h, z_rows)
        else:
            h = z_ref[0].astype(jnp.float32)
        for info in dec_plan:
            bi, s, cpad = info["bi"], info["stride"], info["cpad"]
            t_in, t_out = info["t_in"], info["t_out"]
            v = site(f"d{bi}u", 1, h)
            vw = v.astype(wd)
            if info["last"]:
                h = unflat(dot(fw(vw, 0, t_in), C["duM0"][...])
                           + dot(fw(vw, 1, t_in), C["duM1"][...])
                           + C["dub"][...], t_in)
            else:
                w = C[f"d{bi}uW"]
                phases = []
                for p in range(s):
                    yp = (dot(fw(vw, 0, t_in), w[cpad - p])
                          + dot(fw(vw, 1, t_in), w[cpad + s - p]))
                    phases.append(unflat(yp, t_in))
                pm = jnp.concatenate(phases, axis=1)  # phase-major (B,s*t_in,C)
                imat = C[f"d{bi}I"][...]
                ybuf = S[f"d{bi}Y"]
                for b in range(bsz):
                    ybuf[b] = dot(imat, pm[b])
                h = ybuf[...] + C[f"d{bi}ub"][...]
            v = site(f"d{bi}ch", info["chain_ctx"], h)
            r = v.shape[1]
            if info["last"]:
                for m1n, m2n, pad_rows in info["units"]:
                    rn = r - pad_rows
                    a = _elu(v).astype(wd)
                    m1 = C[m1n]
                    acc = dot(fw(a, 0, rn), m1[0])
                    for o in range(1, pad_rows + 1):
                        acc += dot(fw(a, o, rn), m1[o])
                    y = dot(_elu(acc).astype(wd), C[m2n][...])
                    v = v[:, pad_rows:, :] + unflat(y, rn)
                    r = rn
            else:
                for w1n, w2n, d in info["units"]:
                    pad = 6 * d
                    rn = r - pad
                    a = _elu(v).astype(wd)
                    w1 = C[w1n]
                    acc = dot(fw(a, 0, rn), w1[0])
                    for j in range(1, 7):
                        acc += dot(fw(a, j * d, rn), w1[j])
                    y = dot(_elu(acc).astype(wd), C[w2n][...])
                    v = v[:, pad:, :] + unflat(y, rn)
                    r = rn
            h = v

        v = site("cout", ctx_out, h)
        vw = v.astype(wd)
        y = dot(fw(vw, 0, out_rows), C["outO"][0])
        for o in range(1, ctx_out + 1):
            y += dot(fw(vw, o, out_rows), C["outO"][o])
        for b in range(bsz):  # 3-lane audio: store page by page
            y_ref[0, b] = y[b * out_rows : (b + 1) * out_rows, :]

    # ---------------- wrappers ----------------
    def init_cache():
        cache = {}
        for name, (ctx, lanes) in ecaches + dcaches:
            cache[name] = jnp.zeros((bsz, _pctx(ctx), lanes), jnp.float32)
        return cache

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    if use_pqc:
        z_lanes, z_dtype = n_books, jnp.int32
    else:
        z_lanes, z_dtype = z_ch, jnp.float32

    def run(cache, frames):
        n, b, t = frames.shape
        assert t == chunk and b == bsz, (frames.shape, bsz, chunk)
        xf = frames.reshape(n, bsz, rows0, fold)
        enc_out = pl.pallas_call(
            enc_kernel,
            grid=(n,),
            in_specs=([pl.BlockSpec((1, bsz, rows0, fold),
                                    lambda i: (i, 0, 0, 0))]
                      + [vmem] * (n_ec + n_ecache)),
            out_specs=([pl.BlockSpec((1, bsz, z_rows, z_lanes),
                                     lambda i: (i, 0, 0, 0))]
                       + [vmem] * n_ecache),
            out_shape=([jax.ShapeDtypeStruct((n, bsz, z_rows, z_lanes),
                                             z_dtype)]
                       + [jax.ShapeDtypeStruct((bsz, _pctx(c), l),
                                               jnp.float32)
                          for _, (c, l) in ecaches]),
            scratch_shapes=[pltpu.VMEM(shape, dt)
                            for _, shape, dt in escratch],
            interpret=interpret,
        )(xf, *econsts.arrays, *[cache[nm] for nm in ecache_names])
        z, *enc_new = enc_out
        if _debug_skip == "dec":
            return z, dict(zip(ecache_names, enc_new))
        dec_out = pl.pallas_call(
            dec_kernel,
            grid=(n,),
            in_specs=([pl.BlockSpec((1, bsz, z_rows, z_lanes),
                                    lambda i: (i, 0, 0, 0))]
                      + [vmem] * (n_dc + n_dcache)),
            out_specs=([pl.BlockSpec((1, bsz, out_rows, fold_d),
                                     lambda i: (i, 0, 0, 0))]
                       + [vmem] * n_dcache),
            out_shape=([jax.ShapeDtypeStruct((n, bsz, out_rows, fold_d),
                                             jnp.float32)]
                       + [jax.ShapeDtypeStruct((bsz, _pctx(c), l),
                                               jnp.float32)
                          for _, (c, l) in dcaches]),
            scratch_shapes=[pltpu.VMEM(shape, dt)
                            for _, shape, dt in dscratch],
            interpret=interpret,
        )(z, *dconsts.arrays, *[cache[nm] for nm in dcache_names])
        yf, *dec_new = dec_out
        out = yf.reshape(n, bsz, t)
        new_cache = dict(zip(ecache_names, enc_new))
        new_cache.update(dict(zip(dcache_names, dec_new)))
        if use_pqc:
            return out, new_cache, z
        return out, new_cache

    return init_cache, run
