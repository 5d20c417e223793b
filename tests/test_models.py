"""Model-level tests: shapes, causality, streaming equivalence, and parity
against the upstream torch AudioDec generator with transplanted weights."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dl_speech_enhancement_tpu.models import (
    AudioDecGenerator,
    HiFiGANGenerator,
    HiFiGANDiscriminator,
    UnivNetDiscriminator,
)
from dl_speech_enhancement_tpu.nn.vq import VQState

from conftest import requires_reference, add_reference_to_path


SMALL = dict(
    encode_channels=8,
    decode_channels=8,
    code_dim=16,
    codebook_num=2,
    codebook_size=32,
    enc_ratios=(2, 4),
    dec_ratios=(4, 2),
    enc_strides=(3, 4),
    dec_strides=(4, 3),
)


def test_generator_shapes_pqc(rng):
    gen = AudioDecGenerator(**SMALL, use_pqc=True)
    params, vq_state = gen.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 240, 1)).astype(np.float32))
    y, zq, z, vqloss, ppl, new_state = gen(params, vq_state, x, train=True)
    assert y.shape == (2, 240, 1)
    assert z.shape == (2, 20, 16)  # hop = 12
    assert zq.shape == z.shape
    assert vqloss.shape == (2,) and ppl.shape == (2,)
    assert np.all(np.isfinite(np.asarray(y)))
    # EMA state actually updated
    assert not np.allclose(np.asarray(new_state.embed), np.asarray(vq_state.embed))


def test_generator_shapes_without_pqc(rng):
    gen = AudioDecGenerator(**SMALL, use_pqc=False)
    params, vq_state = gen.init(jax.random.PRNGKey(0))
    assert vq_state is None
    x = jnp.asarray(rng.standard_normal((2, 240, 1)).astype(np.float32))
    y, zq, z, vqloss, ppl, _ = gen(params, None, x, train=True)
    assert y.shape == (2, 240, 1)
    assert z.shape == (2, 20, 32)  # encoder out channels = 8 * ratio 4
    np.testing.assert_array_equal(np.asarray(vqloss), 0)


def test_generator_noncausal_mode(rng):
    """mode='noncausal' (the reference's offline-training variant,
    models/utils.py:13-15 asserts streaming needs causal)."""
    gen = AudioDecGenerator(**SMALL, mode="noncausal", use_pqc=True)
    params, vqs = gen.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 240, 1)).astype(np.float32))
    y, zq, z, *_ = gen(params, vqs, x, train=True)
    assert y.shape == (2, 240, 1) and z.shape == (2, 20, 16)
    # noncausal layers have no streaming step
    assert not hasattr(gen.encoder.conv, "step")


def test_generator_causality(rng):
    """Output at time t must not depend on input at time > t."""
    gen = AudioDecGenerator(**SMALL, use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(1))
    x1 = rng.standard_normal((1, 240, 1)).astype(np.float32)
    x2 = x1.copy()
    x2[:, 120:] += rng.standard_normal((1, 120, 1)).astype(np.float32)
    y1, *_ = gen(params, None, jnp.asarray(x1), train=False)
    y2, *_ = gen(params, None, jnp.asarray(x2), train=False)
    # hop = 12; the decoder's transposed convs look one *code frame* back, so
    # outputs strictly before the changed frame's window are identical
    safe = 120 - 12 * 2
    np.testing.assert_allclose(
        np.asarray(y1)[:, :safe], np.asarray(y2)[:, :safe], atol=1e-5
    )
    assert np.abs(np.asarray(y1)[:, 120:] - np.asarray(y2)[:, 120:]).max() > 1e-4


def _stream_generator(gen, params, vq_state, xj, chunk):
    """Run the split-phase streaming pipeline with a given chunk size."""
    cache = gen.init_cache(xj.shape[0])
    flat_cb = gen.flat_codebook(vq_state)
    outs = []
    for i in range(xj.shape[1] // chunk):
        seg = xj[:, i * chunk : (i + 1) * chunk]
        zc, enc_cache = gen.encode_step(params, cache, seg)
        cache.update(enc_cache)
        idx = gen.quantize(vq_state, zc)
        zqc = gen.lookup(flat_cb, idx)
        y, dec_cache = gen.decode_step(params, cache, zqc)
        cache.update(dec_cache)
        outs.append(y)
    return np.concatenate([np.asarray(o) for o in outs], axis=1)


def test_generator_streaming_chunk_size_invariance(rng):
    """Streaming output must not depend on the chunk size (cache correctness).

    Offline ``__call__`` differs from streaming only in the transposed convs'
    first-frame warmup (replication-pad vs zero cache) — the same intended
    discrepancy as the reference, which primes streaming buffers with a zero
    receptive field instead (AudioDec.py:151-157)."""
    gen = AudioDecGenerator(**SMALL, use_pqc=True)
    params, vq_state = gen.init(jax.random.PRNGKey(2))
    hop = gen.hop  # 12
    T = hop * 24
    x = rng.standard_normal((1, T, 1)).astype(np.float32)
    xj = jnp.asarray(x)

    one_shot = _stream_generator(gen, params, vq_state, xj, chunk=T)
    small = _stream_generator(gen, params, vq_state, xj, chunk=hop * 2)
    np.testing.assert_allclose(small, one_shot, atol=1e-4)

    # and warmup equivalence vs offline: after a zero lead-in longer than the
    # receptive field (32 code frames — encoder biases make zero input emit
    # nonzero codes, so the decoder needs full warmup), streaming matches the
    # offline inference path.
    lead = hop * 32
    xz = np.zeros((1, lead + T, 1), np.float32)
    xz[:, lead:] = x
    e = gen.encoder(params["encoder"], jnp.asarray(xz))
    z = gen.projector(params["projector"], e)
    zq, _ = gen.quantizer.inference(vq_state, z)
    offline = np.asarray(gen.decoder(params["decoder"], zq))
    streamed = _stream_generator(gen, params, vq_state, jnp.asarray(xz), chunk=hop * 2)
    np.testing.assert_allclose(streamed[:, lead:], offline[:, lead:], atol=1e-4)


@requires_reference
def test_generator_matches_upstream_with_transplanted_weights(rng):
    """Load the upstream torch AudioDec generator, copy its weights into our
    functional params, and require identical outputs (inference path)."""
    add_reference_to_path()
    from models.autoencoder.AudioDec import Generator as TorchGen

    tg = TorchGen(
        input_channels=1, output_channels=1, encode_channels=8,
        decode_channels=8, code_dim=16, codebook_num=2, codebook_size=32,
        enc_ratios=(2, 4), dec_ratios=(4, 2), enc_strides=(3, 4),
        dec_strides=(4, 3), mode="causal",
    )
    tg.eval()

    gen = AudioDecGenerator(**SMALL, use_pqc=True)
    params, vq_state = gen.init(jax.random.PRNGKey(0))

    def conv_w(m):  # torch Conv1d (out,in,k) -> (k,in,out)
        return jnp.asarray(m.weight.detach().numpy().transpose(2, 1, 0))

    def deconv_w(m):  # torch ConvTranspose1d (in,out,k) -> flipped (k,in,out)
        return jnp.asarray(m.weight.detach().numpy()[:, :, ::-1].transpose(2, 0, 1).copy())

    def conv_params(tmod, has_bias):
        p = {"w": conv_w(tmod.conv)}
        if has_bias:
            p["b"] = jnp.asarray(tmod.conv.bias.detach().numpy())
        return p

    def res_unit_params(tu):
        return {
            "conv1": {"w": conv_w(tu.conv1.conv)},
            "conv2": {"w": jnp.asarray(tu.conv2.weight.detach().numpy().transpose(2, 1, 0))},
        }

    # encoder
    enc = {"conv": {"w": conv_w(tg.encoder.conv.conv)}, "blocks": []}
    for blk in tg.encoder.conv_blocks:
        enc["blocks"].append({
            "res": [res_unit_params(u) for u in blk.res_units],
            "conv": {
                "w": conv_w(blk.conv.conv),
                "b": jnp.asarray(blk.conv.conv.bias.detach().numpy()),
            },
        })
    # projector
    proj = {"conv": {"w": conv_w(tg.projector.project.conv)}}
    # decoder
    dec = {"conv1": {"w": conv_w(tg.decoder.conv1.conv)}, "blocks": [],
           "conv2": {"w": conv_w(tg.decoder.conv2.conv)}}
    for blk in tg.decoder.conv_blocks:
        dec["blocks"].append({
            "conv": {
                "w": deconv_w(blk.conv.deconv),
                "b": jnp.asarray(blk.conv.deconv.bias.detach().numpy()),
            },
            "res": [res_unit_params(u) for u in blk.res_units],
        })
    params = {"encoder": enc, "projector": proj, "decoder": dec}

    embeds = np.stack([l.embed.numpy() for l in tg.quantizer.codebook.layers])
    vq_state = VQState(
        jnp.asarray(embeds),
        jnp.zeros(embeds.shape[::2], jnp.float32)[..., : embeds.shape[2]],
        jnp.asarray(embeds),
    )
    vq_state = VQState(
        jnp.asarray(embeds),
        jnp.zeros((embeds.shape[0], embeds.shape[2]), jnp.float32),
        jnp.asarray(embeds),
    )

    x = rng.standard_normal((2, 240, 1)).astype(np.float32) * 0.3
    with torch.no_grad():
        # use the inference path (no EMA update) for an exact comparison
        e_t = tg.encoder(torch.tensor(x.transpose(0, 2, 1)))
        z_t = tg.projector(e_t)
        zq_t, _ = tg.quantizer.inference(z_t)
        y_t = tg.decoder(zq_t).numpy()

    e = gen.encoder(params["encoder"], jnp.asarray(x))
    z = gen.projector(params["projector"], e)
    zq, _ = gen.quantizer.inference(vq_state, z)
    y = gen.decoder(params["decoder"], zq)

    np.testing.assert_allclose(
        np.asarray(z).transpose(0, 2, 1), z_t.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), y_t, atol=1e-4
    )


def test_hifigan_generator_shapes_and_streaming(rng):
    gen = HiFiGANGenerator(
        in_channels=16, out_channels=1, channels=64, kernel_size=7,
        upsample_scales=(3, 4), upsample_kernel_sizes=(6, 8),
        resblock_kernel_sizes=(3, 7), resblock_dilations=((1, 3), (1, 3)),
    )
    p = gen.init(jax.random.PRNGKey(0))
    c = jnp.asarray(rng.standard_normal((2, 20, 16)).astype(np.float32))
    y = gen(p, c)
    assert y.shape == (2, 240, 1)
    assert np.all(np.abs(np.asarray(y)) <= 1.0)

    # chunk-size invariance of the streaming decode (offline __call__ differs
    # only in first-frame replicate-pad warmup, as in the reference)
    chunk, n_chunks = 5, 6
    T = chunk * n_chunks
    cj = jnp.asarray(rng.standard_normal((1, T, 16)).astype(np.float32))

    def run(chunk_size):
        cache = gen.init_cache(1)
        outs = []
        for i in range(T // chunk_size):
            y, cache = gen.step(p, cache, cj[:, i * chunk_size : (i + 1) * chunk_size])
            outs.append(np.asarray(y))
        return np.concatenate(outs, axis=1)

    np.testing.assert_allclose(run(chunk), run(T), atol=1e-5)


def test_hifigan_generator_group_conv_variant(rng):
    # AudioDec v1 decoder trick: 1 kernel size + groups>1 -> MultiGroupConv1d
    gen = HiFiGANGenerator(
        in_channels=16, out_channels=1, channels=64, kernel_size=7,
        upsample_scales=(3, 4), upsample_kernel_sizes=(6, 8),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3, 5),), groups=3,
    )
    from dl_speech_enhancement_tpu.models.hifigan import MultiGroupConv1d
    assert isinstance(gen.blocks[0], MultiGroupConv1d)
    p = gen.init(jax.random.PRNGKey(0))
    c = jnp.asarray(rng.standard_normal((1, 10, 16)).astype(np.float32))
    y = gen(p, c)
    assert y.shape == (1, 120, 1)


def test_hifigan_discriminator_outputs(rng):
    disc = HiFiGANDiscriminator(
        scales=2,
        scale_discriminator_params={
            "kernel_sizes": [15, 41, 5, 3], "channels": 16,
            "max_downsample_channels": 64, "max_groups": 16,
            "downsample_scales": [2, 2, 1],
        },
        periods=(2, 3),
        period_discriminator_params={
            "kernel_sizes": [5, 3], "channels": 8,
            "downsample_scales": [3, 3, 1], "max_downsample_channels": 32,
        },
    )
    p = disc.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 600, 1)).astype(np.float32))
    outs = disc(p, x)
    assert len(outs) == 4  # 2 scales + 2 periods
    for feats in outs:
        assert isinstance(feats, list) and len(feats) >= 2
    # stereo flattening: (B, T, 2) -> (2B, T, 1)
    x2 = jnp.asarray(rng.standard_normal((2, 600, 2)).astype(np.float32))
    outs2 = disc(p, x2)
    assert outs2[0][0].shape[0] == 4


def test_univnet_discriminator_outputs(rng):
    disc = UnivNetDiscriminator(
        fft_sizes=(256, 128), hop_sizes=(32, 16), win_lengths=(128, 64),
        spectral_discriminator_params={"channels": 8},
        periods=(2, 3),
        period_discriminator_params={
            "kernel_sizes": [5, 3], "channels": 8,
            "downsample_scales": [3, 3, 1], "max_downsample_channels": 32,
        },
    )
    p = disc.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((1, 1024, 1)).astype(np.float32))
    outs = disc(p, x)
    assert len(outs) == 4  # 2 resolutions + 2 periods


def test_derived_receptive_length():
    """The streaming receptive field is derived from the architecture and
    reproduces the reference's documented constant: 7209 samples for
    symAD_vctk_48000_hop300 (utils/audiodec.py:23); the without-PQC denoiser
    loses the projector's 2-code-frame extension (-> 6609)."""
    assert AudioDecGenerator(use_pqc=True).receptive_length == 7209
    assert AudioDecGenerator(use_pqc=False).receptive_length == 6609
    # small topology: hand-walked value
    g = AudioDecGenerator(**SMALL, use_pqc=False)
    # enc: conv k7 (+6); blk1@1: res +78, down k6 s3; blk2@3: res +78, down k8 s4
    r = 1
    r = (r - 1) * 4 + 8
    r += 78
    r = (r - 1) * 3 + 6
    r += 78
    r += 6
    assert g.receptive_length == r


def test_prime_rounds_receptive_up_to_hop():
    """prime() must cover the FULL receptive field: 7209 -> 7500 samples
    (25 code frames), matching the reference's hardcoded priming length
    (utils/audiodec.py:24)."""
    gen = AudioDecGenerator(**SMALL, use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(0))
    # receptive_length is not hop-aligned for this topology
    assert gen.receptive_length % gen.hop != 0
    cache = gen.prime(params, None)  # must not raise (hop-aligned internally)
    y, _ = gen.decode_step(
        params, cache,
        jnp.zeros((1, 2, gen.encoder.out_channels), jnp.float32))
    assert np.all(np.isfinite(np.asarray(y)))


def test_msd_norm_flags_wiring():
    """follow_official_norm stays a config-compat no-op (the reference's own
    application is a silent no-op on Conv1d — every reference config trained
    without norms); use_spectral_norm/use_weight_norm in discriminator_params
    apply REAL parametrizations, unlike upstream."""
    from dl_speech_enhancement_tpu.models.discriminator import (
        HiFiGANMultiScaleDiscriminator,
    )

    base = {
        "kernel_sizes": [15, 41, 5, 3], "channels": 8,
        "max_downsample_channels": 32, "max_groups": 4,
        "downsample_scales": [2, 2, 1],
    }
    # reference-config behavior: flag on, still plain convs
    msd = HiFiGANMultiScaleDiscriminator(
        scales=2, follow_official_norm=True, discriminator_params=base)
    assert all(not l.spectral_norm and not l.weight_norm
               for d in msd.discriminators for l in d.layers)
    # real spectral norm, opt-in
    msd_sn = HiFiGANMultiScaleDiscriminator(
        scales=2,
        discriminator_params={**base, "use_spectral_norm": True})
    assert all(l.spectral_norm and not l.weight_norm
               for d in msd_sn.discriminators for l in d.layers)
    p = msd_sn.init(jax.random.PRNGKey(0))
    # the spectral-norm parametrization is STATELESS (run-to-convergence
    # power iteration in the forward, no persistent `u` buffer) so the param
    # structure is identical with the flag on or off and checkpoints load
    # across the setting — pin that contract
    assert set(p["discriminators"][0]["layers"][0]) == {"w", "b"}
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 256, 1)).astype(np.float32))
    outs = msd_sn(p, x)
    assert len(outs) == 2 and np.all(np.isfinite(np.asarray(outs[0][-1])))
    # real weight norm, opt-in
    msd_wn = HiFiGANMultiScaleDiscriminator(
        scales=2, discriminator_params={**base, "use_weight_norm": True})
    assert all(l.weight_norm and not l.spectral_norm
               for d in msd_wn.discriminators for l in d.layers)


def test_remat_generator_matches_gradients(rng):
    """remat=True must change memory behavior only: identical forward and
    identical gradients to the plain generator (same params)."""
    from dl_speech_enhancement_tpu.models import AudioDecGenerator

    kw = dict(use_pqc=False, encode_channels=4, decode_channels=4,
              enc_ratios=(2, 4), enc_strides=(2, 2),
              dec_ratios=(4, 2), dec_strides=(2, 2), code_dim=8)
    gen = AudioDecGenerator(**kw)
    gen_r = AudioDecGenerator(**kw, remat=True)
    params, _ = gen.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 64, 1)).astype(np.float32))

    def loss(g):
        def f(p):
            y, *_ = g(p, None, x, train=True)
            return jnp.sum(jnp.square(y))
        return f

    y0, *_ = gen(params, None, x, train=True)
    y1, *_ = gen_r(params, None, x, train=True)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    g0 = jax.grad(loss(gen))(params)
    g1 = jax.grad(loss(gen_r))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
