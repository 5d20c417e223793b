"""Data-parallel tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dl_speech_enhancement_tpu.models import (
    AudioDecGenerator, HiFiGANDiscriminator,
)
from dl_speech_enhancement_tpu.parallel import (
    make_mesh, shard_batch, shard_train_state,
)
from dl_speech_enhancement_tpu.train.denoise_course import make_course_steps
from dl_speech_enhancement_tpu.train.optim import build_optimizer

SMALL = dict(
    encode_channels=8, decode_channels=8, code_dim=16, codebook_num=2,
    codebook_size=32, enc_ratios=(2, 4), dec_ratios=(4, 2),
    enc_strides=(3, 4), dec_strides=(4, 3),
)

CONFIG = dict(
    mel_loss_params=dict(fs=4800, fft_sizes=[256], hop_sizes=[60],
                         win_lengths=[256], num_mels=20, fmin=0, fmax=2400,
                         log_base=None),
    lambda_mel_loss=45.0, lambda_snr_loss=1.0, lambda_adv=1.0,
    lambda_feat_match=2.0,
    generator_adv_loss_params={"average_by_discriminators": False},
    discriminator_adv_loss_params={"average_by_discriminators": False},
)

TINY_DISC = dict(
    scales=2,
    scale_discriminator_params={
        "kernel_sizes": [15, 41, 5, 3], "channels": 8,
        "max_downsample_channels": 32, "max_groups": 4,
        "downsample_scales": [2, 2, 1],
    },
    periods=(2, 3),
    period_discriminator_params={
        "kernel_sizes": [5, 3], "channels": 4,
        "downsample_scales": [3, 3, 1], "max_downsample_channels": 16,
    },
)


def _setup():
    gen = AudioDecGenerator(**SMALL, use_pqc=False)
    disc = HiFiGANDiscriminator(**TINY_DISC)
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    params_g, _ = gen.init(kg)
    params_d = disc.init(kd)
    opt_g = build_optimizer("Adam", {"lr": 1e-3, "betas": [0.5, 0.9]})
    opt_d = build_optimizer("Adam", {"lr": 1e-3, "betas": [0.5, 0.9]})
    state = {
        "params_generator": params_g,
        "params_discriminator": params_d,
        "opt_generator": opt_g.init(params_g),
        "opt_discriminator": opt_d.init(params_d),
    }
    steps = make_course_steps(gen, disc, CONFIG, opt_g, opt_d)
    return state, steps


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8}


def test_dp_step_matches_single_device():
    """The same global batch must give the same loss and updated params
    whether sharded over 8 devices or run on one (SPMD correctness)."""
    rng = np.random.default_rng(0)
    mixed = rng.standard_normal((8, 240, 1)).astype(np.float32)
    clean = rng.standard_normal((8, 240, 1)).astype(np.float32)

    state1, steps1 = _setup()
    s1, g1, d1, _, _ = steps1["train_disc"](state1, jnp.asarray(mixed),
                                            jnp.asarray(clean))

    state2, steps2 = _setup()
    mesh = make_mesh(8)
    state2 = shard_train_state(mesh, state2)
    s2, g2, d2, _, _ = steps2["train_disc"](
        state2, shard_batch(mesh, mixed), shard_batch(mesh, clean)
    )
    np.testing.assert_allclose(float(g1), float(g2), rtol=2e-4)
    np.testing.assert_allclose(float(d1), float(d2), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1["params_generator"]),
                    jax.tree_util.tree_leaves(s2["params_generator"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_vq_ema_dp_step_matches_single_device(rng):
    """Autoencoder stage-1 (VQ EMA training) under a sharded batch must give
    the same codebook update and loss as single-device — the EMA statistics
    are global-batch reductions."""
    from dl_speech_enhancement_tpu.train.workloads.autoencoder import (
        make_autoencoder_steps,
    )

    config = dict(
        use_mel_loss=True,
        mel_loss_params=dict(fs=4800, fft_sizes=[256], hop_sizes=[60],
                             win_lengths=[256], num_mels=20, fmin=0,
                             fmax=2400, log_base=None),
        lambda_mel_loss=45.0, lambda_vq_loss=1.0, lambda_adv=1.0,
        lambda_feat_match=2.0, use_feat_match_loss=False,
        generator_adv_loss_params={"average_by_discriminators": False},
        discriminator_adv_loss_params={"average_by_discriminators": False},
    )
    from dl_speech_enhancement_tpu.train.optim import build_optimizer
    opt_g = build_optimizer("Adam", {"lr": 1e-3, "betas": [0.5, 0.9]})
    opt_d = build_optimizer("Adam", {"lr": 1e-3, "betas": [0.5, 0.9]})

    def setup():
        gen = AudioDecGenerator(**SMALL, use_pqc=True)
        disc = HiFiGANDiscriminator(**TINY_DISC)
        kg, kd = jax.random.split(jax.random.PRNGKey(0))
        pg, vqs = gen.init(kg)
        pd = disc.init(kd)
        state = {"params_generator": pg, "params_discriminator": pd,
                 "vq_state": vqs, "opt_generator": opt_g.init(pg),
                 "opt_discriminator": opt_d.init(pd)}
        return state, make_autoencoder_steps(gen, disc, config, opt_g, opt_d)

    x = np.random.default_rng(3).standard_normal((8, 240, 1)).astype(np.float32)

    state1, steps1 = setup()
    s1, frags1, _ = steps1["gen_stage1"](state1, jnp.asarray(x))

    state2, steps2 = setup()
    mesh = make_mesh(8)
    state2 = shard_train_state(mesh, state2)
    s2, frags2, _ = steps2["gen_stage1"](state2, shard_batch(mesh, x))

    np.testing.assert_allclose(float(frags1["generator_loss"]),
                               float(frags2["generator_loss"]), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(s1["vq_state"].embed),
                               np.asarray(s2["vq_state"].embed), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1["vq_state"].cluster_size),
                               np.asarray(s2["vq_state"].cluster_size),
                               atol=1e-5)


def test_vq_ema_psum_under_shard_map(rng):
    """The explicit axis_name/psum path (for shard_map users) reduces EMA
    statistics across shards identically to a global-batch update."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from dl_speech_enhancement_tpu.nn import VectorQuantizeEMA

    dim, K = 8, 16
    vq = VectorQuantizeEMA(dim, K)
    state = vq.init(jax.random.PRNGKey(0))
    x = rng.standard_normal((8, 10, dim)).astype(np.float32)

    _, global_state, _, _ = vq(state, jnp.asarray(x), train=True)

    mesh = make_mesh(8)

    def local_update(state, x_shard):
        q, new_state, loss, ppl = vq(state, x_shard, train=True,
                                     axis_name="data")
        return new_state

    sharded = shard_map(
        local_update, mesh=mesh,
        in_specs=(P(), P("data")), out_specs=P(),
    )(state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(sharded.embed),
                               np.asarray(global_state.embed), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded.cluster_size),
                               np.asarray(global_state.cluster_size), atol=1e-5)


def test_parallel_long_audio_matches_serial(rng):
    """Overlap-discard chunked inference over the mesh == full forward."""
    from dl_speech_enhancement_tpu.parallel.long_audio import parallel_denoise

    gen = AudioDecGenerator(**SMALL, use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(4))
    hop = gen.hop  # 12
    t = hop * 64 + hop * 40 * 8  # context + 8 chunks of 40 frames
    audio = rng.standard_normal((t, 1)).astype(np.float32) * 0.3

    @jax.jit
    def forward(x):
        y, *_ = gen(params, None, x, train=False)
        return y

    serial = np.asarray(forward(jnp.asarray(audio[None])))[0]
    mesh = make_mesh(8)
    parallel = parallel_denoise(gen, params, None, audio, n_chunks=8,
                                context=hop * 64, mesh=mesh)
    assert parallel.shape == serial.shape
    # beyond chunk 0's replicate-pad warmup the chunks must match exactly
    np.testing.assert_allclose(parallel, serial, atol=2e-4)


def test_parallel_long_audio_pqc(rng):
    """Chunk-parallel inference through the full PQC codec (encode -> VQ ->
    decode) matches the serial forward."""
    from dl_speech_enhancement_tpu.parallel.long_audio import parallel_denoise

    gen = AudioDecGenerator(**SMALL, use_pqc=True)
    params, vqs = gen.init(jax.random.PRNGKey(6))
    hop = gen.hop
    t = hop * 64 + hop * 30 * 4
    audio = rng.standard_normal((t, 1)).astype(np.float32) * 0.3

    @jax.jit
    def forward(x):
        y, *_ = gen(params, vqs, x, train=False)
        return y

    serial = np.asarray(forward(jnp.asarray(audio[None])))[0]
    mesh = make_mesh(4)
    parallel = parallel_denoise(gen, params, vqs, audio, n_chunks=4,
                                context=hop * 64, mesh=mesh)
    np.testing.assert_allclose(parallel, serial, atol=2e-4)


def test_dp_scales_batch():
    """A sharded 16-sample batch runs fine (2 per device)."""
    state, steps = _setup()
    mesh = make_mesh(8)
    state = shard_train_state(mesh, state)
    rng = np.random.default_rng(1)
    mixed = shard_batch(mesh, rng.standard_normal((16, 240, 1)).astype(np.float32))
    clean = shard_batch(mesh, rng.standard_normal((16, 240, 1)).astype(np.float32))
    new_state, g, d, _, _ = steps["train_disc"](state, mixed, clean)
    assert np.isfinite(float(g)) and np.isfinite(float(d))


# ------------------------------------------------------- sharded serving

@pytest.mark.parametrize("use_pqc", [False, True])
def test_sharded_stream_matches_single_device(rng, use_pqc):
    """16 streams sharded over 8 devices must be bit-identical to the
    single-device batched scan stream."""
    from dl_speech_enhancement_tpu.parallel import make_sharded_stream
    from dl_speech_enhancement_tpu.stream.runtime import make_scan_stream

    gen = AudioDecGenerator(**SMALL, use_pqc=use_pqc)
    params, vq_state = gen.init(jax.random.PRNGKey(1))
    hop = gen.hop
    B, chunk = 16, hop * 2
    x = rng.standard_normal((B, chunk * 6, 1)).astype(np.float32) * 0.3

    single = make_scan_stream(gen, params, vq_state, batch=B, backend="xla")
    ref_cache = single.init_cache()
    frames = jnp.asarray(
        x.reshape(B, -1, chunk, 1).transpose(1, 0, 2, 3))
    ref, _ = single(ref_cache, frames)

    mesh = make_mesh(8)
    run = make_sharded_stream(gen, params, vq_state, mesh=mesh, batch=B)
    # compile ONCE (AOT) and reuse: the collective-free assertion and the
    # execution share the executable (jit's cache is separate)
    sharded_frames = run.shard_frames(np.asarray(frames))
    compiled = run.lower(run.init_cache(), sharded_frames).compile()
    # the fleet program contains NO cross-device collectives — streams
    # are independent, scaling over ICI is linear by construction
    txt = compiled.as_text()
    for op in ("all-reduce", "all-gather", "collective-permute",
               "all-to-all", "reduce-scatter"):
        assert op not in txt, op
    got, new_cache = compiled(run.init_cache(), sharded_frames)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # cache stays stream-sharded across dispatches (no silent resharding)
    leaf = jax.tree_util.tree_leaves(new_cache)[0]
    assert len(leaf.sharding.device_set) == 8


def test_sharded_stream_rejects_indivisible_batch():
    from dl_speech_enhancement_tpu.parallel import make_sharded_stream

    gen = AudioDecGenerator(**SMALL, use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="divide"):
        make_sharded_stream(gen, params, mesh=make_mesh(8), batch=12)


def _assert_collective_free(compiled):
    txt = compiled.as_text()
    for op in ("all-reduce", "all-gather", "collective-permute",
               "all-to-all", "reduce-scatter"):
        assert op not in txt, op


def test_sharded_stream_vocoder_rx_matches_single_device(rng):
    """A v0-v3-style paired fleet (symAD analyzer tx -> HiFiGAN vocoder rx)
    sharded over 8 devices must be bit-identical to the same step
    composition on one device, with no collectives in the program."""
    from dl_speech_enhancement_tpu.models import HiFiGANGenerator
    from dl_speech_enhancement_tpu.parallel import make_sharded_stream

    gen = AudioDecGenerator(**SMALL, use_pqc=True)
    params, vq_state = gen.init(jax.random.PRNGKey(1))
    voc = HiFiGANGenerator(
        in_channels=SMALL["code_dim"], channels=16,
        upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),))
    assert voc.total_upsample == gen.hop
    v_params = voc.init(jax.random.PRNGKey(2))

    hop = gen.hop
    B, chunk = 16, hop * 2
    x = rng.standard_normal((B, chunk * 5, 1)).astype(np.float32) * 0.3
    frames = jnp.asarray(x.reshape(B, -1, chunk, 1).transpose(1, 0, 2, 3))

    # single-device reference: the same tx->wire->rx composition, scanned
    flat_cb = gen.flat_codebook(vq_state)

    def ref_step(cache, frame):
        tx_cache, rx_cache = cache
        z, enc_cache = gen.encode_step(params, tx_cache, frame)
        idx = gen.quantize(vq_state, z)
        zq = gen.lookup(flat_cb, idx)
        y, new_rx = voc.step(v_params, rx_cache, zq)
        new_tx = dict(tx_cache)
        new_tx.update(enc_cache)
        return (new_tx, new_rx), y

    tx0 = {k: v for k, v in gen.init_cache(B).items()
           if k in ("encoder", "projector")}
    _, ref = jax.lax.scan(ref_step, (tx0, voc.init_cache(B)), frames)

    run = make_sharded_stream(gen, params, vq_state, mesh=make_mesh(8),
                              batch=B, vocoder=voc, vocoder_params=v_params)
    sharded = run.shard_frames(np.asarray(frames))
    compiled = run.lower(run.init_cache(), sharded).compile()
    _assert_collective_free(compiled)
    got, new_cache = compiled(run.init_cache(), sharded)
    assert got.shape == (frames.shape[0], B, chunk, 1)
    # the vocoder's convs lower differently for the per-device batch of 2
    # than for the full batch of 16 (float reassociation only — observed
    # max |diff| 3e-8); the codec-only fleet happens to stay bit-exact
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-6)
    leaf = jax.tree_util.tree_leaves(new_cache)[0]
    assert len(leaf.sharding.device_set) == 8


def test_sharded_stream_asymmetric_codec_rx(rng):
    """Asymmetric codec-rx extension mode: the tx codec quantizes with its
    own quantizer, a DIFFERENT rx codec looks the indices up in its own
    codebook and decodes. (No reference preset maps to this — the reference
    always decodes with the tx codebook; it's the mismatched-checkpoint
    serving mode.)"""
    from dl_speech_enhancement_tpu.parallel import make_sharded_stream

    gen = AudioDecGenerator(**SMALL, use_pqc=True)
    params, vq_state = gen.init(jax.random.PRNGKey(3))
    rx_gen = AudioDecGenerator(**SMALL, use_pqc=True)
    rx_params, rx_vq = rx_gen.init(jax.random.PRNGKey(4))

    hop = gen.hop
    B, chunk = 8, hop * 2
    x = rng.standard_normal((B, chunk * 4, 1)).astype(np.float32) * 0.3
    frames = jnp.asarray(x.reshape(B, -1, chunk, 1).transpose(1, 0, 2, 3))

    rx_flat_cb = rx_gen.flat_codebook(rx_vq)

    def ref_step(cache, frame):
        tx_cache, rx_cache = cache
        z, enc_cache = gen.encode_step(params, tx_cache, frame)
        idx = gen.quantize(vq_state, z)
        zq = rx_gen.lookup(rx_flat_cb, idx)
        y, dec_cache = rx_gen.decode_step(rx_params, rx_cache, zq)
        new_tx = dict(tx_cache)
        new_tx.update(enc_cache)
        new_rx = dict(rx_cache)
        new_rx.update(dec_cache)
        return (new_tx, new_rx), y

    tx0 = {k: v for k, v in gen.init_cache(B).items()
           if k in ("encoder", "projector")}
    rx0 = {"decoder": rx_gen.init_cache(B)["decoder"]}
    _, ref = jax.lax.scan(ref_step, (tx0, rx0), frames)

    run = make_sharded_stream(
        gen, params, vq_state, mesh=make_mesh(8), batch=B,
        rx_gen=rx_gen, rx_params=rx_params, rx_vq_state=rx_vq)
    sharded = run.shard_frames(np.asarray(frames))
    compiled = run.lower(run.init_cache(), sharded).compile()
    _assert_collective_free(compiled)
    got, _ = compiled(run.init_cache(), sharded)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_sharded_stream_rejects_conflicting_rx():
    from dl_speech_enhancement_tpu.parallel import make_sharded_stream

    gen = AudioDecGenerator(**SMALL, use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="not both"):
        make_sharded_stream(gen, params, mesh=make_mesh(8), batch=8,
                            vocoder=object(), vocoder_params={},
                            rx_gen=gen, rx_params=params)
    with pytest.raises(ValueError, match="together"):
        make_sharded_stream(gen, params, mesh=make_mesh(8), batch=8,
                            vocoder=object())


# ---------------------------------------------------------------------------
# config-driven DP: trainers build their mesh from `parallel.data_devices`
# (cli/train.py --dp / cli/train_denoise.py --dp set the same key)


def _sine_batch(rng, b, t=240):
    ph = rng.uniform(0, np.pi, (b, 1, 1))
    tt = np.arange(t)[None, :, None] / 48.0
    return (np.sin(2 * np.pi * tt + ph) * 0.5).astype(np.float32)


TRAINER_CONFIG = dict(
    CONFIG, outdir=None, use_mel_loss=True, lambda_vq_loss=1.0,
    use_feat_match_loss=True,
    generator_optimizer_params={"lr": 1e-3, "betas": [0.5, 0.9]},
    discriminator_optimizer_params={"lr": 1e-3, "betas": [0.5, 0.9]},
    generator_grad_norm=-1, discriminator_grad_norm=-1,
    save_interval_steps=10**9, eval_interval_steps=10**9,
    log_interval_steps=10**9, train_max_steps=10, batch_size=8, seed=0,
    start_steps={"generator": 0, "discriminator": 2},
)


def test_trainer_dp_from_config_matches_single_device(tmp_path, rng):
    """An autoencoder Trainer built with `parallel.data_devices: -1` takes
    the same steps as the single-device one: 2 stage-1 steps (VQ-EMA psum
    in play) then a stage-2 + discriminator step, identical params/EMA."""
    from dl_speech_enhancement_tpu.train.workloads.autoencoder import Trainer

    batches = [_sine_batch(rng, 8) for _ in range(3)]

    def run(parallel):
        config = dict(TRAINER_CONFIG, outdir=str(tmp_path))
        if parallel:
            config["parallel"] = {"data_devices": -1}
        gen = AudioDecGenerator(**SMALL, use_pqc=True)
        disc = HiFiGANDiscriminator(**TINY_DISC)
        tr = Trainer(0, 0, {"train": batches}, gen, disc, config,
                     key=jax.random.PRNGKey(0))
        if parallel:
            assert tr.mesh is not None and tr.mesh.shape["data"] == 8
            leaf = jax.tree_util.tree_leaves(tr.state)[0]
            assert len(leaf.sharding.device_set) == 8
        for b in batches:
            tr._train_step(b)
        return (jax.tree_util.tree_map(np.asarray,
                                       tr.state["params_generator"]),
                np.asarray(tr.state["vq_state"].embed),
                dict(tr.total_train_loss))

    p_dp, vq_dp, losses_dp = run(True)
    p_1, vq_1, losses_1 = run(False)
    for a, b in zip(jax.tree_util.tree_leaves(p_dp),
                    jax.tree_util.tree_leaves(p_1)):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(vq_dp, vq_1, atol=5e-5)
    assert set(losses_dp) == set(losses_1)
    for k in losses_1:
        np.testing.assert_allclose(losses_dp[k], losses_1[k],
                                   rtol=5e-3, atol=1e-5)


def test_trainer_dp_rejects_indivisible_batch(tmp_path, rng):
    from dl_speech_enhancement_tpu.train.workloads.denoise import Trainer

    config = dict(TRAINER_CONFIG, outdir=str(tmp_path),
                  parallel={"data_devices": 8})
    gen = AudioDecGenerator(**SMALL, use_pqc=True)
    tr = Trainer(0, 0, {}, gen, config, key=jax.random.PRNGKey(0))
    b = (_sine_batch(rng, 3), _sine_batch(rng, 3))
    with pytest.raises(ValueError, match="divisible"):
        tr._train_step(b)


def test_course_loop_dp_from_config(tmp_path, rng):
    """The course loop with `parallel.data_devices` produces the same
    training trajectory as single-device (same seed => same host-side
    mixing), including the epoch-gated discriminator phase."""
    from dl_speech_enhancement_tpu.train.denoise_course import (
        train_denoise_course,
    )

    base = dict(
        sample_rate=4800, epochs=2, epoch_to_enable_discriminator=1,
        noise_dropout_rate=0.0, noise_dropout_rate_decay=0.0,
        epoch_to_enable_noise_dropout_decay=0, seed=0, step=0,
        mel_loss_params=CONFIG["mel_loss_params"], lambda_mel_loss=45.0,
        lambda_snr_loss=1.0, lambda_adv=1.0, lambda_feat_match=2.0,
        generator_adv_loss_params={"average_by_discriminators": False},
        discriminator_adv_loss_params={"average_by_discriminators": False},
        generator_optimizer_params={"lr": 1e-3, "betas": [0.5, 0.9]},
        discriminator_optimizer_params={"lr": 1e-3, "betas": [0.5, 0.9]},
        generator_grad_norm=-1, discriminator_grad_norm=-1, batch_size=8,
    )
    clean = [_sine_batch(rng, 8) for _ in range(2)]
    noise = [0.3 * rng.standard_normal((8, 240, 1)).astype(np.float32)
             for _ in range(2)]

    def run(parallel):
        config = dict(base)
        if parallel:
            config["parallel"] = {"data_devices": 8}
        gen = AudioDecGenerator(**SMALL, use_pqc=False)
        disc = HiFiGANDiscriminator(**TINY_DISC)
        state, history = train_denoise_course(
            config, gen, disc, (clean, noise), (clean[:1], noise[:1]),
            environment="LAPTOP", job_dir=str(tmp_path),
            key=jax.random.PRNGKey(0))
        return (jax.tree_util.tree_map(np.asarray,
                                       state["params_generator"]),
                history)

    p_dp, h_dp = run(True)
    p_1, h_1 = run(False)
    for a, b in zip(jax.tree_util.tree_leaves(p_dp),
                    jax.tree_util.tree_leaves(p_1)):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-3)
    assert h_dp[1]["train_dis"] != 0.0
    np.testing.assert_allclose(h_dp[-1]["val_gen"], h_1[-1]["val_gen"],
                               rtol=5e-3)
