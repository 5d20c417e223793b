"""Sequence-parallel (time-sharded) training on the virtual CPU mesh.

Pins parallel/time_shard.py: the halo-exchange forward equals the offline
full-signal forward beyond the stream-start transient, and the sharded
train step (loss, updated params, advanced VQ EMA state) is step-for-step
identical to the single-device blocked-objective implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dl_speech_enhancement_tpu.models import AudioDecGenerator
from dl_speech_enhancement_tpu.parallel.time_shard import (
    blocked_reference_step,
    decoder_receptive_frames,
    make_time_sharded_steps,
    time_sharded_forward,
)
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
    lambda_mel_loss=45.0, lambda_snr_loss=1.0, lambda_vq_loss=1.0,
)


def _time_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("time",))


def _clip(rng, gen, n_shards, frames_per_shard, batch=2):
    t = n_shards * frames_per_shard * gen.hop
    return rng.standard_normal((batch, t, 1)).astype(np.float32) * 0.3


def _shard(mesh, x, spec):
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))


@pytest.mark.parametrize("use_pqc", [False, True])
def test_forward_matches_offline_beyond_warmup(rng, use_pqc):
    """Beyond the first receptive_length samples (the zero-cache stream
    start), the time-sharded forward equals the full-signal forward."""
    gen = AudioDecGenerator(**SMALL, use_pqc=use_pqc)
    params, vq_state = gen.init(jax.random.PRNGKey(0))
    mesh = _time_mesh(4)
    # shards comfortably longer than both halos AND the warm bound below
    frames = 2 * max(-(-gen.receptive_length // gen.hop),
                     decoder_receptive_frames(gen.decoder)) + 8
    x = _clip(rng, gen, 4, frames)

    fwd = time_sharded_forward(gen, mesh)
    y_sh = np.asarray(fwd(params, vq_state, _shard(mesh, x, P(None, "time"))))

    y_full = np.asarray(gen(params, vq_state, jnp.asarray(x), train=False)[0])
    # the startup transient (module docstring): shard 0 starts from the
    # zero-context stream state, whose intermediate activations over the
    # zero halo are f(0) != 0 while the offline forward pads true zeros at
    # every layer. The transient is bounded by one tx receptive field of
    # code frames (measured: it dies out well inside it) plus the decoder
    # receptive spread of those frames; everything beyond is exact.
    he_frames = -(-gen.receptive_length // gen.hop)
    warm = (he_frames + 2 * decoder_receptive_frames(gen.decoder)) * gen.hop
    assert warm < x.shape[1] // 2, "test clip too short for the warm bound"
    np.testing.assert_allclose(y_sh[:, warm:], y_full[:, warm:],
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("use_pqc", [False, True])
def test_train_step_matches_blocked_reference(rng, use_pqc):
    """Loss, updated params and (for PQC) the advanced EMA codebook of the
    sharded step match the single-device blocked-objective step."""
    gen = AudioDecGenerator(**SMALL, use_pqc=use_pqc)
    params, vq_state = gen.init(jax.random.PRNGKey(1))
    opt = build_optimizer("Adam", {"lr": 1e-3, "betas": [0.5, 0.9]},
                          grad_norm=10.0)
    n_shards = 4
    mesh = _time_mesh(n_shards)
    frames = max(-(-gen.receptive_length // gen.hop),
                 decoder_receptive_frames(gen.decoder)) + 6

    def fresh_state():
        s = {"params_generator": params,
             "opt_generator": opt.init(params)}
        if use_pqc:
            s["vq_state"] = vq_state
        return jax.tree.map(jnp.array, s)

    steps = make_time_sharded_steps(gen, CONFIG, opt, mesh)
    ref_step = blocked_reference_step(gen, CONFIG, opt, n_shards)

    s_sh, s_ref = fresh_state(), fresh_state()
    for i in range(3):
        x = _clip(rng, gen, n_shards, frames)
        target = x + 0.05 * rng.standard_normal(x.shape).astype(np.float32)
        xs = _shard(mesh, x, P(None, "time"))
        ts = _shard(mesh, target, P(None, "time"))
        s_sh, loss_sh, frags = steps["train"](s_sh, xs, ts)
        s_ref, loss_ref, _ = ref_step(s_ref, jnp.asarray(x),
                                      jnp.asarray(target))
        # per-step loss trajectory (f32 reduction-order noise only; for PQC
        # a near-tie codeword flip from ~1e-7 EMA drift after the first
        # update could widen this — hence the exact check after step 1)
        np.testing.assert_allclose(float(loss_sh), float(loss_ref),
                                   rtol=1e-4)
        assert np.isfinite(float(frags["mel_loss"]))
        if i == 0:
            pa = jax.tree_util.tree_leaves(s_sh["params_generator"])
            pb = jax.tree_util.tree_leaves(s_ref["params_generator"])
            for a, b in zip(pa, pb):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-5)
            if use_pqc:
                np.testing.assert_allclose(
                    np.asarray(s_sh["vq_state"].embed),
                    np.asarray(s_ref["vq_state"].embed), atol=1e-5)
                np.testing.assert_allclose(
                    np.asarray(s_sh["vq_state"].cluster_size),
                    np.asarray(s_ref["vq_state"].cluster_size), atol=1e-5)


def test_eval_matches_train_loss_semantics(rng):
    """eval() computes the same blocked objective (no EMA advance)."""
    gen = AudioDecGenerator(**SMALL, use_pqc=True)
    params, vq_state = gen.init(jax.random.PRNGKey(2))
    opt = build_optimizer("Adam", {"lr": 1e-3, "betas": [0.5, 0.9]})
    mesh = _time_mesh(4)
    frames = max(-(-gen.receptive_length // gen.hop),
                 decoder_receptive_frames(gen.decoder)) + 6
    x = _clip(rng, gen, 4, frames)
    steps = make_time_sharded_steps(gen, CONFIG, opt, mesh)
    state = {"params_generator": params, "opt_generator": opt.init(params),
             "vq_state": vq_state}
    loss = steps["eval"](state,
                         _shard(mesh, x, P(None, "time")),
                         _shard(mesh, x, P(None, "time")))
    assert np.isfinite(float(loss))


def test_2d_mesh_data_and_time(rng):
    """(data, time) 2-D mesh: batch and sequence sharded simultaneously;
    still step-identical to the single-device blocked objective."""
    gen = AudioDecGenerator(**SMALL, use_pqc=True)
    params, vq_state = gen.init(jax.random.PRNGKey(3))
    opt = build_optimizer("Adam", {"lr": 1e-3, "betas": [0.5, 0.9]},
                          grad_norm=10.0)
    n_time = 4
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, n_time),
                ("data", "time"))
    frames = max(-(-gen.receptive_length // gen.hop),
                 decoder_receptive_frames(gen.decoder)) + 6
    x = _clip(rng, gen, n_time, frames, batch=4)
    target = x + 0.05 * rng.standard_normal(x.shape).astype(np.float32)

    steps = make_time_sharded_steps(gen, CONFIG, opt, mesh,
                                    batch_axis="data")
    ref_step = blocked_reference_step(gen, CONFIG, opt, n_time)

    state = {"params_generator": jax.tree.map(jnp.array, params),
             "opt_generator": opt.init(params),
             "vq_state": jax.tree.map(jnp.array, vq_state)}
    ref_state = {"params_generator": jax.tree.map(jnp.array, params),
                 "opt_generator": opt.init(params),
                 "vq_state": jax.tree.map(jnp.array, vq_state)}

    xs = _shard(mesh, x, P("data", "time"))
    ts = _shard(mesh, target, P("data", "time"))
    state, loss, _ = steps["train"](state, xs, ts)
    ref_state, ref_loss, _ = ref_step(ref_state, jnp.asarray(x),
                                      jnp.asarray(target))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    pa = jax.tree_util.tree_leaves(state["params_generator"])
    pb = jax.tree_util.tree_leaves(ref_state["params_generator"])
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(state["vq_state"].embed),
                               np.asarray(ref_state["vq_state"].embed),
                               atol=1e-5)


def test_shard_too_short_raises(rng):
    gen = AudioDecGenerator(**SMALL, use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(4))
    mesh = _time_mesh(8)
    fwd = time_sharded_forward(gen, mesh)
    x = rng.standard_normal((1, 8 * gen.hop, 1)).astype(np.float32)
    with pytest.raises(ValueError, match="shorter than the halo"):
        fwd(params, None, _shard(mesh, x, P(None, "time")))


def test_train_step_gradients_exact_under_sgd(rng):
    """Raw-gradient equivalence with a SCALE-SENSITIVE optimizer: plain SGD
    updates from the sharded step must match the single-device blocked
    step. Adam + global-norm clipping are invariant to uniform gradient
    scaling, so the trajectory tests above cannot catch a mesh-size factor
    on the gradients (the psum-vs-pmean reduction bug); this test can."""
    import optax

    gen = AudioDecGenerator(**SMALL, use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(5))
    opt = optax.sgd(1e-2)
    n_shards = 4
    mesh = _time_mesh(n_shards)
    frames = max(-(-gen.receptive_length // gen.hop),
                 decoder_receptive_frames(gen.decoder)) + 6
    x = _clip(rng, gen, n_shards, frames)
    target = x + 0.05 * rng.standard_normal(x.shape).astype(np.float32)

    steps = make_time_sharded_steps(gen, CONFIG, opt, mesh)
    ref_step = blocked_reference_step(gen, CONFIG, opt, n_shards)

    state = {"params_generator": jax.tree.map(jnp.array, params),
             "opt_generator": opt.init(params)}
    ref_state = {"params_generator": jax.tree.map(jnp.array, params),
                 "opt_generator": opt.init(params)}
    state, loss, _ = steps["train"](
        state, _shard(mesh, x, P(None, "time")),
        _shard(mesh, target, P(None, "time")))
    ref_state, ref_loss, _ = ref_step(ref_state, jnp.asarray(x),
                                      jnp.asarray(target))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state["params_generator"]),
                    jax.tree_util.tree_leaves(ref_state["params_generator"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-4)
