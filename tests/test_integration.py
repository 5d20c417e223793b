"""Integration: end-to-end gradient flow — a short overfit run must denoise.

A tiny without-PQC denoiser overfits one fixed (noisy, clean) pair; SNR of
the output vs clean must climb from ~0 dB to >15 dB within 400 Adam steps.
This exercises the full encoder/decoder stack, the functional parameter
plumbing and the optimizer wiring with a real optimization signal (not just
"loss went down a bit")."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from dl_speech_enhancement_tpu.models import AudioDecGenerator
from dl_speech_enhancement_tpu.train.optim import build_optimizer
from dl_speech_enhancement_tpu.losses import signal_noise_ratio


def test_overfit_denoises_single_batch(rng):
    sr, T = 4800, 1200
    gen = AudioDecGenerator(
        encode_channels=8, decode_channels=8, code_dim=16, codebook_num=2,
        codebook_size=32, enc_ratios=(2, 4), dec_ratios=(4, 2),
        enc_strides=(3, 4), dec_strides=(4, 3), use_pqc=False,
    )
    params, _ = gen.init(jax.random.PRNGKey(0))
    opt = build_optimizer("Adam", {"lr": 3e-3, "betas": [0.9, 0.99]})
    opt_state = opt.init(params)

    t = np.arange(T) / sr
    clean = (0.5 * np.sin(2 * np.pi * 250 * t)
             * (0.5 + 0.5 * np.sin(2 * np.pi * 2 * t)))[None, :, None]
    clean = jnp.asarray(clean.astype(np.float32))
    noisy = clean + 0.15 * jnp.asarray(
        rng.standard_normal(clean.shape).astype(np.float32))

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            y, *_ = gen(p, None, noisy, train=True)
            return jnp.mean(jnp.square(y - clean))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def eval_snr(p):
        y, *_ = gen(p, None, noisy, train=False)
        return float(signal_noise_ratio(y, clean))

    snr_before = eval_snr(params)
    loss0 = None
    for i in range(400):
        params, opt_state, loss = step(params, opt_state)
        if loss0 is None:
            loss0 = float(loss)
    snr_after = eval_snr(params)

    assert float(loss) < loss0 * 0.05, f"loss: {loss0} -> {float(loss)}"
    assert snr_before < 5.0
    assert snr_after > 15.0, f"SNR: {snr_before:.2f} -> {snr_after:.2f} dB"
