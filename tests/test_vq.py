"""Golden tests: EMA VQ / residual VQ vs the reference torch implementation."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dl_speech_enhancement_tpu.nn import VectorQuantizeEMA, ResidualVQ
from dl_speech_enhancement_tpu.nn.vq import VQState

from conftest import requires_reference, add_reference_to_path


def make_state(embed: np.ndarray) -> VQState:
    e = jnp.asarray(embed)
    return VQState(e, jnp.zeros((e.shape[1],), jnp.float32), e)


def torch_vq_reference(embed, x, decay=0.8, eps=1e-5, train=True):
    """Reference layers/vq_module.py:61-88 semantics re-derived in torch."""
    embed = torch.tensor(embed)
    cluster_size = torch.zeros(embed.shape[1])
    embed_avg = embed.clone()
    flat = torch.tensor(x).reshape(-1, embed.shape[0])
    dist = (
        flat.pow(2).sum(1, keepdim=True) - 2 * flat @ embed + embed.pow(2).sum(0, keepdim=True)
    )
    _, ind = (-dist).max(1)
    onehot = torch.nn.functional.one_hot(ind, embed.shape[1]).float()
    quantize = torch.nn.functional.embedding(
        ind.view(*x.shape[:-1]), embed.transpose(0, 1)
    )
    if train:
        cluster_size = cluster_size * decay + onehot.sum(0) * (1 - decay)
        embed_sum = flat.transpose(0, 1) @ onehot
        embed_avg = embed_avg * decay + embed_sum * (1 - decay)
        n = cluster_size.sum()
        smoothed = (cluster_size + eps) / (n + embed.shape[1] * eps) * n
        new_embed = embed_avg / smoothed.unsqueeze(0)
    else:
        new_embed = embed
    loss = torch.nn.functional.mse_loss(quantize, torch.tensor(x))
    avg_probs = onehot.mean(0)
    ppl = torch.exp(-torch.sum(avg_probs * torch.log(avg_probs + 1e-10)))
    return ind.numpy(), quantize.numpy(), new_embed.numpy(), loss.item(), ppl.item()


def test_vq_assignment_quantize_and_ema(rng):
    dim, K = 16, 32
    embed = rng.standard_normal((dim, K)).astype(np.float32)
    x = rng.standard_normal((4, 10, dim)).astype(np.float32)
    ind_ref, q_ref, new_embed_ref, loss_ref, ppl_ref = torch_vq_reference(embed, x)

    vq = VectorQuantizeEMA(dim, K)
    q, new_state, loss, ppl = vq(make_state(embed), jnp.asarray(x), train=True)
    # straight-through value == quantize value
    np.testing.assert_allclose(np.asarray(q), q_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.embed), new_embed_ref, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(float(loss), loss_ref, rtol=1e-5)
    np.testing.assert_allclose(float(ppl), ppl_ref, rtol=1e-4)


def test_vq_straight_through_gradient(rng):
    dim, K = 8, 16
    vq = VectorQuantizeEMA(dim, K)
    state = vq.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((32, dim)).astype(np.float32))

    def f(x):
        q, _, _, _ = vq(state, x, train=False)
        return jnp.sum(q * jnp.arange(dim, dtype=jnp.float32))

    g = jax.grad(f)(x)
    # straight-through: dq/dx == identity
    np.testing.assert_allclose(
        np.asarray(g), np.broadcast_to(np.arange(dim, dtype=np.float32), (32, dim)), atol=1e-6
    )


def test_rvq_only_first_layer_gradient(rng):
    """The non-detached residual trick (vq_module.py:126-129): encoder gradient
    comes only from the first quantizer layer."""
    dim, K, L = 8, 16, 4
    rvq = ResidualVQ(dim, num_quantizers=L, codebook_size=K)
    state = rvq.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((16, dim)).astype(np.float32))

    def f(x):
        q_out, _, _, _ = rvq(state, x, train=False)
        return jnp.sum(q_out * jnp.arange(dim, dtype=jnp.float32))

    g = jax.grad(f)(x)
    np.testing.assert_allclose(
        np.asarray(g), np.broadcast_to(np.arange(dim, dtype=np.float32), (16, dim)), atol=1e-6
    )


def test_rvq_lookup_roundtrip(rng):
    dim, K, L = 8, 16, 4
    rvq = ResidualVQ(dim, num_quantizers=L, codebook_size=K)
    state = rvq.init(jax.random.PRNGKey(3))
    x = jnp.asarray(rng.standard_normal((1, 12, dim)).astype(np.float32))
    q_out, idx = rvq.forward_index(state, x, flatten_idx=True)
    assert idx.shape == (L, 1, 12)
    flat = rvq.flat_codebook(state)
    assert flat.shape == (L * K, dim)
    looked = rvq.lookup(flat, idx)
    np.testing.assert_allclose(np.asarray(looked), np.asarray(q_out), atol=1e-5)


@requires_reference
def test_rvq_matches_upstream(rng):
    add_reference_to_path()
    from layers.vq_module import ResidualVQ as TorchRVQ

    dim, K, L = 16, 64, 3
    trvq = TorchRVQ(dim=dim, num_quantizers=L, codebook_size=K)
    trvq.eval()
    x = rng.standard_normal((2, 20, dim)).astype(np.float32)
    with torch.no_grad():
        q_ref, losses_ref, ppl_ref = trvq(torch.tensor(x))

    rvq = ResidualVQ(dim, num_quantizers=L, codebook_size=K)
    embeds = [l.embed.numpy() for l in trvq.layers]
    state = VQState(
        jnp.asarray(np.stack(embeds)),
        jnp.zeros((L, K), jnp.float32),
        jnp.asarray(np.stack(embeds)),
    )
    q, _, losses, ppls = rvq(state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(q), q_ref.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(losses), losses_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ppls), ppl_ref.numpy(), rtol=1e-3)

    # index path + lookup (upstream requires initial() to set codebook_size)
    trvq.initial()
    with torch.no_grad():
        q_ref_i, idx_ref = trvq.forward_index(torch.tensor(x), flatten_idx=True)
    q_i, idx = rvq.forward_index(state, jnp.asarray(x), flatten_idx=True)
    np.testing.assert_array_equal(np.asarray(idx), idx_ref.numpy())
