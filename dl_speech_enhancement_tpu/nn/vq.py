"""EMA vector quantization + residual VQ, as functional state transitions.

Reference semantics (layers/vq_module.py, golden-tested in tests/test_vq.py):

- ``VectorQuantizeEMA``: nearest-neighbour assignment by squared L2 on a
  ``(dim, n_embed)`` codebook; EMA codebook update with decay 0.8 + Laplace
  smoothing (vq_module.py:61-88); commitment MSE loss; straight-through
  estimator; perplexity of the assignment histogram.
- ``ResidualVQ``: cascade of quantizers where the residual subtraction keeps
  the non-detached straight-through path, so only the **first** layer's
  gradient reaches the encoder (the deliberate AudioDec choice documented at
  vq_module.py:126-129). ``forward_index`` quantizes without EMA updates,
  optionally flattening indices by ``+ i * codebook_size`` for transmission
  (vq_module.py:136-149); ``lookup`` sums embeddings across quantizers
  (vq_module.py:151-161).

TPU-native design: the torch in-place buffer mutations become an explicit
``state`` pytree ``{embed, cluster_size, embed_avg}`` stacked over quantizer
layers and scanned with ``lax.scan`` — a single fused compiled loop instead
of N module calls. Under data parallelism the EMA statistics are reduced with
``psum`` over the mesh axis (pass ``axis_name``) so every replica applies the
same codebook update.

The hot path — ``distances = |x|^2 - 2 x E + |E|^2`` — is a (N, dim) x
(dim, K) matmul that XLA tiles onto the MXU; K=1024 and dim=64 align with
the 128-lane layout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class VQState(NamedTuple):
    embed: jax.Array  # (dim, n_embed) or (L, dim, n_embed) when stacked
    cluster_size: jax.Array  # (n_embed,) or (L, n_embed)
    embed_avg: jax.Array  # same shape as embed


def _quantize_core(embed: jax.Array, flat: jax.Array):
    """Nearest-codeword assignment. flat: (N, dim); embed: (dim, K)."""
    dist = (
        jnp.sum(jnp.square(flat), axis=1, keepdims=True)
        - 2.0 * jnp.dot(flat, embed, preferred_element_type=jnp.float32)
        + jnp.sum(jnp.square(embed), axis=0, keepdims=True)
    )
    ind = jnp.argmin(dist, axis=1)
    quantized = jnp.take(embed.T, ind, axis=0)
    return ind, quantized


class VectorQuantizeEMA:
    """Single EMA-codebook vector quantizer (functional)."""

    def __init__(
        self,
        dim: int,
        codebook_size: int,
        decay: float = 0.8,
        commitment: float = 1.0,
        eps: float = 1e-5,
    ):
        self.dim = dim
        self.n_embed = codebook_size
        self.decay = decay
        self.commitment = commitment
        self.eps = eps

    def init(self, key) -> VQState:
        embed = jax.random.normal(key, (self.dim, self.n_embed), jnp.float32)
        return VQState(embed, jnp.zeros((self.n_embed,), jnp.float32), embed)

    def _ema_update(self, state: VQState, flat, onehot, axis_name=None) -> VQState:
        counts = jnp.sum(onehot, axis=0)
        embed_sum = jnp.dot(flat.T, onehot, preferred_element_type=jnp.float32)
        if axis_name is not None:
            counts = lax.psum(counts, axis_name)
            embed_sum = lax.psum(embed_sum, axis_name)
        d = self.decay
        cluster_size = state.cluster_size * d + counts * (1.0 - d)
        embed_avg = state.embed_avg * d + embed_sum * (1.0 - d)
        n = jnp.sum(cluster_size)
        smoothed = (cluster_size + self.eps) / (n + self.n_embed * self.eps) * n
        embed = embed_avg / smoothed[None, :]
        return VQState(embed, cluster_size, embed_avg)

    def __call__(self, state: VQState, x: jax.Array, train: bool, axis_name=None):
        """x: (..., dim). Returns (q_st, new_state, loss, perplexity)."""
        flat = x.reshape(-1, self.dim)
        ind, quantized = _quantize_core(state.embed, flat)
        onehot = jax.nn.one_hot(ind, self.n_embed, dtype=flat.dtype)
        quantized = quantized.reshape(x.shape)

        new_state = self._ema_update(state, flat, onehot, axis_name) if train else state

        loss = self.commitment * jnp.mean(
            jnp.square(lax.stop_gradient(quantized) - x)
        )
        q_st = x + lax.stop_gradient(quantized - x)

        avg_probs = jnp.mean(onehot, axis=0)
        if axis_name is not None:
            avg_probs = lax.pmean(avg_probs, axis_name)
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
        return q_st, new_state, loss, perplexity

    def forward_index(self, state: VQState, x: jax.Array):
        """Inference-path quantization: no EMA update, returns (q_st, indices)."""
        flat = x.reshape(-1, self.dim)
        ind, quantized = _quantize_core(state.embed, flat)
        quantized = quantized.reshape(x.shape)
        ind = ind.reshape(x.shape[:-1])
        q_st = x + lax.stop_gradient(quantized - x)
        return q_st, ind


class ResidualVQ:
    """Residual VQ over a stacked state ``(L, dim, K)``, scanned on device."""

    def __init__(
        self,
        dim: int,
        num_quantizers: int,
        codebook_size: int,
        decay: float = 0.8,
        commitment: float = 1.0,
        eps: float = 1e-5,
    ):
        self.num_quantizers = num_quantizers
        self.codebook_size = codebook_size
        self.layer = VectorQuantizeEMA(dim, codebook_size, decay, commitment, eps)

    def init(self, key) -> VQState:
        states = [self.layer.init(k) for k in jax.random.split(key, self.num_quantizers)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)

    def __call__(self, state: VQState, x: jax.Array, train: bool, axis_name=None):
        """Returns (quantized_out, new_state, losses (L,), perplexities (L,)).

        The residual subtraction uses the straight-through ``quantized`` (not
        detached), replicating vq_module.py:129 — downstream layers carry no
        gradient to the encoder.
        """

        def body(carry, layer_state):
            residual, q_out = carry
            q, new_ls, loss, ppl = self.layer(
                layer_state, residual, train=train, axis_name=axis_name
            )
            return (residual - q, q_out + q), (new_ls, loss, ppl)

        (_, q_out), (new_state, losses, ppls) = lax.scan(
            body, (x, jnp.zeros_like(x)), state
        )
        return q_out, new_state, losses, ppls

    def forward_index(self, state: VQState, x: jax.Array, flatten_idx: bool = False):
        """Returns (quantized_out, indices (L, ...))."""

        def body(carry, inp):
            layer_state, i = inp
            residual, q_out = carry
            q, ind = self.layer.forward_index(layer_state, residual)
            if flatten_idx is True:
                ind = ind + i * self.codebook_size
            return (residual - q, q_out + q), ind

        idxs = jnp.arange(self.num_quantizers)
        (_, q_out), indices = lax.scan(body, (x, jnp.zeros_like(x)), (state, idxs))
        return q_out, indices

    def flat_codebook(self, state: VQState) -> jax.Array:
        """(L*K, dim) lookup table for the rx side (vq_module.py:151-157)."""
        # state.embed: (L, dim, K) -> (L, K, dim) -> (L*K, dim)
        return jnp.transpose(state.embed, (0, 2, 1)).reshape(
            -1, state.embed.shape[1]
        )

    def lookup(self, flat_codebook: jax.Array, indices: jax.Array) -> jax.Array:
        """indices: (L, ...) flattened codes -> summed embeddings (..., dim)."""
        emb = jnp.take(flat_codebook, indices, axis=0)  # (L, ..., dim)
        return jnp.sum(emb, axis=0)


class Quantizer:
    """The reference's Quantizer facade (models/autoencoder/modules/quantizer.py).

    Operates on (B, T, D) activations directly (our layout needs no
    transposes, unlike quantizer.py:33-44).
    """

    def __init__(self, code_dim: int, codebook_num: int, codebook_size: int):
        self.rvq = ResidualVQ(code_dim, codebook_num, codebook_size)
        self.codebook_num = codebook_num
        self.codebook_size = codebook_size

    def init(self, key) -> VQState:
        return self.rvq.init(key)

    def __call__(self, state, z, train: bool, axis_name=None):
        zq, new_state, losses, ppls = self.rvq(state, z, train, axis_name)
        return zq, new_state, losses, ppls

    def inference(self, state, z):
        return self.rvq.forward_index(state, z)

    def encode(self, state, z):
        """Quantize to flattened tx indices (quantizer.py:42-44)."""
        return self.rvq.forward_index(state, z, flatten_idx=True)

    def decode(self, flat_codebook, indices):
        return self.rvq.lookup(flat_codebook, indices)
