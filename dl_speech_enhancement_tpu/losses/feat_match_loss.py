"""Feature-matching loss between discriminator feature maps.

Reference losses/feat_match_loss.py:13-55: L1 between per-layer features,
excluding the final logits by default, with optional averaging. The target
features are stop-gradiented (``feat_.detach()``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class FeatureMatchLoss:
    def __init__(self, average_by_layers=True, average_by_discriminators=True,
                 include_final_outputs=False):
        self.average_by_layers = average_by_layers
        self.average_by_discriminators = average_by_discriminators
        self.include_final_outputs = include_final_outputs

    def __call__(self, feats_hat, feats):
        total = 0.0
        for feats_hat_, feats_ in zip(feats_hat, feats):
            if not self.include_final_outputs:
                feats_hat_ = feats_hat_[:-1]
                feats_ = feats_[:-1]
            layer_loss = 0.0
            for fh, f in zip(feats_hat_, feats_):
                layer_loss = layer_loss + jnp.mean(
                    jnp.abs(fh - jax.lax.stop_gradient(f))
                )
            if self.average_by_layers:
                layer_loss = layer_loss / len(feats_)
            total = total + layer_loss
        if self.average_by_discriminators:
            total = total / len(feats)
        return total
