"""Shared model building blocks.

Frozen batch-norm matches the reference's BN discipline: every
``BatchNormalization`` runs in inference mode permanently
(``trainable=False)(x, training=False)`` — resnet.py:152-153 and the comment
"model doesn't train correctly with batch normalization", resnet.py:133).
Moving statistics live in the ``batch_stats`` collection and are never
updated; gamma/beta live in ``params`` but are excluded from the optimizer by
the freeze rules in ``parallel/freeze.py`` (reference: ``trainable=bn_training``
with bn_training always False).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """Inference-only batch normalization: y = γ·(x−μ)/√(σ²+ε) + β.

    μ, σ² are constants (collection ``batch_stats``); γ, β are parameters that
    the optimizer freezes.  With fresh (non-pretrained) stats this is the
    identity affine, matching an untrained Keras BN in inference mode.
    """

    epsilon: float = 1e-5  # resnet.py:148 eps
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        inv = scale / jnp.sqrt(var.value + self.epsilon)
        y = (x.astype(jnp.float32) - mean.value) * inv + bias
        return y.astype(self.dtype)


class ChannelScale(nn.Module):
    """Per-channel affine γ·x + β — the reference's custom ``Scale`` layer used
    by the Caffe-style ResNet-101 (custom_layers.py:59-134).  Frozen like BN
    (resnet.py: trainable=bn_training)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return (x.astype(jnp.float32) * gamma + beta).astype(self.dtype)
