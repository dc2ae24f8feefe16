"""VGG16 backbone as a Flax module.

TPU-native rebuild of vgg.py:91-141 (vgg16_base): 5 conv blocks with the final
max-pool omitted, so the output stride is 16 and the feature width 512.
Parameter names mirror the Keras layer names (``block{i}_conv{j}``) so the h5
weight importer (utils/keras_import.py) can transplant ImageNet/reference
weights ``by_name`` — the inter-step contract of the 4-step pipeline
(SURVEY.md §5.4).

Freezing (blocks 1-2 at step 1, vgg.py:91; all 5 at step 3,
train_rpn_step3.py:60-81) is enforced by the optimizer mask, not the module.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# (block, n_convs, filters)
_VGG_CFG = ((1, 2, 64), (2, 2, 128), (3, 3, 256), (4, 3, 512), (5, 3, 512))


class VGG16Backbone(nn.Module):
    """Input (B, H, W, 3) preprocessed pixels -> (B, H/16, W/16, 512)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, stop_grad_stage: int = 0):
        """``stop_grad_stage=k`` (static) cuts the backward pass after block k
        when blocks 1..k are all frozen (vgg.py:94 trainable=False for blocks
        1-2) — see ``parallel.freeze.frozen_prefix_stage``."""
        x = x.astype(self.dtype)
        for block, n_convs, filters in _VGG_CFG:
            for conv in range(1, n_convs + 1):
                x = nn.Conv(
                    filters,
                    (3, 3),
                    padding="SAME",
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"block{block}_conv{conv}",
                )(x)
                x = nn.relu(x)
            if block < 5:  # final pool dropped (stride stays 16)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if stop_grad_stage == block:
                x = jax.lax.stop_gradient(x)
        return x


def vgg_param_block(path: Sequence[str]) -> int | None:
    """Map a param path to its 1-based VGG block index for freeze rules."""
    for p in path:
        if p.startswith("block") and "_conv" in p:
            return int(p[5])
    return None
