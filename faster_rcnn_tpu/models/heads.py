"""RPN and detector (Fast R-CNN) heads.

* :class:`RpnHead` — vgg.py:169-196 / resnet.py:451-486: shared 3x3x512 conv,
  1x1 objectness (A channels) and 1x1 regression (4A channels).  We emit raw
  logits for the objectness path (the reference bakes a sigmoid into the graph;
  logits are numerically better and sigmoid is applied where probabilities are
  needed).
* :class:`VggDetHead` — vgg.py:226-255: flatten pooled ROI -> fc1(4096) ->
  fc2(4096) -> class logits (C) + per-class regression (4·(C−1)).
* :class:`ResNetDetHead` — resnet.py:489-548: stage-5 bottlenecks + avg-pool
  then the same two dense outputs.

The reference wraps per-ROI computation in TimeDistributed with a fixed 64-ROI
batch; here ROI and batch axes are folded together so the fc/conv work is one
large matmul on the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from faster_rcnn_tpu.models.resnet import ResNetStage5

_trunc01 = nn.initializers.truncated_normal(stddev=0.01)
_trunc001 = nn.initializers.truncated_normal(stddev=0.001)


class RpnHead(nn.Module):
    anchors_per_loc: int = 18
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feat):
        net = nn.Conv(
            512, (3, 3), padding="SAME", dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=_trunc01, name="rpn_conv1",
        )(feat)
        net = nn.relu(net)
        cls_logits = nn.Conv(
            self.anchors_per_loc, (1, 1), dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=_trunc01, name="rpn_out_cls",
        )(net.astype(jnp.float32))
        bbreg = nn.Conv(
            4 * self.anchors_per_loc, (1, 1), dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=_trunc01, name="rpn_out_bbreg",
        )(net.astype(jnp.float32))
        return cls_logits, bbreg


class VggDetHead(nn.Module):
    """(N, 7, 7, 512) pooled ROIs -> (cls logits (N, C), reg (N, 4·(C−1)))."""

    num_classes: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled):
        n = pooled.shape[0]
        x = pooled.reshape(n, -1).astype(self.dtype)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x))
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(x))
        x32 = x.astype(jnp.float32)
        cls = nn.Dense(
            self.num_classes, kernel_init=_trunc01, dtype=jnp.float32,
            param_dtype=jnp.float32, name=f"dense_class_{self.num_classes}",
        )(x32)
        reg = nn.Dense(
            4 * (self.num_classes - 1), kernel_init=_trunc001, dtype=jnp.float32,
            param_dtype=jnp.float32, name=f"dense_reg_{self.num_classes}",
        )(x32)
        return cls, reg


class ResNetDetHead(nn.Module):
    """(N, 7, 7, 1024) pooled ROIs -> (cls logits, per-class reg)."""

    num_classes: int
    depth: int = 50
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled):
        x = ResNetStage5(depth=self.depth, dtype=self.dtype, name="stage5")(
            pooled.astype(self.dtype)
        )
        x32 = x.astype(jnp.float32)
        cls = nn.Dense(
            self.num_classes, kernel_init=_trunc01, dtype=jnp.float32,
            param_dtype=jnp.float32, name=f"dense_class_{self.num_classes}",
        )(x32)
        reg = nn.Dense(
            4 * (self.num_classes - 1), kernel_init=_trunc001, dtype=jnp.float32,
            param_dtype=jnp.float32, name=f"dense_reg_{self.num_classes}",
        )(x32)
        return cls, reg
