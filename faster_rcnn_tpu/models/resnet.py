"""ResNet-50 / ResNet-101 backbones and the post-RoI stage-5 head.

TPU-native rebuild of resnet.py:

* Bottleneck blocks (identity_block resnet.py:114-177, conv_block
  resnet.py:181-247) with permanently-frozen BN.
* ``resnet50_base`` = conv1 + stages 2-4 -> 1024 channels at stride 16
  (resnet.py:395-448); ResNet-101 differs by 23 stage-4 blocks and the
  Caffe-style ``use_bias=False`` convs + separate Scale layer
  (resnet.py:551-602).
* ``ResNetStage5`` is the detector-head tail: stage-5 blocks at stride 1 on the
  7x7 pooled ROI features + 7x7 average pool -> 2048 features per ROI
  (resnet.py:489-548 resnet50_classifier).  The reference wraps these in
  TimeDistributed; here the ROI axis is just folded into the batch axis —
  bigger matmuls, better MXU utilization, no wrapper machinery.

Parameter names mirror Keras layer names (res{stage}{block}_branch{path},
bn..., scale...) for h5 weight transplant parity.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from faster_rcnn_tpu.models.layers import ChannelScale, FrozenBatchNorm
from faster_rcnn_tpu.ops.conv1_pallas import conv1 as _conv1_dispatch

_STAGE4_BLOCKS_50 = ["a", "b", "c", "d", "e", "f"]
_STAGE4_BLOCKS_101 = ["a"] + [f"b{i}" for i in range(1, 23)]  # caffe naming a, b1..b22


class Bottleneck(nn.Module):
    """One bottleneck block: 1x1 -> 3x3 -> 1x1 with optional projection
    shortcut (conv_block when ``project`` else identity_block)."""

    filters: tuple[int, int, int]
    stage: int
    block: str
    strides: tuple[int, int] = (1, 1)
    project: bool = False
    use_bias: bool = True         # False for the Caffe-style ResNet-101
    separate_scale: bool = False  # True for ResNet-101
    dtype: Any = jnp.bfloat16

    def _bn(self, x, suffix):
        x = FrozenBatchNorm(dtype=self.dtype, name=f"bn{self.stage}{self.block}_branch{suffix}")(x)
        if self.separate_scale:
            x = ChannelScale(dtype=self.dtype, name=f"scale{self.stage}{self.block}_branch{suffix}")(x)
        return x

    @nn.compact
    def __call__(self, x):
        f1, f2, f3 = self.filters
        conv = lambda f, k, s, n: nn.Conv(  # noqa: E731
            f, k, strides=s, padding="SAME", use_bias=self.use_bias,
            dtype=self.dtype, param_dtype=jnp.float32, name=n,
        )
        nb = f"res{self.stage}{self.block}_branch"

        y = conv(f1, (1, 1), self.strides, nb + "2a")(x)
        y = nn.relu(self._bn(y, "2a"))
        y = conv(f2, (3, 3), (1, 1), nb + "2b")(y)
        y = nn.relu(self._bn(y, "2b"))
        y = conv(f3, (1, 1), (1, 1), nb + "2c")(y)
        y = self._bn(y, "2c")

        if self.project:
            sc = conv(f3, (1, 1), self.strides, nb + "1")(x)
            sc = self._bn(sc, "1")
        else:
            sc = x
        return nn.relu(y + sc)


def _stage(x, stage: int, blocks: Sequence[str], filters, first_strides, **kw):
    for i, b in enumerate(blocks):
        x = Bottleneck(
            filters=filters,
            stage=stage,
            block=b,
            strides=first_strides if i == 0 else (1, 1),
            project=(i == 0),
            name=f"res{stage}{b}",
            **kw,
        )(x)
    return x


class Conv1(nn.Module):
    """The 7x7/s2 stem conv with a swappable lowering.

    Drop-in for ``nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME")`` —
    the parameter tree (conv1/kernel [+ bias], lecun-normal / zeros, fp32)
    and the XLA lowering are bit-identical to what ``nn.Conv`` produces, so
    checkpoints, the Keras by-name contract, and the golden regressions are
    unaffected.  ``impl='pallas'`` routes to the MXU kernel
    (ops/conv1_pallas.py) on TPU; any other backend silently uses XLA (the
    Pallas interpreter is never a sane production default)."""

    use_bias: bool
    dtype: Any
    impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, x.shape[-1], 64), jnp.float32)
        x = x.astype(self.dtype)
        y = _conv1_dispatch(x, kernel.astype(self.dtype), impl=self.impl)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (64,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class ResNetBackbone(nn.Module):
    """conv1 + stages 2-4: (B, H, W, 3) -> (B, ~H/16, ~W/16, 1024).

    With canvas dims that are multiples of 32 the output is exactly
    (H/16, W/16) for both this and VGG (resnet.py:78-93 get_conv_rows_cols
    arithmetic collapses to //16 in that case).
    """

    depth: int = 50  # 50 or 101
    dtype: Any = jnp.bfloat16
    conv1_impl: str = "xla"

    @nn.compact
    def __call__(self, x, stop_grad_stage: int = 0):
        """``stop_grad_stage=k`` (static) inserts one ``stop_gradient`` after
        stage k (1 = conv1+pool), structurally eliminating the backward pass
        through a frozen stage prefix — see
        ``parallel.freeze.frozen_prefix_stage`` for the update-equivalence
        argument."""
        caffe = self.depth == 101
        kw = dict(use_bias=not caffe, separate_scale=caffe, dtype=self.dtype)

        def sg(x, stage):
            return jax.lax.stop_gradient(x) if stop_grad_stage == stage else x

        x = x.astype(self.dtype)
        x = Conv1(use_bias=not caffe, dtype=self.dtype,
                  impl=self.conv1_impl, name="conv1")(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn_conv1")(x)
        if caffe:
            x = ChannelScale(dtype=self.dtype, name="scale_conv1")(x)
        x = nn.relu(x)
        x = sg(nn.max_pool(x, (3, 3), strides=(2, 2)), 1)  # VALID, resnet.py:413

        x = sg(_stage(x, 2, ["a", "b", "c"], (64, 64, 256), (1, 1), **kw), 2)
        x = sg(_stage(x, 3, ["a", "b", "c", "d"] if not caffe else ["a", "b1", "b2", "b3"],
                      (128, 128, 512), (2, 2), **kw), 3)
        blocks4 = _STAGE4_BLOCKS_101 if caffe else _STAGE4_BLOCKS_50
        x = sg(_stage(x, 4, blocks4, (256, 256, 1024), (2, 2), **kw), 4)
        return x


class ResNetStage5(nn.Module):
    """Stage-5 detector tail on pooled ROI features.

    (N, 7, 7, 1024) -> (N, 2048): three bottleneck blocks at stride 1
    (resnet.py:515-521, strides=(1,1)) then global 7x7 average pool
    (resnet.py:522).  N = batch * num_rois, folded by the caller.
    """

    depth: int = 50
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        caffe = self.depth == 101
        kw = dict(use_bias=not caffe, separate_scale=caffe, dtype=self.dtype)
        x = _stage(x, 5, ["a", "b", "c"], (512, 512, 2048), (1, 1), **kw)
        return jnp.mean(x, axis=(1, 2))  # 7x7 avg pool == global mean here


def resnet_param_block(path: Sequence[str]) -> int | None:
    """Map a param path to its stage number for freeze rules.  conv1/bn_conv1
    count as block 1 (resnet.py:408-413 train1)."""
    for p in path:
        if p in ("conv1", "bn_conv1", "scale_conv1"):
            return 1
        for prefix in ("res", "bn", "scale"):
            if p.startswith(prefix):
                rest = p[len(prefix):]
                if rest and rest[0].isdigit():
                    return int(rest[0])
    return None


def is_norm_param(path: Sequence[str]) -> bool:
    """True for BN/Scale params — never trainable (resnet.py bn_training=False,
    Scale trainable=bn_training)."""
    return any(
        p.startswith("bn") or p.startswith("scale") for p in path
    )
