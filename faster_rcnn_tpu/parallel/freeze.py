"""Parameter freezing + optimizer construction.

The reference freezes layers via Keras ``trainable=`` flags at graph build
time (vgg.py:94, resnet.py:408-445, train_rpn_step3.py:60-81) and relies on
l2 regularizer objects attached per layer.  Here freezing is an optimizer
concern: ``optax.multi_transform`` routes frozen parameters to ``set_to_zero``
and everything else to the real optimizer, so the same model graph serves all
four training steps.

Frozen sets per reference semantics:
  * backbone blocks listed in ``freeze_blocks`` (1-based stage numbers);
  * ALL BatchNormalization gamma/beta and Scale params (resnet.py
    bn_training=False everywhere);
  * optionally whole top-level submodules (e.g. 'backbone' for step 4's
    heads-only training, or 'rpn_head' never trained by the detector steps).

Weight decay reproduces the per-layer l2 regularizers (resnet.py:26-27,
1e-4; vgg.py:22-23, None) as decoupled-into-gradient L2: with plain SGD,
``optax.add_decayed_weights(2*l2)`` is mathematically identical to adding
``l2*||w||^2`` to the loss.  Applied to conv/dense kernels AND biases
(the reference regularizes both, bias_regularizer= kwargs) but never to
BN/Scale params.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import optax

from faster_rcnn_tpu.models.resnet import is_norm_param, resnet_param_block
from faster_rcnn_tpu.models.vgg import vgg_param_block


def param_labels(
    params,
    network: str,
    freeze_blocks: Sequence[int],
    freeze_modules: Sequence[str] = (),
):
    """Label each param 'train' or 'frozen' by its tree path."""
    block_of = vgg_param_block if network == "vgg16" else resnet_param_block

    def label(path: Tuple, _) -> str:
        keys = [p.key for p in path]
        if keys and keys[0] in freeze_modules:
            return "frozen"
        if is_norm_param(keys):
            return "frozen"
        blk = block_of(keys)
        if blk is not None and blk in freeze_blocks:
            return "frozen"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def frozen_prefix_stage(
    network: str,
    freeze_blocks: Sequence[int],
    freeze_modules: Sequence[str] = (),
) -> int:
    """Largest k such that backbone stages 1..k are ALL frozen (0 if conv1
    trains).

    Used to place a structural ``stop_gradient`` at the frozen-prefix
    boundary inside the backbone: with stages 1..k frozen there are no
    trainable parameters below the boundary (BN/Scale params are frozen
    unconditionally by the norm rule above), so cutting the backward pass
    there yields bit-identical updates — the only gradients it removes are
    ones ``multi_transform`` routes to ``set_to_zero`` anyway, and the
    clip/decay transforms are masked to the train route so they never see
    frozen leaves.  Worth ~24 ms/step at B=16 on v5e (NOTES.md round 3:
    conv1+stage2+stage3 backward was 47% of the backbone's 48.7 ms
    fwd+bwd cost despite being frozen in the reference's default config,
    resnet.py:408-445 train1=False).
    """
    last = 5 if network == "vgg16" else 4
    if "backbone" in freeze_modules:
        return last
    frozen = set(freeze_blocks)
    k = 0
    for b in range(1, last + 1):
        if b not in frozen:
            break
        k = b
    return k


def decay_mask(params):
    """True for kernels/biases of conv+dense layers; False for BN/Scale."""

    def m(path, _) -> bool:
        keys = [p.key for p in path]
        return not is_norm_param(keys)

    return jax.tree_util.tree_map_with_path(m, params)


def make_optimizer(
    params,
    network: str,
    freeze_blocks: Sequence[int],
    learning_rate: Callable | float,
    optimizer: str = "sgd",
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    freeze_modules: Sequence[str] = (),
    clip_grad_norm: float = 0.0,
) -> optax.GradientTransformation:
    """SGD(momentum 0.9) or Adam (args_util.py:48-59) with freezing + l2.

    ``clip_grad_norm > 0`` adds global-norm gradient clipping — not present in
    the reference (single-image batches rarely blew up) but necessary headroom
    for large-batch / from-scratch joint training.
    """
    labels = param_labels(params, network, freeze_blocks, freeze_modules)

    if optimizer == "sgd":
        inner = optax.sgd(learning_rate, momentum=momentum)
    elif optimizer == "adam":
        inner = optax.adam(learning_rate)
    else:
        raise ValueError(f"unknown optimizer {optimizer}")
    if clip_grad_norm:
        inner = optax.chain(optax.clip_by_global_norm(clip_grad_norm), inner)

    chain = []
    if weight_decay:
        # decay only trainable, non-norm params (applied before the frozen
        # route zeroes its updates, so frozen params are unaffected either way)
        dmask = decay_mask(params)
        combined = jax.tree_util.tree_map(
            lambda lab, dm: (lab == "train") and dm, labels, dmask
        )
        chain.append(optax.masked(optax.add_decayed_weights(2.0 * weight_decay), combined))
    chain.append(
        optax.multi_transform({"train": inner, "frozen": optax.set_to_zero()}, labels)
    )
    return optax.chain(*chain)
