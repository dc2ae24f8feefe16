"""Model zoo shape/initialization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faster_rcnn_tpu.config import FasterRcnnConfig, voc_config
from faster_rcnn_tpu.models.detector import FasterRCNN, init_model, preprocess_rgb


@pytest.mark.parametrize("network,feat_ch", [("vgg16", 512), ("resnet50", 1024)])
def test_backbone_shapes(network, feat_ch):
    cfg = voc_config(network)
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    imgs = jnp.zeros((1, 64, 96, 3), jnp.float32)
    feat = model.apply(variables, imgs, method=FasterRCNN.backbone)
    assert feat.shape == (1, 4, 6, feat_ch)


def test_resnet101_stage4_depth():
    cfg = voc_config("resnet101")
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    params = variables["params"]["backbone"]
    blocks4 = [k for k in params if k.startswith("res4")]
    assert len(blocks4) == 23  # 23 stage-4 bottlenecks (resnet.py:580-599)
    convs4 = [k for k in params["res4a"] if k.startswith("res4a_branch")]
    assert len(convs4) == 4  # 3 main-path convs + projection
    # caffe-style: no conv bias, separate scale layers present
    assert "bias" not in params["res4a"]["res4a_branch2a"]
    assert any(k.startswith("scale4") for k in params["res4a"])


def test_rpn_and_det_head_shapes():
    cfg = voc_config("resnet50")
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    feat = model.apply(variables, imgs, method=FasterRCNN.backbone)
    cls, reg = model.apply(variables, feat, method=FasterRCNN.rpn)
    a = cfg.anchors.num_anchors
    assert cls.shape == (2, 4, 4, a) and reg.shape == (2, 4, 4, 4 * a)
    assert cls.dtype == jnp.float32

    pooled = jnp.zeros((2, 8, 7, 7, 1024), jnp.float32)
    dcls, dreg = model.apply(variables, pooled, method=FasterRCNN.det_head)
    assert dcls.shape == (2, 8, 21) and dreg.shape == (2, 8, 80)


def test_frozen_bn_is_identity_at_init():
    """Untrained FrozenBatchNorm (mean 0, var 1, scale 1, bias 0) ~ identity."""
    from faster_rcnn_tpu.models.layers import FrozenBatchNorm

    bn = FrozenBatchNorm(dtype=jnp.float32)
    x = jnp.linspace(-2, 2, 12).reshape(1, 2, 2, 3)
    variables = bn.init(jax.random.PRNGKey(0), x)
    y = bn.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-4, atol=1e-5)


def test_preprocess_rgb():
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[..., 0] = 255  # pure red
    out = preprocess_rgb(rgb)
    # BGR order: channel 0 is blue (0 - 103.939), channel 2 is red (255 - 123.68)
    np.testing.assert_allclose(out[0, 0], [-103.939, -116.779, 255 - 123.68], atol=1e-3)
