"""The composite Faster R-CNN module: backbone + RPN head + detector head.

One Flax module with three callable stages; the training/inference pipelines
(train/pipeline.py, inference.py) compose them inside a single jitted program —
collapsing the reference's predict_on_batch -> host NumPy -> train_on_batch
round-trips (SURVEY.md §3.2 "two device crossings per iteration") into one XLA
executable.

Backbone/head selection mirrors the reference factories: vgg.py:91-141 +
169-196 + 226-255, resnet.py:395-448 + 451-486 + 489-548.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from faster_rcnn_tpu.config import FasterRcnnConfig
from faster_rcnn_tpu.models.heads import ResNetDetHead, RpnHead, VggDetHead
from faster_rcnn_tpu.models.resnet import ResNetBackbone
from faster_rcnn_tpu.models.vgg import VGG16Backbone

# ImageNet channel means in BGR order, shared by the vgg/resnet 'caffe-mode'
# preprocessing the reference uses (vgg.py:52-57, resnet.py:64-75): pixels are
# fed to the network as BGR minus these means.
IMAGENET_BGR_MEANS = np.array([103.939, 116.779, 123.68], np.float32)


def preprocess_rgb(pixels_rgb: np.ndarray) -> np.ndarray:
    """RGB uint8/float (H, W, 3) -> BGR float32 minus ImageNet means.

    The reference loads BGR via cv2, converts to RGB, then Keras
    ``preprocess_input`` flips back to BGR and subtracts means — net effect
    reproduced here for RGB input (we load with PIL, which gives RGB).
    """
    bgr = np.asarray(pixels_rgb, np.float32)[..., ::-1]
    return bgr - IMAGENET_BGR_MEANS


class FasterRCNN(nn.Module):
    """Composite model. Methods are invoked via ``apply(..., method=...)``."""

    cfg: FasterRcnnConfig

    def setup(self):
        m = self.cfg.model
        dtype = jnp.bfloat16 if m.compute_dtype == "bfloat16" else jnp.float32
        if m.network == "vgg16":
            self.backbone_net = VGG16Backbone(dtype=dtype, name="backbone")
            self.det_head_net = VggDetHead(num_classes=m.num_classes, dtype=dtype, name="det_head")
        elif m.network in ("resnet50", "resnet101"):
            depth = 50 if m.network == "resnet50" else 101
            self.backbone_net = ResNetBackbone(
                depth=depth, dtype=dtype, conv1_impl=m.conv1_impl,
                name="backbone")
            self.det_head_net = ResNetDetHead(
                num_classes=m.num_classes, depth=depth, dtype=dtype, name="det_head"
            )
        else:
            raise ValueError(f"unknown network {m.network}")
        self.rpn_head_net = RpnHead(anchors_per_loc=self.cfg.anchors.num_anchors, name="rpn_head")

    def backbone(self, images, stop_grad_stage: int = 0):
        """(B, H, W, 3) preprocessed -> (B, H/16, W/16, F).

        ``stop_grad_stage`` (static int) cuts the backward pass after that
        backbone stage; pass ``parallel.freeze.frozen_prefix_stage(...)`` so
        frozen stages never pay for gradients (update-identical, see there).
        """
        return self.backbone_net(images, stop_grad_stage=stop_grad_stage)

    def rpn(self, feat):
        """Feature map -> (objectness logits (B, h, w, A), bbreg (B, h, w, 4A))."""
        return self.rpn_head_net(feat)

    def det_head(self, pooled):
        """Pooled ROI features (B, R, P, P, F) -> ((B, R, C), (B, R, 4·(C−1))).

        ROI axis folded into batch for one big MXU matmul, then unfolded.
        """
        b, r = pooled.shape[:2]
        cls, reg = self.det_head_net(pooled.reshape((b * r,) + pooled.shape[2:]))
        return cls.reshape(b, r, -1), reg.reshape(b, r, -1)

    def __call__(self, images, rois):
        """Init-only path touching every submodule."""
        feat = self.backbone(images)
        rpn_out = self.rpn(feat)
        from faster_rcnn_tpu.ops.roi_align import roi_align_batched

        pooled = roi_align_batched(feat, rois, self.cfg.det.pool_size)
        det_out = self.det_head(pooled)
        return rpn_out, det_out


def init_model(key, cfg: FasterRcnnConfig, canvas=None):
    """Initialize params/batch_stats with tiny dummy inputs (shapes don't bake
    into conv params, so a small canvas keeps init fast)."""
    import jax

    model = FasterRCNN(cfg)
    h, w = canvas or (64, 64)
    images = jnp.zeros((1, h, w, 3), jnp.float32)
    rois = jnp.array([[[0, 0, 2, 2]]], jnp.float32)
    variables = model.init(key, images, rois)
    return model, variables
