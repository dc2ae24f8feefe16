"""Batched detection inference: image -> final boxes in ONE device program.

The reference's inference path (voc_dets.py:20-88 + det_util.py:136-158) runs
RPN predict, host NMS to 300 ROIs, then loops the detector over 64-ROI chunks
(padding the last chunk by tiling ROI 0, voc_dets.py:42-46), decodes per-ROI
argmax classes on host, and applies per-class NMS in NumPy.  Total 0.53-0.7
s/image on the reference GPU (BASELINE.md).

Here the whole chain is one jitted program per batch:
  backbone -> RPN -> proposals (8000 -> NMS -> 300) -> RoI-align all 300 at
  once -> det head -> per-ROI argmax + class-offset NMS -> fixed (B, D, 6)
  detections.

The per-class NMS (voc_dets.py:76, thresh 0.5) is realized with the standard
class-offset trick: shift each detection's coordinates by class_id * OFFSET so
boxes of different classes can never overlap, then run ONE NMS — exactly
equivalent to per-class greedy NMS, one kernel instead of C.
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_tpu.config import FasterRcnnConfig
from faster_rcnn_tpu.models.detector import FasterRCNN
from faster_rcnn_tpu.ops import boxes as box_ops
from faster_rcnn_tpu.ops import nms as nms_ops
from faster_rcnn_tpu.ops.roi_align import roi_align_batched
from faster_rcnn_tpu.ops.targets import BBREG_MULTIPLIERS
from faster_rcnn_tpu.train.pipeline import rpn_forward_proposals

_CLASS_OFFSET = 16384.0  # larger than any image dim; small enough for fp32 IoU


class Detections(NamedTuple):
    boxes: jax.Array   # (B, D, 4) resized-image pixel coords (float)
    scores: jax.Array  # (B, D)
    classes: jax.Array # (B, D) int32
    valid: jax.Array   # (B, D) bool


def _decode_one_image(cfg: FasterRcnnConfig, rois, roi_valid, cls_prob, reg_out):
    """Per-ROI argmax decode + class-offset NMS for one image.

    rois: (R, 4) conv coords; cls_prob: (R, C) softmax probs; reg_out:
    (R, 4·(C−1)).
    """
    c = cfg.model.num_classes
    bg = c - 1
    stride = float(cfg.model.stride)

    cls_idx = jnp.argmax(cls_prob, axis=1)                     # (R,)
    conf = jnp.take_along_axis(cls_prob, cls_idx[:, None], axis=1)[:, 0]
    keep = roi_valid & (cls_idx != bg) & (conf >= cfg.det.det_threshold)

    # class-specific deltas / multipliers (voc_dets.py:66-68)
    safe_cls = jnp.minimum(cls_idx, bg - 1)
    cols = safe_cls[:, None] * 4 + jnp.arange(4)[None, :]
    deltas = jnp.take_along_axis(reg_out, cols, axis=1) / BBREG_MULTIPLIERS

    # float transform (voc_dets.py:68 uses util.transform — NO rounding)
    boxes = box_ops.decode(rois, deltas, round_coords=False) * stride

    # per-class NMS 0.5 via class offset, max_dets total (reference: per-class
    # cap 2000 never binds with <=300 ROIs); blocked kernel — the sequential
    # 300-iteration greedy loop costs ~2ms/img of pure serial latency
    shifted = boxes + (cls_idx[:, None].astype(jnp.float32) * _CLASS_OFFSET)
    d = min(cfg.rpn.infer_post_nms, rois.shape[0])
    idx, ok = nms_ops.nms_topk_indices(
        shifted, jnp.where(keep, conf, -1.0), keep, d, cfg.det.final_nms_iou, tile=128
    )
    return boxes[idx], conf[idx], cls_idx[idx].astype(jnp.int32), ok


def make_detect_fn(
    cfg: FasterRcnnConfig,
    model: FasterRCNN,
    variables,
    uint8_input: bool = False,
    mesh=None,
):
    """Build the jitted (images, img_hw) -> Detections function.

    ``variables`` must hold the FULL final model (backbone + rpn_head from
    step 3, det_head from step 4 — or a jointly trained tree).  The variables
    are passed as a jit *argument* (device-resident), never closed over —
    closing over them would embed hundreds of MB of weights as XLA constants.

    ``uint8_input=True`` accepts raw RGB uint8 canvases and runs the
    BGR-flip + ImageNet mean subtraction on device — 4x less host->device
    traffic, the production serving configuration.

    ``mesh``: optional jax.sharding.Mesh for multi-chip serving — weights are
    replicated, the batch shards over the 'data' axis, every image's full
    pipeline runs on its own chip (detection is embarrassingly data-parallel).
    Batch size must be a multiple of the data-axis size.
    """
    from faster_rcnn_tpu.models.detector import IMAGENET_BGR_MEANS

    means = jnp.asarray(IMAGENET_BGR_MEANS)

    @jax.jit
    def detect(vs, images, img_hw):
        if uint8_input:
            images = images[..., ::-1].astype(jnp.float32) - means
        feat, pboxes, _, pvalid = rpn_forward_proposals(
            cfg, model, vs, images, img_hw,
            cfg.rpn.infer_pre_nms, cfg.rpn.infer_post_nms,
        )
        pooled = roi_align_batched(feat, pboxes, cfg.det.pool_size, impl=cfg.det.roi_align_impl)
        cls_logits, reg_out = model.apply(vs, pooled, method=FasterRCNN.det_head)
        cls_prob = jax.nn.softmax(cls_logits, axis=-1)

        b, s, cl, ok = jax.vmap(functools.partial(_decode_one_image, cfg))(
            pboxes, pvalid, cls_prob, reg_out
        )
        return Detections(b, s, cl, ok)

    if mesh is None:
        vs = jax.device_put(variables)
        return functools.partial(detect, vs)

    from faster_rcnn_tpu.parallel import mesh as mesh_lib

    vs = jax.device_put(variables, mesh_lib.replicated(mesh))
    bsh = mesh_lib.batch_sharding(mesh)

    def sharded_detect(images, img_hw):
        images = jax.device_put(images, bsh)
        img_hw = jax.device_put(img_hw, bsh)
        return detect(vs, images, img_hw)

    return sharded_detect


def detections_to_records(
    dets: Detections,
    resize_ratios: List[float],
    class_names: List[str],
) -> List[List[Dict]]:
    """Device detections -> per-image dicts in ORIGINAL image coords
    (voc_dets.py:79-88: divide by resize ratio, round to int)."""
    boxes = np.asarray(dets.boxes)
    scores = np.asarray(dets.scores)
    classes = np.asarray(dets.classes)
    valid = np.asarray(dets.valid)

    out: List[List[Dict]] = []
    for i in range(boxes.shape[0]):
        ratio = resize_ratios[i]
        recs = []
        for j in np.where(valid[i])[0]:
            x1, y1, x2, y2 = boxes[i, j]
            recs.append(
                {
                    "bbox": np.array(
                        [
                            int(round(x1 / ratio)),
                            int(round(y1 / ratio)),
                            int(round(x2 / ratio)),
                            int(round(y2 / ratio)),
                        ]
                    ),
                    "cls_name": class_names[classes[i, j]],
                    "prob": float(scores[i, j]),
                }
            )
        out.append(recs)
    return out


def write_dets(dets_by_cls: Dict[str, Dict[str, List[Dict]]], out_dir: str) -> None:
    """VOC comp3 detection files, 1-based output coords (voc_dets.py:114-129)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    for cls_name, by_img in dets_by_cls.items():
        path = os.path.join(out_dir, f"comp3_det_test_{cls_name}.txt")
        with open(path, "w") as f:
            for image_name, recs in by_img.items():
                for det in recs:
                    x1, y1, x2, y2 = det["bbox"] + 1
                    f.write(f"{image_name} {det['prob']} {x1} {y1} {x2} {y2}\n")
