"""Learning validation: the joint train step can overfit a tiny synthetic
detection task — bright rectangles on dark backgrounds — and the fused detect
program then localizes them.

This is the strongest functional test short of real-VOC mAP (no dataset in
this environment): it exercises targets, sampling, losses, gradients,
proposal NMS, RoI align, and decode *as a learning system*, not just as
shape-correct programs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faster_rcnn_tpu import inference
from faster_rcnn_tpu.models.detector import init_model
from faster_rcnn_tpu.parallel.freeze import make_optimizer
from faster_rcnn_tpu.train import pipeline

from tests.test_train_step import tiny_config
from tests.reference_impl import np_iou_matrix


def make_rect_batch(rng, cfg, b):
    """Images with 1-2 bright rectangles (class 0/1) on noise background."""
    h, w = cfg.data.canvas
    g = cfg.data.max_gt_boxes
    imgs = rng.standard_normal((b, h, w, 3)).astype(np.float32) * 10
    gt = np.zeros((b, g, 4), np.float32)
    gv = np.zeros((b, g), bool)
    gc = np.zeros((b, g), np.int32)
    for i in range(b):
        for j in range(rng.randint(1, 3)):
            bw, bh = rng.randint(16, 30), rng.randint(14, 26)
            x1 = rng.randint(0, w - bw)
            y1 = rng.randint(0, h - bh)
            cls = rng.randint(0, 2)
            color = np.array([120, -80, 40] if cls == 0 else [-90, 110, -40], np.float32)
            imgs[i, y1 : y1 + bh, x1 : x1 + bw] = color + rng.standard_normal((bh, bw, 3)) * 5
            gt[i, j] = [x1, y1, x1 + bw, y1 + bh]
            gv[i, j] = True
            gc[i, j] = cls
    return {
        "image": imgs,
        "gt_boxes": gt,
        "gt_class": gc,
        "gt_valid": gv,
        "img_hw": np.tile([[h, w]], (b, 1)).astype(np.int32),
    }


@pytest.mark.slow
def test_joint_training_learns_to_detect(rng):
    cfg = tiny_config("vgg16")
    # fewer frozen blocks: the net must learn features from scratch
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, freeze_blocks=(), num_classes=3)
    )
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    params = variables["params"]
    tx = make_optimizer(params, "vgg16", (), 3e-3, momentum=0.9)
    state = pipeline.TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(pipeline.make_joint_train_step(cfg, model, tx, {}), donate_argnums=(0,))

    # fixed set of 4 images, trained repeatedly (overfit on purpose)
    batches = [make_rect_batch(np.random.RandomState(s), cfg, 2) for s in (1, 2)]
    dev_batches = [{k: jnp.asarray(v) for k, v in b.items()} for b in batches]

    first = last = None
    for i in range(120):
        keys = jax.random.split(jax.random.PRNGKey(i), 2)
        state, metrics = step(state, dev_batches[i % 2], keys)
        if i == 0:
            first = float(metrics["loss"])
        last = float(metrics["loss"])
    assert last < first * 0.5, (first, last)

    # detection: the top box per image should hit a gt rectangle
    detect = inference.make_detect_fn(
        cfg, model, {"params": state.params, "batch_stats": {}}
    )
    b0 = batches[0]
    dets = detect(jnp.asarray(b0["image"]), jnp.asarray(b0["img_hw"]))
    boxes = np.asarray(dets.boxes)
    valid = np.asarray(dets.valid)
    scores = np.asarray(dets.scores)

    hits = 0
    for i in range(2):
        if not valid[i].any():
            continue
        top = np.argmax(np.where(valid[i], scores[i], -1))
        gt = b0["gt_boxes"][i][b0["gt_valid"][i]]
        iou = np_iou_matrix(boxes[i, top : top + 1], gt)
        if iou.max() > 0.3:
            hits += 1
    assert hits >= 1, "trained detector failed to localize any rectangle"
