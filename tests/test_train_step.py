"""End-to-end smoke tests of the fused train steps (tiny shapes, CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faster_rcnn_tpu.config import (
    AnchorConfig,
    DataConfig,
    DetConfig,
    FasterRcnnConfig,
    ModelConfig,
    RpnConfig,
)
from faster_rcnn_tpu.models.detector import FasterRCNN, init_model
from faster_rcnn_tpu.parallel.freeze import make_optimizer, param_labels
from faster_rcnn_tpu.train import pipeline


def tiny_config(network="vgg16"):
    return FasterRcnnConfig(
        anchors=AnchorConfig(scales=(16, 32), ratios=((1, 1), (2, 1))),
        rpn=RpnConfig(train_pre_nms=256, train_post_nms=64, infer_pre_nms=256, infer_post_nms=32),
        det=DetConfig(num_rois=16, roi_align_impl="einsum"),
        data=DataConfig(canvas_h=64, canvas_w=96, max_gt_boxes=8, resize_min=48, resize_max=96),
        model=ModelConfig(network=network, num_classes=6, freeze_blocks=(1, 2)),
    )


def tiny_batch(cfg, b=2, seed=0):
    rng = np.random.RandomState(seed)
    h, w = cfg.data.canvas
    g = cfg.data.max_gt_boxes
    gt = np.zeros((b, g, 4), np.float32)
    gt_valid = np.zeros((b, g), bool)
    gt_cls = np.zeros((b, g), np.int32)
    for i in range(b):
        n = rng.randint(1, 4)
        for j in range(n):
            x1 = rng.randint(0, w - 30)
            y1 = rng.randint(0, h - 30)
            gt[i, j] = [x1, y1, x1 + rng.randint(10, 28), y1 + rng.randint(10, 28)]
            gt_cls[i, j] = rng.randint(0, cfg.model.num_classes - 1)
            gt_valid[i, j] = True
    return {
        "image": jnp.asarray(rng.standard_normal((b, h, w, 3)).astype(np.float32)),
        "gt_boxes": jnp.asarray(gt),
        "gt_class": jnp.asarray(gt_cls),
        "gt_valid": jnp.asarray(gt_valid),
        "img_hw": jnp.asarray(np.tile([[h, w]], (b, 1)).astype(np.int32)),
    }


def flat_params(p):
    return {
        "/".join(str(k.key) for k in path): v
        for path, v in jax.tree_util.tree_leaves_with_path(p)
    }


class TestRpnTrainStep:
    def test_step_runs_and_respects_freezing(self):
        cfg = tiny_config("vgg16")
        model, variables = init_model(jax.random.PRNGKey(0), cfg)
        params = variables["params"]
        tx = make_optimizer(
            params, cfg.model.network, cfg.model.freeze_blocks, 1e-3,
            weight_decay=1e-4, freeze_modules=("det_head",),
        )
        state = pipeline.TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        step = jax.jit(
            pipeline.make_rpn_train_step(cfg, model, tx, variables.get("batch_stats", {}))
        )
        batch = tiny_batch(cfg)
        keys = jax.random.split(jax.random.PRNGKey(1), 2)
        new_state, metrics = step(state, batch, keys)

        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["rpn_cls"]) > 0

        before = flat_params(params)
        after = flat_params(new_state.params)
        # frozen blocks 1-2 unchanged; block 5 and rpn head moved
        assert np.array_equal(before["backbone/block1_conv1/kernel"], after["backbone/block1_conv1/kernel"])
        assert np.array_equal(before["backbone/block2_conv2/kernel"], after["backbone/block2_conv2/kernel"])
        assert not np.array_equal(before["backbone/block5_conv3/kernel"], after["backbone/block5_conv3/kernel"])
        assert not np.array_equal(before["rpn_head/rpn_conv1/kernel"], after["rpn_head/rpn_conv1/kernel"])
        # det head got no gradient signal from the RPN loss
        assert np.array_equal(before["det_head/fc1/kernel"], after["det_head/fc1/kernel"])

    def test_loss_decreases_over_steps(self):
        cfg = tiny_config("vgg16")
        model, variables = init_model(jax.random.PRNGKey(0), cfg)
        params = variables["params"]
        tx = make_optimizer(params, "vgg16", (1, 2), 1e-3)
        state = pipeline.TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        step = jax.jit(
            pipeline.make_rpn_train_step(cfg, model, tx, variables.get("batch_stats", {}))
        )
        batch = tiny_batch(cfg)
        losses = []
        for i in range(8):
            keys = jax.random.split(jax.random.PRNGKey(i), 2)
            state, metrics = step(state, batch, keys)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]


class TestDetTrainStep:
    @pytest.mark.parametrize("heads_only", [False, True])
    def test_step_runs(self, heads_only):
        cfg = tiny_config("vgg16")
        model, variables = init_model(jax.random.PRNGKey(0), cfg)
        params = variables["params"]
        freeze_modules = ("backbone", "rpn_head") if heads_only else ("rpn_head",)
        tx = make_optimizer(
            params, "vgg16", cfg.model.freeze_blocks, 1e-3, freeze_modules=freeze_modules
        )
        state = pipeline.TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        step = jax.jit(
            pipeline.make_det_train_step(
                cfg, model, tx, variables.get("batch_stats", {}), heads_only=heads_only,
            )
        )
        batch = tiny_batch(cfg)
        keys = jax.random.split(jax.random.PRNGKey(3), 2)
        rpn_vs = jax.device_put(variables)
        new_state, metrics = step(state, batch, keys, rpn_vs)
        assert np.isfinite(float(metrics["loss"]))
        assert int(metrics["num_valid_images"]) >= 1

        before = flat_params(params)
        after = flat_params(new_state.params)
        assert not np.array_equal(before["det_head/fc1/kernel"], after["det_head/fc1/kernel"])
        if heads_only:
            assert np.array_equal(
                before["backbone/block5_conv3/kernel"], after["backbone/block5_conv3/kernel"]
            )


def test_param_labels_norm_frozen():
    cfg = tiny_config("vgg16")
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, network="resnet50"))
    _, variables = init_model(jax.random.PRNGKey(0), cfg)
    labels = param_labels(variables["params"], "resnet50", (1, 2, 3))
    flat = flat_params(labels)
    assert flat["backbone/bn_conv1/scale"] == "frozen"
    assert flat["backbone/res2a/bn2a_branch2a/scale"] == "frozen"
    assert flat["backbone/res2a/res2a_branch2a/kernel"] == "frozen"  # block 2 frozen
    assert flat["backbone/res4a/res4a_branch2a/kernel"] == "train"
    assert flat["det_head/stage5/res5a/res5a_branch2a/kernel"] == "train"
    assert flat["det_head/stage5/res5a/bn5a_branch2a/scale"] == "frozen"


class TestJointTrainStep:
    def test_joint_step_trains_all_heads(self):
        cfg = tiny_config("vgg16")
        model, variables = init_model(jax.random.PRNGKey(0), cfg)
        params = variables["params"]
        tx = make_optimizer(params, "vgg16", cfg.model.freeze_blocks, 1e-3)
        state = pipeline.TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        step = jax.jit(pipeline.make_joint_train_step(cfg, model, tx, {}))
        batch = tiny_batch(cfg)
        losses = []
        for i in range(5):
            keys = jax.random.split(jax.random.PRNGKey(i), 2)
            state, metrics = step(state, batch, keys)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]

        after = flat_params(state.params)
        before = flat_params(params)
        # every head trained in one step: backbone block5, rpn head, det head
        for k in (
            "backbone/block5_conv3/kernel",
            "rpn_head/rpn_conv1/kernel",
            "det_head/fc1/kernel",
        ):
            assert not np.array_equal(before[k], after[k]), k


class TestFrozenPrefixStopGradient:
    """The structural stop_gradient at the frozen-prefix boundary must be
    update-identical to computing (and zeroing) the frozen gradients."""

    def test_frozen_prefix_stage_resolution(self):
        from faster_rcnn_tpu.parallel.freeze import frozen_prefix_stage

        assert frozen_prefix_stage("resnet50", (1, 2, 3)) == 3
        assert frozen_prefix_stage("resnet50", (2, 3)) == 0      # conv1 trains
        assert frozen_prefix_stage("resnet50", (1, 3)) == 1      # gap at 2
        assert frozen_prefix_stage("vgg16", (1, 2)) == 2
        assert frozen_prefix_stage("vgg16", ()) == 0
        assert frozen_prefix_stage("resnet50", (), ("backbone",)) == 4
        assert frozen_prefix_stage("vgg16", (1,), ("backbone",)) == 5

    @pytest.mark.parametrize("network", ["vgg16", "resnet50"])
    def test_joint_updates_identical_with_and_without_cut(self, network):
        cfg = tiny_config(network)
        model, variables = init_model(jax.random.PRNGKey(3), cfg)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx = make_optimizer(
            params, network, cfg.model.freeze_blocks, 1e-2,
            weight_decay=1e-4, clip_grad_norm=10.0,
        )

        def run(freeze_blocks_arg):
            state = pipeline.TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
            step = jax.jit(pipeline.make_joint_train_step(
                cfg, model, tx, batch_stats, freeze_blocks=freeze_blocks_arg
            ))
            batch = tiny_batch(cfg, seed=11)
            keys = jax.random.split(jax.random.PRNGKey(5), 2)
            state, metrics = step(state, batch, keys)
            state, metrics = step(state, batch, keys)
            return state.params, metrics

        # freeze_blocks=() forces stop_grad_stage=0 (the old full-backward
        # graph); the default resolves to cfg.model.freeze_blocks -> a real cut
        p_cut, m_cut = run(None)
        p_ref, m_ref = run(())
        assert float(m_cut["loss"]) == pytest.approx(float(m_ref["loss"]), abs=1e-5)
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_cut),
            jax.tree_util.tree_leaves_with_path(p_ref),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=1e-6,
                err_msg="/".join(str(k.key) for k in path))
