"""End-to-end trainer orchestration test: steps 1+2 with handoff, checkpoints,
and resume on a synthetic mini-VOC dataset (tiny shapes, CPU)."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from faster_rcnn_tpu.data.voc import VOC_CLASS_MAPPING, load_dataset
from faster_rcnn_tpu.train.trainer import run_four_step_training, train_one_step
from faster_rcnn_tpu.utils import checkpoint as ckpt_lib

from tests.test_data import make_voc_tree
from tests.test_train_step import tiny_config


@pytest.fixture
def tiny_voc(tmp_path):
    root = str(tmp_path / "VOC")
    make_voc_tree(
        root,
        [
            ("000001", 120, 90, [("dog", False, 20, 20, 60, 60)]),
            ("000002", 120, 90, [("cat", False, 30, 10, 90, 70), ("dog", False, 5, 5, 40, 40)]),
            ("000003", 120, 90, [("person", False, 10, 30, 80, 85)]),
            ("000004", 120, 90, [("car", False, 50, 20, 110, 80)]),
        ],
    )
    return root


def cfg_for_tiny_voc():
    cfg = tiny_config("vgg16")
    # classes must cover VOC names used above
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, num_classes=len(VOC_CLASS_MAPPING)),
        train=dataclasses.replace(cfg.train, phases=((4, 1e-3),), batch_size=2),
    )
    return cfg


def test_steps_1_2_with_handoff_and_resume(tiny_voc, tmp_path):
    cfg = cfg_for_tiny_voc()
    records, _ = load_dataset(
        [tiny_voc], "trainval", flip=False,
        resize_min=cfg.data.resize_min, resize_max=cfg.data.resize_max,
    )
    assert len(records) == 4
    workdir = str(tmp_path / "work")

    results = run_four_step_training(
        cfg, records, VOC_CLASS_MAPPING, workdir,
        steps=(1, 2), batch_size=2, save_frequency=2, seed=0,
    )
    assert set(results) == {1, 2}
    for s, r in results.items():
        assert np.isfinite(r.final_metrics["loss"]), (s, r.final_metrics)

    # checkpoints exist for both steps at the final iteration
    assert ckpt_lib.latest_step(os.path.join(workdir, "step1")) == 4
    assert ckpt_lib.latest_step(os.path.join(workdir, "step2")) == 4

    # resume: re-running step 1 restores from iter 4 and does nothing more
    r1b = train_one_step(
        1, cfg, records, VOC_CLASS_MAPPING, workdir,
        batch_size=2, save_frequency=2, seed=0,
    )
    # params equal the checkpointed final step-1 params
    restored = ckpt_lib.restore(os.path.join(workdir, "step1"))
    w_ck = restored["state"]["params"]["backbone"]["block5_conv3"]["kernel"]
    w_rs = np.asarray(r1b.params["backbone"]["block5_conv3"]["kernel"])
    np.testing.assert_array_equal(w_ck, w_rs)


def test_four_step_via_device_cache(tiny_voc, tmp_path):
    """run_four_step_training(use_device_cache=True): the zero-H2D scanned
    loop drives the same weight handoff (steps 1->2) and checkpoint layout
    as the loader path, and loader-only options are rejected loudly."""
    cfg = cfg_for_tiny_voc()
    records, _ = load_dataset(
        [tiny_voc], "trainval", flip=False,
        resize_min=cfg.data.resize_min, resize_max=cfg.data.resize_max,
    )
    workdir = str(tmp_path / "work_dc")
    results = run_four_step_training(
        cfg, records, VOC_CLASS_MAPPING, workdir,
        steps=(1, 2), batch_size=2, save_frequency=100, seed=0,
        use_device_cache=True,
    )
    assert set(results) == {1, 2}
    for s, r in results.items():
        assert np.isfinite(r.final_metrics["loss"]), (s, r.final_metrics)
    assert ckpt_lib.latest_step(os.path.join(workdir, "step1")) == 4
    assert ckpt_lib.latest_step(os.path.join(workdir, "step2")) == 4

    with pytest.raises(ValueError, match="does not support"):
        run_four_step_training(
            cfg, records, VOC_CLASS_MAPPING, workdir, steps=(1,),
            use_device_cache=True, multihost=True,
        )


@pytest.mark.slow
def test_steps_3_4_handoff(tiny_voc, tmp_path):
    """Steps 3 (frozen-backbone RPN) and 4 (heads-only detector) with the
    full weight handoff chain from steps 1-2."""
    cfg = cfg_for_tiny_voc()
    records, _ = load_dataset(
        [tiny_voc], "trainval", flip=False,
        resize_min=cfg.data.resize_min, resize_max=cfg.data.resize_max,
    )
    workdir = str(tmp_path / "work34")

    results = run_four_step_training(
        cfg, records, VOC_CLASS_MAPPING, workdir,
        steps=(1, 2, 3, 4), batch_size=2, save_frequency=4, seed=0,
    )
    assert set(results) == {1, 2, 3, 4}

    # step 3: backbone must equal step 2's backbone (frozen, transplanted)
    import jax.tree_util as jtu

    def leaf_equal(a, b):
        return np.array_equal(np.asarray(a), np.asarray(b))

    bb2 = results[2].params["backbone"]
    bb3 = results[3].params["backbone"]
    assert all(jtu.tree_leaves(jtu.tree_map(leaf_equal, bb2, bb3)))
    # step 3 trained its rpn head (vs fresh init in step 1's graph lineage)
    # step 4: backbone+rpn frozen at step-3 values, det head trained
    bb4 = results[4].params["backbone"]
    assert all(jtu.tree_leaves(jtu.tree_map(leaf_equal, bb3, bb4)))
    rpn3 = results[3].params["rpn_head"]
    rpn4 = results[4].params["rpn_head"]
    assert all(jtu.tree_leaves(jtu.tree_map(leaf_equal, rpn3, rpn4)))
    # det head differs from step 2's (retrained from fresh init on frozen feats)
    d2 = np.asarray(results[2].params["det_head"]["fc1"]["kernel"])
    d4 = np.asarray(results[4].params["det_head"]["fc1"]["kernel"])
    assert not np.array_equal(d2, d4)


def test_multihost_trainer_path(tiny_voc, tmp_path):
    """train_one_step with multihost=True (single process degenerates to the
    global-mesh + make_array_from_process_local_data path) runs and
    checkpoints exactly like the local path.  Uses step 1 (RPN) — the
    cheapest compile; the multihost plumbing (mesh, record shards, global
    batch/key assembly) is step-independent, and the sharded joint step is
    covered by test_parallel.TestMultihost."""
    cfg = cfg_for_tiny_voc()
    records, _ = load_dataset(
        [tiny_voc], "trainval", flip=False,
        resize_min=cfg.data.resize_min, resize_max=cfg.data.resize_max,
    )
    r = train_one_step(
        1, cfg, records, VOC_CLASS_MAPPING, str(tmp_path / "mh"),
        batch_size=8, max_steps=2, save_frequency=2, multihost=True,
    )
    assert np.isfinite(r.final_metrics["loss"])
    assert ckpt_lib.latest_step(str(tmp_path / "mh" / "step1")) == 2
