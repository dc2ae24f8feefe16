"""Where do the joint train step's 456 cold-compile seconds go? (VERDICT r4 #5)

Times ``jit(...).lower(abstract args).compile()`` wall-clock for staged
variants of the production programs at the VOC canvas, with the persistent
compilation cache DISABLED so every measurement is a true cold compile.
Ablations isolate the suspects named in the verdict:

  * pre-NMS size (6000 -> 1024 -> 256): the blocked-NMS while-loop's
    unrolled tile count under vmap+grad;
  * NMS tile (512 -> 128): tile-count scaling at fixed pre-NMS;
  * RoI-align impl (pallas vs einsum): Mosaic kernel compile cost;
  * rpn-only vs det-only vs joint: which half owns the time;
  * batch 16 vs 2: whether vmap width multiplies compile time.

Usage: python scripts/bench_compile.py [selector ...]
  selectors (default: core): core | nms | roi | batch | all
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

SEL = set(sys.argv[1:]) or {"core"}
if "all" in SEL:
    SEL = {"core", "nms", "roi", "batch"}


def compile_time(name, fn, *abstract_args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*abstract_args)
    t_lower = time.time() - t0
    t0 = time.time()
    lowered.compile()
    t_comp = time.time() - t0
    print(f"{name:58s} lower {t_lower:6.1f}s  compile {t_comp:7.1f}s",
          flush=True)
    return t_comp


def make_args(cfg, batch):
    h, w = cfg.data.canvas
    g = cfg.data.max_gt_boxes
    sd = jax.ShapeDtypeStruct
    batch_abs = {
        "image": sd((batch, h, w, 3), jnp.float32),
        "gt_boxes": sd((batch, g, 4), jnp.float32),
        "gt_class": sd((batch, g), jnp.int32),
        "gt_valid": sd((batch, g), jnp.bool_),
        "img_hw": sd((batch, 2), jnp.int32),
    }
    keys = sd((batch, 2), jnp.uint32)
    return batch_abs, keys


def build(cfg):
    from faster_rcnn_tpu.models.detector import init_model
    from faster_rcnn_tpu.parallel.freeze import make_optimizer
    from faster_rcnn_tpu.train import pipeline

    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(params, cfg.model.network, cfg.model.freeze_blocks,
                        1e-3, clip_grad_norm=10.0)
    state = pipeline.TrainState(params, tx.init(params),
                                jnp.zeros((), jnp.int32))
    state_abs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    return model, tx, batch_stats, state, state_abs


def variant(tag, cfg, batch, kind="joint"):
    from faster_rcnn_tpu.train import pipeline

    model, tx, batch_stats, _, state_abs = build(cfg)
    mk = {"joint": pipeline.make_joint_train_step,
          "rpn": pipeline.make_rpn_train_step}[kind]
    step = mk(cfg, model, tx, batch_stats)
    batch_abs, keys = make_args(cfg, batch)
    return compile_time(f"{tag} [{kind}, B={batch}]", step, state_abs,
                        batch_abs, keys)


def det_variant(tag, cfg, batch):
    from faster_rcnn_tpu.models.detector import init_model
    from faster_rcnn_tpu.train import pipeline

    model, tx, batch_stats, state, state_abs = build(cfg)
    step = pipeline.make_det_train_step(cfg, model, tx, batch_stats)
    batch_abs, keys = make_args(cfg, batch)
    rpn_abs = {
        "params": jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state.params),
        "batch_stats": batch_stats,
    }
    return compile_time(f"{tag} [det, B={batch}]", step, state_abs,
                        batch_abs, keys, rpn_abs)


def main():
    # true cold compiles: no persistent cache
    jax.config.update("jax_compilation_cache_dir", None)

    from faster_rcnn_tpu.config import voc_config

    cfg = voc_config("resnet50")
    print(f"canvas {cfg.data.canvas}, pre_nms {cfg.rpn.train_pre_nms}, "
          f"tile {cfg.rpn.nms_tile}, roi {cfg.det.roi_align_impl}")

    if "core" in SEL:
        variant("prod joint", cfg, 16, "joint")
        variant("rpn-only", cfg, 16, "rpn")
        det_variant("det-only", cfg, 16)

    if "nms" in SEL:
        for pre in (1024, 256):
            c = cfg.replace(rpn=dataclasses.replace(cfg.rpn, train_pre_nms=pre))
            variant(f"pre_nms={pre}", c, 16, "joint")
        c = cfg.replace(rpn=dataclasses.replace(cfg.rpn, nms_tile=128))
        variant("nms_tile=128", c, 16, "joint")

    if "roi" in SEL:
        c = cfg.replace(det=dataclasses.replace(cfg.det, roi_align_impl="einsum"))
        variant("roi=einsum", c, 16, "joint")

    if "batch" in SEL:
        variant("B=2", cfg, 2, "joint")


if __name__ == "__main__":
    main()
