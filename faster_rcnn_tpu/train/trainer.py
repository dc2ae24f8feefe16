"""Training orchestration: the 4-step alternating scheme as one driver.

Reference wiring being reproduced (SURVEY.md §3.1-3.2, C14):

  step 1  RPN (backbone + rpn head) from ImageNet; freeze low blocks
          (train_rpn_step1.py:55-90).
  step 2  fresh detector (own backbone + det head) trained on proposals from
          the FROZEN step-1 RPN (train_det_step2.py:110-115).
  step 3  RPN again: backbone taken from step 2, fully frozen; rpn head
          retrained from scratch (train_rpn_step3.py:60-93).
  step 4  detector head only, on the frozen step-3 model's conv features
          (train_det_step4.py:69-95).  After step 4 the combined tree
          (backbone+rpn from step 3, det head from step 4) is the final model.

Differences by design (documented): LR phases are an optax schedule instead of
recompiles; batch size is >= 1 and data-parallel over the mesh; checkpoints
carry optimizer state and support auto-resume; iteration counts are in
*images*, so with batch B the reference's 80k single-image iterations
correspond to 80k/B steps (pass --phases accordingly).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from faster_rcnn_tpu.config import FasterRcnnConfig
from faster_rcnn_tpu.data.pipeline import TrainLoader
from faster_rcnn_tpu.data.voc import ImageRecord
from faster_rcnn_tpu.models.detector import init_model
from faster_rcnn_tpu.parallel import mesh as mesh_lib
from faster_rcnn_tpu.parallel.freeze import make_optimizer
from faster_rcnn_tpu.train import pipeline
from faster_rcnn_tpu.train.schedule import schedule_from_phases, total_iterations
from faster_rcnn_tpu.utils import checkpoint as ckpt_lib

ALL_BLOCKS = {"vgg16": (1, 2, 3, 4, 5), "resnet50": (1, 2, 3, 4), "resnet101": (1, 2, 3, 4)}


def step_freeze_spec(step, cfg: FasterRcnnConfig):
    """(freeze_blocks, freeze_modules) per training step."""
    net = cfg.model.network
    if step == 1:
        return cfg.model.freeze_blocks, ("det_head",)
    if step == 2:
        return cfg.model.freeze_blocks, ("rpn_head",)
    if step == 3:  # whole backbone frozen (train_rpn_step3.py:60-81)
        return ALL_BLOCKS[net], ("det_head", "backbone")
    if step == 4:  # heads only
        return ALL_BLOCKS[net], ("backbone", "rpn_head")
    if step == "joint":  # approximate-joint: everything trains together
        return cfg.model.freeze_blocks, ()
    raise ValueError(step)


def merge_params(dst, src, top_keys: Sequence[str]):
    """Copy top-level submodule trees (e.g. 'backbone') from src into dst."""
    out = dict(dst)
    for k in top_keys:
        if k in src:
            out[k] = src[k]
    return out


@dataclasses.dataclass
class TrainResult:
    params: Dict
    batch_stats: Dict
    final_metrics: Dict


def train_one_step(
    step: int,
    cfg: FasterRcnnConfig,
    records: Sequence[ImageRecord],
    class_mapping: Dict[str, int],
    workdir: str,
    init_params: Optional[Dict] = None,
    rpn_params: Optional[Dict] = None,
    batch_size: Optional[int] = None,
    save_frequency: Optional[int] = None,
    log_every: int = 20,
    max_steps: Optional[int] = None,
    seed: int = 0,
    devices=None,
    multihost: bool = False,
    uint8_pipeline: bool = False,
) -> TrainResult:
    """Run one of the 4 training steps to completion (with auto-resume).

    Args:
      init_params: starting parameter tree (handoff from earlier steps);
        fresh init if None.
      rpn_params: frozen RPN parameter tree for proposal generation
        (required for steps 2/4).
      multihost: build the mesh over every process's devices and feed the
        global batch from per-host dataset shards (parallel/multihost.py).
        ``batch_size`` stays the GLOBAL batch.  With one process this is
        behaviorally identical to the local mesh path.
      uint8_pipeline: ship raw uint8 RGB canvases and preprocess on device
        (4x less host->device traffic; train/pipeline.ingest_images).  The
        CLI default; off here so library callers / goldens keep exact
        float-path numerics.
    """
    is_rpn_step = step in (1, 3) or step == "joint"
    batch_size = batch_size or cfg.train.batch_size
    save_frequency = save_frequency or cfg.train.save_frequency

    model, variables = init_model(jax.random.PRNGKey(seed), cfg)
    batch_stats = variables.get("batch_stats", {})
    params = init_params if init_params is not None else variables["params"]
    # the step fn donates its state buffers; copy so callers' trees (shared
    # across the 4-step handoff) survive this step's training
    params = jax.tree_util.tree_map(jnp.array, params)

    lr = schedule_from_phases(cfg.train.phases)
    freeze_blocks, freeze_modules = step_freeze_spec(step, cfg)
    tx = make_optimizer(
        params,
        cfg.model.network,
        freeze_blocks,
        lr,
        optimizer=cfg.train.optimizer,
        momentum=cfg.train.momentum,
        weight_decay=cfg.model.weight_decay,
        freeze_modules=freeze_modules,
        clip_grad_norm=cfg.train.clip_grad_norm,
    )

    step_fns: Dict = {}
    rpn_vs = (
        None
        if is_rpn_step
        else jax.device_put({"params": rpn_params, "batch_stats": batch_stats})
    )

    def step_fn_for(canvas):
        """One compiled executable per canvas (landscape/portrait buckets)."""
        if canvas not in step_fns:
            cfg_c = cfg.replace(
                data=dataclasses.replace(cfg.data, canvas_h=canvas[0], canvas_w=canvas[1])
            )
            fkw = dict(freeze_blocks=freeze_blocks, freeze_modules=freeze_modules)
            if step == "joint":
                fn = pipeline.make_joint_train_step(cfg_c, model, tx, batch_stats, **fkw)
            elif is_rpn_step:
                fn = pipeline.make_rpn_train_step(cfg_c, model, tx, batch_stats, **fkw)
            else:
                fn = pipeline.make_det_train_step(
                    cfg_c, model, tx, batch_stats, heads_only=(step == 4), **fkw
                )
            step_fns[canvas] = jax.jit(fn, donate_argnums=(0,))
        return step_fns[canvas]

    state = pipeline.TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    ckpt_dir = os.path.join(workdir, f"step{step}")  # "stepjoint" for joint mode
    start = ckpt_lib.latest_step(ckpt_dir)
    if start is not None:
        restored = ckpt_lib.restore(ckpt_dir, start, template={"state": state})
        state = restored["state"]
        print(f"[step {step}] resumed from iteration {start}")
        start_iter = int(start)
    else:
        start_iter = 0

    total = max_steps if max_steps is not None else total_iterations(cfg.train.phases)

    # Multi-device: shard the batch over the 'data' mesh axis; jit propagates
    # the sharding through the step and inserts the gradient all-reduce.
    if multihost:
        from faster_rcnn_tpu.parallel import multihost as mh

        mh.maybe_initialize()
        if os.environ.get("JAX_COORDINATOR_ADDRESS") and not mh.is_initialized():
            # a coordinator is configured but distributed init never happened
            # (it must run before ANY JAX call — init_model above already
            # compiled).  Degenerating silently would train N independent
            # copies; fail loudly instead.  The CLI initializes at the top of
            # main, before any JAX use (cli/train.py).  is_initialized()
            # tracks successful init in a module flag, so a legitimately
            # initialized 1-process distributed run (JAX_NUM_PROCESSES=1)
            # passes this guard (advisor r3).
            raise RuntimeError(
                "JAX_COORDINATOR_ADDRESS is set but jax.distributed is not "
                "initialized; call parallel.multihost.maybe_initialize() "
                "before any JAX computation (the train CLI does this)."
            )
        the_mesh = mh.global_mesh()
        local_bs = mh.local_batch_size(batch_size)
        records = mh.shard_records_for_host(records)
        loader = TrainLoader(records, class_mapping, cfg, local_bs, seed=seed,
                             uint8=uint8_pipeline)
    else:
        avail = list(devices) if devices else jax.devices()
        n_data = min(len(avail), batch_size)
        use_mesh = n_data > 1 and batch_size % n_data == 0
        the_mesh = mesh_lib.create_mesh(devices=avail[:n_data]) if use_mesh else None
        loader = TrainLoader(records, class_mapping, cfg, batch_size, seed=seed,
                             uint8=uint8_pipeline)
    it = iter(loader)
    step_id = step if isinstance(step, int) else 5  # "joint"
    key = jax.random.PRNGKey(seed + 1000 * step_id)

    def put(batch):
        if multihost:
            from faster_rcnn_tpu.parallel import multihost as mh

            return mh.global_batch(the_mesh, batch, batch_size)
        if the_mesh is not None:
            return mesh_lib.shard_batch(the_mesh, batch)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    # Preemption safety: on SIGTERM/SIGINT checkpoint the current state before
    # exiting so auto-resume continues from here (the reference loses up to
    # 2,000 iterations on preemption, SURVEY.md §5.3).
    import signal

    current = {"state": state, "iter": start_iter}
    prev_handlers = {}

    def _save_and_exit(signum, frame):
        print(f"[step {step}] signal {signum}: checkpointing at iter {current['iter']}")
        ckpt_lib.save(ckpt_dir, current["iter"], {"state": current["state"]}, wait=True)
        raise SystemExit(128 + signum)

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _save_and_exit)
        except ValueError:  # non-main thread
            pass

    metrics = {}
    t0 = time.time()
    is_primary = jax.process_index() == 0  # logging host in multihost runs
    try:
        # one-batch transfer lookahead: the H2D of batch i+1 is enqueued right
        # after step i is dispatched, so it rides the async queue under compute
        canvas, host_batch = next(it)
        pending = (canvas, put(host_batch))
        for i in range(start_iter, total):
            canvas, batch = pending
            key, sub = jax.random.split(key)
            if multihost:
                from faster_rcnn_tpu.parallel import multihost as mh

                keys = mh.global_keys(the_mesh, sub, batch_size)
            else:
                keys = jax.random.split(sub, batch_size)
                if the_mesh is not None:
                    keys = jax.device_put(keys, mesh_lib.batch_sharding(the_mesh))
            if is_rpn_step:
                state, metrics = step_fn_for(canvas)(state, batch, keys)
            else:
                state, metrics = step_fn_for(canvas)(state, batch, keys, rpn_vs)
            current["state"], current["iter"] = state, i + 1
            nxt_canvas, nxt_host = next(it)
            pending = (nxt_canvas, put(nxt_host))

            if (i + 1) % log_every == 0 and is_primary:
                m = {k: float(v) for k, v in metrics.items()}
                rate = (i + 1 - start_iter) * batch_size / (time.time() - t0)
                print(f"[step {step}] iter {i+1}/{total} {m} ({rate:.2f} img/s)")
                # structured metrics stream (replaces the reference's raw
                # prints, SURVEY.md §5.5) — one JSON line per log point
                os.makedirs(ckpt_dir, exist_ok=True)
                with open(os.path.join(ckpt_dir, "metrics.jsonl"), "a") as f:
                    import json

                    f.write(json.dumps({"iter": i + 1, "img_per_sec": round(rate, 2), **m}) + "\n")
            if (i + 1) % save_frequency == 0 or (i + 1) == total:
                # every process calls save: Orbax coordinates internally in
                # multihost runs (process 0 owns metadata/commit)
                ckpt_lib.save(ckpt_dir, i + 1, {"state": state}, wait=(i + 1 == total))
    finally:
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)
        it.close()  # stop the loader's prefetch workers (they'd leak otherwise)
    return TrainResult(
        params=state.params, batch_stats=batch_stats,
        final_metrics={k: float(v) for k, v in metrics.items()},
    )


def run_four_step_training(
    cfg: FasterRcnnConfig,
    records: Sequence[ImageRecord],
    class_mapping: Dict[str, int],
    workdir: str,
    steps: Sequence[int] = (1, 2, 3, 4),
    use_device_cache: bool = False,
    **kw,
) -> Dict[int, TrainResult]:
    """Drive steps 1..4 with the reference's weight handoff.

    ``use_device_cache=True`` routes each step through the zero-H2D scanned
    loop (train/device_cache.py) instead of the per-step host loader —
    records must then be UNFLIPPED (flip augmentation runs on device).
    Options specific to the loader path (multihost, uint8_pipeline,
    log_every, max_steps) are rejected there rather than silently ignored.
    """
    if use_device_cache:
        from faster_rcnn_tpu.train.device_cache import train_cached

        bad = [k for k in ("multihost", "uint8_pipeline", "log_every", "max_steps")
               if kw.get(k)]
        if bad:
            raise ValueError(f"device-cache training does not support: {bad}")
        kw = {k: v for k, v in kw.items() if k in
              ("batch_size", "save_frequency", "seed", "devices", "chunk_steps")}
        train_fn = train_cached
    else:
        train_fn = train_one_step

    results: Dict[int, TrainResult] = {}
    model, variables = init_model(jax.random.PRNGKey(cfg.train.seed), cfg)
    fresh = variables["params"]

    step1 = step2 = step3 = None
    for s in steps:
        if s == "joint":
            r = train_fn("joint", cfg, records, class_mapping, workdir, **kw)
        elif s == 1:
            r = train_fn(1, cfg, records, class_mapping, workdir, **kw)
            step1 = r.params
        elif s == 2:
            rpn = step1 if step1 is not None else _load_step_params(workdir, 1, fresh)
            r = train_fn(
                2, cfg, records, class_mapping, workdir,
                init_params=fresh, rpn_params=rpn, **kw,
            )
            step2 = r.params
        elif s == 3:
            det2 = step2 if step2 is not None else _load_step_params(workdir, 2, fresh)
            # backbone from step 2, rpn head fresh (train_rpn_step3.py:92-93)
            init = merge_params(fresh, det2, ["backbone"])
            r = train_fn(3, cfg, records, class_mapping, workdir, init_params=init, **kw)
            step3 = r.params
        elif s == 4:
            rpn3 = step3 if step3 is not None else _load_step_params(workdir, 3, fresh)
            init = merge_params(fresh, rpn3, ["backbone", "rpn_head"])
            r = train_fn(
                4, cfg, records, class_mapping, workdir,
                init_params=init, rpn_params=rpn3, **kw,
            )
        else:
            raise ValueError(s)
        results[s] = r
    return results


def _load_step_params(workdir: str, step, template_params=None):
    """Load a step's latest checkpointed params (handoff / CLI loading)."""
    del template_params  # orbax restores raw trees without one
    restored = ckpt_lib.restore(os.path.join(workdir, f"step{step}"))
    return restored["state"]["params"] if isinstance(restored, dict) else restored.params
