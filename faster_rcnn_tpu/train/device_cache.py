"""Device-resident dataset + on-device multi-step training (zero-H2D loop).

The reference reloads and re-decodes every image from disk inside its hot
loop (shapes.py:24-29).  The round-2 TrainLoader already fixed that on the
host side; this module goes one step further for the TPU: the ENTIRE dataset
lives in HBM as raw uint8 canvases (4x smaller than float32 — VOC2007
trainval at 608x1024 is ~4.7 GB), and training runs as ``lax.scan`` over K
steps inside ONE jitted program:

    batch  = gather(images, idx)            # HBM gather, no host involved
    batch  = hflip(batch) where flip bit    # on-device flip augmentation
    ...the exact same loss/update body as train/pipeline.py...

Per K steps the host sends only a (K, B) int32 index array, a (K, B) flip
bitmap and one RNG key — a few KB.  This removes the host->device transfer
and dispatch round-trip from the steady state entirely, which matters both
on real pods (input pipeline jitter) and extremely on the development
tunnel, where every dispatch pays 1-6 s RTT (NOTES.md round 2 "the tunnel
lies two ways"): the per-step loop trains at ~0.3 img/s through the tunnel,
the scanned loop at device speed.

Augmentation parity: the per-record flip doubling of the reference
(args_util.py:24-26) becomes a per-sample flip bit.  Pixels mirror within
the image's valid width (padding stays on the right) and boxes map
x -> w - x exactly like GtBox.hflip / ImageRecord.load_pixels.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_tpu.config import FasterRcnnConfig
from faster_rcnn_tpu.data.pipeline import canvas_for, prepare_example
from faster_rcnn_tpu.data.voc import ImageRecord


@dataclasses.dataclass
class DeviceBucket:
    """One orientation bucket, fully device-resident."""

    canvas: Tuple[int, int]
    images: jax.Array    # (N, H, W, 3) uint8
    gt_boxes: jax.Array  # (N, G, 4) f32
    gt_class: jax.Array  # (N, G) i32
    gt_valid: jax.Array  # (N, G) bool
    img_hw: jax.Array    # (N, 2) i32

    @property
    def n(self) -> int:
        return int(self.images.shape[0])


def build_device_dataset(
    records: Sequence[ImageRecord],
    class_mapping: Dict[str, int],
    cfg: FasterRcnnConfig,
    upload_chunk: int = 64,
    sharding=None,
) -> Dict[Tuple[int, int], DeviceBucket]:
    """Decode + canvas-pad every record once (uint8) and upload per bucket.

    Records must be UNFLIPPED (flip happens on device via the flip bit);
    flipped records are rejected to avoid double augmentation.
    """
    buckets: Dict[Tuple[int, int], List[ImageRecord]] = {}
    for r in records:
        if r.flipped:
            raise ValueError(
                "build_device_dataset expects unflipped records; use "
                "load_dataset(flip=False) — flip augmentation happens on device"
            )
        buckets.setdefault(canvas_for(r, cfg), []).append(r)

    out: Dict[Tuple[int, int], DeviceBucket] = {}
    for canvas, recs in buckets.items():
        parts = {k: [] for k in ("image", "gt_boxes", "gt_class", "gt_valid", "img_hw")}
        dev_chunks: List[Dict[str, jax.Array]] = []
        for i, r in enumerate(recs):
            ex = prepare_example(r, class_mapping, cfg, canvas, uint8=True)
            for k in parts:
                parts[k].append(ex[k])
            if len(parts["image"]) == upload_chunk or i == len(recs) - 1:
                chunk = {k: np.stack(v) for k, v in parts.items()}
                dev_chunks.append(
                    {k: jax.device_put(v, sharding) for k, v in chunk.items()}
                )
                parts = {k: [] for k in parts}
        cat = {
            k: jnp.concatenate([c[k] for c in dev_chunks]) for k in dev_chunks[0]
        }
        out[canvas] = DeviceBucket(
            canvas=canvas, images=cat["image"], gt_boxes=cat["gt_boxes"],
            gt_class=cat["gt_class"], gt_valid=cat["gt_valid"], img_hw=cat["img_hw"],
        )
    return out


def _flip_batch(images, gt_boxes, gt_valid, img_hw, flip):
    """Mirror selected samples within their valid width.

    ``lax.rev`` mirrors the whole canvas (padding would land on the left);
    rolling left by (canvas_w - w) puts the image back at column 0 with the
    padding on the right — matching the host loader's layout exactly.  GT
    padding rows (``~gt_valid``) stay untouched (zeros), as in the host
    loader.
    """
    cw = images.shape[2]

    def one(img, boxes, valid, hw, f):
        w = hw[1]
        rev = jnp.roll(img[:, ::-1, :], shift=w - cw, axis=1)
        img_out = jnp.where(f, rev, img)
        wf = w.astype(jnp.float32)
        flipped_boxes = jnp.stack(
            [wf - boxes[:, 2], boxes[:, 1], wf - boxes[:, 0], boxes[:, 3]], axis=1
        )
        boxes_out = jnp.where(f & valid[:, None], flipped_boxes, boxes)
        return img_out, boxes_out

    return jax.vmap(one)(images, gt_boxes, gt_valid, img_hw, flip)


def make_scan_train_fn(
    step_fn: Callable,
    batch_size: int,
    has_rpn_vars: bool = False,
    batch_sharding=None,
):
    """Wrap a pipeline step fn into (state, idx (K,B), flip (K,B), key, data
    [, rpn]) -> (state, stacked_metrics) running all K steps on device.

    ``data`` is the device-resident bucket's array dict — passed as a jit
    ARGUMENT (device-resident, never a traced constant).  ``step_fn`` is
    exactly a make_*_train_step product — the scan body calls it unmodified,
    so numerics match the per-step loop given the same batch content and
    keys.

    ``batch_sharding`` (a NamedSharding over the 'data' mesh axis) makes the
    scanned loop data-parallel: the gathered per-step batch and RNG keys are
    sharding-constrained batch-over-'data', so XLA partitions the whole step
    (fwd + targets + bwd) across the mesh and inserts the gradient
    all-reduce, exactly like trainer.train_one_step's per-step path.
    """

    def run(state, idx, flip, key, data, rpn_vars=None):
        def body(carry, per_step):
            state, step_i = carry
            ids, fl = per_step
            img = jnp.take(data["images"], ids, axis=0)
            gtb = jnp.take(data["gt_boxes"], ids, axis=0)
            gtv = jnp.take(data["gt_valid"], ids, axis=0)
            hw = jnp.take(data["img_hw"], ids, axis=0)
            img, gtb = _flip_batch(img, gtb, gtv, hw, fl)
            batch = {
                "image": img,
                "gt_boxes": gtb,
                "gt_class": jnp.take(data["gt_class"], ids, axis=0),
                "gt_valid": gtv,
                "img_hw": hw,
            }
            sub = jax.random.fold_in(key, step_i)
            keys = jax.random.split(sub, batch_size)
            if batch_sharding is not None:
                batch = jax.tree_util.tree_map(
                    lambda x: jax.lax.with_sharding_constraint(x, batch_sharding),
                    batch,
                )
                keys = jax.lax.with_sharding_constraint(keys, batch_sharding)
            if has_rpn_vars:
                state, metrics = step_fn(state, batch, keys, rpn_vars)
            else:
                state, metrics = step_fn(state, batch, keys)
            return (state, step_i + 1), metrics

        (state, _), metrics = jax.lax.scan(body, (state, jnp.int32(0)), (idx, flip))
        return state, metrics

    if has_rpn_vars:
        return jax.jit(run, donate_argnums=(0,))
    return jax.jit(lambda s, i, f, k, d: run(s, i, f, k, d), donate_argnums=(0,))


def epoch_schedule(
    buckets: Dict[Tuple[int, int], DeviceBucket],
    total_steps: int,
    batch_size: int,
    seed: int,
    flip_augment: bool = True,
) -> List[Tuple[Tuple[int, int], np.ndarray, np.ndarray]]:
    """Host-side sampling plan: per-bucket (canvas, idx (K,B), flip (K,B)).

    Epochs shuffle the (record, flip) pairs of each bucket, mirroring the
    TrainLoader's continuous round-robin; steps are allocated to buckets
    proportionally to their size so every image is visited.
    """
    rng = np.random.RandomState(seed)
    sizes = {c: b.n * (2 if flip_augment else 1) for c, b in buckets.items()}
    total = sum(sizes.values())
    # Largest-remainder apportionment: per-bucket steps sum EXACTLY to
    # total_steps (int(round(...)) per bucket could drift by a few steps and
    # silently starve small buckets — advisor r3).  Every non-empty bucket
    # gets >= 1 step whenever total_steps >= number of buckets.
    canvases = list(buckets)
    quotas = np.array([total_steps * sizes[c] / total for c in canvases])
    alloc = np.floor(quotas).astype(int)
    if total_steps >= len(canvases):
        alloc = np.maximum(alloc, 1)
    while alloc.sum() > total_steps:  # min-1 bump can overshoot; trim largest
        over = np.where(alloc > 1, alloc - quotas, -np.inf)  # keep the min-1 floor
        alloc[int(np.argmax(over))] -= 1
    remainder = quotas - alloc
    for _ in range(total_steps - int(alloc.sum())):
        j = int(np.argmax(remainder))
        alloc[j] += 1
        remainder[j] -= 1.0
    assert alloc.sum() == total_steps, (alloc, total_steps)
    plan: List[Tuple[Tuple[int, int], np.ndarray, np.ndarray]] = []
    for canvas, steps in zip(canvases, (int(a) for a in alloc)):
        b = buckets[canvas]
        if steps == 0:
            continue
        need = steps * batch_size
        pool: List[Tuple[int, int]] = []
        while len(pool) < need:
            pairs = [
                (i, f) for i in range(b.n)
                for f in ((0, 1) if flip_augment else (0,))
            ]
            order = rng.permutation(len(pairs))
            pool.extend(pairs[j] for j in order)
        arr = np.array(pool[:need], np.int32).reshape(steps, batch_size, 2)
        plan.append((canvas, arr[..., 0], arr[..., 1].astype(bool)))
    return plan


def train_cached(
    step,
    cfg: FasterRcnnConfig,
    records: Sequence[ImageRecord],
    class_mapping: Dict[str, int],
    workdir: str,
    batch_size: Optional[int] = None,
    rpn_params=None,
    init_params=None,
    seed: int = 0,
    chunk_steps: int = 50,
    log_cb=print,
    devices=None,
    save_frequency: Optional[int] = None,
):
    """Drive one training step (1..4 or 'joint') from the device cache.

    Same optimizer/freeze/schedule wiring and checkpoint layout as
    trainer.train_one_step, but the inner loop is the scanned zero-H2D path.
    Returns a TrainResult; checkpoints land in workdir/step{step} so
    cli.detect / cli.evaluate load them exactly like a loader-trained run.

    Parity with trainer.train_one_step on the reliability axes (VERDICT r3):
      * data parallel: with >1 device (or ``devices`` given) the dataset is
        uploaded to a ('data','model') mesh (replicated — the uint8 cache is
        shared; each *host* still holds only its own record shard in
        multihost runs) and every scanned step's batch is sharded over
        'data', so the compute runs SPMD with the gradient all-reduce on ICI;
      * checkpoint cadence: saves every ``save_frequency`` steps at chunk
        boundaries, plus on SIGTERM/SIGINT (preemption);
      * auto-resume: restarts from the latest workdir/step{step} checkpoint.
        The sampling plan and per-chunk RNG keys are pure functions of
        (seed, chunk index), so a resumed run replays the exact remaining
        schedule — final state is identical to an uninterrupted run.
    """
    import os
    import signal

    from faster_rcnn_tpu.models.detector import init_model
    from faster_rcnn_tpu.parallel import mesh as mesh_lib
    from faster_rcnn_tpu.parallel.freeze import make_optimizer
    from faster_rcnn_tpu.train import pipeline
    from faster_rcnn_tpu.train.schedule import schedule_from_phases, total_iterations
    from faster_rcnn_tpu.train.trainer import TrainResult, step_freeze_spec
    from faster_rcnn_tpu.utils import checkpoint as ckpt_lib

    is_rpn_step = step in (1, 3) or step == "joint"
    batch_size = batch_size or cfg.train.batch_size
    save_frequency = save_frequency or cfg.train.save_frequency

    avail = list(devices) if devices else jax.devices()
    n_data = min(len(avail), batch_size)
    use_mesh = n_data > 1 and batch_size % n_data == 0
    the_mesh = mesh_lib.create_mesh(devices=avail[:n_data]) if use_mesh else None
    data_sharding = mesh_lib.replicated(the_mesh) if use_mesh else None
    b_sharding = mesh_lib.batch_sharding(the_mesh) if use_mesh else None

    model, variables = init_model(jax.random.PRNGKey(seed), cfg)
    batch_stats = variables.get("batch_stats", {})
    params = init_params if init_params is not None else variables["params"]
    params = jax.tree_util.tree_map(jnp.array, params)

    lr = schedule_from_phases(cfg.train.phases)
    freeze_blocks, freeze_modules = step_freeze_spec(step, cfg)
    tx = make_optimizer(
        params, cfg.model.network, freeze_blocks, lr,
        optimizer=cfg.train.optimizer, momentum=cfg.train.momentum,
        weight_decay=cfg.model.weight_decay, freeze_modules=freeze_modules,
        clip_grad_norm=cfg.train.clip_grad_norm,
    )
    state = pipeline.TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    rpn_vs = (
        None if is_rpn_step
        else jax.device_put({"params": rpn_params, "batch_stats": batch_stats})
    )

    buckets = build_device_dataset(records, class_mapping, cfg,
                                   sharding=data_sharding)
    total = total_iterations(cfg.train.phases)
    plan = epoch_schedule(
        buckets, total, batch_size, seed=seed + 17,
        flip_augment=cfg.data.flip_augment,
    )

    ckpt_dir = os.path.join(workdir, f"step{step}")
    start = ckpt_lib.latest_step(ckpt_dir)
    if start is not None:
        restored = ckpt_lib.restore(ckpt_dir, start, template={"state": state})
        state = restored["state"]
        log_cb(f"[cached step {step}] resumed from iteration {start}")
        start = int(start)
    else:
        start = 0

    scan_fns = {}

    def scan_fn_for(canvas):
        if canvas not in scan_fns:
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
            scan_fns[canvas] = make_scan_train_fn(
                fn, batch_size, has_rpn_vars=not is_rpn_step,
                batch_sharding=b_sharding,
            )
        return scan_fns[canvas]

    base_key = jax.random.PRNGKey(seed + 1000 * (step if isinstance(step, int) else 5))
    metrics = {}
    done = 0
    chunk_idx = 0
    last_saved = start

    # Preemption safety (reference loses up to 2,000 iters, train_util.py:58-64;
    # trainer.py has the same handler for the per-step loop).
    current = {"state": state, "iter": start}
    prev_handlers = {}

    def _save_and_exit(signum, frame):
        if current["iter"] > last_saved:  # not already on disk (e.g. resume skip)
            log_cb(f"[cached step {step}] signal {signum}: checkpointing at "
                   f"iter {current['iter']}")
            ckpt_lib.save(ckpt_dir, current["iter"], {"state": current["state"]},
                          wait=True)
        raise SystemExit(128 + signum)

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _save_and_exit)
        except ValueError:  # non-main thread
            pass

    try:
        # interleave buckets chunk-by-chunk so LR schedule position
        # (state.step) advances roughly like the mixed-batch loader
        cursors = [[canvas, idx, flip, 0] for canvas, idx, flip in plan]
        while any(c[3] < c[1].shape[0] for c in cursors):
            for c in cursors:
                canvas, idx, flip, pos = c
                if pos >= idx.shape[0]:
                    continue
                k = min(chunk_steps, idx.shape[0] - pos)
                # per-chunk key is a pure function of the chunk index, so a
                # resumed run replays the identical remaining key stream
                sub = jax.random.fold_in(base_key, chunk_idx)
                chunk_idx += 1
                c[3] = pos + k
                done += k
                if done <= start:  # already covered by the restored checkpoint
                    continue
                data_args = buckets[canvas]
                fn = scan_fn_for(canvas)
                args = (
                    state,
                    jnp.asarray(idx[pos:pos + k]),
                    jnp.asarray(flip[pos:pos + k]),
                    sub,
                    dict(images=data_args.images, gt_boxes=data_args.gt_boxes,
                         gt_class=data_args.gt_class, gt_valid=data_args.gt_valid,
                         img_hw=data_args.img_hw),
                )
                if is_rpn_step:
                    state, mstack = fn(*args)
                else:
                    state, mstack = fn(*args, rpn_vs)
                current["state"], current["iter"] = state, done
                metrics = {kk: float(v[-1]) for kk, v in mstack.items()}
                log_cb(f"[cached step {step}] {done}/{total} steps {metrics}")
                if done - last_saved >= save_frequency and done < total:
                    ckpt_lib.save(ckpt_dir, done, {"state": state})
                    last_saved = done
    finally:
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)
    if done > last_saved or last_saved == 0:
        ckpt_lib.save(ckpt_dir, done, {"state": state}, wait=True)
    return TrainResult(params=state.params, batch_stats=batch_stats, final_metrics=metrics)
