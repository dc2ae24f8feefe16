"""Decompose the loader-fed train step: where do 727 ms/step go?

The loader-fed joint run (NOTES.md r5) sustains ~22-28 img/s at B=16 on the
dev tunnel while the device-side step is ~87 ms (184 img/s) and the host
loader alone delivers 75.6 img/s/core.  The parts measured in isolation
(decode 11.7 ms/img, H2D 24.7 ms/batch, dispatch RTT 0.05 ms) do not add up
to the observed step time, so this probe times the REAL trainer loop phase
by phase:

  t_next   — blocking on the TrainLoader queue (host decode not hidden)
  t_put    — jnp.asarray of the uint8 batch (H2D enqueue + host copy)
  t_keys   — per-step jax.random.split pair on the default backend
  t_step   — step-fn call return (async dispatch)
  t_sync   — block_until_ready on the returned state (device + pipeline slack)

and contrasts three variants:
  A. real loader, keys on default backend  (what train_one_step does today)
  B. real loader, keys precomputed host-side (isolates per-step key RTT)
  C. synthetic constant batch (loader removed — isolates host decode share)

Run with the chip idle; prints one JSON line per variant.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

if os.environ.get("PROBE_CPU"):
    # the env sitecustomize pins the axon TPU platform; the JAX_PLATFORMS env
    # var does NOT override it — only the config call does (see
    # .claude/skills/verify/SKILL.md gotchas)
    import jax

    jax.config.update("jax_platforms", "cpu")

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def build(cfg_batch=B):
    import jax

    from faster_rcnn_tpu.cli.common import config_from_args
    from faster_rcnn_tpu.data.pipeline import TrainLoader
    from faster_rcnn_tpu.data.voc import VOC_CLASS_MAPPING, load_dataset
    from faster_rcnn_tpu.models.detector import init_model
    from faster_rcnn_tpu.parallel.freeze import make_optimizer
    from faster_rcnn_tpu.train import pipeline
    from faster_rcnn_tpu.train.schedule import schedule_from_phases

    class _A:
        voc_paths = "/tmp/voc_real_proxy/VOC"
        network = "resnet50"
        resize_dims = "600,1000"
        anchor_scales = "128,256,512"
        kitti = False
        freeze_blocks = "none"

    cfg = config_from_args(_A())
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, batch_size=cfg_batch, clip_grad_norm=10.0))
    records, _ = load_dataset([_A.voc_paths], "train", flip=True,
                              resize_min=600, resize_max=1000)
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    params = variables["params"]
    lr = schedule_from_phases(cfg.train.phases)
    tx = make_optimizer(params, "resnet50", (), lr, optimizer="sgd",
                        momentum=0.9, weight_decay=cfg.model.weight_decay,
                        freeze_modules=(), clip_grad_norm=10.0)
    # landscape canvas only: bucket-homogeneous timing (one executable)
    cfg_c = cfg.replace(data=dataclasses.replace(
        cfg.data, canvas_h=608, canvas_w=1024))
    fn = pipeline.make_joint_train_step(
        cfg_c, model, tx, variables.get("batch_stats", {}),
        freeze_blocks=(), freeze_modules=())
    step_fn = jax.jit(fn, donate_argnums=(0,))
    state = pipeline.TrainState(params, tx.init(params),
                                jax.numpy.zeros((), jax.numpy.int32))
    land = [r for r in records if not r.height > r.width]
    loader = TrainLoader(land, VOC_CLASS_MAPPING, cfg, cfg_batch, uint8=True)
    return cfg, loader, step_fn, state


def run_variant(tag, loader_iter, step_fn, state, host_keys):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(7)
    cpu = jax.devices("cpu")[0] if host_keys else None
    if host_keys:
        key = jax.device_put(key, cpu)
    acc = {"next": 0.0, "put": 0.0, "keys": 0.0, "step": 0.0, "sync": 0.0}
    # warmup (compile both orientations out of the timing window)
    canvas, hb = next(loader_iter)
    batch = {k: jnp.asarray(v) for k, v in hb.items()}
    keys = jax.random.split(jax.random.split(key)[1], B)
    if host_keys:
        keys = jax.device_put(np.asarray(keys))
    state, _ = step_fn(state, batch, keys)
    jax.block_until_ready(state.params)

    t_all = time.perf_counter()
    for i in range(STEPS):
        t0 = time.perf_counter()
        canvas, hb = next(loader_iter)
        t1 = time.perf_counter()
        batch = {k: jnp.asarray(v) for k, v in hb.items()}
        t2 = time.perf_counter()
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, B)
        if host_keys:
            keys = jax.device_put(np.asarray(keys))
        t3 = time.perf_counter()
        state, metrics = step_fn(state, batch, keys)
        t4 = time.perf_counter()
        acc["next"] += t1 - t0
        acc["put"] += t2 - t1
        acc["keys"] += t3 - t2
        acc["step"] += t4 - t3
    jax.block_until_ready(state.params)
    t_end = time.perf_counter()
    total = (t_end - t_all) / STEPS
    out = {"variant": tag, "ms_per_step": round(total * 1e3, 1),
           "img_per_s": round(B / total, 1)}
    out.update({f"t_{k}_ms": round(v / STEPS * 1e3, 1) for k, v in acc.items()})
    out["t_tail_sync_ms"] = round((t_end - t_all - sum(acc.values())) / STEPS * 1e3, 1)
    print(json.dumps(out), flush=True)
    return state


def main():
    import jax

    print(json.dumps({"backend": jax.default_backend(),
                      "devices": str(jax.devices())}), flush=True)
    cfg, loader, step_fn, state = build()

    it = iter(loader)
    state = run_variant("A_loader_devkeys", it, step_fn, state, host_keys=False)
    state = run_variant("B_loader_hostkeys", it, step_fn, state, host_keys=True)
    it.close()

    # C: synthetic constant batch — loader out of the loop entirely
    it2 = iter(loader)
    canvas, hb = next(it2)
    it2.close()

    class _Const:
        def __next__(self):
            return canvas, hb

    state = run_variant("C_const_batch", _Const(), step_fn, state, host_keys=False)

    # D: synthetic + host keys — pure device/dispatch floor of this loop shape
    run_variant("D_const_hostkeys", _Const(), step_fn, state, host_keys=True)


if __name__ == "__main__":
    main()
