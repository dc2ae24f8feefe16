"""Host input-pipeline throughput: TrainLoader + C++ decoder, end to end.

The reference's data path is its biggest bottleneck (shapes.py:24-29: PIL
decode + resize per step, single-threaded).  Ours must prove it can feed the
chip (VERDICT r4 #4): decode -> Catmull-Rom resize -> flip -> canvas pad ->
batch at the production canvases, sustained.

Measures, per canvas geometry:
  * single-worker cost of one example (decode+resize+canvas), i.e. the
    per-core speed of the C++ path (native/image_loader.cpp) vs PIL;
  * sustained TrainLoader img/s with N worker threads (the production
    configuration; queue-isolated workers, so scaling is linear in cores
    until the JPEG source saturates).

This container exposes ONE CPU core (os.cpu_count() == 1), so the sustained
number here is the per-core rate; the target hosts TPU VMs provide (e.g.
v5e-8: 112 vCPU) multiply it.  The chip needs ~178 img/s at B=16/90 ms
steps; divide by the per-core rate for the worker count.

Usage: python scripts/bench_loader.py [n_images] [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N_IMGS = int(sys.argv[1]) if len(sys.argv) > 1 else 192
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def bench_one(tag, base, resize_min, resize_max, uint8=True):
    from faster_rcnn_tpu.config import voc_config
    from faster_rcnn_tpu.data import native_loader
    from faster_rcnn_tpu.data.pipeline import TrainLoader, prepare_example
    from faster_rcnn_tpu.data.voc import (
        KITTI_CLASS_MAPPING,
        VOC_CLASS_MAPPING,
        load_dataset,
    )

    import dataclasses

    mapping = KITTI_CLASS_MAPPING if "KITTI" in base else VOC_CLASS_MAPPING
    cfg = voc_config("resnet50")
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, resize_min=resize_min, resize_max=resize_max,
        canvas_h=(resize_min + 31) // 32 * 32,
        canvas_w=(resize_max + 31) // 32 * 32,
    ))
    records, _ = load_dataset([base], "train", flip=False,
                              resize_min=resize_min, resize_max=resize_max)
    records = records[:N_IMGS]
    if not records:
        print(f"[{tag}] no records under {base}; skipping")
        return
    print(f"[{tag}] {len(records)} records, canvas "
          f"{cfg.data.canvas_h}x{cfg.data.canvas_w}, "
          f"native={native_loader.available()}")

    # --- single-worker per-example cost (decode+resize+canvas) ---
    warm = prepare_example(records[0], mapping, cfg, uint8=uint8)
    assert warm["image"].shape[0] == cfg.data.canvas_h
    n1 = min(64, len(records))
    t0 = time.time()
    for r in records[:n1]:
        prepare_example(r, mapping, cfg, uint8=uint8)
    dt = time.time() - t0
    per = dt / n1 * 1000
    print(f"[{tag}] single-worker prepare_example (C++): {per:.1f} ms/img "
          f"({n1 / dt:.1f} img/s/core)")

    # --- PIL fallback, for the native-path speedup figure ---
    orig = (native_loader.load_canvas_native, native_loader.load_canvas_native_u8)
    native_loader.load_canvas_native = lambda *a, **k: None
    native_loader.load_canvas_native_u8 = lambda *a, **k: None
    try:
        t0 = time.time()
        for r in records[:n1]:
            prepare_example(r, mapping, cfg, uint8=uint8)
        per_pil = (time.time() - t0) / n1 * 1000
    finally:
        native_loader.load_canvas_native, native_loader.load_canvas_native_u8 = orig
    print(f"[{tag}] single-worker prepare_example (PIL): {per_pil:.1f} ms/img "
          f"(C++ is {per_pil / per:.2f}x faster)")

    # --- sustained threaded TrainLoader ---
    for workers in (1, 2, 4):
        loader = TrainLoader(records, mapping, cfg, BATCH,
                             num_workers=workers, uint8=uint8, prefetch=4)
        it = iter(loader)
        next(it)  # spin-up
        n_batches = max(2, N_IMGS // BATCH)
        t0 = time.time()
        for _ in range(n_batches):
            canvas, batch = next(it)
            assert batch["image"].shape[0] == BATCH
        dt = time.time() - t0
        rate = n_batches * BATCH / dt
        print(f"[{tag}] TrainLoader x{workers} workers: {rate:.1f} img/s "
              f"({dt / n_batches * 1000:.0f} ms/batch of {BATCH})")
    chip_rate = 178.0  # B=16 @ ~90 ms joint step (BENCH_r04)
    print(f"[{tag}] cores to feed {chip_rate:.0f} img/s at "
          f"{per:.1f} ms/img/core: {chip_rate * per / 1000:.1f}")


def main():
    voc = "/tmp/voc_real_proxy/VOC"
    kitti = "/tmp/kitti_proxy/KITTI"
    if os.path.isdir(voc):
        bench_one("VOC 600x1000", voc, 600, 1000)
    kit = kitti if os.path.isdir(kitti) else "/tmp/kitti_proxy_smoke/KITTI"
    if os.path.isdir(kit):
        bench_one("KITTI 600x1500", kit, 600, 1500)


if __name__ == "__main__":
    main()
