"""Unified training CLI: the reference's four scripts as one driver.

    python -m faster_rcnn_tpu.cli.train --step 1 --voc_paths /data/VOC2007 ...
    python -m faster_rcnn_tpu.cli.train --step all ...

Replaces train_rpn_step1.py / train_det_step2.py / train_rpn_step3.py /
train_det_step4.py (SURVEY.md C14) — the weight handoff between steps is
automatic via the workdir checkpoints.
"""

from __future__ import annotations

import argparse

from faster_rcnn_tpu.cli.common import add_common_args, class_mapping_from_args, config_from_args
from faster_rcnn_tpu.data.voc import load_dataset
from faster_rcnn_tpu.train.trainer import run_four_step_training


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p, training=True)
    p.add_argument("--step", default="all",
                   help="1|2|3|4, comma list (e.g. 1,2), 'all', or 'joint' "
                        "(single-pass approximate-joint training)")
    p.add_argument("--device_cache", action="store_true",
                   help="upload the whole dataset to HBM (uint8) and train "
                        "via the zero-H2D lax.scan loop "
                        "(train/device_cache.py) — flip augmentation moves "
                        "on-device, so --flip host doubling is disabled")
    args = p.parse_args(argv)

    if getattr(args, "multihost", False):
        # MUST precede every JAX call in the process (backend init freezes
        # the process topology) — so it comes before config/model/data work.
        from faster_rcnn_tpu.parallel.multihost import maybe_initialize

        maybe_initialize(require=True)

    cfg = config_from_args(args)
    class_mapping = class_mapping_from_args(args)
    records, _ = load_dataset(
        args.voc_paths.split(","),
        args.img_set,
        flip=args.flip and not args.device_cache,
        resize_min=cfg.data.resize_min,
        resize_max=cfg.data.resize_max,
    )
    print(f"loaded {len(records)} training records")

    if args.step == "all":
        steps = (1, 2, 3, 4)
    elif args.step == "joint":
        steps = ("joint",)
    else:
        steps = tuple(int(s) for s in str(args.step).split(","))
    if args.device_cache and not args.flip:
        # on-device flip augmentation honors cfg.data.flip_augment
        import dataclasses

        cfg = cfg.replace(data=dataclasses.replace(cfg.data, flip_augment=False))
    extra = (dict(multihost=args.multihost, uint8_pipeline=args.uint8_pipeline)
             if not args.device_cache else {})
    results = run_four_step_training(
        cfg, records, class_mapping, args.workdir, steps=steps,
        batch_size=args.batch_size, save_frequency=args.save_frequency,
        seed=args.seed, use_device_cache=args.device_cache, **extra,
    )
    for s, r in results.items():
        print(f"step {s} final metrics: {r.final_metrics}")


if __name__ == "__main__":
    main()
