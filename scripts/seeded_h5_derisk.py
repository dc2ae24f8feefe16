"""Seeded-run derisk for the ImageNet path (VERDICT r3 #8).

No genuine Keras ImageNet h5 exists in this environment, so the production
posture (reference resnet.py:481-485,545-551: by_name ImageNet seeding of
every fresh model) has never run end-to-end.  This script derisks everything
short of the real file's attribute quirks:

  1. export a TRAINED ResNet-50 tree (the joint proxy checkpoint) to a
     Keras-2.0.8-layout h5 via utils/keras_import.save_keras_h5 — a
     realistic-scale, realistically-valued h5;
  2. load it back through utils/keras_import.load_keras_h5 into a FRESH
     model tree — the exact production seeding path;
  3. train a short joint run at the reference's lr 1e-3 WITHOUT
     clip_grad_norm (the guard rail from-scratch runs need: from-scratch
     joint at lr 1e-3 NaNs by step ~8, NOTES.md r1) and confirm (a) the
     losses stay finite and (b) early loss descends faster than the
     from-scratch control.

Usage: python scripts/seeded_h5_derisk.py [base_dir] [--steps N]
(expects a rendered proxy dataset + work_joint checkpoint from
scripts/voc_real_anno_proxy.py <base> joint)
"""

import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("base", nargs="?", default="/tmp/voc_real_proxy")
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--batch", type=int, default=16)
    args = p.parse_args()

    import jax

    from faster_rcnn_tpu.cli.common import config_from_args as cfg_from
    from faster_rcnn_tpu.data.voc import VOC_CLASS_MAPPING, load_dataset
    from faster_rcnn_tpu.models.detector import init_model
    from faster_rcnn_tpu.train.device_cache import train_cached
    from faster_rcnn_tpu.train.trainer import merge_params
    from faster_rcnn_tpu.utils import checkpoint as ckpt_lib
    from faster_rcnn_tpu.utils.keras_import import load_keras_h5, save_keras_h5

    data = os.path.join(args.base, "VOC")

    class _A:
        voc_paths = data
        network = "resnet50"
        resize_dims = "600,1000"
        anchor_scales = "16,32,64,128,256,512"
        kitti = False
        freeze_blocks = None  # per-network preset, as production seeding uses

    cfg = cfg_from(_A())
    # reference schedule semantics: lr 1e-3, NO gradient clipping
    cfg = cfg.replace(
        train=dataclasses.replace(
            cfg.train, phases=((args.steps, 1e-3),),
            batch_size=args.batch, clip_grad_norm=0.0,
        )
    )

    # 1. export the trained joint tree as a Keras-layout h5
    restored = ckpt_lib.restore(os.path.join(args.base, "work_joint", "stepjoint"))
    trained = restored["state"]["params"]
    _, variables = init_model(jax.random.PRNGKey(0), cfg)
    batch_stats = variables.get("batch_stats", {})
    h5_path = os.path.join(args.base, "r50_seed.h5")
    layers = save_keras_h5(trained, batch_stats, h5_path)
    print(f"exported {len(layers)} layers -> {h5_path} "
          f"({os.path.getsize(h5_path)/1e6:.1f} MB)")

    # 2. re-import into a FRESH tree (production seeding path)
    fresh = variables["params"]
    seeded, seeded_stats, loaded = load_keras_h5(h5_path, fresh, batch_stats)
    print(f"re-imported {len(loaded)} layers")
    # round-trip check on a couple of backbone leaves
    for path in (("backbone", "conv1", "kernel"),):
        a = trained
        b = seeded
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
    print("h5 round-trip bit-exact on checked leaves")

    records, _ = load_dataset(
        [data], "train", flip=False,
        resize_min=cfg.data.resize_min, resize_max=cfg.data.resize_max,
    )

    def short_run(tag, init):
        losses = []

        def cb(msg):
            print(msg)
            if isinstance(msg, str) and "steps {" in msg:
                import re

                m = re.search(r"'loss': ([0-9.naife+-]+)", msg)
                if m:
                    losses.append(float(m.group(1)))

        train_cached(
            "joint", cfg, records, VOC_CLASS_MAPPING,
            os.path.join(args.base, f"work_derisk_{tag}"),
            batch_size=args.batch, init_params=init, log_cb=cb,
            chunk_steps=20,
        )
        return losses

    seeded_init = merge_params(fresh, seeded, ["backbone"])
    l_seeded = short_run("seeded", seeded_init)
    l_scratch = short_run("scratch", None)

    print(f"seeded  losses: {[round(x, 3) for x in l_seeded]}")
    print(f"scratch losses: {[round(x, 3) for x in l_scratch]}")
    ok_finite = all(np.isfinite(l_seeded))
    faster = (np.isfinite(l_seeded[-1])
              and (not np.isfinite(l_scratch[-1])
                   or l_seeded[-1] < l_scratch[-1]))
    print(f"RESULT: seeded finite at lr 1e-3 no-clip: {ok_finite}; "
          f"seeded final loss beats scratch: {faster}")
    if not ok_finite:
        sys.exit(1)


if __name__ == "__main__":
    main()
