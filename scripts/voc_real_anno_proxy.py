"""mAP-parity proxy on the 5,011 REAL VOC2007 trainval annotations.

The reference's headline capability is VOC2007 mAP 0.6564 (notes:120), which
cannot be reproduced without the stripped images.  This proxy gets as close
as this environment allows: REAL VOC2007 annotation geometry + class
statistics (reference mount test_data/VOC_test: 2,501-image train split /
2,510-image val split, difficult flags, up to dozens of objects per image)
with deterministic synthetic pixels rendered at the GT boxes
(faster_rcnn_tpu/data/synth_render.py).  Train on 'train', detect + evaluate
20-class mAP (11-point, difficult-excluded) on 'val' — the complete
reference workflow at reference data statistics.

    python scripts/voc_real_anno_proxy.py [base_dir] [joint|all] [options]
      --phases STR        training phases (steps:lr, per step)
      --batch N           global batch size
      --limit N           truncate each imageset (quick smoke)
      --inject_bug        ALSO run detection with a deliberately corrupted
                          per-class regression slice (rolled by one class) and
                          report the mAP drop — proves the proxy discriminates
      --skip_train        reuse an existing workdir checkpoint
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_VOC = "/root/reference/test_data/VOC_test"


def build_dataset(out: str, limit: int, kitti: bool = False) -> None:
    marker = os.path.join(out, f".rendered_{limit or 'full'}")
    if os.path.exists(marker):
        print(f"dataset already rendered at {out}")
        return
    t0 = time.time()
    if kitti:
        from faster_rcnn_tpu.data.kitti_synth import build_kitti_synth_dataset
        from faster_rcnn_tpu.data.voc import KITTI_CLASS_MAPPING

        names = build_kitti_synth_dataset(
            out, KITTI_CLASS_MAPPING,
            n_train=limit or 1500, n_val=(limit or 1500) // 2,
        )
    else:
        from faster_rcnn_tpu.data.synth_render import build_proxy_dataset
        from faster_rcnn_tpu.data.voc import VOC_CLASS_MAPPING

        names = build_proxy_dataset(
            SRC_VOC, out, VOC_CLASS_MAPPING, img_sets=("train", "val"),
            limit=limit,
        )
    open(marker, "w").close()
    print(f"rendered {len(names)} images in {time.time()-t0:.0f}s -> {out}")


def inject_reg_slice_bug():
    """Corrupt inference's per-class bbreg slice selection: read class c+1's
    regression deltas (mod C-1) instead of class c's.  A pipeline that
    actually learned per-class regression must lose mAP under this."""
    import jax.numpy as jnp

    from faster_rcnn_tpu import inference

    orig = inference._decode_one_image

    def bugged(cfg, rois, roi_valid, cls_prob, reg_out):
        c = cfg.model.num_classes - 1  # foreground classes
        rolled = jnp.roll(reg_out.reshape(reg_out.shape[0], c, 4), 1, axis=1)
        return orig(cfg, rois, roi_valid, cls_prob, rolled.reshape(reg_out.shape))

    inference._decode_one_image = bugged
    return orig


def _load_seed_params(seed_from: str, fresh_params):
    """Load a params tree to act as the 'pretrained' seed source.

    ``seed_from`` is either a proxy workdir containing a stepjoint checkpoint
    or a Keras-layout h5 file (transplanted into a copy of ``fresh_params``
    via utils/keras_import.py — the exact production ImageNet path).  Only
    the backbone tree is used by the caller, mirroring the reference's
    ImageNet ``by_name`` seeding of every step's fresh model
    (resnet.py:481-485,545-551).
    """
    if seed_from.endswith(".h5"):
        from faster_rcnn_tpu.utils.keras_import import load_keras_h5

        params, _, loaded = load_keras_h5(seed_from, fresh_params)
        print(f"seeded from h5 {seed_from}: {len(loaded)} layers")
        return params
    from faster_rcnn_tpu.utils import checkpoint as ckpt_lib

    restored = ckpt_lib.restore(os.path.join(seed_from, "stepjoint"))
    return restored["state"]["params"]


def _train_device_cached(args, data: str, workdir: str) -> None:
    """Train via the device-resident zero-H2D scan loop (train/device_cache.py)
    with the same config the CLI would build — required on the dev tunnel
    where the per-step loop runs 400x below device speed."""
    import dataclasses

    from faster_rcnn_tpu.cli.common import config_from_args as cfg_from
    from faster_rcnn_tpu.data.voc import (
        KITTI_CLASS_MAPPING,
        VOC_CLASS_MAPPING,
        load_dataset,
    )
    from faster_rcnn_tpu.train.device_cache import train_cached
    from faster_rcnn_tpu.train.schedule import phases_from_str
    from faster_rcnn_tpu.train.trainer import merge_params

    mapping = KITTI_CLASS_MAPPING if args.kitti_synth else VOC_CLASS_MAPPING

    class _A:  # minimal arg bag for config_from_args
        voc_paths = data
        network = args.network
        resize_dims = args.resize_dims
        anchor_scales = args.anchor_scales
        kitti = args.kitti_synth
        freeze_blocks = "none"

    cfg = cfg_from(_A())
    cfg = cfg.replace(
        train=dataclasses.replace(
            cfg.train,
            phases=tuple(tuple(p) for p in phases_from_str(args.phases)),
            batch_size=args.batch, clip_grad_norm=10.0,
            seed=args.train_seed,
        )
    )
    if args.pre_nms:
        cfg = cfg.replace(rpn=dataclasses.replace(cfg.rpn, train_pre_nms=args.pre_nms))
    records, _ = load_dataset(
        [data], "train", flip=False,
        resize_min=cfg.data.resize_min, resize_max=cfg.data.resize_max,
    )
    print(f"{len(records)} records -> device cache")

    seed_params = None
    if args.seed_from:
        import jax as _jax

        from faster_rcnn_tpu.models.detector import init_model as _im

        _, _vars = _im(_jax.random.PRNGKey(cfg.train.seed), cfg)
        seed_params = _load_seed_params(args.seed_from, _vars["params"])

    if args.mode == "joint":
        train_cached("joint", cfg, records, mapping, workdir,
                     batch_size=args.batch, seed=args.train_seed,
                     init_params=(merge_params(
                         _fresh_params(cfg), seed_params, ["backbone"])
                         if seed_params is not None else None))
        return
    # 4-step alternating scheme with the reference handoff (trainer.py
    # wiring).  With --seed_from, every step's fresh model gets the seed
    # backbone transplanted, exactly like the reference's ImageNet by_name
    # loads in steps 1 and 2 (train_rpn_step1.py:55-90, train_det_step2.py).
    fresh = _fresh_params(cfg)
    init1 = (merge_params(fresh, seed_params, ["backbone"])
             if seed_params is not None else None)
    init2 = (merge_params(fresh, seed_params, ["backbone"])
             if seed_params is not None else fresh)
    r1 = train_cached(1, cfg, records, mapping, workdir,
                      batch_size=args.batch, init_params=init1,
                      seed=args.train_seed)
    r2 = train_cached(2, cfg, records, mapping, workdir,
                      batch_size=args.batch, init_params=init2,
                      rpn_params=r1.params, seed=args.train_seed)
    init3 = merge_params(fresh, r2.params, ["backbone"])
    r3 = train_cached(3, cfg, records, mapping, workdir,
                      batch_size=args.batch, init_params=init3,
                      seed=args.train_seed)
    init4 = merge_params(fresh, r3.params, ["backbone", "rpn_head"])
    train_cached(4, cfg, records, mapping, workdir,
                 batch_size=args.batch, init_params=init4,
                 rpn_params=r3.params, seed=args.train_seed)


def _fresh_params(cfg):
    import jax

    from faster_rcnn_tpu.models.detector import init_model

    _, variables = init_model(jax.random.PRNGKey(cfg.train.seed), cfg)
    return variables["params"]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("base", nargs="?", default="/tmp/voc_real_proxy")
    p.add_argument("mode", nargs="?", default="joint", choices=("joint", "all"))
    p.add_argument("--phases", default="1300:1e-3,400:1e-4")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--inject_bug", action="store_true")
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--loader", action="store_true",
                   help="train through the host TrainLoader CLI path instead "
                        "of the device-resident cache (slow on the dev "
                        "tunnel: every dispatch pays 1-6s RTT)")
    p.add_argument("--pre_nms", type=int, default=0,
                   help="override rpn.train_pre_nms (e.g. 6000 to validate "
                        "the Detectron default against the reference's 12000)")
    p.add_argument("--tag", default="",
                   help="suffix for the workdir/dets dirs so experiment "
                        "variants (schedules, seeding) don't collide — "
                        "train_cached auto-resumes from an existing workdir "
                        "checkpoint, so reusing one would skip training")
    p.add_argument("--seed_from", default="",
                   help="'pretrained' init source: a proxy workdir with a "
                        "stepjoint checkpoint, or a Keras-layout .h5 "
                        "(loaded via utils/keras_import — the production "
                        "ImageNet path).  The backbone tree seeds every "
                        "step's fresh model, mirroring the reference's "
                        "by_name ImageNet loads.")
    p.add_argument("--network", default="resnet50",
                   choices=("vgg16", "resnet50", "resnet101"),
                   help="backbone for the quality matrix (VERDICT r4 #3)")
    p.add_argument("--train_seed", type=int, default=0,
                   help="cfg.train.seed: init + sampling key stream, for "
                        "multi-seed mean±σ statistics (VERDICT r4 #8)")
    p.add_argument("--resize_dims", default="600,1000")
    p.add_argument("--anchor_scales", default="16,32,64,128,256,512")
    p.add_argument("--kitti_synth", action="store_true",
                   help="train/eval on the synthetic KITTI-statistics "
                        "dataset (data/kitti_synth.py) with the 9-class "
                        "KITTI mapping — pair with --resize_dims 600,1500")
    args = p.parse_args()

    data = os.path.join(args.base, "KITTI" if args.kitti_synth else "VOC")
    suffix = f"_{args.tag}" if args.tag else ""
    workdir = os.path.join(args.base, f"work_{args.mode}{suffix}")
    build_dataset(data, args.limit, kitti=args.kitti_synth)

    from faster_rcnn_tpu.cli import detect as detect_cli
    from faster_rcnn_tpu.cli import train as train_cli
    from faster_rcnn_tpu.data.voc import KITTI_CLASS_MAPPING, VOC_CLASS_MAPPING
    from faster_rcnn_tpu.evaluate import eval_all

    mapping = KITTI_CLASS_MAPPING if args.kitti_synth else VOC_CLASS_MAPPING
    common = ["--voc_paths", data, "--network", args.network,
              "--resize_dims", args.resize_dims,
              "--anchor_scales", args.anchor_scales]
    if args.kitti_synth:
        common.append("--kitti")
    if not args.skip_train:
        t0 = time.time()
        if args.loader:
            train_cli.main(common + [
                "--img_set", "train", "--step",
                "joint" if args.mode == "joint" else "1,2,3,4",
                "--phases", args.phases, "--batch_size", str(args.batch),
                "--clip_grad_norm", "10", "--freeze_blocks", "none",
                "--workdir", workdir, "--save_frequency", "400",
            ])
        else:
            _train_device_cached(args, data, workdir)
        print(f"training ({args.mode}) took {time.time()-t0:.0f}s")

    def run_eval(tag: str):
        dets = os.path.join(args.base, f"dets_{args.mode}{suffix}_{tag}")
        t0 = time.time()
        detect_cli.main(common + [
            "--img_set", "val", "--workdir", workdir,
            "--from_step", "joint" if args.mode == "joint" else "4",
            # large batches amortize the dev tunnel's per-dispatch RTT
            "--out_dir", dets, "--batch_size", str(max(args.batch, 32)),
        ])
        print(f"detection ({tag}) took {time.time()-t0:.0f}s")
        aps = eval_all(dets, data, mapping, img_set="val", verbose=True)
        print(f"[{args.mode}/{tag}] mAP = {aps['mAP']:.4f}")
        return aps

    aps = run_eval("clean")
    if args.inject_bug:
        restore = inject_reg_slice_bug()
        try:
            bug_aps = run_eval("bugged")
        finally:
            from faster_rcnn_tpu import inference

            inference._decode_one_image = restore
        print(
            f"DISCRIMINATION: clean mAP {aps['mAP']:.4f} vs reg-slice-bug mAP "
            f"{bug_aps['mAP']:.4f} (drop {aps['mAP'] - bug_aps['mAP']:.4f})"
        )
    return aps


if __name__ == "__main__":
    main()
