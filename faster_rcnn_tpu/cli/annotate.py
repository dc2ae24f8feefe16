"""Annotate video frames / images with detections (annotate_video.py rebuild).

    python -m faster_rcnn_tpu.cli.annotate --input_dir frames/ --output_dir out/ \\
        --workdir ./workdir --kitti

Like the reference (annotate_video.py:74-75) this consumes a directory of
pre-extracted frames; drawing uses PIL instead of cv2.  The reference skips
'DontCare'/'Misc' classes and boundary-crossing boxes (annotate_video.py:27-44)
— reproduced here.
"""

from __future__ import annotations

import argparse
import glob
import os

import jax
import numpy as np
from PIL import Image as PilImage
from PIL import ImageDraw

from faster_rcnn_tpu.cli.common import add_common_args, class_mapping_from_args, config_from_args
from faster_rcnn_tpu.data.pipeline import prepare_example
from faster_rcnn_tpu.data.voc import ImageRecord
from faster_rcnn_tpu.inference import detections_to_records, make_detect_fn
from faster_rcnn_tpu.models.detector import init_model
from faster_rcnn_tpu.train.trainer import _load_step_params

SKIP_CLASSES = {"DontCare", "Misc"}  # annotate_video.py:27
_COLORS = [
    (230, 25, 75), (60, 180, 75), (255, 225, 25), (0, 130, 200), (245, 130, 48),
    (145, 30, 180), (70, 240, 240), (240, 50, 230), (210, 245, 60), (250, 190, 190),
]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p, training=False)
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--workdir", default="./workdir")
    p.add_argument("--from_step", default="4")
    p.add_argument("--det_threshold", type=float, default=0.5)
    args = p.parse_args(argv)

    cfg = config_from_args(args)
    class_mapping = class_mapping_from_args(args)
    rev = {v: k for k, v in class_mapping.items()}
    class_names = [rev[i] for i in range(len(rev))]

    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    params = _load_step_params(args.workdir, args.from_step, variables["params"])
    variables = {"params": params, "batch_stats": variables.get("batch_stats", {})}
    # uint8 serving config: raw RGB canvases over the wire, preprocess on
    # device (4x less H2D — same path as cli/detect and bench.py)
    detect = make_detect_fn(cfg, model, variables, uint8_input=True)

    os.makedirs(args.output_dir, exist_ok=True)
    frames = sorted(
        glob.glob(os.path.join(args.input_dir, "*.png"))
        + glob.glob(os.path.join(args.input_dir, "*.jpg"))
    )
    summary = []  # (frame path, boxes actually drawn) — returned for tests
    for path in frames:
        with PilImage.open(path) as im:
            im = im.convert("RGB")
            w, h = im.width, im.height
            rec = ImageRecord(os.path.basename(path), w, h, [], path)
            rec, ratio = rec.resize_within_bounds(cfg.data.resize_min, cfg.data.resize_max)
            ex = prepare_example(rec, class_mapping, cfg, uint8=True)
            dets = detect(ex["image"][None], ex["img_hw"][None])
            recs = detections_to_records(dets, [ratio], class_names)[0]

            draw = ImageDraw.Draw(im)
            n_drawn = 0
            for det in recs:
                if det["prob"] < args.det_threshold or det["cls_name"] in SKIP_CLASSES:
                    continue
                x1, y1, x2, y2 = det["bbox"]
                # skip boundary-crossing boxes (annotate_video.py:35-38)
                if x1 < 0 or y1 < 0 or x2 >= w or y2 >= h:
                    continue
                color = _COLORS[class_mapping[det["cls_name"]] % len(_COLORS)]
                draw.rectangle([x1, y1, x2, y2], outline=color, width=2)
                draw.text((x1 + 2, y1 + 2), f"{det['cls_name']} {det['prob']:.2f}", fill=color)
                n_drawn += 1
            im.save(os.path.join(args.output_dir, os.path.basename(path)))
            print(f"annotated {path}: {n_drawn}/{len(recs)} detections drawn")
            summary.append((path, n_drawn))
    return summary


if __name__ == "__main__":
    main()
