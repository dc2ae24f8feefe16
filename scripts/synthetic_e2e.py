"""Full-system validation through the real CLIs on synthetic data.

Generates a small VOC-format dataset of bright rectangles, trains from
scratch on TPU via cli.train (single-pass "joint" mode by default, or the
reference's 4-step alternating scheme with mode=all), produces detections
via cli.detect, and scores them via the VOC evaluator — the complete user
workflow with a quantitative mAP result.

    python scripts/synthetic_e2e.py [workdir] [joint|all]
"""

import os
import sys

import numpy as np
from PIL import Image as PilImage

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ANNOTATION = """<annotation>
  <filename>{name}.jpg</filename>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objects}
</annotation>"""
OBJECT = """<object><name>{cls}</name><difficult>0</difficult>
  <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>"""


def make_dataset(root, n_images=32, size=320, seed=0):
    rng = np.random.RandomState(seed)
    for d in ("JPEGImages", "Annotations", "ImageSets/Main"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    names = []
    for i in range(n_images):
        name = f"{i:06d}"
        img = (rng.rand(size, size, 3) * 40 + 40).astype(np.uint8)  # dark noise
        objs = []
        for _ in range(rng.randint(1, 4)):
            bw, bh = rng.randint(60, 140), rng.randint(50, 120)
            x1 = rng.randint(0, size - bw)
            y1 = rng.randint(0, size - bh)
            cls = ["car", "person"][rng.randint(0, 2)]
            color = (220, 60, 50) if cls == "car" else (50, 80, 230)
            img[y1:y1+bh, x1:x1+bw] = np.array(color) + rng.randint(-15, 15, (bh, bw, 3))
            objs.append(OBJECT.format(cls=cls, x1=x1+1, y1=y1+1, x2=x1+bw+1, y2=y1+bh+1))
        PilImage.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            os.path.join(root, "JPEGImages", name + ".jpg"), quality=95)
        with open(os.path.join(root, "Annotations", name + ".xml"), "w") as f:
            f.write(ANNOTATION.format(name=name, w=size, h=size, objects="".join(objs)))
        names.append(name)
    with open(os.path.join(root, "ImageSets/Main", "trainval.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    return names


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_e2e"
    mode = sys.argv[2] if len(sys.argv) > 2 else "joint"
    data = os.path.join(base, "VOC")
    workdir = os.path.join(base, "work")
    dets = os.path.join(base, "dets")
    make_dataset(data)
    print(f"dataset at {data}")

    common = [
        "--voc_paths", data, "--img_set", "trainval", "--network", "vgg16",
        "--resize_dims", "320,320", "--anchor_scales", "32,64,128",
    ]
    from faster_rcnn_tpu.cli import detect as detect_cli
    from faster_rcnn_tpu.cli import train as train_cli
    from faster_rcnn_tpu.data.voc import VOC_CLASS_MAPPING
    from faster_rcnn_tpu.evaluate import eval_all

    train_cli.main(common + [
        "--step", "joint" if mode == "joint" else "1,2,3,4",
        "--phases", "400:3e-3,200:3e-4", "--batch_size", "8",
        "--clip_grad_norm", "10", "--freeze_blocks", "none",
        "--workdir", workdir, "--save_frequency", "200", "--no-flip",
    ])
    detect_cli.main(common + [
        "--workdir", workdir, "--from_step", "joint" if mode == "joint" else "4",
        "--out_dir", dets,
        "--batch_size", "8", "--det_threshold", "0.1",
    ])
    aps = eval_all(dets, data, VOC_CLASS_MAPPING, img_set="trainval", verbose=False)
    used = {k: v for k, v in aps.items() if k in ("car", "person", "mAP")}
    print("synthetic e2e results:", used)
    m = np.mean([aps["car"], aps["person"]])
    print(f"mAP over used classes: {m:.4f}")
    return m


if __name__ == "__main__":
    main()
