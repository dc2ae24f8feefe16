"""Export a trained checkpoint as a Keras-layout weights h5.

    python -m faster_rcnn_tpu.cli.export_h5 --workdir ./workdir \\
        --from_step joint --out frcnn_weights.h5

Writes the exact layer/weight-name layout the reference's ``by_name``
loaders consume (vgg.py:191-195, resnet.py:481-485), so weights trained in
this framework can be handed back to the reference implementation — the
inverse of the ImageNet/reference-h5 import path (utils/keras_import.py).
"""

from __future__ import annotations

import argparse

import jax

from faster_rcnn_tpu.cli.common import add_common_args, config_from_args
from faster_rcnn_tpu.models.detector import init_model
from faster_rcnn_tpu.train.trainer import _load_step_params
from faster_rcnn_tpu.utils.keras_import import save_keras_h5


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p, training=False)
    p.add_argument("--workdir", default="./workdir",
                   help="training workdir with step checkpoints")
    p.add_argument("--from_step", default="joint",
                   help="checkpoint to export: 1|2|3|4|joint")
    p.add_argument("--out", required=True, help="output .h5 path")
    args = p.parse_args(argv)

    cfg = config_from_args(args)
    _, variables = init_model(jax.random.PRNGKey(0), cfg)
    step = args.from_step if args.from_step == "joint" else int(args.from_step)
    params = _load_step_params(args.workdir, step, variables["params"])
    written = save_keras_h5(params, variables.get("batch_stats", {}), args.out)
    print(f"wrote {len(written)} layers to {args.out}")


if __name__ == "__main__":
    main()
