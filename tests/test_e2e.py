"""Full-pipeline integration: joint training -> fused detect -> comp3 files ->
VOC evaluation, all on a synthetic mini-VOC dataset (tiny shapes, CPU).

Mirrors the reference's end-to-end usage (train_* -> voc_dets -> eval_dets)
in one test; quality is not asserted (3 training steps from random init),
only that every stage runs and the artifacts are well-formed.
"""

import dataclasses
import os

import jax
import numpy as np

from faster_rcnn_tpu import evaluate, inference
from faster_rcnn_tpu.data.pipeline import canvas_for, prepare_example
from faster_rcnn_tpu.data.voc import VOC_CLASS_MAPPING, load_dataset
from faster_rcnn_tpu.models.detector import FasterRCNN, init_model
from faster_rcnn_tpu.train.trainer import train_one_step

from tests.test_trainer import cfg_for_tiny_voc, tiny_voc  # noqa: F401 fixture


def test_train_detect_eval_roundtrip(tiny_voc, tmp_path):
    cfg = cfg_for_tiny_voc()
    records, ratios = load_dataset(
        [tiny_voc], "trainval", flip=False,
        resize_min=cfg.data.resize_min, resize_max=cfg.data.resize_max,
    )
    workdir = str(tmp_path / "work")

    # 1. a few joint training steps
    result = train_one_step(
        "joint", cfg, records, VOC_CLASS_MAPPING, workdir,
        batch_size=2, save_frequency=4, seed=0, max_steps=3,
    )
    assert np.isfinite(result.final_metrics["loss"])

    # 2. fused detection over the dataset
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    variables = {"params": result.params, "batch_stats": result.batch_stats}
    rev = {v: k for k, v in VOC_CLASS_MAPPING.items()}
    class_names = [rev[i] for i in range(len(rev))]

    dets_by_cls = {}
    for rec, ratio in zip(records, ratios):
        canvas = canvas_for(rec, cfg)
        cfg_c = cfg.replace(
            data=dataclasses.replace(cfg.data, canvas_h=canvas[0], canvas_w=canvas[1])
        )
        detect = inference.make_detect_fn(cfg_c, model, variables)
        ex = prepare_example(rec, VOC_CLASS_MAPPING, cfg_c, canvas)
        dets = detect(ex["image"][None], ex["img_hw"][None])
        assert dets.boxes.shape[1] == cfg.rpn.infer_post_nms
        recs = inference.detections_to_records(dets, [ratio], class_names)[0]
        for det in recs:
            dets_by_cls.setdefault(det["cls_name"], {}).setdefault(rec.name, []).append(det)

    # 3. comp3 files + evaluation protocol
    out_dir = str(tmp_path / "dets")
    inference.write_dets(dets_by_cls, out_dir)
    written = [f for f in os.listdir(out_dir)] if os.path.isdir(out_dir) else []
    aps = evaluate.eval_all(out_dir, tiny_voc, VOC_CLASS_MAPPING,
                            img_set="trainval", verbose=False)
    assert "mAP" in aps and 0.0 <= aps["mAP"] <= 1.0
    assert set(aps) == set(VOC_CLASS_MAPPING) - {"bg"} | {"mAP"}
    # any comp3 file that was written must parse
    for f in written:
        ids, conf, bb = evaluate.parse_detection_file(os.path.join(out_dir, f))
        if len(ids):
            assert bb.shape[1] == 4
