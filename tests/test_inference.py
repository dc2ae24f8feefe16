"""Inference decode + VOC evaluation tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_tpu import evaluate, inference
from faster_rcnn_tpu.data.voc import GtBox
from faster_rcnn_tpu.models.detector import FasterRCNN, init_model
from tests import reference_impl as ref
from tests.test_train_step import tiny_batch, tiny_config


class TestDecodeOneImage:
    def test_matches_per_class_nms_oracle(self, rng):
        cfg = tiny_config()
        c = cfg.model.num_classes  # 6
        r = 40
        rois = np.stack(
            [
                rng.randint(0, 3, r),
                rng.randint(0, 3, r),
                rng.randint(3, 6, r),
                rng.randint(3, 6, r),
            ],
            axis=1,
        ).astype(np.float32)
        cls_prob = rng.dirichlet(np.ones(c), size=r).astype(np.float32)
        reg = (rng.standard_normal((r, 4 * (c - 1))) * 0.1).astype(np.float32)

        boxes, conf, cls, ok = inference._decode_one_image(
            cfg, jnp.asarray(rois), jnp.ones(r, bool), jnp.asarray(cls_prob), jnp.asarray(reg)
        )
        boxes, conf, cls, ok = map(np.asarray, (boxes, conf, cls, ok))

        # oracle: per-ROI argmax, drop bg, per-class greedy NMS 0.5
        cls_idx = cls_prob.argmax(1)
        confidence = cls_prob.max(1)
        keep = cls_idx != c - 1
        stride = float(cfg.model.stride)
        mult = np.array([10, 10, 5, 5], np.float32)
        want = []
        for cc in range(c - 1):
            sel = np.where(keep & (cls_idx == cc))[0]
            if not len(sel):
                continue
            dec = []
            for i in sel:
                t = reg[i, 4 * cc : 4 * cc + 4] / mult
                w, h = rois[i, 2] - rois[i, 0], rois[i, 3] - rois[i, 1]
                cx = rois[i, 0] + w / 2 + t[0] * w
                cy = rois[i, 1] + h / 2 + t[1] * h
                nw, nh = np.exp(t[2]) * w, np.exp(t[3]) * h
                dec.append([cx - nw / 2, cy - nh / 2, cx + nw / 2, cy + nh / 2])
            dec = np.array(dec) * stride
            pick = ref.np_greedy_nms(dec, confidence[sel], 0.5, 1000)
            for p in pick:
                want.append((cc, confidence[sel][p], dec[p]))

        got = [(int(cls[i]), conf[i], boxes[i]) for i in np.where(ok)[0]]
        assert len(got) == len(want)
        want.sort(key=lambda x: -x[1])
        got.sort(key=lambda x: -x[1])
        for (wc, ws, wb), (gc, gs, gb) in zip(want, got):
            assert wc == gc
            np.testing.assert_allclose(ws, gs, rtol=1e-5)
            np.testing.assert_allclose(wb, gb, rtol=1e-3, atol=1e-2)


class TestDetectFn:
    def test_shapes_and_validity(self):
        cfg = tiny_config("vgg16")
        model, variables = init_model(jax.random.PRNGKey(0), cfg)
        detect = inference.make_detect_fn(cfg, model, variables)
        batch = tiny_batch(cfg, b=2)
        dets = detect(batch["image"], batch["img_hw"])
        d = cfg.rpn.infer_post_nms
        assert dets.boxes.shape == (2, d, 4)
        assert dets.scores.shape == (2, d)
        assert dets.valid.dtype == bool
        assert np.isfinite(np.asarray(dets.boxes)).all()

    def test_detections_to_records_rescales(self):
        dets = inference.Detections(
            boxes=jnp.asarray([[[10.0, 20.0, 30.0, 40.0]]]),
            scores=jnp.asarray([[0.9]]),
            classes=jnp.asarray([[2]]),
            valid=jnp.asarray([[True]]),
        )
        recs = inference.detections_to_records(dets, [2.0], ["a", "b", "c", "bg"])
        assert recs[0][0]["cls_name"] == "c"
        np.testing.assert_array_equal(recs[0][0]["bbox"], [5, 10, 15, 20])


class TestVocEval:
    def _write_dets(self, tmp_path, cls, rows):
        p = os.path.join(tmp_path, f"comp3_det_test_{cls}.txt")
        with open(p, "w") as f:
            for r in rows:
                f.write(" ".join(map(str, r)) + "\n")
        return p

    def test_perfect_detections_ap1(self, tmp_path):
        gt = {
            "img1": [GtBox("dog", False, 10, 10, 50, 50)],
            "img2": [GtBox("dog", False, 20, 20, 80, 90)],
        }
        det_file = self._write_dets(
            tmp_path, "dog",
            [("img1", 0.9, 11, 11, 51, 51), ("img2", 0.8, 21, 21, 81, 91)],
        )
        rec, prec, ap = evaluate.voc_eval_class(gt, str(det_file), "dog")
        assert ap > 0.99

    def test_duplicate_detection_is_fp(self, tmp_path):
        gt = {"img1": [GtBox("dog", False, 10, 10, 50, 50)]}
        det_file = self._write_dets(
            tmp_path, "dog",
            [("img1", 0.9, 11, 11, 51, 51), ("img1", 0.8, 12, 12, 52, 52)],
        )
        rec, prec, ap = evaluate.voc_eval_class(gt, str(det_file), "dog")
        assert rec[-1] == 1.0
        assert prec[-1] == 0.5  # second hit on same gt counts as FP

    def test_difficult_excluded(self, tmp_path):
        gt = {"img1": [GtBox("dog", True, 10, 10, 50, 50)]}
        det_file = self._write_dets(tmp_path, "dog", [("img1", 0.9, 11, 11, 51, 51)])
        rec, prec, ap = evaluate.voc_eval_class(gt, str(det_file), "dog")
        # difficult gt excluded from npos; matching it is neither TP nor FP
        assert ap == 0.0

    def test_11_point_ap(self):
        rec = np.array([0.5, 1.0])
        prec = np.array([1.0, 0.5])
        ap = evaluate.voc_ap(rec, prec, use_07_metric=True)
        # 11-pt: thresholds 0..0.5 -> max prec 1.0 (6 pts), 0.6..1.0 -> 0.5 (5)
        np.testing.assert_allclose(ap, (6 * 1.0 + 5 * 0.5) / 11, atol=1e-6)
