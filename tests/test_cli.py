"""CLI argument -> config mapping tests (no training)."""

import argparse

import numpy as np

from faster_rcnn_tpu.cli.common import (
    add_common_args,
    anchor_scales_from_str,
    class_mapping_from_args,
    config_from_args,
    resize_dims_from_str,
)
from faster_rcnn_tpu.data.voc import KITTI_CLASS_MAPPING, VOC_CLASS_MAPPING


def parse(training=True, extra=()):
    p = argparse.ArgumentParser()
    add_common_args(p, training=training)
    return p.parse_args(["--voc_paths", "/data/VOC2007", *extra])


class TestParsers:
    def test_resize_dims(self):
        assert resize_dims_from_str("600,1000") == (600, 1000)

    def test_anchor_scales(self):
        assert anchor_scales_from_str("16,32,64") == (16, 32, 64)


class TestConfigFromArgs:
    def test_defaults_voc(self):
        args = parse()
        cfg = config_from_args(args)
        assert cfg.model.network == "resnet50"
        assert cfg.model.num_classes == len(VOC_CLASS_MAPPING)
        assert cfg.data.canvas == (608, 1024)  # 600,1000 rounded up to /32
        assert cfg.anchors.num_anchors == 18
        assert cfg.train.phases == ((60000, 1e-3), (20000, 1e-4))
        assert class_mapping_from_args(args) is VOC_CLASS_MAPPING

    def test_kitti_flags(self):
        args = parse(extra=["--kitti", "--resize_dims", "600,1500",
                            "--anchor_scales", "16,32,64,128,256,512"])
        cfg = config_from_args(args)
        assert cfg.model.num_classes == len(KITTI_CLASS_MAPPING)
        assert cfg.data.canvas == (608, 1504)
        assert class_mapping_from_args(args) is KITTI_CLASS_MAPPING

    def test_network_and_phases(self):
        args = parse(extra=["--network", "vgg16", "--phases", "100:0.01,50:0.001",
                            "--optimizer", "adam", "--batch_size", "8",
                            "--clip_grad_norm", "10"])
        cfg = config_from_args(args)
        assert cfg.model.network == "vgg16"
        assert cfg.model.weight_decay == 0.0  # vgg preset
        assert cfg.train.phases == ((100, 0.01), (50, 0.001))
        assert cfg.train.optimizer == "adam"
        assert cfg.train.batch_size == 8
        assert cfg.train.clip_grad_norm == 10.0

    def test_resnet_weight_decay_preset(self):
        cfg = config_from_args(parse(extra=["--network", "resnet101"]))
        assert np.isclose(cfg.model.weight_decay, 1e-4)
        assert cfg.model.freeze_blocks == (1, 2, 3)
