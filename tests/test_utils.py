"""Tests for keras h5 import, profiling, checkpointing, schedule."""

import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import optax

from faster_rcnn_tpu.models.detector import init_model
from faster_rcnn_tpu.train.schedule import phases_from_str, schedule_from_phases, total_iterations
from faster_rcnn_tpu.utils import checkpoint as ckpt_lib
from faster_rcnn_tpu.utils.keras_import import load_keras_h5
from faster_rcnn_tpu.utils.profiling import StepTimer, profile, scope

from tests.test_train_step import tiny_config


def write_keras_style_h5(path, layers):
    """layers: {layer_name: {weight_name_suffix: array}} in Keras layout."""
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array([n.encode() for n in layers])
        for lname, weights in layers.items():
            g = f.create_group(lname)
            wn = [f"{lname}/{k}:0".encode() for k in weights]
            g.attrs["weight_names"] = np.array(wn)
            for k, v in weights.items():
                g.create_dataset(f"{lname}/{k}:0", data=v)


class TestKerasImport:
    def test_vgg_conv_transplant(self, tmp_path):
        cfg = tiny_config("vgg16")
        _, variables = init_model(jax.random.PRNGKey(0), cfg)
        params = variables["params"]
        k = np.random.RandomState(0).standard_normal((3, 3, 3, 64)).astype(np.float32)
        b = np.arange(64, dtype=np.float32)
        p = str(tmp_path / "w.h5")
        write_keras_style_h5(p, {"block1_conv1": {"kernel": k, "bias": b}})

        new_params, _, loaded = load_keras_h5(p, params)
        assert loaded == ["block1_conv1"]
        np.testing.assert_array_equal(new_params["backbone"]["block1_conv1"]["kernel"], k)
        np.testing.assert_array_equal(new_params["backbone"]["block1_conv1"]["bias"], b)
        # untouched layer keeps its init
        np.testing.assert_array_equal(
            np.asarray(params["backbone"]["block2_conv1"]["kernel"]),
            new_params["backbone"]["block2_conv1"]["kernel"],
        )

    def test_resnet_bn_transplant(self, tmp_path):
        cfg = tiny_config("resnet50")
        _, variables = init_model(jax.random.PRNGKey(0), cfg)
        gamma = np.full(64, 2.0, np.float32)
        mean = np.full(64, 0.5, np.float32)
        p = str(tmp_path / "w.h5")
        write_keras_style_h5(
            p, {"bn_conv1": {"gamma": gamma, "beta": np.zeros(64, np.float32),
                             "moving_mean": mean, "moving_variance": np.ones(64, np.float32)}}
        )
        new_params, new_stats, loaded = load_keras_h5(
            p, variables["params"], variables["batch_stats"]
        )
        assert "bn_conv1" in loaded
        np.testing.assert_array_equal(new_params["backbone"]["bn_conv1"]["scale"], gamma)
        np.testing.assert_array_equal(new_stats["backbone"]["bn_conv1"]["mean"], mean)

    def test_unmatched_layer_skipped(self, tmp_path):
        cfg = tiny_config("vgg16")
        _, variables = init_model(jax.random.PRNGKey(0), cfg)
        p = str(tmp_path / "w.h5")
        write_keras_style_h5(p, {"nonexistent_layer": {"kernel": np.zeros((1, 1, 1, 1))}})
        _, _, loaded = load_keras_h5(p, variables["params"])
        assert loaded == []


class TestSchedule:
    def test_phases_parse(self):
        assert phases_from_str("60000:1e-3,20000:1e-4") == [(60000, 1e-3), (20000, 1e-4)]
        assert total_iterations([(60000, 1e-3), (20000, 1e-4)]) == 80000

    def test_schedule_values(self):
        s = schedule_from_phases([(100, 1e-3), (50, 1e-4)])
        np.testing.assert_allclose(float(s(0)), 1e-3, rtol=1e-6)
        np.testing.assert_allclose(float(s(99)), 1e-3, rtol=1e-6)
        np.testing.assert_allclose(float(s(100)), 1e-4, rtol=1e-6)
        np.testing.assert_allclose(float(s(149)), 1e-4, rtol=1e-6)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        d = str(tmp_path / "ckpts")
        tree = {"params": {"w": jnp.arange(4.0)}, "step": jnp.asarray(7)}
        ckpt_lib.save(d, 7, tree, wait=True)
        assert ckpt_lib.latest_step(d) == 7
        out = ckpt_lib.restore(d, template=tree)
        np.testing.assert_array_equal(np.asarray(out["params"]["w"]), [0, 1, 2, 3])
        assert int(out["step"]) == 7

    def test_latest_of_many(self, tmp_path):
        d = str(tmp_path / "ckpts")
        tree = {"x": jnp.zeros(2)}
        for s in (5, 10, 15):
            ckpt_lib.save(d, s, tree, wait=True)
        assert ckpt_lib.latest_step(d) == 15

    def test_missing_dir(self, tmp_path):
        assert ckpt_lib.latest_step(str(tmp_path / "nope")) is None


class TestProfiling:
    def test_scope_tree_prints(self, capsys):
        with scope("outer"):
            with scope("inner"):
                pass
        out = capsys.readouterr().out
        assert "outer:" in out and "  inner:" in out

    def test_profile_decorator(self, capsys):
        @profile
        def foo():
            return 42

        assert foo() == 42
        assert "foo" in capsys.readouterr().out

    def test_step_timer(self):
        t = StepTimer()
        for _ in range(3):
            t.tick()
        assert t.ms_per_step >= 0
        assert t.img_per_sec(4) > 0
