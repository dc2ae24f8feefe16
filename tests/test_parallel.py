"""Multi-device (8 virtual CPU devices) data-parallel tests.

The conftest forces ``--xla_force_host_platform_device_count=8`` so real
Mesh/NamedSharding paths compile and execute — the standard JAX recipe for
testing pod-style sharding without a pod (SURVEY.md §4 implication).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faster_rcnn_tpu.models.detector import init_model
from faster_rcnn_tpu.parallel import mesh as mesh_lib
from faster_rcnn_tpu.parallel.freeze import make_optimizer
from faster_rcnn_tpu.train import pipeline

from tests.test_train_step import flat_params, tiny_batch, tiny_config


def test_mesh_creation_shapes():
    m = mesh_lib.create_mesh()
    assert m.devices.size == 8
    assert m.axis_names == ("data", "model")
    m2 = mesh_lib.create_mesh(data=4, model=2)
    assert m2.devices.shape == (4, 2)


def test_shard_batch_places_on_data_axis():
    m = mesh_lib.create_mesh()
    batch = {"x": np.zeros((8, 4), np.float32)}
    sharded = mesh_lib.shard_batch(m, batch)
    shards = sharded["x"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (1, 4)


def test_dp_rpn_train_step_on_8_devices():
    """Full RPN train step with the batch sharded over 8 devices; the
    gradient all-reduce is inserted by XLA via sharding propagation."""
    cfg = tiny_config("vgg16")
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    params = variables["params"]
    tx = make_optimizer(params, "vgg16", (1, 2), 1e-3, freeze_modules=("det_head",))
    state = pipeline.TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(pipeline.make_rpn_train_step(cfg, model, tx, {}))

    m = mesh_lib.create_mesh()
    batch = tiny_batch(cfg, b=8)
    batch = mesh_lib.shard_batch(m, {k: np.asarray(v) for k, v in batch.items()})
    keys = jax.device_put(
        jax.random.split(jax.random.PRNGKey(0), 8), mesh_lib.batch_sharding(m)
    )

    new_state, metrics = step(state, batch, keys)
    assert np.isfinite(float(metrics["loss"]))

    # the update must be identical to the unsharded computation
    batch_local = {k: jnp.asarray(np.asarray(v)) for k, v in batch.items()}
    keys_local = jnp.asarray(np.asarray(keys))
    ref_state, ref_metrics = step(state, batch_local, keys_local)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    a = flat_params(new_state.params)["backbone/block5_conv3/kernel"]
    b = flat_params(ref_state.params)["backbone/block5_conv3/kernel"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)
