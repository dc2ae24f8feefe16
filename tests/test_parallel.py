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


def test_tensor_parallel_det_step_matches_replicated():
    """2D mesh (data=4, model=2): VGG fc layers column/row-parallel via
    NamedSharding; the sharded update must match the replicated one."""
    cfg = tiny_config("vgg16")
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    params = variables["params"]
    tx = make_optimizer(params, "vgg16", (1, 2), 1e-3, freeze_modules=("rpn_head",))
    step = jax.jit(pipeline.make_det_train_step(cfg, model, tx, {}, heads_only=False))

    batch_np = {k: np.asarray(v) for k, v in tiny_batch(cfg, b=4).items()}
    keys_np = np.asarray(jax.random.split(jax.random.PRNGKey(0), 4))

    # replicated baseline
    state0 = pipeline.TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    rpn_vs = {"params": params, "batch_stats": {}}
    ref_state, ref_metrics = step(
        state0,
        {k: jnp.asarray(v) for k, v in batch_np.items()},
        jnp.asarray(keys_np),
        rpn_vs,
    )

    # dp=4 x tp=2
    from faster_rcnn_tpu.parallel.sharding import param_shardings, shard_params

    m = mesh_lib.create_mesh(data=4, model=2)
    sh_params = shard_params(params, m)
    # verify fc1 kernel is really split over 'model'
    fc1 = sh_params["det_head"]["fc1"]["kernel"]
    assert fc1.sharding.spec == jax.sharding.PartitionSpec(None, "model")
    assert len(fc1.addressable_shards) == 8  # 4 data replicas x 2 model shards

    state_tp = pipeline.TrainState(
        sh_params, tx.init(sh_params), jnp.zeros((), jnp.int32)
    )
    batch_tp = mesh_lib.shard_batch(m, batch_np)
    keys_tp = jax.device_put(
        jnp.asarray(keys_np), jax.sharding.NamedSharding(m, jax.sharding.PartitionSpec("data"))
    )
    rpn_tp = {"params": sh_params, "batch_stats": {}}
    tp_state, tp_metrics = step(state_tp, batch_tp, keys_tp, rpn_tp)

    np.testing.assert_allclose(
        float(tp_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    a = flat_params(tp_state.params)["det_head/fc1/kernel"]
    b = flat_params(ref_state.params)["det_head/fc1/kernel"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)


def test_multichip_detect_matches_single_device():
    """Detection served over an 8-device data-parallel mesh must equal the
    single-device result (weights replicated, batch sharded)."""
    from faster_rcnn_tpu.inference import make_detect_fn

    cfg = tiny_config("vgg16")
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    batch = tiny_batch(cfg, b=8)
    images = np.asarray(batch["image"])
    hw = np.asarray(batch["img_hw"])

    single = make_detect_fn(cfg, model, variables)
    ref = single(jnp.asarray(images), jnp.asarray(hw))

    m = mesh_lib.create_mesh()
    sharded = make_detect_fn(cfg, model, variables, mesh=m)
    got = sharded(images, hw)
    assert len(got.boxes.sharding.device_set) == 8

    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
    np.testing.assert_array_equal(np.asarray(ref.classes), np.asarray(got.classes))
    np.testing.assert_allclose(
        np.asarray(ref.boxes), np.asarray(got.boxes), rtol=1e-5, atol=1e-4
    )


class TestMultihost:
    """parallel/multihost.py on the virtual mesh (process_count == 1 here;
    the helpers must degenerate exactly to the single-host sharded path)."""

    def test_global_mesh_and_batch_assembly(self):
        from faster_rcnn_tpu.parallel import multihost as mh

        assert not mh.maybe_initialize()  # single process, no coordinator
        m = mh.global_mesh()
        assert m.devices.size == 8 and m.axis_names == ("data", "model")

        local = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
        g = mh.global_batch(m, local, 8)
        assert g["x"].shape == (8, 4)
        assert len(g["x"].addressable_shards) == 8
        np.testing.assert_array_equal(np.asarray(g["x"]), local["x"])

        keys = mh.global_keys(m, jax.random.PRNGKey(0), 8)
        assert keys.shape[0] == 8
        np.testing.assert_array_equal(
            np.asarray(keys), np.asarray(jax.random.split(jax.random.PRNGKey(0), 8))
        )

    def test_is_initialized_flag_semantics(self, monkeypatch):
        """Advisor r3: the trainer's late-init guard must key off the module
        flag, not process_count()==1 (which falsely rejects a legitimately
        initialized 1-process distributed run)."""
        from faster_rcnn_tpu.parallel import multihost as mh

        assert not mh.is_initialized()  # single process, never initialized
        monkeypatch.setattr(mh, "_INITIALIZED", True)
        assert mh.is_initialized()      # flag wins even at process_count==1
        # a second maybe_initialize call is a no-op success once the flag is
        # set (the CLI contract: first call at top of main did the work)
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1")
        assert mh.maybe_initialize() is True

    def test_record_sharding_partitions(self):
        from faster_rcnn_tpu.parallel import multihost as mh

        recs = list(range(10))
        parts = [
            mh.shard_records_for_host(recs, process_index=i, process_count=4)
            for i in range(4)
        ]
        assert sorted(sum(parts, [])) == recs
        assert mh.shard_records_for_host(recs) == recs  # 1 process = identity

    def test_local_batch_size_single_process(self):
        from faster_rcnn_tpu.parallel import multihost as mh

        assert mh.local_batch_size(8) == 8  # 1 process: local == global

    def test_joint_step_via_multihost_batch_matches_local(self):
        """One joint train step fed through the multihost global-batch path
        equals the same step on the plain local sharded path."""
        from faster_rcnn_tpu.parallel import multihost as mh

        cfg = tiny_config("vgg16")
        model, variables = init_model(jax.random.PRNGKey(0), cfg)
        params = variables["params"]
        tx = make_optimizer(params, "vgg16", (1, 2), 1e-3)
        state = pipeline.TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        step = jax.jit(pipeline.make_joint_train_step(cfg, model, tx, {}))

        host = {k: np.asarray(v) for k, v in tiny_batch(cfg, b=8).items()}
        keyseed = jax.random.PRNGKey(3)

        m = mh.global_mesh()
        b1 = mh.global_batch(m, host, 8)
        k1 = mh.global_keys(m, keyseed, 8)
        _, m1 = step(state, b1, k1)

        m2_mesh = mesh_lib.create_mesh()
        b2 = mesh_lib.shard_batch(m2_mesh, host)
        k2 = jax.device_put(jax.random.split(keyseed, 8), mesh_lib.batch_sharding(m2_mesh))
        _, m2 = step(state, b2, k2)

        for k in m1:
            np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-6)
