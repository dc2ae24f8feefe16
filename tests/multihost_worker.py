"""Subprocess body for the REAL 2-process multihost test.

Launched by tests/test_multihost_2proc.py with the env triple
(JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) plus
``--xla_force_host_platform_device_count=4`` so that two OS processes form
one 8-device global mesh.  jax.distributed MUST initialize before any other
JAX use — which is exactly the contract parallel.multihost.maybe_initialize
documents and the train CLI follows.

argv: data_dir workdir out_json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mh_test_cfg():
    """Shared config for the 2-proc and single-proc comparison runs.

    float32 compute + small LR: the comparison asserts the distributed run
    reproduces the local loss trajectory, and bf16 matmuls + the different
    all-reduce orders (Gloo cross-process vs in-process XLA) otherwise
    amplify rounding into percent-level metric drift within 3 steps of
    from-scratch lr=1e-3 training."""
    import dataclasses

    from faster_rcnn_tpu.data.voc import VOC_CLASS_MAPPING
    from tests.test_train_step import tiny_config

    cfg = tiny_config("vgg16")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, num_classes=len(VOC_CLASS_MAPPING), compute_dtype="float32"
        ),
        train=dataclasses.replace(cfg.train, phases=((3, 1e-4),)),
    )


def main():
    data_dir, workdir, out_json = sys.argv[1:4]

    # The environment's sitecustomize registers the remote-TPU (axon) backend
    # in every interpreter and it wins over the JAX_PLATFORMS env var; pin the
    # CPU platform via config BEFORE any backend can initialize (the same
    # pattern as tests/conftest.py).
    import jax

    jax.config.update("jax_platforms", "cpu")

    from faster_rcnn_tpu.parallel.multihost import maybe_initialize

    initialized = maybe_initialize(require=True)

    expect = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    assert initialized, "maybe_initialize(require=True) returned False"
    assert jax.process_count() == expect, (jax.process_count(), expect)
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 4 * expect, jax.device_count()

    from faster_rcnn_tpu.data.voc import VOC_CLASS_MAPPING, load_dataset
    from faster_rcnn_tpu.train.trainer import train_one_step

    cfg = mh_test_cfg()
    records, _ = load_dataset(
        [data_dir], "trainval", flip=False,
        resize_min=cfg.data.resize_min, resize_max=cfg.data.resize_max,
    )
    assert len(records) == 8, len(records)

    result = train_one_step(
        "joint", cfg, records, VOC_CLASS_MAPPING, workdir,
        batch_size=8, max_steps=3, save_frequency=1000, seed=0,
        log_every=1, multihost=True,
    )
    with open(out_json, "w") as f:
        json.dump(
            {
                "process_index": jax.process_index(),
                "process_count": jax.process_count(),
                "final_metrics": result.final_metrics,
            },
            f,
        )
    print(f"worker {jax.process_index()} done: {result.final_metrics}")


if __name__ == "__main__":
    main()
