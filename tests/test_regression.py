"""Deterministic training regression tests — the reference's test strategy
(SURVEY.md §4: seeded, single-iteration training, golden comparison) rebuilt
with numeric-tolerance goldens instead of bit-exact h5diff.

The goldens pin the composed behavior of init + target assignment + sampling
+ losses + SGD for a fixed seed.  If an intentional change shifts them,
regenerate with:  python -m tests.test_regression
"""

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_tpu.models.detector import init_model
from faster_rcnn_tpu.parallel.freeze import make_optimizer
from faster_rcnn_tpu.train import pipeline

from tests.test_train_step import tiny_batch, tiny_config

# Golden values captured on jax 0.9.0 / CPU backend, seed recipe below.
GOLDEN_RPN = {"loss": 0.1416, "rpn_cls": 0.1164, "rpn_reg": 0.0252}
TOL = 2e-3  # fp32 reduction-order headroom


def _run_one_rpn_step():
    cfg = tiny_config("vgg16")
    model, variables = init_model(jax.random.PRNGKey(42), cfg)
    params = variables["params"]
    tx = make_optimizer(params, "vgg16", (1, 2), 1e-3, freeze_modules=("det_head",))
    state = pipeline.TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(pipeline.make_rpn_train_step(cfg, model, tx, {}))
    batch = tiny_batch(cfg, b=2, seed=7)
    keys = jax.random.split(jax.random.PRNGKey(123), 2)
    _, metrics = step(state, batch, keys)
    return {k: round(float(v), 4) for k, v in metrics.items()}


def test_rpn_single_step_golden():
    metrics = _run_one_rpn_step()
    for k, want in GOLDEN_RPN.items():
        assert abs(metrics[k] - want) < TOL, (k, metrics[k], want)


def test_rpn_single_step_deterministic():
    a = _run_one_rpn_step()
    b = _run_one_rpn_step()
    assert a == b


if __name__ == "__main__":
    print("golden:", _run_one_rpn_step())
