"""Parity tests against the surviving REAL reference artifacts.

The reference mount keeps exactly one trained weight fixture,
``test_data/tmp_resnet_frcnn_weights.h5`` — the output artifact of the
reference's own ResNet-50 step-2 regression test (train_det_test.py:89-91),
holding one dataset ``last_layer_weights`` of shape (2048, 80): the kernel of
the detector's final per-class regression layer ``dense_reg_21``
(resnet.py:672-678, units 4·(num_classes−1) = 80, input = stage-5 avg-pooled
2048 features).  And one real VOC image, ``VOC_test/JPEGImages/000005.jpg``
(the image the reference's tests train on, train_rpn_test.py:32).

These tests prove:
  1. our ResNet-50 detector head is dimension-identical to the reference's
     trained artifact (the h5 transplants with zero reshaping);
  2. a real reference-trained tensor + a real VOC JPEG flow through the full
     fused detect program to stable, regression-pinned outputs;
  3. the Keras ``by_name`` h5 layer-name contract (vgg.py:191-195,
     resnet.py:481-485, train_rpn_step3.py:92-93) is honored for EVERY layer
     of the ResNet-50 RPN+detector — enumerated from the reference's naming
     scheme, not from our parameter tree.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
FIXTURE_H5 = os.path.join(REF, "test_data", "tmp_resnet_frcnn_weights.h5")
FIXTURE_JPG = os.path.join(REF, "test_data", "VOC_test", "JPEGImages", "000005.jpg")
VOC_TEST = os.path.join(REF, "test_data", "VOC_test")

needs_fixture = pytest.mark.skipif(
    not os.path.exists(FIXTURE_H5), reason="reference fixture not mounted"
)
needs_image = pytest.mark.skipif(
    not os.path.exists(FIXTURE_JPG), reason="reference image not mounted"
)

# Golden outputs for the transplanted-forward test (captured on the CPU
# backend; regenerate with ``python -m tests.test_reference_fixture``).
GOLDEN_FORWARD = {"num_valid": 47, "class_sum": 504, "score_sum": 42.902, "box_sum": 23079.1}


def small_net_cfg(network):
    """Full 21-class / 18-anchor architecture at a small canvas
    (CPU-affordable) — head and weight shapes are canvas-independent.

    f32 compute: these tests pin the weight/layout CONTRACT, and bf16 conv
    reduction order on XLA:CPU depends on the virtual-device count (1 vs the
    suite's 8), which flips near-tie detections and breaks the golden across
    environments."""
    import dataclasses

    from faster_rcnn_tpu.config import voc_config

    cfg = voc_config(network)
    return cfg.replace(
        data=dataclasses.replace(
            cfg.data, canvas_h=224, canvas_w=320, resize_min=224, resize_max=320
        ),
        rpn=dataclasses.replace(
            cfg.rpn, infer_pre_nms=1000, infer_post_nms=50
        ),
        det=dataclasses.replace(cfg.det, roi_align_impl="einsum"),
        model=dataclasses.replace(
            cfg.model, compute_dtype="float32"
        ),
    )


def small_r50_cfg():
    return small_net_cfg("resnet50")


@needs_fixture
def test_fixture_reg_kernel_shape_matches_our_head():
    import h5py

    from faster_rcnn_tpu.models.detector import init_model

    with h5py.File(FIXTURE_H5, "r") as f:
        trained = np.asarray(f["last_layer_weights"])

    cfg = small_r50_cfg()
    _, variables = init_model(jax.random.PRNGKey(0), cfg)
    ours = variables["params"]["det_head"]["dense_reg_21"]["kernel"]
    assert trained.shape == tuple(ours.shape) == (2048, 80)


def _transplanted_forward_outputs():
    """Transplant the reference-trained reg kernel, push the real VOC image
    000005.jpg through the fused detect program, return summary outputs."""
    import h5py

    from faster_rcnn_tpu.data.voc import parse_annotation
    from faster_rcnn_tpu.inference import make_detect_fn
    from faster_rcnn_tpu.models.detector import init_model, preprocess_rgb

    cfg = small_r50_cfg()
    model, variables = init_model(jax.random.PRNGKey(0), cfg)

    with h5py.File(FIXTURE_H5, "r") as f:
        trained = jnp.asarray(np.asarray(f["last_layer_weights"], np.float32))
    params = variables["params"]
    params["det_head"]["dense_reg_21"]["kernel"] = trained
    variables = dict(variables, params=params)

    record = parse_annotation(VOC_TEST, "000005")
    assert (record.width, record.height) == (500, 375)
    record, ratio = record.resize_within_bounds(cfg.data.resize_min, cfg.data.resize_max)
    pixels = preprocess_rgb(record.load_pixels())
    canvas = np.zeros((1, cfg.data.canvas_h, cfg.data.canvas_w, 3), np.float32)
    canvas[0, : record.height, : record.width] = pixels
    img_hw = np.array([[record.height, record.width]], np.int32)

    detect = make_detect_fn(cfg, model, variables)
    out = detect(jnp.asarray(canvas), jnp.asarray(img_hw))
    valid = np.asarray(out.valid)[0]
    return {
        "num_valid": int(valid.sum()),
        "class_sum": int(np.asarray(out.classes)[0][valid].sum()),
        "score_sum": round(float(np.asarray(out.scores)[0][valid].sum()), 3),
        "box_sum": round(float(np.asarray(out.boxes)[0][valid].sum()), 1),
    }


@needs_fixture
@needs_image
def test_fixture_transplant_and_forward_golden():
    got = _transplanted_forward_outputs()
    assert GOLDEN_FORWARD is not None, "regenerate: python -m tests.test_reference_fixture"
    # The detection SET (count + classes) is the hard contract and is stable.
    # Scores/boxes carry a few-percent run-to-run drift even at f32: XLA:CPU
    # conv custom-calls select algorithms (reduction orders) at runtime.
    assert got["num_valid"] == GOLDEN_FORWARD["num_valid"], got
    assert got["class_sum"] == GOLDEN_FORWARD["class_sum"], got
    assert abs(got["score_sum"] - GOLDEN_FORWARD["score_sum"]) <= 0.05 * abs(
        GOLDEN_FORWARD["score_sum"]
    ), got
    assert abs(got["box_sum"] - GOLDEN_FORWARD["box_sum"]) <= 0.05 * abs(
        GOLDEN_FORWARD["box_sum"]
    ), got


# ---------------------------------------------------------------------------
# Keras by_name layer contract — full per-network RPN + detector enumeration
# ---------------------------------------------------------------------------

def reference_resnet50_layer_names(num_classes=21):
    """Every weighted layer name of the reference's ResNet-50 RPN + detector,
    enumerated from the reference source's naming scheme (resnet.py:96-247
    conv/bn naming, :395-448 base, :451-486 rpn, :489-548 classifier) —
    NOT from our parameter tree."""
    names = [("conv1", "conv"), ("bn_conv1", "bn")]
    stages = {2: ["a", "b", "c"], 3: ["a", "b", "c", "d"],
              4: ["a", "b", "c", "d", "e", "f"], 5: ["a", "b", "c"]}
    for stage, blocks in stages.items():
        for i, b in enumerate(blocks):
            branches = ["2a", "2b", "2c"] + (["1"] if i == 0 else [])
            for br in branches:
                names.append((f"res{stage}{b}_branch{br}", "conv"))
                names.append((f"bn{stage}{b}_branch{br}", "bn"))
    names += [("rpn_conv1", "conv"), ("rpn_out_cls", "conv"), ("rpn_out_bbreg", "conv")]
    names += [(f"dense_class_{num_classes}", "dense"),
              (f"dense_reg_{num_classes}", "dense")]
    return names


def reference_resnet101_layer_names(num_classes=21):
    """Reference ResNet-101 layer list: Caffe-style ``use_bias=False`` convs,
    frozen BatchNormalization AND a separate Scale layer per BN, 23 stage-4
    blocks named a, b1..b22 (resnet.py:551-602 base via conv_block/
    identity_block separate_scale=True, :605-628 rpn, :631-686 classifier
    with td stage-5 blocks + dense heads)."""
    names = [("conv1", "convnb"), ("bn_conv1", "bn"), ("scale_conv1", "scale")]
    stages = {2: ["a", "b", "c"], 3: ["a", "b1", "b2", "b3"],
              4: ["a"] + [f"b{i}" for i in range(1, 23)], 5: ["a", "b", "c"]}
    for stage, blocks in stages.items():
        for i, b in enumerate(blocks):
            branches = ["2a", "2b", "2c"] + (["1"] if i == 0 else [])
            for br in branches:
                names.append((f"res{stage}{b}_branch{br}", "convnb"))
                names.append((f"bn{stage}{b}_branch{br}", "bn"))
                names.append((f"scale{stage}{b}_branch{br}", "scale"))
    names += [("rpn_conv1", "conv"), ("rpn_out_cls", "conv"), ("rpn_out_bbreg", "conv")]
    names += [(f"dense_class_{num_classes}", "dense"),
              (f"dense_reg_{num_classes}", "dense")]
    return names


def reference_vgg16_layer_names(num_classes=21):
    """Reference VGG16 layer list: 13 ``block{i}_conv{j}`` convs
    (vgg.py:91-141), the shared RPN head (vgg.py:169-186), and the detector
    head fc1/fc2 + dense heads (vgg.py:226-255)."""
    names = []
    for block, n_convs in ((1, 2), (2, 2), (3, 3), (4, 3), (5, 3)):
        for conv in range(1, n_convs + 1):
            names.append((f"block{block}_conv{conv}", "conv"))
    names += [("rpn_conv1", "conv"), ("rpn_out_cls", "conv"), ("rpn_out_bbreg", "conv")]
    names += [("fc1", "dense"), ("fc2", "dense"),
              (f"dense_class_{num_classes}", "dense"),
              (f"dense_reg_{num_classes}", "dense")]
    return names


REFERENCE_LAYER_LISTS = {
    "resnet50": reference_resnet50_layer_names,
    "resnet101": reference_resnet101_layer_names,
    "vgg16": reference_vgg16_layer_names,
}


def _keras_weight_specs(kind):
    if kind == "bn":
        return ["gamma", "beta", "moving_mean", "moving_variance"]
    if kind == "scale":
        return ["gamma", "beta"]
    if kind == "convnb":  # Caffe-style conv, use_bias=False
        return ["kernel"]
    return ["kernel", "bias"]


def _find_layer_shapes(tree, lname):
    """Shapes of the leaves under the unique module named ``lname``."""
    hits = {}

    def walk(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
            elif lname in path:
                hits[path + (k,)] = tuple(v.shape)

    walk(tree, ())
    return hits


@pytest.mark.parametrize("network", ["resnet50", "resnet101", "vgg16"])
def test_keras_by_name_contract_full(network):
    """Synthesize an h5 in the exact Keras 2.0.8 layout (model_weights/ root,
    layer_names/weight_names attrs, ``<layer>/<w>:0`` datasets) covering the
    FULL reference layer list for each network — ResNet-50 (resnet.py:395-548),
    ResNet-101 incl. the separate Caffe Scale layers (resnet.py:551-686), and
    VGG16 incl. fc1/fc2 (vgg.py:91-141,226-255) — and require the importer to
    match every single layer into our tree."""
    import tempfile

    import h5py

    from faster_rcnn_tpu.models.detector import init_model
    from faster_rcnn_tpu.utils.keras_import import jax_to_py, load_keras_h5

    cfg = small_net_cfg(network)
    _, variables = init_model(jax.random.PRNGKey(0), cfg)
    params = jax_to_py(variables["params"])
    stats = jax_to_py(variables.get("batch_stats", {}))

    layer_list = REFERENCE_LAYER_LISTS[network]()
    leaf_map = {"gamma": "scale", "beta": "bias", "kernel": "kernel", "bias": "bias"}
    stats_map = {"moving_mean": "mean", "moving_variance": "var"}

    fills = {}
    with tempfile.NamedTemporaryFile(suffix=".h5", delete=False) as tmp:
        path = tmp.name
    try:
        with h5py.File(path, "w") as f:
            root = f.create_group("model_weights")
            written_layers = []
            for idx, (lname, kind) in enumerate(layer_list):
                param_shapes = _find_layer_shapes(params, lname)
                stat_shapes = _find_layer_shapes(stats, lname)
                assert param_shapes, f"our tree has no module for reference layer {lname}"
                g = root.create_group(lname)
                wnames = []
                for w in _keras_weight_specs(kind):
                    if w in stats_map:
                        shape = next(
                            (s for p, s in stat_shapes.items() if p[-1] == stats_map[w]),
                            None,
                        )
                    else:
                        shape = next(
                            (s for p, s in param_shapes.items() if p[-1] == leaf_map[w]),
                            None,
                        )
                    assert shape is not None, (lname, w, param_shapes, stat_shapes)
                    fill = (idx + 1) * 0.001 + hash(w) % 7 * 0.0001
                    fills[(lname, w)] = fill
                    wn = f"{lname}/{w}:0"
                    g.create_dataset(wn, data=np.full(shape, fill, np.float32))
                    wnames.append(wn.encode())
                g.attrs["weight_names"] = wnames
                written_layers.append(lname.encode())
            root.attrs["layer_names"] = written_layers

        new_params, new_stats, loaded = load_keras_h5(path, params, stats)
    finally:
        os.unlink(path)

    missed = [ln for ln, _ in layer_list if ln not in loaded]
    assert not missed, f"importer missed reference layers: {missed}"

    # spot-check values landed in the right leaves
    if network == "resnet50":
        assert np.allclose(
            new_params["backbone"]["res3b"]["res3b_branch2a"]["kernel"],
            fills[("res3b_branch2a", "kernel")],
        )
        assert np.allclose(
            new_params["det_head"]["stage5"]["res5c"]["bn5c_branch2c"]["scale"],
            fills[("bn5c_branch2c", "gamma")],
        )
        assert np.allclose(
            new_stats["backbone"]["res2a"]["bn2a_branch1"]["var"],
            fills[("bn2a_branch1", "moving_variance")],
        )
    elif network == "resnet101":
        # deep stage-4 tail block + a separate Scale layer (Caffe style)
        assert np.allclose(
            new_params["backbone"]["res4b22"]["res4b22_branch2c"]["kernel"],
            fills[("res4b22_branch2c", "kernel")],
        )
        assert np.allclose(
            new_params["backbone"]["res4b22"]["scale4b22_branch2c"]["scale"],
            fills[("scale4b22_branch2c", "gamma")],
        )
        assert np.allclose(
            new_params["det_head"]["stage5"]["res5a"]["scale5a_branch1"]["bias"],
            fills[("scale5a_branch1", "beta")],
        )
    else:  # vgg16
        assert np.allclose(
            new_params["backbone"]["block4_conv3"]["kernel"],
            fills[("block4_conv3", "kernel")],
        )
        assert np.allclose(
            new_params["det_head"]["fc2"]["bias"], fills[("fc2", "bias")]
        )
    assert np.allclose(
        new_params["det_head"]["dense_reg_21"]["kernel"],
        fills[("dense_reg_21", "kernel")],
    )


if __name__ == "__main__":
    print("GOLDEN_FORWARD =", _transplanted_forward_outputs())


@pytest.mark.parametrize("network", ["resnet50", "resnet101", "vgg16"])
def test_keras_h5_export_round_trip(network):
    """save_keras_h5 writes the exact reference layer set (for every
    network) and load_keras_h5 reproduces the original tree from it — the
    inter-framework weight contract works in BOTH directions."""
    import tempfile

    from faster_rcnn_tpu.models.detector import init_model
    from faster_rcnn_tpu.utils.keras_import import (
        jax_to_py, load_keras_h5, save_keras_h5,
    )

    cfg = small_net_cfg(network)
    _, variables = init_model(jax.random.PRNGKey(0), cfg)
    params = jax_to_py(variables["params"])
    stats = jax_to_py(variables.get("batch_stats", {}))

    with tempfile.NamedTemporaryFile(suffix=".h5", delete=False) as tmp:
        path = tmp.name
    try:
        written = save_keras_h5(params, stats, path)
        expected = {n for n, _ in REFERENCE_LAYER_LISTS[network]()}
        assert expected <= set(written), sorted(expected - set(written))

        _, fresh = init_model(jax.random.PRNGKey(99), cfg)
        p2, s2, loaded = load_keras_h5(
            path, jax_to_py(fresh["params"]), jax_to_py(fresh.get("batch_stats", {}))
        )
        assert expected <= set(loaded)

        def flat(t, pre=()):
            for k, v in t.items():
                if isinstance(v, dict):
                    yield from flat(v, pre + (k,))
                else:
                    yield pre + (k,), v

        orig = dict(flat(params))
        got = dict(flat(p2))
        for path_k, val in orig.items():
            np.testing.assert_array_equal(got[path_k], val, err_msg=str(path_k))
        for path_k, val in dict(flat(stats)).items():
            np.testing.assert_array_equal(dict(flat(s2))[path_k], val, err_msg=str(path_k))
    finally:
        os.unlink(path)
