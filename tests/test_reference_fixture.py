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
# Per-detection (class, x1, y1, x2, y2, score) sorted tuples: verified
# bit-identical between the 1-device and 8-virtual-device CPU backends at
# this precision, so the former +-5% box_sum tolerance is gone — a decode
# drift of half a pixel on any single box now fails.
GOLDEN_DETS = [
    (0, 38.73, -372.99, 38.73, -371.79, 0.9985),
    (0, 206.95, 20.42, 206.95, 20.43, 0.9971),
    (0, 218.97, 23.55, 218.97, 23.56, 0.9841),
    (0, 232.7, -58.43, 232.7, -58.43, 0.7794),
    (0, 244.21, 14.97, 244.21, 14.98, 1.0),
    (0, 369.22, -500.05, 369.22, -500.02, 0.8762),
    (0, 552.39, 11.55, 552.39, 11.55, 0.8637),
    (0, 652.14, -280.51, 652.14, -280.5, 0.7901),
    (0, 871.48, -45.74, 871.48, -45.73, 0.9959),
    (0, 961.22, -106.34, 961.22, -106.33, 0.6203),
    (13, -64.09, 30.65, 195.7, 99.51, 0.941),
    (13, -59.73, 76.43, 144.77, 92.96, 0.7381),
    (13, -57.93, -59.38, 190.4, 170.08, 0.8067),
    (13, -52.74, 56.91, 149.53, 89.97, 0.6319),
    (13, -50.44, 147.53, 192.17, 201.2, 0.9913),
    (13, -47.89, 98.64, 195.91, 151.48, 0.9993),
    (13, -46.81, 172.36, 193.33, 189.28, 0.9541),
    (13, -44.93, 40.26, 194.02, 73.98, 0.8985),
    (13, -43.44, 111.53, 199.82, 180.98, 0.9956),
    (13, -41.04, 156.07, 204.46, 173.32, 0.9804),
    (13, -40.59, 135.95, 203.07, 170.82, 0.9963),
    (13, -40.14, 73.53, 133.89, 160.93, 0.9961),
    (13, -0.5, -60.89, 85.36, 173.55, 0.8996),
    (13, 7.14, 144.23, 85.12, 201.96, 0.9999),
    (13, 32.05, -22.78, 175.96, 176.25, 0.9519),
    (13, 36.66, 166.73, 206.46, 203.99, 0.9851),
    (13, 71.64, 43.55, 221.64, 61.19, 0.9996),
    (13, 91.83, 96.77, 189.13, 151.19, 0.9998),
    (13, 99.2, 74.8, 229.15, 92.11, 0.9412),
    (13, 124.1, 17.73, 236.03, 71.43, 0.6651),
    (13, 124.25, 124.98, 138.41, 140.14, 0.561),
    (13, 130.29, 89.47, 199.87, 108.41, 0.8254),
    (13, 130.69, 92.07, 212.76, 165.42, 0.9982),
    (13, 135.35, -71.72, 233.18, 170.72, 0.8675),
    (13, 164.29, 186.35, 223.35, 205.84, 0.7527),
    (13, 175.9, -22.38, 243.84, 52.64, 0.9684),
    (13, 197.53, 32.0, 253.88, 86.65, 0.9998),
    (13, 204.03, 11.69, 218.38, 29.27, 0.9977),
    (13, 206.74, 105.58, 216.14, 123.39, 1.0),
    (13, 215.2, 140.5, 260.7, 157.97, 1.0),
    (13, 232.92, -72.7, 260.34, 170.53, 0.8463),
    (13, 254.13, 91.24, 267.26, 109.24, 0.9147),
    (17, 9.53, 46.83, 500.7, 84.09, 0.5809),
    (17, 97.25, 31.76, 128.85, 37.96, 0.8541),
    (18, 113.46, 20.25, 141.77, 33.26, 0.6077),
    (18, 180.91, 20.04, 205.43, 34.47, 0.988),
    (18, 196.84, 17.57, 220.68, 35.23, 0.9919),
]


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
    return sorted(
        (int(c), round(float(b[0]), 2), round(float(b[1]), 2),
         round(float(b[2]), 2), round(float(b[3]), 2), round(float(s), 4))
        for c, b, s in zip(np.asarray(out.classes)[0][valid],
                           np.asarray(out.boxes)[0][valid],
                           np.asarray(out.scores)[0][valid])
    )


@needs_fixture
@needs_image
def test_fixture_transplant_and_forward_golden():
    got = _transplanted_forward_outputs()
    # Exact detection SET (count + classes), every box pinned to <=0.5 px
    # and every score to <=5e-3 against the golden — tight enough that a
    # 1-px decode drift on any single box fails, loose enough to absorb
    # f32 reduction-order jitter (measured: zero at this precision across
    # the 1- and 8-device CPU backends).
    assert len(got) == len(GOLDEN_DETS), (len(got), len(GOLDEN_DETS))
    for g, ref in zip(got, GOLDEN_DETS):
        assert g[0] == ref[0], (g, ref)
        for got_v, ref_v in zip(g[1:5], ref[1:5]):
            assert abs(got_v - ref_v) <= 0.5, (g, ref)
        assert abs(g[5] - ref[5]) <= 5e-3, (g, ref)


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
    print("GOLDEN_DETS = [")
    for det in _transplanted_forward_outputs():
        print(f"    {det},")
    print("]")


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
