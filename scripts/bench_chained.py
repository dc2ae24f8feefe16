"""Trustworthy device-time measurement through the axon tunnel.

Two pathologies make naive timing loops lie here (round-1 BENCH bug, and
round-2 observations):
  * a synchronous fetch per iteration pays a ~30 ms host<->TPU round trip,
    swamping sub-ms kernels;
  * repeated identical dispatches without fetches can be elided by the
    remote runtime (a backbone pass "measured" at 0.37 ms/call, 25x below
    its FLOP roofline).

Methodology used everywhere in this script: CHAIN each iteration's output
into the next iteration's input (x += eps * checksum(out)), dispatch the
whole chain asynchronously, fetch ONCE.  Elision is impossible (data
dependency), and the single round trip amortizes over k iterations.  The
round-trip time itself is measured with a trivial chained op and reported.

Usage: python scripts/bench_chained.py [what] [batch]
  what: all | rtt | topk | align | stages
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
WHAT = sys.argv[1] if len(sys.argv) > 1 else "all"
N_ITERS = 30


def chain_time(name, step, x0, iters=N_ITERS, jit=True):
    """step: x -> x (data-dependent). Returns per-iteration ms."""
    f = jax.jit(step) if jit else step
    x = jax.block_until_ready(f(x0))  # compile + warm
    t0 = time.time()
    x = x0
    for _ in range(iters):
        x = f(x)
    jax.block_until_ready(x)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:40s} {dt:9.3f} ms/iter")
    return dt


def feedback(x, out_scalar):
    """Fold a scalar derived from the output back into the input: the data
    dependency forces real sequential execution (XLA cannot prove the scalar
    negligible).  MUST preserve x.dtype — f32-scalar promotion would retrace
    the chain at f32 and silently benchmark the wrong precision."""
    return (x.astype(jnp.float32) + 1e-30 * out_scalar).astype(x.dtype)


def bench_rtt():
    x0 = jax.device_put(np.ones((8, 128), np.float32))
    chain_time("rtt-floor: x+1 chained", lambda x: x + 1.0, x0)
    # per-iteration-fetch loop for comparison: shows the tunnel round trip
    f = jax.jit(lambda x: x + 1.0)
    x = jax.block_until_ready(f(x0))
    t0 = time.time()
    for _ in range(10):
        x = f(x)
        _ = float(jnp.sum(x))
    print(f"{'rtt: x+1 with per-iter fetch':40s} {(time.time()-t0)/10*1000:9.3f} ms/iter")


def bench_topk():
    from faster_rcnn_tpu.ops.sort_pallas import topk_sorted_pallas

    n = 38 * 94 * 18
    rng = np.random.RandomState(0)
    x0 = jax.device_put(rng.uniform(size=(B, n)).astype(np.float32))

    def xla_step(x):
        v, i = jax.vmap(lambda s: jax.lax.top_k(s, 8000))(x)
        return feedback(x, jnp.sum(v) + jnp.sum(i))

    def pallas_step(x):
        v, i = jax.vmap(lambda s: topk_sorted_pallas(s, 8000))(x)
        return feedback(x, jnp.sum(v) + jnp.sum(i))

    a = chain_time(f"top_k xla (64k->8000) B={B}", xla_step, x0)
    b = chain_time(f"top_k pallas bitonic B={B}", pallas_step, x0)
    print(f"  -> per-img: xla {a/B:.3f} ms, pallas {b/B:.3f} ms")


def bench_align():
    from faster_rcnn_tpu.ops.roi_align import roi_align_batched

    H, W, C, R = 38, 94, 1024, 304
    rng = np.random.RandomState(0)
    feat0 = jax.device_put(
        rng.standard_normal((B, H, W, C)).astype(np.float32)
    ).astype(jnp.bfloat16)
    x1 = rng.randint(0, W - 2, (B, R)); y1 = rng.randint(0, H - 2, (B, R))
    x2 = np.maximum(np.minimum(x1 + rng.randint(1, 40, (B, R)), W - 1), x1 + 1)
    y2 = np.maximum(np.minimum(y1 + rng.randint(1, 20, (B, R)), H - 1), y1 + 1)
    rois = jax.device_put(np.stack([x1, y1, x2, y2], -1).astype(np.float32))

    for impl in ("gather", "einsum", "pallas"):
        def step(f, impl=impl):
            out = roi_align_batched(f, rois, 7, impl)
            return feedback(f, jnp.sum(out.astype(jnp.float32)))

        d = chain_time(f"roi_align {impl} B={B} R={R}", step, feat0)
        print(f"  -> {impl}: {d/B:.3f} ms/img")


def bench_stages():
    from faster_rcnn_tpu.config import kitti_config
    from faster_rcnn_tpu.models.detector import FasterRCNN, init_model
    from faster_rcnn_tpu.ops.roi_align import roi_align_batched
    from faster_rcnn_tpu.train.pipeline import rpn_forward_proposals
    from faster_rcnn_tpu.inference import make_detect_fn

    cfg = kitti_config()
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    h, w = cfg.data.canvas
    rng = np.random.RandomState(0)
    img0 = jax.device_put(rng.standard_normal((B, h, w, 3)).astype(np.float32) * 30)
    img_hw = jax.device_put(np.tile([[600, 1500]], (B, 1)).astype(np.int32))
    vs = jax.device_put(variables)

    # NB: ``vs`` is threaded as a jit ARGUMENT via functools.partial binding
    # at call time (chain_time jits the closure; a plain closure over vs
    # would embed the weight tree as compile-request constants)
    def s_backbone(v, x):
        feat = model.apply(v, x, method=FasterRCNN.backbone)
        return feedback(x, jnp.sum(feat.astype(jnp.float32)))

    def s_props(v, x):
        feat, pb, ps, pv = rpn_forward_proposals(
            cfg, model, v, x, img_hw, cfg.rpn.infer_pre_nms, cfg.rpn.infer_post_nms
        )
        return feedback(x, jnp.sum(pb) + jnp.sum(feat.astype(jnp.float32)))

    def s_align(v, x):
        feat, pb, ps, pv = rpn_forward_proposals(
            cfg, model, v, x, img_hw, cfg.rpn.infer_pre_nms, cfg.rpn.infer_post_nms
        )
        pooled = roi_align_batched(feat, pb, cfg.det.pool_size, cfg.det.roi_align_impl)
        return feedback(x, jnp.sum(pooled.astype(jnp.float32)))

    def s_head(v, x):
        feat, pb, ps, pv = rpn_forward_proposals(
            cfg, model, v, x, img_hw, cfg.rpn.infer_pre_nms, cfg.rpn.infer_post_nms
        )
        pooled = roi_align_batched(feat, pb, cfg.det.pool_size, cfg.det.roi_align_impl)
        cls, reg = model.apply(v, pooled, method=FasterRCNN.det_head)
        return feedback(x, jnp.sum(cls) + jnp.sum(reg))

    detect = make_detect_fn(cfg, model, variables)
    detect_fn = detect.func

    def s_detect(v, x):
        out = detect_fn(v, x, img_hw)
        return feedback(x, jnp.sum(out.scores) + jnp.sum(out.boxes))

    def with_vs(name, fn):
        f = jax.jit(fn)
        return chain_time(name, lambda x: f(vs, x), img0, jit=False)

    t1 = with_vs(f"backbone B={B}", s_backbone)
    t2 = with_vs("+rpn+proposals(topk+NMS)", s_props)
    t3 = with_vs(f"+roi_align({cfg.det.roi_align_impl})", s_align)
    t4 = with_vs("+det head", s_head)
    t5 = with_vs("full detect", s_detect)
    print(f"\ndeltas ms/batch: rpn+props={t2-t1:.2f} align={t3-t2:.2f} "
          f"head={t4-t3:.2f} decode+nms={t5-t4:.2f}")
    print(f"full detect: {t5/B:.3f} ms/img = {1000*B/t5:.1f} img/s device-side")


if WHAT in ("all", "rtt"):
    bench_rtt()
if WHAT in ("all", "topk"):
    bench_topk()
if WHAT in ("all", "align"):
    bench_align()
if WHAT in ("all", "stages"):
    bench_stages()
