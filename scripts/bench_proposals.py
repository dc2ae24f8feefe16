"""Microbench: proposal-path pieces at KITTI B=16 shapes (device-side)."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from faster_rcnn_tpu.ops import nms as nms_ops

B, N, PRE, POST = 16, 38 * 94 * 18, 8000, 300
rng = np.random.RandomState(0)
probs = jax.device_put(rng.uniform(size=(B, N)).astype(np.float32))
boxes_all = jax.device_put(
    np.stack([rng.uniform(0, 90, (B, N)), rng.uniform(0, 35, (B, N)),
              rng.uniform(1, 94, (B, N)), rng.uniform(1, 38, (B, N))], -1).astype(np.float32))

def timeit(name, fn, *args, n=30):
    out = jax.block_until_ready(fn(*args))
    s0 = float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # force
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        s = float(jnp.sum((out[0] if isinstance(out, tuple) else out)))
    dt = (time.time() - t0) / n * 1000
    print(f"{name:30s} {dt:8.2f} ms/batch  {dt/B:6.3f} ms/img  (sum={s:.1f})")
    return dt

@jax.jit
def just_topk(p):
    return jax.vmap(lambda x: jax.lax.top_k(x, PRE)[0])(p)

@jax.jit
def topk_gather(p, bx):
    def one(x, b):
        s, i = jax.lax.top_k(x, PRE)
        return s, b[i]
    return jax.vmap(one)(p, bx)

@jax.jit
def full_nms(p, bx):
    def one(x, b):
        s, i = jax.lax.top_k(x, PRE)
        tb = b[i]
        return nms_ops.nms_topk(tb, s, s > -1e30, POST, 0.7, tile=256, presorted=True)[0]
    return jax.vmap(one)(p, bx)

@jax.jit
def sort_based(p):
    # full variadic sort as alternative to top_k
    def one(x):
        return jax.lax.sort((-x,), num_keys=1)[0][:PRE]
    return jax.vmap(one)(p)

timeit("top_k(64k->8000)", just_topk, probs)
timeit("top_k + box gather", topk_gather, probs, boxes_all)
timeit("full: topk+gather+NMS(300)", full_nms, probs, boxes_all)
timeit("lax.sort 64k (alt)", sort_based, probs)
