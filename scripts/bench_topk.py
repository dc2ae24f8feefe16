"""Microbench: top-k alternatives for the proposal prescore truncation."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")

B, N = 16, 38 * 94 * 18
rng = np.random.RandomState(0)
probs = jax.device_put(rng.uniform(size=(B, N)).astype(np.float32))
boxes = jax.device_put(rng.uniform(0, 90, (B, N, 4)).astype(np.float32))

def timeit(name, fn, *args, n=30):
    out = jax.block_until_ready(fn(*args))
    s = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        s = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    dt = (time.time() - t0) / n * 1000
    print(f"{name:36s} {dt:8.2f} ms/batch  {dt/B:6.3f} ms/img (sum={s:.1f})")

for k in (512, 2048, 8000):
    timeit(f"top_k(64k->{k})", jax.jit(lambda p, k=k: jax.vmap(lambda x: jax.lax.top_k(x, k)[0])(p)), probs)

@jax.jit
def approx8k(p):
    return jax.vmap(lambda x: jax.lax.approx_max_k(x, 8192, recall_target=0.95)[0])(p)
timeit("approx_max_k(64k->8192)", approx8k, probs)

@jax.jit
def approx_sort(p, bx):
    def one(x, b):
        v, i = jax.lax.approx_max_k(x, 8192, recall_target=0.95)
        bb = b[i]
        srt = jax.lax.sort((-v, bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3]), num_keys=1)
        return -srt[0]
    return jax.vmap(one)(p, bx)
timeit("approx_max_k + gather + sort8k", approx_sort, probs, boxes)

@jax.jit
def approx_topk8k(p, bx):
    def one(x, b):
        v, i = jax.lax.approx_max_k(x, 8192, recall_target=0.95)
        s2, i2 = jax.lax.top_k(v, 8000)
        return s2, b[i[i2]]
    return jax.vmap(one)(p, bx)
timeit("approx_max_k + top_k(8192->8000)", approx_topk8k, probs, boxes)
