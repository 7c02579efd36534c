import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
import numpy as np
from localmd_tpu import engine
from localmd_tpu.ops.tiling import BlockGrid, extract_patches

d1 = d2 = 512; t = 1024; b = 32; mc = 20; bb = 256; tu = 1020
key = jax.random.PRNGKey(0)
data = jax.random.normal(key, (d1, d2, t), dtype=jnp.float32)
grid = BlockGrid(d1, d2, (b, b))
starts_b = jnp.asarray(grid.starts[:bb]); keys_b = jnp.asarray(jax.random.split(key, grid.n_blocks)[:bb])

def chunk(d, s, k):
    return engine.window0_chunk_step(d, s, k, b, b, mc, 10, 2, 0.9, 2.0, 1,
                                     engine.identity, engine.identity, tu)

def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].ravel()[:1]))  # tiny scalar D2H forces drain

# warm
sync(chunk(data, starts_b, keys_b))

for n in (1, 5, 10):
    t0 = time.perf_counter()
    for _ in range(n):
        out = chunk(data, starts_b, keys_b)
    sync(out)
    print(f"window0_chunk_step x{n:2d}: total {(time.perf_counter()-t0)*1e3:9.1f} ms")

thr = lambda k: engine._threshold_kernel(k, b, b, t, 1, 8, 32, 250, 5.0)
sync(thr(key))
for n in (1, 5):
    t0 = time.perf_counter()
    for _ in range(n):
        out = thr(key)
    sync(out)
    print(f"threshold_kernel  x{n:2d}: total {(time.perf_counter()-t0)*1e3:9.1f} ms")
