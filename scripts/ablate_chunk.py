import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
import numpy as np
from localmd_tpu import engine
from localmd_tpu.ops.tiling import BlockGrid, extract_patches

d1 = d2 = 512; t = 1024; b = 32; mc = 20; bb = 256
key = jax.random.PRNGKey(0)
data = jax.random.normal(key, (d1, d2, t), dtype=jnp.float32)
grid = BlockGrid(d1, d2, (b, b))
starts_host = grid.starts
keys_all = jax.random.split(key, grid.n_blocks)

def timed(label, fn, *a, n=3):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a); jax.block_until_ready(out)
    print(f"{label:36s} {(time.perf_counter()-t0)/n*1e3:9.2f} ms")
    return out

idx = np.arange(0, bb)
starts_b = jnp.asarray(starts_host[idx]); keys_b = jnp.asarray(keys_all[idx])

timed("extract_patches (256 blocks)", jax.jit(lambda d, s: extract_patches(d, s, b, b)), data, starts_b)
timed("window0_chunk_step (256 blocks)", lambda d, s, k: engine.window0_chunk_step(
    d, s, k, b, b, mc, 10, 2, 0.9, 2.0, 1, engine.identity, engine.identity, 1020), data, starts_b, keys_b)
timed("single_block_md_batched", jax.jit(lambda p, k: engine.single_block_md_batched(
    p, k, mc, 10, 2, 0.9, 2.0)), extract_patches(data, starts_b, b, b)[..., :1020], keys_b)
# threshold kernel (250 iters, 8x32 batches)
timed("threshold kernel (250 sims)", lambda k: engine._threshold_kernel(k, b, b, t, 1, 8, 32, 250, 5.0), key)
# RNG cost alone
timed("random.normal (250,32,32,1024)", jax.jit(lambda k: jax.random.normal(k, (250, b, b, t))), key)
