"""Fenced per-stage attribution of the warm bench pipeline on the live TPU.

``jax.block_until_ready`` is a no-op on axon; every fence here is a scalar
D2H drain, so each stage time = its device compute + one ~28 ms RTT.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
import logging, time

import jax, jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
from bench import make_movie, run_once

logging.getLogger("localmd_tpu").setLevel(logging.WARNING)


def drain(x):
    leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "ravel")]
    return float(jnp.sum(leaves[0].ravel()[:1]))


movie = make_movie(512, 512, 2048)
_, cold = run_once(movie)
pmd, warm = run_once(movie)
print(f"cold {cold:.1f}s  warm {warm:.2f}s", flush=True)

from localmd_tpu import engine
from localmd_tpu.loader import PMDLoader
from localmd_tpu.ops.tiling import block_grid
from localmd_tpu.factorization import compute_lowrank_factorized_svd, final_svd_reformat

t0 = time.perf_counter()
load_obj = PMDLoader(movie, seed=0)
drain(load_obj.std_img); drain(load_obj.spatial_basis)
print(f"stats+background      {(time.perf_counter()-t0)*1e3:8.1f} ms")

t0 = time.perf_counter()
s_thr, t_thr = engine.threshold_heuristic((32, 32, 1024), iters=250, key=jax.random.PRNGKey(1), as_device=True)
drain(s_thr)
print(f"thresholds (uncached) {(time.perf_counter()-t0)*1e3:8.1f} ms")
t0 = time.perf_counter()
s_thr, t_thr = engine.threshold_heuristic((32, 32, 1024), iters=250, key=jax.random.PRNGKey(1), as_device=True)
drain(s_thr)
print(f"thresholds (cached)   {(time.perf_counter()-t0)*1e3:8.1f} ms")

t0 = time.perf_counter()
data, tb = load_obj.temporal_crop_with_filter(list(range(1024)))
drain(data)
print(f"init load+filter      {(time.perf_counter()-t0)*1e3:8.1f} ms")

grid = block_grid(512, 512, (32, 32))
keys = jax.random.split(jax.random.PRNGKey(2), grid.n_blocks)
t0 = time.perf_counter()
accs, counts_c, vs = [], [], []
for s in range(0, grid.n_blocks, 256):
    idx = np.arange(s, min(s + 256, grid.n_blocks))
    pad = 256 - len(idx)
    idxp = np.concatenate([idx, np.zeros(pad, dtype=int)]) if pad else idx
    a, c, v = engine.window0_chunk_step(
        data, jnp.asarray(grid.starts[idxp]), jnp.asarray(keys[idxp]),
        32, 32, 20, 10, 2, s_thr, t_thr, 1,
        engine.identity, engine.identity, 1020,
    )
    accs.append(a[: len(idx)]); counts_c.append(c[: len(idx)]); vs.append(v[: len(idx)])
panels = jnp.concatenate(accs); v_blocks = jnp.concatenate(vs)
counts = np.asarray(jnp.concatenate(counts_c))
print(f"block stage (4 chunks + counts pull) {(time.perf_counter()-t0)*1e3:8.1f} ms")

# assembly + factorized SVD + V + reformat, each fenced
wf, cf, rows_dev, starts_dev = grid.device_constants()
t0 = time.perf_counter()
panels_w = panels * wf[None, :, None]
panels_w = panels_w / cf[rows_dev][:, :, None]
drain(panels_w)
print(f"panel weighting       {(time.perf_counter()-t0)*1e3:8.1f} ms")

from localmd_tpu.blocksparse import BlockSparseMatrix
u = BlockSparseMatrix(panels=panels_w, rows=rows_dev, n_pixels=512 * 512,
                      dense_basis=jnp.asarray(load_obj.spatial_basis),
                      starts=starts_dev, block_shape=(32, 32))
total_rank = int(counts.sum())
m = grid.n_blocks * 20 + u.dense_basis.shape[1]
v_cropped = jnp.concatenate([v_blocks.reshape(grid.n_blocks * 20, -1), tb[:, :1020]], axis=0)
cols = max(1, int(min(total_rank + 15, 1024) * 0.33))
rnd = jax.random.normal(jax.random.PRNGKey(3), (v_cropped.shape[1], cols))


def timed(label, fn, reps=5):
    out = fn()
    drain(out)  # warm (compile/load paid here)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    drain(out)
    total = (time.perf_counter() - t0) * 1e3
    print(f"{label:22s} {(total - 29) / reps:8.1f} ms/call marginal (total {total:7.1f})")
    return out


p = timed("factorized svd", lambda: compute_lowrank_factorized_svd(
    u, jnp.matmul(v_cropped, rnd), only_left=True, expected_rank=total_rank + 15))
v = timed("v regression (2048f)", lambda: load_obj.v_projection(u, p))
timed("final reformat", lambda: final_svd_reformat(p, v, rel_tol=0.0))
timed("gram_quadratic only", lambda: u.gram_quadratic(jnp.matmul(v_cropped, rnd)))
timed("u.matmul (d x cols)", lambda: u.matmul(jnp.zeros((m, cols), jnp.float32)))
