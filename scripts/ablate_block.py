"""Per-op ablation of the block-stage kernel chain with REAL syncs.

``jax.block_until_ready`` does not block on the axon platform; every timing
drains via a scalar D2H of the output.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from localmd_tpu.ops.linalg import svd_gram_left, svd_gram_right, cholesky_qr2, batched_truncated_random_svd
from localmd_tpu.ops.pooling import downsample_average_pooling
from localmd_tpu.ops.roughness import evaluate_fitness

n, b1, b2, t, r, tb = 256, 32, 32, 1020, 30, 102
key = jax.random.PRNGKey(0)
blocks = jax.random.normal(key, (n, b1, b2, t), dtype=jnp.float32)
blocks_flat = blocks.reshape(n, b1 * b2, t)
vmat = jax.random.normal(key, (n, r, t), dtype=jnp.float32)
smat = jax.random.normal(key, (n, b1 * b2, r), dtype=jnp.float32)
down_avg = jax.random.normal(key, (n, 256, tb), dtype=jnp.float32)
gram = jnp.matmul(vmat, jnp.swapaxes(vmat, -1, -2))
keys = jax.random.split(key, n)


def drain(out):
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "ravel")]
    return float(jnp.sum(leaves[0].ravel()[:1]))


def timed(label, fn, *a, reps=10):
    f = jax.jit(fn)
    drain(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    drain(out)
    # marginal: subtract one-drain RTT (~29 ms) spread over reps
    total = (time.perf_counter() - t0) * 1e3
    print(f"{label:36s} {(total - 29) / reps:8.2f} ms/call  (total {total:7.1f})")


timed("svd_gram_left (n,30,1020)", svd_gram_left, vmat)
timed("svd_gram_right (n,1024,30)", svd_gram_right, smat)
timed("cholqr2 cols  (n,1024,30)", cholesky_qr2, smat)
timed("batched_rsvd  (n,256,102)", lambda m, k: batched_truncated_random_svd(m, k, 20), down_avg, keys)
timed("pool (n,32,32,1020)", lambda b: downsample_average_pooling(b, 2), blocks)
timed("evaluate_fitness", lambda u, v: evaluate_fitness(jnp.moveaxis(u.reshape(n, b1, b2, r), -1, 1), v, 1.0, 2.0), smat, vmat)
timed("big matmul (n,1024,1020)x(.,30)", lambda b, v: jnp.matmul(b, jnp.swapaxes(v, -1, -2), preferred_element_type=jnp.float32), blocks_flat, vmat)
timed("eigh (n,30,30)", lambda g: jnp.linalg.eigh(g), gram)
timed("cholesky (n,30,30)", lambda g: jnp.linalg.cholesky(g + 1e-3 * jnp.eye(30)), gram)
timed("tri_solve (n,1024,30)", lambda g, a: jax.lax.linalg.triangular_solve(
    jnp.linalg.cholesky(g + 1e-3 * jnp.eye(30)), a, left_side=False, lower=True, transpose_a=True), gram, smat)
timed("random.normal (n,1020,30)", lambda k: jax.random.normal(k, (n, 1020, 30)), key)
timed("random.normal vmapped per-key", lambda ks: jax.vmap(lambda k: jax.random.normal(k, (1020, 30)))(ks), keys)
