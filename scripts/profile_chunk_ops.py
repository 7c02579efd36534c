"""Decompose the block-stage chunk program's execution floor op by op.

Round-4 ablation (scripts/ablate_blockstage_args.py) proved the fused
window-0 chunk program is device-EXECUTION-bound: pre-staging args and even
fusing all chunk dispatches into one lax.map bought nothing. This script
answers the next question — WHICH ops inside the chain carry the floor — by
timing each stage of `engine.single_block_md_batched`'s chain as its own
fenced jitted program at the bench shapes.

Each number is min-of-reps with a scalar D2H fence (block_until_ready is a
no-op on axon). Per-op timings include one program dispatch each (~a ms),
so compare RELATIVE magnitudes; the fused total is the truth for the sum.

Usage: python scripts/profile_chunk_ops.py [--bb 256] [--b 32] [--t 1020]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax

try:
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
except Exception:
    pass
import jax.numpy as jnp
import numpy as np


from _fenced_timing import fence, measure_rtt  # noqa: E402
from _fenced_timing import timed as _timed  # noqa: E402


def timed(fn, *args, reps=3, n=16):
    return _timed(fn, *args, n=n, reps=reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bb", type=int, default=256)
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--t", type=int, default=1020)
    ap.add_argument("--rank", type=int, default=20)
    ap.add_argument("--tavg", type=int, default=10)
    ap.add_argument("--savg", type=int, default=2)
    args = ap.parse_args()

    from localmd_tpu import engine
    from localmd_tpu.ops.linalg import (
        batched_truncated_random_svd,
        cholesky_qr2,
        jacobi_eigh,
        svd_gram_left,
    )
    from localmd_tpu.ops.pooling import downsample_average_pooling
    from localmd_tpu.ops.tiling import extract_patches, flatten_fov, unflatten_fov

    n, b, t, r = args.bb, args.b, args.t, args.rank
    k = r + 10
    key = jax.random.PRNGKey(0)
    d1 = d2 = 512
    data = jax.random.normal(key, (d1, d2, t), dtype=jnp.float32)
    starts = jnp.asarray(
        np.stack([np.random.default_rng(0).integers(0, d1 - b, n),
                  np.random.default_rng(1).integers(0, d2 - b, n)], axis=1)
    )
    keys = jax.random.split(key, n)
    sthr = jnp.float32(1e9)
    tthr = jnp.float32(1e9)

    rtt = measure_rtt()
    print(f"fence RTT: {rtt * 1e3:.2f} ms", flush=True)

    rows = []

    def rec(name, secs):
        rows.append((name, secs * 1e3))
        print(f"{name:34s} {secs * 1e3:9.2f} ms", flush=True)

    # ---- the fused truth -----------------------------------------------
    def fused(data, starts, keys):
        return engine.window0_chunk_step(
            data, starts, keys, b, b, r, args.tavg, args.savg,
            sthr, tthr, 1, t_used=t,
        )

    secs, (acc, counts, vfit) = timed(fused, data, starts, keys)
    rec("window0_chunk_step (fused total)", secs)

    # ---- stage-by-stage --------------------------------------------------
    secs, patches = timed(
        jax.jit(lambda d, s: extract_patches(d, s, b, b)), data, starts
    )
    rec("extract_patches", secs)

    @jax.jit
    def pool_bin(p):
        down = downsample_average_pooling(p, args.savg)
        down_flat = flatten_fov(down)
        down_avg = engine._bin_consecutive(down_flat, args.tavg)
        return down_flat, down_avg

    secs, (down_flat, down_avg) = timed(pool_bin, patches)
    rec("pool + flatten + temporal bin", secs)

    # rSVD internals on down_avg (n, p', t_bin)
    @jax.jit
    def sketch_project(m, ks):
        def one(mm, kk):
            sk = jax.random.normal(kk, (mm.shape[-1], k), dtype=mm.dtype)
            return jnp.matmul(mm, sk, preferred_element_type=jnp.float32)
        return jax.vmap(one)(m, ks)

    secs, projected = timed(sketch_project, down_avg, keys)
    rec("rSVD: sketch matmul", secs)

    secs, q = timed(jax.jit(cholesky_qr2), projected)
    rec("rSVD: cholesky_qr2 (n,p',k)", secs)

    @jax.jit
    def project_b(q, m):
        return jnp.matmul(jnp.swapaxes(q, -1, -2), m,
                          preferred_element_type=jnp.float32)

    secs, bmat = timed(project_b, q, down_avg)
    rec("rSVD: B = Q^T X", secs)

    @jax.jit
    def gram_of(bm):
        return jnp.matmul(bm, jnp.swapaxes(bm, -1, -2),
                          preferred_element_type=jnp.float32)

    secs, gram = timed(gram_of, bmat)
    rec("rSVD: Gram (n,k,k)", secs)

    secs, _ = timed(jax.jit(lambda g: jacobi_eigh(g, 10)), gram)
    rec("jacobi_eigh (n,k,k) 10 sweeps", secs)

    secs, _ = timed(jax.jit(svd_gram_left), bmat)
    rec("rSVD: svd_gram_left(B) full", secs)

    # full rSVD for reference
    secs, (u_c, _, _) = timed(
        jax.jit(lambda m, ks: batched_truncated_random_svd(m, ks, r)),
        down_avg, keys,
    )
    rec("rSVD total (batched)", secs)

    @jax.jit
    def vc(u, df):
        return jnp.matmul(jnp.swapaxes(u, -1, -2), df,
                          preferred_element_type=jnp.float32)

    secs, v_coarse = timed(vc, u_c, down_flat)
    rec("v_coarse = U^T down_flat", secs)

    secs, _ = timed(
        jax.jit(lambda v: jnp.swapaxes(
            cholesky_qr2(jnp.swapaxes(v, -1, -2)), -1, -2)), v_coarse
    )
    rec("v_basis choleskyQR2 (n,t,r)", secs)

    v_basis = jnp.swapaxes(cholesky_qr2(jnp.swapaxes(v_coarse, -1, -2)), -1, -2)
    blocks_flat = flatten_fov(patches)

    @jax.jit
    def sp(bf, vb):
        return jnp.matmul(bf, jnp.swapaxes(vb, -1, -2),
                          preferred_element_type=jnp.float32)

    secs, spatial_proj = timed(sp, blocks_flat, v_basis)
    rec("spatial_proj = X @ Vb^T", secs)

    secs, u_final = timed(jax.jit(cholesky_qr2), spatial_proj)
    rec("u_final choleskyQR2 (n,p,r)", secs)

    @jax.jit
    def vn(u, bf):
        return jnp.matmul(jnp.swapaxes(u, -1, -2), bf,
                          preferred_element_type=jnp.float32)

    secs, v_new = timed(vn, u_final, blocks_flat)
    rec("v_new = U^T X", secs)

    secs, _ = timed(jax.jit(svd_gram_left), v_new)
    rec("svd_gram_left(v_new) (n,r,t)", secs)

    from localmd_tpu.ops.roughness import evaluate_fitness

    v_left, v_sing, v_right = svd_gram_left(v_new)
    v_final = v_sing[..., :, None] * v_right
    u2 = jnp.matmul(u_final, v_left, preferred_element_type=jnp.float32)

    @jax.jit
    def fit(u, v):
        u_img = unflatten_fov(u, b, b)
        return evaluate_fitness(jnp.moveaxis(u_img, -1, 1), v, sthr, tthr)

    secs, decisions = timed(fit, u2, v_final)
    rec("evaluate_fitness", secs)

    @jax.jit
    def pack(u, dec):
        acc0 = jnp.zeros((n, b * b, r), dtype=u.dtype)
        c0 = jnp.zeros((n,), dtype=jnp.int32)
        return engine.pack_components(u, dec, acc0, c0, 1)

    secs, (acc2, counts2) = timed(pack, u2, decisions)
    rec("pack_components", secs)

    @jax.jit
    def tproj(a, bf):
        return engine.temporal_projector_batched(a, bf)

    secs, _ = timed(tproj, acc2, blocks_flat)
    rec("temporal projector", secs)

    total_parts = sum(ms for nm, ms in rows[1:] if not nm.startswith("rSVD total")
                      and "svd_gram_left(B) full" not in nm
                      and "jacobi_eigh" not in nm
                      and "Gram (n,k,k)" not in nm)
    print(f"\nsum of chain stages (excl. overlaps): {total_parts:.2f} ms")
    print(f"fused program:                        {rows[0][1]:.2f} ms")


if __name__ == "__main__":
    main()
