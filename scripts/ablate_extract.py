"""Ablate patch-extraction strategies for the block stage.

extract_patches (vmapped dynamic_slice) measures 29.3 ms per 256-block chunk
at 512^2x1020 — the single largest op in the chunk program (profile_chunk_ops).
Roofline for the copy is ~2.6 ms (1.07 GB out + 1.07-4.3 GB in). Candidates:

A. current: vmap(dynamic_slice)
C. pixel-row take: data_flat (d1*d2, t) C-order, one jnp.take of n*p rows
H. strip gather: lax.gather of (1, b2, t) strips, n*b1 of them
F. coset reshape: for stride = b/2 grids, each of the 4 cosets is a pure
   slice+reshape (zero gather) — blocks materialize in coset order
P. pooled-first: extract from the 2x2-pooled FOV (16x less bytes) — only
   for the coarse stage, combined with A/C/H for full-res uses
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
except Exception:
    pass

from localmd_tpu.ops.tiling import extract_patches


from _fenced_timing import fence, measure_rtt  # noqa: E402
from _fenced_timing import timed as _timed  # noqa: E402


def timed(fn, *args, reps=3, n=8):
    return _timed(fn, *args, n=n, reps=reps)


def main():
    d1 = d2 = 512
    t = 1020
    b = 32
    n = 256
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (d1, d2, t), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    # regular-grid starts (multiples of 16), like the pipeline's
    pos = np.arange(0, d1 - b + 1, b // 2)
    rr, cc = np.meshgrid(pos, pos, indexing="ij")
    all_starts = np.stack([rr.ravel(), cc.ravel()], axis=1)
    starts_np = all_starts[:n]
    starts = jnp.asarray(starts_np)

    print(f"fence RTT {measure_rtt()*1e3:.2f} ms", flush=True)

    # A: current
    secs, ref = timed(
        jax.jit(lambda d, s: extract_patches(d, s, b, b)), data, starts
    )
    print(f"A vmap(dynamic_slice)     {secs*1e3:8.2f} ms", flush=True)

    # C: pixel-row take (C-order flatten)
    row_ids = (
        starts_np[:, 0:1, None] + np.arange(b)[None, :, None]
    ) * d2 + (starts_np[:, 1:2, None] + np.arange(b)[None, None, :])
    row_ids_j = jnp.asarray(row_ids.reshape(-1))

    @jax.jit
    def take_rows(d, ids):
        flat = d.reshape(d1 * d2, t)
        return jnp.take(flat, ids, axis=0).reshape(n, b, b, t)

    secs, out_c = timed(take_rows, data, row_ids_j)
    print(f"C pixel-row take          {secs*1e3:8.2f} ms", flush=True)
    np.testing.assert_array_equal(np.asarray(out_c), np.asarray(ref))

    # H: strip take — (n*b) strip ids over a (d1*d2//b2?) no: gather rows of
    # (d2, t) then slice cols is huge; instead take strip start rows on a
    # (d1, d2, t) with take along axis 0 of row indices, vmapped col slice
    @jax.jit
    def strip_take(d, s):
        rows = (s[:, 0:1] + jnp.arange(b)[None, :]).reshape(-1)  # (n*b,)
        strips = jnp.take(d, rows, axis=0)  # (n*b, d2, t)
        strips = strips.reshape(n, b, d2, t)

        def one(st, strip):
            return jax.lax.dynamic_slice(strip, (0, st[1], 0), (b, b, t))

        return jax.vmap(one)(s, strips)

    try:
        secs, out_h = timed(strip_take, data, starts)
        print(f"H row-strip take+slice    {secs*1e3:8.2f} ms", flush=True)
        np.testing.assert_array_equal(np.asarray(out_h), np.asarray(ref))
    except Exception as e:  # noqa: BLE001 - may OOM (materializes strips)
        print(f"H failed: {str(e)[:80]}")

    # F: coset reshape (stride = b//2; 4 cosets, each a slice+reshape)
    stride = b // 2

    @jax.jit
    def coset_extract(d):
        outs = []
        for dr in (0, 1):
            for dc in (0, 1):
                r0, c0 = dr * stride, dc * stride
                nr = (d1 - r0) // b
                nc = (d2 - c0) // b
                v = d[r0 : r0 + nr * b, c0 : c0 + nc * b]
                v = v.reshape(nr, b, nc, b, t).transpose(0, 2, 1, 3, 4)
                outs.append(v.reshape(nr * nc, b, b, t))
        return jnp.concatenate(outs, axis=0)

    secs, out_f = timed(coset_extract, data)
    nf = int(out_f.shape[0])
    print(f"F coset reshape ({nf} blk) {secs*1e3:8.2f} ms", flush=True)
    # verify one coset block against a direct slice
    np.testing.assert_array_equal(
        np.asarray(out_f[0]), np.asarray(data[0:b, 0:b, :])
    )

    # P: pooled-first (coarse-stage bytes shrink 4x)
    @jax.jit
    def pooled_extract(d, s):
        pooled = jax.lax.reduce_window(
            d, 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1), "VALID"
        ) * 0.25
        return extract_patches(pooled, s // 2, b // 2, b // 2)

    secs, _ = timed(pooled_extract, data, starts)
    print(f"P pool FOV + extract/4    {secs*1e3:8.2f} ms", flush=True)

    # A on pooled shapes only (what the coarse stage would pay)
    pooled = jax.lax.reduce_window(
        data, 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1), "VALID"
    ) * 0.25
    secs, _ = timed(
        jax.jit(lambda d, s: extract_patches(d, s, b // 2, b // 2)),
        pooled, starts // 2,
    )
    print(f"  (extract on pooled only){secs*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
