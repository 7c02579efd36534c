"""Can the block stage's big per-block matmuls run off COSET VIEWS of the
FOV, skipping patch materialization entirely?

The 50%-overlap grid is 4 cosets; within a coset, blocks tile disjointly,
so the "patch tensor" is a reshape of a slice of the FOV. If dot_general
handles the (a, i, c, j, t) view at matmul speed, spatial_proj / v_new /
the pooled coarse stage never need the 16 ms gather.

Measures per-coset einsum vs gather+batched-matmul for the two X-touching
products at bench shapes.
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
    r = 20
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    data = jax.random.normal(k1, (d1, d2, t), dtype=jnp.float32)

    # coset (0,0): 16x16 = 256 blocks — same count as a bench chunk
    nr = nc = d1 // b
    n = nr * nc
    starts_np = np.stack(
        np.meshgrid(np.arange(nr) * b, np.arange(nc) * b, indexing="ij"),
        axis=-1,
    ).reshape(-1, 2)
    starts = jnp.asarray(starts_np)
    vb = jax.random.normal(k2, (n, r, t), dtype=jnp.float32)
    vb_grid = vb.reshape(nr, nc, r, t)
    uf = jax.random.normal(k3, (n, b * b, r), dtype=jnp.float32)
    uf_grid = uf.reshape(nr, nc, b, b, r)  # C-order pixels for the view test

    print(f"fence RTT {measure_rtt()*1e3:.2f} ms", flush=True)

    # --- spatial_proj: gather + batched matmul (current shape of things) ---
    @jax.jit
    def sp_gather(d, s, v):
        patches = extract_patches(d, s, b, b)            # (n, b, b, t)
        flat = patches.reshape(n, b * b, t)              # C-order pixels
        return jnp.matmul(flat, jnp.swapaxes(v, -1, -2),
                          preferred_element_type=jnp.float32)

    secs, ref = timed(sp_gather, data, starts, vb)
    print(f"spatial_proj gather+matmul   {secs*1e3:8.2f} ms", flush=True)

    # --- spatial_proj: coset-view einsum, zero gather ---
    @jax.jit
    def sp_view(d, vg):
        view = d.reshape(nr, b, nc, b, t)
        # out[a, c, i, j, s] = sum_t view[a, i, c, j, t] * vg[a, c, s, t]
        out = jnp.einsum(
            "aicjt,acst->acijs", view, vg,
            preferred_element_type=jnp.float32,
        )
        return out.reshape(n, b * b, r)

    secs, out_v = timed(sp_view, data, vb_grid)
    print(f"spatial_proj coset einsum    {secs*1e3:8.2f} ms", flush=True)
    np.testing.assert_allclose(
        np.asarray(out_v), np.asarray(ref), rtol=2e-4, atol=2e-3
    )

    # --- v_new: gather + batched matmul ---
    @jax.jit
    def vn_gather(d, s, u):
        patches = extract_patches(d, s, b, b)
        flat = patches.reshape(n, b * b, t)
        return jnp.matmul(jnp.swapaxes(u, -1, -2), flat,
                          preferred_element_type=jnp.float32)

    secs, refv = timed(vn_gather, data, starts, uf)
    print(f"v_new gather+matmul          {secs*1e3:8.2f} ms", flush=True)

    @jax.jit
    def vn_view(d, ug):
        view = d.reshape(nr, b, nc, b, t)
        out = jnp.einsum(
            "aicjt,acijs->acst", view, ug,
            preferred_element_type=jnp.float32,
        )
        return out.reshape(n, r, t)

    secs, outv = timed(vn_view, data, uf_grid)
    print(f"v_new coset einsum           {secs*1e3:8.2f} ms", flush=True)
    np.testing.assert_allclose(
        np.asarray(outv), np.asarray(refv), rtol=2e-4, atol=2e-3
    )

    # --- coarse stage: pool FOV once + coset view of pooled (no gather) ---
    @jax.jit
    def pooled_views(d):
        pooled = jax.lax.reduce_window(
            d, 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1), "VALID"
        ) * 0.25
        hb = b // 2
        view = pooled.reshape(nr, hb, nc, hb, t)
        down_flat = view.transpose(0, 2, 1, 3, 4).reshape(n, hb * hb, t)
        t_bin = t // 10
        down_avg = jnp.mean(
            down_flat.reshape(n, hb * hb, t_bin, 10), axis=-1
        )
        return down_flat, down_avg

    secs, _ = timed(pooled_views, data)
    print(f"coarse: pool+view+bin        {secs*1e3:8.2f} ms", flush=True)

    # and WITHOUT the down_flat transpose-materialize (bin from view)
    @jax.jit
    def pooled_bin_only(d):
        pooled = jax.lax.reduce_window(
            d, 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1), "VALID"
        ) * 0.25
        hb = b // 2
        t_bin = t // 10
        view = pooled.reshape(nr, hb, nc, hb, t_bin, 10)
        down_avg = jnp.mean(view, axis=-1).transpose(0, 2, 1, 3, 4).reshape(
            n, hb * hb, t_bin
        )
        return down_avg

    secs, _ = timed(pooled_bin_only, data)
    print(f"coarse: pool+bin-then-move   {secs*1e3:8.2f} ms", flush=True)


if __name__ == "__main__" and not os.environ.get("POOL_ONLY"):
    main()


def pooling_variants():
    """Standalone: which 2x2 spatial pooling formulation is fastest."""
    d1 = d2 = 512
    t = 1020
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (d1, d2, t), dtype=jnp.float32)
    print(f"fence RTT {measure_rtt()*1e3:.2f} ms", flush=True)

    @jax.jit
    def pool_rw(d):
        return jax.lax.reduce_window(
            d, 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1), "VALID"
        ) * 0.25

    secs, ref = timed(pool_rw, data)
    print(f"pool reduce_window           {secs*1e3:8.2f} ms", flush=True)

    @jax.jit
    def pool_reshape(d):
        v = d.reshape(d1 // 2, 2, d2 // 2, 2, t)
        return (v[:, 0, :, 0] + v[:, 0, :, 1] + v[:, 1, :, 0] + v[:, 1, :, 1]) * 0.25

    secs, out = timed(pool_reshape, data)
    print(f"pool strided-sum             {secs*1e3:8.2f} ms", flush=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    @jax.jit
    def bin_t(d):
        return jnp.mean(d.reshape(d1, d2, t // 10, 10), axis=-1)

    secs, _ = timed(bin_t, data)
    print(f"bin t (reshape-mean)         {secs*1e3:8.2f} ms", flush=True)

    @jax.jit
    def bin_then_pool(d):
        bd = jnp.mean(d.reshape(d1, d2, t // 10, 10), axis=-1)
        v = bd.reshape(d1 // 2, 2, d2 // 2, 2, t // 10)
        return (v[:, 0, :, 0] + v[:, 0, :, 1] + v[:, 1, :, 0] + v[:, 1, :, 1]) * 0.25

    secs, _ = timed(bin_then_pool, data)
    print(f"bin then pool (coarse total) {secs*1e3:8.2f} ms", flush=True)


if __name__ == "__main__" and os.environ.get("POOL_ONLY"):
    pooling_variants()
