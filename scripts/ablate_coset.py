"""Ablate the coset-matmul path at widefield scale on the real TPU.

Isolates BlockSparseMatrix.matmul (1024^2 FOV, 40x40 blocks, m=340) to
attribute the v_projection OOM: scatter path vs coset path, with and
without a hard fence between column chunks (a fence serializes execution;
if the coset path only survives WITH fences, the failure is async pile-up
of per-chunk canvases, i.e. buffer donation not reclaiming early).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np

from localmd_tpu.blocksparse import BlockSparseMatrix
from localmd_tpu.ops.tiling import block_grid


def fence(x):
    return float(jnp.asarray(x).ravel()[0])


def main():
    d1 = d2 = 1024
    b1 = b2 = 40
    m = 340
    grid = block_grid(d1, d2, (b1, b2), order="F")
    n = grid.n_blocks
    print(f"blocks={n} cosets={len(grid.cosets())}")
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    panels = jax.random.normal(k1, (n, b1 * b2, 20), dtype=jnp.float32)
    bg = jax.random.normal(k2, (d1 * d2, 15), dtype=jnp.float32)
    _, _, rows_dev, starts_dev = grid.device_constants()
    x = jax.random.normal(k3, (n * 20 + 15, m), dtype=jnp.float32)
    # simulate the profiler's resident movie so free HBM matches
    ballast = jnp.zeros((1024, 1024, 1024), dtype=jnp.float32)
    fence(ballast)

    kw = dict(panels=panels, rows=rows_dev, n_pixels=d1 * d2, dense_basis=bg,
              starts=starts_dev, block_shape=(b1, b2))
    u_scat = BlockSparseMatrix(**kw)
    u_cos = BlockSparseMatrix(**kw, coset_info=grid.coset_info())

    # extra variants: pure batched matmul (no placement) and a single fused
    # program over all cosets at full m (no column chunking)
    from localmd_tpu.blocksparse import _coset_tile, _mm
    from localmd_tpu.ops.tiling import flatten_fov

    idxs, metas, D1, D2, order, _inv = grid.coset_info()

    @jax.jit
    def pure_matmul(panels_, x_):
        xb = x_[: n * 20].reshape(n, 20, x_.shape[-1])
        return _mm(panels_, xb)

    @jax.jit
    def fused_coset(panels_, x_):
        xb = x_[: n * 20].reshape(n, 20, x_.shape[-1])
        out = jnp.zeros((D1, D2, x_.shape[-1]), jnp.float32)
        for idx, meta in zip(idxs, metas):
            tile = _coset_tile(
                _mm(jnp.take(panels_, idx, axis=0), jnp.take(xb, idx, axis=0)),
                meta, b1, b2,
            )
            a1_, a2_ = meta[4], meta[5]
            h, w = tile.shape[0], tile.shape[1]
            out = jax.lax.dynamic_update_slice(
                out,
                jax.lax.dynamic_slice(out, (a1_, a2_, 0), tile.shape) + tile,
                (a1_, a2_, 0),
            )
        return flatten_fov(out, order)

    from functools import partial as _partial

    @_partial(jax.jit, static_argnums=(4, 5, 6), donate_argnums=(0,))
    def _coset_pad_accum(canvas, panels_, xb_, idx, meta, b1_, b2_):
        tile = _coset_tile(
            _mm(jnp.take(panels_, idx, axis=0), jnp.take(xb_, idx, axis=0)),
            meta, b1_, b2_,
        )
        a1_, a2_ = meta[4], meta[5]
        h, w = tile.shape[0], tile.shape[1]
        return canvas + jnp.pad(
            tile, ((a1_, D1 - a1_ - h), (a2_, D2 - a2_ - w), (0, 0))
        )

    def coset_pad():
        xb = x[: n * 20].reshape(n, 20, x.shape[-1])
        mc = 64
        m_ = x.shape[-1]
        outs = []
        for s in range(0, m_, mc):
            canvas = jnp.zeros((D1, D2, min(mc, m_ - s)), jnp.float32)
            xc = xb[:, :, s : s + mc]
            for idx, meta in zip(idxs, metas):
                canvas = _coset_pad_accum(canvas, panels, xc, idx, meta, b1, b2)
            outs.append(flatten_fov(canvas, order))
        return jnp.concatenate(outs, axis=1)

    y = jax.random.normal(jax.random.PRNGKey(7), (d1 * d2, m), dtype=jnp.float32)

    # coset-extract rmatmul (NOT in production — measured SLOWER than the
    # gather: 144-164 ms vs 99-120 ms at this scale; reads don't pay the
    # serialization penalty scatter-add writes do). Kept here so the
    # negative result stays reproducible.
    from localmd_tpu.ops.tiling import unflatten_fov

    @_partial(jax.jit, static_argnums=(3, 4, 5))
    def _coset_rmatmul(panels_, y3d, idx, meta, b1_, b2_):
        nc1, nc2, st1, st2, a1_, a2_ = meta
        mm_ = y3d.shape[-1]
        h = (nc1 - 1) * st1 + b1_
        w = (nc2 - 1) * st2 + b2_
        c = jax.lax.slice(y3d, (a1_, a2_, 0), (a1_ + h, a2_ + w, mm_))
        if st1 > b1_ or st2 > b2_:
            c = jnp.pad(c, ((0, nc1 * st1 - h), (0, nc2 * st2 - w), (0, 0)))
        c = c.reshape(nc1, st1, nc2, st2, mm_)
        if st1 > b1_ or st2 > b2_:
            c = c[:, :b1_, :, :b2_]
        ext = jnp.transpose(c, (0, 2, 3, 1, 4)).reshape(nc1 * nc2, b1_ * b2_, mm_)
        sub = jnp.take(panels_, idx, axis=0)
        return _mm(jnp.swapaxes(sub, -1, -2), ext)

    def r_coset():
        mc = 64
        m_ = y.shape[-1]
        outs = []
        for s in range(0, m_, mc):
            y3d = unflatten_fov(y[:, s : s + mc], D1, D2, order)
            parts = [
                _coset_rmatmul(panels, y3d, idx, meta, b1, b2)
                for idx, meta in zip(idxs, metas)
            ]
            outs.append(jnp.take(jnp.concatenate(parts, axis=0), _inv, axis=0))
        return jnp.concatenate(outs, axis=2).reshape(n * 20, -1)

    variants = {
        "scatter": lambda: u_scat.matmul(x),
        "coset": lambda: u_cos.matmul(x),
        "coset_pad": coset_pad,
        "pure_mm": lambda: pure_matmul(panels, x),
        "fused": lambda: fused_coset(panels, x),
        "r_gather": lambda: u_scat.rmatmul(y),
        "r_coset": r_coset,
        "gram_gather": lambda: u_scat.gram_quadratic(x),
        "gram_coset": lambda: u_cos.gram_quadratic(x),
    }
    which = sys.argv[1:] or ["scatter", "coset"]
    if which == ["all"]:
        which = list(variants)
    for name in which:
        fn = variants[name]
        try:
            for trial in range(3):
                t0 = time.perf_counter()
                out = fn()
                fence(out.ravel()[0])
                dt = time.perf_counter() - t0
                print(f"{name} trial {trial}: {dt*1000:.1f} ms")
                del out
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
