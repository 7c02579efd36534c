"""Per-stage roofline of the warm bench pipeline on the live TPU.

For every stage: bytes moved through HBM, matmul FLOPs, the roofline bound
max(bytes/BW, flops/peak), and the FENCED measured time (every fence is a
scalar D2H drain — ``jax.block_until_ready`` is a no-op on axon, and each
fence adds one ~28 ms RTT which is reported separately as ``rtt_ms``).

Prints a markdown table for docs/ARCHITECTURE.md plus a JSON line.

Usage: python scripts/roofline.py [--big]   (--big: 1024^2 x 4096 uint16)

Models are matmul-dominant counts (~±20%): elementwise traffic inside fused
kernels is folded into the bytes column; small QR/eigh tails into flops.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import logging

import jax
import jax.numpy as jnp
import numpy as np

logging.getLogger("localmd_tpu").setLevel(logging.WARNING)

# v5e public specs; other chips scale the table but not its shape
HBM_GBPS = 819.0
PEAK_BF16_TF = 197.0
PEAK_F32_TF = PEAK_BF16_TF / 4  # 6-pass f32 is ~1/4..1/6; jacobi/eigh run f32


def fence(x):
    return float(jnp.asarray(x).ravel()[0])


def make_movie(d1, d2, t, dtype="float32", rank=16, seed=0):
    # bench.make_movie generates integer movies CHUNKED (a one-shot f32
    # intermediate is 16 GiB at 1024^2 x 4096 — over HBM by itself)
    from bench import make_movie as _mk

    return _mk(d1, d2, t, rank=rank, seed=seed, dtype=dtype)


def run_fenced(movie, d1, d2, t, b, frame_range, max_components=20,
               background_rank=15, taf=10, bb_cap=256):
    """Drive the pipeline's device steps one by one with D2H fences.
    Returns {stage: seconds} plus the rank bookkeeping the models need."""
    from localmd_tpu import engine
    from localmd_tpu.blocksparse import BlockSparseMatrix
    from localmd_tpu.factorization import (
        compute_lowrank_factorized_svd,
        final_svd_reformat,
    )
    from localmd_tpu.loader import PMDLoader
    from localmd_tpu.ops.tiling import block_grid

    steps, meta = {}, {}
    np.random.seed(0)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()

    def mark(name, val):
        nonlocal t0
        fence(val)
        t1 = time.perf_counter()
        steps[name] = t1 - t0
        t0 = t1

    load_obj = PMDLoader(movie, seed=0, cache_movie=False,
                         background_rank=background_rank)
    mark("stats+background", load_obj.std_img)

    key, sub = jax.random.split(key)
    sth, tth = engine.threshold_heuristic(
        (b, b, frame_range), num_comps=1, iters=250, percentile_threshold=5,
        key=sub, as_device=True, cache_token=("roofline", d1, t),
    )
    mark("thresholds", sth)

    frames = list(range(frame_range))
    data, tb_crop = load_obj.temporal_crop_with_filter(frames)
    mark("init_filter", data)

    grid = block_grid(d1, d2, (b, b), order="F")
    n_blocks = grid.n_blocks
    crop = (frame_range // taf) * taf
    key, sub = jax.random.split(key)
    block_keys = jax.random.split(sub, n_blocks)
    bb = min(bb_cap, n_blocks)
    acc_c, cnt_c, v_c = [], [], []
    for s0 in range(0, n_blocks, bb):
        idx = np.arange(s0, min(s0 + bb, n_blocks))
        pad = bb - len(idx)
        idxp = np.concatenate([idx, np.zeros(pad, dtype=int)]) if pad else idx
        a, c, vv = engine.window0_chunk_step(
            data, jnp.asarray(grid.starts[idxp]), block_keys[idxp],
            b, b, max_components, taf, 2,
            sth, tth, 1, engine.identity, engine.identity, crop,
        )
        sl = slice(0, len(idx))
        acc_c.append(a[sl]); cnt_c.append(c[sl]); v_c.append(vv[sl])
    acc = jnp.concatenate(acc_c, axis=0)
    counts_d = jnp.concatenate(cnt_c, axis=0)
    v_blocks = jnp.concatenate(v_c, axis=0)
    mark("block_stage", acc)
    data = None
    del acc_c, cnt_c, v_c
    counts = np.asarray(counts_d)
    meta["total_rank"] = int(counts.sum())

    wf, cf, rows_dev, starts_dev = grid.device_constants()
    panels = acc * wf[None, :, None]
    panels = panels / cf[rows_dev][:, :, None]
    u = BlockSparseMatrix(
        panels=panels, rows=rows_dev, n_pixels=d1 * d2,
        dense_basis=jnp.asarray(load_obj.spatial_basis),
        starts=starts_dev, block_shape=(b, b),
        coset_info=grid.coset_info(),
    )
    v_cropped = jnp.concatenate(
        [v_blocks.reshape(n_blocks * max_components, -1), tb_crop[:, :crop]],
        axis=0,
    )
    m_rank = meta["total_rank"] + background_rank
    key, sub = jax.random.split(key)
    min_dim = min(v_cropped.shape[0], v_cropped.shape[1])
    rand = jax.random.normal(sub, (v_cropped.shape[1], int(min_dim * 0.33)))
    target_v = jnp.matmul(v_cropped, rand)
    p = compute_lowrank_factorized_svd(
        u, target_v, only_left=True, expected_rank=m_rank,
    )
    mark("factorized_svd", p)
    meta["reduced"] = int(p.shape[1])

    v = load_obj.v_projection(u, p)
    mark("v_regression", v)

    r, s_vals, vt, _keep = final_svd_reformat(p, v, rel_tol=1e-3)
    mark("final_reformat", s_vals)
    meta["final"] = int(s_vals.shape[0])
    return steps, meta


def stage_models(d1, d2, t, b, frame_range, itemsize, max_components,
                 background_rank, taf, meta):
    """(bytes, flops) per stage — matmul-dominant counts, ±20%."""
    d = d1 * d2
    p = b * b
    S = max_components
    from localmd_tpu.ops.tiling import BlockGrid

    nb = BlockGrid(d1, d2, (b, b)).n_blocks
    t_bin = frame_range // taf
    crop = t_bin * taf
    n_chunks = (t + 1023) // 1024
    r_all = meta["total_rank"] + background_rank
    r_red = meta["reduced"]
    nnz = nb * p * S + d * background_rank

    out = {}
    # stats: one pass over the movie + rfft/Welch matmuls per chunk
    out["stats+background"] = (
        t * d * itemsize + min(1000, t) * d * 4 * 2,
        n_chunks * d * 2 * (2 * 7 * 256 * 64)
        + 2 * d * min(1000, t) * (background_rank + 10) * 2,
    )
    # thresholds: 250 tiny rSVDs, negligible bytes
    out["thresholds"] = (250 * p * t_bin * 4, 250 * 2 * p * t_bin * (S + 10) * 2)
    # init filter: read native frames, write f32 standardized+filtered
    out["init_filter"] = (
        frame_range * d * (itemsize + 4),
        2 * d * background_rank * frame_range * 2,
    )
    # block stage: gather 4x-overlapped patches once per (f32) + write panels
    p_c = (-(-b // 2)) ** 2
    per_block = (
        2 * p_c * t_bin * (S + 10) * 2
        + 2 * p_c * (S + 10) * crop
        + 2 * p * crop * S
        + 2 * p * S * crop * 2
    )
    out["block_stage"] = (
        (4 * d * crop + nb * p * S + nb * S * crop) * 4, nb * per_block
    )
    # factorized SVD: rank-prune projection + Gram quadratic
    cols = max(1, int(min(r_all, crop) * 0.33))
    out["factorized_svd"] = (
        (nb * p * S + d * cols * 2) * 4,
        2 * r_all * crop * cols + 2 * nnz * cols + 2 * d * cols * cols
        + 10 * cols ** 3 + 2 * r_all * cols * cols,
    )
    # V regression: stream the movie once + A = U@P, chunked A^T X
    out["v_regression"] = (
        t * d * itemsize + (nb * p * S + d * r_red) * 4,
        2 * nnz * r_red + 2 * d * r_red * t,
    )
    out["final_reformat"] = (
        r_red * t * 4 * 2, 2 * r_red * r_red * t + 10 * r_red ** 3
    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true",
                    help="1024^2 x 4096 uint16 leg (HBM-tight; may OOM on a "
                         "shared chip — rerun)")
    args = ap.parse_args()

    if args.big:
        d1 = d2 = 1024
        t, b, frame_range, bb_cap = 4096, 40, 512, 64
        dtype, itemsize = "uint16", 2
    else:
        d1 = d2 = 512
        t, b, frame_range, bb_cap = 2048, 32, 1024, 256
        dtype, itemsize = "float32", 4

    movie = make_movie(d1, d2, t, dtype=dtype)
    # warm pass compiles/loads every program; the timed pass is pure compute
    run_fenced(movie, d1, d2, t, b, frame_range, bb_cap=bb_cap)
    steps, meta = run_fenced(movie, d1, d2, t, b, frame_range, bb_cap=bb_cap)
    models = stage_models(d1, d2, t, b, frame_range, itemsize, 20, 15, 10, meta)

    rows = []
    total_meas = sum(steps.values())
    print(f"\n### Roofline — {d1}x{d2} x {t} ({np.dtype(np.uint16).name if itemsize==2 else 'float32'}, device-resident), warm\n")
    print("| stage | GB moved | GFLOP | BW-bound ms | MXU-bound ms | roofline ms | measured ms | roofline % |")
    print("|---|---|---|---|---|---|---|---|")
    for name, secs in steps.items():
        gb, gf = models[name][0] / 1e9, models[name][1] / 1e9
        bw_ms = models[name][0] / (HBM_GBPS * 1e9) * 1e3
        mxu_ms = models[name][1] / (PEAK_BF16_TF * 1e12) * 1e3
        bound = max(bw_ms, mxu_ms)
        meas_ms = secs * 1e3
        pct = 100 * bound / meas_ms if meas_ms else 0
        rows.append(dict(stage=name, gb=round(gb, 3), gflop=round(gf, 1),
                         bw_ms=round(bw_ms, 2), mxu_ms=round(mxu_ms, 2),
                         bound_ms=round(bound, 2), measured_ms=round(meas_ms, 1),
                         roofline_pct=round(pct, 1)))
        print(f"| {name} | {gb:.3f} | {gf:.1f} | {bw_ms:.2f} | {mxu_ms:.2f} "
              f"| {bound:.2f} | {meas_ms:.1f} | {pct:.0f}% |")
    mpfs = d1 * d2 * t / total_meas / 1e6
    print(f"\ntotal fenced: {total_meas*1e3:.0f} ms  (= {mpfs:.0f} Mpf/s; "
          f"each of the {len(steps)} fences adds one ~28 ms D2H RTT)")
    print(json.dumps({"rows": rows, "total_s": round(total_meas, 3),
                      "mpf_s": round(mpfs, 1), "meta": meta,
                      "config": [d1, d2, t, b]}))


if __name__ == "__main__":
    main()
