"""Fenced per-step attribution of the warm pipeline (dev tool).

Stage walls in pipeline_timings conflate async dispatch with drains (the
only reliable fence on the axon platform is a scalar D2H pull of a value
that depends on the computation). This script re-drives the pipeline's
device steps one by one with such fences, so each step's number includes
exactly its own device work.

Usage: python scripts/profile_stages.py [widefield|voltage|bench]
"""
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


def fence(x):
    return float(jnp.asarray(x).ravel()[0])


def make_movie(d1, d2, t, rank=16, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    sp = jax.random.normal(k1, (d1 * d2, rank))
    te = jax.random.normal(k2, (rank, t))
    m = (sp @ te).T.reshape(t, d1, d2) + jax.random.normal(k3, (t, d1, d2))
    return jax.block_until_ready(m)


def profile(workload):
    from localmd_tpu import engine
    from localmd_tpu.blocksparse import BlockSparseMatrix
    from localmd_tpu.factorization import compute_lowrank_factorized_svd, final_svd_reformat
    from localmd_tpu.loader import PMDLoader
    from localmd_tpu.ops.tiling import block_grid
    from localmd_tpu.pipeline import identify_window_chunks
    from localmd_tpu.engine import threshold_heuristic

    if workload == "widefield":
        d1 = d2 = 1024
        t = 1024
        b1 = b2 = 40
        frame_range = 1024
        rank_prune = True
    elif workload == "voltage":
        d1 = d2 = 256
        t = 20000
        b1 = b2 = 32
        frame_range = 4000
        rank_prune = False
    else:
        d1 = d2 = 512
        t = 2048
        b1 = b2 = 32
        frame_range = 1024
        rank_prune = True
    max_components = 20
    taf = 10

    movie = make_movie(d1, d2, t)
    steps = {}

    def run_all(label_prefix=""):
        np.random.seed(0)
        key = jax.random.PRNGKey(0)

        def mark(name, val):
            nonlocal t0
            fence(val)
            t1 = time.perf_counter()
            steps[label_prefix + name] = round(t1 - t0, 4)
            t0 = t1

        t0 = time.perf_counter()
        load_obj = PMDLoader(movie, seed=0, cache_movie=False)
        mark("1_stats+bg", load_obj.std_img)

        key, sub = jax.random.split(key)
        sth, tth = threshold_heuristic(
            (b1, b2, frame_range), num_comps=1, iters=250,
            percentile_threshold=5, key=sub, as_device=True,
            cache_token=("prof", 0),
        )
        mark("2_thresholds", sth)

        frames = identify_window_chunks(frame_range, t, frame_range)
        data, tb_crop = load_obj.temporal_crop_with_filter(frames)
        mark("3_init_filter", data)

        grid = block_grid(d1, d2, (b1, b2), order="F")
        n_blocks = grid.n_blocks
        t_init = len(frames)
        crop = (t_init // taf) * taf
        key, sub = jax.random.split(key)
        block_keys = jax.random.split(sub, n_blocks)
        bb = min(256, n_blocks)
        acc_c, cnt_c, v_c = [], [], []
        for s0 in range(0, n_blocks, bb):
            idx = np.arange(s0, min(s0 + bb, n_blocks))
            pad = bb - len(idx)
            idxp = np.concatenate([idx, np.zeros(pad, dtype=int)]) if pad else idx
            a, c, vv = engine.window0_chunk_step(
                data, jnp.asarray(grid.starts[idxp]), block_keys[idxp],
                b1, b2, max_components, taf, 2,
                sth, tth, 1, engine.identity, engine.identity, crop,
            )
            sl = slice(0, len(idx))
            acc_c.append(a[sl]); cnt_c.append(c[sl]); v_c.append(vv[sl])
        acc = jnp.concatenate(acc_c, axis=0)
        counts_d = jnp.concatenate(cnt_c, axis=0)
        v_blocks = jnp.concatenate(v_c, axis=0)
        mark("4_block_chunk(dev)", acc)
        data = None  # movie-sized HBM back before the SVD/regression steps
        del acc_c, cnt_c, v_c
        counts = np.asarray(counts_d)   # blocking D2H pull (~1 RTT)
        t1 = time.perf_counter()
        steps[label_prefix + "4b_counts_pull"] = round(t1 - t0, 4)
        t0 = t1

        wf, cf, rows_dev, starts_dev = grid.device_constants()
        panels = acc * wf[None, :, None]
        panels = panels / cf[rows_dev][:, :, None]
        u = BlockSparseMatrix(
            panels=panels, rows=rows_dev, n_pixels=d1 * d2,
            dense_basis=jnp.asarray(load_obj.spatial_basis),
            starts=starts_dev, block_shape=(b1, b2),
            coset_info=(None if os.environ.get("PROF_NO_COSET")
                        else grid.coset_info()),
        )
        v_cropped = jnp.concatenate(
            [v_blocks.reshape(n_blocks * max_components, -1), tb_crop[:, :crop]],
            axis=0,
        )
        mark("5_assemble", panels)

        total_rank = int(counts.sum())
        k_bg = u.dense_basis.shape[1]
        key, sub = jax.random.split(key)
        if rank_prune:
            min_dim = min(total_rank + k_bg, v_cropped.shape[1])
            rm = jax.random.normal(sub, (v_cropped.shape[1], int(min_dim * 0.33)))
            pv = jnp.matmul(v_cropped, rm)
        else:
            pv = v_cropped
        mark("6_rank_prune_proj", pv)

        p = compute_lowrank_factorized_svd(
            u, pv, only_left=True, expected_rank=total_rank + k_bg
        )
        mark("7_factorized_svd", p)

        v = load_obj.v_projection(u, p)
        mark("8_v_projection", v)

        r, s_vals, vt, _keep = final_svd_reformat(p, v)
        mark("9_final_reformat", vt)
        return s_vals.shape[0]

    rank0 = run_all("cold_")
    steps.clear()
    rank = run_all()
    total = sum(steps.values())
    print(f"workload={workload} final_rank={rank} fenced_total={total:.3f}s")
    for k, v in steps.items():
        print(f"  {k}: {v:.4f}")


if __name__ == "__main__":
    profile(sys.argv[1] if len(sys.argv) > 1 else "widefield")
