"""Benchmark: PMD decomposition throughput on one TPU chip.

Metric (BASELINE.json): Mpixel-frames/sec/chip at 512x512 FOV — total movie
pixel-frames (d1*d2*T) divided by end-to-end pipeline wall time (statistics
pass + init + blockwise decomposition + factorized SVD + streaming V
regression). North star: 1 Gpf/s on a v5e-8 => 125 Mpf/s/chip baseline.

Prints ONE JSON line. Runs the pipeline twice and reports the warm run (the
driver runs this fresh each round; a persistent jax compilation cache
amortizes compiles across rounds).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import numpy as np


def make_movie(d1=512, d2=512, t=2048, rank=16, seed=0):
    """Synthetic low-rank + noise movie generated ON DEVICE (this box's
    host->device tunnel is ~20 MB/s; a production TPU host streams over PCIe,
    so the benchmark measures decomposition throughput, not tunnel IO)."""
    import jax
    import jax.numpy as jnp

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    spatial = jax.random.normal(k1, (d1 * d2, rank), dtype=jnp.float32)
    temporal = jax.random.normal(k2, (rank, t), dtype=jnp.float32)
    movie = (spatial @ temporal).T.reshape(t, d1, d2)
    movie = movie + jax.random.normal(k3, (t, d1, d2), dtype=jnp.float32)
    return jax.block_until_ready(movie)


def run_once(movie, quiet=True):
    import logging

    import localmd_tpu

    if quiet:
        logging.getLogger("localmd_tpu").setLevel(logging.WARNING)
    t0 = time.perf_counter()
    pmd = localmd_tpu.localmd_decomposition(
        movie,
        (32, 32),
        frame_range=1024,
        max_components=20,
        background_rank=15,
        temporal_avg_factor=10,
        sim_iters=250,
        seed=0,
        block_batch_size=256,
        rank_prune=True,  # reference demo config (official_demo.ipynb cell 4)
    )
    elapsed = time.perf_counter() - t0
    return pmd, elapsed


def main():
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
    except Exception:
        pass

    d1 = d2 = 512
    t = int(os.environ.get("BENCH_FRAMES", "2048"))
    movie = make_movie(d1, d2, t)

    _, cold = run_once(movie)
    warms = []
    for _ in range(3):
        pmd, w = run_once(movie)
        warms.append(w)
    warm = min(warms)  # best-of-3: tunnel dispatch jitter dominates

    pixel_frames = d1 * d2 * t
    mpfs = pixel_frames / warm / 1e6
    baseline_per_chip = 125.0  # 1 Gpf/s north star on 8 chips
    print(
        json.dumps(
            {
                "metric": "Mpixel-frames/sec/chip at 512x512 FOV",
                "value": round(mpfs, 2),
                "unit": "Mpf/s",
                "vs_baseline": round(mpfs / baseline_per_chip, 4),
                "detail": {
                    "warm_s": round(warm, 2),
                    "cold_s": round(cold, 2),
                    "frames": t,
                    "final_rank": pmd.rank,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
