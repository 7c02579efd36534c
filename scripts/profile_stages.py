"""Micro-profile the bench-config pipeline stage by stage on the live device.

Runs the pipeline twice (compile + warm) and prints the warm per-stage wall
times from PMDArray.pipeline_timings, then re-times the factorized-SVD and
final-reformat sub-steps individually with explicit block_until_ready fences
to attribute dispatch latency vs device compute.

Usage: python scripts/profile_stages.py [frames]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    sys.path.insert(0, ".")
    from bench import make_movie, run_once

    movie = make_movie(512, 512, t)
    _, cold = run_once(movie, quiet=False)
    pmd, warm = run_once(movie, quiet=False)
    print(f"cold={cold:.2f}s warm={warm:.2f}s timings={pmd.pipeline_timings}")

    # -- sub-step attribution for the factorized SVD ------------------------
    from localmd_tpu.factorization import compute_lowrank_factorized_svd
    from localmd_tpu.ops.linalg import eigh_descending

    u = pmd._blocksparse
    rank_pre = pmd.pipeline_ranks["pre_reduction"]
    t_init = 1024
    cols = max(1, int(min(rank_pre, t_init) * 0.33))
    key = jax.random.PRNGKey(0)
    # stand-in for projected_v with the same shape
    right = jax.random.normal(key, (u.shape[1], cols), dtype=jnp.float32)

    def timed(label, fn, *args, **kw):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*args, **kw)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        print(f"  {label:32s} {dt*1e3:8.2f} ms")
        return out

    print("factorized_svd sub-steps (warm, fenced):")
    z = timed("U @ right (matmul)", u.matmul, right)
    timed("U.T @ Z (rmatmul)", u.rmatmul, z)
    quad = timed("gram_quadratic", u.gram_quadratic, right)
    timed("eigh_descending", eigh_descending, quad)
    timed(
        "compute_lowrank_factorized_svd",
        compute_lowrank_factorized_svd,
        u,
        right,
        only_left=True,
        expected_rank=rank_pre,
    )

    # -- V regression + final reformat --------------------------------------
    from localmd_tpu.factorization import final_svd_reformat

    p = compute_lowrank_factorized_svd(u, right, only_left=True, expected_rank=rank_pre)
    v = jax.random.normal(key, (p.shape[1], t), dtype=jnp.float32)
    timed("final_svd_reformat", final_svd_reformat, p, v)


if __name__ == "__main__":
    main()
