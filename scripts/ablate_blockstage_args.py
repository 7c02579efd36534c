"""Where does the per-chunk block-stage overhead come from?

The round-4 roofline attributes ~21 ms to each block-stage chunk dispatch
(41 chunks at 1024^2 -> 870 ms measured vs 11 ms roofline). Candidate
culprits: (a) the per-chunk host->device upload of starts/keys
(jnp.asarray of host numpy inside the loop), (b) the per-call dispatch RPC
itself, (c) genuine device time. Variants, all chained dispatches with ONE
scalar-D2H fence at the end (block_until_ready is a no-op on axon):

  upload_probe  N bare jnp.asarray(small host array) calls, fenced once —
                is a small H2D synchronous on this link?
  A_host_args   the pipeline's current loop: per-chunk jnp.asarray of host
                starts/keys, then dispatch
  B_dev_args    all chunk args device_put'd up front (timed separately),
                loop dispatches with device-resident args only
  C_one_map     ONE jitted lax.map program over all stacked chunks

Usage: python scripts/ablate_blockstage_args.py [d (default 1024)] [t 1024]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax

if os.environ.get("ABLATE_CPU"):  # correctness smoke-run off-hardware
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from localmd_tpu import engine
from localmd_tpu.ops.tiling import block_grid


def fence(*arrays) -> float:
    return float(sum(jnp.sum(a.ravel()[:1]) for a in arrays))


def main() -> None:
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    b1 = b2 = 40
    max_rank = 20
    bb = int(os.environ.get("ABLATE_BB", "64"))

    data = jax.random.normal(jax.random.PRNGKey(1), (d, d, t), jnp.float32)
    grid = block_grid(d, d, (b1, b2))
    n_blocks = grid.n_blocks
    n_chunks = (n_blocks + bb - 1) // bb
    print(f"{d}x{d}x{t}, blocks {b1}x{b2}: {n_blocks} blocks, "
          f"{n_chunks} chunks of {bb}", flush=True)

    starts_host = grid.starts
    keys_host = np.asarray(jax.random.split(jax.random.PRNGKey(0), n_blocks))
    thr_s, thr_t = jnp.float32(1e9), jnp.float32(1e9)  # keep everything

    def chunk_ids(i):
        idx = np.arange(i * bb, min((i + 1) * bb, n_blocks))
        pad = bb - len(idx)
        return np.concatenate([idx, np.zeros(pad, dtype=int)]) if pad else idx

    t_used = (t // 10) * 10  # temporal-average crop (pipeline crop_avg_constant)

    def step(starts_b, keys_b):
        return engine.window0_chunk_step(
            data, starts_b, keys_b, b1, b2, max_rank, 10, 2,
            thr_s, thr_t, 1, engine.identity, engine.identity, t_used,
        )

    # -- upload probe ---------------------------------------------------------
    small = np.arange(bb * 2, dtype=np.int64).reshape(bb, 2)
    devs = [jnp.asarray(small + i) for i in range(3)]  # warm the path
    t0 = time.perf_counter()
    n_up = 50
    ups = [jnp.asarray(small + i) for i in range(n_up)]
    fence(*ups)
    dt = time.perf_counter() - t0
    print(f"upload_probe: {n_up} small H2D in {dt*1e3:.1f} ms "
          f"({dt/n_up*1e3:.2f} ms each)", flush=True)
    del devs, ups

    # warm the chunk program once
    out = step(jnp.asarray(starts_host[chunk_ids(0)]),
               jnp.asarray(keys_host[chunk_ids(0)]))
    fence(*out)

    def run_A():
        outs = []
        for i in range(n_chunks):
            ids = chunk_ids(i)
            outs.append(step(jnp.asarray(starts_host[ids]),
                             jnp.asarray(keys_host[ids])))
        return outs

    def run_B(staged):
        return [step(s, k) for s, k in staged]

    for name, fn in [("A_host_args", run_A)]:
        for rep in range(2):
            t0 = time.perf_counter()
            outs = fn()
            fence(*outs[-1])
            print(f"{name} rep{rep}: {(time.perf_counter()-t0)*1e3:.1f} ms",
                  flush=True)
        del outs

    t0 = time.perf_counter()
    staged = [
        (jnp.asarray(starts_host[chunk_ids(i)]),
         jnp.asarray(keys_host[chunk_ids(i)]))
        for i in range(n_chunks)
    ]
    fence(*[s for s, _ in staged])
    print(f"B staging: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
    for rep in range(2):
        t0 = time.perf_counter()
        outs = run_B(staged)
        fence(*outs[-1])
        print(f"B_dev_args rep{rep}: {(time.perf_counter()-t0)*1e3:.1f} ms",
              flush=True)
    del outs, staged

    # -- C: one lax.map program over all chunks -------------------------------
    pad_total = n_chunks * bb
    ids_all = np.concatenate([chunk_ids(i) for i in range(n_chunks)])
    starts_all = jnp.asarray(starts_host[ids_all].reshape(n_chunks, bb, 2))
    keys_all = jnp.asarray(keys_host[ids_all].reshape(n_chunks, bb, 2))

    @jax.jit
    def all_chunks(movie, starts_all, keys_all):
        def body(args):
            s, k = args
            return engine.window0_chunk_step(
                movie, s, k, b1, b2, max_rank, 10, 2,
                thr_s, thr_t, 1, engine.identity, engine.identity, t_used,
            )

        return jax.lax.map(body, (starts_all, keys_all))

    for rep in range(2):
        t0 = time.perf_counter()
        acc, counts, v = all_chunks(data, starts_all, keys_all)
        fence(acc, counts, v)
        print(f"C_one_map rep{rep}: {(time.perf_counter()-t0)*1e3:.1f} ms "
              f"(pad_total {pad_total})", flush=True)


if __name__ == "__main__":
    main()
