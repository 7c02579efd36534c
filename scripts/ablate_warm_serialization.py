"""Do concurrent program compile+loads serialize through the tunnel?

The stage warmer (localmd_tpu.aot.StageWarmer) fires several background
threads at the counts sync; if their program loads serialize through the
remote-compile/transfer link, the LARGEST program should start first
(VERDICT r4 #4). This measures it directly: two distinct never-cached
programs (unique shapes bust the persistent compile cache), loaded
sequentially vs concurrently in a fresh process.

Run twice (different --salt) for the sequential and concurrent baselines
to keep every program fresh.
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp

try:
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
except Exception:
    pass


def make_program(n):
    """A compile-heavy unique-shape program (few-step scan of matmuls)."""

    @jax.jit
    def prog(x):
        def body(c, _):
            c = jnp.tanh(c @ c.T @ c * 1e-3)
            return c, jnp.sum(c)
        c, s = jax.lax.scan(body, x, None, length=4)
        return jnp.sum(c) + jnp.sum(s)

    x = jnp.ones((n, n + 1), jnp.float32)

    def run():
        t0 = time.perf_counter()
        float(prog(x))
        return time.perf_counter() - t0

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--salt", type=int, default=0)
    ap.add_argument("--mode", choices=["seq", "conc"], required=True)
    args = ap.parse_args()

    # unique shapes per (salt, slot): never in the compile cache
    n1 = 731 + 10 * args.salt
    n2 = 767 + 10 * args.salt
    r1, r2 = make_program(n1), make_program(n2)

    if args.mode == "seq":
        t0 = time.perf_counter()
        d1 = r1()
        d2 = r2()
        total = time.perf_counter() - t0
        print(f"seq: a={d1:.1f}s b={d2:.1f}s total={total:.1f}s", flush=True)
    else:
        out = {}

        def w(name, fn):
            out[name] = fn()

        t0 = time.perf_counter()
        ta = threading.Thread(target=w, args=("a", r1))
        tb = threading.Thread(target=w, args=("b", r2))
        ta.start()
        tb.start()
        ta.join()
        tb.join()
        total = time.perf_counter() - t0
        print(
            f"conc: a={out['a']:.1f}s b={out['b']:.1f}s total={total:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
