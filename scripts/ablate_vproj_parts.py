"""Decompose the coset V-projection chunk kernel: is the ~38 ms the batched
dot itself, the strided-view relayout XLA inserts before it, or the
output scatter? Measured per piece at the 512^2 bench shapes."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp

from _fenced_timing import measure_rtt, timed

D = 512
B = 32
S = 20
T = 2048
NC = 16          # blocks per dim in coset (0,0)
N = NC * NC


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    movie = jax.random.normal(k1, (T, D, D), jnp.float32)
    pan = jax.random.normal(k2, (NC, NC, B, B, S), jnp.float32)
    pan_canon = jax.random.normal(k3, (NC, NC, S, B * B), jnp.float32)
    x_canon = jax.random.normal(k1, (NC, NC, B * B, T), jnp.float32)

    print(f"fence RTT {measure_rtt()*1e3:.2f} ms", flush=True)

    # (a) canonical batched dot alone: (A,C,S,p) @ (A,C,p,t)
    @jax.jit
    def dot_canon(pc, xc):
        return jax.lax.dot_general(
            pc, xc, (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )

    secs, _ = timed(dot_canon, pan_canon, x_canon, n=8)
    print(f"canonical dot (1 coset, S=20) {secs*1e3:8.2f} ms")

    # (b) the view relayout alone: (t, A, i, C, j) -> (A, C, i*j, t)
    @jax.jit
    def relayout(mv):
        v = mv.reshape(T, NC, B, NC, B)
        return jnp.transpose(v, (1, 3, 2, 4, 0)).reshape(NC, NC, B * B, T)

    secs, _ = timed(relayout, movie, n=8)
    print(f"view relayout (1 coset)       {secs*1e3:8.2f} ms")

    # (c) the in-place coset dot as the kernel does it
    @jax.jit
    def dot_view(p5, mv):
        view = mv.reshape(T, NC, B, NC, B)
        return jax.lax.dot_general(
            p5, view, (((2, 3), (4, 2)), ((0, 1), (1, 3))),
            preferred_element_type=jnp.float32,
        )

    secs, _ = timed(dot_view, pan, movie, n=8)
    print(f"view dot (1 coset, as kernel) {secs*1e3:8.2f} ms")

    # (d) bf16 variants: inputs are bf16-rounded by the MXU anyway under
    # the TPU default precision; do explicit bf16 reads go faster?
    movie_bf = movie.astype(jnp.bfloat16)
    pan_bf = pan.astype(jnp.bfloat16)

    @jax.jit
    def dot_view_bf(p5, mv):
        view = mv.reshape(T, NC, B, NC, B)
        return jax.lax.dot_general(
            p5, view, (((2, 3), (4, 2)), ((0, 1), (1, 3))),
            preferred_element_type=jnp.float32,
        )

    secs, _ = timed(dot_view_bf, pan_bf, movie_bf, n=8)
    print(f"view dot bf16 inputs          {secs*1e3:8.2f} ms")

    # (e) wider free dim: pack 4 cosets' worth of S into one dot (what a
    # cell layout would give): S=80+15
    pan_w = jax.random.normal(k2, (NC, NC, B * B, 95), jnp.float32)

    @jax.jit
    def dot_wide(pc, xc):
        return jax.lax.dot_general(
            pc, xc, (((2,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )

    secs, _ = timed(dot_wide, pan_w, x_canon, n=8)
    print(f"canonical dot (S=95 packed)   {secs*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
