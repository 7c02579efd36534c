"""Warm marginals of the remaining non-block warm-path ops at bench shapes.

Round-5 fenced stage table (LOCALMD_FENCE_STAGES=1) shows, after the banded
Gram + coset V-projection landed: stats_and_background ~90 ms device,
factorized_svd ~60-85, final_reformat ~45 — with the (m, m) XLA eigh
suspected in both of the latter. This script measures each piece and
prototypes a CholeskyQR2 WHITENING replacement for the projector-side eigh
(the final SVD is invariant to which orthonormalizing P is used, so the
expensive QDWH eigh is only needed where singular values are part of the
output contract).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np

from _fenced_timing import measure_rtt, timed

from localmd_tpu.ops.linalg import eigh_descending, projected_svd

M = 322
R = 19235
T = 2048
D = 512


def _mm(a, b):
    return jnp.matmul(a, b, preferred_element_type=jnp.float32)


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    z = jax.random.normal(ks[0], (R, M), jnp.float32)
    quad = _mm(z.T, z) / R
    right = jax.random.normal(ks[1], (R, M), jnp.float32)
    v = jax.random.normal(ks[2], (M, T), jnp.float32)
    p_on = jnp.linalg.qr(jax.random.normal(ks[3], (R, M)))[0]

    print(f"fence RTT {measure_rtt()*1e3:.2f} ms", flush=True)

    secs, _ = timed(jax.jit(eigh_descending), quad, n=8)
    print(f"eigh_descending (322^2)      {secs*1e3:8.2f} ms")

    secs, _ = timed(jax.jit(projected_svd), p_on, v, n=8)
    print(f"projected_svd (R x 322, 322 x T) {secs*1e3:8.2f} ms")

    @jax.jit
    def whiten(quad, right):
        m = quad.shape[0]
        eye = jnp.eye(m, dtype=quad.dtype)
        jit1 = jnp.trace(quad) / m * 1e-6
        g = quad + jit1 * eye
        l1 = jnp.linalg.cholesky(g)
        p1t = jax.scipy.linalg.solve_triangular(l1, right.T, lower=True)
        g2 = jax.scipy.linalg.solve_triangular(l1, g, lower=True)
        g2 = jax.scipy.linalg.solve_triangular(l1, g2.T, lower=True)
        g2 = 0.5 * (g2 + g2.T)
        l2 = jnp.linalg.cholesky(g2)
        pt = jax.scipy.linalg.solve_triangular(l2, p1t, lower=True)
        return pt.T

    secs, p_w = timed(whiten, quad, right, n=8)
    print(f"cholQR2 whiten (322^2, R rhs) {secs*1e3:8.2f} ms")

    # orthonormality check: (Z P)^T (Z P) with P = whiten coefficients
    # relative to unit diagonal. quad here is Z^T Z / R, so use quad directly
    pw = whiten(quad, jnp.eye(M, dtype=jnp.float32))
    gram = np.asarray(_mm(pw.T, _mm(quad, pw)))
    err = np.abs(gram - np.eye(M)).max()
    print(f"  whiten orthonormality err = {err:.3e}")

    # stats pieces
    from localmd_tpu.ops.pallas_kernels import fused_movie_stats
    from localmd_tpu.ops.linalg import truncated_random_svd

    movie = jax.random.normal(ks[4], (1024, D, D), jnp.float32)

    def stats_chunk(mv):
        return fused_movie_stats(mv.reshape(mv.shape[0], -1), 2048)

    try:
        secs, _ = timed(jax.jit(stats_chunk), movie, n=4)
        print(f"fused_movie_stats (1024 x 512^2) {secs*1e3:8.2f} ms")
    except Exception as e:
        print(f"fused_movie_stats: skipped ({type(e).__name__}: {e})")

    frames = jax.random.normal(ks[5], (D * D, 1000), jnp.float32)

    from functools import partial

    bg_svd = jax.jit(partial(truncated_random_svd, rank=15))
    secs, _ = timed(bg_svd, frames, ks[6], n=4)
    print(f"background rSVD (262144 x 1000, r=15) {secs*1e3:8.2f} ms")

    big_movie = jax.random.normal(ks[7], (T, D, D), jnp.float32)

    @jax.jit
    def frame_gather(mv, idx):
        return jnp.take(mv, idx, axis=0)

    idx = jnp.asarray(np.sort(np.random.default_rng(0).choice(T, 1000, False)))
    secs, _ = timed(frame_gather, big_movie, idx, n=4)
    print(f"1000-frame gather (from 2048 x 512^2) {secs*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
