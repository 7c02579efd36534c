"""Can the two remaining big warm ops skip the (d, m) canvas entirely?

The warm bench profile (round 5) shows `BlockSparseMatrix.matmul` — the
coset canvas overlap-add at m~322 — is the dominant device cost of BOTH the
factorized-SVD Gram chain (gram_quadratic ~51 ms) and the V regression
(a = U @ P, ~53 ms) at the 512^2 bench shapes. Two structural alternatives:

1. BANDED GRAM: same-coset blocks are disjoint, so U^T U is block-banded —
   a block overlaps only its <=8 grid neighbors, and for the regular
   even-block grid (stride = b/2) every overlap region is a whole number of
   (b/2 x b/2) cells. quad = right^T (U^T U) right then needs only batched
   (S, S)-class products over blocks and neighbor offsets — no (d, m)
   canvas, no scatter, no gather.

2. COSET-VIEW RMATMUL for the V regression: V = P^T (U~^T X) instead of
   (U P)~^T X. U~^T X contracts block pixels against coset VIEWS of the
   resident movie (a reshape, not a gather), producing (n_blocks, S, t)
   directly — the 53 ms U @ P canvas never exists. The bg basis gets a
   plain dense matmul pass.

Both are validated against the existing paths here before adoption.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np

from _fenced_timing import fence, measure_rtt, timed

from localmd_tpu.blocksparse import BlockSparseMatrix
from localmd_tpu.ops.tiling import block_grid, unflatten_fov


def _mm(a, b):
    return jnp.matmul(a, b, preferred_element_type=jnp.float32)


D1 = D2 = 512
B = 32
S = 20
K_BG = 15
M = 322
T = 2048
H = B // 2          # cell size (regular even-block grid)


def main():
    grid = block_grid(D1, D2, (B, B), "F")
    n1 = len({int(s) for s in grid.starts[:, 0]})
    n2 = len({int(s) for s in grid.starts[:, 1]})
    g = grid.n_blocks
    assert g == n1 * n2 == 961, (g, n1, n2)
    d = D1 * D2

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    panels = jax.random.normal(ks[0], (g, B * B, S), jnp.float32)
    bg = jax.random.normal(ks[1], (d, K_BG), jnp.float32) * 0.1
    right = jax.random.normal(ks[2], (g * S + K_BG, M), jnp.float32)
    rows = jnp.asarray(grid.rows)

    u = BlockSparseMatrix(
        panels, rows, d, bg, starts=jnp.asarray(grid.starts),
        block_shape=(B, B), coset_info=grid.coset_info(),
    )

    print(f"fence RTT {measure_rtt()*1e3:.2f} ms", flush=True)

    # ---------------- baselines -------------------------------------------
    secs, z_ref = timed(lambda r: u.matmul(r), right, n=8)
    print(f"u.matmul (canvas)        {secs*1e3:8.2f} ms")
    secs, quad_ref = timed(lambda r: u.gram_quadratic(r), right, n=8)
    print(f"gram_quadratic (canvas)  {secs*1e3:8.2f} ms")

    # ---------------- 1. banded gram --------------------------------------
    # panel p-axis is F-order within the block: p = i + j*b1, so
    # reshape (b2, b1) -> axes (j, i); cells split each into (2, H).
    @jax.jit
    def banded_quad(panels, right):
        xb = right[: g * S].reshape(g, S, M)
        xg = right[g * S :]                                   # (K_BG, M)
        cells = panels.reshape(n1, n2, 2, H, 2, H, S)
        # axes: (i1, i2, jc, jr, ic, ir, S); jc/ic cell indices along d2/d1
        xgrid = xb.reshape(n1, n2, S, M)

        # diagonal: full-panel gram per block
        gd = jnp.einsum("gps,gpt->gst", panels, panels,
                        preferred_element_type=jnp.float32)
        y = jnp.einsum("gst,gtm->gsm", gd, xb,
                       preferred_element_type=jnp.float32)
        quad = jnp.einsum("gsm,gsn->mn", xb, y,
                          preferred_element_type=jnp.float32)

        # neighbor offsets (di, dj) over the (n1, n2) start grid; each is
        # counted once, transpose added at the end. Overlap cells:
        #   dj=+1 : my jc=1 vs their jc=0 (all ic)
        #   di=+1 : my ic=1 vs their ic=0 (all jc)
        #   di=+1, dj=+1 : my (jc=1, ic=1) vs their (0, 0)
        #   di=+1, dj=-1 : my (jc=0, ic=1) vs their (jc=1, ic=0)
        def pair_term(lhs_cells, rhs_cells, lhs_x, rhs_x):
            # lhs_cells/rhs_cells: (..., H, H?, S) matching cell axes;
            # flatten everything but (grid..., S)
            lw = lhs_cells.reshape(lhs_cells.shape[0], lhs_cells.shape[1], -1, S)
            rw = rhs_cells.reshape(rhs_cells.shape[0], rhs_cells.shape[1], -1, S)
            gq = jnp.einsum("IJps,IJpt->IJst", lw, rw,
                            preferred_element_type=jnp.float32)
            yy = jnp.einsum("IJst,IJtm->IJsm", gq, rhs_x,
                            preferred_element_type=jnp.float32)
            return jnp.einsum("IJsm,IJsn->mn", lhs_x, yy,
                              preferred_element_type=jnp.float32)

        c = cells
        t01 = pair_term(c[:, :-1, 1], c[:, 1:, 0],
                        xgrid[:, :-1], xgrid[:, 1:])
        t10 = pair_term(c[:-1, :, :, :, 1], c[1:, :, :, :, 0],
                        xgrid[:-1], xgrid[1:])
        t11 = pair_term(c[:-1, :-1, 1, :, 1], c[1:, 1:, 0, :, 0],
                        xgrid[:-1, :-1], xgrid[1:, 1:])
        t1m = pair_term(c[:-1, 1:, 0, :, 1], c[1:, :-1, 1, :, 0],
                        xgrid[:-1, 1:], xgrid[1:, :-1])
        cross = t01 + t10 + t11 + t1m
        quad = quad + cross + cross.T

        # background coupling
        ub = _rmatmul_coset(panels, unflatten_fov(bg, D1, D2, "F"))  # (g,S,K)
        ub = ub.reshape(g * S, K_BG)
        cb = _mm(right[: g * S].T, _mm(ub, xg))
        quad = quad + cb + cb.T + _mm(xg.T, _mm(_mm(bg.T, bg), xg))
        return 0.5 * (quad + quad.T)

    def _rmatmul_coset(panels, img):
        """U_blocks^T @ img for img (d1, d2, m) via coset views.

        Returns (g, S, m). Regular even-block grid only."""
        m = img.shape[-1]
        out = jnp.zeros((n1, n2, S, m), jnp.float32)
        # cosets: start parity r1, r2 in {0, 1} at stride 2H; coset (r1, r2)
        # holds grid entries (r1::2, r2::2)
        for r1 in (0, 1):
            for r2 in (0, 1):
                nc1 = len(range(r1, n1, 2))
                nc2 = len(range(r2, n2, 2))
                a1, a2 = r1 * H, r2 * H
                view = img[a1 : a1 + nc1 * B + 0, a2 : a2 + nc2 * B, :]
                # within-coset stride is B (=2H) exactly for the regular grid
                view = view[: nc1 * B, : nc2 * B].reshape(nc1, B, nc2, B, m)
                pan = panels.reshape(n1, n2, B * B, S)[r1::2, r2::2]
                pan = pan.reshape(nc1, nc2, B, B, S)  # (j, i) split
                # contract block pixels: pan axes (A, C, j, i, S),
                # view axes (A, i, C, j, m)
                res = jax.lax.dot_general(
                    pan, view,
                    (( (2, 3), (3, 1) ), ((0, 1), (0, 2))),
                    preferred_element_type=jnp.float32,
                )  # -> (A, C, S, m)
                out = out.at[r1::2, r2::2].set(res)
        return out.reshape(g, S, m)

    secs, quad_band = timed(banded_quad, panels, right, n=8)
    print(f"gram banded              {secs*1e3:8.2f} ms")
    qr = np.asarray(quad_ref)
    qb = np.asarray(quad_band)
    scale = np.abs(qr).max()
    print(f"  banded max |diff|/max = {np.abs(qr - qb).max() / scale:.3e}")

    # ---------------- 2. coset rmatmul for the V regression ----------------
    movie = jax.random.normal(ks[3], (T, D1, D2), jnp.float32)
    mean_img = jax.random.normal(ks[4], (D1, D2), jnp.float32) * 0.01
    std_img = jnp.abs(jax.random.normal(ks[5], (D1, D2), jnp.float32)) + 1.0
    p_mix = right  # (R, M) stand-in for the mixing matrix

    from localmd_tpu.loader import _fold_projector
    from localmd_tpu.ops.tiling import flatten_image
    from localmd_tpu.ops.pallas_kernels import fused_v_projection

    std_flat = flatten_image(std_img, "F")
    mean_flat = flatten_image(mean_img, "F")

    def v_ref(p):
        a = u.matmul(p)
        a_tilde, c = _fold_projector(a, std_flat, mean_flat)
        a_c = unflatten_fov(a_tilde, D1, D2, "F").reshape(D1 * D2, -1)
        raw2d = movie.reshape(T, D1 * D2)
        return fused_v_projection(raw2d, a_c, c)

    secs, vref = timed(v_ref, p_mix, n=4)
    print(f"v_projection (canvas+pallas) {secs*1e3:8.2f} ms")

    @jax.jit
    def v_coset(p, movie, panels, bg, rows, std_flat, mean_flat):
        # fold 1/std into the panels (block rows of U~)
        inv_std = (1.0 / std_flat)[rows]                     # (g, p)
        pan_t = panels * inv_std[:, :, None]
        # movie axes (t, d1, d2) -> rmatmul wants (d1, d2, t) views; use the
        # same coset contraction with the time axis leading instead
        m = T
        out = jnp.zeros((n1, n2, S, m), jnp.float32)
        for r1 in (0, 1):
            for r2 in (0, 1):
                nc1 = len(range(r1, n1, 2))
                nc2 = len(range(r2, n2, 2))
                a1, a2 = r1 * H, r2 * H
                view = movie[:, a1 : a1 + nc1 * B, a2 : a2 + nc2 * B]
                view = view.reshape(m, nc1, B, nc2, B)
                pan = pan_t.reshape(n1, n2, B * B, S)[r1::2, r2::2]
                pan = pan.reshape(nc1, nc2, B, B, S)  # (j, i)
                res = jax.lax.dot_general(
                    pan, view,
                    (((2, 3), (4, 2)), ((0, 1), (1, 3))),
                    preferred_element_type=jnp.float32,
                )  # (A, C, S, t)
                out = out.at[r1::2, r2::2].set(res)
        w_blocks = out.reshape(g * S, m)
        bg_c = unflatten_fov(bg / std_flat[:, None], D1, D2, "F").reshape(-1, K_BG)
        w_bg = _mm(bg_c.T, movie.reshape(m, -1).T)
        w = jnp.concatenate([w_blocks, w_bg], axis=0)        # (R, t)
        # mean correction: U~^T mean, rank-1 over frames
        q_blocks = jnp.einsum("gps,gp->gs", pan_t, mean_flat[rows],
                              preferred_element_type=jnp.float32).reshape(-1)
        q_bg = _mm(bg.T, (mean_flat / std_flat)[:, None])[:, 0]
        q = jnp.concatenate([q_blocks, q_bg])
        return _mm(p.T, w - q[:, None])

    secs, vnew = timed(
        v_coset, p_mix, movie, panels, bg, rows, std_flat, mean_flat, n=4
    )
    print(f"v_projection (coset rmatmul) {secs*1e3:8.2f} ms")
    vr = np.asarray(vref)
    vn = np.asarray(vnew)
    scale = np.abs(vr).max()
    print(f"  v max |diff|/max = {np.abs(vr - vn).max() / scale:.3e}")

    # ---------------- 3. cell-layout single-dot rmatmul --------------------
    # One space-to-depth transpose of the movie into (I, J, cellpix, t),
    # then ONE batched dot against combined per-cell panels: each 16x16
    # cell is covered by exactly 4 blocks (its corner role (a, b)), so the
    # cell's panel matrix has 4*S block columns + K_BG background columns
    # = 95 — which pads to the same 128 MXU lanes S=20 alone would.
    nC1, nC2 = D1 // H, D2 // H
    CK = 4 * S + K_BG

    @jax.jit
    def v_cell(p, movie, panels, bg, rows, std_flat, mean_flat):
        inv_std = (1.0 / std_flat)[rows]
        pan_t = panels * inv_std[:, :, None]
        # cell-split panels: p F-order -> (b2=2H(j), b1=2H(i)) -> cells
        pan6 = pan_t.reshape(n1, n2, 2, H, 2, H, S)  # (g1,g2,jc,jr,ic,ir,S)
        m_cell = jnp.zeros((nC1, nC2, H * H, CK), jnp.float32)
        for a in (0, 1):          # corner along dim1 (i)
            for bcorner in (0, 1):  # corner along dim2 (j)
                part = pan6[:, :, bcorner, :, a, :, :]       # (g1,g2,jr,ir,S)
                part = jnp.swapaxes(part, 2, 3)              # (g1,g2,ir,jr,S)
                part = part.reshape(n1, n2, H * H, S)
                k0 = (2 * a + bcorner) * S
                m_cell = m_cell.at[
                    a : a + n1, bcorner : bcorner + n2, :, k0 : k0 + S
                ].set(part)
        bg_img = unflatten_fov(bg / std_flat[:, None], D1, D2, "F")
        bg_cells = bg_img.reshape(nC1, H, nC2, H, K_BG)
        bg_cells = jnp.swapaxes(bg_cells, 1, 2).reshape(nC1, nC2, H * H, K_BG)
        m_cell = m_cell.at[:, :, :, 4 * S :].set(bg_cells)

        # space-to-depth: (t, d1, d2) -> (I, J, cellpix, t)
        xc = movie.reshape(T, nC1, H, nC2, H)
        xc = jnp.transpose(xc, (1, 3, 2, 4, 0)).reshape(nC1, nC2, H * H, T)

        y = jax.lax.dot_general(
            m_cell, xc, (((2,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )  # (I, J, CK, t)

        # reduce cells back to blocks: W[g1,g2,s] = sum over 4 corners
        w = (
            y[0:n1, 0:n2, 0 * S : 1 * S]
            + y[1 : n1 + 1, 0:n2, 2 * S : 3 * S]
            + y[0:n1, 1 : n2 + 1, 1 * S : 2 * S]
            + y[1 : n1 + 1, 1 : n2 + 1, 3 * S : 4 * S]
        )
        w_blocks = w.reshape(g * S, T)
        w_bg = jnp.sum(y[:, :, 4 * S :, :], axis=(0, 1))     # (K_BG, t)
        w_full = jnp.concatenate([w_blocks, w_bg], axis=0)
        q_blocks = jnp.einsum("gps,gp->gs", pan_t, mean_flat[rows],
                              preferred_element_type=jnp.float32).reshape(-1)
        q_bg = _mm((bg / std_flat[:, None]).T, mean_flat[:, None])[:, 0]
        q = jnp.concatenate([q_blocks, q_bg])
        return _mm(p.T, w_full - q[:, None])

    secs, vcell = timed(
        v_cell, p_mix, movie, panels, bg, rows, std_flat, mean_flat, n=4
    )
    print(f"v_projection (cell dot)      {secs*1e3:8.2f} ms")
    vc = np.asarray(vcell)
    print(f"  v max |diff|/max = {np.abs(vr - vc).max() / scale:.3e}")

    # ---------------- 4. transpose-first coset rmatmul ---------------------
    @jax.jit
    def v_coset_t(p, movie, panels, bg, rows, std_flat, mean_flat):
        inv_std = (1.0 / std_flat)[rows]
        pan_t = panels * inv_std[:, :, None]
        mt = jnp.transpose(movie, (1, 2, 0))                 # (d1, d2, t)
        m = T
        out = jnp.zeros((n1, n2, S, m), jnp.float32)
        for r1 in (0, 1):
            for r2 in (0, 1):
                nc1 = len(range(r1, n1, 2))
                nc2 = len(range(r2, n2, 2))
                a1, a2 = r1 * H, r2 * H
                view = mt[a1 : a1 + nc1 * B, a2 : a2 + nc2 * B, :]
                view = view.reshape(nc1, B, nc2, B, m)       # (A, i, C, j, t)
                pan = pan_t.reshape(n1, n2, B * B, S)[r1::2, r2::2]
                pan = pan.reshape(nc1, nc2, B, B, S)         # (A, C, j, i, S)
                res = jax.lax.dot_general(
                    pan, view,
                    (((2, 3), (3, 1)), ((0, 1), (0, 2))),
                    preferred_element_type=jnp.float32,
                )  # (A, C, S, t)
                out = out.at[r1::2, r2::2].set(res)
        w_blocks = out.reshape(g * S, m)
        bg_c = unflatten_fov(bg / std_flat[:, None], D1, D2, "F")
        w_bg = jax.lax.dot_general(
            bg_c, mt, (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (K, t)
        w = jnp.concatenate([w_blocks, w_bg], axis=0)
        q_blocks = jnp.einsum("gps,gp->gs", pan_t, mean_flat[rows],
                              preferred_element_type=jnp.float32).reshape(-1)
        q_bg = _mm((bg / std_flat[:, None]).T, mean_flat[:, None])[:, 0]
        q = jnp.concatenate([q_blocks, q_bg])
        return _mm(p.T, w - q[:, None])

    secs, vt2 = timed(
        v_coset_t, p_mix, movie, panels, bg, rows, std_flat, mean_flat, n=4
    )
    print(f"v_projection (transpose+coset) {secs*1e3:8.2f} ms")
    vt2 = np.asarray(vt2)
    print(f"  v max |diff|/max = {np.abs(vr - vt2).max() / scale:.3e}")


if __name__ == "__main__":
    main()
