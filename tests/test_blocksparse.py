import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse

from localmd_tpu.blocksparse import BlockSparseMatrix
from localmd_tpu.ops.tiling import BlockGrid


def make_case(rng, d1=24, d2=20, block=(12, 10), slots=4, k_bg=3):
    grid = BlockGrid(d1, d2, block)
    n, p = grid.n_blocks, grid.pixels_per_block
    panels = rng.standard_normal((n, p, slots)).astype(np.float32)
    bg = rng.standard_normal((d1 * d2, k_bg)).astype(np.float32)
    u = BlockSparseMatrix(
        panels=jnp.asarray(panels),
        rows=jnp.asarray(grid.rows),
        n_pixels=d1 * d2,
        dense_basis=jnp.asarray(bg),
    )
    # dense oracle
    dense = np.zeros((d1 * d2, n * slots + k_bg), dtype=np.float64)
    for b in range(n):
        for j in range(slots):
            dense[grid.rows[b], b * slots + j] += panels[b, :, j]
    dense[:, n * slots :] = bg
    return u, dense, grid


class TestBlockSparse:
    def test_matmul_matches_dense(self, rng):
        u, dense, _ = make_case(rng)
        x = rng.standard_normal((dense.shape[1], 6)).astype(np.float32)
        out = np.asarray(u.matmul(jnp.asarray(x)))
        np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize(
        "d1,d2,block,order",
        [
            (24, 20, (12, 10), "F"),   # exact tiling, even block
            (25, 23, (12, 10), "F"),   # snapped tail blocks both dims
            (25, 23, (12, 10), "C"),   # C-order global ids
            (29, 31, (11, 13), "F"),   # odd blocks: stride floor(b/2), k_c=3
            (12, 10, (12, 10), "F"),   # single block per dim
        ],
    )
    def test_matmul_coset_path_matches_scatter(self, rng, d1, d2, block, order):
        # the coset pad/transpose/reshape overlap-add must agree with the
        # scatter-add path (and the dense oracle) on every grid family:
        # exact tilings, snapped tails, odd blocks, degenerate single-block
        grid = BlockGrid(d1, d2, block, order=order)
        n, p = grid.n_blocks, grid.pixels_per_block
        panels = rng.standard_normal((n, p, 4)).astype(np.float32)
        bg = rng.standard_normal((d1 * d2, 3)).astype(np.float32)
        kw = dict(
            panels=jnp.asarray(panels), rows=jnp.asarray(grid.rows),
            n_pixels=d1 * d2, dense_basis=jnp.asarray(bg),
            block_shape=block,
        )
        u_scat = BlockSparseMatrix(**kw)
        u_cos = BlockSparseMatrix(**kw, coset_info=grid.coset_info())
        # cosets partition the blocks
        ids = np.concatenate([np.asarray(i) for i, _ in grid.cosets()])
        assert sorted(ids.tolist()) == list(range(n))
        x = rng.standard_normal((u_scat.shape[1], 6)).astype(np.float32)
        out_cos = np.asarray(u_cos.matmul(jnp.asarray(x)))
        out_scat = np.asarray(u_scat.matmul(jnp.asarray(x)))
        np.testing.assert_allclose(out_cos, out_scat, rtol=1e-5, atol=1e-5)
        # column-chunked branch (mc floor is 32, so force m > 32)
        x_wide = rng.standard_normal((u_scat.shape[1], 70)).astype(np.float32)
        import localmd_tpu.blocksparse as bs
        orig = bs._INTERMEDIATE_BUDGET_BYTES
        bs._INTERMEDIATE_BUDGET_BYTES = 1  # mc -> floor of 32 => chunking
        try:
            out_chunked = np.asarray(u_cos.matmul(jnp.asarray(x_wide)))
        finally:
            bs._INTERMEDIATE_BUDGET_BYTES = orig
        np.testing.assert_allclose(
            out_chunked, np.asarray(u_scat.matmul(jnp.asarray(x_wide))),
            rtol=1e-5, atol=1e-5,
        )
        # coset_info's inverse permutation maps the coset-order concat back
        # to block order (used by ablation tooling; production rmatmul
        # stays on the measured-faster gather path)
        inv = np.asarray(grid.coset_info()[5])
        assert (ids[inv] == np.arange(n)).all()

    def test_rmatmul_matches_dense(self, rng):
        u, dense, _ = make_case(rng)
        y = rng.standard_normal((dense.shape[0], 5)).astype(np.float32)
        out = np.asarray(u.rmatmul(jnp.asarray(y)))
        np.testing.assert_allclose(out, dense.T @ y, rtol=1e-4, atol=1e-4)

    def test_gram_quadratic(self, rng):
        u, dense, _ = make_case(rng)
        right = rng.standard_normal((dense.shape[1], 7)).astype(np.float32)
        out = np.asarray(u.gram_quadratic(jnp.asarray(right)))
        expected = right.T @ (dense.T @ (dense @ right))
        np.testing.assert_allclose(out, expected, rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(out, out.T, atol=1e-6)  # symmetrized

    @pytest.mark.parametrize(
        "d1,d2,block,k_bg",
        [
            (36, 30, (12, 10), 3),   # regular non-square blocks, bg
            (36, 30, (12, 10), 0),   # no background columns
            (48, 48, (16, 16), 2),   # square, larger grid
            (12, 30, (12, 10), 2),   # single block row along dim1
        ],
    )
    def test_gram_quadratic_banded_matches_canvas(self, rng, d1, d2, block, k_bg):
        # the banded fast path (block-banded U^T U over regular grids) must
        # agree with the canvas Z^T Z form; forced on for CPU via the flag
        import localmd_tpu.blocksparse as bs

        grid = BlockGrid(d1, d2, block)
        geom = grid.cell_geometry()
        assert geom is not None, "fixture grids must be regular"
        n, p = grid.n_blocks, grid.pixels_per_block
        panels = rng.standard_normal((n, p, 4)).astype(np.float32)
        bg = rng.standard_normal((d1 * d2, k_bg)).astype(np.float32)
        kw = dict(
            panels=jnp.asarray(panels), rows=jnp.asarray(grid.rows),
            n_pixels=d1 * d2, dense_basis=jnp.asarray(bg),
            block_shape=block, coset_info=grid.coset_info(),
        )
        u_plain = BlockSparseMatrix(**kw)
        u_band = BlockSparseMatrix(**kw, cell_geom=geom)
        right = rng.standard_normal((u_plain.shape[1], 7)).astype(np.float32)
        ref = np.asarray(u_plain.gram_quadratic(jnp.asarray(right)))
        orig = bs.BANDED_GRAM
        bs.BANDED_GRAM = True
        try:
            out = np.asarray(u_band.gram_quadratic(jnp.asarray(right)))
        finally:
            bs.BANDED_GRAM = orig
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(out / scale, ref / scale, atol=2e-5)
        np.testing.assert_allclose(out, out.T, atol=1e-6)

    def test_gram_banded_budget_fallback(self, rng):
        # an over-budget banded call must fall back to the canvas path
        import localmd_tpu.blocksparse as bs

        grid = BlockGrid(36, 30, (12, 10))
        n, p = grid.n_blocks, grid.pixels_per_block
        panels = rng.standard_normal((n, p, 3)).astype(np.float32)
        u = BlockSparseMatrix(
            panels=jnp.asarray(panels), rows=jnp.asarray(grid.rows),
            n_pixels=36 * 30, dense_basis=jnp.zeros((36 * 30, 0), jnp.float32),
            block_shape=(12, 10), coset_info=grid.coset_info(),
            cell_geom=grid.cell_geometry(),
        )
        right = rng.standard_normal((u.shape[1], 5)).astype(np.float32)
        orig_flag, orig_budget = bs.BANDED_GRAM, bs._INTERMEDIATE_BUDGET_BYTES
        bs.BANDED_GRAM = True
        try:
            full = np.asarray(u.gram_quadratic(jnp.asarray(right)))
            bs._INTERMEDIATE_BUDGET_BYTES = 1  # force fallback
            fallback = np.asarray(u.gram_quadratic(jnp.asarray(right)))
        finally:
            bs.BANDED_GRAM = orig_flag
            bs._INTERMEDIATE_BUDGET_BYTES = orig_budget
        np.testing.assert_allclose(full, fallback, rtol=2e-4, atol=1e-3)

    def test_cell_geometry_detection(self):
        # regular grids report geometry; snapped tails / odd blocks do not
        assert BlockGrid(36, 30, (12, 10)).cell_geometry() == (5, 5, 6, 5)
        assert BlockGrid(512, 512, (32, 32)).cell_geometry() == (31, 31, 16, 16)
        assert BlockGrid(25, 23, (12, 10)).cell_geometry() is None  # tails
        assert BlockGrid(29, 31, (11, 13)).cell_geometry() is None  # odd
        assert BlockGrid(12, 10, (12, 10)).cell_geometry() == (1, 1, 6, 5)

    def test_gram_matmul_chunked_matches_unchunked(self, rng):
        u, dense, _ = make_case(rng)
        x = rng.standard_normal((dense.shape[1], 9)).astype(np.float32)
        full = np.asarray(u.gram_matmul(jnp.asarray(x)))
        chunked = np.asarray(u.gram_matmul(jnp.asarray(x), col_chunk=4))
        np.testing.assert_allclose(full, chunked, rtol=1e-5)

    def test_to_csr_compacts_columns(self, rng):
        u, dense, grid = make_case(rng, slots=4, k_bg=2)
        n = grid.n_blocks
        counts = rng.integers(0, 5, size=n)
        # zero out unused slots in the panels (as the pipeline guarantees)
        panels = np.asarray(u.panels).copy()
        for b in range(n):
            panels[b, :, counts[b] :] = 0.0
        u = BlockSparseMatrix(
            panels=jnp.asarray(panels),
            rows=u.rows,
            n_pixels=u.n_pixels,
            dense_basis=u.dense_basis,
        )
        csr, col_map = u.to_csr(counts)
        assert csr.shape == (u.n_pixels, int(counts.sum()) + 2)
        assert len(col_map) == csr.shape[1]
        # each compacted column equals the padded column it maps to
        dense_padded = np.zeros(u.shape, dtype=np.float64)
        for b in range(n):
            for j in range(4):
                dense_padded[np.asarray(u.rows)[b], b * 4 + j] += panels[b, :, j]
        dense_padded[:, n * 4 :] = np.asarray(u.dense_basis)
        np.testing.assert_allclose(
            csr.toarray(), dense_padded[:, col_map], atol=1e-5
        )
