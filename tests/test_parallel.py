"""Sharded phases must match the single-device paths on an 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from localmd_tpu.blocksparse import BlockSparseMatrix
from localmd_tpu.engine import single_block_md_batched
from localmd_tpu.ops.tiling import BlockGrid, extract_patches, flatten_fov, flatten_image
from localmd_tpu.parallel.mesh import make_mesh
import pytest

from localmd_tpu.parallel.sharded import (
    sharded_block_decomposition,
    sharded_gram_quadratic,
    sharded_v_projection_chunk,
)

# 8-device mesh end-to-end comparisons: quick lane skips this module (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _make_blocksparse(rng, grid, slots=4):
    n, p = grid.n_blocks, grid.pixels_per_block
    panels = rng.standard_normal((n, p, slots)).astype(np.float32)
    return BlockSparseMatrix(
        panels=jnp.asarray(panels),
        rows=jnp.asarray(grid.rows),
        n_pixels=grid.d1 * grid.d2,
        dense_basis=jnp.asarray(rng.standard_normal((grid.d1 * grid.d2, 2)).astype(np.float32)),
    )


class TestShardedPhases:
    def test_block_decomposition_matches_single_device(self, rng):
        mesh = make_mesh()
        n_dev = len(mesh.devices)
        n_blocks = 2 * n_dev
        blocks = rng.standard_normal((n_blocks, 12, 12, 80)).astype(np.float32)
        keys = jax.random.split(jax.random.PRNGKey(0), n_blocks)

        local_fn = functools.partial(
            single_block_md_batched,
            max_rank=3,
            temporal_avg_factor=4,
            spatial_avg_factor=2,
            spatial_threshold=1e9,
            temporal_threshold=1e9,
        )
        u_s, dec_s, v_s = sharded_block_decomposition(
            mesh, lambda b, k: local_fn(b, k), jnp.asarray(blocks), keys
        )
        u_1, dec_1, v_1 = local_fn(jnp.asarray(blocks), keys)
        np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_1), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(dec_s), np.asarray(dec_1))

    def test_v_projection_matches_blocksparse(self, rng):
        mesh = make_mesh()
        grid = BlockGrid(24, 16, (12, 8))
        u = _make_blocksparse(rng, grid)
        r_cols = u.shape[1]
        p_mat = rng.standard_normal((r_cols, 5)).astype(np.float32)
        t_c = 16  # divisible by 8 devices
        chunk = rng.standard_normal((24, 16, t_c)).astype(np.float32)
        mean = rng.standard_normal((24, 16)).astype(np.float32)
        std = (0.5 + rng.random((24, 16))).astype(np.float32)

        chunk_flat = flatten_fov(jnp.asarray(chunk))
        mean_flat = flatten_image(jnp.asarray(mean))
        std_flat = flatten_image(jnp.asarray(std))

        out = sharded_v_projection_chunk(
            mesh, u.panels, u.rows, u.dense_basis, jnp.asarray(p_mat),
            chunk_flat, mean_flat, std_flat,
        )
        # single-device oracle
        x = (np.asarray(chunk_flat) - np.asarray(mean_flat)[:, None]) / np.asarray(
            std_flat
        )[:, None]
        expected = p_mat.T @ np.asarray(u.rmatmul(jnp.asarray(x)))
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-3)

    def test_gram_quadratic_matches_blocksparse(self, rng):
        mesh = make_mesh()
        grid = BlockGrid(20, 20, (8, 8))
        assert grid.n_blocks % len(mesh.devices) == 0, grid.n_blocks
        u = _make_blocksparse(rng, grid)
        right = rng.standard_normal((u.shape[1], 6)).astype(np.float32)

        out = sharded_gram_quadratic(
            mesh, u.panels, u.rows, u.dense_basis, jnp.asarray(right), u.n_pixels
        )
        expected = np.asarray(u.gram_quadratic(jnp.asarray(right)))
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-2)

    def test_gram_quadratic_column_chunked(self, rng):
        """col_chunk < m must give the same (m, m) Gram — this is the
        bounded-memory path for large-FOV meshes (each chip holds a pixel
        SHARD of Z plus one col_chunk staging slice, never the full
        n_pixels x m buffer)."""
        mesh = make_mesh()
        grid = BlockGrid(20, 20, (8, 8))
        u = _make_blocksparse(rng, grid)
        m = u.shape[1]
        right = rng.standard_normal((m, m)).astype(np.float32)

        expected = np.asarray(u.gram_quadratic(jnp.asarray(right)))
        for cc in (7, 64):
            out = sharded_gram_quadratic(
                mesh, u.panels, u.rows, u.dense_basis, jnp.asarray(right),
                u.n_pixels, col_chunk=cc,
            )
            np.testing.assert_allclose(np.asarray(out), expected, atol=1e-2,
                                       err_msg=f"col_chunk={cc}")

    def test_gram_quadratic_pixels_not_divisible_by_mesh(self, rng):
        """n_pixels not a multiple of the mesh size exercises the pixel
        padding around psum_scatter."""
        mesh = make_mesh()
        grid = BlockGrid(18, 19, (9, 9))  # 342 pixels, not divisible by 8
        u = _make_blocksparse(rng, grid)
        n_dev = len(mesh.devices)
        if u.n_blocks % n_dev:
            pytest.skip("block grid not shardable at this size")
        right = rng.standard_normal((u.shape[1], 5)).astype(np.float32)
        out = sharded_gram_quadratic(
            mesh, u.panels, u.rows, u.dense_basis, jnp.asarray(right),
            u.n_pixels, col_chunk=3,
        )
        expected = np.asarray(u.gram_quadratic(jnp.asarray(right)))
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-2)


class TestShardedWindowedPMD:
    def test_multi_window_matches_single_device(self, rng):
        # Voltage-style config: multiple temporal windows, incremental basis.
        from localmd_tpu.engine import windowed_pmd_batched

        mesh = make_mesh()
        n_dev = len(mesh.devices)
        n_blocks = 2 * n_dev
        b1 = b2 = 12
        t = 240
        # Low-rank-per-window signal so windows genuinely grow the basis.
        u_a = rng.standard_normal((n_blocks, b1 * b2, 2)).astype(np.float32)
        v_a = rng.standard_normal((n_blocks, 2, t)).astype(np.float32)
        blocks = (
            np.einsum("nps,nst->npt", u_a, v_a).reshape(n_blocks, b1, b2, t)
            + 0.05 * rng.standard_normal((n_blocks, b1, b2, t))
        ).astype(np.float32)

        kwargs = dict(
            window_length=80, max_rank=5,
            spatial_threshold=1e9, temporal_threshold=1e9,
            max_consecutive_failures=1,
            temporal_avg_factor=4, spatial_avg_factor=2,
        )
        key = jax.random.PRNGKey(3)
        res_1 = windowed_pmd_batched(jnp.asarray(blocks), key, **kwargs)
        res_m = windowed_pmd_batched(jnp.asarray(blocks), key, **kwargs, mesh=mesh)
        np.testing.assert_array_equal(
            np.asarray(res_1.counts), np.asarray(res_m.counts)
        )
        np.testing.assert_allclose(
            np.asarray(res_1.spatial), np.asarray(res_m.spatial), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(res_1.temporal), np.asarray(res_m.temporal), atol=1e-3
        )

    def test_indivisible_window_length_rounds_down(self, rng):
        # window_length=63 with temporal_avg_factor=4 used to crash in the
        # _bin_consecutive reshape; it must round to 60 and run.
        from localmd_tpu.engine import windowed_pmd_batched

        blocks = rng.standard_normal((2, 12, 12, 130)).astype(np.float32)
        res = windowed_pmd_batched(
            jnp.asarray(blocks), jax.random.PRNGKey(0), 63, 3,
            1e9, 1e9, 1, 4, 2,
        )
        assert res.spatial.shape == (2, 144, 3)
        assert (np.asarray(res.counts) > 0).all()


class TestMeshPipeline:
    def test_end_to_end_with_mesh_matches_quality(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from conftest import make_low_rank_movie
        from localmd_tpu import localmd_decomposition

        rng = np.random.default_rng(11)
        movie = make_low_rank_movie(3, (300, 24, 24), rng)
        mesh = make_mesh()
        pmd = localmd_decomposition(
            movie, (12, 12), frame_range=300, max_components=4,
            background_rank=1, temporal_avg_factor=4, sim_iters=16, seed=0,
            mesh=mesh,
        )
        rel = np.linalg.norm(pmd[:, :, :] - movie) / np.linalg.norm(movie)
        assert rel < 1e-2, rel
