"""Pallas kernels vs their XLA oracles (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from localmd_tpu.ops.noise import get_mean_and_noise, welch_noise_estimate
from localmd_tpu.ops.pallas_kernels import fused_movie_stats


class TestFusedMovieStats:
    def test_matches_xla_path(self, rng):
        t, p = 512, 700  # p not a multiple of the tile size
        chunk = rng.standard_normal((t, p)).astype(np.float32) * 2.3 + 1.0
        mean, sigma = fused_movie_stats(jnp.asarray(chunk), 10_000)
        expected_mean = chunk.sum(axis=0) / 10_000
        expected_sigma = np.asarray(welch_noise_estimate(jnp.asarray(chunk.T)))
        np.testing.assert_allclose(np.asarray(mean), expected_mean, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sigma), expected_sigma, rtol=1e-3)

    def test_uint16_input(self, rng):
        t, p = 384, 512
        chunk = rng.integers(0, 5000, size=(t, p), dtype=np.uint16)
        mean, sigma = fused_movie_stats(jnp.asarray(chunk), t)
        np.testing.assert_allclose(
            np.asarray(mean), chunk.astype(np.float64).mean(axis=0), rtol=1e-4
        )
        expected_sigma = np.asarray(
            welch_noise_estimate(jnp.asarray(chunk.T.astype(np.float32)))
        )
        np.testing.assert_allclose(np.asarray(sigma), expected_sigma, rtol=1e-3)

    def test_ref_compat_nperseg_matches_xla_path(self, rng):
        """nperseg = chunk length (welch_compat="reference") in the pallas
        kernel vs the XLA reference-compat kernel."""
        from localmd_tpu.ops.noise import welch_noise_estimate_ref_compat

        for t in (300, 512):
            p = 600
            chunk = rng.standard_normal((t, p)).astype(np.float32) * 1.3
            mean, sigma = fused_movie_stats(jnp.asarray(chunk), t, nperseg=t)
            expected_sigma = np.asarray(
                welch_noise_estimate_ref_compat(jnp.asarray(chunk.T))
            )
            np.testing.assert_allclose(
                np.asarray(sigma), expected_sigma, rtol=1e-3, err_msg=f"t={t}"
            )
            np.testing.assert_allclose(
                np.asarray(mean), chunk.mean(axis=0), rtol=1e-4, atol=1e-6
            )

    def test_mean_only_mode(self, rng):
        t, p = 100, 512  # too short for welch
        chunk = rng.standard_normal((t, p)).astype(np.float32)
        mean, sigma = fused_movie_stats(jnp.asarray(chunk), 100, compute_noise=False)
        np.testing.assert_allclose(np.asarray(mean), chunk.mean(axis=0), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sigma), 0.0, atol=1e-7)

    def test_consistency_with_fov_kernel(self, rng):
        # the (d1, d2, T) XLA kernel and the (T, P) pallas kernel must agree
        # after C-order pixel reshape
        d1, d2, t = 16, 32, 512
        movie = rng.standard_normal((t, d1, d2)).astype(np.float32)
        fov = jnp.moveaxis(jnp.asarray(movie), 0, -1)
        m_ref, s_ref = get_mean_and_noise(fov, 1234)
        mean, sigma = fused_movie_stats(jnp.asarray(movie.reshape(t, d1 * d2)), 1234)
        np.testing.assert_allclose(
            np.asarray(mean).reshape(d1, d2), np.asarray(m_ref), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(sigma).reshape(d1, d2), np.asarray(s_ref), rtol=1e-3
        )


class TestFusedVProjection:
    def test_matches_dense_math(self, rng):
        from localmd_tpu.ops.pallas_kernels import fused_v_projection
        import jax.numpy as jnp

        t, d, r = 100, 700, 37  # none aligned to tiles
        raw = rng.integers(0, 4000, size=(t, d)).astype(np.uint16)
        a = rng.standard_normal((d, r)).astype(np.float32) * 0.01
        c = rng.standard_normal(r).astype(np.float32)
        out = np.asarray(fused_v_projection(jnp.asarray(raw), jnp.asarray(a), jnp.asarray(c)))
        expected = (raw.astype(np.float32) @ a - c[None, :]).T
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-3)

    def test_float32_input(self, rng):
        from localmd_tpu.ops.pallas_kernels import fused_v_projection
        import jax.numpy as jnp

        t, d, r = 256, 512, 128  # exactly aligned
        raw = rng.standard_normal((t, d)).astype(np.float32)
        a = rng.standard_normal((d, r)).astype(np.float32)
        c = np.zeros(r, dtype=np.float32)
        out = np.asarray(fused_v_projection(jnp.asarray(raw), jnp.asarray(a), jnp.asarray(c)))
        np.testing.assert_allclose(out, (raw @ a).T, rtol=1e-4, atol=1e-3)


class TestFusedBlockReconstruct:
    def test_matches_scatter_add(self, rng):
        import jax.numpy as jnp
        from localmd_tpu.ops.pallas_kernels import (
            fused_block_reconstruct,
            panels_f_to_c,
        )
        from localmd_tpu.ops.tiling import BlockGrid, unflatten_fov

        d1, d2, f, S = 24, 16, 8, 3
        grid = BlockGrid(d1, d2, (8, 8))
        n, p = grid.n_blocks, grid.pixels_per_block
        panels = rng.standard_normal((n, p, S)).astype(np.float32)
        temporal = rng.standard_normal((n, S, f)).astype(np.float32)

        # oracle: F-order scatter-add
        expected = np.zeros((d1 * d2, f), np.float32)
        for b in range(n):
            expected[grid.rows[b]] += panels[b] @ temporal[b]
        expected_img = np.asarray(
            unflatten_fov(jnp.asarray(expected), d1, d2)
        )

        panels_c = panels_f_to_c(jnp.asarray(panels), 8, 8)
        out = fused_block_reconstruct(
            panels_c, jnp.asarray(temporal), jnp.asarray(grid.starts),
            jnp.zeros((d1, d2, f), jnp.float32), 8, 8,
        )
        np.testing.assert_allclose(np.asarray(out), expected_img, atol=1e-4)

    def test_large_rank_tiling(self, rng):
        # exercises the adaptive tile shrink (and the XLA fallback threshold)
        from localmd_tpu.ops.pallas_kernels import fused_v_projection, _vp_pick_tiles
        import jax.numpy as jnp

        assert _vp_pick_tiles(2560) is not None          # shrunk tiles fit
        t, d, r = 64, 1024, 2560
        raw = rng.standard_normal((t, d)).astype(np.float32)
        a = rng.standard_normal((d, r)).astype(np.float32) * 0.02
        c = rng.standard_normal(r).astype(np.float32)
        out = np.asarray(fused_v_projection(jnp.asarray(raw), jnp.asarray(a), jnp.asarray(c)))
        expected = (raw @ a - c[None, :]).T
        np.testing.assert_allclose(out, expected, rtol=1e-3, atol=1e-3)

    def test_unaligned_blocks_and_fov(self, rng):
        # 20x20 blocks on a 60x52 FOV: offsets at multiples of 10 (8-unaligned)
        # and a FOV that forces the widened-window padding path
        import jax.numpy as jnp
        from localmd_tpu.ops.pallas_kernels import (
            fused_block_reconstruct,
            panels_f_to_c,
        )
        from localmd_tpu.ops.tiling import BlockGrid, unflatten_fov

        d1, d2, f, S = 60, 52, 4, 3
        grid = BlockGrid(d1, d2, (20, 20))
        n, p = grid.n_blocks, grid.pixels_per_block
        panels = rng.standard_normal((n, p, S)).astype(np.float32)
        temporal = rng.standard_normal((n, S, f)).astype(np.float32)
        expected = np.zeros((d1 * d2, f), np.float32)
        for b in range(n):
            expected[grid.rows[b]] += panels[b] @ temporal[b]
        expected_img = np.asarray(unflatten_fov(jnp.asarray(expected), d1, d2))
        panels_c = panels_f_to_c(jnp.asarray(panels), 20, 20)
        out = fused_block_reconstruct(
            panels_c, jnp.asarray(temporal), jnp.asarray(grid.starts),
            jnp.zeros((d1, d2, f), jnp.float32), 20, 20,
        )
        assert out.shape == (d1, d2, f)
        np.testing.assert_allclose(np.asarray(out), expected_img, atol=1e-4)

    def test_window_geometry_origins_always_aligned(self):
        # TPU-geometry regression: every clamped DMA origin the kernel can
        # compute must be a multiple of 8, for ANY (block, FOV) combination —
        # unaligned sublane origins fault the real TPU worker, which CPU
        # interpret mode cannot detect. The clamp is
        # min((start // 8) * 8, d_pad - w), so d_pad - w must be 8-aligned
        # and the window must still cover a block at any clamped origin.
        from localmd_tpu.ops.pallas_kernels import recon_window_geometry

        for b in (8, 10, 16, 20, 28, 32, 40):
            for d in (b, b + 1, 52, 60, 100, 500, 512, 1023):
                if d < b:
                    continue
                w1, w2, d1p, d2p = recon_window_geometry(b, b, d, d)
                assert w1 % 8 == 0 and d1p % 8 == 0
                assert (d1p - w1) % 8 == 0, (b, d, w1, d1p)
                assert d1p >= d and d1p >= w1
                for start in range(0, d - b + 1):
                    k0 = min((start // 8) * 8, d1p - w1)
                    assert k0 % 8 == 0, (b, d, start, k0)
                    assert k0 <= start and k0 + w1 >= start + b, (b, d, start)

    def test_fov_where_clamp_was_unaligned(self, rng):
        # 100x100 FOV with 32x32 blocks: old clamp gave d - w = 100 - 48 = 52
        # (8-unaligned) for tail blocks; padded FOV must fix it.
        import jax.numpy as jnp
        from localmd_tpu.ops.pallas_kernels import (
            fused_block_reconstruct,
            panels_f_to_c,
        )
        from localmd_tpu.ops.tiling import BlockGrid, unflatten_fov

        d1, d2, f, S = 100, 100, 4, 2
        grid = BlockGrid(d1, d2, (32, 32))
        n, p = grid.n_blocks, grid.pixels_per_block
        panels = rng.standard_normal((n, p, S)).astype(np.float32)
        temporal = rng.standard_normal((n, S, f)).astype(np.float32)
        expected = np.zeros((d1 * d2, f), np.float32)
        for b in range(n):
            expected[grid.rows[b]] += panels[b] @ temporal[b]
        expected_img = np.asarray(unflatten_fov(jnp.asarray(expected), d1, d2))
        panels_c = panels_f_to_c(jnp.asarray(panels), 32, 32)
        out = fused_block_reconstruct(
            panels_c, jnp.asarray(temporal), jnp.asarray(grid.starts),
            jnp.zeros((d1, d2, f), jnp.float32), 32, 32,
        )
        assert out.shape == (d1, d2, f)
        np.testing.assert_allclose(np.asarray(out), expected_img, atol=1e-4)
