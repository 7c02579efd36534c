import os

import numpy as np
import pytest

from localmd_tpu.diagnostics import (
    construct_index,
    make_autocorrelation_image,
    make_correlation_image,
    make_pmd_correlation_image,
    make_pmd_corr_diagnostic_plot,
    make_residual_correlation_image,
    plot_pmd_components,
)

# pipeline-driven QC figure generation: quick lane skips this module (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _corr(t1, t2):
    t1 = t1 - t1.mean()
    t2 = t2 - t2.mean()
    return float((t1 / np.linalg.norm(t1)) @ (t2 / np.linalg.norm(t2)))


def _oracle_corr_image(movie, mode):
    """Direct port of the reference's per-pixel loop semantics
    (reference diagnostic_plots.py:227-272)."""
    T, d1, d2 = movie.shape
    counts = np.zeros((d1, d2))
    net = np.zeros((d1, d2))
    for k in range(d1):
        for j in range(d2):
            for c1 in range(k - 1, k + 2):
                for c2 in range(j - 1, j + 2):
                    if 0 <= c1 < d1 and 0 <= c2 < d2 and not (c1 == k and c2 == j):
                        c = _corr(movie[:, k, j], movie[:, c1, c2])
                        if mode == "mean":
                            net[k, j] += c
                        else:
                            net[k, j] = max(c, net[k, j])
                        counts[k, j] += 1
    if mode == "mean":
        net /= counts
    return net


def _oracle_scaled_cov(target, raw, mode):
    T, d1, d2 = target.shape
    counts = np.zeros((d1, d2))
    net = np.zeros((d1, d2))
    for k in range(d1):
        for j in range(d2):
            for c1 in range(k - 1, k + 2):
                for c2 in range(j - 1, j + 2):
                    if 0 <= c1 < d1 and 0 <= c2 < d2 and not (c1 == k and c2 == j):
                        cov = np.cov(target[:, k, j], target[:, c1, c2])[0, 1]
                        scale = np.sqrt(
                            raw[:, k, j].var() * raw[:, c1, c2].var()
                        )
                        val = cov / scale
                        if mode == "mean":
                            net[k, j] += val
                        else:
                            net[k, j] = max(val, net[k, j])
                        counts[k, j] += 1
    if mode == "mean":
        net /= counts
    return net


class TestCorrelationImages:
    @pytest.mark.parametrize("mode", ["max", "mean"])
    def test_correlation_image_matches_oracle(self, rng, mode):
        movie = rng.standard_normal((60, 7, 6)).astype(np.float32)
        ours = make_correlation_image(movie, mode)
        oracle = _oracle_corr_image(movie, mode)
        np.testing.assert_allclose(ours, oracle, atol=1e-4)

    @pytest.mark.parametrize("mode", ["max", "mean"])
    def test_pmd_cov_image_matches_oracle(self, rng, mode):
        raw = rng.standard_normal((50, 6, 5)).astype(np.float32)
        pmd = raw + 0.1 * rng.standard_normal((50, 6, 5)).astype(np.float32)
        ours = make_pmd_correlation_image(raw, pmd, mode)
        oracle = _oracle_scaled_cov(pmd, raw, mode)
        np.testing.assert_allclose(ours, oracle, atol=1e-4)

    def test_residual_cov_image(self, rng):
        raw = rng.standard_normal((50, 6, 5)).astype(np.float32)
        pmd = raw * 0.9
        ours = make_residual_correlation_image(raw, pmd, "mean")
        oracle = _oracle_scaled_cov(raw - pmd, raw, "mean")
        np.testing.assert_allclose(ours, oracle, atol=1e-4)

    def test_autocorrelation_image(self, rng):
        movie = rng.standard_normal((80, 5, 4)).astype(np.float32)
        ours = make_autocorrelation_image(movie, lag=1)
        expected = np.zeros((5, 4))
        for k in range(5):
            for j in range(4):
                expected[k, j] = _corr(movie[1:, k, j], movie[:-1, k, j])
        np.testing.assert_allclose(ours, expected, atol=1e-4)


class TestStreamingDiagnostics:
    """The QC images accumulate over frame chunks in bounded memory — tiny
    chunk sizes must give the same images as one-shot, sources may be lazy
    datasets, and a PMDArray is reconstructed on device chunk by chunk."""

    def test_chunked_matches_one_shot(self, rng):
        movie = (rng.standard_normal((130, 9, 8)) * 3 + 50).astype(np.float32)
        for fn, args in [
            (make_correlation_image, ("max",)),
            (make_correlation_image, ("mean",)),
            (make_autocorrelation_image, (2,)),
        ]:
            one = fn(movie, *args, chunk_frames=1024)
            chunked = fn(movie, *args, chunk_frames=17)
            np.testing.assert_allclose(chunked, one, atol=1e-4)

    def test_chunked_scaled_cov_matches(self, rng):
        raw = (rng.standard_normal((120, 8, 7)) * 2 + 30).astype(np.float32)
        pmd = raw + 0.1 * rng.standard_normal(raw.shape).astype(np.float32)
        for fn in (make_pmd_correlation_image, make_residual_correlation_image):
            one = fn(raw, pmd, "mean", chunk_frames=1024)
            chunked = fn(raw, pmd, "mean", chunk_frames=23)
            np.testing.assert_allclose(chunked, one, atol=1e-4)

    def test_dataset_source(self, rng, tmp_path):
        """A from-disk RawBinaryArray works as the movie source (the
        whole-movie-on-device requirement is gone)."""
        from localmd_tpu.dataset import RawBinaryArray

        movie = (rng.standard_normal((100, 8, 6)) * 10 + 500).astype(np.uint16)
        path = str(tmp_path / "m.bin")
        movie.tofile(path)
        ds = RawBinaryArray(path, (100, 8, 6), np.uint16)
        ours = make_correlation_image(ds, "max", chunk_frames=32)
        want = make_correlation_image(movie.astype(np.float32), "max")
        np.testing.assert_allclose(ours, want, atol=1e-4)

    def test_compute_qc_images_matches_individual(self, rng):
        """The single-sweep combined QC must equal the four standalone
        functions (the moments are identical; only the streaming is shared)."""
        from localmd_tpu.diagnostics import compute_qc_images

        raw = (rng.standard_normal((120, 9, 8)) * 2 + 40).astype(np.float32)
        pmd = raw + 0.1 * rng.standard_normal(raw.shape).astype(np.float32)
        out = compute_qc_images(raw, pmd, "max", lag=2, chunk_frames=31)
        np.testing.assert_allclose(
            out["correlation"], make_correlation_image(raw, "max"), atol=1e-4
        )
        np.testing.assert_allclose(
            out["autocorrelation"], make_autocorrelation_image(raw, 2), atol=1e-4
        )
        np.testing.assert_allclose(
            out["pmd_cov"], make_pmd_correlation_image(raw, pmd, "max"), atol=1e-4
        )
        np.testing.assert_allclose(
            out["residual_cov"],
            make_residual_correlation_image(raw, pmd, "max"), atol=1e-4,
        )

    def test_pmd_array_source(self, rng):
        """QC on a PMDArray reconstructs frames on device per chunk — the
        dense denoised movie is never materialized."""
        from conftest import make_low_rank_movie
        from localmd_tpu import localmd_decomposition

        movie = make_low_rank_movie(3, (300, 20, 20), rng, noise=0.3)
        pmd = localmd_decomposition(
            movie, (10, 10), frame_range=300, max_components=5,
            background_rank=1, temporal_avg_factor=4, sim_iters=15, seed=0,
        )
        dense = pmd[:, :, :]  # host-materialized oracle
        img_lazy = make_pmd_correlation_image(movie, pmd, "mean", chunk_frames=64)
        img_dense = make_pmd_correlation_image(movie, dense, "mean")
        np.testing.assert_allclose(img_lazy, img_dense, atol=1e-3)
        res_lazy = make_residual_correlation_image(movie, pmd, "mean", chunk_frames=64)
        res_dense = make_residual_correlation_image(movie, dense, "mean")
        np.testing.assert_allclose(res_lazy, res_dense, atol=1e-3)

    def test_smooth_signal_has_high_correlation(self, rng):
        # a shared smooth trace across all pixels -> corr image ~1
        trace = np.cumsum(rng.standard_normal(200)).astype(np.float32)
        movie = np.tile(trace[:, None, None], (1, 6, 6))
        movie += 0.01 * rng.standard_normal(movie.shape).astype(np.float32)
        img = make_correlation_image(movie, "mean")
        assert img.min() > 0.95


class TestReports:
    def test_component_browser(self, tmp_path, rng):
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from conftest import make_low_rank_movie
        from localmd_tpu import localmd_decomposition

        movie = make_low_rank_movie(2, (280, 16, 16), rng)
        pmd = localmd_decomposition(
            movie, (10, 10), frame_range=280, max_components=4,
            background_rank=1, temporal_avg_factor=4, sim_iters=20, seed=0,
        )
        folder = str(tmp_path)
        plot_pmd_components(pmd, folder)
        files = os.listdir(folder)
        assert any(f.startswith("Component_") for f in files)
        idx = construct_index(folder)
        assert os.path.exists(idx)
        content = open(idx).read()
        assert "Component_0.html" in content

    def test_diagnostic_panel_figure(self, rng):
        img = rng.random((8, 8)).astype(np.float32)
        fig = make_pmd_corr_diagnostic_plot(img, img, img, img)
        assert fig is not None
