"""Parity against the COMMITTED golden fixture (no reference checkout needed).

tests/golden/reference_golden.npz was generated once from the live reference
implementation with injected sketches and pinned thresholds
(tests/golden/generate_golden.py). This test re-runs OUR pipeline with the
same sketches/thresholds/normalizer settings and asserts the <= 1e-5
relative-Frobenius bar against the stored reconstruction — so strict parity
is enforced even in environments where /root/reference is absent (the live
tests in test_reference_parity.py skip there).
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "reference_golden.npz")


def _make_movie():
    """MUST match tests/golden/generate_golden.py make_movie()."""
    rng = np.random.default_rng(55)
    T, d1, d2, R = 500, 40, 36, 4
    spatial = rng.random((d1 * d2, R)).astype(np.float32)
    temporal = rng.standard_normal((R, T)).astype(np.float32)
    temporal *= np.asarray([8.0, 6.0, 4.5, 3.0], np.float32)[:, None]
    movie = (spatial @ temporal).T.reshape(T, d1, d2)
    movie += 1e-4 * rng.standard_normal(movie.shape).astype(np.float32)
    return movie.astype(np.float32), T, R


def _fixed_sketch(shape):
    import jax

    return jax.random.normal(jax.random.PRNGKey(1234), shape)


class TestCommittedGolden:
    def test_full_pipeline_matches_golden_1e5(self, monkeypatch):
        import localmd_tpu.pipeline as our_pipeline
        from localmd_tpu import localmd_decomposition
        from localmd_tpu.ops.linalg import sketch_override

        golden = np.load(GOLDEN, allow_pickle=True)
        movie, T, R = _make_movie()

        monkeypatch.setattr(
            our_pipeline, "threshold_heuristic", lambda *a, **k: (1e9, 1e9)
        )
        with sketch_override(_fixed_sketch):
            ours = localmd_decomposition(
                movie, (16, 16), frame_range=T, max_components=R,
                background_rank=2, temporal_avg_factor=4,
                compute_normalizer=True, welch_compat="reference",
                seed=0, final_rank_tol=0.0,
            )
            recon_ours = ours[:, :, :]

        recon_golden = golden["recon"]
        norm = np.linalg.norm(recon_golden)
        diff = np.linalg.norm(recon_ours - recon_golden) / norm
        assert diff <= 1e-5, diff

        # statistics images must match the stored reference outputs too
        np.testing.assert_allclose(
            ours.mean_img, golden["mean_img"], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            ours.var_img, golden["noise_var_img"], rtol=1e-4
        )

    def test_golden_loads_through_our_npz_loader(self):
        """The fixture follows the reference .npz convention, so our
        load_decomposition must consume it and reproduce the stored
        reconstruction."""
        from localmd_tpu import load_decomposition

        golden = np.load(GOLDEN, allow_pickle=True)
        view = load_decomposition(GOLDEN)
        recon = view[:, :, :]
        np.testing.assert_allclose(
            recon, golden["recon"].transpose(0, 1, 2), atol=2e-3
        )
