"""Reference-named per-item shims (localmd_tpu.compat / .decomposition).

Structural tests always run; numerical parity against the LIVE reference
(sketch-injected) runs when /root/reference is present.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localmd_tpu.ops.linalg import sketch_override

REFERENCE_PATH = "/root/reference"
HAVE_REFERENCE = os.path.isdir(os.path.join(REFERENCE_PATH, "localmd"))


def fixed_sketch(shape):
    return jax.random.normal(jax.random.PRNGKey(77), shape)


def make_block(rng, d1=16, d2=16, t=120, rank=3):
    u = rng.random((d1 * d2, rank)).astype(np.float32)
    v = rng.standard_normal((rank, t)).astype(np.float32)
    v *= np.asarray([5.0, 3.0, 2.0], np.float32)[:rank, None]
    block = (u @ v).reshape(d1, d2, t, order="F")
    block += 0.01 * rng.standard_normal(block.shape).astype(np.float32)
    return block.astype(np.float32)


class TestImportSurface:
    def test_reference_decomposition_names_importable(self):
        """`from localmd.decomposition import X` migrates to
        `from localmd_tpu.decomposition import X` for the whole surface."""
        import localmd_tpu.decomposition as dec

        for name in [
            "localmd_decomposition", "single_block_md",
            "single_residual_block_md", "windowed_pmd", "rank_simulation",
            "decomposition_no_normalize_approx", "get_temporal_projector",
            "downsample_average_pooling", "threshold_heuristic",
            "truncated_random_svd", "compute_lowrank_factorized_svd",
            "projected_svd", "construct_final_fitness_decision",
            "filter_by_failures", "identify_window_chunks",
            "update_block_sizes", "check_fov_size", "make_jax_random_key",
        ]:
            assert callable(getattr(dec, name)), name


class TestShimStructure:
    def test_single_block_md_shapes_and_orthonormality(self, rng):
        from localmd_tpu.compat import single_block_md

        block = make_block(rng)
        u, dec, v = single_block_md(
            jnp.asarray(block), jax.random.PRNGKey(0), np.zeros(4), 4, 2,
            1e9, 1e9,
        )
        assert u.shape == (16, 16, 4) and v.shape == (4, 120)
        assert dec.shape == (4,)
        uf = np.asarray(u).reshape(256, 4, order="F")
        np.testing.assert_allclose(uf.T @ uf, np.eye(4), atol=1e-3)

    def test_residual_orthogonal_to_existing(self, rng):
        from localmd_tpu.compat import single_block_md, single_residual_block_md

        block = make_block(rng, rank=3)
        u0, _, _ = single_block_md(
            jnp.asarray(block), jax.random.PRNGKey(0), np.zeros(2), 4, 2,
            1e9, 1e9,
        )
        u1, dec1, v1 = single_residual_block_md(
            jnp.asarray(block), u0, jax.random.PRNGKey(1), np.zeros(2), 4,
            1e9, 1e9,
        )
        a = np.asarray(u0).reshape(256, -1, order="F")
        b = np.asarray(u1).reshape(256, -1, order="F")
        assert np.abs(a.T @ b).max() < 1e-3

    def test_windowed_pmd_crops_to_counts(self, rng):
        from localmd_tpu.compat import windowed_pmd

        block = make_block(rng, t=160, rank=2)
        spatial, temporal = windowed_pmd(
            80, jnp.asarray(block), 4, 1e9, 1e9, 1, 4, 2,
            key=jax.random.PRNGKey(3),
        )
        assert spatial.shape[:2] == (16, 16)
        assert spatial.shape[2] == temporal.shape[0] > 0
        assert temporal.shape[1] == 160

    def test_rank_simulation_stats_positive(self):
        from localmd_tpu.compat import rank_simulation

        sp, tp = rank_simulation(
            16, 16, 100, np.zeros(1), jax.random.PRNGKey(0), jax.random.PRNGKey(1)
        )
        assert sp.shape == (1,) and tp.shape == (1,)
        assert float(sp[0]) > 0 and float(tp[0]) > 0

    def test_truncated_random_svd_reference_signature(self, rng):
        """The drop-in namespace's truncated_random_svd must accept the
        reference's rank_placeholder calling convention (its shape IS the
        rank) — regression: re-exporting the static-int-rank implementation
        crashed reference-style calls."""
        from localmd_tpu.decomposition import truncated_random_svd

        mat = rng.standard_normal((60, 40)).astype(np.float32)
        u, s, vt = truncated_random_svd(
            jnp.asarray(mat), jax.random.PRNGKey(0), np.zeros(5)
        )
        assert u.shape == (60, 5) and s.shape == (5,) and vt.shape == (5, 40)
        un = np.asarray(u)
        np.testing.assert_allclose(un.T @ un, np.eye(5), atol=1e-3)
        # int rank also accepted
        u2, _, _ = truncated_random_svd(jnp.asarray(mat), jax.random.PRNGKey(0), 5)
        np.testing.assert_allclose(np.asarray(u2), un, atol=1e-5)

    def test_get_temporal_projector(self, rng):
        from localmd_tpu.compat import get_temporal_projector

        basis = rng.standard_normal((8, 6, 3)).astype(np.float32)
        block = rng.standard_normal((8, 6, 40)).astype(np.float32)
        out = np.asarray(get_temporal_projector(jnp.asarray(basis), jnp.asarray(block)))
        expected = basis.reshape(48, 3, order="F").T @ block.reshape(48, 40, order="F")
        np.testing.assert_allclose(out, expected, atol=1e-4)


class TestSubmoduleNamespaces:
    def test_every_reference_import_path_works(self):
        """`import localmd_tpu as localmd` must satisfy every reference
        submodule import path: localmd.<module>.<symbol> for the complete
        public surface of each reference module."""
        surface = {
            "dataset": ["lazy_data_loader", "TiffArray"],
            "preprocessing_utils": [
                "get_mean_and_noise", "get_mean_chunk", "get_noise_estimate",
                "get_noise_estimate_vmap", "center_and_get_noise_estimate",
                "get_mean", "center", "center_vmap",
                "center_and_noise_normalize", "center_and_noise_normalize_vmap",
                "standardize_block",
            ],
            "evaluation": [
                "l1_norm", "trend_filter_stat", "total_variation_stat",
                "spatial_roughness_stat", "temporal_roughness_stat",
                "spatial_roughness_stat_vmap", "temporal_roughness_stat_vmap",
                "evaluate_fitness", "evaluate_fitness_vmap",
                "construct_final_fitness_decision", "filter_by_failures",
            ],
            "pmd_loader": [
                "PMDLoader", "FrameDataloader", "standardize_and_filter",
                "truncated_random_svd", "display", "make_jax_random_key",
                "v_projection_routine", "v_projection_inner_loop",
            ],
            "decomposition": [
                "localmd_decomposition", "single_block_md",
                "single_residual_block_md", "windowed_pmd", "rank_simulation",
                "decomposition_no_normalize_approx", "get_temporal_projector",
                "downsample_average_pooling", "threshold_heuristic",
                "truncated_random_svd", "compute_lowrank_factorized_svd",
                "projected_svd", "identify_window_chunks", "update_block_sizes",
                "check_fov_size", "make_jax_random_key", "identity", "display",
                "aggregate_local_and_global_decomposition",
                "fewer_rows_svd_routine", "fewer_columns_svd_routine",
            ],
            "pmdarray": ["PMDArray"],
            "diagnostic_plots": [
                "make_pmd_corr_diagnostic_plot", "make_residual_correlation_image",
                "make_pmd_correlation_image", "make_correlation_image",
                "make_autocorrelation_image", "make_pmd_component_graph",
                "plot_pmd_components", "construct_index",
            ],
        }
        import importlib

        for module, names in surface.items():
            mod = importlib.import_module(f"localmd_tpu.{module}")
            for name in names:
                assert hasattr(mod, name), f"localmd_tpu.{module}.{name}"

    def test_vmap_adapters_reference_axis_conventions(self, rng):
        """The *_vmap adapters keep the reference's axis conventions:
        images component-axis-LAST, fitness traces (t, r)."""
        from localmd_tpu.evaluation import (
            evaluate_fitness_vmap,
            spatial_roughness_stat_vmap,
            temporal_roughness_stat_vmap,
        )

        imgs = rng.standard_normal((9, 8, 3)).astype(np.float32)
        traces = rng.standard_normal((50, 3)).astype(np.float32)
        sp = np.asarray(spatial_roughness_stat_vmap(jnp.asarray(imgs)))
        tp = np.asarray(temporal_roughness_stat_vmap(jnp.asarray(traces.T)))
        dec = np.asarray(
            evaluate_fitness_vmap(jnp.asarray(imgs), jnp.asarray(traces), 1e9, 1e9)
        )
        assert sp.shape == tp.shape == dec.shape == (3,)
        assert (dec == 1).all()

    def test_frame_dataloader_merged_tail(self, rng):
        from localmd_tpu.pmd_loader import FrameDataloader

        movie = rng.standard_normal((10, 4, 3)).astype(np.float32)
        dl = FrameDataloader(movie, 4)
        # reference semantics: final partial chunk merged into the previous
        assert len(dl) == 2
        assert dl[0].shape == (4, 3, 4)
        assert dl[1].shape == (4, 3, 6)
        # IndexError terminates Python's legacy iteration protocol
        with pytest.raises(IndexError):
            dl[2]
        assert [c.shape[2] for c in dl] == [4, 6]
        assert dl[-1].shape == (4, 3, 6)  # torch map-style negative indexing

    def test_submodules_bound_as_package_attributes(self):
        # `import localmd_tpu as localmd; localmd.decomposition...` must work
        # without a separate importlib step (wholesale script migration).
        import localmd_tpu as localmd

        for name in (
            "decomposition", "diagnostic_plots", "evaluation",
            "pmd_loader", "pmdarray", "preprocessing_utils", "dataset",
        ):
            assert hasattr(localmd, name), name
        assert localmd.decomposition.localmd_decomposition is localmd.localmd_decomposition

    def test_pmd_loader_trsvd_folds_s_into_v(self, rng):
        from localmd_tpu.pmd_loader import truncated_random_svd

        mat = rng.standard_normal((50, 30)).astype(np.float32)
        u, v = truncated_random_svd(jnp.asarray(mat), jax.random.PRNGKey(0), 4)
        assert u.shape == (50, 4) and v.shape == (4, 30)
        # U @ V approximates the matrix's best rank-4 approximation
        u_np, s_np, vt_np = np.linalg.svd(mat, full_matrices=False)
        best4 = (u_np[:, :4] * s_np[:4]) @ vt_np[:4]
        approx = np.asarray(u) @ np.asarray(v)
        assert (
            np.linalg.norm(approx - mat) <= np.linalg.norm(best4 - mat) * 1.5
        )


class TestGramSvdShims:
    def test_fewer_rows_svd_routine(self, rng):
        """Reference decomposition.py:1063-1099: SVD via data @ data.T."""
        from localmd_tpu.decomposition import fewer_rows_svd_routine

        mat = rng.standard_normal((6, 40)).astype(np.float32)
        u, s, vt = (np.asarray(x) for x in fewer_rows_svd_routine(jnp.asarray(mat)))
        assert u.shape == (6, 6) and s.shape == (6,) and vt.shape == (6, 40)
        s_np = np.linalg.svd(mat, compute_uv=False)
        np.testing.assert_allclose(s, s_np, rtol=1e-3)
        np.testing.assert_allclose((u * s) @ vt, mat, atol=1e-3)

    def test_fewer_columns_svd_routine(self, rng):
        """Reference decomposition.py:1102-1137: SVD via data.T @ data."""
        from localmd_tpu.decomposition import fewer_columns_svd_routine

        mat = rng.standard_normal((40, 6)).astype(np.float32)
        u, s, vt = (np.asarray(x) for x in fewer_columns_svd_routine(jnp.asarray(mat)))
        assert u.shape == (40, 6) and s.shape == (6,) and vt.shape == (6, 6)
        s_np = np.linalg.svd(mat, compute_uv=False)
        np.testing.assert_allclose(s, s_np, rtol=1e-3)
        np.testing.assert_allclose((u * s) @ vt, mat, atol=1e-3)

    def test_aggregate_local_and_global_decomposition(self, rng):
        """Reference decomposition.py:912-933 semantics at the scipy level."""
        import scipy.sparse

        from localmd_tpu.decomposition import (
            aggregate_local_and_global_decomposition,
        )

        u = scipy.sparse.random(30, 5, density=0.3, format="coo", random_state=1)
        v = rng.standard_normal((5, 20)).astype(np.float32)
        bg_s = rng.standard_normal((30, 2)).astype(np.float32)
        bg_t = rng.standard_normal((2, 20)).astype(np.float32)
        u_net, v_net = aggregate_local_and_global_decomposition(u, v, bg_s, bg_t)
        assert u_net.shape == (30, 7) and v_net.shape == (7, 20)
        np.testing.assert_allclose(
            u_net.toarray() @ v_net,
            u.toarray() @ v + bg_s @ bg_t,
            atol=1e-5,
        )

    def test_v_projection_routine_reference_semantics(self, rng):
        """Reference pmd_loader.py:392-414: flatten-in-order, standardize,
        then P @ (U^T @ X). Checked in both orders against numpy."""
        from localmd_tpu.pmd_loader import v_projection_routine

        d1, d2, t, r, k = 6, 5, 12, 4, 3
        chunk = rng.standard_normal((d1, d2, t)).astype(np.float32)
        ut = rng.standard_normal((r, d1 * d2)).astype(np.float32)
        p = rng.standard_normal((k, r)).astype(np.float32)
        mean_r = rng.standard_normal((d1 * d2, 1)).astype(np.float32)
        std_r = (1 + rng.random((d1 * d2, 1))).astype(np.float32)
        for order in ("F", "C"):
            out = np.asarray(
                v_projection_routine(
                    order, jnp.asarray(p), jnp.asarray(ut), jnp.asarray(chunk),
                    jnp.asarray(mean_r), jnp.asarray(std_r),
                )
            )
            flat = chunk.reshape(d1 * d2, t, order=order)
            expected = p @ (ut @ ((flat - mean_r) / std_r))
            np.testing.assert_allclose(out, expected, atol=1e-4)


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
class TestShimReferenceParity:
    @pytest.fixture(scope="class")
    def ref_dec(self, tmp_path_factory):
        shim = tmp_path_factory.mktemp("refshim2")
        (shim / "tifffile").mkdir()
        (shim / "tifffile" / "__init__.py").write_text(
            "def imread(*a, **k):\n    raise NotImplementedError\n"
            "class TiffFile:\n    def __init__(self, *a, **k):\n"
            "        raise NotImplementedError\n"
        )
        sys.path.insert(0, str(shim))
        sys.path.insert(0, REFERENCE_PATH)
        import localmd.decomposition as ref_dec

        return ref_dec

    def _inject_reference_sketch(self, ref_dec, monkeypatch):
        def ref_trsvd(input_matrix, key, rank_placeholder):
            rank = rank_placeholder.shape[0]
            t = input_matrix.shape[1]
            random_data = fixed_sketch((t, rank + 10))
            projected = jnp.matmul(input_matrix, random_data)
            q, _ = jnp.linalg.qr(projected)
            b = jnp.matmul(q.T, input_matrix)
            u, s, v = jnp.linalg.svd(b, full_matrices=False)
            return q.dot(u)[:, :rank], s[:rank], v[:rank]

        monkeypatch.setattr(ref_dec, "truncated_random_svd", ref_trsvd)
        jax.clear_caches()

    def test_single_block_md_product_parity(self, ref_dec, monkeypatch, rng):
        from localmd_tpu.compat import single_block_md

        block = make_block(rng)
        self._inject_reference_sketch(ref_dec, monkeypatch)
        ur, dr, vr = ref_dec.single_block_md(
            jnp.asarray(block), jax.random.PRNGKey(0), np.zeros(3), 4, 2,
            1e9, 1e9, ref_dec.identity, ref_dec.identity,
        )
        prod_ref = np.asarray(ur).reshape(256, 3, order="F") @ np.asarray(vr)
        with sketch_override(fixed_sketch):
            uo, do, vo = single_block_md(
                jnp.asarray(block), jax.random.PRNGKey(0), np.zeros(3), 4, 2,
                1e9, 1e9,
            )
        prod_ours = np.asarray(uo).reshape(256, 3, order="F") @ np.asarray(vo)
        np.testing.assert_allclose(
            prod_ours, prod_ref, atol=1e-3 * np.abs(prod_ref).max()
        )
        np.testing.assert_array_equal(np.asarray(do), np.asarray(dr).ravel())

    def test_rank_simulation_stats_parity(self, ref_dec, monkeypatch):
        from localmd_tpu.compat import rank_simulation

        self._inject_reference_sketch(ref_dec, monkeypatch)
        k1, k2 = jax.random.PRNGKey(5), jax.random.PRNGKey(6)
        sp_r, tp_r = ref_dec.rank_simulation(14, 12, 90, np.zeros(2), k1, k2)
        with sketch_override(fixed_sketch):
            sp_o, tp_o = rank_simulation(14, 12, 90, np.zeros(2), k1, k2)
        np.testing.assert_allclose(np.asarray(sp_o), np.asarray(sp_r), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(tp_o), np.asarray(tp_r), rtol=1e-4)
