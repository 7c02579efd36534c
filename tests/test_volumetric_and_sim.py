import numpy as np
import pytest

from localmd_tpu.sim import (
    two_photon_movie,
    voltage_movie,
    volumetric_stack,
    widefield_movie,
)
from localmd_tpu.volumetric import VolumetricPMD, volumetric_decomposition


class TestSim:
    def test_two_photon_shapes_and_stats(self):
        m = np.asarray(two_photon_movie(32, 28, 400, n_cells=5, seed=1))
        assert m.shape == (400, 32, 28)
        assert m.mean() > 90  # camera offset present
        # temporal variance concentrated at cells, noise floor elsewhere
        v = m.var(axis=0)
        assert v.max() > 3 * np.median(v)

    def test_widefield_movie(self):
        m = np.asarray(widefield_movie(48, 48, 300, n_sources=4, seed=2))
        assert m.shape == (300, 48, 48)

    def test_voltage_movie(self):
        m = np.asarray(voltage_movie(24, 24, 600, n_cells=4, seed=3))
        assert m.shape == (600, 24, 24)

    def test_volumetric_stack(self):
        planes = volumetric_stack(n_planes=2, d1=24, d2=24, t=300)
        assert len(planes) == 2
        assert planes[0].shape == (300, 24, 24)


class TestVolumetric:
    def test_per_plane_decomposition(self):
        planes = volumetric_stack(n_planes=2, d1=24, d2=24, t=300, seed=5)
        vol = volumetric_decomposition(
            planes, (12, 12), frame_range=300, max_components=6,
            background_rank=1, temporal_avg_factor=4, sim_iters=20, seed=0,
        )
        assert vol.shape == (300, 2, 24, 24)
        assert vol.ndim == 4
        # per-plane reconstruction quality against the raw movie
        for z in range(2):
            raw = np.asarray(planes[z])
            rec = vol.planes[z][:, :, :]
            rel = np.linalg.norm(rec - raw) / np.linalg.norm(raw)
            assert rel < 0.5, rel  # denoised: below 1.0 by a margin

    def test_four_d_indexing(self):
        planes = volumetric_stack(n_planes=2, d1=20, d2=20, t=280, seed=6)
        vol = volumetric_decomposition(
            planes, (10, 10), frame_range=280, max_components=4,
            background_rank=1, temporal_avg_factor=4, sim_iters=15, seed=0,
        )
        one = vol[5]
        assert one.shape == (2, 20, 20)
        sub = vol[0:4, 0]
        assert sub.shape == (4, 20, 20)

    def test_save(self, tmp_path):
        planes = volumetric_stack(n_planes=2, d1=20, d2=20, t=280, seed=7)
        vol = volumetric_decomposition(
            planes, (10, 10), frame_range=280, max_components=4,
            background_rank=1, temporal_avg_factor=4, sim_iters=15, seed=0,
        )
        paths = vol.save(str(tmp_path / "vol"))
        assert len(paths) == 2
        import os

        assert all(os.path.exists(p) for p in paths)
