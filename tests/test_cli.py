"""CLI end-to-end: compress a uint16 TIFF (native reader path), inspect, export."""

import json
import subprocess
import sys

import numpy as np

from localmd_tpu.cli import main as cli_main
from localmd_tpu.io.tiff import write_tiff


class TestCLI:
    def test_compress_info_export_roundtrip(self, tmp_path, rng, capsys):
        # uint16 multipage tiff -> native reader -> pipeline -> npz
        t, d1, d2 = 300, 24, 24
        spatial = rng.random((d1, d2, 3))
        for _ in range(4):
            spatial = 0.2 * (spatial + np.roll(spatial, 1, 0) + np.roll(spatial, -1, 0)
                             + np.roll(spatial, 1, 1) + np.roll(spatial, -1, 1))
        temporal = rng.random((3, t))
        for _ in range(3):
            temporal = 0.5 * temporal + 0.25 * (np.roll(temporal, 1, 1) + np.roll(temporal, -1, 1))
        movie = (np.tensordot(spatial, temporal, axes=(2, 0)) * 2000).transpose(2, 0, 1)
        movie_u16 = movie.astype(np.uint16)
        tif = str(tmp_path / "m.tif")
        write_tiff(tif, movie_u16)

        npz = str(tmp_path / "out.npz")
        cli_main([
            "compress", tif, npz, "--blocks", "12", "12",
            "--frame-range", "300", "--max-components", "5",
            "--background-rank", "1", "--temporal-avg-factor", "4",
            "--seed", "0",
        ])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["rank"] >= 1
        assert out["shape"] == [300, 24, 24]

        cli_main(["info", npz])
        info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert info["fov_shape"] == [24, 24]
        assert info["frames"] == 300

        npy = str(tmp_path / "recon.npy")
        cli_main(["export", npz, npy, "--frames", "0", "20"])
        rec = np.load(npy)
        assert rec.shape == (20, 24, 24)
        # reconstruction close to the uint16 movie
        rel = np.linalg.norm(rec - movie_u16[:20]) / np.linalg.norm(movie_u16[:20])
        assert rel < 0.05, rel
