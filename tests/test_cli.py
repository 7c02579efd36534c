"""CLI end-to-end: compress a uint16 TIFF (native reader path), inspect, export."""

import json
import subprocess
import sys

import numpy as np
import pytest

from localmd_tpu.cli import main as cli_main
from localmd_tpu.io.tiff import write_tiff

# subprocess + full compress runs: quick lane skips this module (pytest -m 'not slow')
pytestmark = pytest.mark.slow


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

    def test_raw_binary_input(self, tmp_path, rng, capsys):
        """Headerless raw binary via --raw-shape/--raw-dtype."""
        t, d1, d2 = 300, 20, 20
        movie = (rng.random((t, d1, d2)) * 3000 + 100).astype(np.uint16)
        raw = str(tmp_path / "m.bin")
        movie.tofile(raw)

        npz = str(tmp_path / "out.npz")
        cli_main([
            "compress", raw, npz, "--raw-shape", "300", "20", "20",
            "--raw-dtype", "uint16", "--blocks", "10", "10",
            "--frame-range", "300", "--max-components", "4",
            "--background-rank", "1", "--temporal-avg-factor", "4",
            "--seed", "0", "--welch-compat", "reference",
        ])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["shape"] == [300, 20, 20]

        cli_main(["info", npz])
        info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert info["frames"] == 300 and info["fov_shape"] == [20, 20]

    def test_checkpoint_resume(self, tmp_path, rng, capsys):
        """--checkpoint: a rerun resumes from the stage files and produces
        the identical factorization."""
        t, d1, d2 = 280, 20, 20
        movie = (rng.random((t, d1, d2)) * 3000).astype(np.uint16)
        raw = str(tmp_path / "m.bin")
        movie.tofile(raw)
        ck = str(tmp_path / "ck")
        args = [
            "compress", raw, str(tmp_path / "a.npz"),
            "--raw-shape", "280", "20", "20", "--blocks", "10", "10",
            "--frame-range", "280", "--max-components", "4",
            "--background-rank", "1", "--temporal-avg-factor", "4",
            "--seed", "0", "--checkpoint", ck,
        ]
        cli_main(args)
        capsys.readouterr()
        import os

        assert os.path.exists(ck + ".v.npz")  # stage files written
        # rerun to a different output: resumes every stage
        args[2] = str(tmp_path / "b.npz")
        cli_main(args)
        out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out2["timings_s"]["block_decomposition"] < 1.0  # resumed, not recomputed
        a = np.load(str(tmp_path / "a.npz"))
        b = np.load(str(tmp_path / "b.npz"))
        np.testing.assert_allclose(b["s"], a["s"], rtol=1e-6)
        np.testing.assert_allclose(b["Vt"], a["Vt"], atol=1e-5)

    def test_error_paths(self, tmp_path, rng, capsys):
        import pytest

        # unknown input format
        bad = str(tmp_path / "movie.xyz")
        with open(bad, "wb") as f:
            f.write(b"not a movie")
        with pytest.raises((ValueError, OSError)):
            cli_main(["compress", bad, str(tmp_path / "o.npz"),
                      "--frame-range", "10"])

        # raw binary whose size contradicts --raw-shape
        short = str(tmp_path / "short.bin")
        np.zeros(100, np.uint16).tofile(short)
        with pytest.raises(ValueError):
            cli_main(["compress", short, str(tmp_path / "o.npz"),
                      "--raw-shape", "300", "20", "20",
                      "--frame-range", "300"])

        # missing required subcommand
        with pytest.raises(SystemExit):
            cli_main([])

        # export of a nonexistent npz
        with pytest.raises(FileNotFoundError):
            cli_main(["export", str(tmp_path / "nope.npz"),
                      str(tmp_path / "r.npy")])

        # --z-planes 0 must error, not silently run non-volumetric
        some = str(tmp_path / "some.bin")
        np.zeros(10 * 20 * 20, np.uint16).tofile(some)
        with pytest.raises(SystemExit):
            cli_main(["compress", some, str(tmp_path / "o.npz"),
                      "--raw-shape", "10", "20", "20", "--z-planes", "0"])

        # --z-planes exceeding the frame count must be a clean CLI error
        # carrying the from_interleaved message, not a raw ValueError
        with pytest.raises(SystemExit, match="fewer than n_planes"):
            cli_main(["compress", some, str(tmp_path / "o.npz"),
                      "--raw-shape", "10", "20", "20", "--z-planes", "11"])

    def test_z_planes_volumetric(self, tmp_path, rng, capsys):
        # plane-interleaved stack: frame t belongs to plane t % 2; each
        # plane carries a DISTINCT smooth low-rank signal so the assertion
        # below proves plane z's npz reconstructs plane z, not plane 0
        t_per, d1, d2 = 280, 20, 20

        def smooth_plane():
            spatial = rng.random((d1, d2, 2))
            for _ in range(4):
                spatial = 0.2 * (
                    spatial + np.roll(spatial, 1, 0) + np.roll(spatial, -1, 0)
                    + np.roll(spatial, 1, 1) + np.roll(spatial, -1, 1)
                )
            temporal = rng.random((2, t_per))
            for _ in range(3):
                temporal = 0.5 * temporal + 0.25 * (
                    np.roll(temporal, 1, 1) + np.roll(temporal, -1, 1)
                )
            m = np.tensordot(spatial, temporal, axes=(2, 0)).transpose(2, 0, 1)
            return (m * 2000).astype(np.uint16)

        planes = [smooth_plane() for _ in range(2)]
        interleaved = np.empty((2 * t_per, d1, d2), np.uint16)
        interleaved[0::2] = planes[0]
        interleaved[1::2] = planes[1]
        raw = str(tmp_path / "stack.bin")
        interleaved.tofile(raw)

        out = str(tmp_path / "vol.npz")
        cli_main([
            "compress", raw, out, "--blocks", "10", "10",
            "--frame-range", "280", "--max-components", "4",
            "--background-rank", "1", "--temporal-avg-factor", "4",
            "--seed", "0", "--z-planes", "2",
            "--raw-shape", str(2 * t_per), str(d1), str(d2),
            "--raw-dtype", "uint16",
        ])
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["n_planes"] == 2
        assert res["shape"] == [t_per, 2, d1, d2]
        assert len(res["outputs"]) == 2
        # each plane npz loads standalone and reconstructs ITS OWN plane
        from localmd_tpu import PMDArray

        for z, path in enumerate(res["outputs"]):
            pmd = PMDArray.from_npz(path)
            assert pmd.shape == (t_per, d1, d2)
            rec = pmd[0:20]
            own = planes[z][0:20].astype(np.float32)
            other = planes[1 - z][0:20].astype(np.float32)
            rel_own = np.linalg.norm(rec - own) / np.linalg.norm(own)
            rel_other = np.linalg.norm(rec - other) / np.linalg.norm(other)
            assert rel_own < 0.2, (z, rel_own)
            assert rel_own < rel_other, (z, rel_own, rel_other)
