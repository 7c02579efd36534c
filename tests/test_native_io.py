import numpy as np
import pytest

from localmd_tpu.io.native import FastReader, native_available
from localmd_tpu.io.tiff import TiffReader, write_tiff

pytestmark = pytest.mark.skipif(
    not native_available(), reason="fastio C++ library unavailable"
)


class TestFastReader:
    def test_scatter_read(self, tmp_path, rng):
        data = rng.integers(0, 255, size=(10, 64), dtype=np.uint8)
        path = str(tmp_path / "f.bin")
        data.tofile(path)
        reader = FastReader(path, n_threads=3)
        out = np.empty((4, 64), dtype=np.uint8)
        offsets = [0, 128, 256, 576]
        sizes = [64] * 4
        reader.read_scatter(offsets, sizes, out)
        np.testing.assert_array_equal(out[0], data[0])
        np.testing.assert_array_equal(out[1], data[2])
        np.testing.assert_array_equal(out[2], data[4])
        np.testing.assert_array_equal(out[3], data[9])
        reader.close()

    def test_prefetch(self, tmp_path, rng):
        data = rng.integers(0, 65535, size=(20, 32), dtype=np.uint16)
        path = str(tmp_path / "f.bin")
        data.tofile(path)
        reader = FastReader(path)
        out = np.empty((5, 64), dtype=np.uint8)
        offsets = [i * 64 for i in range(5)]
        ticket = reader.prefetch(offsets, [64] * 5, out)
        result = ticket.wait()
        np.testing.assert_array_equal(result.view(np.uint16).reshape(5, 32), data[:5])
        reader.close()

    def test_bad_file(self):
        with pytest.raises(OSError):
            FastReader("/nonexistent/file.bin")

    def test_tiff_uses_native_path(self, tmp_path, rng):
        movie = (rng.random((16, 40, 30)) * 1000).astype(np.uint16)
        path = str(tmp_path / "m.tif")
        write_tiff(path, movie)
        reader = TiffReader(path)
        out = reader.read_frames(list(range(16)))
        np.testing.assert_array_equal(out, movie)
        assert hasattr(reader, "_fast_reader")  # native path was taken

    def test_large_parallel_read_consistency(self, tmp_path, rng):
        t, h, w = 200, 64, 48
        movie = rng.integers(0, 60000, size=(t, h, w), dtype=np.uint16)
        path = str(tmp_path / "big.bin")
        movie.tofile(path)
        frame_bytes = h * w * 2
        reader = FastReader(path, n_threads=8)
        idx = rng.permutation(t)[:77]
        out = np.empty((77, frame_bytes), dtype=np.uint8)
        reader.read_scatter([int(i) * frame_bytes for i in idx], [frame_bytes] * 77, out)
        got = out.view(np.uint16).reshape(77, h, w)
        np.testing.assert_array_equal(got, movie[idx])
        reader.close()
