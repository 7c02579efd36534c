import numpy as np
import pytest

from localmd_tpu.dataset import NumpyArray, NpyArray, RawBinaryArray, TiffArray, as_dataset
from localmd_tpu.io.tiff import TiffReader, write_tiff


class TestTiff:
    def test_roundtrip_uint16(self, tmp_path, rng):
        movie = (rng.random((7, 33, 21)) * 1000).astype(np.uint16)
        path = str(tmp_path / "m.tif")
        write_tiff(path, movie)
        reader = TiffReader(path)
        assert len(reader) == 7
        assert reader.frame_shape == (33, 21)
        np.testing.assert_array_equal(reader.read_frame(3), movie[3])
        np.testing.assert_array_equal(reader.read_frames([0, 2, 6]), movie[[0, 2, 6]])

    def test_roundtrip_float32(self, tmp_path, rng):
        movie = rng.standard_normal((4, 16, 16)).astype(np.float32)
        path = str(tmp_path / "m.tif")
        write_tiff(path, movie)
        reader = TiffReader(path)
        np.testing.assert_allclose(reader.read_frames(range(4)), movie)

    def test_tiff_array(self, tmp_path, rng):
        movie = (rng.random((5, 12, 18)) * 100).astype(np.int16)
        path = str(tmp_path / "m.tif")
        write_tiff(path, movie)
        arr = TiffArray(path)
        assert arr.shape == (5, 12, 18)
        assert arr.dtype == np.float32
        np.testing.assert_allclose(arr[[1, 3]], movie[[1, 3]].astype(np.float32))


class TestDatasetProtocol:
    def test_numpy_array_indexing(self, rng):
        movie = rng.standard_normal((10, 8, 6)).astype(np.float32)
        ds = NumpyArray(movie)
        assert ds.shape == (10, 8, 6)
        assert ds.ndim == 3
        np.testing.assert_array_equal(ds[3], movie[3])
        np.testing.assert_array_equal(ds[[1, 4]], movie[[1, 4]])
        np.testing.assert_array_equal(ds[2:5], movie[2:5])
        np.testing.assert_array_equal(ds[2:5, 0:4, 1:3], movie[2:5, 0:4, 1:3])

    def test_out_of_bounds(self, rng):
        ds = NumpyArray(rng.standard_normal((5, 4, 4)))
        with pytest.raises(IndexError):
            ds[slice(0, 10)]
        with pytest.raises(IndexError):
            ds[0, 0, 0, 0]

    def test_as_dataset_ndarray(self, rng):
        movie = rng.standard_normal((5, 4, 4))
        ds = as_dataset(movie)
        np.testing.assert_array_equal(ds[1], movie[1])

    def test_raw_binary(self, tmp_path, rng):
        movie = (rng.random((6, 9, 7)) * 500).astype(np.uint16)
        path = str(tmp_path / "m.bin")
        movie.tofile(path)
        ds = RawBinaryArray(path, (6, 9, 7), dtype="uint16")
        np.testing.assert_array_equal(ds[[0, 5]], movie[[0, 5]])

    def test_npy(self, tmp_path, rng):
        movie = rng.standard_normal((6, 9, 7)).astype(np.float32)
        path = str(tmp_path / "m.npy")
        np.save(path, movie)
        ds = NpyArray(path)
        np.testing.assert_array_equal(ds[2:4], movie[2:4])


class TestMultiStripTiff:
    def test_multistrip_roundtrip(self, tmp_path, rng):
        movie = (rng.random((5, 33, 21)) * 1000).astype(np.uint16)
        path = str(tmp_path / "ms.tif")
        write_tiff(path, movie, rows_per_strip=8)  # 5 strips per page
        reader = TiffReader(path)
        assert len(reader.pages[0].strip_offsets) == 5
        np.testing.assert_array_equal(reader.read_frames(range(5)), movie)

    def test_multistrip_via_tiff_array(self, tmp_path, rng):
        movie = (rng.random((4, 16, 10)) * 100).astype(np.uint16)
        path = str(tmp_path / "ms2.tif")
        write_tiff(path, movie, rows_per_strip=7)
        arr = TiffArray(path)
        np.testing.assert_allclose(arr[[0, 3]], movie[[0, 3]].astype(np.float32))
