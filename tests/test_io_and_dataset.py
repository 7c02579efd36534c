import os
import struct

import numpy as np
import pytest

from localmd_tpu.dataset import NumpyArray, NpyArray, RawBinaryArray, TiffArray, as_dataset
from localmd_tpu.io.tiff import (
    TiffReader,
    _lzw_decode_py,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    write_tiff,
    write_tiff_compressed,
    write_tiff_stream,
)


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

    def test_big_endian_tiff(self, tmp_path, rng):
        """MM-byte-order TIFFs (old Mac / some microscope software) read
        with correct sample values."""
        import struct

        h, w = 13, 9
        frame = (rng.random((h, w)) * 60000).astype(np.uint16)
        path = str(tmp_path / "be.tif")
        tags = [  # (tag, type, count, value)
            (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 16), (259, 3, 1, 1),
            (273, 4, 1, 0), (278, 4, 1, h),
            (279, 4, 1, h * w * 2), (339, 3, 1, 1),
        ]
        ifd_off = 8
        data_off = ifd_off + 2 + len(tags) * 12 + 4
        with open(path, "wb") as f:
            f.write(b"MM\x00\x2a")
            f.write(struct.pack(">I", ifd_off))
            f.write(struct.pack(">H", len(tags)))
            for tag, typ, cnt, val in tags:
                if tag == 273:
                    val = data_off
                f.write(struct.pack(">HHI", tag, typ, cnt))
                if typ == 3:
                    f.write(struct.pack(">HH", val, 0))
                else:
                    f.write(struct.pack(">I", val))
            f.write(struct.pack(">I", 0))  # no next IFD
            f.write(frame.astype(">u2").tobytes())
        reader = TiffReader(path)
        assert reader.dtype.byteorder == ">"
        np.testing.assert_array_equal(
            reader.read_frame(0).astype(np.uint16), frame
        )

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


def _craft_tiff(path, frames, description=None, single_ifd=False,
                compression_id=None):
    """Hand-build a classic little-endian TIFF: per-page IFDs (or a single
    IFD with the remaining frames contiguous after the first — the ImageJ
    hyperstack layout), optional ImageDescription on page 1, optional raw
    compression id override (to exercise unsupported-codec paths)."""
    frames = np.asarray(frames)
    t, h, w = frames.shape
    dt = frames.dtype.newbyteorder("<")
    kind = {"u": 1, "i": 2, "f": 3}[dt.kind]
    desc = (description.encode() + b"\x00") if description else None
    n_pages = 1 if single_ifd else t
    frame_bytes = h * w * dt.itemsize

    entries_per_page = [7 + (1 if (desc and k == 0) else 0) for k in range(n_pages)]
    ifd_sizes = [2 + n * 12 + 4 for n in entries_per_page]
    ifd_offs = [8]
    for s in ifd_sizes[:-1]:
        ifd_offs.append(ifd_offs[-1] + s)
    desc_off = ifd_offs[-1] + ifd_sizes[-1]
    data_start = desc_off + (len(desc) if desc else 0)

    with open(path, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", 8))
        for k in range(n_pages):
            n = entries_per_page[k]
            f.write(struct.pack("<H", n))

            def entry(tag, type_id, count, value):
                f.write(struct.pack("<HHI", tag, type_id, count))
                if type_id == 3:
                    f.write(struct.pack("<HH", value, 0))
                else:
                    f.write(struct.pack("<I", value))

            entry(256, 4, 1, w)
            entry(257, 4, 1, h)
            entry(258, 3, 1, dt.itemsize * 8)
            entry(259, 3, 1, compression_id or 1)
            if desc and k == 0:
                entry(270, 2, len(desc), desc_off)
            entry(273, 4, 1, data_start + k * frame_bytes)
            entry(279, 4, 1, frame_bytes)
            entry(339, 3, 1, kind)
            nxt = ifd_offs[k + 1] if k + 1 < n_pages else 0
            f.write(struct.pack("<I", nxt))
        if desc:
            f.write(desc)
        f.write(np.ascontiguousarray(frames).astype(dt, copy=False).tobytes())


class TestRealWorldTiffFormats:
    """Formats the reference ingests through tifffile (reference
    dataset.py:169-181): ImageJ contiguous hyperstacks, OME-TIFF, zstd/LZMA
    codecs — decoded natively here, with a tifffile fallback when a file is
    outside the native subset."""

    def test_imagej_hyperstack_single_ifd(self, tmp_path, rng):
        # ImageJ big stacks write ONE IFD + 'images=N' + contiguous frames
        movie = (rng.random((12, 9, 7)) * 4000).astype(np.uint16)
        path = str(tmp_path / "ij.tif")
        _craft_tiff(path, movie, single_ifd=True,
                    description="ImageJ=1.54f\nimages=12\nframes=12\nunit=um\n")
        reader = TiffReader(path)
        assert len(reader.pages) == 12
        np.testing.assert_array_equal(reader.read_frames(range(12)), movie)
        reader.close()
        arr = TiffArray(path)
        assert arr.shape == (12, 9, 7)
        np.testing.assert_allclose(arr[[0, 11]], movie[[0, 11]].astype(np.float32))

    def test_imagej_truncated_stack_clamps(self, tmp_path, rng):
        # acquisition died mid-write: images= claims more frames than exist
        movie = (rng.random((6, 5, 4)) * 100).astype(np.uint16)
        path = str(tmp_path / "ij_trunc.tif")
        _craft_tiff(path, movie, single_ifd=True,
                    description="ImageJ=1.54f\nimages=10\n")
        reader = TiffReader(path)
        assert len(reader.pages) == 6  # clamped to what the file holds
        np.testing.assert_array_equal(reader.read_frames(range(6)), movie)
        reader.close()

    def test_ome_tiff_description_tolerated(self, tmp_path, rng):
        # single-file OME-TIFF = multipage TIFF + OME-XML ImageDescription
        movie = (rng.random((4, 8, 6)) * 900).astype(np.uint16)
        ome = ('<?xml version="1.0"?><OME xmlns="http://www.openmicroscopy.org'
               '/Schemas/OME/2016-06"><Image><Pixels SizeT="4" SizeY="8" '
               'SizeX="6" Type="uint16"/></Image></OME>')
        path = str(tmp_path / "ome.tif")
        _craft_tiff(path, movie, description=ome)
        reader = TiffReader(path)
        assert len(reader.pages) == 4  # OME description must NOT trigger
        assert reader.description.startswith("<?xml")  # hyperstack synthesis
        np.testing.assert_array_equal(reader.read_frames(range(4)), movie)
        reader.close()

    @pytest.mark.parametrize("codec", ["zstd", "lzma"])
    def test_zstd_lzma_roundtrip(self, tmp_path, rng, codec):
        movie = (rng.random((5, 21, 17)) * 3000).astype(np.uint16)
        path = str(tmp_path / f"{codec}.tif")
        write_tiff_compressed(path, movie, compression=codec)
        reader = TiffReader(path)
        np.testing.assert_array_equal(reader.read_frames(range(5)), movie)
        reader.close()

    def test_unsupported_codec_without_tifffile_names_fallback(self, tmp_path, rng, monkeypatch):
        import builtins
        import sys

        movie = np.zeros((2, 4, 4), np.uint16)
        path = str(tmp_path / "jpeg.tif")
        _craft_tiff(path, movie, compression_id=7)  # JPEG: unsupported
        monkeypatch.setitem(sys.modules, "tifffile", None)
        real_import = builtins.__import__

        def no_tifffile(name, *a, **k):
            if name == "tifffile":
                raise ImportError("No module named 'tifffile'")
            return real_import(name, *a, **k)

        monkeypatch.setattr(builtins, "__import__", no_tifffile)
        with pytest.raises(ValueError, match="tifffile"):
            TiffArray(path)

    def test_tifffile_fallback_used_when_available(self, tmp_path, rng, monkeypatch):
        import sys
        import types

        movie = (rng.random((3, 6, 5)) * 100).astype(np.uint16)
        path = str(tmp_path / "exotic.tif")
        _craft_tiff(path, movie, compression_id=7)  # native parser rejects

        # fake tifffile that serves the known movie
        fake = types.ModuleType("tifffile")

        class _FakePage:
            shape = movie.shape[1:]
            dtype = movie.dtype

        class _FakeTiffFile:
            def __init__(self, fn):
                self.pages = [_FakePage()] * movie.shape[0]

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        fake.TiffFile = _FakeTiffFile
        fake.imread = lambda fn, key=None: movie[list(key)]
        monkeypatch.setitem(sys.modules, "tifffile", fake)

        with pytest.warns(UserWarning, match="falling back to tifffile"):
            arr = TiffArray(path)
        assert arr.shape == (3, 6, 5)
        np.testing.assert_allclose(arr[[0, 2]], movie[[0, 2]].astype(np.float32))


class TestBigTiffWriter:
    """write_tiff_stream auto-switches to BigTIFF (version 43, 8-byte
    offsets) past 4 GB; classic offsets would silently overflow (a
    512x512x30k f32 export is 31 GB)."""

    def test_forced_bigtiff_roundtrip(self, tmp_path, rng):
        movie = (rng.random((7, 33, 29)) * 1000).astype(np.uint16)
        path = str(tmp_path / "bt.tif")
        write_tiff_stream(path, iter(movie), movie.shape, movie.dtype,
                          bigtiff=True)
        reader = TiffReader(path)
        assert reader._big
        np.testing.assert_array_equal(reader.read_frames(range(7)), movie)
        reader.close()

    def test_forced_bigtiff_multistrip_roundtrip(self, tmp_path, rng):
        movie = (rng.random((5, 33, 21)) * 1000).astype(np.uint16)
        path = str(tmp_path / "btms.tif")
        write_tiff_stream(path, iter(movie), movie.shape, movie.dtype,
                          rows_per_strip=8, bigtiff=True)
        reader = TiffReader(path)
        assert reader._big and len(reader.pages[0].strip_offsets) == 5
        np.testing.assert_array_equal(reader.read_frames(range(5)), movie)
        reader.close()

    def test_small_files_stay_classic(self, tmp_path, rng):
        movie = (rng.random((4, 16, 10)) * 100).astype(np.uint16)
        path = str(tmp_path / "c.tif")
        write_tiff_stream(path, iter(movie), movie.shape, movie.dtype)
        with open(path, "rb") as f:
            assert f.read(4) == b"II*\x00"

    def test_auto_selects_bigtiff_for_huge_layout(self, tmp_path):
        # the format decision happens before any frame is consumed, so the
        # BigTIFF header can be checked without writing 31 GB: an empty
        # iterator fails the frame-count check AFTER the IFDs are emitted
        path = str(tmp_path / "huge.tif")
        with pytest.raises(ValueError, match="yielded 0 frames"):
            write_tiff_stream(path, iter([]), (30000, 512, 512), np.float32)
        with open(path, "rb") as f:
            assert f.read(4) == b"II+\x00"  # BigTIFF magic

    def test_forcing_classic_on_huge_layout_raises(self, tmp_path):
        with pytest.raises(ValueError, match="classic TIFF cannot address"):
            write_tiff_stream(str(tmp_path / "x.tif"), iter([]),
                              (30000, 512, 512), np.float32, bigtiff=False)

    @pytest.mark.slow
    def test_real_4gb_export_reads_back(self, tmp_path):
        # an actual >4 GB file: the tail page's strip offset exceeds 2^32
        # and the native reader decodes it (offset-math end-to-end)
        t, h, w = 4400, 1024, 512  # 4.6 GB of uint16 payload
        base = (np.arange(h * w, dtype=np.uint32).reshape(h, w)
                % 50000).astype(np.uint16)

        def gen():
            for k in range(t):
                yield base + (k % 1000)

        path = str(tmp_path / "big.tif")
        write_tiff_stream(path, gen(), (t, h, w), np.uint16)
        assert os.path.getsize(path) > (1 << 32)
        reader = TiffReader(path)
        assert reader._big
        assert reader.pages[-1].strip_offsets[0] > 0xFFFFFFFF
        np.testing.assert_array_equal(
            reader.read_frames([0, t // 2, t - 1]),
            np.stack([base + (i % 1000) for i in (0, t // 2, t - 1)]),
        )
        reader.close()
        os.remove(path)


class TestCompressedTiff:
    """Compressed / tiled TIFF reading — the reference reads any
    tifffile-readable movie (reference dataset.py:169-181); scanners commonly
    emit LZW or Deflate multipage stacks."""

    @pytest.mark.slow
    def test_lzw_codec_roundtrip(self, rng):
        for data in [
            b"",
            b"A",
            b"TOBEORNOTTOBEORTOBEORNOT",
            rng.integers(0, 256, 70000).astype(np.uint8).tobytes(),
            # low-entropy stream: the code table passes the 511/1023/2047
            # width boundaries and triggers a mid-stream Clear
            rng.integers(0, 4, 300000).astype(np.uint8).tobytes(),
        ]:
            enc = _lzw_encode(data)
            assert _lzw_decode_py(enc, len(data)) == data
            try:
                from localmd_tpu.io.native import lzw_decode

                dec = lzw_decode(enc, len(data))
                if dec is not None:
                    assert dec == data
            except ImportError:
                pass

    def test_packbits_codec_roundtrip(self, rng):
        for data in [b"", b"x" * 500, rng.integers(0, 3, 4000).astype(np.uint8).tobytes()]:
            assert _packbits_decode(_packbits_encode(data), len(data)) == data

    @pytest.mark.parametrize(
        "compression,predictor",
        [("lzw", 1), ("lzw", 2), ("deflate", 1), ("deflate", 2), ("packbits", 1)],
    )
    def test_compressed_roundtrip(self, tmp_path, rng, compression, predictor):
        movie = (rng.random((4, 35, 22)) * 3000).astype(np.uint16)
        path = str(tmp_path / "c.tif")
        write_tiff_compressed(
            path, movie, compression=compression, rows_per_strip=12, predictor=predictor
        )
        reader = TiffReader(path)
        assert reader.pages[0].compression != 1
        np.testing.assert_array_equal(reader.read_frames(range(4)), movie)
        arr = TiffArray(path)
        np.testing.assert_allclose(arr[[1, 2]], movie[[1, 2]].astype(np.float32))

    def test_uncompressed_predictor_roundtrip(self, tmp_path, rng):
        """Compression=1 + Predictor=2 pages must take the decode path (the
        mmap fast path would return row-difference values as pixels)."""
        movie = (rng.random((3, 20, 17)) * 3000).astype(np.uint16)
        path = str(tmp_path / "p.tif")
        write_tiff_compressed(path, movie, compression="none", predictor=2)
        reader = TiffReader(path)
        assert not reader.pages[0].is_plain
        np.testing.assert_array_equal(reader.read_frames(range(3)), movie)

    def test_overlong_lzw_strip_falls_back(self, rng):
        """A strip that decodes to MORE bytes than expected (writer padding /
        trailing data before EOI) must truncate like libtiff, even when the
        strict native decoder rejects it."""
        from localmd_tpu.io.tiff import _lzw_decode

        data = rng.integers(0, 5, 4000).astype(np.uint8).tobytes()
        enc = _lzw_encode(data + b"\x01\x02\x03\x04")  # 4 trailing pad bytes
        assert _lzw_decode(enc, len(data)) == data

    def test_tiled_roundtrip(self, tmp_path, rng):
        movie = (rng.random((3, 70, 55)) * 3000).astype(np.uint16)  # ragged tiles
        path = str(tmp_path / "t.tif")
        write_tiff_compressed(path, movie, compression="deflate", tile=(32, 16), predictor=2)
        reader = TiffReader(path)
        assert reader.pages[0].tile_width == 32
        np.testing.assert_array_equal(reader.read_frames(range(3)), movie)

    def test_pil_cross_producer(self, tmp_path, rng):
        """Streams produced by an independent implementation (Pillow) must
        decode bit-exactly, and PIL must read our compressed output."""
        pil = pytest.importorskip("PIL.Image")
        movie = (rng.random((2, 48, 40)) * 60000).astype(np.uint16)
        for comp in ["tiff_lzw", "tiff_adobe_deflate", "packbits"]:
            path = str(tmp_path / f"pil_{comp}.tif")
            frames = [pil.fromarray(f) for f in movie]
            frames[0].save(
                path, format="TIFF", compression=comp,
                save_all=True, append_images=frames[1:],
            )
            reader = TiffReader(path)
            np.testing.assert_array_equal(reader.read_frames(range(2)), movie)
        ours = str(tmp_path / "ours.tif")
        write_tiff_compressed(ours, movie, compression="lzw", predictor=2)
        img = pil.open(ours)
        back = []
        for i in range(2):
            img.seek(i)
            back.append(np.array(img))
        np.testing.assert_array_equal(np.stack(back), movie)

    def test_corrupt_tiff_raises_not_crashes(self, tmp_path, rng):
        """Random byte corruption of headers/IFDs must surface as ValueError
        or numpy errors, never a hang or interpreter crash."""
        movie = (rng.random((3, 24, 20)) * 1000).astype(np.uint16)
        clean = str(tmp_path / "clean.tif")
        write_tiff_compressed(clean, movie, compression="lzw", rows_per_strip=8)
        blob = bytearray(open(clean, "rb").read())
        for trial in range(60):
            corrupted = bytearray(blob)
            # corrupt up to 4 bytes anywhere in the first 2KB (headers/IFDs)
            for _ in range(int(rng.integers(1, 5))):
                pos = int(rng.integers(0, min(2048, len(corrupted))))
                corrupted[pos] = int(rng.integers(0, 256))
            path = str(tmp_path / f"bad{trial}.tif")
            open(path, "wb").write(bytes(corrupted))
            try:
                r = TiffReader(path)
                for i in range(len(r)):
                    r.read_frame(i)
            except (ValueError, IndexError, KeyError, OverflowError,
                    MemoryError, struct.error, EOFError, OSError):
                pass

    def test_unsupported_compression_raises(self, tmp_path, rng):
        movie = (rng.random((1, 16, 16)) * 100).astype(np.uint16)
        path = str(tmp_path / "u.tif")
        write_tiff(path, movie)
        # patch the compression tag to JPEG (7): first IFD entry table
        import struct

        with open(path, "r+b") as f:
            data = bytearray(f.read())
            # find the compression entry (tag 259) in the first IFD
            ifd = struct.unpack("<I", bytes(data[4:8]))[0]
            n = struct.unpack("<H", bytes(data[ifd : ifd + 2]))[0]
            for i in range(n):
                off = ifd + 2 + i * 12
                tag = struct.unpack("<H", bytes(data[off : off + 2]))[0]
                if tag == 259:
                    data[off + 8 : off + 10] = struct.pack("<H", 7)
            f.seek(0)
            f.write(bytes(data))
        with pytest.raises(ValueError, match="compression 7"):
            TiffReader(path)


class TestPlaneView:
    """Lazy deinterleaving of plane-cycling acquisitions (frame t -> plane
    t % Z), feeding volumetric decomposition without copying the movie."""

    def test_deinterleave_matches_numpy_striding(self, rng):
        from localmd_tpu.dataset import PlaneView, ZStackArray

        t_total, d1, d2, z_n = 23, 6, 5, 3  # deliberately not divisible
        movie = rng.standard_normal((t_total, d1, d2)).astype(np.float32)
        stack = ZStackArray.from_interleaved(movie, z_n)
        assert stack.n_planes == z_n
        for z in range(z_n):
            # ragged tail truncated to the common T // Z length
            expect = movie[z::z_n][: t_total // z_n]
            view = stack.planes[z]
            assert view.shape == expect.shape
            np.testing.assert_array_equal(view[0:4], expect[0:4])
            np.testing.assert_array_equal(view[[0, 2]], expect[[0, 2]])
            np.testing.assert_array_equal(
                np.asarray(view[1]), expect[1]
            )
            # spatial post-indexing via the PMDDataset protocol
            np.testing.assert_array_equal(
                view[0:3, 1:4, 2], expect[0:3, 1:4, 2]
            )

    def test_raw_dtype_passthrough_and_bounds(self, tmp_path, rng):
        from localmd_tpu.dataset import PlaneView, RawBinaryArray

        movie = (rng.random((20, 4, 4)) * 1000).astype(np.uint16)
        path = str(tmp_path / "m.bin")
        movie.tofile(path)
        src = RawBinaryArray(path, (20, 4, 4), dtype="uint16")
        view = PlaneView(src, 1, 2)
        assert view.shape == (10, 4, 4)
        if hasattr(src, "raw_dtype"):
            assert view.raw_dtype == src.raw_dtype
        np.testing.assert_array_equal(view[0:10], movie[1::2].astype(view.dtype))
        with pytest.raises(ValueError):
            PlaneView(src, 2, 2)

    def test_negative_and_oob_indices_stay_on_plane(self, rng):
        """Negative indices wrap against the VIEW length (with a ragged tail,
        wrapping against the source length would cross onto another plane);
        indices past the declared extent raise instead of silently reading
        the truncated tail."""
        from localmd_tpu.dataset import ZStackArray

        t_total, z_n = 23, 3
        movie = rng.standard_normal((t_total, 4, 4)).astype(np.float32)
        stack = ZStackArray.from_interleaved(movie, z_n)
        n = t_total // z_n  # 7
        for z in range(z_n):
            view = stack.planes[z]
            expect = movie[z::z_n][:n]
            np.testing.assert_array_equal(np.asarray(view[-1]), expect[-1])
            np.testing.assert_array_equal(view[[0, -1]], expect[[0, -1]])
            with pytest.raises(IndexError):
                view[n]
            with pytest.raises(IndexError):
                view[[0, n]]
            with pytest.raises(IndexError):
                view[-n - 1]

    def test_from_interleaved_validates_n_planes(self, rng):
        from localmd_tpu.dataset import ZStackArray

        movie = rng.standard_normal((5, 4, 4)).astype(np.float32)
        with pytest.raises(ValueError):
            ZStackArray.from_interleaved(movie, 0)
        with pytest.raises(ValueError):
            ZStackArray.from_interleaved(movie, -2)
        with pytest.raises(ValueError):
            ZStackArray.from_interleaved(movie, 8)  # more planes than frames

    def test_from_interleaved_shares_one_source(self, tmp_path, rng):
        """A path input is opened/parsed once; every plane shares the reader."""
        from localmd_tpu.dataset import ZStackArray
        from localmd_tpu.io.tiff import write_tiff

        movie = (rng.random((12, 6, 6)) * 1000).astype(np.uint16)
        path = str(tmp_path / "inter.tif")
        write_tiff(path, movie)
        stack = ZStackArray.from_interleaved(path, 3)
        srcs = {id(p._source) for p in stack.planes}
        assert len(srcs) == 1
        np.testing.assert_array_equal(
            stack.planes[1][0:4], movie[1::3][:4].astype(stack.planes[1].dtype)
        )

    def test_from_interleaved_device_source_stays_on_device(self, rng):
        """A jax.Array source deinterleaves into DeviceMovie planes (strided
        device slices) — no D2H pull, loader keeps the zero-transfer path."""
        import jax.numpy as jnp

        from localmd_tpu.dataset import DeviceMovie, ZStackArray

        movie = jnp.asarray(rng.standard_normal((10, 4, 4)).astype(np.float32))
        stack = ZStackArray.from_interleaved(movie, 2)
        for z, plane in enumerate(stack.planes):
            assert isinstance(plane, DeviceMovie)
            np.testing.assert_array_equal(
                np.asarray(plane[0:5]), np.asarray(movie)[z::2]
            )

    @pytest.mark.slow
    def test_plane_view_drives_pipeline(self, rng):
        from localmd_tpu.dataset import ZStackArray
        from localmd_tpu.volumetric import volumetric_decomposition

        t_per, z_n = 280, 2
        planes = [
            (rng.standard_normal((t_per, 20, 20)) + 3).astype(np.float32)
            for _ in range(z_n)
        ]
        inter = np.stack(planes, axis=1).reshape(t_per * z_n, 20, 20)
        vol = volumetric_decomposition(
            ZStackArray.from_interleaved(inter, z_n), (10, 10),
            frame_range=t_per, max_components=3, background_rank=1,
            temporal_avg_factor=4, sim_iters=10, seed=0,
        )
        assert vol.shape == (t_per, z_n, 20, 20)
