"""Minimal multipage TIFF / BigTIFF reader.

The reference reads movies with ``tifffile`` (reference dataset.py:131-181).
``tifffile`` is not available in this environment, and for the streaming PMD
pipeline we only need fast random access to *uncompressed* (or simple)
multipage grayscale stacks — the dominant format for two-photon / widefield /
voltage-imaging movies. This module implements that subset natively:

- Classic TIFF and BigTIFF, little- and big-endian.
- Per-page strip layout (StripOffsets/StripByteCounts), contiguous planar
  grayscale pages.
- dtypes: uint8/16/32, int8/16/32, float32/float64 (SampleFormat tag).
- Compression: none (1). Compressed files raise a clear error.

Pages are indexed once at open; frame reads are ``np.frombuffer`` slices over
a single ``mmap``-backed buffer, so multi-worker prefetch threads can read
without re-parsing headers.
"""

from __future__ import annotations

import mmap
import os
import struct
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

# TIFF tag ids we care about
_TAG_IMAGE_WIDTH = 256
_TAG_IMAGE_LENGTH = 257
_TAG_BITS_PER_SAMPLE = 258
_TAG_COMPRESSION = 259
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_BYTE_COUNTS = 279
_TAG_SAMPLE_FORMAT = 339
_TAG_TILE_WIDTH = 322

# TIFF type id -> (struct fmt char, byte size)
_TYPE_INFO = {
    1: ("B", 1),   # BYTE
    2: ("c", 1),   # ASCII
    3: ("H", 2),   # SHORT
    4: ("I", 4),   # LONG
    5: ("II", 8),  # RATIONAL
    6: ("b", 1),   # SBYTE
    8: ("h", 2),   # SSHORT
    9: ("i", 4),   # SLONG
    11: ("f", 4),  # FLOAT
    12: ("d", 8),  # DOUBLE
    16: ("Q", 8),  # LONG8 (BigTIFF)
    17: ("q", 8),  # SLONG8
}


@dataclass
class _Page:
    width: int
    height: int
    dtype: np.dtype
    strip_offsets: Tuple[int, ...]
    strip_byte_counts: Tuple[int, ...]


class TiffReader:
    """Index a multipage TIFF once; expose zero-copy frame reads."""

    def __init__(self, filename: str):
        self.filename = filename
        self._file = open(filename, "rb")
        try:
            self._buf = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        except (ValueError, OSError):
            # Empty or unmappable file: read fully.
            self._file.seek(0)
            self._buf = self._file.read()
        self._parse_header()
        self.pages: List[_Page] = self._parse_all_pages()
        if not self.pages:
            raise ValueError(f"{filename}: no TIFF pages found")
        p0 = self.pages[0]
        self.frame_shape = (p0.height, p0.width)
        self.dtype = p0.dtype

    # -- header / IFD parsing -------------------------------------------------

    def _parse_header(self):
        magic = bytes(self._buf[:2])
        if magic == b"II":
            self._bo = "<"
        elif magic == b"MM":
            self._bo = ">"
        else:
            raise ValueError(f"{self.filename}: not a TIFF file")
        version = struct.unpack(self._bo + "H", self._buf[2:4])[0]
        if version == 42:
            self._big = False
            self._first_ifd = struct.unpack(self._bo + "I", self._buf[4:8])[0]
        elif version == 43:
            self._big = True
            offsize = struct.unpack(self._bo + "H", self._buf[4:6])[0]
            if offsize != 8:
                raise ValueError("Unsupported BigTIFF offset size")
            self._first_ifd = struct.unpack(self._bo + "Q", self._buf[8:16])[0]
        else:
            raise ValueError(f"{self.filename}: bad TIFF version {version}")

    def _read_entry_values(self, type_id, count, payload):
        fmt, size = _TYPE_INFO.get(type_id, (None, None))
        if fmt is None:
            return None
        total = size * count
        inline_cap = 8 if self._big else 4
        if total <= inline_cap:
            data = payload[:total]
        else:
            off = struct.unpack(self._bo + ("Q" if self._big else "I"),
                                payload[: (8 if self._big else 4)])[0]
            data = bytes(self._buf[off: off + total])
        if type_id == 5:  # RATIONAL -> float
            vals = struct.unpack(self._bo + "I" * 2 * count, data)
            return tuple(vals[i] / max(vals[i + 1], 1) for i in range(0, 2 * count, 2))
        return struct.unpack(self._bo + fmt * count, data)

    def _parse_ifd(self, offset):
        bo = self._bo
        if self._big:
            n = struct.unpack(bo + "Q", self._buf[offset: offset + 8])[0]
            entry_size, base = 20, offset + 8
        else:
            n = struct.unpack(bo + "H", self._buf[offset: offset + 2])[0]
            entry_size, base = 12, offset + 2
        tags = {}
        for i in range(n):
            e = self._buf[base + i * entry_size: base + (i + 1) * entry_size]
            tag, type_id = struct.unpack(bo + "HH", e[:4])
            if self._big:
                count = struct.unpack(bo + "Q", e[4:12])[0]
                payload = e[12:20]
            else:
                count = struct.unpack(bo + "I", e[4:8])[0]
                payload = e[8:12]
            if tag in (
                _TAG_IMAGE_WIDTH, _TAG_IMAGE_LENGTH, _TAG_BITS_PER_SAMPLE,
                _TAG_COMPRESSION, _TAG_STRIP_OFFSETS, _TAG_SAMPLES_PER_PIXEL,
                _TAG_ROWS_PER_STRIP, _TAG_STRIP_BYTE_COUNTS, _TAG_SAMPLE_FORMAT,
                _TAG_TILE_WIDTH,
            ):
                tags[tag] = self._read_entry_values(type_id, count, bytes(payload))
        next_off_pos = base + n * entry_size
        next_ifd = struct.unpack(
            bo + ("Q" if self._big else "I"),
            self._buf[next_off_pos: next_off_pos + (8 if self._big else 4)],
        )[0]
        return tags, next_ifd

    def _page_from_tags(self, tags) -> _Page:
        if _TAG_TILE_WIDTH in tags:
            raise ValueError(f"{self.filename}: tiled TIFFs are not supported")
        comp = tags.get(_TAG_COMPRESSION, (1,))[0]
        if comp != 1:
            raise ValueError(
                f"{self.filename}: compressed TIFF (compression={comp}) not supported; "
                "convert to uncompressed or use a RawBinaryArray/NpyArray source"
            )
        spp = tags.get(_TAG_SAMPLES_PER_PIXEL, (1,))[0]
        if spp != 1:
            raise ValueError(f"{self.filename}: only single-sample (grayscale) TIFFs supported")
        width = tags[_TAG_IMAGE_WIDTH][0]
        height = tags[_TAG_IMAGE_LENGTH][0]
        bits = tags.get(_TAG_BITS_PER_SAMPLE, (1,))[0]
        fmt = tags.get(_TAG_SAMPLE_FORMAT, (1,))[0]
        kind = {1: "u", 2: "i", 3: "f"}.get(fmt)
        if kind is None:
            raise ValueError(f"{self.filename}: unsupported SampleFormat {fmt}")
        dtype = np.dtype(f"{self._bo}{kind}{bits // 8}")
        return _Page(
            width=width,
            height=height,
            dtype=dtype,
            strip_offsets=tuple(tags[_TAG_STRIP_OFFSETS]),
            strip_byte_counts=tuple(tags[_TAG_STRIP_BYTE_COUNTS]),
        )

    def _parse_all_pages(self) -> List[_Page]:
        pages = []
        offset = self._first_ifd
        seen = set()
        while offset and offset not in seen:
            seen.add(offset)
            tags, offset = self._parse_ifd(offset)
            if _TAG_IMAGE_WIDTH in tags:
                pages.append(self._page_from_tags(tags))
        return pages

    # -- frame access ----------------------------------------------------------

    def __len__(self):
        return len(self.pages)

    def read_frame(self, index: int) -> np.ndarray:
        page = self.pages[index]
        n_px = page.width * page.height
        if len(page.strip_offsets) == 1:
            off = page.strip_offsets[0]
            arr = np.frombuffer(self._buf, dtype=page.dtype, count=n_px, offset=off)
        else:
            parts = [
                np.frombuffer(self._buf, dtype=np.uint8, count=cnt, offset=off)
                for off, cnt in zip(page.strip_offsets, page.strip_byte_counts)
            ]
            arr = np.concatenate(parts).view(page.dtype)[:n_px]
        return arr.reshape(page.height, page.width)

    def read_frames(self, indices: Sequence[int]) -> np.ndarray:
        out = np.empty((len(indices),) + self.frame_shape, dtype=self.dtype)
        if self._try_native_read(indices, out):
            return out
        for i, idx in enumerate(indices):
            out[i] = self.read_frame(idx)
        return out

    def _try_native_read(self, indices: Sequence[int], out: np.ndarray) -> bool:
        """Threaded scatter read of single-strip pages via the fastio C++
        library; returns False to fall back to the mmap path."""
        if any(len(self.pages[i].strip_offsets) != 1 for i in indices):
            return False
        try:
            from localmd_tpu.io.native import native_available, FastReader

            if not native_available():
                return False
            if not hasattr(self, "_fast_reader"):
                self._fast_reader = FastReader(self.filename)
            offsets = [self.pages[i].strip_offsets[0] for i in indices]
            sizes = [self.pages[i].strip_byte_counts[0] for i in indices]
            self._fast_reader.read_scatter(offsets, sizes, out)
            return True
        except Exception:
            return False

    def close(self):
        if isinstance(self._buf, mmap.mmap):
            self._buf.close()
        self._file.close()


def write_tiff(filename: str, movie: np.ndarray, rows_per_strip: int = 0) -> None:
    """Write a (T, H, W) array as an uncompressed little-endian multipage TIFF.

    Used for tests and for generating benchmark inputs. ``rows_per_strip``
     0/>=H emits one strip per page (what :class:`TiffReader`'s fast native
    path reads); smaller values emit multi-strip pages (exercising the
    reader's strip-concatenation path, as scanners/writers in the wild do).
    """
    movie = np.asarray(movie)
    if movie.ndim != 3:
        raise ValueError("movie must be (T, H, W)")
    t, h, w = movie.shape
    dt = movie.dtype.newbyteorder("<")
    kind = {"u": 1, "i": 2, "f": 3}[dt.kind]
    bits = dt.itemsize * 8
    rps = h if rows_per_strip in (0, None) or rows_per_strip >= h else rows_per_strip
    n_strips = -(-h // rps)
    strip_rows = [min(rps, h - i * rps) for i in range(n_strips)]
    strip_bytes = [r * w * dt.itemsize for r in strip_rows]
    frame_bytes = h * w * dt.itemsize

    n_entries = 8
    ifd_size = 2 + n_entries * 12 + 4
    # out-of-line arrays (strip offsets/counts) needed when n_strips > 1
    extra_per_page = (8 * n_strips) if n_strips > 1 else 0

    with open(filename, "wb") as f:
        f.write(b"II*\x00")
        first_ifd = 8
        f.write(struct.pack("<I", first_ifd))
        arrays_start = first_ifd + t * ifd_size
        data_start = arrays_start + t * extra_per_page
        for k in range(t):
            ifd_off = first_ifd + k * ifd_size
            page_data = data_start + k * frame_bytes
            offsets = []
            acc = 0
            for sb in strip_bytes:
                offsets.append(page_data + acc)
                acc += sb
            next_ifd = first_ifd + (k + 1) * ifd_size if k + 1 < t else 0
            assert f.tell() == ifd_off
            f.write(struct.pack("<H", n_entries))

            def entry(tag, type_id, count, value):
                f.write(struct.pack("<HHI", tag, type_id, count))
                if type_id == 3:
                    f.write(struct.pack("<HH", value, 0))
                else:
                    f.write(struct.pack("<I", value))

            arr_off = arrays_start + k * extra_per_page
            entry(_TAG_IMAGE_WIDTH, 4, 1, w)
            entry(_TAG_IMAGE_LENGTH, 4, 1, h)
            entry(_TAG_BITS_PER_SAMPLE, 3, 1, bits)
            entry(_TAG_COMPRESSION, 3, 1, 1)
            if n_strips > 1:
                entry(_TAG_STRIP_OFFSETS, 4, n_strips, arr_off)
            else:
                entry(_TAG_STRIP_OFFSETS, 4, 1, offsets[0])
            entry(_TAG_ROWS_PER_STRIP, 4, 1, rps)
            if n_strips > 1:
                entry(_TAG_STRIP_BYTE_COUNTS, 4, n_strips, arr_off + 4 * n_strips)
            else:
                entry(_TAG_STRIP_BYTE_COUNTS, 4, 1, strip_bytes[0])
            entry(_TAG_SAMPLE_FORMAT, 3, 1, kind)
            f.write(struct.pack("<I", next_ifd))
        if n_strips > 1:
            for k in range(t):
                page_data = data_start + k * frame_bytes
                offsets = []
                acc = 0
                for sb in strip_bytes:
                    offsets.append(page_data + acc)
                    acc += sb
                f.write(struct.pack("<" + "I" * n_strips, *offsets))
                f.write(struct.pack("<" + "I" * n_strips, *strip_bytes))
        for k in range(t):
            f.write(np.ascontiguousarray(movie[k]).astype(dt, copy=False).tobytes())
