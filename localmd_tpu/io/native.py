"""ctypes bindings for the native fastio library (threaded scatter reads).

Builds ``cpp/fastio.cpp`` on first use (cached under the package dir) and
exposes :class:`FastReader`. Falls back cleanly: callers should check
``native_available()`` and use numpy/mmap paths when False.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "cpp", "fastio.cpp")
_SO = os.path.join(_REPO_ROOT, "cpp", "libfastio.so")


def _build(force: bool = False) -> Optional[str]:
    if (
        not force
        and os.path.exists(_SO)
        and os.path.exists(_SRC)
        and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
    ):
        return _SO
    if not os.path.exists(_SRC):
        return None
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-pthread", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    with _LIB_LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        so = _build()
        if so is None:
            _LIB_FAILED = True
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            # A stale or foreign-arch binary (e.g. copied between machines)
            # can exist on disk; rebuild from source once before giving up.
            so = _build(force=True)
            try:
                lib = ctypes.CDLL(so) if so else None
            except OSError:
                lib = None
            if lib is None:
                _LIB_FAILED = True
                return None
        i64 = ctypes.c_int64
        p64 = ctypes.POINTER(ctypes.c_int64)
        pu8 = ctypes.POINTER(ctypes.c_uint8)
        lib.fastio_open.argtypes = [ctypes.c_char_p]
        lib.fastio_open.restype = i64
        lib.fastio_close.argtypes = [i64]
        lib.fastio_close.restype = i64
        lib.fastio_read_scatter.argtypes = [i64, p64, p64, i64, pu8, i64, i64]
        lib.fastio_read_scatter.restype = i64
        lib.fastio_prefetch_submit.argtypes = [i64, p64, p64, i64, pu8, i64, i64]
        lib.fastio_prefetch_submit.restype = i64
        lib.fastio_prefetch_wait.argtypes = [i64]
        lib.fastio_prefetch_wait.restype = i64
        if hasattr(lib, "fastio_lzw_decode"):
            lib.fastio_lzw_decode.argtypes = [pu8, i64, pu8, i64]
            lib.fastio_lzw_decode.restype = i64
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load() is not None


def lzw_decode(data: bytes, expected_bytes: int) -> Optional[bytes]:
    """TIFF-variant LZW decode via the native library; None if unavailable
    (callers fall back to the pure-Python decoder in localmd_tpu.io.tiff)."""
    lib = _load()
    if lib is None or not hasattr(lib, "fastio_lzw_decode"):
        return None
    src = np.frombuffer(data, dtype=np.uint8)
    dst = np.empty(expected_bytes, dtype=np.uint8)
    n = lib.fastio_lzw_decode(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(src),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        expected_bytes,
    )
    if n < 0:
        raise ValueError(f"LZW decode failed (rc={n})")
    return dst[:n].tobytes()


class FastReader:
    """Threaded positioned reads of equal-or-variable-size records."""

    def __init__(self, path: str, n_threads: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError("fastio native library unavailable")
        self._lib = lib
        self._handle = lib.fastio_open(path.encode())
        if self._handle < 0:
            raise OSError(-self._handle, f"fastio_open failed for {path}")
        self.n_threads = n_threads

    def close(self):
        if getattr(self, "_handle", -1) >= 0:
            self._lib.fastio_close(self._handle)
            self._handle = -1

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass

    def _prep(self, offsets: Sequence[int], sizes: Sequence[int], out: np.ndarray):
        offs = np.ascontiguousarray(offsets, dtype=np.int64)
        szs = np.ascontiguousarray(sizes, dtype=np.int64)
        if not out.flags.c_contiguous:
            raise ValueError("output buffer must be C-contiguous")
        if len(offs) != len(szs):
            raise ValueError("offsets/sizes length mismatch")
        stride = out.strides[0] if out.ndim > 1 else (szs[0] if len(szs) else 0)
        if len(szs) and (szs > stride).any():
            raise ValueError("record size exceeds output stride")
        return (
            offs,
            szs,
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            szs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            int(stride),
        )

    def read_scatter(self, offsets, sizes, out: np.ndarray) -> np.ndarray:
        """Read record i from byte offset offsets[i] (sizes[i] bytes) into
        row i of ``out`` (first-axis stride apart). Blocking."""
        offs, szs, offs_p, szs_p, out_p, stride = self._prep(offsets, sizes, out)
        rc = self._lib.fastio_read_scatter(
            self._handle, offs_p, szs_p, len(offs), out_p, stride, self.n_threads
        )
        if rc != 0:
            raise OSError(-rc, "fastio_read_scatter failed")
        return out

    def prefetch(self, offsets, sizes, out: np.ndarray) -> "PrefetchTicket":
        """Start an async scatter read; returns a ticket to wait on. The
        ``out`` buffer must stay alive until the ticket is waited."""
        offs, szs, offs_p, szs_p, out_p, stride = self._prep(offsets, sizes, out)
        ticket = self._lib.fastio_prefetch_submit(
            self._handle, offs_p, szs_p, len(offs), out_p, stride, self.n_threads
        )
        if ticket < 0:
            raise OSError(-ticket, "fastio_prefetch_submit failed")
        return PrefetchTicket(self._lib, ticket, out)


class PrefetchTicket:
    def __init__(self, lib, ticket: int, out: np.ndarray):
        self._lib = lib
        self._ticket = ticket
        self._out = out
        self._done = False

    def wait(self) -> np.ndarray:
        if not self._done:
            rc = self._lib.fastio_prefetch_wait(self._ticket)
            self._done = True
            if rc != 0:
                raise OSError(-rc, "fastio prefetch failed")
        return self._out
