"""Streaming movie loader: statistics, background subtraction, V-projection.

TPU-native counterpart of the reference ``PMDLoader``
(reference pmd_loader.py:111-371). Differences by design:

- The reference computes per-pixel mean and Welch noise with a doubly nested
  host loop over 1024-frame chunks x sqrt(pixel_batch_size)^2 spatial tiles,
  dispatching one small jit per tile (reference pmd_loader.py:245-289). Here
  each 1024-frame chunk is ONE fused device program over the full FOV (the
  batched Welch kernel in :mod:`localmd_tpu.ops.noise`), optionally row-tiled
  only if the chunk exceeds a VMEM-friendly byte budget.
- IO prefetch: frame chunks are read on a background thread while the device
  crunches the previous chunk (replacing the torch DataLoader worker
  machinery, reference pmd_loader.py:151-168 — torch is not a dependency
  here).
- The streaming temporal regression ``v_projection`` takes the blocked-sparse
  ``U`` and computes ``P^T (U^T X_std)`` per chunk as gather + batched panel
  matmuls on the MXU (reference uses BCOO sparse-dense products,
  pmd_loader.py:316-346). It is embarrassingly parallel over frames — the
  sharded variant lives in :mod:`localmd_tpu.parallel`.

Statistics semantics match the reference exactly: mean accumulated over all
chunks; noise sigma averaged over chunks with >= 256 frames; zero sigmas
replaced by 1 (reference pmd_loader.py:203-291).
"""

from __future__ import annotations

import math
import queue
import threading
from typing import Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from localmd_tpu.dataset import as_dataset
from localmd_tpu.ops.linalg import truncated_random_svd
from localmd_tpu.ops.noise import get_mean_and_noise, get_mean_chunk
from localmd_tpu.ops.tiling import flatten_fov, flatten_image, unflatten_fov
from localmd_tpu.utils import display, make_key

MIN_NOISE_FRAMES = 256  # reference pmd_loader.py:203 min_allowed_frames
STATS_CHUNK_FRAMES = 1024  # reference pmd_loader.py:171 frame_constant


def _mm(a, b):
    return jnp.matmul(a, b, preferred_element_type=jnp.float32)


def _chunk_ranges(total: int, chunk: int) -> List[Tuple[int, int]]:
    """[start, end) ranges; the final partial chunk is merged into the
    previous one (reference FrameDataloader semantics, pmd_loader.py:78-105)
    so every chunk except possibly the last-merged one has full length."""
    n_chunks = math.ceil(total / chunk)
    if n_chunks <= 1:
        return [(0, total)]
    ranges = [(i * chunk, (i + 1) * chunk) for i in range(n_chunks - 2)]
    ranges.append(((n_chunks - 2) * chunk, total))
    return ranges


def _prefetch_iter(make_items: Sequence, load_fn, depth: int = 2) -> Iterable:
    """Background-thread prefetching iterator over ``load_fn(item)``."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()

    def worker():
        try:
            for item in make_items:
                q.put(load_fn(item))
        finally:
            q.put(sentinel)

    th = threading.Thread(target=worker, daemon=True)
    th.start()
    while True:
        got = q.get()
        if got is sentinel:
            break
        yield got


@jax.jit
def standardize_and_filter(
    data: Array, mean_img: Array, std_img: Array, spatial_basis_flat: Array
) -> Tuple[Array, Array]:
    """Standardize a (d1, d2, t) chunk and project out the background basis.

    Returns the filtered chunk (d1, d2, t) and the background temporal
    projection (K, t). Parity: reference ``standardize_and_filter``
    (pmd_loader.py:374-389).
    """
    d1, d2, t = data.shape
    data = (data - mean_img[:, :, None]) / std_img[:, :, None]
    flat = flatten_fov(data)                              # (d, t) F-order
    temporal_projection = _mm(spatial_basis_flat.T, flat)  # (K, t)
    flat = flat - _mm(spatial_basis_flat, temporal_projection)
    return unflatten_fov(flat, d1, d2), temporal_projection


@jax.jit
def _standardize_flat(data: Array, mean_flat: Array, std_flat: Array) -> Array:
    """(d, t) raw -> standardized, with F-order-flattened mean/std images."""
    return (data - mean_flat[:, None]) / std_flat[:, None]


class PMDLoader:
    """Owns dataset access, per-pixel statistics and the background basis."""

    def __init__(
        self,
        dataset,
        dtype: str = "float32",
        background_rank: int = 15,
        batch_size: int = 2000,
        pixel_batch_size: int = 5000,
        order: str = "F",
        compute_normalizer: bool = True,
        frame_constant: int = STATS_CHUNK_FRAMES,
        seed: Optional[int] = None,
        num_workers: Optional[int] = None,  # accepted for API parity; IO uses threads
    ):
        self.dataset = as_dataset(dataset)
        self.dtype = np.dtype(dtype)
        self.shape = tuple(self.dataset.shape)
        self.batch_size = batch_size
        self.pixel_batch_size = pixel_batch_size
        self._order = order
        self.background_rank = background_rank
        self.frame_constant = frame_constant
        self._compute_normalizer = compute_normalizer
        self._key = make_key(seed)

        self._initialize_normalizers()
        self._initialize_background()

    @property
    def order(self) -> str:
        return self._order

    @property
    def n_pixels(self) -> int:
        return self.shape[1] * self.shape[2]

    # -- raw access -----------------------------------------------------------

    def temporal_crop(self, frames) -> np.ndarray:
        """(d1, d2, T) host array of the requested frames (reference
        pmd_loader.py:179-188)."""
        return self.dataset[frames].astype(self.dtype).transpose(1, 2, 0)

    def _iter_chunks(self, prefetch: bool = True):
        ranges = _chunk_ranges(self.shape[0], self.batch_size)

        def load(rng):
            s, e = rng
            return self.temporal_crop(list(range(s, e)))

        if prefetch:
            return _prefetch_iter(ranges, load)
        return (load(r) for r in ranges)

    # -- statistics ------------------------------------------------------------

    def _initialize_normalizers(self):
        display("Computing video statistics (mean + noise sigma)")
        t_total, d1, d2 = self.shape
        normalizer_flag = self._compute_normalizer and t_total >= MIN_NOISE_FRAMES

        mean_acc = jnp.zeros((d1, d2), dtype=jnp.float32)
        noise_acc = jnp.zeros((d1, d2), dtype=jnp.float32)
        noise_chunks = 0

        ranges = _chunk_ranges(t_total, self.frame_constant)

        def load(rng):
            s, e = rng
            return self.temporal_crop(list(range(s, e)))

        for data in _prefetch_iter(ranges, load):
            chunk = jnp.asarray(data)
            if normalizer_flag and chunk.shape[2] >= MIN_NOISE_FRAMES:
                m, sig = get_mean_and_noise(chunk, t_total)
                noise_acc = noise_acc + sig
                noise_chunks += 1
            else:
                m = get_mean_chunk(chunk, t_total)
            mean_acc = mean_acc + m

        self.mean_img = np.asarray(mean_acc)
        if normalizer_flag and noise_chunks > 0:
            std = np.asarray(noise_acc) / noise_chunks
            std[std == 0] = 1.0
        else:
            std = np.ones((d1, d2), dtype=np.float32)
        self.std_img = std.astype(np.float32)
        display("Finished mean and noise estimation")

    # -- background ------------------------------------------------------------

    def _initialize_background(self, n_samples: int = 1000):
        """Rank-``background_rank`` randomized SVD of <= 1000 random
        standardized frames (reference pmd_loader.py:300-314). The basis is
        F-order-flattened: shape (d1*d2, K)."""
        if self.background_rank <= 0:
            self.spatial_basis = np.zeros((self.n_pixels, 1), dtype=np.float32)
            return
        display("Computing low-rank background basis")
        t_total = self.shape[0]
        n = min(n_samples, t_total)
        frames = np.sort(np.random.choice(t_total, size=n, replace=False)).tolist()
        crop = jnp.asarray(self.temporal_crop(frames))
        crop = (crop - jnp.asarray(self.mean_img)[:, :, None]) / jnp.asarray(
            self.std_img
        )[:, :, None]
        flat = flatten_fov(crop)
        self._key, sub = jax.random.split(self._key)
        u, _, _ = truncated_random_svd(flat, sub, self.background_rank)
        self.spatial_basis = np.asarray(u, dtype=np.float32)

    # -- standardized views -----------------------------------------------------

    def temporal_crop_standardized(self, frames) -> np.ndarray:
        crop = self.temporal_crop(frames)
        crop = (crop - self.mean_img[:, :, None]) / self.std_img[:, :, None]
        return crop.astype(self.dtype)

    def temporal_crop_with_filter(self, frames) -> Tuple[Array, Array]:
        """Standardize + background-filter the init frames.

        Returns DEVICE arrays: filtered data (d1, d2, T) and background
        temporal basis (K, T). Processed in ``batch_size`` temporal chunks
        (reference pmd_loader.py:348-371) to bound transfer sizes.
        """
        d1, d2 = self.shape[1], self.shape[2]
        t = len(frames)
        mean_d = jnp.asarray(self.mean_img)
        std_d = jnp.asarray(self.std_img)
        basis_d = jnp.asarray(self.spatial_basis)

        out_chunks, tb_chunks = [], []
        for s in range(0, t, self.batch_size):
            sub = frames[s : s + self.batch_size]
            chunk = jnp.asarray(self.temporal_crop(sub))
            filt, tb = standardize_and_filter(chunk, mean_d, std_d, basis_d)
            out_chunks.append(filt)
            tb_chunks.append(tb)
        return (
            jnp.concatenate(out_chunks, axis=2) if len(out_chunks) > 1 else out_chunks[0],
            jnp.concatenate(tb_chunks, axis=1) if len(tb_chunks) > 1 else tb_chunks[0],
        )

    # -- streaming temporal regression ------------------------------------------

    def v_projection(self, u, p: Array) -> np.ndarray:
        """V = P^T U^T standardize(movie): second full streaming pass.

        Args:
            u: BlockSparseMatrix spatial basis (padded columns fine).
            p: (R, r') mixing matrix — U @ P has orthonormal columns.

        Returns:
            (r', T) numpy array.
        """
        mean_flat = jnp.asarray(flatten_image(jnp.asarray(self.mean_img)))
        std_flat = jnp.asarray(flatten_image(jnp.asarray(self.std_img)))
        p_dev = jnp.asarray(p)

        results = []
        for data in self._iter_chunks():
            chunk = flatten_fov(jnp.asarray(data))       # (d, t_c) F-order
            chunk = _standardize_flat(chunk, mean_flat, std_flat)
            utx = u.rmatmul(chunk)                        # (R, t_c)
            results.append(np.asarray(_mm(p_dev.T, utx)))
        return np.concatenate(results, axis=1)
