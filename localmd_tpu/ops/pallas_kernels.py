"""Pallas TPU kernels for the PMD hot streaming ops.

``fused_movie_stats``: per-pixel mean + Welch noise sigma of a raw frame
chunk in ONE pass over HBM. The XLA path (loader stats pass) materializes the
overlapping Welch segments — (pixels, 7, 256) floats, ~2 GB of HBM write +
read per 1024-frame chunk — before the DFT matmuls. This kernel streams
(T, TILE_P) tiles of the chunk into VMEM once (in the movie's NATIVE dtype —
half the HBM read for uint16 data), slices the 7 overlapping segments
in-register, runs the windowed partial-DFT matmuls on the MXU, and writes
back only two (pixels,) images. Same arithmetic as
:func:`localmd_tpu.ops.noise.welch_noise_estimate` +
``get_mean_and_noise`` (reference preprocessing_utils.py:10-37).

Falls back to interpreter mode off-TPU (tests run it on CPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from localmd_tpu.ops.noise import (
    NPERSEG,
    _STEP,
    _BAND_START,
    _BAND_END,
    _band_dft_matrices,
)

TILE_P = 512
_N_BINS = _BAND_END - _BAND_START  # 64

# fused V-projection tiling (defaults; shrunk adaptively for large ranks)
_VP_TILE_T = 256
_VP_TILE_D = 512
_VP_VMEM_BUDGET = 12 * 1024 * 1024  # bytes of VMEM the kernel may plan for


def _vp_pick_tiles(r_pad: int):
    """Largest (TILE_D, TILE_T) whose working set (double-buffered inputs +
    resident accumulator) fits the VMEM budget; None if r' is too large."""
    for tile_d in (512, 256, 128):
        for tile_t in (256, 128, 64):
            need = 4 * (
                2 * tile_t * tile_d      # raw tiles (double buffered)
                + 2 * tile_d * r_pad     # projector tiles
                + tile_t * r_pad         # accumulator
                + 2 * r_pad              # constant row
            )
            if need <= _VP_VMEM_BUDGET:
                return tile_d, tile_t
    return None



def _cast_f32(x):
    """VMEM-side cast to f32; Mosaic lacks a direct uint16->f32 cast."""
    if jnp.issubdtype(x.dtype, jnp.unsignedinteger):
        return x.astype(jnp.int32).astype(jnp.float32)
    return x.astype(jnp.float32)


def _stats_kernel(
    n_segs: int,
    mean_divisor: float,
    compute_noise: bool,
    nperseg: int,
    chunk_ref,      # (T, TILE_P) native dtype
    cos_t_ref,      # (64, nperseg) f32 — transposed windowed cos DFT
    sin_t_ref,      # (64, nperseg) f32
    cos1_ref,       # (64, 1) f32 — column sums (detrend correction)
    sin1_ref,       # (64, 1) f32
    mean_ref,       # (n_tiles, TILE_P) f32 out (whole array resident)
    sigma_ref,      # (n_tiles, TILE_P) f32 out
):
    i = pl.program_id(0)
    x = _cast_f32(chunk_ref[:])                           # (T, TILE_P)
    mean_ref[i, :] = jnp.sum(x, axis=0) / mean_divisor

    if not compute_noise:
        sigma_ref[i, :] = jnp.zeros((sigma_ref.shape[1],), jnp.float32)
        return

    step = nperseg - 128  # noverlap=128 (reference welch call signature)
    # tpu.iota only supports integer types; cast after
    idx = jax.lax.broadcasted_iota(jnp.int32, (nperseg, 1), 0).astype(jnp.float32)
    win = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * idx / nperseg)
    scale = 1.0 / jnp.sum(win * win)

    acc = jnp.zeros((_N_BINS, TILE_P), dtype=jnp.float32)
    for s in range(n_segs):
        seg = x[s * step : s * step + nperseg, :]         # (nperseg, TILE_P)
        m = jnp.mean(seg, axis=0, keepdims=True)          # (1, TILE_P)
        re = jnp.dot(cos_t_ref[:], seg, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        re = re - cos1_ref[:] * m
        im = jnp.dot(sin_t_ref[:], seg, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        im = im - sin1_ref[:] * m
        acc = acc + re * re + im * im

    band = acc * (scale / n_segs)
    # bins [65, 129): one-sided doubling x reference 0.5 cancel for interior
    # bins; a bin AT Nyquist (2k == nperseg, i.e. bin 128 when nperseg=256)
    # is undoubled so the reference 0.5 survives (same arithmetic as
    # ops.noise.welch_noise_estimate / _ref_compat)
    k = _BAND_START + jax.lax.broadcasted_iota(jnp.int32, (_N_BINS, TILE_P), 0)
    band = jnp.where(2 * k >= nperseg, band * 0.5, band)
    sigma_ref[i, :] = jnp.sqrt(jnp.mean(band, axis=0))


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def fused_movie_stats(
    chunk2d: Array,
    mean_divisor: int,
    compute_noise: bool = True,
    nperseg: int = NPERSEG,
) -> Tuple[Array, Array]:
    """Per-pixel mean + Welch sigma of a (T, P) raw chunk, single HBM pass.

    Args:
        chunk2d: (T, P) frame chunk, any real dtype (cast happens in VMEM).
        mean_divisor: total frames in the FULL movie (chunk contributions to
            the running mean sum to the global mean, reference
            preprocessing_utils.py:10-20).
        compute_noise: if False only the mean is computed (short chunks,
            reference pmd_loader.py:276-280); sigma output is zeros.
        nperseg: Welch segment length. 256 = documented scipy semantics
            (the default); pass T for ``welch_compat="reference"`` (one
            full-length periodogram — the reference's effective behavior,
            see ops.noise.welch_noise_estimate_ref_compat).

    Returns:
        (mean (P,), sigma (P,)) float32 on device.
    """
    t, p = chunk2d.shape
    if compute_noise and t < nperseg:
        raise ValueError(f"need at least {nperseg} frames for the noise estimate")
    if compute_noise and nperseg < 2 * (_BAND_END - 1):
        raise ValueError(f"nperseg must be >= {2 * (_BAND_END - 1)}, got {nperseg}")
    n_segs = (t - nperseg) // (nperseg - 128) + 1 if compute_noise else 0

    p_pad = ((p + TILE_P - 1) // TILE_P) * TILE_P
    if p_pad != p:
        chunk2d = jnp.pad(chunk2d, ((0, 0), (0, p_pad - p)))

    cos_m, sin_m, cos_1, sin_1 = _band_dft_matrices(jnp.float32, nperseg=nperseg)
    kernel = functools.partial(
        _stats_kernel, n_segs, float(mean_divisor), compute_noise, nperseg
    )

    grid = (p_pad // TILE_P,)
    mean, sigma = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, TILE_P), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((_N_BINS, nperseg), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_N_BINS, nperseg), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_N_BINS, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_N_BINS, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((p_pad // TILE_P, TILE_P), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad // TILE_P, TILE_P), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p_pad // TILE_P, TILE_P), jnp.float32),
            jax.ShapeDtypeStruct((p_pad // TILE_P, TILE_P), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(chunk2d, cos_m.T, sin_m.T, cos_1[:, None], sin_1[:, None])
    return mean.reshape(-1)[:p], sigma.reshape(-1)[:p]


# ---------------------------------------------------------------------------
# Fused streaming V-projection: W = raw2d @ A - c  (one HBM pass over raw)
# ---------------------------------------------------------------------------

def _vproj_kernel(n_d_tiles, raw_ref, a_ref, c_ref, out_ref):
    """Grid (t_tiles, d_tiles): accumulate raw_tile @ a_tile into the output
    (t_tile, r') block; subtract the detrend constant on the last d step.

    raw_ref: (TILE_T, TILE_D) in the movie's native dtype (cast in VMEM).
    a_ref:   (TILE_D, r') f32 folded projector rows (C-order pixels).
    c_ref:   (1, r') f32 constant (A~^T mean).
    out_ref: (TILE_T, r') f32.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = _cast_f32(raw_ref[:])
    # full f32 precision (multi-pass MXU): the temporal fit feeds the final
    # factorization, where 1-pass bf16 error (~1e-3) would dominate
    out_ref[:] += jnp.dot(
        x, a_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(j == n_d_tiles - 1)
    def _():
        out_ref[:] = out_ref[:] - c_ref[:]


@functools.partial(jax.jit)
def fused_v_projection(raw2d: Array, a_cols: Array, c: Array) -> Array:
    """(t, d) raw chunk (native dtype, C-order pixels) x (d, r') projector
    -> (r', t) temporal coefficients, in ONE pass over the raw chunk.

    Equivalent to ``(raw2d.astype(f32) @ a_cols - c).T`` but never
    materializes the f32 copy of the chunk; uint16 movies are read at 2
    bytes/pixel straight into VMEM. ``a_cols`` rows must be in the SAME
    pixel order as raw2d's flattening (C-order; see loader).
    """
    t, d = raw2d.shape
    r = a_cols.shape[1]
    r_pad = ((r + 127) // 128) * 128
    tiles = _vp_pick_tiles(r_pad)
    if tiles is None:
        # rank too large for a VMEM-resident accumulator: plain XLA matmul
        x = raw2d.astype(jnp.float32)
        return (jnp.matmul(x, a_cols, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST) - c[None, :]).T
    tile_d, tile_t = tiles

    t_pad = ((t + tile_t - 1) // tile_t) * tile_t
    d_pad = ((d + tile_d - 1) // tile_d) * tile_d
    if t_pad != t or d_pad != d:
        raw2d = jnp.pad(raw2d, ((0, t_pad - t), (0, d_pad - d)))
    if d_pad != d or r_pad != r:
        a_cols = jnp.pad(a_cols, ((0, d_pad - d), (0, r_pad - r)))
    c_row = jnp.pad(c[None, :], ((0, 0), (0, r_pad - r)))

    n_d_tiles = d_pad // tile_d
    kernel = functools.partial(_vproj_kernel, n_d_tiles)
    out = pl.pallas_call(
        kernel,
        grid=(t_pad // tile_t, n_d_tiles),
        in_specs=[
            pl.BlockSpec((tile_t, tile_d), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d, r_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_t, r_pad), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, r_pad), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(raw2d, a_cols, c_row)
    return out[:t, :r].T


# ---------------------------------------------------------------------------
# Fused blocked reconstruction: movie tile = overlap-add of U_b @ V_b
# ---------------------------------------------------------------------------

def _recon_kernel(starts_ref, panels_ref, temporal_ref, zeros_ref,
                  out_ref, scratch_ref, sem_ref):
    """Sequential grid over blocks: compute the block's window-shaped panel
    product in VMEM and read-modify-write its 8-ALIGNED window of the HBM
    output (overlap-add; TPU grid steps execute sequentially, so no races).

    Panels are pre-scattered into window-local positions outside the kernel
    (Mosaic can neither prove alignment of dynamic in-VMEM offsets nor DMA
    unaligned rectangles — the latter faults the worker), so the kernel only
    ever adds full windows at aligned offsets.

    starts_ref: (N, 2) scalar-prefetched ALIGNED window origins.
    panels_ref: (1, w1*w2, S) VMEM — window-local C-order pixel rows.
    temporal_ref: (1, S, f) VMEM.
    zeros_ref/out_ref: (d1p, d2p, f) HBM, aliased (zeros in, result out).
    scratch_ref: (w1, w2, f) VMEM window buffer.
    """
    del zeros_ref  # aliased with out_ref; only referenced to keep it live
    n = pl.program_id(0)
    w1, w2, f = scratch_ref.shape
    k0 = pl.multiple_of(starts_ref[n, 0], 8)
    j0 = pl.multiple_of(starts_ref[n, 1], 8)

    contrib = jnp.dot(
        panels_ref[0], temporal_ref[0], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                     # (w1*w2, f)

    load = pltpu.make_async_copy(
        out_ref.at[pl.ds(k0, w1), pl.ds(j0, w2), :], scratch_ref, sem_ref
    )
    load.start()
    load.wait()
    scratch_ref[:] = scratch_ref[:] + contrib.reshape(w1, w2, f)
    store = pltpu.make_async_copy(
        scratch_ref, out_ref.at[pl.ds(k0, w1), pl.ds(j0, w2), :], sem_ref
    )
    store.start()
    store.wait()


def recon_window_geometry(
    b1: int, b2: int, d1: int, d2: int
) -> tuple[int, int, int, int]:
    """DMA-window geometry for :func:`fused_block_reconstruct`.

    Returns ``(w1, w2, d1p, d2p)``: the widened window extents and the padded
    FOV dims. Invariants Mosaic needs (an unaligned sublane DMA origin faults
    the TPU worker, so these are load-bearing, not cosmetic):

    - ``w1``/``w2`` are multiples of 8 and cover a block at any offset once
      the origin is rounded down to a multiple of 8;
    - ``d1p``/``d2p`` are multiples of 8 and ``>= w``, so the clamped origin
      ``min((start // 8) * 8, d_p - w)`` is itself always a multiple of 8.
    """
    w1 = min(((b1 + 7) // 8) * 8 + 8, ((d1 + 7) // 8) * 8)
    w2 = min(((b2 + 7) // 8) * 8 + 8, ((d2 + 7) // 8) * 8)
    d1p = max(((d1 + 7) // 8) * 8, w1)
    d2p = max(((d2 + 7) // 8) * 8, w2)
    return w1, w2, d1p, d2p


@functools.partial(jax.jit, static_argnums=(4, 5))
def fused_block_reconstruct(
    panels_c: Array,
    temporal_blocks: Array,
    starts: Array,
    fov_zeros: Array,
    b1: int,
    b2: int,
) -> Array:
    """Overlap-add reconstruction of a (d1, d2, f) standardized movie tile.

    Args:
        panels_c: (N, b1*b2, S) block panels with C-ORDER local pixel rows
            (row = i * b2 + j; convert from the F-order pipeline panels with
            :func:`panels_f_to_c`).
        temporal_blocks: (N, S, f) per-block temporal coefficients.
        starts: (N, 2) int32 block offsets.
        fov_zeros: (d1, d2, f) float32 zeros (donated as the accumulator).

    Returns:
        (d1, d2, f) sum over blocks of U_b @ V_b placed at each block's
        rectangle (the caller applies weights/normalization/mean fold).
    """
    n, p, s = panels_c.shape
    f_orig = temporal_blocks.shape[-1]
    # Mosaic DMA rectangles must be 128-aligned on the trailing (frame) dim.
    f = ((f_orig + 127) // 128) * 128
    if f != f_orig:
        temporal_blocks = jnp.pad(
            temporal_blocks, ((0, 0), (0, 0), (0, f - f_orig))
        )
        fov_zeros = jnp.pad(fov_zeros, ((0, 0), (0, 0), (0, f - f_orig)))

    # widened 8-aligned DMA windows covering any block offset (see kernel)
    d1_orig, d2_orig = fov_zeros.shape[0], fov_zeros.shape[1]
    w1, w2, d1, d2 = recon_window_geometry(b1, b2, d1_orig, d2_orig)
    if d1 != d1_orig or d2 != d2_orig:
        fov_zeros = jnp.pad(
            fov_zeros, ((0, d1 - d1_orig), (0, d2 - d2_orig), (0, 0))
        )

    # aligned window origins + in-window offsets (computed with XLA ops so
    # traced `starts` work; grid starts are static data in practice)
    k = starts[:, 0]
    j = starts[:, 1]
    k0 = jnp.minimum((k // 8) * 8, d1 - w1)
    j0 = jnp.minimum((j // 8) * 8, d2 - w2)
    starts_aligned = jnp.stack([k0, j0], axis=1).astype(jnp.int32)

    # pre-scatter panel rows into window-local C-order positions
    ii = jnp.arange(b1, dtype=jnp.int32)[:, None]
    jj = jnp.arange(b2, dtype=jnp.int32)[None, :]
    local = (
        (ii + (k - k0)[:, None, None]) * w2 + (jj + (j - j0)[:, None, None])
    ).reshape(n, p)                                       # (N, b1*b2)
    panels_w = jnp.zeros((n, w1 * w2, s), panels_c.dtype)
    panels_w = panels_w.at[
        jnp.arange(n)[:, None], local, :
    ].set(panels_c)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, w1 * w2, s), lambda i, starts: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, f), lambda i, starts: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((w1, w2, f), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _recon_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(fov_zeros.shape, jnp.float32),
        input_output_aliases={3: 0},  # zeros accumulator -> output
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts_aligned, panels_w, temporal_blocks, fov_zeros)
    return out[:d1_orig, :d2_orig, :f_orig]


def panels_f_to_c(panels: Array, b1: int, b2: int) -> Array:
    """Reorder (N, b1*b2, S) panel rows from F-order (i + j*b1) to C-order
    (i*b2 + j) local pixel ids."""
    n, p, s = panels.shape
    return (
        panels.reshape(n, b2, b1, s).swapaxes(1, 2).reshape(n, p, s)
    )
