"""Compression / reconstruction quality metrics.

The reference offers no quantitative evaluation utilities (QC is visual,
diagnostic_plots.py); these provide the numbers users actually report:
compression ratio, streaming relative reconstruction error, and the
residual-to-noise ratio (how close the residual is to pure noise — the PMD
success criterion).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from localmd_tpu.dataset import as_dataset
from localmd_tpu.pmd_array import PMDArray


def _load_chunk_f32(dataset, sub) -> jnp.ndarray:
    """Read ``dataset[sub]`` exactly once (disk-backed datasets pay per read)
    and return a (t, d1, d2) float32 device array."""
    chunk = dataset[sub]
    if not hasattr(chunk, "devices"):
        chunk = np.asarray(chunk, dtype=np.float32)
    raw = jnp.asarray(chunk).astype(jnp.float32)
    return raw[None] if raw.ndim == 2 else raw


def compression_ratio(pmd: PMDArray) -> float:
    """Raw float32 movie bytes / stored factorization bytes."""
    t, d1, d2 = pmd.shape
    raw = t * d1 * d2
    u = pmd.u
    stored = (
        u.data.size + u.indices.size + u.indptr.size
        + pmd.r.size + pmd.s.size + pmd.v.size
        + pmd.mean_img.size + pmd.var_img.size
    )
    return float(raw) / float(stored)


def reconstruction_error(
    pmd: PMDArray,
    dataset,
    frames: Optional[range] = None,
    chunk_frames: int = 512,
) -> dict:
    """Streaming relative Frobenius reconstruction error on device.

    Compares the PMD reconstruction against the raw movie over ``frames``
    (default: all), accumulating sums on device in chunks — the full movie
    is never materialized.

    Returns {"rel_error", "rel_error_centered", "frames"}:
    ``rel_error`` uses ||Y||; ``rel_error_centered`` uses ||Y - mean|| (the
    meaningful scale when the movie has a large DC offset).
    """
    dataset = as_dataset(dataset)
    t_total = dataset.shape[0]
    if frames is None:
        frames = range(t_total)
    frames = list(frames)

    err_sq = 0.0
    raw_sq = 0.0
    rawc_sq = 0.0
    mean_dev = jnp.asarray(pmd.mean_img)

    for s in range(0, len(frames), chunk_frames):
        sub = frames[s : s + chunk_frames]
        raw = _load_chunk_f32(dataset, sub)
        rec = pmd.reconstruct_frames(sub)
        err_sq += float(jnp.sum((rec - raw) ** 2))
        raw_sq += float(jnp.sum(raw**2))
        rawc_sq += float(jnp.sum((raw - mean_dev[None]) ** 2))

    return {
        "rel_error": float(np.sqrt(err_sq / max(raw_sq, 1e-30))),
        "rel_error_centered": float(np.sqrt(err_sq / max(rawc_sq, 1e-30))),
        "frames": len(frames),
    }


def residual_noise_ratio(
    pmd: PMDArray,
    dataset,
    frames: Optional[range] = None,
    chunk_frames: int = 512,
) -> float:
    """||Y - Y_hat||^2 / (sum sigma_i^2 * T) — near 1.0 when the residual is
    exactly the estimated noise (the PMD ideal); >> 1 means missed signal,
    << 1 means over-fitting noise into the factorization."""
    dataset = as_dataset(dataset)
    t_total = dataset.shape[0]
    if frames is None:
        frames = range(t_total)
    frames = list(frames)

    err_sq = 0.0
    for s in range(0, len(frames), chunk_frames):
        sub = frames[s : s + chunk_frames]
        raw = _load_chunk_f32(dataset, sub)
        rec = pmd.reconstruct_frames(sub)
        err_sq += float(jnp.sum((rec - raw) ** 2))

    noise_power = float(np.sum(pmd.var_img.astype(np.float64) ** 2)) * len(frames)
    return err_sq / max(noise_power, 1e-30)
