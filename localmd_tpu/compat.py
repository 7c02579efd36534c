"""Reference-named per-item functions for drop-in script migration.

The pipeline runs everything BATCHED over blocks (localmd_tpu.engine); these
shims expose the reference package's per-block function surface
(reference decomposition.py) as thin adapters over the batched kernels, so
scripts written against ``localmd.decomposition`` can switch imports without
rewrites:

- ``decomposition_no_normalize_approx``  (reference decomposition.py:76-99)
- ``rank_simulation``                    (reference decomposition.py:102-131)
- ``single_block_md``                    (reference decomposition.py:235-330)
- ``single_residual_block_md``           (reference decomposition.py:333-387)
- ``get_temporal_projector``             (reference decomposition.py:390-407)
- ``windowed_pmd``                       (reference decomposition.py:410-525)

Conventions follow the reference exactly: blocks are (d1, d2, T), spatial
outputs are (d1, d2, r) with F-order pixel flattening, ``rank_placeholder``
is a shape-carrying array (its length IS the rank, so jit retraces per rank
rather than per value). RNG streams differ from the reference (sketches are
drawn by our rSVD), so cross-package numerical comparison should inject
sketches via :func:`localmd_tpu.ops.linalg.sketch_override` or compare
reconstruction products (see tests/test_compat_shims.py).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from localmd_tpu.engine import (
    identity,
    single_block_md_batched,
    single_residual_block_md_batched,
    temporal_projector_batched,
    windowed_pmd_batched,
)
from localmd_tpu.ops.linalg import truncated_random_svd
from localmd_tpu.ops.roughness import (
    spatial_roughness_stat,
    temporal_roughness_stat,
)
from localmd_tpu.ops.tiling import flatten_fov, unflatten_fov


def _fov_to_flat(block: Array) -> Array:
    """(d1, d2, t) -> (d1*d2, t), F-order pixels (reference convention)."""
    return flatten_fov(jnp.asarray(block), "F")


def _placeholder_rank(rank_placeholder) -> int:
    """Reference convention: ``rank_placeholder``'s LENGTH is the rank
    (reference decomposition.py:39, 60); a plain int is also accepted."""
    if isinstance(rank_placeholder, (int, np.integer)):
        return int(rank_placeholder)
    return int(np.shape(rank_placeholder)[0])


def truncated_random_svd_ref(input_matrix: Array, key: Array, rank_placeholder):
    """Reference-signature randomized SVD (reference decomposition.py:37-73):
    the rank is carried by ``rank_placeholder``'s shape. Thin adapter over
    :func:`localmd_tpu.ops.linalg.truncated_random_svd` (whose rank is a
    static int)."""
    return truncated_random_svd(
        jnp.asarray(input_matrix), key, _placeholder_rank(rank_placeholder)
    )


def decomposition_no_normalize_approx(
    block: Array, key: Array, rank_placeholder: Array
) -> Tuple[Array, Array]:
    """Roughness statistics of an un-normalized block's rSVD components
    (reference decomposition.py:76-99). Returns (spatial_stats, temporal_stats),
    each shape (rank,)."""
    d1, d2, t = block.shape
    rank = _placeholder_rank(rank_placeholder)
    u, s, v = truncated_random_svd(_fov_to_flat(block), key, rank)
    v = s[:, None] * v
    u_img = unflatten_fov(u, d1, d2, "F")                 # (d1, d2, r)
    spatial_stats = spatial_roughness_stat(jnp.moveaxis(u_img, -1, 0))
    temporal_stats = temporal_roughness_stat(v)
    return spatial_stats, temporal_stats


def rank_simulation(
    d1: int, d2: int, t: int, rank_placeholder: Array, key1: Array, key2: Array
) -> Tuple[Array, Array]:
    """Noise-block roughness simulation (reference decomposition.py:102-131)."""
    noise_data = jax.random.normal(key1, (d1, d2, t))
    return decomposition_no_normalize_approx(noise_data, key2, rank_placeholder)


def single_block_md(
    block: Array,
    key: Array,
    rank_placeholder: Array,
    temporal_avg_factor: int,
    spatial_average_factor: int,
    spatial_threshold: float,
    temporal_threshold: float,
    spatial_denoiser: Callable = identity,
    temporal_denoiser: Callable = identity,
) -> Tuple[Array, Array, Array]:
    """Per-block two-stage decomposition (reference decomposition.py:235-330).

    Returns (u (d1, d2, r) orthonormal, good_comps (r,), v (r, t))."""
    d1, d2, t = block.shape
    rank = _placeholder_rank(rank_placeholder)
    u, dec, v = single_block_md_batched(
        jnp.asarray(block)[None],
        jnp.asarray(key)[None],
        rank,
        temporal_avg_factor,
        spatial_average_factor,
        spatial_threshold,
        temporal_threshold,
        spatial_denoiser,
        temporal_denoiser,
    )
    return unflatten_fov(u[0], d1, d2, "F"), dec[0], v[0]


def single_residual_block_md(
    block: Array,
    existing: Array,
    key: Array,
    rank_placeholder: Array,
    temporal_avg_factor: int,
    spatial_threshold,
    temporal_threshold,
) -> Tuple[Array, Array, Array]:
    """Residual components orthogonal to an existing spatial basis
    (reference decomposition.py:333-387). ``existing``: (d1, d2, S)."""
    d1, d2, t = block.shape
    rank = _placeholder_rank(rank_placeholder)
    existing_flat = flatten_fov(jnp.asarray(existing), "F")[None]  # (1, p, S)
    u, dec, v = single_residual_block_md_batched(
        jnp.asarray(block)[None],
        existing_flat,
        jnp.asarray(key)[None],
        rank,
        temporal_avg_factor,
        spatial_threshold,
        temporal_threshold,
    )
    return unflatten_fov(u[0], d1, d2, "F"), dec[0], v[0]


def get_temporal_projector(spatial_decomposition: Array, block: Array) -> Array:
    """(d1, d2, r) basis x (d1, d2, t) block -> (r, t)
    (reference decomposition.py:390-407)."""
    spatial_flat = flatten_fov(jnp.asarray(spatial_decomposition), "F")[None]
    block_flat = _fov_to_flat(block)[None]
    return temporal_projector_batched(spatial_flat, block_flat)[0]


def windowed_pmd(
    window_length: int,
    block: Array,
    max_rank: int,
    spatial_threshold: float,
    temporal_threshold: float,
    max_consecutive_failures: int,
    temporal_avg_factor: int,
    spatial_avg_factor: int,
    spatial_denoiser: Callable = identity,
    temporal_denoiser: Callable = identity,
    key: Array = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed incremental-basis decomposition of ONE block
    (reference decomposition.py:410-525).

    Returns host arrays (spatial (d1, d2, ctr), temporal (ctr, t)) cropped
    to the kept-component count, exactly like the reference. The reference
    draws fresh global-numpy keys per window (make_jax_random_key); pass
    ``key`` for a reproducible stream instead.
    """
    d1, d2, t = block.shape
    if key is None:
        from localmd_tpu.utils import make_key

        key = make_key(None)
    res = windowed_pmd_batched(
        jnp.asarray(block)[None],
        key,
        window_length,
        max_rank,
        spatial_threshold,
        temporal_threshold,
        max_consecutive_failures,
        temporal_avg_factor,
        spatial_avg_factor,
        spatial_denoiser,
        temporal_denoiser,
    )
    ctr = int(np.asarray(res.counts)[0])
    spatial = np.asarray(unflatten_fov(res.spatial[0], d1, d2, "F"))[:, :, :ctr]
    temporal = np.asarray(res.temporal[0])[:ctr, :]
    return spatial, temporal
