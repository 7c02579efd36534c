"""Synthetic functional-imaging movie generators.

Used by benchmarks, demos and tests. Generates the workload families named
in BASELINE.json's configs: two-photon somatic movies, large-FOV widefield
(1-photon) movies with a strong global background, and high-rate voltage
imaging movies. All generation runs on device (jax) so benchmarks are not
bounded by host RNG or transfer bandwidth.

The movies satisfy PMD's model: spatially compact smooth components x
temporally smooth traces + white noise (+ low-rank background).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def _gaussian_blobs(key, n_cells: int, d1: int, d2: int, radius: float) -> Array:
    """(d1, d2, n_cells) smooth compact spatial footprints."""
    k1, k2, k3 = jax.random.split(key, 3)
    cy = jax.random.uniform(k1, (n_cells,), minval=radius, maxval=d1 - radius)
    cx = jax.random.uniform(k2, (n_cells,), minval=radius, maxval=d2 - radius)
    r = radius * jax.random.uniform(k3, (n_cells,), minval=0.6, maxval=1.4)
    yy = jnp.arange(d1)[:, None, None]
    xx = jnp.arange(d2)[None, :, None]
    dist2 = (yy - cy[None, None, :]) ** 2 + (xx - cx[None, None, :]) ** 2
    return jnp.exp(-dist2 / (2.0 * r[None, None, :] ** 2))


def _calcium_traces(key, n_cells: int, t: int, rate: float, tau: float) -> Array:
    """(n_cells, t) spike trains convolved with an exponential kernel."""
    k1 = key
    spikes = (jax.random.uniform(k1, (n_cells, t)) < rate).astype(jnp.float32)
    decay = jnp.exp(-1.0 / tau)

    def step(carry, s):
        c = carry * decay + s
        return c, c

    _, traces = jax.lax.scan(step, jnp.zeros(n_cells), spikes.T)
    return traces.T


def two_photon_movie(
    d1: int = 512,
    d2: int = 512,
    t: int = 2048,
    n_cells: int = 150,
    noise_sigma: float = 1.0,
    radius: float = 6.0,
    seed: int = 0,
) -> Array:
    """Somatic two-photon style movie: compact blobs x calcium transients
    + white noise. Returns a DEVICE (t, d1, d2) float32 array."""
    k_sp, k_tr, k_ns = jax.random.split(jax.random.PRNGKey(seed), 3)
    footprints = _gaussian_blobs(k_sp, n_cells, d1, d2, radius)       # (d1,d2,n)
    traces = _calcium_traces(k_tr, n_cells, t, rate=0.01, tau=20.0)    # (n,t)
    movie = jnp.tensordot(footprints, traces * 5.0, axes=(2, 0))       # (d1,d2,t)
    movie = jnp.moveaxis(movie, -1, 0)
    movie = movie + noise_sigma * jax.random.normal(k_ns, (t, d1, d2))
    return movie + 100.0  # camera offset


def widefield_movie(
    d1: int = 1024,
    d2: int = 1024,
    t: int = 1024,
    n_sources: int = 40,
    background_rank: int = 4,
    noise_sigma: float = 1.0,
    seed: int = 0,
) -> Array:
    """Widefield/1-photon style movie: large diffuse sources + strong smooth
    global background (hemodynamics-like) + noise."""
    k_sp, k_tr, k_bs, k_bt, k_ns = jax.random.split(jax.random.PRNGKey(seed), 5)
    footprints = _gaussian_blobs(k_sp, n_sources, d1, d2, radius=min(d1, d2) / 12.0)
    traces = _calcium_traces(k_tr, n_sources, t, rate=0.02, tau=40.0)
    movie = jnp.tensordot(footprints, traces * 3.0, axes=(2, 0))
    # global low-rank background: very smooth spatial modes x slow traces
    bg_space = _gaussian_blobs(k_bs, background_rank, d1, d2, radius=min(d1, d2) / 3.0)
    bg_time = _calcium_traces(k_bt, background_rank, t, rate=0.05, tau=100.0)
    movie = movie + jnp.tensordot(bg_space, bg_time * 10.0, axes=(2, 0))
    movie = jnp.moveaxis(movie, -1, 0)
    return movie + noise_sigma * jax.random.normal(k_ns, (t, d1, d2)) + 200.0


def voltage_movie(
    d1: int = 256,
    d2: int = 256,
    t: int = 20000,
    n_cells: int = 60,
    noise_sigma: float = 1.0,
    seed: int = 0,
) -> Array:
    """Voltage-imaging style movie: 1 kHz-like fast kinetics (short tau,
    high rate), long T — exercises the chunked/streaming temporal path."""
    k_sp, k_tr, k_ns = jax.random.split(jax.random.PRNGKey(seed), 3)
    footprints = _gaussian_blobs(k_sp, n_cells, d1, d2, radius=5.0)
    traces = _calcium_traces(k_tr, n_cells, t, rate=0.05, tau=3.0)
    movie = jnp.tensordot(footprints, traces * 8.0, axes=(2, 0))
    movie = jnp.moveaxis(movie, -1, 0)
    return movie + noise_sigma * jax.random.normal(k_ns, (t, d1, d2)) + 50.0


def volumetric_stack(
    n_planes: int = 4,
    d1: int = 256,
    d2: int = 256,
    t: int = 1024,
    seed: int = 0,
):
    """List of per-plane (t, d1, d2) device movies (BASELINE config 5)."""
    return [
        two_photon_movie(d1, d2, t, n_cells=60, seed=seed + p)
        for p in range(n_planes)
    ]
