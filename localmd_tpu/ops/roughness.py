"""Roughness statistics + rank-selection fitness test.

The statistical heart of PMD rank selection: signal components are spatially
and temporally *smoother* than noise. Parity targets:

- ``spatial_roughness_stat`` (reference evaluation.py:84-111): mean absolute
  neighbor difference (vertical + horizontal) divided by mean absolute value.
- ``temporal_roughness_stat`` (reference evaluation.py:114-126): mean absolute
  second difference divided by mean absolute value.
- ``evaluate_fitness`` / ``construct_final_fitness_decision``
  (reference evaluation.py:133-192).
- ``filter_by_failures`` (reference evaluation.py:195-222) — reimplemented as
  a device-side ``lax.scan`` over the component axis (batched over blocks)
  instead of a host Python loop, so the whole decision pipeline stays on-chip.

All statistics are written with plain axis reductions over trailing dims so a
leading component/block batch comes for free (no per-component vmap needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def l1_norm(data: Array) -> Array:
    """Overall L1 norm (reference evaluation.py:11-24)."""
    return jnp.sum(jnp.abs(data))


def trend_filter_stat(trace: Array) -> Array:
    """Sum of absolute second differences of traces (..., T) -> (...,)
    (reference evaluation.py:27-45; defined but unused by the pipeline)."""
    second_diff = 2.0 * trace[..., 1:-1] - trace[..., :-2] - trace[..., 2:]
    return jnp.sum(jnp.abs(second_diff), axis=-1)


def total_variation_stat(img: Array) -> Array:
    """8-neighbor total variation of images (..., d1, d2) -> (...,)
    (reference evaluation.py:48-81; defined but unused by the pipeline)."""
    center = img[..., 1:-1, 1:-1]
    acc = jnp.zeros_like(center)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            shifted = img[..., 1 + dy : img.shape[-2] - 1 + dy,
                          1 + dx : img.shape[-1] - 1 + dx]
            acc = acc + jnp.abs(center - shifted)
    return jnp.sum(acc, axis=(-2, -1))


def spatial_roughness_stat(u: Array) -> Array:
    """Roughness of images ``u`` shaped (..., d1, d2) -> (...,)."""
    vert = jnp.abs(u[..., 1:, :] - u[..., :-1, :])
    horiz = jnp.abs(u[..., :, 1:] - u[..., :, :-1])
    d1, d2 = u.shape[-2], u.shape[-1]
    denom_count = (d1 - 1) * d2 + d1 * (d2 - 1)
    avg_diff = (jnp.sum(vert, axis=(-2, -1)) + jnp.sum(horiz, axis=(-2, -1))) / denom_count
    avg_elem = jnp.mean(jnp.abs(u), axis=(-2, -1))
    return avg_diff / avg_elem


def temporal_roughness_stat(v: Array) -> Array:
    """Roughness of traces ``v`` shaped (..., T) -> (...,)."""
    second_diff = jnp.abs(v[..., :-2] + v[..., 2:] - 2.0 * v[..., 1:-1])
    return jnp.mean(second_diff, axis=-1) / jnp.mean(jnp.abs(v), axis=-1)


def evaluate_fitness(
    images: Array,
    traces: Array,
    spatial_threshold: Array | float,
    temporal_threshold: Array | float,
) -> Array:
    """Keep-decision per component.

    Args:
        images: (..., r, d1, d2) component images.
        traces: (..., r, T) component traces.

    Returns:
        (..., r) int32 — 1 to keep (both stats below threshold), else 0.
        (Reference returns the same 0/1 ints, evaluation.py:133-164.)
    """
    s_stat = spatial_roughness_stat(images)
    t_stat = temporal_roughness_stat(traces)
    keep = (s_stat < spatial_threshold) & (t_stat < temporal_threshold)
    return keep.astype(jnp.int32)


def filter_by_failures(decisions: Array, max_consecutive_failures: int) -> Array:
    """Device-side reformulation of the reference's sequential failure filter.

    Semantics (reference evaluation.py:195-222): walk components in singular-
    value order; a failing component is still *kept* until the
    ``max_consecutive_failures``-th consecutive failure is reached (that
    component is kept too); every component after that point is dropped.
    Consecutive-failure count resets on success.

    Implemented as ``lax.scan`` with carry (consecutive_failures, dead) over
    the component axis; batched over any leading dims via vmap-free scan on
    stacked carries.

    Args:
        decisions: (..., r) bool/int array of raw fitness decisions.

    Returns:
        (..., r) bool array of final keep decisions.
    """
    decisions = decisions.astype(bool)
    batch_shape = decisions.shape[:-1]
    flat = decisions.reshape((-1, decisions.shape[-1]))

    def step(carry, dec_k):
        consec, dead = carry
        fail = ~dec_k
        new_consec = jnp.where(fail, consec + 1, 0)
        hit_limit = fail & (new_consec == max_consecutive_failures)
        keep = ~dead  # every component before death is kept (failures flipped)
        new_dead = dead | hit_limit
        # reset counter on success only matters while alive; once dead it is moot
        return (new_consec, new_dead), keep

    n = flat.shape[0]
    init = (jnp.zeros((n,), jnp.int32), jnp.zeros((n,), bool))
    _, kept = jax.lax.scan(step, init, jnp.moveaxis(flat, -1, 0))
    kept = jnp.moveaxis(kept, 0, -1)
    return kept.reshape(batch_shape + (decisions.shape[-1],))


def filter_by_failures_np(decisions: np.ndarray, max_consecutive_failures: int) -> np.ndarray:
    """Host oracle with the reference's exact sequential semantics (for tests)."""
    decisions = np.array(decisions, dtype=bool, copy=True)
    out = np.empty_like(decisions)
    number_of_failures = 0
    dead = False
    for k in range(decisions.shape[0]):
        if dead:
            out[k] = False
        elif not decisions[k]:
            number_of_failures += 1
            out[k] = True
            if number_of_failures == max_consecutive_failures:
                dead = True
        else:
            number_of_failures = 0
            out[k] = True
    return out


def construct_final_fitness_decision(
    images: Array, traces: Array, spatial_threshold, temporal_threshold
) -> Array:
    """Reference-signature adapter (reference evaluation.py:167-192):
    images (d1, d2, r) and traces (T, r) — component axis LAST — returning
    (r,) 0/1 decisions. The batched pipeline uses :func:`evaluate_fitness`
    (component axis leading) directly."""
    return evaluate_fitness(
        jnp.moveaxis(images, -1, 0),
        jnp.swapaxes(traces, -1, -2),
        spatial_threshold,
        temporal_threshold,
    )
