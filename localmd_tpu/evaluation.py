"""Drop-in namespace mirroring ``localmd.evaluation``.

Reference symbol surface (reference evaluation.py) over the batched
roughness/fitness kernels in :mod:`localmd_tpu.ops.roughness`. The
``*_vmap`` adapters keep the reference's axis conventions (component axis
LAST for images, trace/component layouts as the reference vmaps them,
evaluation.py:129-130, 164).
"""

import jax.numpy as jnp

from localmd_tpu.ops.roughness import (
    construct_final_fitness_decision,
    evaluate_fitness,
    filter_by_failures,
    l1_norm,
    spatial_roughness_stat,
    temporal_roughness_stat,
    total_variation_stat,
    trend_filter_stat,
)
from localmd_tpu.ops.roughness import filter_by_failures_np


def spatial_roughness_stat_vmap(u):
    """(d1, d2, r) images, component axis last (reference evaluation.py:129)
    -> (r,) stats."""
    return spatial_roughness_stat(jnp.moveaxis(jnp.asarray(u), -1, 0))


def temporal_roughness_stat_vmap(v):
    """(r, t) traces (reference evaluation.py:130) -> (r,) stats."""
    return temporal_roughness_stat(jnp.asarray(v))


def evaluate_fitness_vmap(images, traces, spatial_threshold, temporal_threshold):
    """Reference axis convention (evaluation.py:164): images (d1, d2, r),
    traces (t, r) -> (r,) 0/1 decisions."""
    return evaluate_fitness(
        jnp.moveaxis(jnp.asarray(images), -1, 0),
        jnp.asarray(traces).T,
        spatial_threshold,
        temporal_threshold,
    )


__all__ = [
    "l1_norm",
    "trend_filter_stat",
    "total_variation_stat",
    "spatial_roughness_stat",
    "temporal_roughness_stat",
    "spatial_roughness_stat_vmap",
    "temporal_roughness_stat_vmap",
    "evaluate_fitness",
    "evaluate_fitness_vmap",
    "construct_final_fitness_decision",
    "filter_by_failures",
    "filter_by_failures_np",
]
