"""PRNG key helpers.

The reference draws jax PRNG keys from the *numpy* global RNG
(reference decomposition.py:134-144, duplicated at pmd_loader.py:33-43), which
makes runs unseedable-in-one-place and forces 250 separate host->device key
transfers during threshold calibration. We instead thread a single jax key
through the pipeline functionally and split it; ``make_key`` exists for API
compatibility / interactive use.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def make_key_with_seed(seed: Optional[int] = None):
    """(key, effective_seed): like :func:`make_key` but also returns the
    host-side integer the key was built from, so callers can form cache
    tokens without a device->host pull of the key value."""
    if seed is None:
        ii32 = np.iinfo(np.int32)
        seed = int(np.random.randint(low=ii32.min, high=ii32.max, dtype=np.int32))
    return jax.random.PRNGKey(seed), seed


def make_key(seed: Optional[int] = None) -> jax.Array:
    """Return a jax PRNG key. If ``seed`` is None, draw one from numpy's RNG
    (matching the reference's behavior of seeding from ``np.random``)."""
    return make_key_with_seed(seed)[0]


def split_keys(key: jax.Array, n: int) -> jax.Array:
    """Split a key into ``n`` keys, shape (n, 2) — used to vmap simulations."""
    return jax.random.split(key, n)


# Reference-name alias (reference decomposition.py:134-144 / pmd_loader.py:33)
make_jax_random_key = make_key
