"""Ambient-device helpers.

Plane-parallel volumetric runs pin each plane's pipeline to its own chip via
``with jax.default_device(dev)`` (a thread-local config context). Code that
(a) keys per-device caches, (b) reads ``memory_stats`` to size HBM budgets,
or (c) stages host->device transfers from a helper thread must resolve the
device the SAME way jax placement will — the thread-local default when one
is set, the process default otherwise — or it reasons about (and transfers
to) the wrong chip.
"""

from __future__ import annotations

import jax


def ambient_device():
    """The jax default device set via ``jax.default_device`` (thread-local),
    or None when unset (process default placement)."""
    try:
        return jax.config.jax_default_device
    except AttributeError:  # config name drift across jax versions
        return None


def ambient_device_or_first():
    """The ambient default device, falling back to ``jax.devices()[0]`` —
    for memory_stats / budget probes that need a concrete device."""
    dev = ambient_device()
    return dev if dev is not None else jax.devices()[0]


def is_device_oom(e: BaseException) -> bool:
    """True iff ``e`` is the runtime's typed device-OOM error.

    The multi-tenant retry scopes (stats pass, init-frame load, block stage,
    projector/V phase) must only retry genuine RESOURCE_EXHAUSTED failures:
    a bare ``"RESOURCE_EXHAUSTED" in str(e)`` would also match user
    exceptions that merely quote the word, and silently matching on message
    text alone is brittle across jaxlib rewordings of *other* errors. So:
    the exception must be the runtime's typed error (``jax.errors.
    JaxRuntimeError``, the public alias of jaxlib's XlaRuntimeError) AND
    carry the canonical absl status-code token, which is the stable
    machine-readable part of the message (jaxlib prefixes every status-based
    error with its code name)."""
    try:
        from jax.errors import JaxRuntimeError
    except ImportError:  # pragma: no cover - ancient jax
        JaxRuntimeError = ()
    return isinstance(e, JaxRuntimeError) and "RESOURCE_EXHAUSTED" in str(e)
