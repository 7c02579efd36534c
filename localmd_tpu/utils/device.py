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


_TRANSIENT_BUDGET_CACHE: dict = {}


def transient_budget_bytes(device=None) -> int:
    """Per-dispatch transient-buffer budget scaled to the device: HBM/16,
    floored at 1 GiB.

    The chunked paths (blocked-sparse matmuls, stream chunk sizing) bound
    their intermediates with this. A fixed 1 GiB is right for a 16 GB v5e
    (1/16th of HBM) but leaves dispatch count on the table on a 95 GB v5p —
    every extra chunk costs a program dispatch, and on tunneled devices a
    round trip. HBM is read from ``memory_stats()`` when the runtime
    reports it, else the nominal per-kind table; unknown devices (CPU test
    meshes) keep the 1 GiB floor so test behavior is hardware-independent.
    """
    dev = device if device is not None else ambient_device_or_first()
    key = getattr(dev, "id", None), getattr(dev, "device_kind", None)
    cached = _TRANSIENT_BUDGET_CACHE.get(key)
    if cached is not None:
        return cached
    hbm = None
    try:
        stats = dev.memory_stats()
        if stats and "bytes_limit" in stats:
            hbm = float(stats["bytes_limit"])
    except Exception:  # pragma: no cover - backend without memory_stats
        pass
    if hbm is None:
        from localmd_tpu.loader import nominal_hbm_bytes

        hbm = nominal_hbm_bytes(dev)
    budget = max(1 << 30, int(hbm / 16)) if hbm else 1 << 30
    _TRANSIENT_BUDGET_CACHE[key] = budget
    return budget


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
