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


def device_free_bytes(
    device, assumed_live_bytes: int = 0, pending_bytes: int = 0
):
    """Best-effort FREE HBM estimate: ``memory_stats()`` when the runtime
    reports it (minus ``pending_bytes`` — buffers that will be live at
    dispatch but are not yet allocated), else nominal HBM minus
    ``assumed_live_bytes`` (the caller's known live buffers — nominal HBM
    cannot see usage), else None. Shared by the block-batch budget and the
    coset-stage memory gate."""
    try:
        stats = device.memory_stats()
    except Exception:  # pragma: no cover - backend without memory_stats
        stats = None
    try:
        if stats and "bytes_limit" in stats:
            return int(
                stats["bytes_limit"]
                - stats.get("bytes_in_use", 0)
                - pending_bytes
            )
        from localmd_tpu.loader import nominal_hbm_bytes

        hbm = nominal_hbm_bytes(device)
        if hbm is not None:
            return int(hbm * 0.9 - assumed_live_bytes)
    except Exception:  # pragma: no cover - defensive
        pass
    return None


def block_batch_budget(
    device,
    *,
    per_block_bytes: int,
    n_blocks: int,
    block_batch_size: int,
    assumed_live_bytes: int = 0,
    pending_bytes: int = 0,
) -> int:
    """The block-stage batch size: the SINGLE source of truth shared by the
    pipeline's dispatch loop and the AOT planner (``aot.plan_block_stage``).

    Both sites previously carried their own copy of this formula; silent
    drift between them meant the stage warm never matched and the stage
    paid the cold program load again — so the budget lives here once.

    Bounds the batch so the fused chunk step's working set (patches + ~3
    same-sized intermediates = ``per_block_bytes`` each) fits: 40% of
    currently-free device memory when the runtime reports it (minus
    ``pending_bytes`` — buffers that WILL be live at dispatch but are not
    yet allocated at planning time; the dispatch site passes 0 because its
    buffers already show in ``bytes_in_use``); on devices with no memory
    introspection (the axon tunnel returns an empty dict), 40% of nominal
    HBM minus ``assumed_live_bytes`` (movie cache, init crop,
    device-resident movie — nominal HBM can't see usage, so BOTH sites
    subtract the same terms); else a 1 GB floor. Bigger chunks = fewer
    program dispatches (each costs a round trip on tunneled TPUs).

    Batch sizes below ``n_blocks`` are quantized down to a power of two:
    the batch size is a compiled-program shape, and free-memory jitter must
    not spawn new compile variants (bb == n_blocks stays: one chunk, no
    padding). Mesh divisibility rounding stays at the dispatch site.
    """
    budget = int(1e9)
    free = device_free_bytes(
        device, assumed_live_bytes=assumed_live_bytes,
        pending_bytes=pending_bytes,
    )
    if free is not None:
        budget = max(budget, int(free * 0.4))
    bb = max(16, min(block_batch_size, n_blocks, budget // per_block_bytes))
    if bb < n_blocks:
        bb = 1 << (bb.bit_length() - 1)
    return int(bb)


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
