"""Shared async-dispatch timing harness for the measurement scripts.

On the tunneled TPU, ``block_until_ready`` is a no-op and every D2H fence
costs one ~28 ms round trip, which drowns per-op timing. The method used
by every ablation/profile script in this directory: measure the fence RTT
once (min of several bare fences), then time n back-to-back ASYNC
dispatches closed by ONE fence and subtract the RTT — per-op resolution
well below the RTT. The README/ARCHITECTURE numbers depend on this
methodology living in exactly one place.
"""

import time

import jax.numpy as jnp

_RTT = [0.0]


def fence(x):
    """One scalar D2H pull — the only reliable device sync on axon."""
    return float(jnp.sum(jnp.ravel(x)[:1]))


def _fence_out(out):
    fence(out[0] if isinstance(out, tuple) else out)


def measure_rtt(reps: int = 7) -> float:
    """Per-fence D2H round trip (min of ``reps``); stored for timed()."""
    x = jnp.ones((8,), jnp.float32)
    fence(x)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(x)
        best = min(best, time.perf_counter() - t0)
    _RTT[0] = best
    return best


def timed(fn, *args, n: int = 16, reps: int = 3):
    """Per-execution seconds of ``fn(*args)``: n async dispatches, one
    closing fence, RTT subtracted, min over ``reps`` rounds. Returns
    (seconds, last_output). Call :func:`measure_rtt` first."""
    out = fn(*args)
    _fence_out(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _fence_out(out)
        best = min(best, (time.perf_counter() - t0 - _RTT[0]) / n)
    return max(0.0, best), out
