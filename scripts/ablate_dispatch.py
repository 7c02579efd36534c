"""Quantify per-dispatch wall latency vs device compute on the tunneled TPU.

NOTE: on the axon platform ``jax.block_until_ready`` returns immediately;
the only reliable fence is a device->host transfer of a value that depends
on the computation. Every timing here drains via ``float(...)`` of a scalar
reduction of the output.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp


def drain(out):
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "ravel")]
    return float(jnp.sum(leaves[0].ravel()[:1]))


x = jnp.ones((8, 128), jnp.float32)
big = jnp.ones((4096, 4096), jnp.float32)

tiny = jax.jit(lambda a: a + 1.0)
heavy = jax.jit(lambda a: (a @ a @ a @ a)[:1, :1])

for label, fn, arg in (("tiny add (8,128)", tiny, x), ("4x matmul 4096^2", heavy, big)):
    drain(fn(arg))
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        drain(fn(arg))
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    print(f"{label:22s} min {times[0]:7.2f} ms  median {times[5]:7.2f} ms  max {times[-1]:7.2f} ms")

# back-to-back dispatches, one sync at the end: is the RTT paid per dispatch
# or once per drain?
drain(tiny(x))
for n in (1, 20):
    t0 = time.perf_counter()
    out = x
    for _ in range(n):
        out = tiny(out)
    drain(out)
    print(f"{n:2d} chained tiny dispatches, one sync: {(time.perf_counter()-t0)*1e3:8.2f} ms total")
