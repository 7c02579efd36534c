"""Worker process for the REAL multi-host fan-out test (test_multihost.py).

Each worker is one ``jax.distributed`` process with 4 local virtual CPU
devices (8 global across 2 processes). It loads the shared fixture, runs the
streaming V regression over a host-spanning mesh — exercising the documented
multi-host input pipeline (docs/ARCHITECTURE.md §multi-host):
``partition_ranges_for_host`` chunk stripes -> process-local V columns ->
``jax.make_array_from_process_local_data`` assembly — and asserts its OWN
addressable shards of the assembled global array match the single-process
reference columns bit-for-bit. Shard comparison is collective-free, so the
check does not depend on cross-process CPU collectives.

Usage: python tests/_multihost_worker.py <coordinator> <num_procs> <pid>
       <fixture.npz> <out.json>
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> None:
    coordinator, num_procs, pid, fixture_path, out_path = sys.argv[1:6]
    num_procs, pid = int(num_procs), int(pid)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=pid,
    )
    assert jax.process_count() == num_procs
    assert len(jax.devices()) == 4 * num_procs

    import jax.numpy as jnp
    from jax.sharding import Mesh

    from localmd_tpu.blocksparse import BlockSparseMatrix
    from localmd_tpu.loader import PMDLoader
    from localmd_tpu.ops.tiling import BlockGrid
    from localmd_tpu.parallel.mesh import BLOCK_AXIS

    fx = np.load(fixture_path)
    movie = fx["movie"]
    d1, d2 = movie.shape[1], movie.shape[2]
    grid = BlockGrid(d1, d2, (int(fx["b1"]), int(fx["b2"])))
    u = BlockSparseMatrix(
        jnp.asarray(fx["panels"]),
        jnp.asarray(grid.rows),
        d1 * d2,
        jnp.asarray(fx["dense_basis"]),
    )
    p = jnp.asarray(fx["p"])
    v_ref = fx["v_ref"]

    # Both processes read the same "shared storage" (the fixture movie);
    # each streams only its own chunk stripe. The stats pass is distributed
    # too: per-host partial accumulators + one cross-host allgather
    # (loader._initialize_normalizers); frame_constant=128 gives each of
    # the two hosts one stats chunk, so the accumulation is genuinely
    # split across processes.
    loader = PMDLoader(
        movie, background_rank=0, seed=0,
        batch_size=int(fx["batch_size"]),
        frame_constant=int(fx["frame_constant"]),
    )
    np.testing.assert_array_equal(np.asarray(loader.mean_img), fx["mean_img"])
    np.testing.assert_array_equal(np.asarray(loader.std_img), fx["std_img"])
    mesh = Mesh(np.asarray(jax.devices()), (BLOCK_AXIS,))
    v = loader.v_projection(u, p, mesh=mesh)

    assert v.shape == tuple(v_ref.shape), (v.shape, v_ref.shape)
    shards = v.addressable_shards
    assert len(shards) == 4  # this process's devices only
    checked_cols = 0
    for shard in shards:
        sl = shard.index[1]
        np.testing.assert_array_equal(
            np.asarray(shard.data), v_ref[:, sl]
        )
        checked_cols += int(np.asarray(shard.data).shape[1])

    with open(out_path, "w") as f:
        json.dump(
            {
                "ok": True,
                "pid": pid,
                "checked_cols": checked_cols,
                "global_shape": [int(x) for x in v.shape],
                "stats_checked": True,
            },
            f,
        )


if __name__ == "__main__":
    main()
