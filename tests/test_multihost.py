"""REAL multi-process fan-out test.

Everything else in the suite simulates multi-host by patching
``jax.process_count``; this test launches TWO actual ``jax.distributed``
processes (CPU backend, 4 virtual devices each, coordinator on localhost)
and runs the streaming V regression over a host-spanning 8-device mesh —
the documented multi-host input pipeline (docs/ARCHITECTURE.md §multi-host):

  - each process streams only its contiguous chunk stripe
    (``partition_ranges_for_host``),
  - per-stripe V columns assemble into ONE global frames-sharded array via
    ``jax.make_array_from_process_local_data`` with zero cross-host V bytes,
  - each process's addressable shards match the single-process reference
    columns bit-for-bit (computed here, in the parent).
"""

import json
import os
import socket
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from localmd_tpu.blocksparse import BlockSparseMatrix
from localmd_tpu.loader import PMDLoader
from localmd_tpu.ops.tiling import BlockGrid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_v_regression_fan_out(tmp_path, rng):
    t, d1, d2 = 256, 20, 20
    b1 = b2 = 10
    batch_size = 64  # 64-frame chunks -> stripes align with process shards
    frame_constant = 128  # 2 stats chunks -> one per host: split accumulation

    movie = (rng.standard_normal((t, d1, d2)) + 4).astype(np.float32)
    grid = BlockGrid(d1, d2, (b1, b2))
    panels = rng.standard_normal(
        (grid.n_blocks, grid.pixels_per_block, 3)
    ).astype(np.float32)
    dense_basis = np.zeros((d1 * d2, 1), np.float32)
    u = BlockSparseMatrix(
        jnp.asarray(panels), jnp.asarray(grid.rows), d1 * d2,
        jnp.asarray(dense_basis),
    )
    p = rng.standard_normal((u.shape[1], 5)).astype(np.float32)

    # single-process reference, same chunk sizes as the workers' stripes
    loader = PMDLoader(
        movie, background_rank=0, seed=0, batch_size=batch_size,
        frame_constant=frame_constant,
    )
    v_ref = np.asarray(loader.v_projection(u, jnp.asarray(p)))
    assert v_ref.shape == (5, t)

    fixture = tmp_path / "fixture.npz"
    np.savez(
        fixture, movie=movie, panels=panels, dense_basis=dense_basis,
        p=p, v_ref=v_ref, b1=b1, b2=b2, batch_size=batch_size,
        frame_constant=frame_constant,
        mean_img=np.asarray(loader.mean_img),
        std_img=np.asarray(loader.std_img),
    )

    coordinator = f"127.0.0.1:{_free_port()}"
    env = {
        **os.environ,
        "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    }
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"ok-{pid}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, coordinator, "2", str(pid),
                 str(fixture), str(out)],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for proc in procs:
        try:
            stdout, _ = proc.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for kill in procs:
                kill.kill()
            pytest.fail("multi-host worker timed out (coordinator hang?)")
        logs.append(stdout.decode(errors="replace"))
    for pid, (proc, log) in enumerate(zip(procs, logs)):
        assert proc.returncode == 0, f"worker {pid} failed:\n{log}"

    total_cols = 0
    for pid, out in enumerate(outs):
        result = json.loads(out.read_text())
        assert result["ok"] and result["pid"] == pid
        assert result["global_shape"] == [5, t]
        total_cols += result["checked_cols"]
    # the two processes' addressable shards tile the full frames axis
    assert total_cols == t
