"""Background AOT warm-compilation of the block-stage program.

On tunneled/remote TPUs every distinct compiled program pays a one-time
LOAD through the link on top of XLA compilation — for the fused window-0
chunk program this dominated the north-star run's block stage (263 s cold
vs 8.8 s with the program resident, BENCH_NORTHSTAR r03). Meanwhile the
pipeline's FIRST phase — the statistics pass — is pure link time: the whole
movie streams host->device with no compilation in flight.

This module overlaps the two. As soon as the loader commits to its HBM
cache plan (the first thing its stats pass does), the pipeline starts a
daemon thread that lowers + compiles ``engine.window0_chunk_step`` for the
exact shapes the block stage will use; by the time the block stage
dispatches, the program is typically resident and the stage pays only
compute.

Correctness is never at stake: the precompiled executable IS the program
the traced call would build (same statics, same shapes), and it is used
only when the block stage's actual batch geometry matches the plan —
any mismatch (free-memory-dependent batch size, OOM-halved retries,
sharded/mesh runs) silently falls back to the ordinary traced dispatch.
A wrong plan therefore wastes a background compile, nothing more.

The reference has no equivalent (it has no AOT story and no remote-device
program-load cost model); this is the rebuild's own pipeline optimization.
"""

from __future__ import annotations

import threading
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from localmd_tpu import engine
from localmd_tpu.utils import get_logger

logger = get_logger()


class BlockProgramWarmer:
    """Compiles the window-0 chunk program on a background thread and hands
    it to the block stage if (and only if) the planned geometry matches."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._compiled = None
        self._plan = None
        self.used = False          # diagnostics: did the block stage hit?
        self.compile_error = None

    def start(
        self,
        *,
        d1: int,
        d2: int,
        t_data: int,
        bb: int,
        b1: int,
        b2: int,
        max_components: int,
        temporal_avg_factor: int,
        spatial_avg_factor: int,
        max_consecutive_failures: int,
        spatial_denoiser: Callable,
        temporal_denoiser: Callable,
        t_used: int,
        device=None,
    ) -> None:
        """Begin compiling in the background for the given geometry."""
        if self._thread is not None:
            return
        self._plan = (
            (d1, d2, t_data), bb,
            (b1, b2, max_components, temporal_avg_factor, spatial_avg_factor,
             max_consecutive_failures, spatial_denoiser, temporal_denoiser,
             t_used),
        )

        # jax config contexts (default_matmul_precision, default_device) are
        # THREAD-LOCAL: snapshot the caller's effective values here and
        # re-enter them in the worker, or a matmul_precision="highest" run
        # would silently get a default-precision (one-pass bf16) block
        # program — the geometry check cannot see precision.
        try:
            precision = jax.config.jax_default_matmul_precision
        except AttributeError:  # pragma: no cover - config name drift
            precision = None

        def _compile():
            try:
                args = (
                    jax.ShapeDtypeStruct((d1, d2, t_data), jnp.float32),
                    jax.ShapeDtypeStruct((bb, 2), jnp.int32),
                    jax.ShapeDtypeStruct((bb, 2), jnp.uint32),
                    b1, b2, max_components,
                    temporal_avg_factor, spatial_avg_factor,
                    jax.ShapeDtypeStruct((), jnp.float32),
                    jax.ShapeDtypeStruct((), jnp.float32),
                    max_consecutive_failures,
                    spatial_denoiser, temporal_denoiser, t_used,
                )
                from contextlib import ExitStack

                with ExitStack() as stack:
                    if device is not None:
                        stack.enter_context(jax.default_device(device))
                    if precision is not None:
                        stack.enter_context(
                            jax.default_matmul_precision(precision)
                        )
                    self._compiled = engine.window0_chunk_step.lower(
                        *args
                    ).compile()
            except Exception as e:  # noqa: BLE001 - warm-up must never kill a run
                self.compile_error = e
                logger.debug("background AOT compile failed: %s", e)

        self._thread = threading.Thread(
            target=_compile, name="localmd-aot-warm", daemon=True
        )
        self._thread.start()

    def get(self, data_shape, batch_size: int, statics: tuple):
        """The compiled program if it matches the actual block-stage
        geometry AND static arguments (joining the background thread
        first), else None. The statics check matters: a mismatched
        max_components would change the program's OUTPUT shapes, not just
        its speed."""
        if self._thread is None:
            return None
        # plan check BEFORE join: a mispredicted plan must not stall the
        # block stage behind a compile whose result will be discarded
        shape_p, bb, statics_p = self._plan
        if (
            tuple(data_shape) != shape_p
            or batch_size != bb
            or statics != statics_p
        ):
            return None
        self._thread.join()
        return self._compiled

    def __call__(self, data, starts, keys, spatial_threshold, temporal_threshold):
        """Dispatch through the precompiled executable. Thresholds may be
        host floats (checkpointed runs) or device scalars; AOT executables
        are strict about argument avals, so coerce to () float32."""
        out = self._compiled(
            data,
            starts,
            keys,
            jnp.asarray(spatial_threshold, jnp.float32),
            jnp.asarray(temporal_threshold, jnp.float32),
        )
        self.used = True
        return out


def plan_block_stage(
    *,
    shape,
    frame_range: int,
    window_chunks: Optional[int],
    block_sizes,
    max_components: int,
    temporal_avg_factor: int,
    spatial_avg_factor: int,
    block_batch_size: int,
    cache_target_frames: int,
    cache_itemsize: int,
    device_resident_bytes: int,
    device,
) -> Optional[dict]:
    """Predict the block stage's geometry from quantities known BEFORE the
    statistics pass streams: dataset shape, the pipeline's deterministic
    clamp chain (mirrors localmd_decomposition's t_init / max_components /
    crop logic — none of it consumes RNG), and the loader's committed HBM
    cache plan. Returns None when the single-window fused path won't be
    taken (multi-window runs load several smaller programs instead).

    The prediction only gates a background warm-compile; the dispatch-time
    shape check in :meth:`BlockProgramWarmer.get` is what guarantees the
    precompiled program is byte-compatible with the actual call.
    """
    from localmd_tpu.loader import nominal_hbm_bytes
    from localmd_tpu.ops.tiling import block_grid, update_block_sizes

    t_total, d1, d2 = (int(x) for x in shape)
    wc = frame_range if window_chunks is None else window_chunks
    if t_total < frame_range:
        t_init = t_total
        wc = min(wc, t_total)
    else:
        wc = min(wc, frame_range)
        # identify_window_chunks emits num_intervals chunks of wc frames
        t_init = -(-frame_range // wc) * wc
    try:
        b1, b2 = update_block_sizes(tuple(block_sizes), (d1, d2))
    except ValueError:
        return None
    if temporal_avg_factor >= t_init:
        return None
    if t_init // temporal_avg_factor <= max_components:
        max_components = int(t_init // temporal_avg_factor)
    sketch_limit = min(
        t_init // temporal_avg_factor,
        (b1 // spatial_avg_factor + (b1 % spatial_avg_factor > 0))
        * (b2 // spatial_avg_factor + (b2 % spatial_avg_factor > 0)),
    ) - 10
    if max_components > sketch_limit:
        max_components = int(sketch_limit)
    if max_components <= 0:
        return None
    crop_avg_constant = (t_init // temporal_avg_factor) * temporal_avg_factor
    if min(wc, crop_avg_constant) < crop_avg_constant:
        return None  # multi-window path

    n_blocks = block_grid(d1, d2, (b1, b2)).n_blocks
    # mirror the pipeline's batch-size budget (nominal-HBM branch; the
    # memory_stats branch depends on post-cache free memory, in which case
    # the plan may miss and dispatch falls back)
    per_block_bytes = b1 * b2 * crop_avg_constant * 4 * 4
    budget = int(1e9)
    try:
        stats = device.memory_stats()
    except Exception:
        stats = None
    if stats and "bytes_limit" in stats:
        used = (
            d1 * d2 * crop_avg_constant * 4
            + cache_target_frames * d1 * d2 * cache_itemsize
            + device_resident_bytes
        )
        free = stats["bytes_limit"] - stats.get("bytes_in_use", 0) - used
        budget = max(budget, int(free * 0.4))
    else:
        hbm = nominal_hbm_bytes(device)
        if hbm is not None:
            used = (
                d1 * d2 * crop_avg_constant * 4
                + cache_target_frames * d1 * d2 * cache_itemsize
                + device_resident_bytes
            )
            budget = max(budget, int((hbm * 0.9 - used) * 0.4))
    bb = max(16, min(block_batch_size, n_blocks, budget // per_block_bytes))
    if bb < n_blocks:
        bb = 1 << (bb.bit_length() - 1)
    return dict(
        d1=d1, d2=d2, t_data=t_init, bb=bb, b1=b1, b2=b2,
        max_components=max_components,
        crop_avg_constant=crop_avg_constant,
    )
