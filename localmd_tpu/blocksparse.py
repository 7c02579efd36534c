"""Device-side blocked-sparse spatial matrix ``U``.

The reference assembles its global spatial basis as a scipy COO matrix built
from Python lists (reference decomposition.py:818-843) and then does sparse
CPU matmuls (``u.T.dot(u)``, BCOO products) for the factorized SVD and the
streaming temporal regression (reference decomposition.py:974-981,
pmd_loader.py:327). On TPU we exploit the *known* block structure instead:

``U`` is stored as dense per-block panels ``(n_blocks, p, S)`` (p = pixels
per block, S = component slots, zero-padded past each block's kept rank)
plus a static row-id map ``(n_blocks, p)``, and an extra dense column block
for the global low-rank background basis. Every product we need is then a
batched dense matmul on the MXU plus one gather or scatter-add:

- ``U @ X``   : gather X rows per block -> batched matmul -> scatter-add.
- ``U.T @ Y`` : gather Y rows per block -> batched (S,p)x(p,m) matmul.
- ``right.T (U.T U) right`` : composition of the two, column-chunked, never
  materializing the (R, R) Gram matrix.

Zero-padded slots are exact zero columns: they contribute nothing to any
product and surface as zero eigenvalues that the factorized-SVD stage drops,
exactly like the reference's ``eig_vals > 0`` cut
(reference decomposition.py:988-990). Columns are compacted only at scipy-CSR
export time (serialization parity with the reference .npz convention).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

import scipy.sparse


def _mm(a: Array, b: Array) -> Array:
    return jnp.matmul(a, b, preferred_element_type=jnp.float32)


# Budget for the (blocks, p, m) batched-matmul intermediate; the block axis
# is chunked so this is never exceeded (a 1024^2 FOV with 2.6k blocks and a
# 1k-frame right-hand side would otherwise materialize ~17 GB). Scaled to
# the device: HBM/16 with a 1 GiB floor (utils.device.transient_budget_bytes)
# — a fixed 1 GiB would leave dispatch count on the table on 95 GB chips.


# test/debug override: a number here pins the budget (None = device-scaled)
_INTERMEDIATE_BUDGET_BYTES = None


def _intermediate_budget() -> int:
    if _INTERMEDIATE_BUDGET_BYTES is not None:
        return _INTERMEDIATE_BUDGET_BYTES
    from localmd_tpu.utils import transient_budget_bytes

    return transient_budget_bytes()


def _block_group_size(p: int, m: int) -> int:
    return max(8, int(_intermediate_budget() // (p * m * 4)))


@partial(jax.jit, donate_argnums=(0,))
def _matmul_accum(out: Array, panels: Array, rows: Array, x_block: Array) -> Array:
    """out (n_pixels, m) += scatter(panels (g, p, S) @ x_block (g, S, m))."""
    contrib = _mm(panels, x_block)                       # (g, p, m)
    return out.at[rows.reshape(-1)].add(contrib.reshape(-1, contrib.shape[-1]))


def _coset_tile(contrib: Array, meta, b1: int, b2: int) -> Array:
    """One coset's (nc1*nc2, b1*b2, m) F-order panel contributions as a
    contiguous (h, w, m) image tile (blocks within a coset are pairwise
    disjoint on a uniform sub-grid; see BlockGrid.cosets)."""
    nc1, nc2, st1, st2, _, _ = meta
    m = contrib.shape[-1]
    # F-order panel row r = i + j*b1 -> (j, i) image axes
    c = contrib.reshape(nc1, nc2, b2, b1, m)
    c = jnp.transpose(c, (0, 3, 1, 2, 4))          # (nc1, b1, nc2, b2, m)
    if st1 > b1 or st2 > b2:
        # odd block sizes: sub-grid stride exceeds the block, pad the gaps
        # (even blocks have st == b and skip the copy)
        c = jnp.pad(c, ((0, 0), (0, st1 - b1), (0, 0), (0, st2 - b2), (0, 0)))
    c = c.reshape(nc1 * st1, nc2 * st2, m)
    h = (nc1 - 1) * st1 + b1
    w = (nc2 - 1) * st2 + b2
    return c[:h, :w]


@partial(jax.jit, static_argnums=(4, 5, 6), donate_argnums=(0,))
def _coset_accum(
    canvas: Array, panels: Array, x_block: Array, idx: Array, meta,
    b1: int, b2: int,
) -> Array:
    """canvas (d1, d2, m) += one coset's placed panel contributions.

    XLA's scatter-add serializes per-row updates (139 ms at 1024^2 FOV /
    m=337 on v5e, vs 25 ms for the matmul itself) and per-pixel gathers pay
    an 8-sublane tile read amplification; the coset form touches only
    sequential full-bandwidth tiles (transpose/reshape/pad/add). One jit
    call PER COSET with a donated canvas keeps peak transient memory to a
    single coset's chain instead of letting the scheduler hold all cosets'
    intermediates live at once — the fused all-cosets variant OOMed a v5e
    at 1024^2 alongside a device-resident movie. Measured at 1024^2/m=340
    (one process, in sequence): scatter 251-313 ms, this pad+add form
    220-226 ms, a static-slice ``.at[h0:h1, w0:w1].add`` form 339 ms —
    pad-then-full-canvas-add is the fastest XLA lowering of the three."""
    d1, d2 = canvas.shape[0], canvas.shape[1]
    a1, a2 = meta[4], meta[5]
    tile = _coset_tile(
        _mm(jnp.take(panels, idx, axis=0), jnp.take(x_block, idx, axis=0)),
        meta, b1, b2,
    )
    h, w = tile.shape[0], tile.shape[1]
    return canvas + jnp.pad(tile, ((a1, d1 - a1 - h), (a2, d2 - a2 - w), (0, 0)))


@partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
def _flatten_write_cols(out: Array, canvas: Array, s: Array, order: str) -> Array:
    """out[:, s:s+mc] = flatten_fov(canvas) with a donated output buffer
    (no concat spike: the column-chunked matmul would otherwise hold both
    the chunk list and its concatenation alive)."""
    from localmd_tpu.ops.tiling import flatten_fov

    return jax.lax.dynamic_update_slice(
        out, flatten_fov(canvas, order), (jnp.int32(0), s)
    )


@jax.jit
def _rmatmul_group(panels: Array, rows: Array, y: Array) -> Array:
    """(n_pixels, m) -> (g, S, m) via gather + batched panel^T matmul."""
    gathered = y[rows]                                   # (g, p, m)
    return _mm(jnp.swapaxes(panels, -1, -2), gathered)   # (g, S, m)


@dataclass
class BlockSparseMatrix:
    """U = [block panels | dense background basis], shape (n_pixels, R).

    R = n_blocks * slots + dense_basis.shape[1]. Column j of block b lives at
    global index b * slots + j; background columns follow at the end
    (mirroring the reference's ``hstack([u, spatial_bg])``,
    decomposition.py:929-930).
    """

    panels: Array            # (n_blocks, p, S) float32
    rows: Array              # (n_blocks, p) int32 global pixel ids
    n_pixels: int
    dense_basis: Array       # (n_pixels, K) float32 (background; K >= 0)
    # Optional geometry (set by the pipeline) enabling the fused Pallas
    # reconstruction path: block offsets and (b1, b2) block shape.
    starts: Optional[Array] = None
    block_shape: Optional[Tuple[int, int]] = None
    # Optional coset placement info (BlockGrid.coset_info()): routes
    # ``matmul``'s overlap-add through disjoint-coset pad/transpose/reshape
    # instead of an XLA scatter-add (2.5x+ at 1024^2 FOV).
    coset_info: Optional[tuple] = None

    @property
    def n_blocks(self) -> int:
        return self.panels.shape[0]

    @property
    def slots(self) -> int:
        return self.panels.shape[2]

    @property
    def n_block_cols(self) -> int:
        return self.n_blocks * self.slots

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_pixels, self.n_block_cols + self.dense_basis.shape[1])

    # -- products -----------------------------------------------------------

    def matmul(self, x: Array) -> Array:
        """U @ x for x of shape (R, m) -> (n_pixels, m). The block axis is
        chunked so the (g, p, m) intermediate stays within budget; the
        accumulator buffer is donated between chunks (no copies)."""
        x = jnp.asarray(x)
        nb = self.n_block_cols
        m = x.shape[-1]
        x_block = x[:nb].reshape(self.n_blocks, self.slots, m)
        if self.coset_info is not None and self.block_shape is not None:
            idxs, metas, d1, d2, order, _ = self.coset_info
            b1, b2 = self.block_shape
            # chunk COLUMNS so one chunk's canvas + single-coset transients
            # (~4 FOV-column-chunk-sized buffers) stay within budget
            mc = max(
                32, int(_intermediate_budget() // (self.n_pixels * 4 * 4))
            )

            def accumulate_canvas(x_cols: Array) -> Array:
                canvas = jnp.zeros((d1, d2, x_cols.shape[-1]), jnp.float32)
                for idx, meta in zip(idxs, metas):
                    canvas = _coset_accum(
                        canvas, self.panels, x_cols, idx, meta, b1, b2
                    )
                return canvas

            if m <= mc:
                from localmd_tpu.ops.tiling import flatten_fov

                out = flatten_fov(accumulate_canvas(x_block), order)
            else:
                out = jnp.zeros((self.n_pixels, m), dtype=jnp.float32)
                for s in range(0, m, mc):
                    out = _flatten_write_cols(
                        out,
                        accumulate_canvas(x_block[:, :, s : s + mc]),
                        jnp.int32(s),
                        order,
                    )
            if self.dense_basis.shape[1]:
                out = out + _mm(self.dense_basis, x[nb:])
            return out
        g = _block_group_size(self.panels.shape[1], m)
        out = jnp.zeros((self.n_pixels, m), dtype=jnp.float32)
        if g >= self.n_blocks:
            out = _matmul_accum(out, self.panels, self.rows, x_block)
        else:
            n_pad = ((self.n_blocks + g - 1) // g) * g
            for s in range(0, n_pad, g):
                e = min(s + g, self.n_blocks)
                if e - s < g:
                    # pad the tail group with zero panels (scatter of zeros
                    # into row 0 is harmless) to keep one compiled shape
                    pad = g - (e - s)
                    panels_g = jnp.concatenate(
                        [self.panels[s:e], jnp.zeros((pad,) + self.panels.shape[1:],
                                                     self.panels.dtype)], axis=0)
                    rows_g = jnp.concatenate(
                        [self.rows[s:e], jnp.zeros((pad, self.rows.shape[1]),
                                                   self.rows.dtype)], axis=0)
                    x_g = jnp.concatenate(
                        [x_block[s:e], jnp.zeros((pad, self.slots, m), x.dtype)],
                        axis=0)
                else:
                    panels_g, rows_g, x_g = (
                        self.panels[s:e], self.rows[s:e], x_block[s:e]
                    )
                out = _matmul_accum(out, panels_g, rows_g, x_g)
        if self.dense_basis.shape[1]:
            out = out + _mm(self.dense_basis, x[nb:])
        return out

    def rmatmul(self, y: Array) -> Array:
        """U.T @ y for y of shape (n_pixels, m) -> (R, m), block-chunked to
        bound the (g, p, m) gather intermediate.

        Stays on the gather path by measurement: a coset slice/transpose
        extraction (inverse of ``matmul``'s placement) ran 144-164 ms vs
        99-120 ms for the gather at 1024^2/m=340 on v5e — reads don't pay
        the serialization penalty scatter-add writes do
        (scripts/ablate_coset.py r_gather/r_coset)."""
        y = jnp.asarray(y)
        m = y.shape[-1]
        g = _block_group_size(self.panels.shape[1], m)
        if g >= self.n_blocks:
            block_part = _rmatmul_group(self.panels, self.rows, y)
            block_part = block_part.reshape(self.n_block_cols, -1)
        else:
            parts = []
            n_pad = ((self.n_blocks + g - 1) // g) * g
            for s in range(0, n_pad, g):
                e = min(s + g, self.n_blocks)
                if e - s < g:
                    pad = g - (e - s)
                    panels_g = jnp.concatenate(
                        [self.panels[s:e], jnp.zeros((pad,) + self.panels.shape[1:],
                                                     self.panels.dtype)], axis=0)
                    rows_g = jnp.concatenate(
                        [self.rows[s:e], jnp.zeros((pad, self.rows.shape[1]),
                                                   self.rows.dtype)], axis=0)
                    parts.append(
                        _rmatmul_group(panels_g, rows_g, y)[: e - s]
                    )
                else:
                    parts.append(
                        _rmatmul_group(self.panels[s:e], self.rows[s:e], y)
                    )
            block_part = jnp.concatenate(parts, axis=0).reshape(
                self.n_block_cols, -1
            )
        if self.dense_basis.shape[1]:
            bg_part = _mm(self.dense_basis.T, y)
            return jnp.concatenate([block_part, bg_part], axis=0)
        return block_part

    def gram_matmul(self, x: Array, col_chunk: Optional[int] = None) -> Array:
        """(U.T U) @ x without forming the Gram matrix; optionally chunked
        over columns of x to bound the (n_pixels, chunk) intermediate."""
        m = x.shape[1]
        if col_chunk is None or m <= col_chunk:
            return self.rmatmul(self.matmul(x))
        outs = []
        for s in range(0, m, col_chunk):
            outs.append(self.rmatmul(self.matmul(x[:, s : s + col_chunk])))
        return jnp.concatenate(outs, axis=1)

    def gram_quadratic(self, right: Array, col_chunk: Optional[int] = None) -> Array:
        """Symmetrized right.T (U.T U) right, shape (m, m).

        Computed as Z^T Z with Z = U @ right when the (n_pixels, m) canvas
        fits one pass: mathematically identical to right^T (U^T (U right)),
        but skips the rmatmul re-gather of the canvas back to panel rows —
        measured 41.6 ms -> 13.9 ms at the 512^2 bench shapes (m = 336).
        Column-chunked calls (m > col_chunk, the no-prune long-T regime)
        keep the gram_matmul form, whose per-chunk intermediates stay
        (n_pixels, col_chunk) without needing cross-chunk Z products.
        """
        m = right.shape[1]
        if col_chunk is None or m <= col_chunk:
            z = self.matmul(right)
            g = _mm(z.T, z)
        else:
            g = _mm(right.T, self.gram_matmul(right, col_chunk=col_chunk))
        return 0.5 * (g + g.T)

    # -- export / import ------------------------------------------------------

    def to_csr(self, counts: np.ndarray) -> Tuple[scipy.sparse.csr_matrix, np.ndarray]:
        """Compact to a scipy CSR matrix, dropping unused slots.

        ``counts``: (n_blocks,) kept components per block. Returns the CSR
        matrix of shape (n_pixels, sum(counts) + K) and the map from compacted
        column id -> padded global column id (for compacting R alongside).
        """
        counts = np.asarray(counts, dtype=np.int64)
        panels = np.asarray(self.panels)
        rows = np.asarray(self.rows)
        col_map = []
        data_parts, row_parts, col_parts = [], [], []
        col_cursor = 0
        for b in range(self.n_blocks):
            c = int(counts[b])
            if c == 0:
                continue
            panel = panels[b, :, :c]                    # (p, c)
            r = np.repeat(rows[b], c)
            cols = np.tile(np.arange(col_cursor, col_cursor + c), panels.shape[1])
            data_parts.append(panel.reshape(-1))
            row_parts.append(r)
            col_parts.append(cols)
            col_map.extend(b * self.slots + j for j in range(c))
            col_cursor += c
        k_bg = int(self.dense_basis.shape[1])
        n_cols = col_cursor + k_bg
        if data_parts:
            coo = scipy.sparse.coo_matrix(
                (
                    np.concatenate(data_parts),
                    (np.concatenate(row_parts), np.concatenate(col_parts)),
                ),
                shape=(self.n_pixels, col_cursor),
            )
        else:
            coo = scipy.sparse.coo_matrix((self.n_pixels, 0))
        if k_bg:
            bg = scipy.sparse.coo_matrix(np.asarray(self.dense_basis))
            full = scipy.sparse.hstack([coo, bg]).tocsr()
            col_map.extend(self.n_block_cols + j for j in range(k_bg))
        else:
            full = coo.tocsr()
        return full, np.asarray(col_map, dtype=np.int64)
