"""PMDArray — lazy array view over the compressed movie ``[U R] s Vt``.

Parity with the reference ``PMDArray`` (reference pmdarray.py:7-171):
same constructor contract, properties, slicing semantics (key order
``[frames, dim1, dim2]``), un-normalization (x std + mean), frames-first
transpose, ``.squeeze()``, float32 output. The reference's latent
``len(key)==2`` bug — calling ``spatial_crop`` with two positional args
(reference pmdarray.py:146-148) — is fixed here.

Additions over the reference:

- An optional on-device fast path: when constructed by the TPU pipeline the
  array keeps the blocked-sparse panels, and ``reconstruct_frames`` produces
  full-FOV frames as one jitted scatter-add + matmul program (the reference
  reconstructs on host CPU via scipy CSR, pmdarray.py:159).
- ``to_npz`` / ``from_npz`` round-trip through the reference .npz convention
  (see :mod:`localmd_tpu.serialization`).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse

from localmd_tpu.blocksparse import BlockSparseMatrix
from localmd_tpu.ops.tiling import flatten_image, unflatten_fov


class PMDArray:
    def __init__(
        self,
        u: Union[scipy.sparse.spmatrix, BlockSparseMatrix],
        r: np.ndarray,
        s: np.ndarray,
        v: np.ndarray,
        data_shape: Tuple[int, int, int],
        data_order: str,
        mean_img: np.ndarray,
        std_img: np.ndarray,
        counts: Optional[np.ndarray] = None,
    ):
        """
        Args:
            u: (d, K1) sparse spatial basis — scipy sparse (reference-style)
                or a BlockSparseMatrix with zero-padded slots (TPU pipeline).
                In the latter case ``counts`` gives kept components per block
                and U is compacted lazily for host/CSR operations.
            r: (K1, K2) mixing matrix; U @ R has orthonormal columns.
            s: (K2,) singular values (diagonal).
            v: (K2, T) orthonormal temporal basis.
            data_shape: (n_frames, d1, d2).
            data_order: "F" or "C" pixel flattening convention.
            mean_img / std_img: (d1, d2) normalization images.
        """
        self.order = data_order
        self.num_frames, self.fov_dim1, self.fov_dim2 = data_shape
        self._blocksparse = None
        self._counts = counts
        self._r_padded = None

        if isinstance(u, BlockSparseMatrix):
            if counts is None:
                raise ValueError("counts required with a BlockSparseMatrix U")
            self._blocksparse = u
            self._r_padded = np.asarray(r)
            csr, col_map = u.to_csr(counts)
            self._u = csr
            self._r = np.asarray(r)[col_map, :]
        else:
            self._u = u.tocsr()
            self._r = np.asarray(r)

        self._s = np.asarray(s)
        self._v = np.asarray(v)
        self._combined_temporal = (self._r * self._s[None, :]).dot(self._v)
        self.mean_img = np.asarray(mean_img)
        self.var_img = np.asarray(std_img)
        self.row_indices = np.arange(self.fov_dim1 * self.fov_dim2).reshape(
            (self.fov_dim1, self.fov_dim2), order=self.order
        )

        # Device-side combined temporal for the fast reconstruct path.
        if self._blocksparse is not None:
            self._combined_temporal_padded = jnp.asarray(
                (self._r_padded * self._s[None, :]) @ self._v
            )

    # -- properties (reference pmdarray.py:59-87) ----------------------------

    @property
    def u(self) -> scipy.sparse.csr_matrix:
        return self._u

    @property
    def r(self) -> np.ndarray:
        return self._r

    @property
    def s(self) -> np.ndarray:
        return self._s

    @property
    def v(self) -> np.ndarray:
        return self._v

    @property
    def dtype(self):
        return np.float32

    @property
    def shape(self) -> Tuple[int, int, int]:
        return (self.num_frames, self.fov_dim1, self.fov_dim2)

    @property
    def ndim(self) -> int:
        return 3

    @property
    def rank(self) -> int:
        return int(self._s.shape[0])

    # -- device fast path ------------------------------------------------------

    def reconstruct_frames(self, frame_indices) -> jnp.ndarray:
        """Reconstruct full-FOV frames on device: (n_frames_req, d1, d2).

        Output is un-normalized (x std + mean). Falls back to the host CSR
        path if this array was built from a scipy matrix.
        """
        frame_indices = jnp.asarray(np.atleast_1d(np.asarray(frame_indices)))
        if self._blocksparse is None:
            out = self._getitem_host((np.asarray(frame_indices), slice(None), slice(None)))
            return jnp.asarray(out.reshape((-1, self.fov_dim1, self.fov_dim2)))
        temporal = self._combined_temporal_padded[:, frame_indices]   # (R_pad, f)
        flat = self._blocksparse.matmul(temporal)                     # (d, f)
        movie = unflatten_fov(flat, self.fov_dim1, self.fov_dim2, self.order)
        std_flat = self.var_img[..., None]
        mean_flat = self.mean_img[..., None]
        movie = movie * jnp.asarray(std_flat) + jnp.asarray(mean_flat)
        return jnp.moveaxis(movie, -1, 0)

    # -- host slicing (reference semantics) ------------------------------------

    def _parse_int_to_list(self, elt):
        if isinstance(elt, (int, np.integer)):
            return [int(elt)]
        return elt

    def spatial_crop(self, key):
        """(reference pmdarray.py:95-117)."""
        if key[0] is None or key[1] is None:
            raise ValueError("Cannot pass None for indexing")
        key = (self._parse_int_to_list(key[0]), self._parse_int_to_list(key[1]))
        used_rows = self.row_indices[key[0], key[1]]
        mean_used = self.mean_img[key[0], key[1]]
        var_used = self.var_img[key[0], key[1]]
        u_used = self._u[used_rows.reshape((-1,), order=self.order)]
        return u_used, mean_used, var_used, used_rows.shape

    def temporal_crop(self, key) -> np.ndarray:
        if key is None:
            raise ValueError("Cannot use None for indexing")
        return self._combined_temporal[:, self._parse_int_to_list(key)]

    def _getitem_host(self, key) -> np.ndarray:
        if len(key) == 1:
            spatial, mean_used, var_used, implied_fov = self.spatial_crop(
                (slice(None), slice(None))
            )
            temporal = self.temporal_crop(key[0])
        elif len(key) == 2:
            spatial, mean_used, var_used, implied_fov = self.spatial_crop(
                (key[1], slice(None))
            )
            temporal = self.temporal_crop(key[0])
        elif len(key) == 3:
            spatial, mean_used, var_used, implied_fov = self.spatial_crop(
                (key[1], key[2])
            )
            temporal = self.temporal_crop(key[0])
        else:
            raise ValueError("Too many indices in __getitem__")

        output = spatial.dot(temporal)
        output = output.reshape(implied_fov + (-1,), order=self.order) * np.expand_dims(
            var_used, axis=var_used.ndim
        ) + np.expand_dims(mean_used, axis=mean_used.ndim)
        output = np.transpose(output, axes=(output.ndim - 1, *range(output.ndim - 1)))
        return output

    def __getitem__(self, key) -> np.ndarray:
        if key is None:
            raise ValueError("Cannot use None for indexing")
        if not isinstance(key, tuple):
            key = (key,)
        return self._getitem_host(key).squeeze().astype(self.dtype)

    # -- serialization ---------------------------------------------------------

    def to_npz(self, filename: str) -> None:
        from localmd_tpu.serialization import save_decomposition

        save_decomposition(filename, self)

    @classmethod
    def from_npz(cls, filename: str) -> "PMDArray":
        from localmd_tpu.serialization import load_decomposition

        return load_decomposition(filename)
