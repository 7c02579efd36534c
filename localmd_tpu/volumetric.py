"""Multi-plane (volumetric) PMD: decompose each z-plane independently.

BASELINE.json config 5: "Multi-plane volumetric stack (per-plane PMD sharded
across TPU mesh)". Each plane is an independent PMD problem; planes share
compiled programs (identical shapes), so after the first plane compiles,
subsequent planes run at steady-state throughput.

Returns a :class:`VolumetricPMD` holding one PMDArray per plane with a
4-D array-like view (t, z, d1, d2).
"""

from __future__ import annotations

from typing import List

import numpy as np

from localmd_tpu.dataset import ZStackArray, as_dataset
from localmd_tpu.pipeline import localmd_decomposition
from localmd_tpu.pmd_array import PMDArray
from localmd_tpu.utils import display


class VolumetricPMD:
    """Array-like view over per-plane PMD decompositions: (T, Z, d1, d2)."""

    def __init__(self, planes: List[PMDArray]):
        if not planes:
            raise ValueError("need at least one plane")
        self.planes = planes
        s0 = planes[0].shape
        for p in planes[1:]:
            if p.shape != s0:
                raise ValueError("planes must share shape")

    @property
    def n_planes(self) -> int:
        return len(self.planes)

    @property
    def shape(self):
        t, d1, d2 = self.planes[0].shape
        return (t, self.n_planes, d1, d2)

    @property
    def ndim(self) -> int:
        return 4

    @property
    def dtype(self):
        return np.float32

    def __getitem__(self, key):
        if not isinstance(key, tuple):
            key = (key,)
        t_key = key[0] if len(key) > 0 else slice(None)
        z_key = key[1] if len(key) > 1 else slice(None)
        rest = key[2:]
        z_indices = np.arange(self.n_planes)[z_key]
        z_indices = np.atleast_1d(z_indices)
        per_plane = []
        for z in z_indices:
            sub_key = (t_key,) + rest if rest else (t_key,)
            frame = self.planes[int(z)]._getitem_host(
                sub_key if len(sub_key) <= 3 else sub_key[:3]
            )
            per_plane.append(frame)
        out = np.stack(per_plane, axis=1)  # (t, z, ...)
        return out.squeeze().astype(np.float32)

    def save(self, filename_prefix: str) -> List[str]:
        paths = []
        for z, plane in enumerate(self.planes):
            path = f"{filename_prefix}_plane{z}.npz"
            plane.to_npz(path)
            paths.append(path)
        return paths


def volumetric_decomposition(
    stack,
    block_sizes,
    frame_range: int,
    **kwargs,
) -> VolumetricPMD:
    """Run PMD per plane of a volumetric stack.

    Args:
        stack: ZStackArray, or a sequence of per-plane (T, d1, d2) movies
            (numpy / jax / PMDDataset each).
        Remaining args as :func:`localmd_tpu.pipeline.localmd_decomposition`.
    """
    if isinstance(stack, ZStackArray):
        planes = stack.planes
    elif isinstance(stack, (list, tuple)):
        planes = [as_dataset(p) for p in stack]
    else:
        raise TypeError("stack must be a ZStackArray or a sequence of planes")

    results = []
    for z, plane in enumerate(planes):
        display(f"Decomposing plane {z + 1}/{len(planes)}")
        results.append(
            localmd_decomposition(plane, block_sizes, frame_range, **kwargs)
        )
    return VolumetricPMD(results)
