"""Drop-in namespace mirroring ``localmd.pmdarray``."""

from localmd_tpu.pmd_array import PMDArray

__all__ = ["PMDArray"]
