from localmd_tpu.io.tiff import TiffReader, write_tiff

__all__ = ["TiffReader", "write_tiff"]
