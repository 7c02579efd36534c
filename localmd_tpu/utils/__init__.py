from localmd_tpu.utils.logging import display, get_logger
from localmd_tpu.utils.keys import make_key, split_keys

__all__ = ["display", "get_logger", "make_key", "split_keys"]
