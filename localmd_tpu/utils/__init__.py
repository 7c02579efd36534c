from localmd_tpu.utils.logging import display, get_logger
from localmd_tpu.utils.keys import make_key, split_keys, make_jax_random_key

__all__ = ["display", "get_logger", "make_key", "split_keys", "make_jax_random_key"]
