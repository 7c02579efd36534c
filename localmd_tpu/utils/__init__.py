from localmd_tpu.utils.logging import display, get_logger
from localmd_tpu.utils.device import (
    ambient_device,
    ambient_device_or_first,
    is_device_oom,
    transient_budget_bytes,
)
from localmd_tpu.utils.keys import (
    make_key,
    make_key_with_seed,
    split_keys,
    make_jax_random_key,
)

__all__ = [
    "display",
    "get_logger",
    "ambient_device",
    "ambient_device_or_first",
    "is_device_oom",
    "transient_budget_bytes",
    "make_key",
    "make_key_with_seed",
    "split_keys",
    "make_jax_random_key",
]
