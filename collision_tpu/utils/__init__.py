from .cache import enable_compilation_cache
from .dtypes import (
    round_up,
    roundUp,
    next_power_of_2,
    nextPowerOf2,
    product,
    padded_vec_width,
    dtype_sizeof,
)

__all__ = [
    "enable_compilation_cache",
    "round_up",
    "roundUp",
    "next_power_of_2",
    "nextPowerOf2",
    "product",
    "padded_vec_width",
    "dtype_sizeof",
]
