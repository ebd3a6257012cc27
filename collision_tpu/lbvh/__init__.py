from .build import LBVH, NO_NODE, build
from .refit import leaf_bounds, refit
from .traverse import (
    NO_PAIR,
    SENTINEL,
    STACK_DEPTH,
    aabb_overlap,
    find_pairs,
    traverse_count,
    traverse_fill,
)

__all__ = [
    "LBVH",
    "NO_NODE",
    "build",
    "leaf_bounds",
    "refit",
    "NO_PAIR",
    "SENTINEL",
    "STACK_DEPTH",
    "aabb_overlap",
    "find_pairs",
    "traverse_count",
    "traverse_fill",
]
