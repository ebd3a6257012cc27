from .index import Indexer, gather, scatter
from .morton import MAX_CODE, MORTON_BITS, expand_bits, morton_encode
from .offset import OffsetFinder, find_offsets
from .reduce import Bounds, Reducer, Summer, reduce_values, scene_bounds
from .scan import PrefixScanner, exclusive_scan, prefix_sum
from .sort import RadixSorter, argsort_keys, sort_key_value, sort_keys

__all__ = [
    "Indexer",
    "gather",
    "scatter",
    "MAX_CODE",
    "MORTON_BITS",
    "expand_bits",
    "morton_encode",
    "OffsetFinder",
    "find_offsets",
    "Bounds",
    "Reducer",
    "Summer",
    "reduce_values",
    "scene_bounds",
    "PrefixScanner",
    "exclusive_scan",
    "prefix_sum",
    "RadixSorter",
    "argsort_keys",
    "sort_key_value",
    "sort_keys",
]
