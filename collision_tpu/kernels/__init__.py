from .batched import batched_count
from .compact import compact_mask
from .emit import emit_pairs, grid_fill, halo_tile_counts
from .halo import halo_pairs

__all__ = [
    "batched_count",
    "compact_mask",
    "emit_pairs",
    "grid_fill",
    "halo_tile_counts",
    "halo_pairs",
]
