from .compact import compact_mask

__all__ = ["compact_mask"]
