"""Numpy oracles for parity testing.

``brute_force_collisions`` is the O(N²) pair oracle every end-to-end test
checks against — the same construction as the reference's ``find_collisions``
(/root/reference/tests/test_collision_py.py:30-37): strict componentwise AABB
overlap of center±radius boxes, lower-triangle only (no self-pairs, each
unordered pair once), returned as a set of (i, j) with i > j in the
reference's orientation — order within a pair is normalized by callers.
"""

import numpy as np


def brute_force_collisions(coords, radii):
    """Exact set of colliding sphere-AABB pairs, as a set of sorted tuples."""
    coords = np.asarray(coords)
    radii = np.asarray(radii)
    lo = coords - radii.reshape(-1, 1)
    hi = coords + radii.reshape(-1, 1)
    overlap = (hi.reshape(-1, 1, 3) > lo.reshape(1, -1, 3)) & (
        lo.reshape(-1, 1, 3) < hi.reshape(1, -1, 3)
    )
    overlap = overlap.all(axis=-1)
    overlap = np.tril(overlap, -1)
    ii, jj = np.nonzero(overlap)
    return {(int(a), int(b)) for a, b in zip(np.minimum(ii, jj), np.maximum(ii, jj))}


def pair_array_to_set(pairs, count):
    """Normalize a [cap, 2] device pair buffer to a set of sorted tuples."""
    pairs = np.asarray(pairs)[: int(count)]
    pairs = np.sort(pairs, axis=1)
    return {tuple(map(int, p)) for p in pairs}
