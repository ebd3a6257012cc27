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


def brute_force_count(coords, radii, block=512):
    """Exact unordered pair count, row-blocked.

    The set oracle materializes an [n, n, 3] overlap tensor — n in the
    10^5 range needs tens of GB. This walks ``block``-row strips with
    one [block, n] bool live at a time, so 10^5-sphere scenes verify in
    seconds of numpy on the test host (used as the independent total for
    the large compiled-path tests, where a BVH-engine reference at heavy
    scenes runs past the remote TPU worker's watchdog)."""
    coords = np.asarray(coords)
    radii = np.asarray(radii).reshape(-1, 1)
    lo = coords - radii
    hi = coords + radii
    n = len(coords)
    jj = np.arange(n)[None, :]
    total = 0
    for i0 in range(0, n, block):
        i1 = min(i0 + block, n)
        m = (hi[i0:i1, None, 0] > lo[None, :, 0]) \
            & (lo[i0:i1, None, 0] < hi[None, :, 0])
        m &= (hi[i0:i1, None, 1] > lo[None, :, 1]) \
            & (lo[i0:i1, None, 1] < hi[None, :, 1])
        m &= (hi[i0:i1, None, 2] > lo[None, :, 2]) \
            & (lo[i0:i1, None, 2] < hi[None, :, 2])
        m &= jj > np.arange(i0, i1)[:, None]
        total += int(np.count_nonzero(m))
    return total
