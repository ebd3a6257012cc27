"""Minimal benchmark harness (pytest-benchmark is not available here).

Mirrors the reference's pedantic-mode methodology
(/root/reference/tests/benchmarks: warmup rounds, explicit timed rounds,
synchronization before/after) with ``block-by-fetch`` synchronization —
on this environment's TPU backend ``block_until_ready`` does not actually
block, so a tiny device-to-host fetch of each result forces completion.
"""

import time

import numpy as np


def bench(fn, *args, rounds=10, warmup=3, probe=None):
    """Run fn(*args) warmup+rounds times; returns dict of timing stats (ms).

    ``probe`` maps the result pytree to a small array fetched to host to
    force completion (defaults to the first leaf).
    """
    import jax

    if probe is None:
        def probe(r):
            # Slice device-side before fetching: the remote tunnel streams
            # full arrays at ~42 MB/s, which would swamp the measurement.
            return jax.tree_util.tree_leaves(r)[0].ravel()[:1]

    for _ in range(warmup):
        np.asarray(probe(fn(*args)))
    times = []
    for _ in range(rounds):
        t = time.perf_counter()
        np.asarray(probe(fn(*args)))
        times.append((time.perf_counter() - t) * 1e3)
    times = np.array(times)
    return {
        "min_ms": float(times.min()),
        "median_ms": float(np.median(times)),
        "mean_ms": float(times.mean()),
        "rounds": rounds,
    }


def report(name, stats, extra=""):
    print(
        "{:<44s} min {:>9.3f} ms   median {:>9.3f} ms {}".format(
            name, stats["min_ms"], stats["median_ms"], extra
        ),
        flush=True,
    )
