"""Benchmark suite at the reference's pinned workload shapes.

Reference shapes (SURVEY.md §6): scan at 307200/1536000/3072000, radix sort
at 307200 keys over three distributions (+ payload variants), bounds
reduction at 1536000/3072000 ×f32x3, find_offsets over 2^21 sorted values,
and the full collide pipeline count-only at 307200/307201 spheres — plus the
north-star 1M-sphere configs. Run: ``python -m benchmarks.run [--quick]``.
"""

import argparse
import sys

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="fewer/smaller configs")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from collision_tpu import (
        collide, exclusive_scan, find_offsets, scene_bounds, sort_key_value,
        sort_keys,
    )
    from .harness import bench, report

    rng = np.random.RandomState(4)
    print("backend:", jax.devices()[0].platform, file=sys.stderr)

    # --- exclusive prefix scan (reference benchmarks/test_scan.py) ---
    scan_sizes = [307200] if args.quick else [307200, 1536000, 3072000]
    jscan = jax.jit(exclusive_scan)
    for n in scan_sizes:
        values = jnp.asarray(rng.randint(0, n, n).astype("uint32"))
        report("scan n={}".format(n), bench(jscan, values))

    # --- radix sort (reference benchmarks/test_radix.py) ---
    n = 307200
    dists = {
        "randint-1000": rng.randint(0, 1000, n).astype("uint32"),
        "randint-n": rng.randint(0, n, n).astype("uint32"),
        "arange": np.arange(n, dtype="uint32"),
    }
    jsort = jax.jit(sort_keys)
    for name, keys in dists.items():
        report("sort n={} {}".format(n, name), bench(jsort, jnp.asarray(keys)))
    jsortkv = jax.jit(sort_key_value)
    keys = jnp.asarray(dists["randint-n"])
    for vname, values in {
        "u32": rng.randint(0, n, n).astype("uint32"),
        "f32x4": rng.random((n, 4)).astype("float32"),
    }.items():
        report(
            "sort+values n={} {}".format(n, vname),
            bench(jsortkv, keys, jnp.asarray(values)),
        )

    # --- bounds reduction (reference benchmarks/test_bounds.py) ---
    bounds_sizes = [1536000] if args.quick else [1536000, 3072000]
    jbounds = jax.jit(scene_bounds)
    for n in bounds_sizes:
        coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
        report("bounds n={}".format(n), bench(jbounds, coords))

    # --- find_offsets (reference benchmarks/test_offset.py) ---
    n = 2 ** 21
    for maxval in (2000, 2000000):
        values = jnp.asarray(np.sort(rng.randint(0, maxval, n)).astype("uint32"))
        joff = jax.jit(lambda v: find_offsets(v, maxval + 2))
        report("find_offsets n=2^21 maxval={}".format(maxval),
               bench(joff, values))

    # --- full collide pipeline, count-only ---
    # The reference benchmark's rmax=0.06 radii force grid cells of size
    # 2*rmax = 0.12 (only ~9³ effective cells at these densities), so the
    # static cell capacity overflows and collide() flags ok=False rather
    # than return a wrong count. Use the Collider, whose host-side retry
    # doubles the capacity until the result is exact — the same
    # reallocate-and-retry contract the reference's resize path has.
    from collision_tpu import Collider

    on_tpu = jax.devices()[0].platform != "cpu"
    collide_sizes = [307200, 307201] if not args.quick else [65536]
    if on_tpu and not args.quick:
        collide_sizes.append(1000000)
    for n in collide_sizes:
        coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
        radii = jnp.asarray(
            rng.uniform(0, 0.06 if n <= 307201 else 1 / n ** 0.5, n)
            .astype("float32")
        )
        collider = Collider(n)
        fn = lambda c, r: collider.get_collisions(c, r, 0, collisions=None)  # noqa: E731
        stats = bench(fn, coords, radii, rounds=5,
                      probe=lambda r: r.reshape(1))
        report("collide count-only n={}".format(n), stats,
               extra="(count={}, target_occ={})".format(
                   int(fn(coords, radii)), collider._target_occupancy))


if __name__ == "__main__":
    main()
