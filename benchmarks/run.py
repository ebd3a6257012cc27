"""Benchmark suite at the reference's pinned workload shapes.

Reference shapes (SURVEY.md §6): scan at 307200/1536000/3072000, radix sort
at 307200 keys over three distributions (+ payload variants), bounds
reduction at 1536000/3072000 ×f32x3, find_offsets over 2^21 sorted values,
and the full collide pipeline count-only at 307200/307201 spheres — plus the
north-star 1M-sphere configs. Run: ``python -m benchmarks.run [--quick]``.

All rows use chained on-device timing (benchmarks/harness.bench_chained):
each iteration's input is perturbed by a value derived from the previous
result, so the numbers are device time, free of the ~25-30 ms tunnel
round-trip this environment adds to every fetch.
"""

import argparse
import sys

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="fewer/smaller configs")
    parser.add_argument("--jsonl", default=None,
                        help="also append machine-readable rows to this "
                             "JSON-lines file")
    parser.add_argument("--tag", action="append", default=[],
                        help="key=value tag for every JSONL row "
                             "(e.g. --tag round=r3)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from collision_tpu import (
        collide, exclusive_scan, find_offsets, scene_bounds, sort_key_value,
        sort_keys,
    )
    from .harness import bench_chained, report, set_jsonl

    if args.jsonl:
        tags = dict(t.split("=", 1) for t in args.tag)
        tags.setdefault("backend", jax.devices()[0].platform)
        set_jsonl(args.jsonl, **tags)

    rng = np.random.RandomState(4)
    print("backend:", jax.devices()[0].platform, file=sys.stderr)

    # --- exclusive prefix scan (reference benchmarks/test_scan.py) ---
    scan_sizes = [307200] if args.quick else [307200, 1536000, 3072000]
    for n in scan_sizes:
        values = jnp.asarray(rng.randint(0, 3, n).astype("uint32"))

        def scan_step(i, v):
            s = exclusive_scan(v)
            return v ^ (s[-1] & 1)

        report("scan n={}".format(n), bench_chained(scan_step, values))

    # --- radix sort (reference benchmarks/test_radix.py) ---
    n = 307200
    dists = {
        "randint-1000": rng.randint(0, 1000, n).astype("uint32"),
        "randint-n": rng.randint(0, n, n).astype("uint32"),
        "arange": np.arange(n, dtype="uint32"),
    }

    def sort_step(i, carry):
        orig, v = carry
        s = sort_keys(v)
        return orig, orig ^ (s[0] & 1)

    for name, keys in dists.items():
        k = jnp.asarray(keys)
        report("sort n={} {}".format(n, name),
               bench_chained(sort_step, (k, k)))

    def sortkv_step(i, carry):
        orig, k, v = carry
        sk, sv = sort_key_value(k, v)
        return orig, orig ^ (sk[0] & 1), v

    keys = jnp.asarray(dists["randint-n"])
    for vname, values in {
        "u32": rng.randint(0, n, n).astype("uint32"),
        "f32x4": rng.random((n, 4)).astype("float32"),
    }.items():
        report(
            "sort+values n={} {}".format(n, vname),
            bench_chained(sortkv_step, (keys, keys, jnp.asarray(values))),
        )

    # --- bounds reduction (reference benchmarks/test_bounds.py) ---
    bounds_sizes = [1536000] if args.quick else [1536000, 3072000]
    for n in bounds_sizes:
        coords = jnp.asarray(rng.random((n, 3)).astype("float32"))

        def bounds_step(i, c):
            lo, hi = scene_bounds(c)
            eps = jnp.where(lo[0] > 1e30, 1.0, 0.0)  # data-dep, runtime 0
            return c + eps

        report("bounds n={}".format(n), bench_chained(bounds_step, coords))

    # --- find_offsets (reference benchmarks/test_offset.py) ---
    n = 2 ** 21
    for maxval in (2000, 2000000):
        values = jnp.asarray(
            np.sort(rng.randint(0, maxval, n)).astype("uint32"))

        def off_step(i, v, maxval=maxval):
            o = find_offsets(v, maxval + 2)
            return v + (o[0] & 1)  # stays sorted

        report("find_offsets n=2^21 maxval={}".format(maxval),
               bench_chained(off_step, values))

    # --- full collide pipeline, count-only (column engine) ---
    from collision_tpu import Collider, default_column_config
    from collision_tpu.columns import plan_columns
    from collision_tpu.kernels.sweep import RPW_LADDER

    on_tpu = jax.devices()[0].platform != "cpu"
    collide_sizes = [307200, 307201] if not args.quick else [65536]
    if not args.quick:
        collide_sizes.append(1000000)
    for n in collide_sizes:
        coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
        radii = jnp.asarray(
            rng.uniform(0, 0.06 if n <= 307201 else 1 / n ** 0.5, n)
            .astype("float32")
        )
        # Validate knobs once host-side (the Collider's retry contract),
        # then chain the validated static configuration.
        gxy, col_cap, slab_rows = default_column_config(n)
        plan = plan_columns(coords, radii, gxy, col_cap, slab_rows)
        if not bool(plan.ok):
            col_cap = int(np.ceil(int(plan.max_col) / 64) * 64)
            slab_rows = int(plan.max_slab_rows) + 2
            plan = plan_columns(coords, radii, gxy, col_cap, slab_rows)
        need = int(plan.rows_needed)
        rpw = next((r for r in RPW_LADDER if r >= need), RPW_LADDER[-1])
        assert bool(plan.ok) and need <= rpw

        if on_tpu:
            def collide_step(i, c, radii=radii, gxy=gxy, col_cap=col_cap,
                             slab_rows=slab_rows, rpw=rpw):
                res = collide(c, radii, 0, method="column", gxy=gxy,
                              col_capacity=col_cap, slab_rows=slab_rows,
                              rpw=rpw)
                eps = (res.count % 2).astype(jnp.float32) * 1e-7
                return c + eps

            stats = bench_chained(collide_step, coords, rounds=5)
        else:
            from .harness import bench

            collider = Collider(n)
            fn = lambda c, r: collider.get_collisions(  # noqa: E731
                c, r, 0, collisions=None)
            stats = bench(fn, coords, radii, rounds=3,
                          probe=lambda r: r.reshape(1))
        count = int(Collider(n).get_collisions(
            coords, radii, 0, collisions=None))
        report("collide count-only n={}".format(n), stats,
               extra="(count={}, gxy={}, rpw={})".format(count, gxy, rpw))


if __name__ == "__main__":
    main()
