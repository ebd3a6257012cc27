"""Benchmark: full broad-phase step (sort + LBVH build + refit + traverse).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline config is BASELINE.json's north star — 1M spheres, count-only,
fully jitted, on one TPU chip, target < 10 ms/step — so vs_baseline is
(10 ms / measured ms): 1.0 means parity with the target, higher is better.
Workload mirrors the reference benchmark harness (tests/benchmarks/
test_collide.py: uniform random centers, radii scaled to keep the pair
count realistic; pedantic-style warmup + timed rounds around
block_until_ready).

Env overrides: BENCH_N (default 1_000_000 on TPU, 65_536 elsewhere),
BENCH_ROUNDS (default 10), BENCH_WARMUP (default 3).
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from collision_tpu import collide

    platform = jax.devices()[0].platform
    default_n = 1_000_000 if platform != "cpu" else 65_536
    n = int(os.environ.get("BENCH_N", default_n))
    rounds = int(os.environ.get("BENCH_ROUNDS", 10))
    warmup = int(os.environ.get("BENCH_WARMUP", 3))

    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(
        rng.uniform(0, 1 / n ** 0.5, n).astype("float32")
    )

    for _ in range(warmup):
        res = jax.block_until_ready(collide(coords, radii, 0))

    t0 = time.perf_counter()
    for _ in range(rounds):
        res = collide(coords, radii, 0)
    jax.block_until_ready(res)
    ms = (time.perf_counter() - t0) / rounds * 1e3

    print(json.dumps({
        "metric": "broadphase_step_ms_n{}".format(n),
        "value": round(ms, 3),
        "unit": "ms/step",
        "vs_baseline": round(10.0 / ms, 4),
    }))


if __name__ == "__main__":
    main()
