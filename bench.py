"""Benchmark: full broad-phase step (sort + grid build + count sweep).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline config is BASELINE.json's north star — 1M spheres, count-only,
fully jitted, on one TPU chip, target < 10 ms/step — so vs_baseline is
(10 ms / measured ms): 1.0 means parity with the target, higher is better.

Measurement notes: on this environment's remote TPU backend,
``jax.block_until_ready`` does not actually block, and every device→host
fetch pays a ~25-30 ms tunnel round-trip. Steps are therefore chained
*on-device* (a ``fori_loop`` whose carry depends on each step's count) and
timed by differencing two chain lengths around one fetch each, which
cancels both the fixed round-trip and dispatch overheads.

Env overrides: BENCH_N (default 1_000_000 on TPU, 65_536 elsewhere),
BENCH_ROUNDS (chain length, default 10), BENCH_REPEATS (default 3).
"""

import json
import os
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from collision_tpu import collide

    platform = jax.devices()[0].platform
    default_n = 1_000_000 if platform != "cpu" else 65_536
    n = int(os.environ.get("BENCH_N", default_n))
    rounds = int(os.environ.get("BENCH_ROUNDS", 10))
    repeats = int(os.environ.get("BENCH_REPEATS", 3))
    gx = int(os.environ.get("BENCH_GX", 0)) or None
    cand = max(1 << 22, 32 * n)  # portable-path candidate bound (CPU runs)

    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(
        rng.uniform(0, 1 / n ** 0.5, n).astype("float32")
    )

    @partial(jax.jit, static_argnames=("k",))
    def chain(coords, radii, k):
        # Each iteration perturbs the input by a count-dependent epsilon so
        # no step can be folded away, then depends on the previous count.
        def body(i, carry):
            acc, c = carry
            # The round-3 slab engine (dual-dispatch count: 1-row Pallas
            # sweep + vectorized residual; ok asserted exact below).
            res = collide(c, radii, 0, method="slab", gx=gx,
                          cand_capacity=cand)
            eps = (res.count % 2).astype(jnp.float32) * 1e-7 \
                + res.ok.astype(jnp.float32) * 1e-9
            return acc + res.count, coords + eps
        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.uint32(0), coords))
        return acc

    # Exactness pre-check: the headline must be an ok=True exact count;
    # if the default slab config's residual capacity trips on this
    # scene, narrower windows (larger gx) restore it.
    from collision_tpu import collide as _collide
    from collision_tpu.slabs import default_slab_config

    if gx is None:
        gx = default_slab_config(n)[0]
    for _ in range(3):
        res = _collide(coords, radii, 0, method="slab", gx=gx,
                       cand_capacity=cand)
        if bool(res.ok):
            break
        gx = int(gx * 1.5) + 1
    assert bool(res.ok), "slab count not exact at gx={}".format(gx)

    def run(k):
        best = float("inf")
        int(chain(coords, radii, k))  # compile + warm
        for _ in range(repeats):
            t = time.perf_counter()
            int(chain(coords, radii, k))
            best = min(best, time.perf_counter() - t)
        return best

    t_short = run(1)
    t_long = run(rounds + 1)
    ms = max((t_long - t_short) / rounds * 1e3, 1e-6)

    print(json.dumps({
        "metric": "broadphase_step_ms_n{}".format(n),
        "value": round(ms, 3),
        "unit": "ms/step",
        "vs_baseline": round(10.0 / ms, 4),
    }))


if __name__ == "__main__":
    main()
