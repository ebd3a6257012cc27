"""Run-expansion fill: TPU timing at the headline shapes.

Shapes:
  - 1M uniform spheres, capacity 16384 (north-star fill)
  - dense reference workload N=307200 rmax=0.06 (107.6M pairs), full
    capacity — the scene the round-1 VMEM-resident buffer could not hold.

Usage: python benchmarks/exp_fill.py [uniform|dense ...]
"""

import os
import sys
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from collision_tpu import candidate_count, default_column_config
    from collision_tpu.fill import run_fill, _run_fill

    print("backend:", jax.devices()[0].platform, flush=True)
    rounds = int(os.environ.get("ROUNDS", 4))
    repeats = int(os.environ.get("REPEATS", 2))

    cases = []
    for a in sys.argv[1:] or ["uniform"]:
        if a == "dense":
            cases.append(("dense307k", 307200, 0.06, 120_000_000))
        else:
            cases.append(("uniform1M", 1_000_000, None, 16384))

    for name, n, rmax, capacity in cases:
        rng = np.random.RandomState(4)
        coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
        if rmax is None:
            radii = jnp.asarray(
                rng.uniform(0, 1 / n ** 0.5, n).astype("float32"))
        else:
            radii = jnp.asarray(rng.uniform(0, rmax, n).astype("float32"))

        gxy = int(os.environ.get("GXY", 0)) or default_column_config(n)[0]
        needed = float(candidate_count(coords, radii, gxy))
        cand = int(needed * 1.05) + 1024
        print("{}: gxy={} cand_needed={:.0f} cap={}".format(
            name, gxy, needed, capacity), flush=True)

        pairs, total, ok = run_fill(coords, radii, capacity, gxy, cand)
        total = int(total)
        print("  ok={} total={}".format(bool(ok), total), flush=True)

        # Spot parity: sample pairs must be genuine overlaps.
        k = min(total, capacity)
        sample = np.asarray(pairs[:k][:: max(1, k // 512)])
        c = np.asarray(coords)
        r = np.asarray(radii)
        a, b = sample[:, 0], sample[:, 1]
        lo_a, hi_a = c[a] - r[a][:, None], c[a] + r[a][:, None]
        lo_b, hi_b = c[b] - r[b][:, None], c[b] + r[b][:, None]
        good = ((hi_a > lo_b) & (lo_a < hi_b)).all(axis=1)
        assert good.all(), "sampled non-overlapping pair!"
        assert (a != b).all()
        print("  sample parity ok ({} checked)".format(len(sample)),
              flush=True)

        chunk = 1 << 20
        cand_r = -(-cand // chunk) * chunk

        @partial(jax.jit, static_argnames=("k",))
        def chain(coords, radii, k):
            def body(i, carry):
                acc, cc = carry
                _, tot, _ = _run_fill(cc, radii, capacity, gxy, cand_r,
                                      chunk)
                eps = (tot % 2).astype(jnp.float32) * 1e-7
                return acc + tot, coords + eps
            acc, _ = jax.lax.fori_loop(
                0, k, body, (jnp.uint32(0), coords))
            return acc

        def run(k):
            best = float("inf")
            int(chain(coords, radii, k))
            for _ in range(repeats):
                t = time.perf_counter()
                int(chain(coords, radii, k))
                best = min(best, time.perf_counter() - t)
            return best

        t1 = run(1)
        tn = run(rounds + 1)
        ms = (tn - t1) / rounds * 1e3
        print("  fill step: {:.2f} ms".format(ms), flush=True)


if __name__ == "__main__":
    main()
