"""Round-4: 1M moving-spheres sim loop per-step cost (VERDICT r3 item 7).

BASELINE config 5: per-step re-plan + count, fully on-chip via lax.scan.
Round 2 measured 15.2 ms/step (column); round 3 shipped the 9.1 ms slab
count but never benchmarked the sim. Differenced scan lengths cancel the
tunnel fetch, as in bench.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r4_sim.py [method]
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.sim import _simulate_scan


def main():
    n = 1_000_000
    method = sys.argv[1] if len(sys.argv) > 1 else "auto"
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    velocities = jnp.asarray(
        rng.uniform(-1, 1, (n, 3)).astype("float32"))
    radii = jnp.asarray(
        rng.uniform(0, 1 / n ** 0.5, n).astype("float32"))
    print("backend:", jax.devices()[0].platform, "method:", method,
          flush=True)

    def run(k, repeats=3):
        out = _simulate_scan(coords, velocities, radii, k, 0.001, 0.0,
                             1.0, method)
        np.asarray(out[1][-1])  # compile + warm; fetch one count
        best = float("inf")
        for _ in range(repeats):
            t = time.perf_counter()
            out = _simulate_scan(coords, velocities, radii, k, 0.001,
                                 0.0, 1.0, method)
            np.asarray(out[1][-1])
            best = min(best, time.perf_counter() - t)
        return best

    k = 10
    t1 = run(1)
    tn = run(k + 1)
    ms = max((tn - t1) / k * 1e3, 0.0)
    out = _simulate_scan(coords, velocities, radii, 3, 0.001, 0.0, 1.0,
                         method)
    ok = bool(out[0][2])
    counts = [int(c) for c in np.asarray(out[1])]
    print("sim step: {:.3f} ms/step ok={} counts={}".format(
        ms, ok, counts), flush=True)
    print("ROW " + json.dumps({
        "name": "r4-sim-1M", "method": method, "ms_per_step": round(ms, 3),
        "ok": ok, "count0": counts[0]}), flush=True)


if __name__ == "__main__":
    main()
