"""Moving-spheres simulation loop at 1M spheres (BASELINE config 5).

The whole loop — integrate, wall-bounce, per-step exact pair count —
stays on-chip via lax.scan over the jitted step; one fetch at the end.
Per-step time = (t(K2 steps) - t(K1 steps)) / (K2 - K1), which cancels
the fetch and dispatch overheads.
"""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from collision_tpu import simulate

    print("backend:", jax.devices()[0].platform, flush=True)
    n = int(os.environ.get("N", 1_000_000))
    k1, k2 = 2, int(os.environ.get("STEPS", 12))

    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    velocities = jnp.asarray(
        rng.uniform(-0.1, 0.1, (n, 3)).astype("float32"))
    radii = jnp.asarray(rng.uniform(0, 1 / n ** 0.5, n).astype("float32"))

    def run(steps):
        out = simulate(coords, velocities, radii, n_steps=steps, dt=0.001)
        return np.asarray(out[2][-1:]), out[3]  # force completion

    def timed(steps):
        run(steps)  # compile + warm
        best = float("inf")
        last = None
        for _ in range(2):
            t = time.perf_counter()
            last = run(steps)
            best = min(best, time.perf_counter() - t)
        return best, last

    t1, _ = timed(k1)
    t2, (counts, ok) = timed(k2)
    ms = (t2 - t1) / (k2 - k1) * 1e3
    print("sim step ({} spheres): {:.2f} ms/step "
          "(last count {}, ok {})".format(
              n, ms, int(counts[-1]), bool(ok)), flush=True)


if __name__ == "__main__":
    main()
