"""Column-occupancy sweep for the 1M count path.

default_column_config's target occupancy (spheres per column) was picked
by estimate, not measurement; this sweeps it. Usage:
  python benchmarks/exp_occsweep.py [occ ...]
"""

import sys
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from collision_tpu.columns import (
        default_column_config, plan_columns, _plan_columns, CHUNK)
    from collision_tpu.kernels.sweep import RPW_LADDER, _sweep_count

    print("backend:", jax.devices()[0].platform, flush=True)
    n = 1_000_000
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(rng.uniform(0, 1 / n ** 0.5, n).astype("float32"))

    occs = [int(a) for a in sys.argv[1:]] or [750, 1000, 1500, 2250, 3000]
    for occ in occs:
        gxy, col_cap, slab_rows = default_column_config(n, occ)
        plan = plan_columns(coords, radii, gxy, col_cap, slab_rows)
        if not bool(plan.ok):
            col_cap = int(np.ceil(int(plan.max_col) / 64) * 64)
            slab_rows = int(plan.max_slab_rows) + 2
            plan = plan_columns(coords, radii, gxy, col_cap, slab_rows)
        need = int(plan.rows_needed)
        rpw = next(r for r in RPW_LADDER if r >= need)
        mc = -(-col_cap // CHUNK)

        @partial(jax.jit, static_argnames=("k",))
        def chain(coords, radii, k, gxy=gxy, col_cap=col_cap,
                  slab_rows=slab_rows, rpw=rpw, mc=mc):
            def body(i, carry):
                acc, c = carry
                arrays = _plan_columns(c, radii, gxy, col_cap, slab_rows)
                stream, starts, slab_r0, w0, wcap = arrays[:5]
                cnt, _ = _sweep_count(stream, starts, slab_r0, w0, wcap,
                                      gxy, mc, slab_rows, rpw, False)
                eps = (cnt % 2).astype(jnp.float32) * 1e-7
                return acc + cnt, c + eps
            acc, _ = jax.lax.fori_loop(0, k, body, (jnp.int32(0), coords))
            return acc

        def run(k):
            best = float("inf")
            int(chain(coords, radii, k))
            for _ in range(2):
                t = time.perf_counter()
                int(chain(coords, radii, k))
                best = min(best, time.perf_counter() - t)
            return best

        t1 = run(1)
        tn = run(7)
        ms = (tn - t1) / 6 * 1e3
        print("occ={:<5d} gxy={:<3d} col_cap={:<5d} rpw={}: {:.2f} ms".format(
            occ, gxy, col_cap, rpw, ms), flush=True)


if __name__ == "__main__":
    main()
