"""Mask fill (gather-free emission): TPU timing at the headline shapes.

  uniform: 1M spheres, capacity 16384
  dense:   the reference dense workload N=307200 rmax=0.06 — 107.6M
           pairs, the scene the round-1 262k VMEM cap could never hold.

Usage: python benchmarks/exp_maskfill.py [uniform|dense ...]
Env: GXY / COLCAP / SLAB / RPW override the plan knobs.
"""

import os
import sys
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from collision_tpu import default_column_config, plan_columns
    from collision_tpu.fill import mask_fill, _mask_fill_impl
    from collision_tpu.kernels.sweep import RPW_LADDER

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

        gxy, col_cap, slab_rows = default_column_config(n)
        gxy = int(os.environ.get("GXY", 0)) or gxy
        col_cap = int(os.environ.get("COLCAP", 0)) or col_cap
        slab_rows = int(os.environ.get("SLAB", 0)) or slab_rows
        plan = plan_columns(coords, radii, gxy, col_cap, slab_rows)
        if not bool(plan.ok):
            col_cap = int(np.ceil(int(plan.max_col) / 64) * 64)
            slab_rows = int(plan.max_slab_rows) + 2
            plan = plan_columns(coords, radii, gxy, col_cap, slab_rows)
        need = int(plan.rows_needed)
        rpw = int(os.environ.get("RPW", 0)) or next(
            r for r in RPW_LADDER if r >= need)
        print("{}: gxy={} col_cap={} slab_rows={} rpw={} cap={}".format(
            name, gxy, col_cap, slab_rows, rpw, capacity), flush=True)

        kcap = int(os.environ.get("KCAP", 0)) or None
        ida, idb, total, ok = mask_fill(
            coords, radii, capacity, gxy, col_cap, slab_rows, rpw=rpw,
            kcap=kcap)
        total = int(total)
        print("  ok={} total={}".format(bool(ok), total), flush=True)
        assert bool(ok)

        # Spot parity on a sample of materialized pairs.
        k = min(total, capacity)
        step = max(1, k // 512)
        sa = np.asarray(ida[:k][::step])
        sb = np.asarray(idb[:k][::step])
        c = np.asarray(coords)
        r = np.asarray(radii)
        lo_a, hi_a = c[sa] - r[sa][:, None], c[sa] + r[sa][:, None]
        lo_b, hi_b = c[sb] - r[sb][:, None], c[sb] + r[sb][:, None]
        good = ((hi_a > lo_b) & (lo_a < hi_b)).all(axis=1)
        assert good.all(), "sampled non-overlapping pair!"
        assert (sa != sb).all()
        print("  sample parity ok ({} checked)".format(len(sa)), flush=True)

        @partial(jax.jit, static_argnames=("k",))
        def chain(coords, radii, k):
            def body(i, carry):
                acc, cc = carry
                ia, ib, tot, _ = _mask_fill_impl(
                    cc, radii, capacity, gxy, col_cap, slab_rows, rpw,
                    False, 1 << 16, kcap)
                # Depend on the pair buffers themselves or XLA dead-code
                # eliminates the whole emission phase.
                probe = tot + ia[capacity - 1] + ib[capacity // 2]
                eps = (probe % 2).astype(jnp.float32) * 1e-7
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
        print("  mask fill step: {:.2f} ms".format(ms), flush=True)


if __name__ == "__main__":
    main()
