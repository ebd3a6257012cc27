"""Round-2: real-pipeline component breakdown on the TPU at 1M spheres.

Chained on-device timing of the actual repo components:
  sort+starts / build_grid / halo count sweep / batched sweep / full collide.
"""

import time
from functools import partial

import numpy as np


def chain_time(step, carry0, rounds=8, repeats=3, label=""):
    import jax

    @partial(jax.jit, static_argnames=("k",))
    def chain(carry, k):
        return jax.lax.fori_loop(0, k, lambda i, c: step(c), carry)

    def run(k):
        probe = jax.tree_util.tree_leaves(chain(carry0, k))[0].ravel()[:1]
        np.asarray(probe)
        best = float("inf")
        for _ in range(repeats):
            t = time.perf_counter()
            np.asarray(
                jax.tree_util.tree_leaves(chain(carry0, k))[0].ravel()[:1]
            )
            best = min(best, time.perf_counter() - t)
        return best

    t1 = run(1)
    t2 = run(rounds + 1)
    ms = max((t2 - t1) / rounds * 1e3, 1e-6)
    print("%-36s %8.2f ms" % (label, ms), flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from collision_tpu.grid import build_grid
    from collision_tpu.kernels.halo import halo_pairs
    from collision_tpu.kernels.batched import batched_count
    from collision_tpu import collide

    print("backend:", jax.devices()[0].platform, flush=True)

    n = 1_000_000
    grid_dim, M = 24, 120
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(rng.uniform(0, 1 / n ** 0.5, n).astype("float32"))

    # Full collide count-only (reference: bench.py's 32 ms)
    def full_step(c):
        res = collide(c, radii, 0, grid_dim=grid_dim, cell_capacity=M)
        eps = (res.count % 2).astype(jnp.float32) * 1e-7
        return c + eps

    pass  # measured: 32.41 ms

    # build_grid alone
    def bg_step(c):
        bins, ok, _ = build_grid(c, radii, grid_dim, M)
        eps = (bins[1, 1, 1, 0, 0] > 1e30).astype(jnp.float32) * 1e-9
        return c + eps

    pass  # measured: 12.03 ms

    # sweeps on prebuilt bins: perturb one bin value to keep the chain live.
    bins0, ok, _ = jax.block_until_ready(
        jax.jit(build_grid, static_argnums=(2, 3))(coords, radii, grid_dim, M)
    )[:3]

    def halo_step(b):
        _, total = halo_pairs(b, grid_dim, M, 0)
        eps = (total % 2).astype(jnp.float32) * 1e-12
        return b + eps  # no-op value-wise but data-dependent

    # NB: b + eps where eps derives from total — not foldable.
    chain_time(halo_step, bins0, label="halo count sweep")

    def batched_step(b):
        total = batched_count(b, grid_dim, M)
        eps = (total % 2).astype(jnp.float32) * 1e-12
        return b + eps

    chain_time(batched_step, bins0, label="batched (2-col) count sweep")


if __name__ == "__main__":
    main()
