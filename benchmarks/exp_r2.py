"""Round-2 perf experiments (scratch; run on the real TPU).

Measures candidate replacements for the two dominant costs of the 1M-sphere
grid step (docs/design.md round-1 cost model: bins gather ~18 ms, count
sweep ~24.6 ms of a 32.7 ms step):

  E1  bins assembly: per-row jnp.take vs wide-block lax.gather
      (slice_sizes=(M, 8)) vs gather+transpose to lane layout.
  E2  dense transpose cost of [G, M, 8] -> [G, 8, M].
  E3  in-kernel [8, M] -> [M, 8] transpose viability (Mosaic support).

Timing: on-device chained differencing (same method as bench.py) — the
remote tunnel's ~25-30 ms fetch and non-blocking block_until_ready make
naive wall-clock numbers meaningless.
"""

import time
from functools import partial

import numpy as np


def chain_time(make_step, carry0, rounds=10, repeats=3):
    """ms per step of make_step: carry -> carry, on-device chained."""
    import jax

    @partial(jax.jit, static_argnames=("k",))
    def chain(carry, k):
        def body(i, c):
            return make_step(c)
        return jax.lax.fori_loop(0, k, body, carry)

    def run(k):
        probe = jax.tree_util.tree_leaves(chain(carry0, k))[0].ravel()[:1]
        np.asarray(probe)  # warm/compile
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
    return max((t2 - t1) / rounds * 1e3, 1e-6)


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.devices()[0].platform, flush=True)

    n = 1_000_000
    grid_dim, M = 24, 120
    G = grid_dim ** 3
    rng = np.random.RandomState(4)

    # Simulate the post-sort state: sorted rows + cell starts.
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 1 / n ** 0.5, n).astype("float32")
    cell = rng.randint(0, G, n).astype("uint32")
    cell = np.sort(cell)
    starts = np.searchsorted(cell, np.arange(G + 1)).astype("int32")
    row = np.concatenate(
        [coords - radii[:, None], np.zeros((n, 1), "float32"),
         coords + radii[:, None], np.zeros((n, 1), "float32")], axis=1
    )
    rowp = np.concatenate([row, np.full((M, 8), np.inf, "float32")])
    rowp = jnp.asarray(rowp)
    starts_d = jnp.asarray(starts)
    k_iota = jnp.arange(M, dtype=jnp.int32)

    occ = starts[1:] - starts[:-1]
    print("max occ:", occ.max(), "(fits M:", occ.max() <= M, ")", flush=True)

    # --- E1a: current per-row take ---
    def take_step(c):
        s = c
        idx = (s[:-1, None] + k_iota[None, :]).reshape(-1)
        bins = jnp.take(rowp, idx, axis=0, indices_are_sorted=True)
        bins = bins.reshape(G, M, 8)
        occ_d = s[1:] - s[:-1]
        bins = jnp.where(k_iota[None, :, None] < occ_d[:, None, None],
                         bins, jnp.inf)
        # chain: next starts depend on bins
        return s + (bins[0, 0, 0] > 1e30).astype(jnp.int32)

    print("E1a per-row take:    %.2f ms" % chain_time(take_step, starts_d),
          flush=True)

    # --- E1b: wide-block gather ---
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,),
    )

    def wide_step(c):
        s = c
        bins = jax.lax.gather(
            rowp, s[:-1, None], dnums, slice_sizes=(M, 8),
            mode=jax.lax.GatherScatterMode.CLIP,
            indices_are_sorted=True,
        )
        occ_d = s[1:] - s[:-1]
        bins = jnp.where(k_iota[None, :, None] < occ_d[:, None, None],
                         bins, jnp.inf)
        return s + (bins[0, 0, 0] > 1e30).astype(jnp.int32)

    print("E1b wide-block gather: %.2f ms" % chain_time(wide_step, starts_d),
          flush=True)

    # --- E1c: wide gather + transpose to lane layout ---
    def wide_t_step(c):
        s = c
        bins = jax.lax.gather(
            rowp, s[:-1, None], dnums, slice_sizes=(M, 8),
            mode=jax.lax.GatherScatterMode.CLIP,
            indices_are_sorted=True,
        )
        occ_d = s[1:] - s[:-1]
        bins = jnp.where(k_iota[None, :, None] < occ_d[:, None, None],
                         bins, jnp.inf)
        bl = jnp.swapaxes(bins, -1, -2)
        return s + (bl[0, 0, 0] > 1e30).astype(jnp.int32)

    print("E1c gather+transpose: %.2f ms" % chain_time(wide_t_step, starts_d),
          flush=True)

    # --- E2: pad to halo ---
    def pad_step(c):
        s = c
        bins = jax.lax.gather(
            rowp, s[:-1, None], dnums, slice_sizes=(M, 8),
            mode=jax.lax.GatherScatterMode.CLIP,
            indices_are_sorted=True,
        )
        occ_d = s[1:] - s[:-1]
        bins = jnp.where(k_iota[None, :, None] < occ_d[:, None, None],
                         bins, jnp.inf)
        bl = jnp.swapaxes(bins, -1, -2)
        bl = bl.reshape(grid_dim, grid_dim, grid_dim, 8, M)
        bl = jnp.pad(bl, ((1, 1), (1, 1), (1, 1), (0, 0), (0, 0)),
                     constant_values=jnp.inf)
        return s + (bl[0, 0, 0, 0, 0] > 1e30).astype(jnp.int32)

    print("E2 gather+transpose+pad: %.2f ms" % chain_time(pad_step, starts_d),
          flush=True)


if __name__ == "__main__":
    main()
