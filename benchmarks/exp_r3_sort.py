"""Round-3: lax.sort payload-packing variants at 1M (plan cost attack).

The slab/column plans sort (key u32, id u32, x, y, z, r f32) — 6 operands.
Variants measured:
  6xu32   — the current shape
  3xu64   — (key|id, x|y, z|r) bitcast-packed, unpacked after
  2xu64   — (key|id, -) sort + (x|y, z|r) carried... not possible; skip
  key+id  — lower bound: what the sort costs with no geometry payload

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/exp_r3_sort.py
"""

import time
from functools import partial

import numpy as np

import jax
jax.config.update("jax_enable_x64", True)  # u64 packing variants
import jax.numpy as jnp


def chain_time(chain, args, k=8, repeats=3):
    def run(kk):
        np.asarray(jax.tree_util.tree_leaves(chain(args, kk))[0].ravel()[:1])
        best = float("inf")
        for _ in range(repeats):
            t = time.perf_counter()
            np.asarray(
                jax.tree_util.tree_leaves(chain(args, kk))[0].ravel()[:1])
            best = min(best, time.perf_counter() - t)
        return best
    t1 = run(1)
    tn = run(k + 1)
    return max((tn - t1) / k * 1e3, 0.0)


def pack2(a, b):
    """u64 from two f32/u32 bit patterns (a in the high half: sorting by
    the packed key|id word orders by key first — id breaks ties)."""
    au = jax.lax.bitcast_convert_type(a, jnp.uint32).astype(jnp.uint64)
    bu = jax.lax.bitcast_convert_type(b, jnp.uint32).astype(jnp.uint64)
    return (au << 32) | bu


def unpack2(w, dtype):
    hi = jax.lax.bitcast_convert_type(
        (w >> 32).astype(jnp.uint32), dtype)
    lo = jax.lax.bitcast_convert_type(
        w.astype(jnp.uint32), dtype)
    return hi, lo


def main():
    n = 1_000_000
    rng = np.random.RandomState(4)
    key = jnp.asarray(rng.randint(0, 2 ** 31, n, dtype=np.int64)
                      .astype(np.uint32))
    ids = jnp.arange(n, dtype=jnp.uint32)
    x, y, z, r = (jnp.asarray(rng.random(n).astype("float32"))
                  for _ in range(4))
    print("backend:", jax.devices()[0].platform, flush=True)

    @partial(jax.jit, static_argnames=("k",))
    def chain6(args, k):
        def body(i, c):
            ks, is_, xs, ys, zs, rs = jax.lax.sort(
                (args + c.astype(jnp.uint32), ids, x, y, z, r),
                num_keys=1, is_stable=True)
            return c + (ks[0] & 1).astype(jnp.int32) \
                + (is_[0] & 1).astype(jnp.int32) \
                + (xs[0] + ys[0] + zs[0] + rs[0]).astype(jnp.int32) * 0
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    print("sort 6 operands: {:.3f} ms".format(
        chain_time(chain6, key)), flush=True)

    @partial(jax.jit, static_argnames=("k",))
    def chain3(args, k):
        def body(i, c):
            kw = (args + c.astype(jnp.uint32)).astype(jnp.uint64) << 32 \
                | ids.astype(jnp.uint64)
            xy = pack2(x, y)
            zr = pack2(z, r)
            kws, xys, zrs = jax.lax.sort(
                (kw, xy, zr), num_keys=1, is_stable=False)
            ks = (kws >> 32).astype(jnp.uint32)
            is_ = kws.astype(jnp.uint32)
            xs, ys = unpack2(xys, jnp.float32)
            zs, rs = unpack2(zrs, jnp.float32)
            return c + (ks[0] & 1).astype(jnp.int32) \
                + (is_[0] & 1).astype(jnp.int32) \
                + (xs[0] + ys[0] + zs[0] + rs[0]).astype(jnp.int32) * 0
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    print("sort 3x u64 packed: {:.3f} ms".format(
        chain_time(chain3, key)), flush=True)

    @partial(jax.jit, static_argnames=("k",))
    def chain2(args, k):
        def body(i, c):
            ks, is_ = jax.lax.sort(
                (args + c.astype(jnp.uint32), ids),
                num_keys=1, is_stable=True)
            return c + (ks[0] & 1).astype(jnp.int32) \
                + (is_[0] & 1).astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    print("sort key+id only: {:.3f} ms".format(
        chain_time(chain2, key)), flush=True)


if __name__ == "__main__":
    main()
