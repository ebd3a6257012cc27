"""Distributed slab engine: all_to_all sort + per-device sweep parity.

Runs on the 8-virtual-device CPU mesh (conftest). The invariant is
bit-parity: the sharded count must equal the single-device slab count
(and the oracle) for any device count — every pair is tested on exactly
one device via the slab decomposition + one-slab halo.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from collision_tpu.parallel.sharded_slabs import slab_count_sharded
from collision_tpu.testing import brute_force_collisions


def _mesh(n_dev, axis="sp"):
    devs = jax.devices()[:n_dev]
    return Mesh(np.array(devs), (axis,))


@pytest.mark.parametrize("n_dev,n,gx,seed", [
    (1, 512, 8, 0),
    (2, 512, 8, 1),
    (4, 1024, 16, 2),
    (8, 2048, 16, 3),
])
def test_sharded_slab_count_parity(n_dev, n, gx, seed):
    rng = np.random.RandomState(seed)
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 1.2 / np.sqrt(n), n).astype("float32")
    expected = len(brute_force_collisions(coords, radii))
    count, ok = slab_count_sharded(
        jnp.asarray(coords), jnp.asarray(radii), _mesh(n_dev),
        gx=gx, interpret=True)
    assert bool(ok)
    assert int(count) == expected


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_slab_fill_bit_parity(n_dev):
    # Device-major slot order equals the global sweep order, so the
    # sharded pair buffer must be bit-identical to the single-device
    # slab mask fill.
    from collision_tpu.fill import slab_mask_fill
    from collision_tpu.parallel.sharded_slabs import slab_fill_sharded
    from collision_tpu.testing import pair_array_to_set

    rng = np.random.RandomState(23)
    n, gx, cap = 1024, 8, 1024
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 1.5 / np.sqrt(n), n).astype("float32")
    expected = brute_force_collisions(coords, radii)

    pairs, count, ok = slab_fill_sharded(
        jnp.asarray(coords), jnp.asarray(radii), cap, _mesh(n_dev),
        gx=gx, rpw=4, interpret=True)
    assert bool(ok)
    assert int(count) == len(expected)
    assert pair_array_to_set(pairs, count) == expected

    from collision_tpu.slabs import default_slab_config

    _, ccap, crows = default_slab_config(n, gx=gx)
    ida, idb, tot, sok = slab_mask_fill(
        jnp.asarray(coords), jnp.asarray(radii), cap, gx, ccap, crows,
        rpw=4, interpret=True)
    assert bool(sok) and int(tot) == len(expected)
    ref = np.stack([np.asarray(ida), np.asarray(idb)], axis=1)
    assert np.array_equal(np.asarray(pairs), ref)


def test_sharded_slab_skewed_scene():
    # All spheres in one octant: most devices own empty slabs, the
    # bucket exchange is maximally unbalanced but capacities detect it.
    rng = np.random.RandomState(7)
    n = 1024
    coords = (rng.random((n, 3)) * 0.3).astype("float32")
    radii = rng.uniform(0, 0.01, n).astype("float32")
    expected = len(brute_force_collisions(coords, radii))
    count, ok = slab_count_sharded(
        jnp.asarray(coords), jnp.asarray(radii), _mesh(4),
        gx=8, bucket_margin=8.0, interpret=True)
    if bool(ok):
        assert int(count) == expected


def test_sharded_slab_bucket_overflow_detected():
    # Tiny bucket margin on a skewed scene: ok must come back False
    # rather than a silently wrong count.
    rng = np.random.RandomState(9)
    n = 1024
    coords = (rng.random((n, 3)) * np.array([0.05, 1, 1])).astype("f4")
    radii = rng.uniform(0, 0.01, n).astype("float32")
    count, ok = slab_count_sharded(
        jnp.asarray(coords), jnp.asarray(radii), _mesh(4),
        gx=8, bucket_margin=0.05, interpret=True)
    assert not bool(ok)
