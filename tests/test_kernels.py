"""Pallas kernels in interpreter mode: streaming compaction + halo sweep."""

import numpy as np
import jax.numpy as jnp
import pytest

from collision_tpu.grid import build_grid
from collision_tpu.kernels.compact import NO_INDEX, compact_mask
from collision_tpu.kernels.halo import halo_pairs
from collision_tpu.testing import brute_force_collisions


def test_compact_mask():
    rng = np.random.RandomState(0)
    n = 300_000
    mask = rng.random(n) < 0.001
    expected = np.nonzero(mask)[0].astype("uint32")
    idx, cnt = compact_mask(jnp.asarray(mask), 1024, interpret=True)
    assert int(cnt) == len(expected)
    np.testing.assert_equal(np.asarray(idx)[: int(cnt)], expected)
    assert (np.asarray(idx)[int(cnt):] == NO_INDEX).all()


def test_compact_mask_overflow():
    # True count reported even past capacity; prefix in ascending order.
    rng = np.random.RandomState(1)
    mask = rng.random(100_000) < 0.01
    expected = np.nonzero(mask)[0].astype("uint32")
    idx, cnt = compact_mask(jnp.asarray(mask), 64, interpret=True)
    assert int(cnt) == len(expected)
    np.testing.assert_equal(np.asarray(idx), expected[:64])


def test_compact_mask_empty():
    idx, cnt = compact_mask(jnp.zeros(1000, bool), 16, interpret=True)
    assert int(cnt) == 0
    assert (np.asarray(idx) == NO_INDEX).all()


@pytest.mark.parametrize("n,gd,mc", [(200, 4, 32), (500, 8, 16)])
def test_halo_count_and_fill(n, gd, mc):
    rng = np.random.RandomState(n)
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 1.5 / np.sqrt(n), n).astype("float32")
    expected = brute_force_collisions(coords, radii)
    bins, ok, _ = build_grid(jnp.asarray(coords), jnp.asarray(radii), gd, mc)
    assert bool(ok)

    _, total = halo_pairs(bins, gd, mc, 0, interpret=True)
    assert int(total) == len(expected)

    pairs, total = halo_pairs(bins, gd, mc, len(expected) + 8, interpret=True)
    got = set(map(tuple, np.sort(np.asarray(pairs)[: int(total)], axis=1)))
    assert got == expected


def test_halo_overflow_contract():
    n = 200
    rng = np.random.RandomState(7)
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 2 / np.sqrt(n), n).astype("float32")
    expected = brute_force_collisions(coords, radii)
    assert len(expected) > 3
    bins, ok, _ = build_grid(jnp.asarray(coords), jnp.asarray(radii), 8, 32)
    pairs, total = halo_pairs(bins, 8, 32, 3, interpret=True)
    assert int(total) == len(expected)
    got = set(map(tuple, np.sort(np.asarray(pairs)[:3], axis=1)))
    assert got <= expected


@pytest.mark.parametrize("n,gd,mc", [(500, 8, 16), (300, 4, 64)])
def test_batched_count(n, gd, mc):
    from collision_tpu.kernels.batched import batched_count

    rng = np.random.RandomState(n)
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 1.5 / np.sqrt(n), n).astype("float32")
    expected = len(brute_force_collisions(coords, radii))
    bins, ok, _ = build_grid(jnp.asarray(coords), jnp.asarray(radii), gd, mc)
    assert int(batched_count(bins, gd, mc, interpret=True)) == expected
