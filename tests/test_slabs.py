"""Slab-sweep engine: 1-D plan + 2-offset banded sweep vs the oracle.

The slab engine (slabs.py + kernels/slab_sweep.py) is the round-3 sparse
count path: x-sorted slabs, z-continuous windows, y handled only by the
in-tile compare. These tests run the Pallas kernel in interpreter mode
on CPU (the PoCL role, SURVEY §4) and pin the parity contract: exact
unordered unique pair counts under strict AABB overlap (reference
collision.cl:164-166, 198-215).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from collision_tpu.slabs import default_slab_config, plan_slabs
from collision_tpu.kernels.slab_sweep import slab_count, slab_count_guarded
from collision_tpu.kernels.sweep import RPW_LADDER
from collision_tpu.testing import brute_force_collisions


def _count(coords, radii, gx=None, col_cap=None, slab_rows=None):
    n = len(coords)
    dg, dc, ds = default_slab_config(n)
    gx = gx or dg
    col_cap = col_cap or dc
    slab_rows = slab_rows or ds
    plan = plan_slabs(
        jnp.asarray(coords), jnp.asarray(radii), gx, col_cap, slab_rows)
    assert bool(plan.ok), (int(plan.max_col), int(plan.max_slab_rows))
    rpw = next(r for r in RPW_LADDER if r >= int(plan.rows_rolled))
    return int(slab_count(plan, rpw=rpw, interpret=True))


@pytest.mark.parametrize("n,rscale,seed", [
    (64, 1.0, 0),
    (317, 1.5, 1),      # non-power-of-2
    (1000, 0.5, 2),
    (2048, 2.0, 3),
])
def test_slab_count_random_parity(n, rscale, seed):
    rng = np.random.RandomState(seed)
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, rscale / np.sqrt(n), n).astype("float32")
    expected = len(brute_force_collisions(coords, radii))
    assert _count(coords, radii) == expected


@pytest.mark.parametrize("gx", [1, 3, 16])
def test_slab_count_gx_sweep(gx):
    # The count must be gx-independent: windows are conservative
    # supersets at any slab resolution.
    rng = np.random.RandomState(7)
    n = 500
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 0.08, n).astype("float32")
    expected = len(brute_force_collisions(coords, radii))
    assert _count(coords, radii, gx=gx, col_cap=512, slab_rows=8) == expected


def test_slab_count_boundary_regression():
    # Spheres straddling slab boundaries and at the exact scene extremes.
    coords = np.array([
        [0.0, 0.5, 0.0], [1.0, 0.5, 1.0], [0.5, 0.5, 0.5],
        [0.5001, 0.5, 0.5], [0.25, 0.5, 1.0], [0.2501, 0.5, 1.0],
    ], dtype="float32")
    radii = np.full(6, 0.01, dtype="float32")
    expected = len(brute_force_collisions(coords, radii))
    assert _count(coords, radii, gx=4, col_cap=64, slab_rows=6) == expected


def test_slab_count_degenerate_axis():
    # All spheres share one x: a single slab holds everything.
    rng = np.random.RandomState(9)
    n = 150
    coords = rng.random((n, 3)).astype("float32")
    coords[:, 0] = 0.25
    radii = rng.uniform(0, 0.05, n).astype("float32")
    expected = len(brute_force_collisions(coords, radii))
    assert _count(coords, radii, gx=8, col_cap=192, slab_rows=6) == expected


def test_slab_overflow_detected():
    # col_capacity too small for a clustered scene -> ok=False, never a
    # silent wrong answer (the reference's retry contract,
    # collision.cl:203-207).
    rng = np.random.RandomState(11)
    n = 256
    coords = (rng.random((n, 3)) * 0.01).astype("float32")
    radii = np.full(n, 1e-4, dtype="float32")
    plan = plan_slabs(jnp.asarray(coords), jnp.asarray(radii),
                      gx=4, col_capacity=64, slab_rows=4)
    assert not bool(plan.ok)
    assert int(plan.max_col) > 64


def test_collider_slab_method_retry_exact():
    # A clustered scene the default slab knobs cannot hold: the Collider
    # must converge to the exact result via its retry ladder (slab ->
    # exact-knob column / BVH), never returning a wrong count.
    from collision_tpu.collider import Collider, interpret_kernels

    rng = np.random.RandomState(31)
    n = 600
    coords = (rng.random((n, 3)) * 0.02).astype("float32")  # dense blob
    radii = rng.uniform(0, 0.01, n).astype("float32")
    expected = len(brute_force_collisions(coords, radii))
    with interpret_kernels():
        coll = Collider(n, method="slab")
        cnt = coll.get_collisions(coords, radii, 0, collisions=None)
    assert int(cnt) == expected


def test_slab_dual_dispatch_residuals():
    # Windows wider than 128 lanes: the 1-row clamped sweep misses the
    # tail, the residual pass must recover it exactly.
    from collision_tpu.kernels.slab_sweep import slab_count_dual

    rng = np.random.RandomState(17)
    n = 900
    coords = rng.random((n, 3)).astype("float32")
    # gx=2, rmax=0.05: max window 179 lanes (verified) — in the
    # (128, 256] regime the residual pass covers.
    radii = rng.uniform(0, 0.05, n).astype("float32")
    plan = plan_slabs(jnp.asarray(coords), jnp.asarray(radii),
                      gx=2, col_capacity=512, slab_rows=8)
    assert bool(plan.ok)
    assert int(plan.rows_rolled) >= 2  # residuals actually exercised
    cnt, ok = slab_count_dual(plan, interpret=True)
    assert bool(ok)
    assert int(cnt) == len(brute_force_collisions(coords, radii))


def test_slab_dual_dispatch_overflow_detected():
    # Windows wider than 256 lanes exceed the one-residual-row bound:
    # ok must come back False (the caller falls back to the rpw ladder).
    from collision_tpu.kernels.slab_sweep import slab_count_dual

    rng = np.random.RandomState(19)
    n = 1200
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 0.25, n).astype("float32")
    plan = plan_slabs(jnp.asarray(coords), jnp.asarray(radii),
                      gx=1, col_capacity=1216, slab_rows=12)
    assert bool(plan.ok)
    need = int(plan.rows_rolled)
    cnt, ok = slab_count_dual(plan, interpret=True)
    if need > 2:
        assert not bool(ok)
    # The ladder fallback stays exact.
    rpw = next(r for r in RPW_LADDER if r >= need)
    assert int(slab_count(plan, rpw=rpw, interpret=True)) == \
        len(brute_force_collisions(coords, radii))


def test_collide_slab_interpret_parity():
    # collide(method="slab") through the interpret-kernels context runs
    # the exact TPU code paths (count sweep and streaming fill) on CPU.
    from collision_tpu.collider import collide, interpret_kernels
    from collision_tpu.testing import pair_array_to_set

    rng = np.random.RandomState(21)
    n = 800
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 1.2 / np.sqrt(n), n).astype("float32")
    expected = brute_force_collisions(coords, radii)
    with interpret_kernels():
        res_c = collide(coords, radii, 0, method="slab", rpw=4)
        assert bool(res_c.ok)
        assert int(res_c.count) == len(expected)
        res_f = collide(coords, radii, 2048, method="slab", rpw=4)
    assert bool(res_f.ok)
    assert int(res_f.count) == len(expected)
    got = pair_array_to_set(res_f.pairs, res_f.count)
    assert got == expected


def test_slab_rows_rolled_bound():
    # rpw >= rows_rolled is exactly the sufficiency bound: running at
    # the plan's own requirement matches the oracle.
    rng = np.random.RandomState(13)
    n = 600
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 0.12, n).astype("float32")
    plan = plan_slabs(jnp.asarray(coords), jnp.asarray(radii),
                      gx=2, col_capacity=384, slab_rows=6)
    assert bool(plan.ok)
    need = int(plan.rows_rolled)
    assert need >= 2  # the scene actually exercises multi-row windows
    rpw = next(r for r in RPW_LADDER if r >= need)
    expected = len(brute_force_collisions(coords, radii))
    cnt, no_ovf = slab_count_guarded(plan, rpw=rpw, interpret=True)
    assert int(cnt) == expected
    assert bool(no_ovf)
