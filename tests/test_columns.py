"""Column-sweep engine: plan + banded window sweep vs the oracle.

The column engine (columns.py + kernels/sweep.py) is the round-2 fast
path: z-sorted xy-columns with exact per-chunk z-windows. These tests run
the Pallas kernel in interpreter mode on CPU (the PoCL role, SURVEY §4)
and pin the parity contract: exact unordered unique pairs under strict
AABB overlap (reference collision.cl:164-166, 198-215).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from collision_tpu.columns import (
    CHUNK, LANE, default_column_config, plan_columns)
from collision_tpu.kernels.sweep import RPW_LADDER, sweep_count
from collision_tpu.testing import brute_force_collisions


def _count(coords, radii, gxy=None, col_cap=None, slab_rows=None,
           rolled=False):
    n = len(coords)
    dg, dc, ds = default_column_config(n)
    gxy = gxy or dg
    col_cap = col_cap or dc
    slab_rows = slab_rows or ds
    plan = plan_columns(
        jnp.asarray(coords), jnp.asarray(radii), gxy, col_cap, slab_rows)
    assert bool(plan.ok), (int(plan.max_col), int(plan.max_slab_rows))
    needed = int(plan.rows_rolled if rolled else plan.rows_needed)
    rpw = next(r for r in RPW_LADDER if r >= needed)
    return int(sweep_count(plan, rpw=rpw, interpret=True, rolled=rolled))


@pytest.mark.parametrize("n,rscale,seed", [
    (64, 1.0, 0),
    (317, 1.5, 1),      # non-power-of-2
    (1000, 0.5, 2),
    (2048, 2.0, 3),
])
def test_sweep_count_random_parity(n, rscale, seed):
    rng = np.random.RandomState(seed)
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, rscale / np.sqrt(n), n).astype("float32")
    expected = len(brute_force_collisions(coords, radii))
    assert _count(coords, radii) == expected


def test_sweep_count_single_column():
    # gxy=1: every sphere in one column; only the z-windows prune.
    rng = np.random.RandomState(5)
    n = 200
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 0.2, n).astype("float32")
    expected = len(brute_force_collisions(coords, radii))
    assert _count(coords, radii, gxy=1, col_cap=256, slab_rows=6) == expected


def test_sweep_count_max_z_regression():
    # Regression: a sphere exactly at the scene z-max once overflowed its
    # quantized z into the column bits (f32 rounds float(2^k - 1) UP in
    # the clip bound), duplicating pairs across columns.
    rng = np.random.RandomState(6)
    n = 128
    coords = rng.random((n, 3)).astype("float32")
    coords[7, 2] = coords[:, 2].max() + 0.5   # strict max at a known id
    coords[49, 2] = coords[:, 2].max()        # duplicate max
    radii = np.full(n, 0.3, "float32")
    expected = len(brute_force_collisions(coords, radii))
    assert _count(coords, radii, gxy=2, col_cap=192, slab_rows=4) == expected


def test_sweep_count_identical_positions():
    # All spheres coincident: n*(n-1)/2 pairs, single cell, windows are
    # the whole column.
    n = 96
    coords = np.full((n, 3), 0.25, "float32")
    radii = np.full(n, 0.1, "float32")
    assert _count(coords, radii, gxy=4, col_cap=128, slab_rows=4) \
        == n * (n - 1) // 2


def test_sweep_count_degenerate_axis():
    # Zero extent in z: zscale guard (zext -> 1) must keep keys finite.
    rng = np.random.RandomState(8)
    n = 150
    coords = rng.random((n, 3)).astype("float32")
    coords[:, 2] = 0.5
    radii = rng.uniform(0, 0.1, n).astype("float32")
    expected = len(brute_force_collisions(coords, radii))
    assert _count(coords, radii) == expected


def test_sweep_count_touching_is_not_overlap():
    # Strict inequality: AABBs sharing a face do not collide
    # (collision.cl:164-166).
    coords = np.array([[0.0, 0, 0], [1.0, 0, 0], [2.5, 0, 0]], "float32")
    radii = np.array([0.5, 0.5, 0.6], "float32")
    assert _count(coords, radii, gxy=1, col_cap=CHUNK, slab_rows=3) == 0


def test_plan_detects_column_overflow():
    # Capacity violations are detected via plan.ok, never silent.
    n = 300
    coords = np.full((n, 3), 0.5, "float32")
    radii = np.full(n, 0.01, "float32")
    plan = plan_columns(jnp.asarray(coords), jnp.asarray(radii), 4, 64, 4)
    assert not bool(plan.ok)
    assert int(plan.max_col) == n


def test_rows_needed_escalation():
    # A wide-radius scene forces windows spanning many stream rows; the
    # plan reports the required rows-per-window and the count is exact
    # once the static knob covers it.
    rng = np.random.RandomState(9)
    n = 600
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0.2, 0.4, n).astype("float32")
    expected = len(brute_force_collisions(coords, radii))

    plan = plan_columns(jnp.asarray(coords), jnp.asarray(radii),
                        2, 512, 8)
    assert bool(plan.ok)
    needed = int(plan.rows_needed)
    assert needed > 2  # the scene actually exercises escalation
    rpw = next(r for r in RPW_LADDER if r >= needed)
    assert int(sweep_count(plan, rpw=rpw, interpret=True)) == expected


def test_sweep_count_large_random():
    # Bigger-than-one-slab scene: exercises the multi-row stream layout
    # and chunk windows crossing LANE boundaries.
    rng = np.random.RandomState(10)
    n = 5000
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 1.2 / np.sqrt(n), n).astype("float32")
    expected = len(brute_force_collisions(coords, radii))
    assert _count(coords, radii) == expected


@pytest.mark.parametrize("n,rscale,seed", [
    (64, 1.0, 0),
    (317, 1.5, 1),
    (1000, 0.5, 2),
    (2048, 2.0, 3),
    (5000, 1.2, 10),
])
def test_rolled_sweep_count_parity(n, rscale, seed):
    # The rolled-window kernel (round-3 fast path) must agree with the
    # oracle on the same scenes as the plain kernel.
    rng = np.random.RandomState(seed)
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, rscale / np.sqrt(n), n).astype("float32")
    expected = len(brute_force_collisions(coords, radii))
    assert _count(coords, radii, rolled=True) == expected


def test_rolled_sweep_edge_cases():
    # Identical positions (whole-column windows, multi-row rolled reads),
    # degenerate z, strict-touch, and wide-radius escalation — the same
    # contracts the plain kernel pins.
    n = 96
    coords = np.full((n, 3), 0.25, "float32")
    radii = np.full(n, 0.1, "float32")
    assert _count(coords, radii, gxy=4, col_cap=128, slab_rows=4,
                  rolled=True) == n * (n - 1) // 2

    coords = np.array([[0.0, 0, 0], [1.0, 0, 0], [2.5, 0, 0]], "float32")
    radii = np.array([0.5, 0.5, 0.6], "float32")
    assert _count(coords, radii, gxy=1, col_cap=CHUNK, slab_rows=3,
                  rolled=True) == 0

    rng = np.random.RandomState(9)
    n = 600
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0.2, 0.4, n).astype("float32")
    expected = len(brute_force_collisions(coords, radii))
    plan = plan_columns(jnp.asarray(coords), jnp.asarray(radii), 2, 512, 8)
    assert bool(plan.ok)
    rolled_need = int(plan.rows_rolled)
    assert rolled_need <= int(plan.rows_needed)
    rpw = next(r for r in RPW_LADDER if r >= rolled_need)
    assert int(sweep_count(plan, rpw=rpw, interpret=True,
                           rolled=True)) == expected


def test_deep_rpw_dynamic_rows_parity():
    """rpw rungs past ROWS_STATIC_MAX run the kernels' dynamic row
    loops (the fully-unrolled form at rpw=64 blew the 16M scoped-VMEM
    stack on hardware — caught by tests_tpu on the forced-retry scene).
    Both count kernels and the masks kernel must stay exact there."""
    from collision_tpu.fill import mask_fill
    from collision_tpu.kernels.sweep import ROWS_STATIC_MAX

    rng = np.random.RandomState(21)
    n = 900
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 0.08, n).astype("float32")
    expected = brute_force_collisions(coords, radii)
    rpw = next(r for r in RPW_LADDER if r > ROWS_STATIC_MAX)
    plan = plan_columns(jnp.asarray(coords), jnp.asarray(radii), 2, 448, 8)
    assert bool(plan.ok)
    assert int(plan.rows_needed) <= rpw
    assert int(sweep_count(plan, rpw=rpw, interpret=True)) == len(expected)
    assert int(sweep_count(plan, rpw=rpw, interpret=True,
                           rolled=True)) == len(expected)
    ida, idb, total, ok = mask_fill(
        jnp.asarray(coords), jnp.asarray(radii), len(expected) + 8,
        2, 448, 8, rpw=rpw, interpret=True)
    assert bool(ok) and int(total) == len(expected)
    got = {tuple(sorted((int(a), int(b))))
           for a, b in zip(np.asarray(ida)[:int(total)],
                           np.asarray(idb)[:int(total)])}
    assert got == expected


def test_column_dual_dispatch_bases_exact():
    """sweep_count_dual: every base runs the rolled sweep at base rows
    (wcap clamped) and covers the remainder with one residual job per
    128-lane segment — exact at any window width given job capacity,
    the round-5 hetero count path (the old one-row residual bound
    dropped 7 of the reference scene's pairs behind ok=False)."""
    from collision_tpu.kernels.sweep import sweep_count_dual

    rng = np.random.RandomState(7)
    n = 4000
    coords = rng.random((n, 3)).astype("float32")
    r = (1.0 / np.sqrt(n)) * (rng.pareto(2.5, n) + 0.2)
    radii = np.clip(r, 0, 0.3).astype("float32")
    expected = len(brute_force_collisions(coords, radii))
    plan = plan_columns(jnp.asarray(coords), jnp.asarray(radii),
                        3, 2048, 64)
    assert bool(plan.ok)
    assert int(plan.rows_needed) > 2   # wide windows actually exercised
    for base in (1, 2, 3):
        cnt, ok = sweep_count_dual(plan, interpret=True, j_cap=2048,
                                   base=base)
        assert bool(ok)
        assert int(cnt) == expected
    # Job-list overflow stays detected (honest ok=False).
    _, ok_tight = sweep_count_dual(plan, interpret=True, j_cap=4)
    assert not bool(ok_tight)
