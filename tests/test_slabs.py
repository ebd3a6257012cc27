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


def test_slab_dual_dispatch_wide_windows_exact():
    # Windows wider than 256 lanes used to exceed the one-residual-row
    # bound (ok=False); multi-segment residual jobs now cover them
    # exactly — given job capacity, the dual count must be exact with
    # ok=True on a scene whose windows need > 2 rows.
    from collision_tpu.kernels.slab_sweep import slab_count_dual

    rng = np.random.RandomState(19)
    n = 1200
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 0.25, n).astype("float32")
    expected = len(brute_force_collisions(coords, radii))
    plan = plan_slabs(jnp.asarray(coords), jnp.asarray(radii),
                      gx=1, col_capacity=1216, slab_rows=12)
    assert bool(plan.ok)
    need = int(plan.rows_rolled)
    assert need > 2          # wide windows actually exercised
    cnt, ok = slab_count_dual(plan, interpret=True, j_cap=512)
    assert bool(ok)
    assert int(cnt) == expected
    # Job-list overflow is still detected.
    _, ok_tight = slab_count_dual(plan, interpret=True, j_cap=4)
    assert not bool(ok_tight)
    # The ladder fallback stays exact.
    rpw = next(r for r in RPW_LADDER if r >= need)
    assert int(slab_count(plan, rpw=rpw, interpret=True)) == expected


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


@pytest.mark.parametrize("n,rscale,seed,d_max", [
    (317, 1.0, 23, 48),
    (1000, 0.5, 24, 48),
    (900, 1.5, 25, 130),   # d_max past one lane row (q=1 shifts)
    (2048, 2.0, 26, 130),  # ~341 spheres/slab: reach beyond 48
])
def test_slab_diag_count_parity(n, rscale, seed, d_max):
    # The diagonal self pass + masked cross pass partition the pair set
    # by sorted-index distance; whenever ok=True the count is exact.
    from collision_tpu.kernels.slab_sweep import slab_count_diag

    rng = np.random.RandomState(seed)
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, rscale / np.sqrt(n), n).astype("float32")
    gx, col_cap, slab_rows = default_slab_config(n)
    plan = plan_slabs(
        jnp.asarray(coords), jnp.asarray(radii), gx, col_cap, slab_rows)
    assert bool(plan.ok)
    cnt, ok = slab_count_diag(plan, d_max=d_max, interpret=True)
    assert bool(ok)
    assert int(cnt) == len(brute_force_collisions(coords, radii))


def test_slab_diag_detector_flags_undercount():
    # d_max too small for the scene: the in-kernel detector must flag
    # (ok=False) every time the diagonal span misses same-slab pairs —
    # a count may be wrong ONLY when flagged.
    from collision_tpu.kernels.slab_sweep import slab_count_diag

    rng = np.random.RandomState(27)
    n = 700
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 0.08, n).astype("float32")
    gx, col_cap, slab_rows = default_slab_config(n)
    plan = plan_slabs(
        jnp.asarray(coords), jnp.asarray(radii), gx, col_cap, slab_rows)
    expected = len(brute_force_collisions(coords, radii))
    for d_max in (4, 8, 16, 32, 64, 130):
        cnt, ok = slab_count_diag(plan, d_max=d_max, interpret=True)
        assert int(cnt) <= expected
        if int(cnt) != expected:
            assert not bool(ok)


def test_slab_diag_same_z_cluster_flags():
    # Every sphere at the same z (all pairwise-adjacent in sort order):
    # partners sit arbitrarily far in index distance, so the detector
    # must flag, and the windowed dual path must still be exact.
    from collision_tpu.kernels.slab_sweep import (
        slab_count_diag, slab_count_dual)

    rng = np.random.RandomState(28)
    n = 400
    coords = rng.random((n, 3)).astype("float32")
    coords[:, 2] = 0.5
    radii = np.full(n, 0.003, dtype="float32")
    gx, col_cap, slab_rows = default_slab_config(n)
    plan = plan_slabs(
        jnp.asarray(coords), jnp.asarray(radii), gx, col_cap, slab_rows)
    expected = len(brute_force_collisions(coords, radii))
    cnt, ok = slab_count_diag(plan, d_max=16, interpret=True)
    assert int(cnt) <= expected
    if int(cnt) != expected:
        assert not bool(ok)
    cnt2, ok2 = slab_count_dual(plan, interpret=True)
    assert bool(ok2) and int(cnt2) == expected


def test_slab_dual_fill_residuals():
    # The fill analog of dual dispatch: masks at one clamped row +
    # residual-pair append must reproduce the exact oracle set on a
    # scene whose windows exceed 128 lanes (VERDICT r3 item 3).
    from collision_tpu.fill import slab_mask_fill
    from collision_tpu.testing import pair_array_to_set

    rng = np.random.RandomState(17)
    n = 900
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 0.05, n).astype("float32")
    expected = brute_force_collisions(coords, radii)
    plan = plan_slabs(jnp.asarray(coords), jnp.asarray(radii),
                      gx=2, col_capacity=512, slab_rows=8)
    assert bool(plan.ok) and int(plan.rows_rolled) >= 2
    cap = len(expected) + 8
    ida, idb, total, ok = slab_mask_fill(
        coords, radii, cap, 2, 512, 8, interpret=True, dual=True)
    assert bool(ok)
    assert int(total) == len(expected)
    got = {(min(a, b), max(a, b))
           for a, b in zip(np.asarray(ida)[:int(total)],
                           np.asarray(idb)[:int(total)])}
    assert got == expected
    assert (np.asarray(ida)[int(total):] == 0xFFFFFFFF).all()

    # Truncate-at-capacity contract with residuals in play.
    cap2 = max(len(expected) - 5, 4)
    ida2, idb2, total2, ok2 = slab_mask_fill(
        coords, radii, cap2, 2, 512, 8, interpret=True, dual=True)
    assert int(total2) == len(expected)
    got2 = {(min(a, b), max(a, b))
            for a, b in zip(np.asarray(ida2)[:cap2],
                            np.asarray(idb2)[:cap2])}
    assert got2 <= expected and len(got2) == cap2


def test_slab_dual_fill_wide_windows():
    # Windows wider than 256 lanes used to force ok=False on the dual
    # fill; multi-segment residual jobs now cover them. The contract
    # stays: ok=True results are exact, ok=False (e.g. residual
    # job/pair capacity) falls back to the rpw ladder exactly.
    from collision_tpu.fill import slab_mask_fill

    rng = np.random.RandomState(19)
    n = 1200
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 0.25, n).astype("float32")
    expected = brute_force_collisions(coords, radii)
    plan = plan_slabs(jnp.asarray(coords), jnp.asarray(radii),
                      gx=1, col_capacity=1216, slab_rows=12)
    assert bool(plan.ok)
    need = int(plan.rows_rolled)
    assert need > 2          # wide windows actually exercised
    cap = len(expected) + 8
    ida, idb, total, ok = slab_mask_fill(
        coords, radii, cap, 1, 1216, 12, interpret=True, dual=True)
    if bool(ok):
        assert int(total) == len(expected)
        got = {(min(a, b), max(a, b))
               for a, b in zip(np.asarray(ida)[:int(total)],
                               np.asarray(idb)[:int(total)])}
        assert got == expected
    rpw = next(r for r in RPW_LADDER if r >= need)
    ida, idb, total, ok2 = slab_mask_fill(
        coords, radii, cap, 1, 1216, 12, rpw=rpw, interpret=True)
    assert bool(ok2) and int(total) == len(expected)
    got = {(min(a, b), max(a, b))
           for a, b in zip(np.asarray(ida)[:int(total)],
                           np.asarray(idb)[:int(total)])}
    assert got == expected
