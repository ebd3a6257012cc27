"""Heterogeneous-radii engine (hetero.py + kernels/bigpass.py).

The reference's traversal is radius-agnostic (collision.cl:174-226);
these tests pin that the two-level bucketing engine reproduces the exact
oracle pair set on mixed-radii scenes the plain column engine cannot
hold — power-law radii, one giant sphere, big-big overlaps.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from collision_tpu.hetero import hetero_collide
from collision_tpu.testing import brute_force_collisions


def _run(coords, radii, nb, cap_extra=16, **kw):
    from collision_tpu.kernels.sweep import RPW_LADDER

    expected = brute_force_collisions(coords, radii)
    cap = len(expected) + cap_extra
    # Host-escalate the static rows-per-window knob, the same ladder the
    # Collider walks (windows depend on the parked small-class r_max, so
    # the right rung is only known after the split).
    for rpw in RPW_LADDER:
        pairs, total, ok = hetero_collide(
            jnp.asarray(coords), jnp.asarray(radii), cap, nb=nb,
            rpw=rpw, interpret=True, **kw)
        if bool(ok):
            break
    assert bool(ok)
    assert int(total) == len(expected)
    got = {(min(a, b), max(a, b))
           for a, b in np.asarray(pairs)[:int(total)]}
    assert got == expected
    assert (np.asarray(pairs)[int(total):] == 0xFFFFFFFF).all()

    # count-only agrees (same escalated rung: ok is knob-honest)
    _, total2, ok2 = hetero_collide(
        jnp.asarray(coords), jnp.asarray(radii), 0, nb=nb,
        rpw=rpw, interpret=True, **kw)
    assert bool(ok2) and int(total2) == len(expected)


def test_power_law_radii():
    rng = np.random.RandomState(0)
    n = 1500
    coords = rng.random((n, 3)).astype("float32")
    # Pareto-ish tail: a few spheres 30-100x the median radius.
    radii = (0.004 * (1 + rng.pareto(1.2, n))).clip(0, 0.35)\
        .astype("float32")
    _run(coords, radii, nb=128)


def test_one_giant_sphere():
    rng = np.random.RandomState(1)
    n = 800
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 0.02, n).astype("float32")
    radii[17] = 0.4  # overlaps a large fraction of the scene
    _run(coords, radii, nb=64)


def test_big_big_overlaps():
    # Several giants overlapping each other: exercises the B-B brute
    # path and its i<j dedup.
    rng = np.random.RandomState(2)
    n = 600
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 0.01, n).astype("float32")
    radii[100:110] = rng.uniform(0.2, 0.3, 10)
    _run(coords, radii, nb=64)


def test_uniform_scene_still_exact():
    # No actual heterogeneity: parking the top-nb radii must not change
    # the answer.
    rng = np.random.RandomState(3)
    n = 1000
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 1.5 / np.sqrt(n), n).astype("float32")
    _run(coords, radii, nb=128)


def test_overflow_contract():
    rng = np.random.RandomState(4)
    n = 500
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 0.02, n).astype("float32")
    radii[:8] = 0.3
    expected = brute_force_collisions(coords, radii)
    assert len(expected) > 10
    cap = len(expected) // 2
    # The S-S mask fill needs the aligned-row bound (rows_needed), so
    # escalate rpw like any real caller until the engine reports ok.
    pairs = total = ok = None
    for rpw in (1, 2, 4, 8, 16):
        pairs, total, ok = hetero_collide(
            jnp.asarray(coords), jnp.asarray(radii), cap, nb=64,
            rpw=rpw, interpret=True)
        if bool(ok):
            break
    assert bool(ok)
    assert int(total) == len(expected)
    got = {(min(a, b), max(a, b)) for a, b in np.asarray(pairs)[:cap]}
    assert got <= expected and len(got) == cap


def _run_slab(coords, radii, nb, cap_extra=16):
    """Slab-engine variant of _run: escalate gx (the dual dispatch has
    no rpw knob; residual capacities narrow with more slabs)."""
    expected = brute_force_collisions(coords, radii)
    cap = len(expected) + cap_extra
    pairs = total = ok = None
    gx = None
    for gx in (None, 8, 16, 32, 64):
        pairs, total, ok = hetero_collide(
            jnp.asarray(coords), jnp.asarray(radii), cap, nb=nb,
            interpret=True, engine="slab", gx=gx)
        if bool(ok):
            break
    assert bool(ok)
    assert int(total) == len(expected)
    got = {(min(a, b), max(a, b))
           for a, b in np.asarray(pairs)[:int(total)]}
    assert got == expected
    assert (np.asarray(pairs)[int(total):] == 0xFFFFFFFF).all()

    _, total2, ok2 = hetero_collide(
        jnp.asarray(coords), jnp.asarray(radii), 0, nb=nb,
        interpret=True, engine="slab", gx=gx)
    assert bool(ok2) and int(total2) == len(expected)


def test_slab_engine_power_law():
    """The round-4 hetero fast path (S-S through the slab engine) is
    oracle-exact on the power-law scene — fill and count."""
    rng = np.random.RandomState(0)
    n = 1500
    coords = rng.random((n, 3)).astype("float32")
    radii = (0.004 * (1 + rng.pareto(1.2, n))).clip(0, 0.35)\
        .astype("float32")
    _run_slab(coords, radii, nb=128)


def test_slab_engine_giant_sphere():
    rng = np.random.RandomState(1)
    n = 800
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 0.02, n).astype("float32")
    radii[17] = 0.4
    _run_slab(coords, radii, nb=64)


def test_slab_engine_uniform_scene():
    # No actual heterogeneity: the slab S-S pass over a parked uniform
    # scene must still be exact.
    rng = np.random.RandomState(3)
    n = 1000
    coords = rng.random((n, 3)).astype("float32")
    radii = rng.uniform(0, 1.5 / np.sqrt(n), n).astype("float32")
    _run_slab(coords, radii, nb=128)


def test_collide_auto_routes_slab_hetero(monkeypatch):
    """Public ``collide(method="auto")`` above HETERO_SLAB_MIN routes a
    heterogeneous scene to the hetero engine's SLAB S-S pass with a
    stats-sized gx, and the Collider retry reaches exact through the
    slab ladder (thresholds lowered so interpret mode stays fast)."""
    from collision_tpu import collide, collider, interpret_kernels
    from collision_tpu.testing import brute_force_collisions as oracle

    rng = np.random.RandomState(7)
    n = 1200
    coords = rng.random((n, 3)).astype("float32")
    radii = (0.004 * (1 + rng.pareto(1.2, n))).clip(0, 0.3)\
        .astype("float32")
    expected = oracle(coords, radii)
    cap = len(expected) + 8
    monkeypatch.setattr(collider, "HETERO_AUTO_MIN", 256)
    monkeypatch.setattr(collider, "HETERO_SLAB_MIN", 256)

    calls = []
    import collision_tpu.hetero as hetero_mod
    real = hetero_mod._hetero_slab

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(hetero_mod, "_hetero_slab", spy)
    with interpret_kernels():
        res = collide(jnp.asarray(coords), jnp.asarray(radii), cap)
        if not bool(res.ok):
            c = collider.Collider(n)
            count, pairs = c.get_collisions(coords, radii, cap)
        else:
            count, pairs = res.count, res.pairs
    assert calls, "slab hetero pass was not used"
    assert int(count) == len(expected)
    got = {(min(a, b), max(a, b))
           for a, b in np.asarray(pairs)[:int(count)]}
    assert got == expected


def test_route_knobs_reference_scene():
    """Routing math regression: the 1M power-law reference scene's
    measured stats (round-5 session) must route the hetero S-S pass to
    the COLUMN engine at the proven gxy=26/rpw=3-class configuration —
    the always-slab route derived gx=2118 against a physically ~35-slab
    grid and returned ok=False garbage on the first public call."""
    from collision_tpu import collider

    knobs = collider._hetero_route_knobs(
        1_000_000, 1024, 0.01445, 0.00124, np.array([1.0, 1.0, 1.0]))
    assert knobs[0] == "column"
    gxy, col_cap, slab_rows, rpw = knobs[1:]
    assert 20 <= gxy <= 34          # cells clamped at 2*r_small
    assert rpw >= 2                 # predicted multi-row windows
    # A mild spread keeps the slab dual dispatch.
    knobs_u = collider._hetero_route_knobs(
        1_000_000, 1024, 0.0012, 0.0005, np.array([1.0, 1.0, 1.0]))
    assert knobs_u[0] == "slab"
    assert knobs_u[1] <= 4096


def test_eager_gate_uses_gain_not_spread_ratio():
    """The eager hetero gate fires on the reference scene's 3.46x
    spread (the old r_max > 4*r_small ratio test missed it) and stays
    off for uniform radii."""
    from collision_tpu import collider

    n = 1_000_000
    ext = np.array([1.0, 1.0, 1.0])
    # Reference-scene stats: uniform slab slack is hopeless (r_max
    # 0.05 -> ~10 effective slabs) and parking gains 3.3x.
    slack_u = collider._predicted_slab_slack(n, 0.05, 0.00137, ext)
    assert slack_u > collider.SLAB_SLACK_MAX
    gain = (0.00137 + 0.05) / (0.00124 + 0.01445)
    assert gain >= collider.HETERO_GAIN_MIN
    # Uniform scene: slack fits, no hetero.
    slack_uni = collider._predicted_slab_slack(n, 0.001, 0.0005, ext)
    assert slack_uni <= collider.SLAB_SLACK_MAX


def test_slab_config_physical_gx_ceiling():
    """default_slab_config caps the formula gx at ext/(2*r_max): the
    plan clamps slab width there, so a larger gx only manufactures
    empty slabs while sizing capacities for an occupancy the grid
    cannot deliver."""
    from collision_tpu.slabs import default_slab_config

    gx, col_cap, _ = default_slab_config(
        1_000_000, r_max=0.01445, ext=1.0)
    assert gx <= int(1.0 / (2 * 0.01445)) + 1
    # Capacities must be sized for the CLAMPED occupancy.
    assert col_cap >= (1_000_000 // gx)
