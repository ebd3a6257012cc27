"""Public broad-phase API: functional ``collide`` step + stateful ``Collider``.

TPU-native re-design of the reference's pipeline orchestrator
(/root/reference/collision/collision.py:32-198). The reference enqueues ~11
OpenCL commands per frame wired by an event DAG; here the entire frame —
scene-bounds reduction → Morton encoding → stable key/id sort → Karras LBVH
build → level-synchronous AABB refit → lockstep traversal with count-then-fill
pair compaction — is one pure function inside one ``jit``, so XLA's scheduler
replaces the hand-built event DAG and a moving-spheres simulation loop never
leaves the chip between steps.

Contract parity with the reference (SURVEY.md §3.1):
  1. output = set of unordered pairs of original sphere ids whose
     center±radius AABBs *strictly* overlap, each reported once, no
     self-pairs;
  2. pair order and within-pair order are unspecified (here: deterministic,
     stronger than the reference);
  3. the returned count is the true total even when it exceeds capacity, and
     only the first ``capacity`` pairs are written;
  4. count-only mode: capacity == 0 computes the count without a pair buffer;
     a ``None`` pair request with capacity > 0 raises ValueError
     (collision.py:134-135);
  5. Morton quantization: 10 bits/axis over the exact scene AABB of centers.
"""

import contextlib
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .lbvh.build import build, NO_NODE
from .lbvh.refit import leaf_bounds, refit
from .lbvh.traverse import find_pairs, traverse_count, STACK_DEPTH
from .ops.morton import morton_encode
from .ops.reduce import scene_bounds
from .ops.sort import argsort_keys
from .utils import round_up


class CollisionResult(NamedTuple):
    """Result of one broad-phase step.

    count:     uint32 — true number of colliding pairs (may exceed capacity).
    pairs:     uint32[capacity, 2] of original sphere ids, or None when
               capacity == 0 (count-only mode). Slots past min(count,
               capacity) hold 0xFFFFFFFF.
    scene_min: [3] scene AABB lower corner (of centers).
    scene_max: [3] scene AABB upper corner.
    ok:        bool — True unless a static knob of the selected method
               was insufficient (grid cell capacity, column/window knobs,
               BVH traversal-stack depth, count near int32 wrap); on False
               the caller must retry with larger knobs (the static-shape
               analog of the reference's count-past-capacity retry
               contract). None means trivially ok (single-sphere scene).
    """

    count: jax.Array
    pairs: Optional[jax.Array]
    scene_min: jax.Array
    scene_max: jax.Array
    ok: Optional[jax.Array] = None

    @property
    def overflowed(self):
        """True when count exceeded the pair-buffer capacity.

        Count-only results (pairs is None) never overflow — there is no
        buffer to overflow; the count is always the exact total.
        """
        if self.pairs is None:
            return False
        return self.count > self.pairs.shape[0]


#: Retained for API compatibility; auto routing no longer uses them
#: (the measured crossover made the column engine the floor at every n).
GRID_AUTO_THRESHOLD = 65536
COLUMN_AUTO_THRESHOLD = GRID_AUTO_THRESHOLD

#: Radius-spread factor above which eager "auto" routes to the
#: two-level hetero engine: the scene is heterogeneous when parking the
#: ``default_nb(n)`` largest spheres shrinks the predicted test reach
#: (see HETERO_GAIN_MIN / _route_hetero_eager — the routing decision
#: itself lives there, keyed on predicted window slack, not on this
#: legacy spread ratio, which missed the 3.46x-spread reference scene).
HETERO_ROUTE_FACTOR = 4.0  # retained for external callers

#: Largest rows-per-window rung the retry chain escalates to before
#: preferring a finer grid (gxy x2). Matches the kernels' fully-unrolled
#: regime (kernels/sweep.py ROWS_STATIC_MAX): higher rungs compile (the
#: kernels switch to dynamic row loops) but sweep wide windows slowly,
#: while a finer grid narrows the windows instead — cells clamp at
#: 2*r_max, so a finer gxy never changes results.
RPW_RETRY_MAX = 48

#: Smallest n at which eager "auto" pays the radius-spread probe; below
#: it the column engine with exact retry knobs handles any radius
#: distribution in ~ms (crossover table below).
HETERO_AUTO_MIN = 16384

#: Smallest n at which the hetero engine runs its S-S pass through the
#: slab engine (hetero.py _hetero_slab) instead of the column engine —
#: the same boundary as the uniform count crossover below, since the
#: S-S pass IS a uniform-ish count/fill over the parked scene. Callers
#: that pin column knobs (gxy/col_capacity/slab_rows) keep the column
#: pass regardless (the Collider's column-stat hetero ladder does this).
HETERO_SLAB_MIN = 65536

#: n at or above which "auto" prefers the slab engine for count-only
#: steps. Measured crossover on v5e (benchmarks/exp_r3_crossover.py,
#: uniform scenes, ms/step, results_v5e_round3.jsonl):
#:
#:     n        slab    column   grid    bvh
#:     4096     0.052   0.083    0.745   16.4
#:     16384    3.435*  0.166    0.332   103.2
#:     65536    0.352   0.512    1.264   475.3
#:     262144   1.814   4.174    8.483   (seconds)
#:     1M       9.580   17.369   30.901  (seconds)
#:
#: Column is the floor below 65536 (the starred slab row is a measured
#: small-gx cliff), slab above; BVH — 200-900x off at small n — is never
#: auto-selected (it remains the f64/robustness anchor and an explicit
#: method). With this split, auto is within 1.6x of the best engine at
#: every measured n (VERDICT r2 item 7's <=2x bar).
SLAB_AUTO_THRESHOLD = 65536

#: n at or above which "auto" prefers the slab engine for FILLS too.
#: The fill crossover sits higher than the count one — the column masks
#: kernel reads aligned rows while the slab fill adds dual-dispatch
#: residual machinery — measured on v5e (benchmarks/exp_r4_crossover.py,
#: capacity=16384 uniform scenes, ms/step, results_v5e_round4.jsonl):
#:
#:     n        slab fill   column fill
#:     65536    5.254       3.329
#:     262144   7.698       6.578
#:     524288   9.909       10.414
#:     1M       15.016      18.029
#:
#: Column wins through 262144, slab from 524288 up; the threshold sits
#: at the first measured n where slab wins.
SLAB_FILL_AUTO_THRESHOLD = 524288

#: When True, the TPU Pallas kernel paths (column sweep / mask fill) run
#: under the Pallas interpreter on non-TPU backends instead of falling
#: back to the portable XLA pipelines — lets the CPU test suite exercise
#: the exact code (and retry logic) that runs compiled on hardware.
_INTERPRET_KERNELS = False


@contextlib.contextmanager
def interpret_kernels():
    """Context manager: route f32 column collides through the Pallas
    kernels in interpreter mode on CPU (tests the TPU code paths —
    including ``Collider._retry_exact``'s plan-stat escalation — without
    hardware)."""
    global _INTERPRET_KERNELS
    prev = _INTERPRET_KERNELS
    _INTERPRET_KERNELS = True
    try:
        yield
    finally:
        _INTERPRET_KERNELS = prev

#: Largest pair capacity the legacy grid engine keeps in VMEM during its
#: sweep (the column fill engine has no such cap — pairs are assembled in
#: HBM by the run-expansion pipeline, fill.py).
GRID_MAX_CAPACITY = 262144

#: Default static rows-per-window for the column count sweep.
DEFAULT_RPW = 2


def default_grid_config(n, target_occupancy=72):
    """(grid_dim, cell_capacity) for ~``target_occupancy`` spheres per cell.

    Measured on v5e at 1M spheres: per-grid-step overhead (~30 µs of DMA
    issue per swept column) makes coarser grids win until tile compute
    takes over — grid_dim 24 / capacity ~112-120 beat the naive 32/64 by
    ~20% (docs/design.md). Capacity is sized ~5 Poisson sigmas above the
    mean occupancy so uniform scenes don't trip the overflow retry.
    """
    gd = int(min(max(round((n / target_occupancy) ** (1 / 3)), 4), 64))
    occ = n / gd ** 3
    mc = int(round_up(int(occ + 5 * occ ** 0.5 + 4), 8))
    mc = max(16, min(mc, max(16, round_up(n, 8))))
    return gd, mc


def default_grid_dim(n, target_occupancy=72):
    """Cells per axis for ~``target_occupancy`` spheres per cell."""
    return default_grid_config(n, target_occupancy)[0]


def _halo_vmem_bytes(grid_dim, cell_capacity, batched):
    """Rough VMEM footprint of the counting-sweep kernels (double-buffered
    center columns dominate; the 8-wide minor dim pads to 128 lanes)."""
    gp = grid_dim + 2
    center = gp * cell_capacity * 128 * 4
    lane = gp * 8 * round_up(cell_capacity, 128) * 4
    if batched:
        return 2 * (2 * center) + 12 * 2 * lane
    return 2 * center + 9 * 2 * lane


_VMEM_BUDGET = 12 * 2 ** 20


def _grid_collide(coords, radii, capacity, grid_dim, cell_capacity,
                  lo_scene, hi_scene):
    """Grid-engine frame: dense binning + halo-kernel count/emit.

    On TPU with float32 coords the fused Pallas halo kernel runs compiled;
    on CPU (tests) counting uses the XLA stencil and float32 pair emission
    falls back to the Pallas interpreter — same results, portable. Pair
    *emission* requires float32 (the kernels extract sphere ids from f32
    bitcast lanes); non-f32 emission requests are routed to the BVH engine
    by :func:`collide`, which produces the identical pair set.
    """
    from .grid import build_grid, grid_count
    from .kernels.emit import grid_fill
    from .kernels.halo import halo_pairs

    on_tpu = jax.default_backend() == "tpu" and coords.dtype == jnp.float32

    if capacity == 0 and not on_tpu:
        out = grid_count(
            coords, radii, grid_dim=grid_dim, cell_capacity=cell_capacity
        )
        return CollisionResult(out.total, None, lo_scene, hi_scene, ok=out.ok)

    if capacity == 0 and _halo_vmem_bytes(
        grid_dim, cell_capacity, batched=False
    ) > _VMEM_BUDGET:
        # Huge cell capacities (dense scenes after overflow retries) exceed
        # the sweep kernels' VMEM; the XLA stencil chunks arbitrarily and
        # stays exact, just slower.
        out = grid_count(
            coords, radii, grid_dim=grid_dim, cell_capacity=cell_capacity
        )
        return CollisionResult(out.total, None, lo_scene, hi_scene, ok=out.ok)

    bins, ok, _ = build_grid(coords, radii, grid_dim, cell_capacity)
    if capacity == 0:
        if grid_dim % 2 == 0 and _halo_vmem_bytes(
            grid_dim, cell_capacity, batched=True
        ) <= _VMEM_BUDGET:
            # Two y-columns per grid step: halves the per-step DMA-issue
            # overhead that dominates at tuned grid shapes.
            from .kernels.batched import batched_count

            total = batched_count(bins, grid_dim, cell_capacity)
        else:
            _, total = halo_pairs(bins, grid_dim, cell_capacity, 0)
        return CollisionResult(
            total.astype(jnp.uint32), None, lo_scene, hi_scene, ok=ok
        )
    # Fill: tile-counts sweep -> scan -> hit-tile compaction -> targeted
    # emission (kernels/emit.py) — emission work proportional to hits.
    pairs, total = grid_fill(
        bins, grid_dim, cell_capacity, capacity, interpret=not on_tpu
    )
    return CollisionResult(
        total.astype(jnp.uint32), pairs, lo_scene, hi_scene, ok=ok
    )


def _column_collide(coords, radii, capacity, gxy, col_capacity, slab_rows,
                    rpw, cand_capacity, lo_scene, hi_scene,
                    kernel_mode="native"):
    """Column-engine frame (the round-2 TPU fast path).

    On TPU/float32: count-only runs the Pallas banded-window sweep and
    fills run the gather-free mask fill (kernels/sweep.py + fill.py),
    both over the z-sorted column plan and with no capacity cap.
    Elsewhere (CPU tests, float64) the portable run-expansion pipeline
    counts/enumerates at input precision — unless ``kernel_mode ==
    "interpret"``, which runs the f32 Pallas paths under the interpreter
    so tests cover the hardware code. ``ok`` is False when a static knob
    (column/slab capacity, static rows-per-window, candidate bound,
    int32 count headroom) was insufficient; the plan's exact stats let
    the host retry once with exact knobs (Collider does this).
    """
    from .columns import plan_columns
    from .fill import mask_fill, run_fill
    from .kernels.sweep import sweep_count_guarded

    f32 = coords.dtype == jnp.float32
    on_tpu = jax.default_backend() == "tpu" and f32
    use_kernels = on_tpu or (kernel_mode == "interpret" and f32)
    interp = not on_tpu
    if capacity == 0 and use_kernels:
        plan = plan_columns(
            jnp.asarray(coords, jnp.float32), jnp.asarray(radii, jnp.float32),
            gxy, col_capacity, slab_rows,
        )
        # Lane-rolled + 4x-unrolled kernel: alignment-free row coverage
        # (the weaker rows_rolled bound) and pipelined chunk reads.
        count, no_ovf = sweep_count_guarded(
            plan, rpw=rpw, interpret=interp, rolled=True)
        ok = plan.ok & (plan.rows_rolled <= rpw) & no_ovf
        return CollisionResult(
            count.astype(jnp.uint32), None, lo_scene, hi_scene, ok=ok)
    if use_kernels:
        # Gather-free mask fill (fill.py): SoA internally — a [cap, 2]
        # AoS u32 array tiles to 64x its logical size on TPU, so the
        # stack is deferred to this API boundary (fine at API-scale
        # capacities; huge enumerations should call mask_fill directly).
        ida, idb, total, ok = mask_fill(
            coords, radii, capacity, gxy, col_capacity, slab_rows, rpw=rpw,
            interpret=interp)
        pairs = jnp.stack([ida, idb], axis=1)
        return CollisionResult(total, pairs, lo_scene, hi_scene, ok=ok)
    pairs, total, ok = run_fill(coords, radii, capacity, gxy, cand_capacity)
    return CollisionResult(total, pairs, lo_scene, hi_scene, ok=ok)


def _slab_collide(coords, radii, capacity, gx, col_capacity, slab_rows,
                  rpw, cand_capacity, lo_scene, hi_scene,
                  kernel_mode="native"):
    """Slab-engine frame (the round-3 sparse count fast path).

    On TPU/float32: count-only runs the 2-offset slab sweep
    (kernels/slab_sweep.py) and fills run the streaming in-kernel
    emission (kernels/slab_emit.py) over the x-sorted slab plan.
    Elsewhere (CPU tests, float64) the portable run-expansion pipeline
    applies, as for the column engine — unless ``kernel_mode ==
    "interpret"``. ``ok`` is False when a static knob (slab capacity,
    rolled rows-per-window, int32 headroom) was insufficient; the
    plan's stats let the host retry (Collider falls back to the column
    engine for scenes whose windows the slab geometry cannot hold).
    """
    from .fill import run_fill, slab_mask_fill
    from .kernels.slab_sweep import slab_count_dual
    from .slabs import plan_slabs

    f32 = coords.dtype == jnp.float32
    on_tpu = jax.default_backend() == "tpu" and f32
    use_kernels = on_tpu or (kernel_mode == "interpret" and f32)
    interp = not on_tpu
    if use_kernels:
        if capacity == 0:
            # Dual dispatch: 1-row sweep + vectorized residual — no
            # rows-per-window knob on the count path at all. (The
            # diagonal self pass, kernels/slab_sweep.slab_count_diag,
            # is exact-and-flagged but measured slower at 1M — 12.8 vs
            # 10.2 ms — because the cross-only windowed sweep still
            # pays full per-chunk overhead; see docs/design.md.)
            plan = plan_slabs(
                jnp.asarray(coords, jnp.float32),
                jnp.asarray(radii, jnp.float32),
                gx, col_capacity, slab_rows,
            )
            count, d_ok = slab_count_dual(plan, interpret=interp)
            return CollisionResult(
                count.astype(jnp.uint32), None, lo_scene, hi_scene,
                ok=plan.ok & d_ok)
        # Dual-dispatch fill: masks at ONE rolled row (windows clamped
        # to 128 lanes) + residual-pair append — no rows-per-window
        # knob, mirroring the dual count (VERDICT r3 item 3).
        ida, idb, total, ok = slab_mask_fill(
            coords, radii, capacity, gx, col_capacity, slab_rows,
            rpw=rpw, interpret=interp, dual=True)
        pairs = jnp.stack([ida, idb], axis=1)
        return CollisionResult(total, pairs, lo_scene, hi_scene, ok=ok)
    # Portable path (CPU tests, float64): the run-expansion pipeline is
    # column-keyed; resolve its own grid from n.
    from .columns import default_column_config

    pairs, total, ok = run_fill(
        coords, radii, capacity, default_column_config(coords.shape[0])[0],
        cand_capacity)
    return CollisionResult(total, pairs, lo_scene, hi_scene, ok=ok)


def _hetero_collide(coords, radii, capacity, nb, rpw, cand_capacity,
                    lo_scene, hi_scene, kernel_mode="native",
                    gxy=None, col_capacity=None, slab_rows=None,
                    engine="column", gx=None):
    """Hetero-engine frame: two-level radius bucketing (hetero.py).

    The TPU answer to the reference traversal's radius-agnosticism
    (collision.cl:174-226): the ``nb`` largest spheres are parked out of
    the S-S pass and enumerated by dense big-vs-stream /
    big-vs-big passes, so one giant radius no longer collapses the
    grid resolution. ``engine`` picks the S-S pass (slab above the
    crossover, column otherwise — see HETERO_SLAB_MIN); with the slab
    engine the column knobs are unused and ``gx`` takes slab semantics.
    On CPU/f64 without interpret mode the portable run-expansion
    pipeline applies (exact at input precision, same ok contract).
    """
    from .columns import CHUNK
    from .hetero import hetero_collide

    f32 = coords.dtype == jnp.float32
    on_tpu = jax.default_backend() == "tpu" and f32
    use_kernels = on_tpu or (kernel_mode == "interpret" and f32)
    if use_kernels and coords.shape[0] > CHUNK:
        if engine == "slab":
            pairs, total, ok = hetero_collide(
                coords, radii, capacity, nb=nb, engine="slab", gx=gx,
                interpret=not on_tpu)
        else:
            pairs, total, ok = hetero_collide(
                coords, radii, capacity, nb=nb, gxy=gxy,
                col_capacity=col_capacity, slab_rows=slab_rows, rpw=rpw,
                interpret=not on_tpu)
        return CollisionResult(total, pairs, lo_scene, hi_scene, ok=ok)
    from .columns import default_column_config
    from .fill import run_fill

    pairs, total, ok = run_fill(
        coords, radii, capacity, default_column_config(coords.shape[0])[0],
        cand_capacity)
    return CollisionResult(total, pairs, lo_scene, hi_scene, ok=ok)


def _quantize_gx(gx):
    """Round a derived slab count up to a coarse geometric bucket
    (~1.25x steps from 8) so eager re-derivations from drifting scene
    stats hit the jit cache: ``gx`` is a static knob of the jitted
    step, and in an eager simulation loop the scene extent moves every
    frame — an unquantized ``round(3*r*n/(ext*24))`` changes by ±1
    nearly every step, forcing a full XLA recompile per step. The
    ok/retry contract covers a slightly oversized bucket (a finer grid
    never changes results; cells clamp at 2*r_max)."""
    import math

    gx = max(int(gx), 1)
    if gx <= 8:
        return gx
    step = max(int(math.ceil(math.log(gx / 8.0) / math.log(1.25))), 0)
    q = int(math.ceil(8 * 1.25 ** step))
    while q < gx:
        q = int(math.ceil(q * 1.25))
    return min(q, 4096)


@partial(jax.jit, static_argnames=("nb",))
def _hetero_stats(coords, radii, nb):
    """f32[7] = (r_max, r_small, r_mean_small, r_mean_all, ext_x,
    ext_y, ext_z): the radius spread after parking the ``nb`` largest,
    the small-class and whole-scene mean radii, and the scene extents —
    everything the eager hetero route needs to size an S-S engine,
    packed into ONE array so the eager caller pays a single device
    fetch (each fetch is a full tunnel round-trip here)."""
    r = jnp.asarray(radii, jnp.float32)
    n = r.shape[0]
    top = jax.lax.top_k(r, nb + 1)[0]
    c = jnp.asarray(coords, jnp.float32)
    ext = jnp.max(c, axis=0) - jnp.min(c, axis=0)
    rsum = jnp.sum(r, dtype=jnp.float32)
    mean_small = (rsum - jnp.sum(top[:nb], dtype=jnp.float32)) \
        / jnp.float32(max(n - nb, 1))
    mean_all = rsum / jnp.float32(n)
    return jnp.concatenate(
        [jnp.stack([top[0], top[nb], mean_small, mean_all]), ext])


#: Predicted mean z-window slack (lanes past the 64-lane chunk span)
#: above which the slab engine's dual dispatch (windows clamped to one
#: 128-lane row + rare residuals) stops fitting and the hetero S-S
#: pass routes to the column engine's rolled windows instead.
#: default_slab_config targets slack 24 on the uniform family; 40
#: leaves the headroom the measured max-window stats showed at 1M.
SLAB_SLACK_MAX = 40.0


#: Minimum factor by which parking the default big set must shrink the
#: predicted test reach (2*r_mean + 2*r_max, the z-window height per
#: candidate) for the eager route to pay the hetero engine's premium.
#: The old rule — a bare r_max > 4*r_small spread test — never fired on
#: the 1M power-law reference scene (spread 3.46x), leaving it on the
#: uniform slab path whose ok=False result is garbage-by-contract
#: (round-5 measurement: public count 2289 vs 263959 true).
HETERO_GAIN_MIN = 2.0


def _predicted_slab_slack(n, r_max, r_mean, ext):
    """Mean z-window slack (lanes) of the dual-dispatch slab engine on
    an n-sphere scene with the given radius stats — the engine fits
    when this stays under SLAB_SLACK_MAX."""
    from .slabs import default_slab_config

    ext_x, _, ext_z = (max(float(e), 0.0) for e in ext)
    gx_f = default_slab_config(
        n, r_max=max(float(r_max), 1e-30), ext=ext_x)[0]
    z_lanes = n / max(ext_z, 1e-30)
    return (2.0 * float(r_mean) + 2.0 * float(r_max)) * z_lanes \
        / max(gx_f, 1)


def _hetero_route_knobs(n, nb, r_small, r_mean, ext):
    """S-S engine + knobs for a heterogeneous scene, from eager stats.

    Returns ("slab", gx) when the predicted z-window slack of the
    (physically clamped) slab grid fits the dual dispatch, else
    ("column", gxy, col_capacity, slab_rows, rpw) with the column grid
    clamped at the 2*r_small cell-width invariant and the rolled
    rows-per-window rung sized for the predicted window plus Poisson
    headroom. Pure host arithmetic — no device work."""
    from .columns import default_column_config
    from .kernels.sweep import RPW_LADDER
    from .slabs import default_slab_config

    ext_x, ext_y, ext_z = (max(float(e), 0.0) for e in ext)
    r_small = max(float(r_small), 1e-30)
    r_mean = max(float(r_mean), 0.0)
    reach = 2.0 * r_mean + 2.0 * r_small

    gx_f = default_slab_config(n, r_max=r_small, ext=ext_x)[0]
    z_lanes = n / max(ext_z, 1e-30)       # sorted lanes per unit z
    slack_slab = reach * z_lanes / max(gx_f, 1)
    if slack_slab <= SLAB_SLACK_MAX:
        return "slab", _quantize_gx(gx_f)

    # Column regime: cells at least 2*r_small wide (the 5-offset
    # stencil invariant), occupancy-targeted otherwise.
    gxy_cap = int(min(ext_x, ext_y) / (2.0 * r_small)) if r_small else 64
    gxy = int(np.clip(round((n / 1500.0) ** 0.5), 1, 64))
    gxy = max(1, min(gxy, max(gxy_cap, 1)))
    _, col_cap, slab_rows = default_column_config(n, gxy=gxy)
    occ = n / float(gxy * gxy)
    slack_col = reach * occ / max(ext_z, 1e-30)
    win = 64.0 + slack_col + 6.0 * slack_col ** 0.5 + 16.0
    need = int(-(-win // 128)) + 1
    rpw = next((r for r in RPW_LADDER if r >= need), RPW_LADDER[-1])
    return "column", gxy, col_cap, slab_rows, rpw


def _effective_nb(n, nb):
    """The big-set size :func:`hetero.hetero_collide` will actually park
    for an n-sphere scene and a caller-requested ``nb`` (None = default)
    — mirrors its clamping so routing stats describe the radii that
    really remain in the S-S pass."""
    from .columns import CHUNK
    from .hetero import default_nb

    if nb is None:
        return default_nb(n)
    eff = min(int(nb), (n // CHUNK) * CHUNK) or min(CHUNK, n)
    return min(max(eff, 1), n - 1)


def _route_hetero_eager(coords, radii, kernel_mode, nb=None):
    """(r_small, r_mean_small, ext[3]) when an eager "auto" call should
    use the hetero engine, None otherwise — the stats size the S-S
    engine via :func:`_hetero_route_knobs`.

    Only consulted with concrete (non-traced) inputs: one tiny jitted
    probe reads the radius spread + scene extents; traced calls (sim
    loops) keep static routing and rely on the ok/retry contract. The
    probe costs one fetch — microseconds on real hardware. ``nb`` is
    the caller's big-set request: the spread is measured at the nb
    that will actually be parked, so a caller pinning a larger (or
    smaller) big set gets an S-S pass sized for *its* remaining small
    class."""
    from .columns import CHUNK

    n = coords.shape[0]
    if n < HETERO_AUTO_MIN or n <= CHUNK:
        return None
    f32 = jnp.asarray(coords).dtype == jnp.float32
    on_tpu = jax.default_backend() == "tpu" and f32
    if not (on_tpu or (kernel_mode == "interpret" and f32)):
        return None
    s = np.asarray(_hetero_stats(coords, radii, _effective_nb(n, nb)))
    r_max, r_small, r_mean_s, r_mean_all = (float(v) for v in s[:4])
    ext = s[4:7]
    # Hetero pays when (a) the uniform engine's predicted windows blow
    # past the dual dispatch AND (b) parking the big set shrinks the
    # per-candidate test reach enough to matter. A bare spread-ratio
    # test (the old r_max > 4*r_small) missed the 1M power-law
    # reference scene (spread 3.46x) entirely, leaving the public call
    # on the uniform slab path's ok=False garbage.
    if _predicted_slab_slack(n, r_max, r_mean_all, ext) <= SLAB_SLACK_MAX:
        return None
    gain = (r_mean_all + r_max) / max(r_mean_s + r_small, 1e-30)
    if gain < HETERO_GAIN_MIN:
        return None
    return r_small, r_mean_s, ext


def default_cand_capacity(n, capacity):
    """Static bound on the fill pipeline's conservative candidates.

    Sized for uniform scenes (~30 conservative candidates per sphere at
    the default column occupancy); the ``ok`` retry contract covers
    denser scenes.
    """
    return max(1 << 17, 8 * capacity, 32 * n)


def collide(coords, radii, capacity, stack_depth=STACK_DEPTH, method="auto",
            grid_dim=None, cell_capacity=None, gxy=None, col_capacity=None,
            slab_rows=None, rpw=DEFAULT_RPW, cand_capacity=None,
            gx=None, nb=None, kernel_mode=None):
    """One fully-jitted broad-phase step.

    Args:
      coords: [n, 3] float sphere centers (n >= 1).
      radii:  [n] float sphere radii.
      capacity: static pair-buffer capacity; 0 = count-only.
      stack_depth: static traversal-stack depth (reference uses 64).
      method: "slab" (x-sorted 2-offset slab sweep — the round-3 sparse
        fast path, slabs.py), "column" (z-sorted column sweep + mask
        fill — the round-2 TPU fast path, columns.py/fill.py), "hetero"
        (two-level radius bucketing for mixed-radii scenes, hetero.py —
        the radius-agnostic path matching the reference traversal's
        contract, collision.cl:174-226), "bvh" (LBVH build + lockstep
        traversal, the reference architecture re-designed for XLA),
        "grid" (round-1 dense uniform-grid stencil + Pallas kernels,
        kept for parity), or "auto" (slab counts at n >=
        SLAB_AUTO_THRESHOLD and slab fills at n >=
        SLAB_FILL_AUTO_THRESHOLD, column for everything else — measured
        crossovers, never BVH; eager calls with concrete inputs
        additionally probe the radius spread and route heterogeneous
        scenes to "hetero").
      grid_dim, cell_capacity: static legacy-grid knobs (see grid.py).
      gxy, col_capacity, slab_rows, rpw: static column-sweep knobs
        (columns.py); None resolves defaults from n at trace time. The
        slab engine shares ``col_capacity``/``slab_rows``/``rpw``.
      cand_capacity: static candidate bound of the fill pipeline
        (fill.py); None resolves default_cand_capacity.
      gx: static slab count of the slab engine (slabs.py); None
        resolves default_slab_config.
      nb: static big-set size of the hetero engine (hetero.py); None
        resolves default_nb.
      kernel_mode: "native" (Pallas kernels on TPU, portable XLA
        elsewhere) or "interpret" (run the Pallas paths under the
        interpreter on CPU — test-only); None resolves from the
        :func:`interpret_kernels` context.

    On any static-knob overflow the result's ``ok`` is False and the
    caller retries with larger knobs (Collider automates this using the
    plan's exact stats).

    Returns:
      :class:`CollisionResult`.
    """
    if kernel_mode is None:
        kernel_mode = "interpret" if _INTERPRET_KERNELS else "native"
    n = np.shape(coords)[0]
    # The hetero engine's S-S pass: slab above the crossover, column
    # when the caller pinned column knobs (the Collider's column-stat
    # hetero ladder does) or below it. Decided HERE — eagerly, per
    # call — and threaded as a static arg so the jitted executable is
    # keyed on the choice (a global read at trace time would pin the
    # first call's decision into the cache).
    col_pinned = (gxy is not None or col_capacity is not None
                  or slab_rows is not None)
    hetero_engine = ("column" if col_pinned or n < HETERO_SLAB_MIN
                     else "slab")
    if (method == "auto"
            and not isinstance(coords, jax.core.Tracer)
            and not isinstance(radii, jax.core.Tracer)):
        stats = _route_hetero_eager(coords, radii, kernel_mode, nb=nb)
        if stats is not None:
            method = "hetero"
            if not col_pinned and n >= HETERO_SLAB_MIN and gx is None:
                # Size the S-S pass for the PARKED small class (the
                # probe's r_small), not the uniform default's 1/sqrt(n)
                # guess. The knob derivation also picks the ENGINE: a
                # wide radius spread makes even the clamped slab grid's
                # z-windows blow past the dual dispatch's one-row
                # regime (the 1M power-law scene predicts ~900-lane
                # windows against a 35-slab physical ceiling — round-5
                # hetero row measured the old always-slab route
                # returning ok=False with a garbage-capacity config),
                # and those scenes run the column engine's rolled
                # windows at a predicted rows-per-window rung instead.
                # Quantized/ladder knobs keep the jit cache stable
                # across frames of a moving scene.
                r_small, r_mean, ext = stats
                knobs = _hetero_route_knobs(n, _effective_nb(n, nb),
                                            r_small, r_mean, ext)
                if knobs[0] == "slab":
                    gx = knobs[1]
                else:
                    hetero_engine = "column"
                    gxy, col_capacity, slab_rows, pred_rpw = knobs[1:]
                    if rpw == DEFAULT_RPW:
                        rpw = pred_rpw
    return _collide(
        coords, radii, capacity, stack_depth, method, grid_dim,
        cell_capacity, gxy, col_capacity, slab_rows, rpw, cand_capacity,
        gx, nb, kernel_mode, hetero_engine)


@partial(jax.jit, static_argnames=(
    "capacity", "stack_depth", "method", "grid_dim", "cell_capacity",
    "gxy", "col_capacity", "slab_rows", "rpw", "cand_capacity", "gx",
    "nb", "kernel_mode", "hetero_engine"))
def _collide(coords, radii, capacity, stack_depth=STACK_DEPTH,
             method="auto", grid_dim=None, cell_capacity=None, gxy=None,
             col_capacity=None, slab_rows=None, rpw=DEFAULT_RPW,
             cand_capacity=None, gx=None, nb=None, kernel_mode="native",
             hetero_engine=None):
    coords = jnp.asarray(coords)
    radii = jnp.asarray(radii)
    n = coords.shape[0]

    if hetero_engine is None:
        # Back-compat for direct _collide callers; :func:`collide`
        # always threads an explicit choice (made eagerly per call, so
        # monkeypatched thresholds and knob changes re-key the cache).
        col_pinned = (gxy is not None or col_capacity is not None
                      or slab_rows is not None)
        hetero_engine = ("column" if col_pinned or n < HETERO_SLAB_MIN
                         else "slab")

    if grid_dim is None or cell_capacity is None:
        auto_gd, auto_mc = default_grid_config(n)
        grid_dim = auto_gd if grid_dim is None else grid_dim
        cell_capacity = auto_mc if cell_capacity is None else cell_capacity
    if gxy is None or col_capacity is None or slab_rows is None:
        from .columns import default_column_config

        auto = default_column_config(n)
        gxy = auto[0] if gxy is None else gxy
        col_capacity = auto[1] if col_capacity is None else col_capacity
        slab_rows = auto[2] if slab_rows is None else slab_rows
    if cand_capacity is None:
        cand_capacity = default_cand_capacity(n, capacity)

    if method == "auto":
        # Measured crossovers (SLAB_AUTO_THRESHOLD for counts,
        # SLAB_FILL_AUTO_THRESHOLD for fills): slab for large steps,
        # column everywhere else — never BVH, which is 200-900x slower
        # at every measured n.
        if capacity == 0 and n >= SLAB_AUTO_THRESHOLD:
            method = "slab"
        elif capacity > 0 and n >= SLAB_FILL_AUTO_THRESHOLD:
            method = "slab"
        else:
            method = "column"
    if method == "grid" and capacity > 0 and coords.dtype != jnp.float32:
        # The legacy grid emission kernels read sphere ids back out of
        # f32 bitcast lanes; wider dtypes have no compiled emission path
        # there. The column fill engine enumerates at input precision.
        method = "column"

    lo_scene, hi_scene = scene_bounds(coords)
    if n == 1:
        zero = jnp.uint32(0)
        pairs = (
            jnp.full((capacity, 2), NO_NODE, jnp.uint32) if capacity else None
        )
        return CollisionResult(zero, pairs, lo_scene, hi_scene)

    if method == "slab":
        from .slabs import default_slab_config

        # The slab engine sizes its per-slab capacities from its own gx
        # (caller-pinned or auto) rather than the shared column knobs.
        s_gx, s_cap, s_rows = default_slab_config(n, gx=gx)
        return _slab_collide(
            coords, radii, capacity, s_gx, s_cap, s_rows, rpw,
            cand_capacity, lo_scene, hi_scene, kernel_mode=kernel_mode,
        )
    if method == "column":
        return _column_collide(
            coords, radii, capacity, gxy, col_capacity, slab_rows, rpw,
            cand_capacity, lo_scene, hi_scene, kernel_mode=kernel_mode,
        )
    if method == "hetero":
        return _hetero_collide(
            coords, radii, capacity, nb, rpw, cand_capacity,
            lo_scene, hi_scene, kernel_mode=kernel_mode,
            gxy=gxy, col_capacity=col_capacity, slab_rows=slab_rows,
            engine=hetero_engine, gx=gx,
        )
    if method == "grid":
        return _grid_collide(
            coords, radii, capacity, grid_dim, cell_capacity,
            lo_scene, hi_scene,
        )
    if method != "bvh":
        raise ValueError("Unknown method: {}".format(method))

    codes = morton_encode(coords, lo_scene, hi_scene)
    codes_sorted, ids_sorted = argsort_keys(codes)
    tree = build(codes_sorted, ids_sorted)
    llo, lhi = leaf_bounds(coords, radii, tree.leaf_id)
    lo, hi = refit(tree, llo, lhi)

    if capacity == 0:
        counts, ok = traverse_count(
            tree, lo, hi, stack_depth=stack_depth, with_ok=True)
        return CollisionResult(
            jnp.sum(counts, dtype=jnp.uint32), None, lo_scene, hi_scene,
            ok=ok,
        )

    pairs, total, ok = find_pairs(
        tree, lo, hi, capacity, stack_depth=stack_depth, with_ok=True)
    return CollisionResult(total, pairs, lo_scene, hi_scene, ok=ok)


def collide_exact(coords, radii, capacity, method="auto"):
    """One broad-phase step with host-side exact-knob retries.

    The functional analog of ``Collider.get_collisions``'s retry chain
    (reallocate-and-retry, as the reference's resize contract,
    collision.py:84-119): one ``collide`` attempt, then — on a
    static-knob overflow — exact-stats column retries, the hetero
    engine, and finally the always-exact BVH. Requires concrete
    (non-traced) inputs; returns a :class:`CollisionResult` whose ``ok``
    is True (or None) unless every engine's ladder was exhausted.
    """
    coords = jnp.asarray(coords)
    c = Collider(coords.shape[0], coord_dtype=np.dtype(coords.dtype.name),
                 method=method)
    result = collide(coords, radii, capacity, method=method)
    if result.ok is not None and not bool(result.ok):
        result = c._retry_exact(coords, jnp.asarray(radii), capacity)
    return result


class Collider:
    """Stateful wrapper matching the reference Collider API
    (collision.py:32-135): holds (size, ngroups, group_size, coord_dtype),
    exposes ``padded_size``/``n_nodes``, validates the count-only contract,
    and supports ``resize``. Compilation caching plays the role the
    reference's shareable pre-compiled programs played — two Colliders with
    the same static shapes share one XLA executable.
    """

    code_dtype = np.dtype("uint32")
    flag_dtype = np.dtype("uint32")  # kept for parity; no flags on TPU
    counter_dtype = np.dtype("uint32")
    id_dtype = np.dtype("uint32")

    def __init__(self, size, ngroups=8, group_size=128,
                 coord_dtype=np.dtype("float32"), method="auto"):
        coord_dtype = np.dtype(coord_dtype)
        if coord_dtype.kind != "f":
            raise ValueError("Invalid dtype: {}".format(coord_dtype))
        self._check_params(size, ngroups, group_size)
        self.size = size
        self.ngroups = ngroups
        self.group_size = group_size
        self.coord_dtype = coord_dtype
        #: Engine selection forwarded to :func:`collide` (the reference
        #: has one engine; "auto" picks per problem size here).
        self.method = method

    @staticmethod
    def _check_params(size, ngroups, group_size):
        """Eager parameter validation, mirroring the reference's size/shape
        checks (collision.py:84-119, radix.py:61-74): sizes are positive
        integers; group sizes are powers of two (the reference's scan/sort
        granularity constraint — kept so invalid configs fail here instead
        of as confusing downstream shape errors)."""
        if not isinstance(size, (int, np.integer)) or size < 1:
            raise ValueError("Invalid size: {!r}".format(size))
        if not isinstance(ngroups, (int, np.integer)) or ngroups < 1:
            raise ValueError("Invalid ngroups: {!r}".format(ngroups))
        if (not isinstance(group_size, (int, np.integer)) or group_size < 1
                or (group_size & (group_size - 1)) != 0):
            raise ValueError(
                "group_size must be a positive power of two, got {!r}".format(
                    group_size
                )
            )

    @property
    def n_nodes(self):
        return self.size * 2 - 1

    @property
    def padded_size(self):
        """Sorter-granularity padding (reference collision.py:125-128).

        XLA sorts any N, so nothing is actually padded — the property is
        kept because callers sized buffers from it.
        """
        return round_up(self.size, 2 * self.group_size)

    def resize(self, size=None, ngroups=None, group_size=None, radix_bits=None):
        """Revalidate-and-apply, rolling back on failure — the reference
        revalidates every derived quantity and restores prior state when a
        new configuration is invalid (collision.py:84-119, radix.py:93-97).
        """
        new_size = self.size if size is None else size
        new_ngroups = self.ngroups if ngroups is None else ngroups
        new_group_size = self.group_size if group_size is None else group_size
        # Raises before any state is mutated: rollback by construction.
        self._check_params(new_size, new_ngroups, new_group_size)
        if radix_bits is not None:
            # Parity with the reference's radix_bits constraint
            # (radix.py:61-74): must divide the 32-bit key width and fit
            # the per-tile bucket budget.
            if (not isinstance(radix_bits, (int, np.integer))
                    or radix_bits < 1 or 32 % radix_bits != 0
                    or 2 ** radix_bits > 2 * new_group_size):
                raise ValueError(
                    "Invalid radix_bits: {!r}".format(radix_bits)
                )
        self.size = new_size
        self.ngroups = new_ngroups
        self.group_size = new_group_size

    def get_collisions(self, coords, radii, n_collisions, collisions=True):
        """Run one frame; mirrors reference get_collisions (collision.py:130-198).

        Args:
          coords: [size, 3] centers; radii: [size] radii.
          n_collisions: pair-buffer capacity.
          collisions: pass None for count-only mode (with n_collisions == 0);
            None with n_collisions > 0 raises ValueError, matching
            collision.py:134-135.

        Returns:
          count (uint32) when count-only, else (count, pairs[n_collisions, 2]).
        """
        if collisions is None and n_collisions > 0:
            raise ValueError("Invalid collisions_buf for n_collisions > 0")
        coords = jnp.asarray(coords, self.coord_dtype)
        radii = jnp.asarray(radii, self.coord_dtype)
        if coords.shape != (self.size, 3):
            raise ValueError(
                "Expected coords of shape {}, got {}".format(
                    (self.size, 3), coords.shape
                )
            )
        # One auto attempt; on a static-knob overflow (ok=False) retry
        # with *exact* knobs read from the engine's own statistics — the
        # host analog of the reference's reallocate-and-retry resize
        # (collision.py:84-119). The always-exact BVH engine is the last
        # resort for scenes no static configuration can hold.
        capacity = int(n_collisions)
        result = collide(coords, radii, capacity, method=self.method)
        if result.ok is not None and not bool(result.ok):
            result = self._retry_exact(coords, radii, capacity)
        if collisions is None or n_collisions == 0:
            return result.count
        return result.count, result.pairs

    #: Largest candidate bound the fill retry will provision before
    #: falling back to the BVH engine.
    CAND_MAX = 1 << 28

    def _retry_exact(self, coords, radii, capacity):
        """Retry the column engine with exact knobs from its statistics."""
        from .columns import default_column_config, plan_columns
        from .fill import candidate_count
        from .kernels.sweep import RPW_LADDER

        # The plan-stat branch needs the Pallas kernel paths — available
        # compiled on TPU or interpreted under interpret_kernels() (the
        # capability the CPU tests exercise).
        on_tpu = jax.default_backend() == "tpu"
        f32 = self.coord_dtype == np.float32
        if f32 and (on_tpu or _INTERPRET_KERNELS):
            # Radius-driven blowups never fit any column ladder — a
            # heterogeneous radius spread routes straight to the
            # two-level hetero engine (the reference capability:
            # radius-agnostic traversal, collision.cl:174-226).
            if self.size > 64:
                from .hetero import default_nb

                s = np.asarray(_hetero_stats(
                    jnp.asarray(coords, jnp.float32),
                    jnp.asarray(radii, jnp.float32),
                    default_nb(self.size)))
                r_max, r_small, r_mean_s, r_mean_all = (
                    float(v) for v in s[:4])
                gain = (r_mean_all + r_max) \
                    / max(r_mean_s + r_small, 1e-30)
                if (gain >= HETERO_GAIN_MIN
                        and _predicted_slab_slack(
                            self.size, r_max, r_mean_all, s[4:7])
                        > SLAB_SLACK_MAX):
                    res = self._hetero_exact(coords, radii, capacity)
                    if res is not None:
                        return res
            # Count sweep / mask fill: the column plan reports the exact
            # column occupancy / slab height / window row span it needs.
            gxy, col_cap, slab_rows = default_column_config(self.size)
            c32 = jnp.asarray(coords, jnp.float32)
            r32 = jnp.asarray(radii, jnp.float32)
            ext_xy = float(jnp.max(
                jnp.max(c32, axis=0)[:2] - jnp.min(c32, axis=0)[:2]))
            r_max_all = float(jnp.max(r32))
            last = None
            for _ in range(6):
                plan = plan_columns(c32, r32, gxy, col_cap, slab_rows)
                need_col = int(round_up(int(plan.max_col), 64))
                need_slab = int(plan.max_slab_rows) + 2
                need_rpw = int(plan.rows_needed)
                if (need_rpw > RPW_RETRY_MAX and gxy < 256
                        and ext_xy / (2 * gxy) >= 2 * r_max_all):
                    # Deep windows on a clustered scene: a finer grid
                    # narrows them (cells clamp at 2*r_max, so a finer
                    # gxy is always correct) — far cheaper than the
                    # dynamic-row wide sweep the high rpw rungs cost.
                    gxy *= 2
                    _, col_cap, slab_rows = default_column_config(
                        self.size, gxy=gxy)
                    continue
                if (need_col <= col_cap and need_slab <= slab_rows
                        and need_rpw <= RPW_LADDER[-1]):
                    rpw = next(r for r in RPW_LADDER if r >= need_rpw)
                    res = last = collide(
                        coords, radii, capacity, method="column", gxy=gxy,
                        col_capacity=col_cap, slab_rows=slab_rows, rpw=rpw,
                    )
                    if bool(res.ok):
                        return res
                # Stats were computed under too-small capacities; adopt
                # the exact requirements and re-plan (second pass sees
                # the full window tables).
                col_cap = max(col_cap, need_col)
                slab_rows = max(slab_rows, need_slab)
            # Mild heterogeneity below the routing factor can still blow
            # the column ladder; try the hetero engine before paying the
            # seconds-scale BVH fallback.
            res = self._hetero_exact(coords, radii, capacity)
            if res is not None:
                return res
            res = self._bvh_exact(coords, radii, capacity)
            if res is not None:
                return res
            # BVH gated (see BVH_TPU_MAX): report the best attempt's
            # honest ok=False rather than risk the device.
            if last is not None:
                return last
            return collide(coords, radii, capacity, method="column",
                           gxy=gxy, col_capacity=col_cap,
                           slab_rows=slab_rows, rpw=RPW_LADDER[-1])
        # Fill (or CPU/f64 count): the run-expansion pipeline needs a
        # larger candidate bound; its exact requirement is one cheap
        # (expansion-free) evaluation away.
        gxy = default_column_config(self.size)[0]
        needed = float(candidate_count(coords, radii, gxy))
        cand = min(int(needed * 1.02) + 1024, self.CAND_MAX)
        res = None
        if needed < self.CAND_MAX:
            res = collide(coords, radii, capacity, method="column",
                          cand_capacity=cand)
            if bool(res.ok):
                return res
        bres = self._bvh_exact(coords, radii, capacity)
        if bres is not None:
            return bres
        # BVH gated on TPU (BVH_TPU_MAX): return the honest ok=False.
        if res is None:
            res = collide(coords, radii, capacity, method="column",
                          cand_capacity=cand)
        return res

    def _hetero_exact(self, coords, radii, capacity):
        """Hetero-engine retry with plan-statistic knobs.

        One parked plan per big-set size reports the exact capacities and
        the rows-per-window rung (no blind ladder); if even the parked
        small class needs wide windows, park MORE (nb x4, x16 — a smaller
        small-class r_max narrows both the cells and the windows) before
        giving up. Returns None when no split reaches ok=True (or the
        scene is too small) — the caller then falls back to the BVH.
        """
        from .columns import CHUNK, default_column_config, plan_columns
        from .hetero import default_nb
        from .kernels.sweep import RPW_LADDER

        if self.size <= 2 * CHUNK:
            return None
        c32 = jnp.asarray(coords, jnp.float32)
        r32 = jnp.asarray(radii, jnp.float32)
        nb0 = default_nb(self.size)
        stats = np.asarray(_hetero_stats(c32, r32, nb0))
        route = _hetero_route_knobs(self.size, nb0, float(stats[1]),
                                    float(stats[2]), stats[4:7])
        if self.size >= HETERO_SLAB_MIN and route[0] == "slab":
            # Slab S-S pass first (the fast shape): size gx for the
            # parked small class, escalate it when the dual dispatch's
            # residual capacities trip (narrower slabs -> narrower
            # windows), then fall back to the column-stat ladder below.
            # The route predictor gates the whole rung: scenes whose
            # clamped slab grid predicts windows past the dual
            # dispatch's regime skip straight to the column ladder
            # instead of burning gx escalations that cannot succeed.
            # The component flags gate the escalation the same way: gx
            # only fixes the plan/residual capacities, so a failure in
            # the gx-independent side (B-S emitter, int32 wrap,
            # emission truncation) breaks out immediately.
            from .hetero import hetero_collide

            on_tpu = jax.default_backend() == "tpu"
            gx = route[1]
            lo_s, hi_s = scene_bounds(c32)
            for _ in range(3):
                pairs, total, ok, (gx_ok, other_ok) = hetero_collide(
                    coords, radii, capacity, nb=nb0, engine="slab",
                    gx=gx, interpret=not on_tpu, with_flags=True)
                if bool(ok):
                    return CollisionResult(
                        total, pairs, lo_s, hi_s, ok=ok)
                if not bool(other_ok):
                    break
                ngx = _quantize_gx(int(gx * 1.5) + 1)
                if ngx == gx:  # ladder capped out (gx clip)
                    break
                gx = ngx
        nb_cap = max(CHUNK, (self.size // (2 * CHUNK)) * CHUNK)
        tried = set()
        for nb in (nb0, nb0 * 4, nb0 * 16):
            nb = min(nb, nb_cap)
            if nb in tried:
                continue
            tried.add(nb)
            _, bidx = jax.lax.top_k(r32, nb)
            parked = r32.at[bidx.astype(jnp.int32)].set(-jnp.inf)
            if nb == nb0 and route[0] == "column":
                # Seed from the eager route's derived grid (cells
                # clamped at 2*r_small) — the plan loop below then only
                # refines capacities instead of rediscovering the grid.
                gxy, col_cap, slab_rows = route[1:4]
            else:
                gxy, col_cap, slab_rows = default_column_config(self.size)
            ext_xy = float(jnp.max(
                jnp.max(c32, axis=0)[:2] - jnp.min(c32, axis=0)[:2]))
            r_small = float(jnp.max(parked))
            need_rpw = None
            for _ in range(5):
                plan = plan_columns(c32, parked, gxy, col_cap, slab_rows)
                need_col = int(round_up(int(plan.max_col), 64))
                need_slab = int(plan.max_slab_rows) + 2
                need_rpw = int(plan.rows_needed)
                if bool(plan.ok) and need_rpw <= RPW_RETRY_MAX:
                    break
                if need_rpw > RPW_RETRY_MAX:
                    if (gxy < 256
                            and ext_xy / (2 * gxy) >= 2 * r_small):
                        gxy *= 2
                        _, col_cap, slab_rows = default_column_config(
                            self.size, gxy=gxy)
                        continue
                    need_rpw = None  # this split can't fit; park more
                    break
                col_cap = max(col_cap, need_col)
                slab_rows = max(slab_rows, need_slab)
            if need_rpw is None or need_rpw > RPW_RETRY_MAX:
                continue
            rpw = next(r for r in RPW_LADDER if r >= max(need_rpw, 1))
            res = collide(coords, radii, capacity, method="hetero",
                          nb=nb, rpw=rpw, gxy=gxy, col_capacity=col_cap,
                          slab_rows=slab_rows)
            if res.ok is not None and bool(res.ok):
                return res
        return None

    #: On TPU the BVH last resort is size-gated: the lockstep traversal
    #: at 10^5+ spheres on a hot scene runs for minutes — past the
    #: remote worker's execution watchdog, which kills the *worker*
    #: process, wedging every later call on the device (measured:
    #: tests_tpu's 1e5 power-law scene with a BVH reference crashed the
    #: v5e worker). An honest ok=False result beats a dead device; on
    #: CPU the gate is off (no watchdog, and the CPU suite's BVH parity
    #: tests run there).
    BVH_TPU_MAX = 65536

    def _bvh_exact(self, coords, radii, capacity):
        """Last-resort BVH collide, escalating the traversal-stack depth
        if a push was clipped (the reference would silently corrupt its
        traversal here, collision.cl:186-191). Returns None when gated
        (see BVH_TPU_MAX)."""
        if (jax.default_backend() == "tpu"
                and self.size > self.BVH_TPU_MAX):
            return None
        depth = STACK_DEPTH
        while True:
            res = collide(coords, radii, capacity, method="bvh",
                          stack_depth=depth)
            if res.ok is None or bool(res.ok) or depth >= 4096:
                return res
            depth *= 2
