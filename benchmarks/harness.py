"""Minimal benchmark harness (pytest-benchmark is not available here).

Mirrors the reference's pedantic-mode methodology
(/root/reference/tests/benchmarks: warmup rounds, explicit timed rounds)
with **chained on-device timing**: on this environment's remote TPU
backend ``block_until_ready`` does not actually block and every
device-to-host fetch pays a ~25-30 ms tunnel round-trip, so wall-clock
around a single call measures the tunnel, not the device. Instead the
step under test is iterated K times inside one jit with a data dependency
between iterations (so XLA cannot fold or overlap them), and the per-step
time is the difference between a K+1-chain and a 1-chain around one fetch
each — cancelling both the round-trip and dispatch overheads.
"""

import json
import time
from functools import partial

import numpy as np

#: When configured via :func:`set_jsonl`, every :func:`report` row is also
#: appended as one machine-readable JSON line (round-over-round tables are
#: generated from these instead of hand-transcribed).
_JSONL = {"path": None, "tags": {}}


def set_jsonl(path, **tags):
    """Mirror all subsequent report() rows to ``path`` as JSON lines,
    each tagged with ``tags`` (e.g. round="r3", backend="tpu-v5e")."""
    _JSONL["path"] = path
    _JSONL["tags"] = dict(tags)


def bench_chained(step, args, rounds=10, repeats=3):
    """Per-step milliseconds of ``args -> step(i, args) -> args``.

    ``step`` must return a pytree of the same structure/shapes as
    ``args`` and must make iteration k+1 depend on k's *values* (e.g.
    perturb an input by a result-derived epsilon) so the chain cannot be
    folded.
    """
    import jax

    @partial(jax.jit, static_argnames=("k",))
    def chain(args, k):
        return jax.lax.fori_loop(0, k, step, args)

    def probe(tree):
        return np.asarray(jax.tree_util.tree_leaves(tree)[0].ravel()[:1])

    def run(k):
        probe(chain(args, k))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t = time.perf_counter()
            probe(chain(args, k))
            best = min(best, time.perf_counter() - t)
        return best

    t1 = run(1)
    tn = run(rounds + 1)
    return {
        "ms": max((tn - t1) / rounds * 1e3, 0.0),
        "rounds": rounds,
    }


def bench(fn, *args, rounds=10, warmup=3, probe=None):
    """Wall-clock per call around a tiny fetch (includes the host/tunnel
    round-trip — use ``bench_chained`` for device time)."""
    import jax

    if probe is None:
        def probe(r):
            # Slice device-side before fetching: the remote tunnel streams
            # full arrays at ~42 MB/s, which would swamp the measurement.
            return jax.tree_util.tree_leaves(r)[0].ravel()[:1]

    for _ in range(warmup):
        np.asarray(probe(fn(*args)))
    times = []
    for _ in range(rounds):
        t = time.perf_counter()
        np.asarray(probe(fn(*args)))
        times.append((time.perf_counter() - t) * 1e3)
    times = np.array(times)
    return {
        "min_ms": float(times.min()),
        "median_ms": float(np.median(times)),
        "mean_ms": float(times.mean()),
        "rounds": rounds,
    }


def report(name, stats, extra=""):
    if _JSONL["path"]:
        row = {"name": name}
        row.update(_JSONL["tags"])
        row.update(stats)
        if extra:
            row["extra"] = extra
        with open(_JSONL["path"], "a") as f:
            f.write(json.dumps(row) + "\n")
    if "ms" in stats:
        print("{:<44s} {:>9.3f} ms/step {}".format(name, stats["ms"], extra),
              flush=True)
    else:
        print(
            "{:<44s} min {:>9.3f} ms   median {:>9.3f} ms {}".format(
                name, stats["min_ms"], stats["median_ms"], extra
            ),
            flush=True,
        )
