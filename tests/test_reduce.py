"""Reduction tests ported from reference tests/test_bounds_py.py and
tests/test_summer_py.py."""

import numpy as np
import pytest

from collision_tpu import Bounds, Summer, reduce_values, scene_bounds

np.random.seed(4)


@pytest.mark.parametrize("ngroups,group_size", [(4, 8), (64, 128)])
@pytest.mark.parametrize("n", [96, 1000])
def test_bounds(ngroups, group_size, n):
    values = np.random.uniform(-1000, 1000, (n, 3)).astype("float32")
    reducer = Bounds(ngroups, group_size)
    out = np.asarray(reducer.reduce(values))
    np.testing.assert_equal(out[0], values.min(axis=0))
    np.testing.assert_equal(out[1], values.max(axis=0))


@pytest.mark.parametrize("coord_dtype", ["float32", "float64"])
def test_bounds_dtype(coord_dtype):
    values = np.random.uniform(-10, 10, (128, 3)).astype(coord_dtype)
    out = np.asarray(Bounds(4, 8).reduce(values))
    assert out.dtype == np.dtype(coord_dtype)
    np.testing.assert_equal(out[0], values.min(axis=0))
    np.testing.assert_equal(out[1], values.max(axis=0))


def test_bounds_masked_size():
    # Only the first `size` rows participate (reference reduce.cl:13
    # grid-stride loop reads exactly n values).
    values = np.random.uniform(-10, 10, (100, 3)).astype("float32")
    out = np.asarray(Bounds(4, 8).reduce(values, size=60))
    np.testing.assert_equal(out[0], values[:60].min(axis=0))
    np.testing.assert_equal(out[1], values[:60].max(axis=0))


def test_bounds_resize():
    reducer = Bounds(4, 8)
    reducer.resize(ngroups=16, group_size=32)
    values = np.random.uniform(-1, 1, (256, 3)).astype("float32")
    out = np.asarray(reducer.reduce(values))
    np.testing.assert_equal(out[0], values.min(axis=0))
    np.testing.assert_equal(out[1], values.max(axis=0))


@pytest.mark.parametrize("n", [96, 1000])
def test_summer(n):
    values = np.random.randint(0, 100, (n, 4)).astype("uint32")
    out = np.asarray(Summer(4, 8).reduce(values))
    np.testing.assert_equal(out[0], values.sum(axis=0, dtype="uint32"))


def test_summer_float():
    values = np.random.uniform(-1, 1, (128, 3)).astype("float64")
    out = np.asarray(Summer(4, 8).reduce(values))
    np.testing.assert_allclose(out[0], values.sum(axis=0), rtol=1e-12)


def test_reduce_values_multi_accumulator():
    values = np.random.uniform(-5, 5, (64, 3)).astype("float32")
    out = np.asarray(
        reduce_values(values, [(np.inf, "min"), (-np.inf, "max"), (0, "add")])
    )
    np.testing.assert_equal(out[0], values.min(axis=0))
    np.testing.assert_equal(out[1], values.max(axis=0))
    np.testing.assert_allclose(out[2], values.sum(axis=0), rtol=1e-5)


def test_reduce_unknown_combiner():
    with pytest.raises(ValueError):
        reduce_values(np.ones((4, 3)), [(0, "xor")])


def test_scene_bounds():
    coords = np.random.uniform(-3, 3, (333, 3)).astype("float32")
    lo, hi = scene_bounds(coords)
    np.testing.assert_equal(np.asarray(lo), coords.min(axis=0))
    np.testing.assert_equal(np.asarray(hi), coords.max(axis=0))
