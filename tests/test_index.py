"""Gather/scatter tests ported from reference tests/test_index.py."""

import numpy as np
import pytest

from collision_tpu import Indexer, gather, scatter

np.random.seed(4)


@pytest.mark.parametrize("value_shape", [(), (3,), (4,)])
def test_gather(value_shape):
    n = 100
    values = np.random.uniform(-10, 10, (n,) + value_shape).astype("float32")
    idx = np.random.permutation(n).astype("uint32")
    out = np.asarray(gather(values, idx))
    np.testing.assert_equal(out, values[idx])


@pytest.mark.parametrize("value_shape", [(), (3,)])
def test_scatter(value_shape):
    n = 100
    values = np.random.uniform(-10, 10, (n,) + value_shape).astype("float32")
    idx = np.random.permutation(n).astype("uint32")
    out = np.asarray(scatter(values, idx))
    expected = np.zeros_like(values)
    expected[idx] = values
    np.testing.assert_equal(out, expected)


def test_gather_scatter_roundtrip():
    # scatter(gather(v, p), p) == v for a permutation p.
    n = 64
    values = np.random.randint(0, 1000, n).astype("uint32")
    idx = np.random.permutation(n).astype("uint32")
    out = np.asarray(scatter(gather(values, idx), idx))
    np.testing.assert_equal(out, values)


def test_indexer_validates_dtype():
    with pytest.raises(ValueError):
        Indexer(index_dtype="int32")
    Indexer(index_dtype="uint32")  # ok


def test_indexer_api():
    indexer = Indexer(value_dtype="float32", index_dtype="uint32")
    values = np.arange(10, dtype="float32")
    idx = np.array([9, 0, 3], dtype="uint32")
    np.testing.assert_equal(
        np.asarray(indexer.gather(values, idx)), values[idx]
    )
