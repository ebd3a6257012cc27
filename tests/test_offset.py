"""Sorted-run offset tests ported from reference tests/test_offset_py.py."""

import numpy as np
import pytest

from collision_tpu import OffsetFinder, find_offsets

np.random.seed(4)


@pytest.mark.parametrize("value_dtype", ["uint32", "uint64"])
@pytest.mark.parametrize("offset_dtype", ["uint32", "uint64"])
def test_offset(value_dtype, offset_dtype):
    # Golden from reference tests/test_offset_py.py:27-28.
    values = np.array([0, 0, 1, 1, 1, 1, 1, 3, 3, 3, 4, 5, 5], dtype=value_dtype)
    expected = np.array([0, 2, 7, 7, 10, 11, 13], dtype=offset_dtype)
    finder = OffsetFinder(value_dtype, offset_dtype)
    out = np.asarray(finder.find_offsets(values, len(values), int(values.max()) + 2))
    assert out.dtype == np.dtype(offset_dtype)
    np.testing.assert_equal(out, expected)


def test_offset_missing():
    # Golden from reference tests/test_offset_py.py:48-49: missing buckets
    # point at the next run's start; trailing buckets get n_values.
    values = np.array([1, 1, 1, 1, 1, 1, 1, 3, 3, 3, 3, 3, 3], dtype="uint32")
    expected = np.array([0, 0, 7, 7, 13, 13, 13], dtype="uint32")
    out = np.asarray(find_offsets(values, 7))
    np.testing.assert_equal(out, expected)


def test_offset_random():
    values = np.sort(np.random.randint(0, 50, 1000)).astype("uint32")
    n_offsets = 52
    out = np.asarray(find_offsets(values, n_offsets))
    expected = np.searchsorted(values, np.arange(n_offsets))
    np.testing.assert_equal(out, expected.astype("uint32"))


def test_offset_validates_dtype():
    with pytest.raises(ValueError):
        OffsetFinder(value_dtype="int32")
    with pytest.raises(ValueError):
        OffsetFinder(offset_dtype="float32")


def test_offset_near_dtype_max():
    # The reference kernel documents an overflow risk when a run endpoint
    # equals the dtype max (offset.cl:6); the searchsorted formulation is
    # immune — pin that.
    values = np.array([0, 1, 5], dtype="uint32")
    out = np.asarray(find_offsets(values, 7))
    np.testing.assert_equal(out, np.array([0, 1, 2, 2, 2, 2, 3], "uint32"))
    big = np.array([2**32 - 3, 2**32 - 2], dtype="uint32")
    # buckets near the top of the dtype range still resolve
    out2 = np.asarray(
        np.searchsorted(big, np.arange(2**32 - 4, 2**32 - 1, dtype="uint64"))
    )
    np.testing.assert_equal(out2, [0, 0, 1])
