"""Sort tests ported from reference tests/test_radix_py.py."""

import numpy as np
import pytest

from collision_tpu import RadixSorter, argsort_keys, sort_key_value, sort_keys

np.random.seed(4)


@pytest.mark.parametrize("size,group_size,bits", [
    (128, 8, 3), (128, 9, 4), (122, 8, 4), (128, 4, 4),
])
def test_sorter_errs(size, group_size, bits):
    with pytest.raises(ValueError):
        RadixSorter(size, group_size, bits)


def test_dtype_errs():
    with pytest.raises(ValueError):
        RadixSorter(128, 8, 4, key_dtype="float32")


@pytest.mark.parametrize("old_shape,new_shape", [((64, 8, 4), (64, 5, 4))])
def test_sorter_resize_errs(old_shape, new_shape):
    sorter = RadixSorter(*old_shape)
    with pytest.raises(ValueError):
        sorter.resize(*new_shape)


@pytest.mark.parametrize("key_dtype", ["uint32", "uint64"])
@pytest.mark.parametrize("bits,group_size,expected", [
    (1, 4, 32), (2, 4, 16), (4, 8, 8), (8, 128, 4),
])
def test_num_passes(key_dtype, bits, group_size, expected):
    # Goldens from reference tests/test_radix_py.py:68-80.
    sorter = RadixSorter(512, group_size, bits, key_dtype=key_dtype)
    if np.dtype(key_dtype) == np.dtype("uint64"):
        expected *= 2
    assert sorter.num_passes == expected


@pytest.mark.parametrize("key_dtype", ["uint32", "uint64"])
@pytest.mark.parametrize("size,group_size", [(32, 8), (15360, 32), (32, 16)])
def test_sorter(key_dtype, size, group_size):
    sorter = RadixSorter(size, group_size, key_dtype=key_dtype)
    data = np.random.randint(500, size=size).astype(key_dtype)
    out = np.asarray(sorter.sort(data))
    np.testing.assert_equal(out, np.sort(data))


@pytest.mark.parametrize("key_dtype", ["uint32", "uint64"])
@pytest.mark.parametrize("old_shape,new_shape", [
    ((15360, 32), (32, 8)), ((32, 8), (15360, 32)),
])
def test_sorter_resized(key_dtype, old_shape, new_shape):
    sorter = RadixSorter(*old_shape, key_dtype=key_dtype)
    sorter.resize(*new_shape)
    size = new_shape[0] or old_shape[0]
    data = np.random.randint(500, size=size).astype(key_dtype)
    out = np.asarray(sorter.sort(data))
    np.testing.assert_equal(out, np.sort(data))


@pytest.mark.parametrize("value_dtype,value_shape", [
    ("uint32", ()), ("float64", ()), ("float64", (3,)), ("float64", (4,)),
])
@pytest.mark.parametrize("size,group_size", [(32, 8), (15360, 32)])
def test_arg_sorter(value_dtype, value_shape, size, group_size):
    # Stability contract: payload permutation matches a stable argsort
    # (reference tests/test_radix_py.py:201).
    keys = np.random.randint(500, size=size).astype("uint32")
    values = np.random.uniform(-1000, 1000, size=(size,) + value_shape)
    values = values.astype(value_dtype)
    out_keys, out_values = sort_key_value(keys, values)
    np.testing.assert_equal(np.asarray(out_keys), np.sort(keys))
    order = np.argsort(keys, kind="mergesort")
    np.testing.assert_equal(np.asarray(out_values), values[order])


def test_sort_with_size_padding():
    # Trailing entries past `size` sort last (max-key padding,
    # reference collision.py:138-142).
    keys = np.array([5, 3, 9, 1, 100, 0], dtype="uint32")
    out = np.asarray(sort_keys(keys, size=4))
    np.testing.assert_equal(out[:4], np.array([1, 3, 5, 9], dtype="uint32"))
    assert (out[4:] == np.iinfo("uint32").max).all()


def test_argsort_keys_stable():
    keys = np.random.randint(10, size=1000).astype("uint32")
    sorted_keys, order = argsort_keys(keys)
    np.testing.assert_equal(np.asarray(sorted_keys), np.sort(keys))
    np.testing.assert_equal(
        np.asarray(order), np.argsort(keys, kind="mergesort").astype("uint32")
    )
