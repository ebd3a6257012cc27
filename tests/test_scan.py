"""Prefix-scan tests ported from reference tests/test_scan_py.py."""

import numpy as np
import pytest

from collision_tpu import PrefixScanner, exclusive_scan

np.random.seed(4)


@pytest.mark.parametrize("size,group_size", [(1023, 4), (20, 4), (96, 6)])
def test_scanner_errs(size, group_size):
    with pytest.raises(ValueError):
        PrefixScanner(size, group_size)


@pytest.mark.parametrize("old_shape,new_shape", [((1024, 4), (1023, 4))])
def test_scanner_resize_errs(old_shape, new_shape):
    scanner = PrefixScanner(*old_shape)
    with pytest.raises(ValueError):
        scanner.resize(*new_shape)


@pytest.mark.parametrize("size,group_size,expected", [
    (1024, 4, (128, 16, 2)),
    (20, 2, (8, 2)),
    (24, 4, (8,)),
    (1032, 4, (136, 24, 4)),
    (160, 4, (24, 4)),
    (320, 4, (40, 8)),
])
def test_block_levels(size, group_size, expected):
    # Goldens from reference tests/test_scan_py.py:32-43.
    scanner = PrefixScanner(size, group_size)
    assert scanner.block_lengths == expected


@pytest.mark.parametrize("size,group_size", [
    (20, 2), (24, 4), (1024, 4), (160, 4), (320, 4),
])
def test_prefix_sum(size, group_size):
    scanner = PrefixScanner(size, group_size)
    values = np.random.randint(0, size, size=size).astype("uint32")
    out = np.asarray(scanner.prefix_sum(values))
    expected = np.cumsum(values)
    assert out[0] == 0
    np.testing.assert_equal(out[1:], expected[:-1].astype("uint32"))


@pytest.mark.parametrize("old_shape,new_shape", [
    ((20, 2), (24, 4)),
    ((1024, 4), (160, 4)),
    ((24, 2), (None, 4)),
    ((160, 4), (1024, None)),
])
def test_scanner_resized(old_shape, new_shape):
    scanner = PrefixScanner(*old_shape)
    scanner.resize(*new_shape)
    size = new_shape[0] or old_shape[0]
    values = np.random.randint(0, 100, size=size).astype("uint32")
    out = np.asarray(scanner.prefix_sum(values))
    expected = np.cumsum(values)
    assert out[0] == 0
    np.testing.assert_equal(out[1:], expected[:-1].astype("uint32"))


def test_scan_wraps_modularly():
    # uint32 addition wraps, matching the device scan (local_scan.cl:2-25).
    values = np.full(4, 2**31, dtype="uint32")
    out = np.asarray(exclusive_scan(values))
    np.testing.assert_equal(out, np.array([0, 2**31, 0, 2**31], dtype="uint32"))


def test_scan_arbitrary_size():
    # No size constraint in the functional form (XLA scans any N).
    values = np.random.randint(0, 100, size=1023).astype("uint32")
    out = np.asarray(exclusive_scan(values))
    np.testing.assert_equal(out[1:], np.cumsum(values)[:-1].astype("uint32"))
