"""Utility goldens ported from reference tests/test_misc.py."""

import numpy as np
import pytest

from collision_tpu.utils import (
    dtype_sizeof,
    next_power_of_2,
    product,
    round_up,
)


@pytest.mark.parametrize("x,base,expected", [
    (4, 5, 5), (5, 5, 5), (0, 5, 0),
    (4, 2, 4), (5, 2, 6), (0, 2, 0),
])
def test_round_up(x, base, expected):
    assert round_up(x, base) == expected


@pytest.mark.parametrize("x,expected", [
    (1, 1), (2, 2), (3, 4), (5, 8), (6, 8),
])
def test_next_power_of_2(x, expected):
    assert next_power_of_2(x) == expected


def test_product():
    assert product([1, 2, 3]) == 6
    assert product([]) == 1


def test_dtype_sizeof():
    # Goldens from reference tests/test_misc.py:35-46 (3-vectors pad to 4).
    assert dtype_sizeof(np.dtype("uint32")) == 4
    assert dtype_sizeof(np.dtype("int64")) == 8
    assert dtype_sizeof(np.dtype(("float32", 3))) == 16
    assert dtype_sizeof(np.dtype(("float32", (4, 3)))) == 16 * 4
    assert dtype_sizeof(np.dtype((("float32", 3), 4))) == 16 * 4
    with pytest.raises(ValueError):
        dtype_sizeof(np.dtype(("float16", 5)))
    with pytest.raises(TypeError):
        dtype_sizeof(np.dtype([("foo", "float32")]))
    with pytest.raises(TypeError):
        dtype_sizeof(np.dtype(([("foo", "float32")], 4)))
