"""Morton-code goldens ported from reference tests/test_collision.py:251-298."""

import jax.numpy as jnp
import numpy as np
import pytest

from collision_tpu import expand_bits, morton_encode
from collision_tpu.ops.morton import MAX_CODE

COORDS = np.array([
    [0.0, 1.0, 3.0],
    [0.0, 1.0, 3.0],
    [4.0, 1.0, 8.0],
    [-4.0, -6.0, 3.0],
    [-5.0, 0.0, -1.0],
    [-5.0, 0.5, -0.5],
])

GOLDEN = np.array(
    [862940378, 862940378, 1073741823, 20332620, 302580864, 306295426],
    dtype="uint32",
)


@pytest.mark.parametrize("coord_dtype", ["float32", "float64"])
def test_golden_codes(coord_dtype):
    coords = COORDS.astype(coord_dtype)
    lo, hi = coords.min(axis=0), coords.max(axis=0)
    codes = np.asarray(morton_encode(coords, lo, hi))
    np.testing.assert_equal(codes, GOLDEN)


def test_expand_bits():
    # expand_bits interleaves 10 bits with two zero bits: bit k -> bit 3k.
    v = np.arange(1024, dtype="uint32")
    out = np.asarray(expand_bits(v))
    expected = np.zeros_like(v)
    for bit in range(10):
        expected |= ((v >> bit) & 1) << (3 * bit)
    np.testing.assert_equal(out, expected)


def test_code_range():
    rng = np.random.RandomState(4)
    coords = rng.uniform(-100, 100, (1000, 3)).astype("float32")
    lo, hi = coords.min(axis=0), coords.max(axis=0)
    codes = np.asarray(morton_encode(coords, lo, hi))
    assert codes.max() <= MAX_CODE


def test_degenerate_axis():
    # hi == lo on an axis must not produce NaN-poisoned codes.
    coords = np.array([[0.0, 5.0, 1.0], [1.0, 5.0, 2.0]], dtype="float32")
    codes = np.asarray(
        morton_encode(coords, coords.min(axis=0), coords.max(axis=0))
    )
    assert codes[0] == 0
    # x and z quantize to 1023, y (degenerate) to 0: bits 3k+2 (x) and
    # 3k (z) set, y's bits 3k+1 clear.
    assert codes[1] == 0b101101101101101101101101101101


def test_clamping():
    # Points outside [lo, hi] clamp to the boundary cells.
    lo = np.zeros(3, "float32")
    hi = np.ones(3, "float32")
    coords = np.array([[-1.0, -1.0, -1.0], [2.0, 2.0, 2.0]], dtype="float32")
    codes = np.asarray(morton_encode(coords, lo, hi))
    assert codes[0] == 0
    assert codes[1] == MAX_CODE
