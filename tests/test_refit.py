"""AABB refit golden ported from reference tests/test_collision.py:182-248.

The reference test drives leafBounds/internalBounds over a hand-built tree;
here the same tree is expressed in SoA form and the level-synchronous refit
must reproduce the identical per-node bounds.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from collision_tpu import LBVH, NO_NODE, leaf_bounds, refit

NO = int(NO_NODE)


def _golden_tree():
    # Reference nodes (tests/test_collision.py:191-197), leaf = 3:
    #   0: (NO, 3, [leaf+0, 1])    1: (0, 3, [leaf+3, 2])
    #   2: (1, 2, [leaf+1, leaf+2])
    #   leaves 3..6 with ids [2, 0, 1, 3]
    return LBVH(
        parent=jnp.array([NO, 0, 1, 0, 2, 2, 1], dtype=jnp.uint32),
        left=jnp.array([3, 6, 4], dtype=jnp.uint32),
        right=jnp.array([1, 2, 5], dtype=jnp.uint32),
        right_edge=jnp.array([3, 3, 2, 0, 1, 2, 3], dtype=jnp.uint32),
        leaf_id=jnp.array([2, 0, 1, 3], dtype=jnp.uint32),
    )


@pytest.mark.parametrize("coord_dtype", ["float32", "float64"])
def test_compute_bounds(coord_dtype):
    coords = np.array([
        [0.0, 1.0, 3.0],
        [4.0, 1.0, 8.0],
        [-4.0, -6.0, 3.0],
        [-5.0, 0.0, -1.0],
    ], dtype=coord_dtype)
    radii = np.ones(len(coords), dtype=coord_dtype)
    tree = _golden_tree()

    llo, lhi = leaf_bounds(coords, radii, tree.leaf_id)
    lo, hi = refit(tree, llo, lhi)

    # Expected bounds from reference tests/test_collision.py:241-247.
    expected = np.array([
        [[-6.0, -7.0, -2.0], [5.0, 2.0, 9.0]],
        [[-6.0, -1.0, -2.0], [5.0, 2.0, 9.0]],
        [[-1.0, 0.0, 2.0], [5.0, 2.0, 9.0]],
        [[-5.0, -7.0, 2.0], [-3.0, -5.0, 4.0]],
        [[-1.0, 0.0, 2.0], [1.0, 2.0, 4.0]],
        [[3.0, 0.0, 7.0], [5.0, 2.0, 9.0]],
        [[-6.0, -1.0, -2.0], [-4.0, 1.0, 0.0]],
    ], dtype=coord_dtype)
    np.testing.assert_equal(np.asarray(lo), expected[:, 0])
    np.testing.assert_equal(np.asarray(hi), expected[:, 1])


def test_leaf_bounds_use_original_ids():
    # Leaf k's bound comes from sphere leaf_id[k] (collision.cl:138-140).
    coords = np.array([[0.0, 0.0, 0.0], [10.0, 10.0, 10.0]], dtype="float32")
    radii = np.array([1.0, 2.0], dtype="float32")
    leaf_id = jnp.array([1, 0], dtype=jnp.uint32)
    lo, hi = leaf_bounds(coords, radii, leaf_id)
    np.testing.assert_equal(np.asarray(lo)[0], [8.0, 8.0, 8.0])
    np.testing.assert_equal(np.asarray(hi)[1], [1.0, 1.0, 1.0])


def test_refit_single_leaf():
    tree = LBVH(
        parent=jnp.array([NO], dtype=jnp.uint32),
        left=jnp.zeros((0,), jnp.uint32),
        right=jnp.zeros((0,), jnp.uint32),
        right_edge=jnp.array([0], dtype=jnp.uint32),
        leaf_id=jnp.array([0], dtype=jnp.uint32),
    )
    llo = jnp.array([[0.0, 0.0, 0.0]], jnp.float32)
    lhi = jnp.array([[1.0, 1.0, 1.0]], jnp.float32)
    lo, hi = refit(tree, llo, lhi)
    np.testing.assert_equal(np.asarray(lo), np.asarray(llo))
    np.testing.assert_equal(np.asarray(hi), np.asarray(lhi))


def test_refit_deep_tree():
    # A fully degenerate (linked-list) tree exercises many refit rounds:
    # all-equal codes give a radix tree over indices, depth ~log2(n); use
    # a hand-built comb tree instead for worst-case depth.
    from collision_tpu import build

    n = 33
    rng = np.random.RandomState(7)
    coords = rng.uniform(-1, 1, (n, 3)).astype("float32")
    radii = rng.uniform(0.01, 0.1, n).astype("float32")
    codes = np.sort(rng.randint(0, 2**30, n).astype("uint32"))
    tree = build(codes)
    llo, lhi = leaf_bounds(coords, radii, tree.leaf_id)
    lo, hi = refit(tree, llo, lhi)

    # Oracle: recompute every node's bound recursively from its children.
    lo_np, hi_np = np.asarray(lo), np.asarray(hi)
    left, right = np.asarray(tree.left), np.asarray(tree.right)
    llo_np, lhi_np = np.asarray(llo), np.asarray(lhi)

    def expected_bounds(i):
        if i >= n - 1:
            return llo_np[i - (n - 1)], lhi_np[i - (n - 1)]
        alo, ahi = expected_bounds(left[i])
        blo, bhi = expected_bounds(right[i])
        return np.minimum(alo, blo), np.maximum(ahi, bhi)

    for i in range(2 * n - 1):
        elo, ehi = expected_bounds(i)
        np.testing.assert_equal(lo_np[i], elo)
        np.testing.assert_equal(hi_np[i], ehi)
