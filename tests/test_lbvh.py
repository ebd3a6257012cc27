"""LBVH construction goldens ported from reference tests/test_collision.py.

The expected trees are the Karras HPG'12 Figure-3 example (even and odd leaf
counts) translated from the reference's packed Node records
(tests/test_collision.py:114-128, 167-179) into this package's
structure-of-arrays layout, plus the duplicate-code regression corpus
(tests/test_collision.py:425-480) that pins the ``32 + clz(i ^ j)`` tie-break.
"""

import numpy as np
import pytest

from collision_tpu import LBVH, NO_NODE, build

NO = int(NO_NODE)

# Karras Figure-3 code set (reference tests/test_collision.py:82-83).
FIG3_CODES = np.array(
    [0b00001, 0b00010, 0b00100, 0b00101, 0b10011, 0b11000, 0b11001, 0b11110],
    dtype="uint32",
)


def test_fill_internal():
    # Leaf fields: right_edge = sorted position, leaf_id = provided ids
    # (reference fillInternal, collision.cl:55-63).
    n = 8
    ids = np.random.RandomState(4).permutation(n).astype("uint32")
    tree = build(FIG3_CODES, ids)
    np.testing.assert_equal(np.asarray(tree.leaf_id), ids)
    np.testing.assert_equal(np.asarray(tree.right_edge)[n - 1:], np.arange(n))


def test_generate_bvh():
    # Expected tree from reference tests/test_collision.py:114-128.
    codes = FIG3_CODES
    n = len(codes)
    leaf = n - 1
    tree = build(codes)

    expected_left = [3, leaf + 0, leaf + 2, 1, leaf + 4, 6, leaf + 5]
    expected_right = [4, leaf + 1, leaf + 3, 2, 5, leaf + 7, leaf + 6]
    expected_edge = [7, 1, 3, 3, 7, 7, 6]
    expected_internal_parents = [NO, 3, 3, 0, 0, 4, 5]
    expected_leaf_parents = [1, 1, 2, 2, 4, 6, 6, 5]

    np.testing.assert_equal(np.asarray(tree.left), expected_left)
    np.testing.assert_equal(np.asarray(tree.right), expected_right)
    np.testing.assert_equal(np.asarray(tree.right_edge)[:leaf], expected_edge)
    np.testing.assert_equal(
        np.asarray(tree.parent)[:leaf], expected_internal_parents
    )
    np.testing.assert_equal(
        np.asarray(tree.parent)[leaf:], expected_leaf_parents
    )
    np.testing.assert_equal(np.asarray(tree.right_edge)[leaf:], np.arange(n))
    np.testing.assert_equal(np.asarray(tree.leaf_id), np.arange(n))


def test_generate_odd_bvh():
    # Expected tree from reference tests/test_collision.py:167-179.
    codes = FIG3_CODES[:7]
    n = len(codes)
    leaf = n - 1
    tree = build(codes)

    expected_left = [3, leaf + 0, leaf + 2, 1, leaf + 4, leaf + 5]
    expected_right = [4, leaf + 1, leaf + 3, 2, 5, leaf + 6]
    expected_edge = [6, 1, 3, 3, 6, 6]
    expected_internal_parents = [NO, 3, 3, 0, 0, 4]
    expected_leaf_parents = [1, 1, 2, 2, 4, 5, 5]

    np.testing.assert_equal(np.asarray(tree.left), expected_left)
    np.testing.assert_equal(np.asarray(tree.right), expected_right)
    np.testing.assert_equal(np.asarray(tree.right_edge)[:leaf], expected_edge)
    np.testing.assert_equal(
        np.asarray(tree.parent)[:leaf], expected_internal_parents
    )
    np.testing.assert_equal(
        np.asarray(tree.parent)[leaf:], expected_leaf_parents
    )


def test_problem_codes():
    # Regression corpus from reference tests/test_collision.py:425-480:
    # duplicate-heavy codes once produced a parentless internal node.
    codes = np.array([
        0b00000000000000000000000000000000,
        0b00000000000000000000000000000000,
        0b00000110110000110100000100000010,
        0b00001001001001001001001001001001,
        0b00001001001001001001001001001001,
        0b00010010010010010010010010010010,
        0b00010010010010010010010010010010,
        0b00010010011010010010011011011010,
        0b00011001001011001001011001001011,
        0b00011011011011011011011011011011,
        0b00100100010000100010110100010110,
        0b00100100100100100100100100100100,
        0b00100100100101101101100101100100,
        0b00101001101001101101101101101001,
        0b00101101101101101101101101101101,
        0b00110110110110110110110110110110,  # This node had no parent
        0b00110110110110110110110110110110,
        0b00110110110110110110110110110110,
        0b00111111111111111111111111111111,
        0b00111111111111111111111111111111,
        0b00111111111111111111111111111111,
    ], dtype="uint32")
    tree = build(codes)
    # Every node except the root has a parent, and every internal node id
    # appears as someone's parent.
    assert set(np.asarray(tree.parent)[1:].tolist()) == set(range(len(codes) - 1))
    assert int(tree.parent[0]) == NO


def test_all_duplicate_codes():
    # Pure tie-break tree: all codes equal -> radix tree over indices.
    codes = np.zeros(16, dtype="uint32")
    tree = build(codes)
    assert set(np.asarray(tree.parent)[1:].tolist()) == set(range(15))
    _check_tree_invariants(tree)


@pytest.mark.parametrize("n", [2, 3, 5, 33, 256, 317])
def test_random_tree_invariants(n):
    rng = np.random.RandomState(n)
    codes = np.sort(rng.randint(0, 2**30, n).astype("uint32"))
    tree = build(codes)
    _check_tree_invariants(tree)


def test_single_leaf():
    tree = build(np.array([42], dtype="uint32"))
    assert tree.n_leaves == 1
    assert tree.n_nodes == 1
    assert int(tree.parent[0]) == NO


def _check_tree_invariants(tree: LBVH):
    """Structural invariants every Karras tree satisfies."""
    n = tree.n_leaves
    parent = np.asarray(tree.parent)
    left = np.asarray(tree.left)
    right = np.asarray(tree.right)
    edge = np.asarray(tree.right_edge)

    # Every non-root node has a parent; both children point back.
    assert parent[0] == NO
    assert (parent[1:] != NO).all()
    for i in range(n - 1):
        assert parent[left[i]] == i
        assert parent[right[i]] == i

    # right_edge is the max sorted-leaf index in the subtree; check by DFS.
    def leaf_range(i):
        if i >= n - 1:
            return i - (n - 1), i - (n - 1)
        llo, lhi = leaf_range(left[i])
        rlo, rhi = leaf_range(right[i])
        assert lhi + 1 == rlo  # contiguous, left-then-right
        assert edge[i] == rhi
        return llo, rhi

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(10000)
    try:
        lo, hi = leaf_range(0)
    finally:
        sys.setrecursionlimit(old)
    assert (lo, hi) == (0, n - 1)
