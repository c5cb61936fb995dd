"""Tree preprocessing parity tests against hand-derived golden values for the
example 4-species tree (reference example_input/edge.1.txt; topology in
example_input/readme.txt: leaves are nodes 2, 5, 6, 7)."""

import numpy as np
import pytest

from phylo_hmrf_tpu.tree import build_tree, base_matrices


@pytest.mark.smoke
def test_example_tree_structure(example_tree):
    t = example_tree
    assert t.n_nodes == 8
    assert t.n_branches == 7
    assert t.n_leaves == 4
    assert t.n_params == 8 + 14 + 1  # reference phylo_hmrf.py:107
    assert t.root == 0
    np.testing.assert_array_equal(t.leaf_nodes, [2, 5, 6, 7])
    # parent[] from edges 0-1, 1-2, 1-3, 3-4, 4-5, 4-6, 3-7
    np.testing.assert_array_equal(t.parent, [0, 0, 1, 1, 3, 4, 4, 3])
    assert t.species == ("gorGor4", "panTro5", "panPan2", "hg38")
    np.testing.assert_allclose(t.branch_lengths, [0, 32, 20, 6, 6, 6, 12])


def test_example_tree_A1_A2_pairs(example_tree):
    t = example_tree
    # A1: each leaf's parent branch (reference _matrix1 -> ou_A1.txt)
    expected_A1 = np.zeros((4, 8))
    expected_A1[0, 1] = 1   # leaf node 2 -> parent 1
    expected_A1[1, 4] = 1   # leaf node 5 -> parent 4
    expected_A1[2, 4] = 1   # leaf node 6 -> parent 4
    expected_A1[3, 3] = 1   # leaf node 7 -> parent 3
    np.testing.assert_array_equal(t.A1, expected_A1)

    # A2 rows: branches strictly below the MRCA between each leaf pair
    expected_A2 = np.zeros((6, 8))
    expected_A2[0, [2, 3, 4, 5]] = 1   # (2,5)  mrca 1
    expected_A2[1, [2, 3, 4, 6]] = 1   # (2,6)  mrca 1
    expected_A2[2, [2, 3, 7]] = 1      # (2,7)  mrca 1
    expected_A2[3, [5, 6]] = 1         # (5,6)  mrca 4
    expected_A2[4, [4, 5, 7]] = 1      # (5,7)  mrca 3
    expected_A2[5, [4, 6, 7]] = 1      # (6,7)  mrca 3
    np.testing.assert_array_equal(t.A2, expected_A2)

    np.testing.assert_array_equal(
        t.pair_list,
        [[2, 5, 1], [2, 6, 1], [2, 7, 1], [5, 6, 4], [5, 7, 3], [6, 7, 3]])
    np.testing.assert_array_equal(t.pair_rows, [0, 0, 0, 1, 1, 2])
    np.testing.assert_array_equal(t.pair_cols, [1, 2, 3, 2, 3, 3])


def test_topo_order_parents_first(example_tree):
    t = example_tree
    seen = set()
    for node in t.topo_order:
        node = int(node)
        if node != t.root:
            assert int(t.parent[node]) in seen
        seen.add(node)


def test_base_matrices(example_tree):
    mats = base_matrices(example_tree)
    np.testing.assert_array_equal(mats[0], np.ones((4, 4)))
    # node 4 reaches leaves {5, 6} = positions {1, 2}
    m4 = np.zeros((4, 4))
    m4[1:3, 1:3] = 1
    np.testing.assert_array_equal(mats[4], m4)
    # leaf nodes reach only themselves
    m2 = np.zeros((4, 4))
    m2[0, 0] = 1
    np.testing.assert_array_equal(mats[2], m2)


def test_shuffled_edge_order():
    # edge lines in arbitrary order (and reversed pairs) must still parse;
    # the reference normalizes min(edge) as the parent (`phylo_hmrf.py:719`),
    # so the file format requires parent < child per edge.
    edges = [(2, 4), (0, 2), (2, 3), (1, 0)]  # tree 0->{1,2}, 2->{3,4}
    t = build_tree(edges)
    assert t.root == 0
    np.testing.assert_array_equal(t.leaf_nodes, [1, 3, 4])
    assert t.n_params == 5 + 8 + 1


def test_child_smaller_than_parent_rejected():
    # min-as-parent normalization cannot represent this labeling; it must
    # surface as an error, not silently build a wrong tree
    with pytest.raises(ValueError):
        build_tree([(0, 3), (0, 1), (3, 2), (3, 4)])


def test_invalid_trees():
    with pytest.raises(ValueError):
        build_tree([(0, 1), (0, 1)])          # duplicate parent
    with pytest.raises(ValueError):
        build_tree([(0, 1), (2, 3)])          # forest, two roots
