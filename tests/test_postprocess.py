"""Post-processing tests: state smoothing, export, metrics."""

import os

import numpy as np
import pytest

from phylo_hmrf_tpu.postprocess.smooth import (
    default_palette, grid_to_states, smooth_state_vec, smooth_states,
    states_to_grid, states_to_rgb, write_state_files)
from phylo_hmrf_tpu.utils.metrics import (
    best_match_accuracy, compare_labeling, cnt_estimate)


def test_states_grid_roundtrip(rng):
    n = 10 * 11 // 2
    flat = rng.integers(0, 4, n)
    g = states_to_grid(flat, 10, 10, True)
    np.testing.assert_array_equal(g, g.T)
    np.testing.assert_array_equal(grid_to_states(g, True), flat)

    flat2 = rng.integers(0, 4, 30)
    g2 = states_to_grid(flat2, 5, 6, False)
    np.testing.assert_array_equal(grid_to_states(g2, False), flat2)


@pytest.mark.smoke
def test_smooth_removes_small_islands():
    g = np.zeros((40, 40), dtype=np.int64)
    g[10:13, 10:13] = 1          # 9-pixel island of state 1 inside state 0
    out = smooth_states(g, 2, threshold=25)
    assert (out == 0).all()


def test_smooth_keeps_large_regions():
    g = np.zeros((60, 60), dtype=np.int64)
    g[:, 30:] = 1                # two big half-planes survive
    out = smooth_states(g, 2, threshold=25)
    np.testing.assert_array_equal(out, g)


def test_smooth_respects_ratio_threshold():
    # island bordered by an even mix of two states: no predominant neighbor
    g = np.zeros((30, 30), dtype=np.int64)
    g[:15, :] = 2
    g[14:16, 14:16] = 1          # island straddling the 0/2 boundary
    out = smooth_states(g, 3, threshold=25, ratio_threshold=0.5)
    # either reassigned to one side or kept; must not invent a new state
    assert set(np.unique(out)) <= {0, 1, 2}


def test_smooth_state_vec_sym(rng):
    H0 = 30
    n = H0 * (H0 + 1) // 2
    flat = np.zeros(n, dtype=np.int64)
    grid = states_to_grid(flat, H0, H0, True)
    grid[5:7, 20:22] = 1
    flat = grid_to_states(grid, True)
    len_vec = np.asarray([[n, 0, n, H0, H0, 0, 0, 0, 1, 21]])
    out = smooth_state_vec(flat, len_vec, 2, threshold=25)
    assert (out == 0).all()


def test_write_state_files(tmp_path, rng):
    H0 = 8
    n = H0 * (H0 + 1) // 2
    flat = rng.integers(0, 3, n)
    len_vec = np.asarray([[n, 0, n, H0, H0, 100, 100, 0, 1, 21]])
    f = write_state_files(flat, len_vec, 21, 50000, str(tmp_path), "ori")
    assert os.path.exists(f)
    data = np.loadtxt(f, dtype=np.int64)
    assert data.shape == (n, 7)
    assert (data[:, 0] == 21).all()
    assert (data[:, 4] >= data[:, 1]).all()      # upper triangle only
    # genomic coordinates offset by start_region * bin
    assert data[0, 1] == 100 * 50000


def test_rgb_export(rng):
    g = rng.integers(0, 5, (16, 16))
    img = states_to_rgb(g, n_components=5)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    pal = default_palette(5)
    np.testing.assert_array_equal(img[0, 0], pal[g[0, 0]])


def test_compare_labeling_perfect():
    lab = np.array([0, 0, 1, 1, 2, 2])
    nmi, ami, ari, ri, p, r, f1 = compare_labeling(lab, lab)
    for v in (nmi, ami, ari, ri, p, r, f1):
        assert v == pytest.approx(1.0)


def test_compare_labeling_permutation_invariant_nmi():
    lab1 = np.array([0, 0, 1, 1, 2, 2])
    lab2 = np.array([2, 2, 0, 0, 1, 1])
    nmi, ami, ari, ri, p, r, f1 = compare_labeling(lab1, lab2)
    assert nmi == pytest.approx(1.0)
    assert best_match_accuracy(lab1, lab2) == 1.0


def test_cnt_estimate():
    cnt, frac, states = cnt_estimate(np.array([0, 0, 1, 3]), 4)
    np.testing.assert_array_equal(states, [0, 1, 3])
    assert frac.sum() == pytest.approx(1.0)


def test_postprocess_on_fit_output(tmp_path, rng):
    """Full user journey: fit -> smooth -> per-bin-pair export -> RGB."""
    from phylo_hmrf_tpu.config import PhyloHMRFConfig
    from phylo_hmrf_tpu.models.hmrf import PhyloHMRF
    from tests.conftest import EXAMPLE_INPUT  # noqa: F401
    from tests.test_em import synth_problem
    import jax
    from phylo_hmrf_tpu.tree import load_tree
    import os as _os

    tree = load_tree(_os.path.join(EXAMPLE_INPUT, "edge.1.txt"),
                     _os.path.join(EXAMPLE_INPUT, "branch_length.1.txt"),
                     _os.path.join(EXAMPLE_INPUT, "species_name.1.txt"))
    _, _, _, regions, _ = synth_problem(tree, rng, K=3, H0=16)
    cfg = PhyloHMRFConfig(final_polish=False, n_states=3, max_iter=2, seed=1,
                          mstep_iters=20, pad_h=8, pad_w=8, min_iter=0,
                          threshold=1e-12)
    model = PhyloHMRF(tree, regions, cfg)
    result = model.fit(verbose=False)

    smoothed = smooth_state_vec(result.labels, model.len_vec, 3,
                                threshold=4)
    assert smoothed.shape == result.labels.shape
    # regions are tagged chrom=-1 by synth_problem
    f = write_state_files(smoothed, model.len_vec, -1, 50000,
                          str(tmp_path), "smooth")
    assert os.path.exists(f)
    grid = states_to_grid(smoothed[:model.len_vec[0, 0]],
                          int(model.len_vec[0, 3]),
                          int(model.len_vec[0, 4]), True)
    img = states_to_rgb(grid, n_components=3)
    assert img.shape == grid.shape + (3,)


def test_save_state_image(tmp_path, rng):
    from phylo_hmrf_tpu.postprocess.smooth import save_state_image
    g = rng.integers(0, 4, (20, 20))
    f = tmp_path / "state.png"
    save_state_image(g, str(f), n_components=4, title="test")
    assert f.exists() and f.stat().st_size > 0


def test_compare_results_tool(tmp_path, rng):
    import scipy.io
    from phylo_hmrf_tpu.compare import compare_results
    sv = rng.integers(0, 3, 200)
    m = {"state_vec": sv, "len_vec": np.zeros((1, 10)),
         "params_vec1": np.zeros((3, 5)), "params_vec2": np.zeros((3, 5)),
         "iter_id1": 0, "iter_id2": 0,
         "cost_vec": np.asarray([[0, 1.0, 2.0, 3.0]])}
    scipy.io.savemat(str(tmp_path / "a.mat"), m)
    perm = np.asarray([2, 0, 1])
    m["state_vec"] = perm[sv]      # permuted labels: perfect match expected
    scipy.io.savemat(str(tmp_path / "b.mat"), m)
    out = compare_results(str(tmp_path / "a.mat"), str(tmp_path / "b.mat"))
    assert out["agreement_best_match"] == 1.0
    assert out["nmi"] == pytest.approx(1.0)
