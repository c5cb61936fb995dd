"""Config-variant coverage: 4-neighbor connectivity, estimate_type=3
(weighted potentials), diagonal_type filter."""

import numpy as np
import jax.numpy as jnp
import pytest

from phylo_hmrf_tpu.config import PhyloHMRFConfig
from phylo_hmrf_tpu.data.regions import (
    flat_edge_list, region_from_samples, flat_index_order)
from phylo_hmrf_tpu.models.hmrf import PhyloHMRF

from tests.test_em import synth_problem


def test_four_neighbor_edges(rng):
    rows, cols = flat_index_order(10, 10, False)
    vals = (rng.random((100, 2)) + 0.1).astype(np.float32)
    r8 = region_from_samples(vals, 10, 10, False, num_neighbor=8,
                             pad_h=2, pad_w=2)
    r4 = region_from_samples(vals, 10, 10, False, num_neighbor=4,
                             pad_h=2, pad_w=2)
    e8 = flat_edge_list(r8, 8)
    e4 = flat_edge_list(r4, 4)
    # 4-neighbor: only right (90) + down (90) edges
    assert e4.shape[0] == 180
    assert e8.shape[0] == 180 + 2 * 81   # + down-right, down-left
    # diagonal direction maps empty in 4-neighbor mode
    assert np.isinf(r4.dmaps[2]).all() and np.isinf(r4.dmaps[3]).all()
    assert not np.isinf(r8.dmaps[2]).all()


def test_estimate_type3_em(example_tree, rng):
    """Weighted-potential posterior path (estimate_type=3) runs and differs
    from the unweighted path."""
    _, _, _, regions, _ = synth_problem(example_tree, rng, K=3, H0=16)
    base = dict(n_states=3, max_iter=2, seed=1, mstep_iters=20, pad_h=8,
                pad_w=8, min_iter=0, threshold=1e-12, final_polish=False)
    m0 = PhyloHMRF(example_tree, regions, PhyloHMRFConfig(**base))
    m3 = PhyloHMRF(example_tree, regions,
                   PhyloHMRFConfig(estimate_type=3, **base))
    r0 = m0.fit(verbose=False)
    r3 = m3.fit(verbose=False)
    assert np.isfinite(r3.cost_vec).all()
    # pairwise costs must differ between weighted and unweighted potentials
    assert not np.allclose(r0.cost_vec[0, 1], r3.cost_vec[0, 1])


def test_diagonal_type_filter(tmp_path, rng):
    from phylo_hmrf_tpu.data.synteny import split_regions
    blocks = np.array([[0, 1000, 1000]])
    _, pairs = split_regions(blocks, 3, 10, {3: (400, 600)})
    diag_only = [p for p in pairs if p[0] == p[2] and p[1] == p[3]]
    assert len(diag_only) == 2 and len(pairs) == 3


def test_swap_cpu_labeler_em(example_tree, rng):
    """End-to-end EM with the exact C++ swap backend (labeler='swap')."""
    from phylo_hmrf_tpu import native
    if not native.available():
        pytest.skip("no native toolchain")
    _, _, _, regions, _ = synth_problem(example_tree, rng, K=3, H0=12)
    cfg = PhyloHMRFConfig(n_states=3, max_iter=2, seed=1, mstep_iters=20,
                          pad_h=4, pad_w=4, min_iter=0, threshold=1e-12,
                          labeler="swap", final_polish=False)
    model = PhyloHMRF(example_tree, regions, cfg)
    result = model.fit(verbose=False)
    assert np.isfinite(result.cost_vec).all()
    assert result.labels.shape[0] == model.n_samples


def test_swap_tpu_labeler_em(example_tree, rng):
    """End-to-end EM with the exact on-device swap (labeler='swap_tpu')."""
    _, _, _, regions, _ = synth_problem(example_tree, rng, K=3, H0=12)
    cfg = PhyloHMRFConfig(n_states=3, max_iter=2, seed=1, mstep_iters=20,
                          pad_h=4, pad_w=4, min_iter=0, threshold=1e-12,
                          labeler="swap_tpu")
    model = PhyloHMRF(example_tree, regions, cfg)
    result = model.fit(verbose=False)
    assert np.isfinite(result.cost_vec).all()


@pytest.mark.parametrize("labeler", ["expansion", "expansion_tpu"])
def test_expansion_labeler_em(example_tree, rng, labeler):
    """End-to-end EM with alpha-expansion (host C++ and on-device)."""
    from phylo_hmrf_tpu import native
    if labeler == "expansion" and not native.available():
        pytest.skip("no native toolchain")
    _, _, _, regions, _ = synth_problem(example_tree, rng, K=3, H0=12)
    cfg = PhyloHMRFConfig(n_states=3, max_iter=2, seed=1, mstep_iters=20,
                          pad_h=4, pad_w=4, min_iter=0, threshold=1e-12,
                          labeler=labeler, final_polish=False)
    model = PhyloHMRF(example_tree, regions, cfg)
    result = model.fit(verbose=False)
    assert np.isfinite(result.cost_vec).all()
    assert result.labels.shape[0] == model.n_samples


def test_polish_method_expansion(example_tree, rng):
    """final_polish with polish_method='expansion' runs end-to-end and the
    polished map's energy is <= the unpolished map's (move-making passes
    never increase the energy)."""
    import jax.numpy as jnp
    from phylo_hmrf_tpu.models.emission import gaussian_logpdf
    from phylo_hmrf_tpu.ops.potts import potts_energy, weight_maps

    _, _, _, regions, _ = synth_problem(example_tree, rng, K=3, H0=12)
    kw = dict(n_states=3, max_iter=2, seed=1, mstep_iters=20, pad_h=4,
              pad_w=4, min_iter=0, threshold=1e-12)
    r_pol = PhyloHMRF(example_tree, regions, PhyloHMRFConfig(
        final_polish=True, polish_method="expansion", **kw)).fit(
        verbose=False)
    model = PhyloHMRF(example_tree, regions, PhyloHMRFConfig(
        final_polish=False, **kw))
    r_raw = model.fit(verbose=False)

    r = regions[0]
    unary = -gaussian_logpdf(jnp.asarray(r.img),
                             jnp.asarray(r_raw.means, jnp.float32),
                             jnp.asarray(r_raw.covars, jnp.float32))
    wm = weight_maps(jnp.asarray(r.dmaps), model.cfg.beta1)
    mask = jnp.asarray(r.mask)
    e_pol = float(potts_energy(
        jnp.asarray(r.labels_to_grid(r_pol.labels[:r.n_samples])), unary,
        wm, mask, model.cfg.beta))
    e_raw = float(potts_energy(
        jnp.asarray(r.labels_to_grid(r_raw.labels[:r.n_samples])), unary,
        wm, mask, model.cfg.beta))
    assert e_pol <= e_raw + 1e-5, (e_pol, e_raw)


def test_lbp_labeler_em(example_tree, rng):
    """End-to-end EM with the loopy-BP labeler (labeler='lbp' — the
    reference v1's unimplemented LBP stub, phylo_hmrf_v1/base.py:458)."""
    _, _, _, regions, _ = synth_problem(example_tree, rng, K=3, H0=12)
    cfg = PhyloHMRFConfig(n_states=3, max_iter=2, seed=1, mstep_iters=20,
                          pad_h=4, pad_w=4, min_iter=0, threshold=1e-12,
                          labeler="lbp", final_polish=False)
    model = PhyloHMRF(example_tree, regions, cfg)
    result = model.fit(verbose=False)
    assert np.isfinite(result.cost_vec).all()
    assert result.labels.shape[0] == model.n_samples
