"""Full fit with spatial (row-sharded) mode on the 8-device mesh."""

import numpy as np
import jax
import pytest

from phylo_hmrf_tpu.config import PhyloHMRFConfig
from phylo_hmrf_tpu.models.hmrf import PhyloHMRF
from phylo_hmrf_tpu.parallel.mesh import make_mesh

from tests.test_em import synth_problem


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh((8,))


def test_spatial_fit_matches_single(example_tree, rng, mesh8):
    tree = example_tree
    _, _, _, regions, true = synth_problem(tree, rng, K=3, H0=32)
    # H0=32 diag region pads to H=32 (divisible by 8); rect region H0=16
    cfg = PhyloHMRFConfig(final_polish=False, n_states=3, max_iter=4, seed=1, mstep_iters=40,
                          pad_h=8, pad_w=8, min_iter=0, shard_mode="spatial")
    cfg_single = PhyloHMRFConfig(final_polish=False, n_states=3, max_iter=4, seed=1,
                                 mstep_iters=40, pad_h=8, pad_w=8,
                                 min_iter=0)

    m1 = PhyloHMRF(tree, regions, cfg_single)
    r1 = m1.fit(verbose=False)
    m2 = PhyloHMRF(tree, regions, cfg, mesh=mesh8)
    r2 = m2.fit(verbose=False)

    assert np.isfinite(r2.cost_vec).all()
    # same seed, same data: trajectories should agree closely
    np.testing.assert_allclose(r1.cost_vec[0, 1:], r2.cost_vec[0, 1:],
                               rtol=5e-3)
    agree = (r1.labels == r2.labels).mean()
    assert agree > 0.95, agree


def test_spatial_rejects_indivisible_rows(example_tree, rng, mesh8):
    _, _, _, regions, _ = synth_problem(example_tree, rng, K=3, H0=24)
    # H0=12 rect region pads to 16 with pad_h=4 -> not divisible by 8
    cfg = PhyloHMRFConfig(final_polish=False, n_states=3, pad_h=4, pad_w=8, shard_mode="spatial")
    from phylo_hmrf_tpu.data.regions import region_from_samples
    bad = region_from_samples(regions[1].flat_values(), regions[1].H0,
                              regions[1].W0, False, pad_h=4, pad_w=8)
    with pytest.raises(ValueError):
        PhyloHMRF(example_tree, [bad], cfg, mesh=mesh8)


def test_spatial_rejects_hybrid_labeler(example_tree, rng, mesh8):
    _, _, _, regions, _ = synth_problem(example_tree, rng, K=3, H0=32)
    cfg = PhyloHMRFConfig(final_polish=False, n_states=3, pad_h=8, pad_w=8,
                          shard_mode="spatial", labeler="mf_icm+swap@2")
    with pytest.raises(ValueError, match="spatial"):
        PhyloHMRF(example_tree, regions, cfg, mesh=mesh8)


def test_spatial_estep_rejects_exact_method(example_tree, rng, mesh8):
    # a direct estep(exact_method=...) call must fail loudly, not silently
    # run the mean-field labeler (fit can't reach this; external callers can)
    _, _, _, regions, _ = synth_problem(example_tree, rng, K=3, H0=32)
    cfg = PhyloHMRFConfig(final_polish=False, n_states=3, max_iter=1,
                          seed=1, pad_h=8, pad_w=8, min_iter=0,
                          shard_mode="spatial")
    m = PhyloHMRF(example_tree, regions, cfg, mesh=mesh8)
    m.initialize()
    with pytest.raises(ValueError, match="exact_method"):
        m.estep(m.means_, m.covars_, m.labels_local, exact_method="swap")
