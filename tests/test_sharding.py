"""Multi-device sharding tests on the virtual 8-CPU mesh: the sharded E-step
must produce identical results to the single-device path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phylo_hmrf_tpu.config import PhyloHMRFConfig
from phylo_hmrf_tpu.models.hmrf import PhyloHMRF
from phylo_hmrf_tpu.parallel.mesh import make_mesh
from phylo_hmrf_tpu.parallel.sharding import pad_bucket_to_devices

from tests.test_em import synth_problem


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh((8,))


def _many_regions(tree, rng, n=8, K=3):
    """n same-shaped diagonal regions."""
    _, _, _, regions, true = synth_problem(tree, rng, K=K, H0=16)
    # synth_problem returns 2 regions (diag 16x16 + rect); replicate diag
    base = regions[0]
    out = []
    rng2 = np.random.default_rng(7)
    from phylo_hmrf_tpu.data.regions import region_from_samples
    for i in range(n):
        vals = base.flat_values() + rng2.normal(
            0, 0.01, base.flat_values().shape).astype(np.float32)
        out.append(region_from_samples(
            np.abs(vals), base.H0, base.W0, True, pad_h=8, pad_w=8,
            region_id=i))
    return out


def test_pad_bucket():
    img = np.zeros((3, 8, 8, 2), np.float32)
    mask = np.ones((3, 8, 8), bool)
    dmaps = np.zeros((3, 4, 8, 8), np.float32)
    i2, m2, d2, r = pad_bucket_to_devices(img, mask, dmaps, 4)
    assert i2.shape[0] == 4 and r == 3
    assert not m2[3].any()
    assert np.isinf(d2[3]).all()


@pytest.mark.smoke
def test_sharded_estep_matches_single(example_tree, rng, mesh8):
    tree = example_tree
    regions = _many_regions(tree, rng, n=8)
    cfg = PhyloHMRFConfig(final_polish=False, n_states=3, seed=3, pad_h=8, pad_w=8)

    m_single = PhyloHMRF(tree, regions, cfg)
    m_shard = PhyloHMRF(tree, regions, cfg, mesh=mesh8)
    m_single.initialize()
    # identical init state
    m_shard.params_vec = m_single.params_vec.copy()
    m_shard.init_ou_params = m_single.init_ou_params.copy()
    m_shard.means_ = m_single.means_.copy()
    m_shard.covars_ = m_single.covars_.copy()
    m_shard.labels_local = [g.copy() for g in m_single.labels_local]

    l1, s1, c1, n1 = m_single.estep(m_single.means_, m_single.covars_,
                                    m_single.labels_local)
    l2, s2, c2, n2 = m_shard.estep(m_shard.means_, m_shard.covars_,
                                   m_shard.labels_local)

    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(s1, s2):
        np.testing.assert_allclose(a, b, rtol=2e-4)
    np.testing.assert_allclose(c1, c2, rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(n1, n2)


def test_sharded_estep_uneven_regions(example_tree, rng, mesh8):
    """5 regions over 8 devices: padding regions must not perturb results."""
    tree = example_tree
    regions = _many_regions(tree, rng, n=5)
    cfg = PhyloHMRFConfig(final_polish=False, n_states=3, seed=3, pad_h=8, pad_w=8)
    m_single = PhyloHMRF(tree, regions, cfg)
    m_shard = PhyloHMRF(tree, regions, cfg, mesh=mesh8)
    m_single.initialize()
    m_shard.params_vec = m_single.params_vec.copy()
    m_shard.init_ou_params = m_single.init_ou_params.copy()
    m_shard.means_ = m_single.means_.copy()
    m_shard.covars_ = m_single.covars_.copy()
    m_shard.labels_local = [g.copy() for g in m_single.labels_local]

    _, s1, c1, _ = m_single.estep(m_single.means_, m_single.covars_,
                                  m_single.labels_local)
    _, s2, c2, _ = m_shard.estep(m_shard.means_, m_shard.covars_,
                                 m_shard.labels_local)
    for a, b in zip(s1, s2):
        np.testing.assert_allclose(a, b, rtol=2e-4)
    np.testing.assert_allclose(c1, c2, rtol=2e-4, atol=1e-6)


def test_sharded_full_fit(example_tree, rng, mesh8):
    tree = example_tree
    regions = _many_regions(tree, rng, n=8)
    cfg = PhyloHMRFConfig(final_polish=False, n_states=3, max_iter=3, seed=3, mstep_iters=30,
                          pad_h=8, pad_w=8, min_iter=0)
    model = PhyloHMRF(tree, regions, cfg, mesh=mesh8)
    result = model.fit(verbose=False)
    assert np.isfinite(result.cost_vec).all()
    assert result.labels.shape[0] == model.n_samples
