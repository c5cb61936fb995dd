"""Integration tests on the reference's real chr22 example data (3 of 4
species are present in this mirror; a 3-leaf tree matches their phylogeny:
((panTro5, panPan2), gorGor4))."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from phylo_hmrf_tpu import native
from phylo_hmrf_tpu.config import PhyloHMRFConfig
from phylo_hmrf_tpu.data.pipeline import load_dataset
from phylo_hmrf_tpu.models.hmrf import PhyloHMRF
from phylo_hmrf_tpu.tree import build_tree

from tests.conftest import EXAMPLE_INPUT

SPECIES = ["gorGor4", "panTro5", "panPan2"]
PATHS = [os.path.join(EXAMPLE_INPUT, "test_data", f"hic_{s}")
         for s in SPECIES]

pytestmark = pytest.mark.slow


def _have_data():
    return all(os.path.exists(os.path.join(p, "chr22.50K.txt"))
               for p in PATHS)


@pytest.fixture(scope="module")
def chr22_setup():
    if not _have_data():
        pytest.skip("example data missing")
    # ((panTro5, panPan2), gorGor4): 0->1 (gorGor4), 0->2, 2->3, 2->4
    tree = build_tree([(0, 1), (0, 2), (2, 3), (2, 4)], species=SPECIES)
    cfg = PhyloHMRFConfig(n_states=5, max_iter=4, seed=0, mstep_iters=40,
                          min_iter=0, final_polish=False)
    regions, x_max = load_dataset(
        [22], cfg, os.path.join(EXAMPLE_INPUT, "hg38.chrom.sizes"),
        PATHS, SPECIES, EXAMPLE_INPUT)
    return tree, cfg, regions


def test_chr22_fit_end_to_end(chr22_setup):
    tree, cfg, regions = chr22_setup
    model = PhyloHMRF(tree, regions, cfg)
    result = model.fit(verbose=False)

    assert np.isfinite(result.cost_vec).all()
    assert result.n_iters >= 2
    # cost must improve from iteration 0
    assert result.cost_vec[-1, 3] < result.cost_vec[0, 3]
    # a real segmentation: several states in use, none absorbing everything
    counts = np.bincount(result.labels.astype(int), minlength=cfg.n_states)
    assert (counts > 0).sum() >= 3
    assert counts.max() < 0.95 * result.labels.shape[0]
    # restored moments valid
    assert np.isfinite(result.means).all()
    for c in range(cfg.n_states):
        eig = np.linalg.eigvalsh(result.covars[c])
        assert eig.min() > 0


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_chr22_labeler_parity_vs_swap(chr22_setup):
    """BASELINE gate on real data: the TPU labeler's MRF energy within 0.1%
    of exact alpha-beta-swap graph cuts, >=99% label agreement."""
    from phylo_hmrf_tpu.data.regions import flat_edge_list
    from phylo_hmrf_tpu.models.emission import gaussian_logpdf
    from phylo_hmrf_tpu.ops.icm import label_optimize
    from phylo_hmrf_tpu.ops.potts import weight_maps

    tree, cfg, regions = chr22_setup
    # crop to a 256-bin sub-window so the CPU swap oracle stays fast while
    # the data remain real Hi-C
    from phylo_hmrf_tpu.data.regions import region_from_samples
    full = regions[0]
    # central window: dense Hi-C signal (the sparse first bins have many
    # energy ties where two exact optimizers legitimately differ)
    lo, hi = 200, 456
    keep = ((full.flat_rows >= lo) & (full.flat_rows < hi)
            & (full.flat_cols >= lo) & (full.flat_cols < hi))
    region = region_from_samples(full.flat_values()[keep], hi - lo, hi - lo,
                                 True, pad_h=8, pad_w=128)
    regions = [region]
    K = cfg.n_states
    model = PhyloHMRF(tree, regions, cfg)
    model.initialize()

    X = region.flat_values().astype(np.float64)
    logprob = np.asarray(gaussian_logpdf(
        jnp.asarray(X, jnp.float32), jnp.asarray(model.means_, jnp.float32),
        jnp.asarray(model.covars_, jnp.float32)), np.float64)
    warm = region.labels_to_flat(model.labels_local[0]).astype(np.int32)

    edges = flat_edge_list(region)
    w = np.exp(-cfg.beta1 * edges[:, 2])
    ei = edges[:, :2].astype(np.int64)
    swap_labels = native.potts_swap(ei, w, -logprob, cfg.beta, warm, 5000)
    e_swap = native.potts_energy(ei, w, -logprob, cfg.beta, swap_labels)

    from phylo_hmrf_tpu.ops.maxflow_tpu import exact_labels

    unary_grid = np.zeros(region.shape + (K,), np.float32)
    unary_grid[region.flat_rows, region.flat_cols] = -logprob
    wm = weight_maps(jnp.asarray(region.dmaps), cfg.beta1)

    # fast local path: high agreement expected but energy above exact swap
    fast = label_optimize(jnp.asarray(unary_grid), wm,
                          jnp.asarray(region.mask),
                          jnp.asarray(model.labels_local[0]), cfg.beta)
    fast_flat = region.labels_to_flat(np.asarray(fast)).astype(np.int32)
    e_fast = native.potts_energy(ei, w, -logprob, cfg.beta, fast_flat)
    assert (e_fast - e_swap) / abs(e_swap) < 0.05

    # production exact path (mean field + ICM + on-device swap):
    # BASELINE gates 0.1% energy / 99% agreement must hold on real data
    out = exact_labels(jnp.asarray(unary_grid), wm,
                       jnp.asarray(region.mask),
                       jnp.asarray(model.labels_local[0]), cfg.beta, K)
    out_flat = region.labels_to_flat(np.asarray(out)).astype(np.int32)
    e_out = native.potts_energy(ei, w, -logprob, cfg.beta, out_flat)

    agreement = (out_flat == swap_labels).mean()
    gap = (e_out - e_swap) / abs(e_swap)
    assert gap <= 1e-3, (e_out, e_swap, gap)
    assert agreement >= 0.99, agreement
