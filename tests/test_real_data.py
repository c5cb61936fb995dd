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


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
@pytest.mark.parametrize("seed", [0, 1])
def test_chr22_full_em_parity(chr22_setup, seed):
    """Full-EM parity vs the reference algorithm stack on the FULL 683-bin
    chr22 region (no crop). Two seeds so tie-break luck cannot carry the
    gate (VERDICT r2 item 7).

    Two complete EM fits from the identical seeded init: (a) the reference
    semantics — exact C++ alpha-beta swap every iteration
    (reference phylo_hmrf.py:492-498, base.py:301-455); (b) the production
    fast path (labeler='mf_icm'). Gates, in order of what is provable:

    1. trajectory lockstep: |cost1 delta| bounded at every common iteration
       (independent EM runs do NOT stay label-identical — measured
       full-convergence best-match agreement is 88-92% even between two
       EXACT optimizers, because fp tie-breaks switch EM basins; see
       PARITY.md 'Full-EM parity study');
    2. solution quality: the production run's final cost1 must be as good
       as the reference stack's at the same horizon;
    3. the BASELINE >=99% / <=0.1% gate where it is well-posed — identical
       inputs: under the END-TO-END CONVERGED params of run (a), the exact
       device labeler (push-relabel swap) vs the C++ 5000-cycle oracle on
       the full region.
    """
    from phylo_hmrf_tpu.data.regions import flat_edge_list
    from phylo_hmrf_tpu.models.hmrf import _gauss_logpdf_np
    from phylo_hmrf_tpu.ops.maxflow_tpu import exact_labels
    from phylo_hmrf_tpu.ops.potts import weight_maps
    from phylo_hmrf_tpu.utils.metrics import best_match_accuracy

    tree, cfg0, regions = chr22_setup
    region = regions[0]
    K = cfg0.n_states
    kw = dict(n_states=K, max_iter=6, seed=seed, mstep_iters=40, min_iter=5,
              final_polish=False)
    fits = {}
    for name, labeler in (("oracle", "swap"), ("production", "mf_icm")):
        model = PhyloHMRF(tree, regions,
                          PhyloHMRFConfig(labeler=labeler, **kw))
        fits[name] = (model, model.fit(verbose=False, track_states=True))

    ca = fits["oracle"][1].cost_vec
    cb = fits["production"][1].cost_vec
    n = min(len(ca), len(cb))
    # 1. trajectory lockstep (measured max |delta| 0.06 over 18 iterations;
    #    bound = measured + ~30% headroom, VERDICT r2 item 7)
    assert np.abs(cb[:n, 3] - ca[:n, 3]).max() <= 0.08, (ca[:n, 3],
                                                         cb[:n, 3])
    # 2. solution quality at the common horizon (production may be better)
    assert cb[n - 1, 3] <= ca[n - 1, 3] + 0.05
    # per-iteration best-match label agreement stays high early on (the
    # runs have not yet drifted into different basins); measured 0.88-0.92
    sa, sb = fits["oracle"][1].state_list, fits["production"][1].state_list
    agreements = [best_match_accuracy(sa[i], sb[i]) for i in range(n)]
    assert min(agreements) >= 0.85, agreements

    if seed != 0:
        return   # the labeler gate below is seed-independent
    # 3. full-region labeler gate under run (a)'s converged params
    model_a, res_a = fits["oracle"]
    X = region.flat_values().astype(np.float64)
    logprob = np.stack([
        _gauss_logpdf_np(X, res_a.means[c], res_a.covars[c], cfg0.min_covar)
        for c in range(K)], axis=1)
    warm = res_a.labels.astype(np.int32)

    edges = flat_edge_list(region)
    w = np.exp(-cfg0.beta1 * edges[:, 2])
    ei = edges[:, :2].astype(np.int64)
    swap_labels = native.potts_swap(ei, w, -logprob, cfg0.beta, warm, 5000)
    e_swap = native.potts_energy(ei, w, -logprob, cfg0.beta, swap_labels)

    unary_grid = np.zeros(region.shape + (K,), np.float32)
    unary_grid[region.flat_rows, region.flat_cols] = -logprob
    wm = weight_maps(jnp.asarray(region.dmaps), cfg0.beta1)
    # 2 cycles keeps this CPU-viable; the measured full-region curve
    # (PARITY.md) is gap 4.5e-6 at cycle 2 -> 200x inside the 1e-3 gate
    # (the production default, swap_tpu_cycles=4, reaches -4.2e-7)
    out = exact_labels(jnp.asarray(unary_grid), wm,
                       jnp.asarray(region.mask),
                       jnp.asarray(region.labels_to_grid(warm)), cfg0.beta,
                       K, max_cycles=2)
    out_flat = region.labels_to_flat(np.asarray(out)).astype(np.int32)
    e_out = native.potts_energy(ei, w, -logprob, cfg0.beta, out_flat)

    agreement = (out_flat == swap_labels).mean()
    gap = (e_out - e_swap) / abs(e_swap)
    assert gap <= 1e-3, (e_out, e_swap, gap)
    assert agreement >= 0.99, agreement


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_chr22_f64_em_lockstep(chr22_setup):
    """Exact-vs-exact EM lockstep with precision noise removed (VERDICT r2
    item 3): BOTH runs label exactly — the C++ Dinic swap (f64 host unary)
    vs the on-device push-relabel swap — in the f64 strict-parity mode, so
    the only remaining divergence sources are move-schedule/tie-break
    differences between two exact optimizers. Measured on the dense
    256-bin window (seed 0): lockstep max|dcost1| 0.0040, per-iteration
    best-match agreement >= 0.9934, final 0.9946 — i.e. once precision AND
    the approximate labeler are removed, the two stacks track essentially
    identically (the f32 fast-path bound above is 0.08; an f64 mf_icm run
    still diverges by ~0.06 on the full region, so that gap is
    labeler-induced, not precision-induced — PARITY.md).

    The dense crop (not the full region) keeps the CPU-backend f64 device
    swap tractable; it is the same window the labeler-parity gate uses."""
    import jax
    from phylo_hmrf_tpu.data.regions import region_from_samples
    from phylo_hmrf_tpu.utils.metrics import best_match_accuracy

    tree, cfg0, regions = chr22_setup
    full = regions[0]
    lo, hi = 200, 456
    keep = ((full.flat_rows >= lo) & (full.flat_rows < hi)
            & (full.flat_cols >= lo) & (full.flat_cols < hi))
    crop = [region_from_samples(full.flat_values()[keep], hi - lo, hi - lo,
                                True, pad_h=8, pad_w=128)]

    kw = dict(n_states=cfg0.n_states, max_iter=6, seed=0, mstep_iters=40,
              min_iter=5, final_polish=False, dtype="float64",
              use_pallas="off")
    try:
        fits = {}
        for name, labeler in (("cpp", "swap"), ("dev", "swap_tpu")):
            model = PhyloHMRF(tree, crop,
                              PhyloHMRFConfig(labeler=labeler, **kw))
            fits[name] = model.fit(verbose=False, track_states=True)
    finally:
        jax.config.update("jax_enable_x64", False)

    ca, cb = fits["cpp"].cost_vec, fits["dev"].cost_vec
    n = min(len(ca), len(cb))
    delta = np.abs(cb[:n, 3] - ca[:n, 3]).max()
    # The f64 E-step cost/stat reductions run in a PINNED order
    # (ops/potts._pinned_grid_sum / _sufficient_stats_pinned): XLA's plain
    # full-grid sums split across the backend thread pool, whose size
    # follows --xla_force_host_platform_device_count, so the round-3 gate
    # had to absorb 0.0161 of env-induced drift. Measured with pinning:
    # 0.0024 under the 8-virtual-device CI env, 0.0072 single-device (the
    # residual env difference is the f32 k-means init stage — its Eigen
    # segment-sum matmuls still k-slice by thread count, shifting the
    # shared init basin, not the cpp/dev divergence).
    assert delta <= 0.008, (delta, ca[:n, 3], cb[:n, 3])
    per_it = [best_match_accuracy(fits["cpp"].state_list[i],
                                  fits["dev"].state_list[i])
              for i in range(n)]
    assert min(per_it) >= 0.98, per_it
    agree = best_match_accuracy(fits["cpp"].labels, fits["dev"].labels)
    assert agree >= 0.99, agree
    print(f"[f64 lockstep] delta={delta:.4f} per-it agree min="
          f"{min(per_it):.4f} final agree={agree:.4f}")


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_chr22_hybrid_labeler_gap(chr22_setup):
    """Budgeted hybrid labeler on real weak-unary Hi-C (VERDICT r2 item 2):
    per-iteration labeling energy audited against the 5000-cycle C++
    oracle on the same unary.

    Gap metric: energies are shifted by the per-pixel unary lower bound
    (sum_p min_c unary_p — a per-pixel constant shift that leaves the
    optimization problem unchanged), so the denominator measures the
    optimizer-controllable excess energy. The raw-|E*| normalization used
    previously is ill-posed here: the energy crosses zero between
    iterations 1 and 2 on this instance, so a 1% excess read as a 70%
    "gap" at the crossing.

    Expected schedule (hybrid_exact_hi fast-motion trigger + @2 period):
    the moving phase (iters ~0-6 here) runs exact, the plateau alternates
    fast/exact. Measured (this instance, seed 0): exact iterations'
    shifted gap <= 7e-5; fast (plateau) iterations leave a 0.7-1.05%
    transient that the next exact pass removes. Gates at ~2x headroom."""
    from phylo_hmrf_tpu.data.regions import flat_edge_list
    from phylo_hmrf_tpu.models.hmrf import _gauss_logpdf_np
    from phylo_hmrf_tpu.models.ou import ou_moments

    tree, cfg0, regions = chr22_setup
    region = regions[0]
    K = cfg0.n_states
    # swap_tpu_cycles=2 keeps the CPU run viable (the measured full-region
    # cycle curve converges at cycle 2: gap 4.5e-6, PARITY.md); max_iter 12
    # reaches the plateau so the FAST path is actually exercised
    cfg = PhyloHMRFConfig(labeler="mf_icm+swap@2", n_states=K, max_iter=12,
                          seed=0, mstep_iters=40, min_iter=99,
                          final_polish=False, threshold=1e-12,
                          swap_tpu_cycles=2)
    model = PhyloHMRF(tree, regions, cfg)
    res = model.fit(verbose=False, track_states=True)

    exact_iters = set(model.hybrid_exact_iters_)
    fast_iters = [it for it in range(res.n_iters) if it not in exact_iters]
    # the run must exercise both paths (the fast-motion trigger makes the
    # moving phase all-exact; the plateau alternates with the @2 period)
    assert 0 in exact_iters
    assert len(fast_iters) >= 2, (sorted(exact_iters), res.n_iters)

    edges = flat_edge_list(region)
    w = np.exp(-cfg.beta1 * edges[:, 2])
    ei = edges[:, :2].astype(np.int64)
    X = region.flat_values().astype(np.float64)

    params = res.params_list  # (n_iters, K, P) params BEFORE each E-step
    for it in range(res.n_iters):
        if it == 0:
            # iteration 0 labels under the k-means init moments
            model2 = PhyloHMRF(tree, regions, cfg)
            model2.initialize()
            means, covars = model2.means_, model2.covars_
        else:
            mom = [ou_moments(jnp.asarray(params[it, c]), tree)
                   for c in range(K)]
            means = np.stack([np.asarray(m, np.float64) for m, _ in mom])
            covars = np.stack([np.asarray(V, np.float64)
                               + cfg.min_covar * np.eye(tree.n_leaves)
                               for _, V in mom])
        logprob = np.stack([
            _gauss_logpdf_np(X, means[c], covars[c], cfg.min_covar)
            for c in range(K)], axis=1)
        labels_it = res.state_list[it].astype(np.int32)
        e_run = native.potts_energy(ei, w, -logprob, cfg.beta, labels_it)
        oracle = native.potts_swap(ei, w, -logprob, cfg.beta, labels_it,
                                   5000)
        e_star = native.potts_energy(ei, w, -logprob, cfg.beta, oracle)
        shift = (-logprob).min(axis=1).sum()
        gap = (e_run - e_star) / (e_star - shift)
        bound = 1e-3 if it in exact_iters else 2e-2
        assert gap <= bound, (it, it in exact_iters, gap, e_run, e_star)
