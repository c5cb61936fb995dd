"""Grid Potts ops + checkerboard ICM tests, gated against the exact C++
alpha-beta-swap oracle (and the oracle against brute force)."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from phylo_hmrf_tpu import native
from phylo_hmrf_tpu.data.regions import (
    region_from_samples, flat_edge_list, flat_index_order)
from phylo_hmrf_tpu.ops.potts import (
    weight_maps, valid_maps, neighbor_sums, pairwise_potential, potts_energy,
    posteriors_and_costs, sufficient_stats)
from phylo_hmrf_tpu.ops.icm import icm, icm_with_energy, label_optimize

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

BETA1 = 0.5


def _mk_region(rng, H0=12, W0=12, F=3, is_diag=True, pad=4):
    rows, cols = flat_index_order(H0, W0, is_diag)
    values = rng.random((rows.shape[0], F)).astype(np.float32) + 0.1
    return region_from_samples(values, H0, W0, is_diag, pad_h=pad, pad_w=pad)


def _np_energy_via_edges(region, unary_flat, labels_flat, beta):
    """Energy computed on the reference-format flat edge list (oracle path)."""
    edges = flat_edge_list(region)
    w = np.exp(-BETA1 * edges[:, 2])
    return native.potts_energy(edges[:, :2].astype(np.int64), w,
                               unary_flat.astype(np.float64), beta,
                               labels_flat.astype(np.int32))


@pytest.mark.smoke
def test_grid_energy_matches_edge_list_energy(rng):
    for is_diag in (True, False):
        region = _mk_region(rng, is_diag=is_diag)
        K, beta = 4, 1.0
        N = region.n_samples
        unary_flat = rng.random((N, K))
        labels_flat = rng.integers(0, K, N)
        unary_grid = np.zeros(region.shape + (K,), np.float64)
        unary_grid[region.flat_rows, region.flat_cols] = unary_flat
        labels_grid = region.labels_to_grid(labels_flat)

        e_grid = potts_energy(
            jnp.asarray(labels_grid),
            jnp.asarray(unary_grid).astype(jnp.float32),
            weight_maps(jnp.asarray(region.dmaps), BETA1),
            jnp.asarray(region.mask), beta)
        e_edges = _np_energy_via_edges(region, unary_flat, labels_flat, beta)
        np.testing.assert_allclose(float(e_grid), e_edges, rtol=1e-4)


def test_diagonal_edge_halving(rng):
    region = _mk_region(rng, H0=6, W0=6, is_diag=True, pad=2)
    edges = flat_edge_list(region)
    rows, cols = region.flat_rows, region.flat_cols
    # find the edge between diagonal pixels (0,0) and (1,1)
    id_a = np.where((rows == 0) & (cols == 0))[0][0]
    id_b = np.where((rows == 1) & (cols == 1))[0][0]
    hit = edges[(edges[:, 0] == id_a) & (edges[:, 1] == id_b)]
    assert hit.shape[0] == 1
    xa = region.img[0, 0]
    xb = region.img[1, 1]
    d = ((xa - xb) ** 2).sum() / (
        np.linalg.norm(xa) * np.linalg.norm(xb) + 1e-16)
    np.testing.assert_allclose(hit[0, 2], 0.5 * d, rtol=1e-5)


def test_pairwise_potential_matches_reference_loop(rng):
    """pp must equal the reference's per-sample incident-edge accumulation
    (`_pairwise_compareLocal`, phylo_hmrf.py:412-436), weighted and not."""
    region = _mk_region(rng, H0=8, W0=8, is_diag=False, pad=4)
    K, beta = 3, 1.3
    N = region.n_samples
    labels_flat = rng.integers(0, K, N)
    edges = flat_edge_list(region)
    w = np.exp(-BETA1 * edges[:, 2])
    V = beta * (1 - np.eye(K))

    for use_weights in (True, False):
        pp_ref = np.zeros((N, K))
        for e_idx in range(edges.shape[0]):
            i, j = int(edges[e_idx, 0]), int(edges[e_idx, 1])
            we = w[e_idx] if use_weights else 1.0
            pp_ref[i] += V[:, labels_flat[j]] * we
            pp_ref[j] += V[:, labels_flat[i]] * we

        wm = (weight_maps(jnp.asarray(region.dmaps), BETA1) if use_weights
              else valid_maps(jnp.asarray(region.dmaps)))
        pp = pairwise_potential(
            jnp.asarray(region.labels_to_grid(labels_flat)), wm, K, beta)
        pp_flat = np.asarray(pp)[region.flat_rows, region.flat_cols]
        np.testing.assert_allclose(pp_flat, pp_ref, rtol=1e-4, atol=1e-5)


def test_swap_oracle_matches_bruteforce(rng):
    """Exhaustive check of the C++ swap on tiny problems."""
    n, K, beta = 6, 3, 0.8
    edges = np.array([[0, 1], [1, 2], [3, 4], [4, 5], [0, 3], [1, 4], [2, 5]],
                     dtype=np.int64)
    for trial in range(5):
        w = rng.random(edges.shape[0]) + 0.2
        unary = rng.random((n, K)) * 2
        init = rng.integers(0, K, n).astype(np.int32)
        out = native.potts_swap(edges, w, unary, beta, init, 100)
        e_swap = native.potts_energy(edges, w, unary, beta, out)
        best = min(
            native.potts_energy(edges, w, unary, beta,
                                np.asarray(assign, np.int32))
            for assign in itertools.product(range(K), repeat=n))
        # swap is not globally optimal in general, but on these tiny graphs
        # it should be within a hair of the optimum
        assert e_swap <= best + 1e-6 + 0.05 * abs(best)


def test_icm_decreases_energy_and_converges(rng):
    region = _mk_region(rng, H0=16, W0=16, is_diag=True, pad=8)
    K, beta = 5, 1.0
    unary = rng.random(region.shape + (K,)).astype(np.float32) * 3
    init = rng.integers(0, K, region.shape).astype(np.int32)
    wm = weight_maps(jnp.asarray(region.dmaps), BETA1)
    mask = jnp.asarray(region.mask)

    e0 = potts_energy(jnp.asarray(init), jnp.asarray(unary), wm, mask, beta)
    labels, e1 = icm_with_energy(jnp.asarray(unary), wm, mask,
                                 jnp.asarray(init), beta)
    assert float(e1) <= float(e0)
    # running again from the fixed point must not change anything
    labels2, e2 = icm_with_energy(jnp.asarray(unary), wm, mask, labels, beta)
    np.testing.assert_array_equal(np.asarray(labels)[region.mask],
                                  np.asarray(labels2)[region.mask])


def _gaussianish_unary(rng, region, K, sep=3.0):
    """Unaries resembling the real ones: K well-separated quadratic wells."""
    N = region.n_samples
    centers = rng.random((K, region.img.shape[-1])) * sep
    x = region.flat_values()
    d = ((x[:, None, :] - centers[None]) ** 2).sum(-1)
    return d  # (N, K): -logprob up to constants


@pytest.mark.parametrize("is_diag", [True, False])
def test_icm_vs_swap_parity(rng, is_diag):
    """BASELINE gate: ICM energy within 0.1% of exact swap and >=99% label
    agreement on realistic (strong-unary) inputs with warm starts."""
    region = _mk_region(rng, H0=32, W0=32, F=4, is_diag=is_diag, pad=8)
    K, beta = 6, 1.0
    unary_flat = _gaussianish_unary(rng, region, K)
    N = region.n_samples
    # warm start: noisy version of the unary argmin (mimics the k-means /
    # previous-iteration warm start of the EM loop)
    warm = unary_flat.argmin(1).astype(np.int32)
    flip = rng.random(N) < 0.1
    warm[flip] = rng.integers(0, K, flip.sum())

    edges = flat_edge_list(region)
    w = np.exp(-BETA1 * edges[:, 2])
    swap_labels = native.potts_swap(edges[:, :2].astype(np.int64), w,
                                    unary_flat, beta, warm, 5000)
    e_swap = native.potts_energy(edges[:, :2].astype(np.int64), w,
                                 unary_flat, beta, swap_labels)

    unary_grid = np.zeros(region.shape + (K,), np.float32)
    unary_grid[region.flat_rows, region.flat_cols] = unary_flat
    wm = weight_maps(jnp.asarray(region.dmaps), BETA1)
    out_labels = label_optimize(
        jnp.asarray(unary_grid), wm, jnp.asarray(region.mask),
        jnp.asarray(region.labels_to_grid(warm)), beta, method="mf_icm")
    out_flat = region.labels_to_flat(np.asarray(out_labels))
    e_out = native.potts_energy(edges[:, :2].astype(np.int64), w,
                                unary_flat, beta,
                                out_flat.astype(np.int32))

    agreement = (out_flat == swap_labels).mean()
    # BASELINE.json gates: energy within 0.1% of graph cuts, >=99% agreement
    assert e_out <= e_swap * 1.001 + 1e-9, (e_out, e_swap)
    assert agreement >= 0.99, agreement


def test_posteriors_and_costs_match_reference_formulas(rng):
    region = _mk_region(rng, H0=10, W0=10, is_diag=False, pad=2)
    K = 4
    H, W = region.shape
    logprob = rng.standard_normal((H, W, K)).astype(np.float32)
    pp = (rng.random((H, W, K)) * 2).astype(np.float32)
    labels = rng.integers(0, K, (H, W)).astype(np.int32)
    mask = region.mask

    post, costs, n_valid = posteriors_and_costs(
        jnp.asarray(logprob), jnp.asarray(labels), jnp.asarray(pp),
        jnp.asarray(mask))

    # reference: weighted_prob = exp(logprob - pp) normalized per sample
    wp = np.exp(logprob.astype(np.float64) - pp)
    ref_post = wp / wp.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(post)[mask], ref_post[mask],
                               rtol=2e-3, atol=1e-6)

    pprob = np.exp(-pp.astype(np.float64))
    pprob /= pprob.sum(-1, keepdims=True)
    N = mask.sum()
    sel = labels[mask]
    idx = np.arange(sel.shape[0])
    ref_pairwise = pp[mask][idx, sel].sum() / N
    ref_unary = -logprob[mask][idx, sel].sum() / N
    ref_pnorm = -np.log(pprob[mask][idx, sel] + 1e-16).sum() / N
    np.testing.assert_allclose(
        np.asarray(costs),
        [ref_pairwise, ref_pnorm, ref_unary, ref_unary + ref_pnorm],
        rtol=2e-3)
    assert int(n_valid) == N


def test_sufficient_stats_match_einsum(rng):
    region = _mk_region(rng, H0=9, W0=9, is_diag=True, pad=4)
    K = 3
    H, W = region.shape
    post = rng.random((H, W, K)).astype(np.float32)
    p, o, o2 = sufficient_stats(jnp.asarray(post), jnp.asarray(region.img),
                                jnp.asarray(region.mask))
    g = post[region.mask]
    x = region.img[region.mask]
    np.testing.assert_allclose(p, g.sum(0), rtol=1e-4)
    np.testing.assert_allclose(o, g.T @ x, rtol=1e-4)
    ref_o2 = np.einsum("nk,nf,ng->kfg", g, x, x)
    np.testing.assert_allclose(o2, ref_o2, rtol=1e-3, atol=1e-5)
