"""Fused posterior/cost/stats kernel vs the jnp reference path
(ops/potts.py pairwise_potential + posteriors_and_costs + sufficient_stats),
interpret mode on CPU; the same kernel compiles natively on TPU."""

import numpy as np
import jax
import jax.numpy as jnp

from phylo_hmrf_tpu.config import SMALL_EPS
from phylo_hmrf_tpu.data.regions import region_from_samples, flat_index_order
from phylo_hmrf_tpu.ops.finish_pallas import finish_stats_pallas
from phylo_hmrf_tpu.ops.potts import (
    pairwise_potential, posteriors_and_costs, sufficient_stats, weight_maps)


def _problem(rng, H0, W0, K, F, pad_h=8):
    rows, cols = flat_index_order(H0, W0, True)
    vals = (rng.random((rows.shape[0], F)) + 0.1).astype(np.float32)
    region = region_from_samples(vals, H0, W0, True, pad_h=pad_h, pad_w=128)
    H, W = region.shape
    logprob = (-rng.random((H, W, K)) * 4).astype(np.float32)
    labels = rng.integers(0, K, (H, W)).astype(np.int32)
    wm = np.asarray(weight_maps(jnp.asarray(region.dmaps), 0.5))
    return region, logprob, labels, wm


def _reference(region, logprob, labels, wm, img, beta):
    K = logprob.shape[-1]
    pp = pairwise_potential(jnp.asarray(labels), jnp.asarray(wm), K, beta)
    posteriors, cost_vec, n_valid = posteriors_and_costs(
        jnp.asarray(logprob), jnp.asarray(labels), pp,
        jnp.asarray(region.mask), SMALL_EPS)
    post, obs, obs2 = sufficient_stats(posteriors, jnp.asarray(img),
                                       jnp.asarray(region.mask))
    return post, obs, obs2, cost_vec, n_valid


def test_finish_fused_matches_jnp(rng):
    K, F, beta = 5, 3, 1.0
    region, logprob, labels, wm = _problem(rng, 20, 20, K, F)
    img = region.img

    post_r, obs_r, obs2_r, cv_r, nv_r = _reference(
        region, logprob, labels, wm, img, beta)

    lp_k = jnp.transpose(jnp.asarray(logprob[None]), (0, 3, 1, 2))
    img_f = jnp.transpose(jnp.asarray(img[None]), (0, 3, 1, 2))
    post, obs, obs2, sums = finish_stats_pallas(
        lp_k, img_f, jnp.asarray(region.mask[None].astype(np.int32)),
        jnp.asarray(labels[None]), jnp.asarray(wm[None]), beta, SMALL_EPS,
        interpret=True)

    np.testing.assert_allclose(np.asarray(post[0]), np.asarray(post_r),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(obs[0]), np.asarray(obs_r),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(obs2[0]), np.asarray(obs2_r),
                               rtol=2e-5)
    nv = float(sums[0, 3])
    assert nv == float(nv_r)
    pairwise_cost = float(sums[0, 0]) / nv
    pairwise_nrm = -float(sums[0, 1]) / nv
    unary_cost = -float(sums[0, 2]) / nv
    got = [pairwise_cost, pairwise_nrm, unary_cost,
           unary_cost + pairwise_nrm]
    np.testing.assert_allclose(got, np.asarray(cv_r), rtol=2e-5, atol=2e-6)


def test_finish_fused_multi_tile_and_batch(rng):
    """Several row tiles (accumulator revisiting) and a region batch."""
    K, F, beta = 4, 4, 0.8
    region, logprob, labels, wm = _problem(rng, 40, 40, K, F, pad_h=8)
    img = region.img
    R = 3
    lp = np.stack([np.roll(logprob, i, axis=0) for i in range(R)])
    lb = np.stack([np.roll(labels, i, axis=1) for i in range(R)])

    lp_k = jnp.transpose(jnp.asarray(lp), (0, 3, 1, 2))
    img_f = jnp.transpose(jnp.asarray(np.stack([img] * R)), (0, 3, 1, 2))
    post, obs, obs2, sums = finish_stats_pallas(
        lp_k, img_f,
        jnp.asarray(np.stack([region.mask.astype(np.int32)] * R)),
        jnp.asarray(lb), jnp.asarray(np.stack([wm] * R)), beta, SMALL_EPS,
        interpret=True)

    for r in range(R):
        post_r, obs_r, obs2_r, cv_r, nv_r = _reference(
            region, lp[r], lb[r], wm, img, beta)
        np.testing.assert_allclose(np.asarray(post[r]), np.asarray(post_r),
                                   rtol=2e-5)
        np.testing.assert_allclose(np.asarray(obs2[r]), np.asarray(obs2_r),
                                   rtol=2e-5)
        nv = float(sums[r, 3])
        assert nv == float(nv_r)
        got = [float(sums[r, 0]) / nv, -float(sums[r, 1]) / nv,
               -float(sums[r, 2]) / nv]
        np.testing.assert_allclose(got, np.asarray(cv_r)[:3], rtol=2e-5,
                                   atol=2e-6)


def test_finish_fused_negate_bitwise(rng):
    """negate=True with the unary field must be BITWISE equal to
    negate=False with the logprob field (IEEE negation is exact) — this is
    what lets _estep_bucket skip materializing a second K-major slab."""
    K, F, beta = 4, 3, 1.0
    region, logprob, labels, wm = _problem(rng, 40, 40, K, F)
    img = region.img
    lp_k = jnp.transpose(jnp.asarray(logprob[None]), (0, 3, 1, 2))
    img_f = jnp.transpose(jnp.asarray(img[None]), (0, 3, 1, 2))
    mask = jnp.asarray(region.mask[None].astype(np.int32))
    a = finish_stats_pallas(lp_k, img_f, mask, jnp.asarray(labels[None]),
                            jnp.asarray(wm[None]), beta, SMALL_EPS,
                            interpret=True)
    b = finish_stats_pallas(-lp_k, img_f, mask, jnp.asarray(labels[None]),
                            jnp.asarray(wm[None]), beta, SMALL_EPS,
                            interpret=True, negate=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_potts_energy_pallas_matches_jnp(rng):
    from phylo_hmrf_tpu.ops.finish_pallas import potts_energy_pallas
    from phylo_hmrf_tpu.ops.potts import potts_energy

    K, beta = 5, 1.3
    region, logprob, labels, wm = _problem(rng, 40, 40, K, 3)
    unary = -logprob
    e_ref = float(potts_energy(jnp.asarray(labels), jnp.asarray(unary),
                               jnp.asarray(wm), jnp.asarray(region.mask),
                               beta))
    unary_k = jnp.transpose(jnp.asarray(unary[None]), (0, 3, 1, 2))
    e = potts_energy_pallas(unary_k,
                            jnp.asarray(region.mask[None].astype(np.int32)),
                            jnp.asarray(labels[None]), jnp.asarray(wm[None]),
                            beta, interpret=True)
    np.testing.assert_allclose(float(e[0]), e_ref, rtol=2e-6)
