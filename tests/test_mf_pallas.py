"""Pallas mean-field kernel vs the jnp reference path (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phylo_hmrf_tpu.data.regions import region_from_samples, flat_index_order
from phylo_hmrf_tpu.ops.icm import mean_field
from phylo_hmrf_tpu.ops.mf_pallas import mean_field_pallas, mf_sweep_pallas
from phylo_hmrf_tpu.ops.potts import weight_maps, neighbor_sums_soft


def _problem(rng, H0=16, W0=16, K=4, F=3):
    rows, cols = flat_index_order(H0, W0, True)
    vals = (rng.random((rows.shape[0], F)) + 0.1).astype(np.float32)
    region = region_from_samples(vals, H0, W0, True, pad_h=8, pad_w=128)
    H, W = region.shape
    unary = (rng.random((H, W, K)) * 4).astype(np.float32)
    wm = np.asarray(weight_maps(jnp.asarray(region.dmaps), 0.5))
    return unary, wm


def test_single_sweep_matches_jnp(rng):
    unary, wm = _problem(rng)
    K = unary.shape[-1]
    beta, T, damp = 1.0, 2.0, 0.5

    q0 = jax.nn.softmax(jnp.asarray(-unary), axis=-1)
    # jnp reference sweep (exactly ops.icm.mean_field's step body)
    agree, wsum = neighbor_sums_soft(q0, jnp.asarray(wm))
    field = jnp.asarray(unary) + beta * (wsum[..., None] - agree)
    q_ref = damp * q0 + (1 - damp) * jax.nn.softmax(-field / T, axis=-1)

    from phylo_hmrf_tpu.ops.potts import _shift_bwd
    from phylo_hmrf_tpu.data.regions import DIRS
    wsum_c = jnp.sum(jnp.asarray(wm), axis=0)
    for d, (dr, dc) in enumerate(DIRS):
        wsum_c = wsum_c + _shift_bwd(jnp.asarray(wm)[d], dr, dc, 0.0)
    base = jnp.transpose(jnp.asarray(unary), (2, 0, 1)) + beta * wsum_c[None]
    qk = jnp.transpose(q0, (2, 0, 1))
    out = mf_sweep_pallas(qk, base, jnp.asarray(wm), T, damp, beta=beta,
                          interpret=True)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (1, 2, 0)),
                               np.asarray(q_ref), rtol=2e-4, atol=1e-6)


def test_full_anneal_matches_jnp(rng):
    unary, wm = _problem(rng, H0=20, W0=20, K=5)
    labels_ref = mean_field(jnp.asarray(unary), jnp.asarray(wm), 1.0)
    labels_pl = mean_field_pallas(jnp.asarray(unary), jnp.asarray(wm), 1.0,
                                  interpret=True)
    agree = (np.asarray(labels_ref) == np.asarray(labels_pl)).mean()
    # bitwise argmin ties aside, the two paths must agree essentially always
    assert agree > 0.999, agree


def test_multi_tile_grid(rng):
    """H large enough to span several row tiles."""
    unary, wm = _problem(rng, H0=60, W0=20, K=3)
    labels_ref = mean_field(jnp.asarray(unary), jnp.asarray(wm), 1.0)
    labels_pl = mean_field_pallas(jnp.asarray(unary), jnp.asarray(wm), 1.0,
                                  interpret=True)
    agree = (np.asarray(labels_ref) == np.asarray(labels_pl)).mean()
    assert agree > 0.999, agree


def test_multisweep_matches_chained_single_sweeps(rng):
    """Temporal blocking: n_inner sweeps inside one kernel must reproduce
    n_inner chained single-sweep calls bit-for-bit on every in-array pixel
    (the shrinking-halo wedge keeps all center rows exact; out-of-array
    rows are invisible because boundary edge weights are exactly zero)."""
    from phylo_hmrf_tpu.data.regions import DIRS
    from phylo_hmrf_tpu.ops.mf_pallas import mf_sweeps_pallas
    from phylo_hmrf_tpu.ops.potts import _shift_bwd

    unary, wm = _problem(rng, H0=20, W0=20, K=5)
    beta, T, damp = 1.0, 2.0, 0.5
    q0 = jax.nn.softmax(jnp.asarray(-unary), axis=-1)
    wsum_c = jnp.sum(jnp.asarray(wm), axis=0)
    for d, (dr, dc) in enumerate(DIRS):
        wsum_c = wsum_c + _shift_bwd(jnp.asarray(wm)[d], dr, dc, 0.0)
    base = jnp.transpose(jnp.asarray(unary), (2, 0, 1)) + beta * wsum_c[None]
    qk = jnp.transpose(q0, (2, 0, 1))

    chained = qk
    for _ in range(8):
        chained = mf_sweep_pallas(chained, base, jnp.asarray(wm), T, damp,
                                  beta=beta, interpret=True)
    fused = mf_sweeps_pallas(qk, base, jnp.asarray(wm), T, damp, beta=beta,
                             n_inner=8, interpret=True)
    # bit-exact on TPU (measured); CPU interpret mode reassociates FMAs
    # across the two programs, leaving 1-ulp noise on ~1% of elements
    np.testing.assert_allclose(np.asarray(chained), np.asarray(fused),
                               rtol=0, atol=3e-7)
