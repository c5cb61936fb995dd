"""Pallas ICM phase kernel vs the jnp checkerboard ICM (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phylo_hmrf_tpu.data.regions import region_from_samples, flat_index_order
from phylo_hmrf_tpu.ops.icm import icm
from phylo_hmrf_tpu.ops.icm_pallas import icm_pallas
from phylo_hmrf_tpu.ops.potts import weight_maps


def _problem(rng, H0=16, W0=16, K=4, F=3, R=2):
    regions = []
    for _ in range(R):
        rows, cols = flat_index_order(H0, W0, True)
        vals = (rng.random((rows.shape[0], F)) + 0.1).astype(np.float32)
        regions.append(region_from_samples(vals, H0, W0, True, pad_h=8,
                                           pad_w=128))
    H, W = regions[0].shape
    unary = (rng.random((R, H, W, K)) * 4).astype(np.float32)
    wm = np.stack([np.asarray(weight_maps(jnp.asarray(r.dmaps), 0.5))
                   for r in regions])
    mask = np.stack([r.mask for r in regions])
    init = rng.integers(0, K, (R, H, W)).astype(np.int32)
    return unary, wm, mask, init


def test_icm_pallas_matches_jnp(rng):
    unary, wm, mask, init = _problem(rng)
    beta = 1.0
    ref = jax.vmap(lambda u, w, m, l: icm(u, w, m, l, beta, 40))(
        jnp.asarray(unary), jnp.asarray(wm), jnp.asarray(mask),
        jnp.asarray(init))
    out = icm_pallas(jnp.asarray(unary), jnp.asarray(wm), jnp.asarray(mask),
                     jnp.asarray(init), beta, 40, interpret=True)
    agree = (np.asarray(ref)[mask] == np.asarray(out)[mask]).mean()
    assert agree == 1.0, agree


def test_icm_pallas_multi_tile(rng):
    unary, wm, mask, init = _problem(rng, H0=40, W0=20, K=3, R=1)
    beta = 1.3
    ref = jax.vmap(lambda u, w, m, l: icm(u, w, m, l, beta, 40))(
        jnp.asarray(unary), jnp.asarray(wm), jnp.asarray(mask),
        jnp.asarray(init))
    out = icm_pallas(jnp.asarray(unary), jnp.asarray(wm), jnp.asarray(mask),
                     jnp.asarray(init), beta, 40, interpret=True)
    agree = (np.asarray(ref)[mask] == np.asarray(out)[mask]).mean()
    assert agree == 1.0, agree
