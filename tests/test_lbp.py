"""Min-sum loopy BP labeler (ops/lbp.py) — the reference v1's LBP stub
(`phylo_hmrf_v1/base.py:458`) implemented for real."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from phylo_hmrf_tpu.data.regions import DIRS
from phylo_hmrf_tpu.ops.lbp import lbp_labels
from phylo_hmrf_tpu.ops.potts import potts_energy


def _energy_np(lab, unary, wmaps, beta):
    H, W, _ = unary.shape
    e = unary[np.arange(H)[:, None], np.arange(W)[None, :], lab].sum()
    for d, (dr, dc) in enumerate(DIRS):
        src = lab[:H - dr, max(0, -dc):W - max(0, dc)]
        nb = lab[dr:, max(0, dc):W - max(0, -dc)]
        w = wmaps[d][:H - dr, max(0, -dc):W - max(0, dc)]
        e += beta * (w * (src != nb)).sum()
    return float(e)


def _brute_force(unary, wmaps, mask, beta):
    H, W, K = unary.shape
    best, best_e = None, np.inf
    for assign in itertools.product(range(K), repeat=H * W):
        lab = np.asarray(assign, np.int32).reshape(H, W)
        e = _energy_np(lab, unary, wmaps, beta)
        if e < best_e:
            best, best_e = lab, e
    return best, best_e


def _random_instance(rng, H, W, K, horizontal_only=False):
    unary = rng.random((H, W, K)).astype(np.float32) * 3
    wmaps = np.zeros((4, H, W), np.float32)
    # DIRS[0] is expected to be the horizontal (0, 1) direction
    for d, (dr, dc) in enumerate(DIRS):
        if horizontal_only and (dr, dc) != (0, 1):
            continue
        w = rng.random((H, W)).astype(np.float32) + 0.5
        # zero out edges leaving the grid (regions.py stores them as w=0)
        if dr:
            w[-dr:, :] = 0
        if dc > 0:
            w[:, -dc:] = 0
        elif dc < 0:
            w[:, :-dc] = 0
        wmaps[d] = w
    mask = np.ones((H, W), bool)
    return unary, wmaps, mask


@pytest.mark.smoke
def test_lbp_exact_on_chain(rng):
    """A 1xN grid with only horizontal edges is a tree: min-sum LBP must
    find the exact MAP labeling."""
    unary, wmaps, mask = _random_instance(rng, 1, 7, 3, horizontal_only=True)
    lab = np.asarray(lbp_labels(jnp.asarray(unary), jnp.asarray(wmaps),
                                jnp.asarray(mask), 1.0, n_iters=20))
    exact, e_exact = _brute_force(unary, wmaps, mask, 1.0)
    e_lbp = float(potts_energy(jnp.asarray(lab), jnp.asarray(unary),
                               jnp.asarray(wmaps), jnp.asarray(mask), 1.0))
    assert e_lbp == pytest.approx(e_exact, rel=1e-6)


def test_lbp_near_exact_on_small_loopy_grid(rng):
    """On a tiny 3x3 8-connected grid, LBP must land within 1% of the
    brute-force optimum energy."""
    unary, wmaps, mask = _random_instance(rng, 3, 3, 3)
    lab = np.asarray(lbp_labels(jnp.asarray(unary), jnp.asarray(wmaps),
                                jnp.asarray(mask), 1.0, n_iters=40))
    _, e_exact = _brute_force(unary, wmaps, mask, 1.0)
    e_lbp = float(potts_energy(jnp.asarray(lab), jnp.asarray(unary),
                               jnp.asarray(wmaps), jnp.asarray(mask), 1.0))
    assert e_lbp <= e_exact * 1.01 + 1e-6


def test_lbp_labeler_end_to_end(rng):
    """labeler="lbp" through label_optimize (LBP proposal + ICM polish)
    reaches at least the plain-ICM energy on a separated-states instance."""
    from phylo_hmrf_tpu.ops.icm import icm_with_energy, label_optimize

    H, W, K = 24, 128, 4
    true = ((np.add.outer(np.arange(H) // 6, np.arange(W) // 32)) % K)
    unary = rng.random((H, W, K)).astype(np.float32)
    unary[np.arange(H)[:, None], np.arange(W)[None, :], true] -= 2.0
    wmaps = np.zeros((4, H, W), np.float32)
    for d, (dr, dc) in enumerate(DIRS):
        w = np.ones((H, W), np.float32)
        if dr:
            w[-dr:, :] = 0
        if dc > 0:
            w[:, -dc:] = 0
        elif dc < 0:
            w[:, :-dc] = 0
        wmaps[d] = w
    mask = np.ones((H, W), bool)
    warm = rng.integers(0, K, (H, W)).astype(np.int32)

    lab = label_optimize(jnp.asarray(unary), jnp.asarray(wmaps),
                         jnp.asarray(mask), jnp.asarray(warm), 1.0,
                         method="lbp")
    e_lbp = float(potts_energy(lab, jnp.asarray(unary), jnp.asarray(wmaps),
                               jnp.asarray(mask), 1.0))
    _, e_icm = icm_with_energy(jnp.asarray(unary), jnp.asarray(wmaps),
                               jnp.asarray(mask), jnp.asarray(warm), 1.0)
    assert e_lbp <= float(e_icm) + 1e-3
