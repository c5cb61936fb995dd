"""Row-sharded (halo-exchange) E-step vs the single-device path."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phylo_hmrf_tpu.data.regions import region_from_samples, flat_index_order
from phylo_hmrf_tpu.models.hmrf import _estep_bucket
from phylo_hmrf_tpu.parallel.halo import make_rowsharded_estep
from phylo_hmrf_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh((8,))


def _problem(rng, H0=64, W0=64, K=4, F=3, is_diag=True):
    rows, cols = flat_index_order(H0, W0, is_diag)
    vals = (rng.random((rows.shape[0], F)) + 0.1).astype(np.float32)
    region = region_from_samples(vals, H0, W0, is_diag, pad_h=8, pad_w=128)
    means = rng.random((K, F)).astype(np.float32) * 1.2
    covs = np.stack([np.eye(F) * (0.3 + 0.1 * c) for c in range(K)]
                    ).astype(np.float32)
    warm = rng.integers(0, K, region.shape).astype(np.int32)
    return region, means, covs, warm


@pytest.mark.parametrize("is_diag", [True, False])
def test_rowsharded_matches_single(example_tree, rng, mesh8, is_diag):
    region, means, covs, warm = _problem(rng, is_diag=is_diag)
    kw = dict(weighted_pp=False, max_sweeps=40)
    beta, beta1 = jnp.float32(1.0), jnp.float32(0.5)

    single = jax.jit(functools.partial(_estep_bucket, labeler="mf_icm",
                                       use_pallas=False, **kw))
    l1, s1, c1, n1 = single(
        jnp.asarray(region.img[None]), jnp.asarray(region.mask[None]),
        jnp.asarray(region.dmaps[None]), jnp.asarray(warm[None]),
        jnp.asarray(means), jnp.asarray(covs), beta, beta1)

    sharded = make_rowsharded_estep(mesh8, **kw)
    l2, s2, c2, n2 = sharded(
        jnp.asarray(region.img), jnp.asarray(region.mask),
        jnp.asarray(region.dmaps), jnp.asarray(warm),
        jnp.asarray(means), jnp.asarray(covs), beta, beta1)

    lab1 = np.asarray(l1[0])[region.mask]
    lab2 = np.asarray(l2)[region.mask]
    # ICM sweep *order* differs across the shard boundary, so labelings can
    # differ on a handful of boundary-adjacent ambiguous pixels
    assert (lab1 == lab2).mean() > 0.99
    # bucket stats are per-region (R=1 leading axis); rowsharded stats are
    # psum'd to (K, ...) for the one region
    for a, b in zip(s1, s2):
        np.testing.assert_allclose(np.asarray(a)[0], np.asarray(b),
                                   rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(c1[0]), np.asarray(c2),
                               rtol=5e-3, atol=1e-4)
    assert float(n1[0]) == float(n2)


def test_halo_energy_parity(example_tree, rng, mesh8):
    """The sharded labeler's final energy must match the single-device
    labeler's energy to within the parity gate (0.1%)."""
    from phylo_hmrf_tpu.ops.potts import potts_energy, weight_maps
    region, means, covs, warm = _problem(rng, H0=64, W0=64)
    kw = dict(weighted_pp=False, max_sweeps=40)
    beta, beta1 = jnp.float32(1.0), jnp.float32(0.5)

    single = jax.jit(functools.partial(_estep_bucket, labeler="mf_icm",
                                       use_pallas=False, **kw))
    l1, _, _, _ = single(
        jnp.asarray(region.img[None]), jnp.asarray(region.mask[None]),
        jnp.asarray(region.dmaps[None]), jnp.asarray(warm[None]),
        jnp.asarray(means), jnp.asarray(covs), beta, beta1)
    sharded = make_rowsharded_estep(mesh8, **kw)
    l2, _, _, _ = sharded(
        jnp.asarray(region.img), jnp.asarray(region.mask),
        jnp.asarray(region.dmaps), jnp.asarray(warm),
        jnp.asarray(means), jnp.asarray(covs), beta, beta1)

    from phylo_hmrf_tpu.models.emission import gaussian_logpdf
    unary = -gaussian_logpdf(jnp.asarray(region.img), jnp.asarray(means),
                             jnp.asarray(covs))
    wm = weight_maps(jnp.asarray(region.dmaps), 0.5)
    e1 = float(potts_energy(l1[0], unary, wm, jnp.asarray(region.mask), 1.0))
    e2 = float(potts_energy(jnp.asarray(np.asarray(l2)), unary, wm,
                            jnp.asarray(region.mask), 1.0))
    assert abs(e1 - e2) <= 0.001 * abs(e1) + 1e-6


@pytest.mark.smoke
def test_halo_extended_mf_kernel_matches_split(rng):
    """mf_sweep_pallas(halo_extended=True) on two half-shards (with real
    exchanged halo rows) must reproduce the full-grid sweep exactly."""
    from phylo_hmrf_tpu.ops.mf_pallas import mf_sweep_pallas

    K, H, W = 3, 16, 128
    q = jax.nn.softmax(jnp.asarray(rng.random((K, H, W)), jnp.float32),
                       axis=0)
    base = jnp.asarray(rng.random((K, H, W)), jnp.float32)
    w = jnp.asarray(rng.random((4, H, W)), jnp.float32)
    T, damp, beta = 1.0, 0.5, 0.7

    full = mf_sweep_pallas(q, base, w, T, damp, beta, interpret=True)

    H1 = H // 2
    z1 = jnp.zeros((K, 1, W), q.dtype)
    zw = jnp.zeros((4, 1, W), q.dtype)
    q_top = jnp.concatenate([z1, q[:, :H1 + 1]], axis=1)
    w_top = jnp.concatenate([zw, w[:, :H1 + 1]], axis=1)
    q_bot = jnp.concatenate([q[:, H1 - 1:], z1], axis=1)
    w_bot = jnp.concatenate([w[:, H1 - 1:], zw], axis=1)
    top = mf_sweep_pallas(q_top, base[:, :H1], w_top, T, damp, beta,
                          halo_extended=True, interpret=True)
    bot = mf_sweep_pallas(q_bot, base[:, H1:], w_bot, T, damp, beta,
                          halo_extended=True, interpret=True)
    np.testing.assert_allclose(np.asarray(full),
                               np.concatenate([top, bot], axis=1),
                               rtol=1e-6, atol=1e-6)


def test_halo_extended_icm_kernel_matches_split(rng):
    """icm_phase_pallas(halo_extended=True) with parity-offset phases on two
    half-shards must reproduce the full-grid phase update exactly."""
    from phylo_hmrf_tpu.ops.icm_pallas import icm_phase_pallas

    K, H, W = 3, 16, 128
    unary_k = jnp.asarray(rng.random((1, K, H, W)), jnp.float32)
    w = jnp.asarray(rng.random((4, H, W)), jnp.float32)
    mask = jnp.ones((1, H, W), jnp.int32)
    lab = jnp.asarray(rng.integers(0, K, (H, W)), jnp.int32)
    beta = 0.9
    H1 = H // 2
    zl = jnp.zeros((1, W), jnp.int32)
    zw = jnp.zeros((4, 1, W), jnp.float32)
    for a in (0, 1):
        for b in (0, 1):
            full = icm_phase_pallas(lab[None], unary_k, w[None], mask,
                                    beta, a, b, interpret=True)[0]
            lab_top = jnp.concatenate([zl, lab[:H1 + 1]], axis=0)
            w_top = jnp.concatenate([zw, w[:, :H1 + 1]], axis=1)
            lab_bot = jnp.concatenate([lab[H1 - 1:], zl], axis=0)
            w_bot = jnp.concatenate([w[:, H1 - 1:], zw], axis=1)
            top = icm_phase_pallas(
                lab_top[None], unary_k[:, :, :H1], w_top[None],
                mask[:, :H1], beta, a, b,
                halo_extended=True, interpret=True)[0]
            bot = icm_phase_pallas(
                lab_bot[None], unary_k[:, :, H1:], w_bot[None],
                mask[:, H1:], beta, (a + H1) % 2, b,
                halo_extended=True, interpret=True)[0]
            np.testing.assert_array_equal(
                np.asarray(full), np.concatenate([top, bot], axis=0))


def test_rowsharded_pallas_matches_jnp(example_tree, rng, mesh8):
    """The spatial E-step with fused Pallas kernels (use_pallas=True) must
    match the jnp spatial path on the same shards."""
    region, means, covs, warm = _problem(rng, H0=64, W0=64)
    kw = dict(weighted_pp=False, max_sweeps=40)
    beta, beta1 = jnp.float32(1.0), jnp.float32(0.5)
    args = (jnp.asarray(region.img), jnp.asarray(region.mask),
            jnp.asarray(region.dmaps), jnp.asarray(warm),
            jnp.asarray(means), jnp.asarray(covs), beta, beta1)

    l_jnp, s_jnp, c_jnp, n_jnp = make_rowsharded_estep(mesh8, **kw)(*args)
    l_pal, s_pal, c_pal, n_pal = make_rowsharded_estep(
        mesh8, use_pallas=True, **kw)(*args)

    lab1 = np.asarray(l_jnp)[region.mask]
    lab2 = np.asarray(l_pal)[region.mask]
    assert (lab1 == lab2).mean() > 0.99   # fp op-order differences only
    for a, b in zip(s_jnp, s_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(c_jnp), np.asarray(c_pal),
                               rtol=5e-3, atol=1e-4)
    assert float(n_jnp) == float(n_pal)
