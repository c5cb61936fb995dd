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
    for a, b in zip(s1, s2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
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
