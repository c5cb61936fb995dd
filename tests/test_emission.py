"""Gaussian emission (batched Cholesky logpdf) vs scipy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.stats import multivariate_normal

from phylo_hmrf_tpu.models.emission import gaussian_logpdf


def _random_spd(rng, f):
    A = rng.random((f, f))
    return A @ A.T + f * np.eye(f)


@pytest.mark.smoke
def test_logpdf_matches_scipy(rng):
    N, K, F = 200, 5, 4
    X = rng.random((N, F)) * 3
    means = rng.random((K, F))
    covars = np.stack([_random_spd(rng, F) for _ in range(K)])
    out = gaussian_logpdf(jnp.asarray(X), jnp.asarray(means),
                          jnp.asarray(covars))
    assert out.shape == (N, K)
    for k in range(K):
        expected = multivariate_normal(means[k], covars[k]).logpdf(X)
        np.testing.assert_allclose(out[:, k], expected, rtol=2e-4, atol=2e-5)


def test_logpdf_grid_batch_dims(rng):
    H, W, K, F = 8, 16, 3, 4
    X = rng.random((H, W, F))
    means = rng.random((K, F))
    covars = np.stack([_random_spd(rng, F) for _ in range(K)])
    out = gaussian_logpdf(jnp.asarray(X), jnp.asarray(means),
                          jnp.asarray(covars))
    assert out.shape == (H, W, K)
    flat = gaussian_logpdf(jnp.asarray(X.reshape(-1, F)),
                           jnp.asarray(means), jnp.asarray(covars))
    np.testing.assert_allclose(out.reshape(-1, K), flat, rtol=1e-6)


def test_gaussian_logpdf_kmajor_matches(rng):
    """The K-major variant (consumed by the fused Pallas E-step) must equal
    the reference layout exactly — same einsum, different output order."""
    import jax.numpy as jnp
    from phylo_hmrf_tpu.models.emission import (
        gaussian_logpdf, gaussian_logpdf_kmajor)

    K, F = 5, 3
    X = jnp.asarray(rng.random((2, 8, 128, F)).astype(np.float32))
    means = jnp.asarray(rng.random((K, F)).astype(np.float32))
    A = rng.random((K, F, F)).astype(np.float32)
    covs = jnp.asarray(np.einsum("kij,klj->kil", A, A)
                       + 0.1 * np.eye(F, dtype=np.float32))
    a = gaussian_logpdf(X, means, covs)
    b = gaussian_logpdf_kmajor(X, means, covs)
    np.testing.assert_allclose(np.transpose(np.asarray(a), (0, 3, 1, 2)),
                               np.asarray(b), rtol=1e-6, atol=1e-6)
