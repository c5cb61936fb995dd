"""Batched multivariate-Gaussian log-density via Cholesky — the E-step unary.

Replaces sklearn's ``log_multivariate_normal_density(..., 'full')`` used by
the reference at ``phylo_hmrf.py:266-268``. The quadratic form is evaluated
as a matmul against the inverse Cholesky factor so XLA maps it onto the MXU:

    logpdf(x; mu_k, V_k) = -0.5 (F log 2pi + log det V_k + ||L_k^{-1}(x-mu_k)||^2)

Shapes: X (..., F) with arbitrary leading batch dims (flat samples or a 2D
grid), means (K, F), covars (K, F, F) -> (..., K).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG_2PI = 1.8378770664093453


def _chol_inv_and_logdet(covars: jnp.ndarray):
    """Per-state inverse Cholesky factors and log-determinants.

    covars: (K, F, F). Returns (Linv (K, F, F) lower-triangular, logdet (K,)).
    """
    chol = jnp.linalg.cholesky(covars)
    K, F = covars.shape[0], covars.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(F, dtype=covars.dtype), (K, F, F))
    Linv = jax.scipy.linalg.solve_triangular(chol, eye, lower=True)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)),
                           axis=-1)
    return Linv, logdet


def gaussian_logpdf(X: jnp.ndarray, means: jnp.ndarray,
                    covars: jnp.ndarray) -> jnp.ndarray:
    """Log N(x; mu_k, V_k) for every sample and state: (..., F) -> (..., K)."""
    F = X.shape[-1]
    Linv, logdet = _chol_inv_and_logdet(covars)
    # y[..., k, g] = sum_f Linv[k, g, f] * (x[..., f] - mu[k, f])
    # precision=highest keeps the MXU in f32 accumulation: the quadratic form
    # feeds exp() downstream, so bf16 inputs visibly distort posteriors.
    y = jnp.einsum("...f,kgf->...kg", X, Linv,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=X.dtype)
    y_mu = jnp.einsum("kf,kgf->kg", means, Linv,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=X.dtype)
    diff = y - y_mu
    quad = jnp.sum(diff * diff, axis=-1)
    return -0.5 * (F * _LOG_2PI + logdet + quad)


def gaussian_logpdf_kmajor(X: jnp.ndarray, means: jnp.ndarray,
                           covars: jnp.ndarray) -> jnp.ndarray:
    """`gaussian_logpdf` emitting the state-major layout (R, K, H, W).

    The Pallas E-step kernels all consume K-major fields; a separate
    (R, H, W, K) -> (R, K, H, W) transpose costs ~1.8 ms at chr21 scale
    (strided layout change), so the einsum emits K-major directly."""
    F = X.shape[-1]
    Linv, logdet = _chol_inv_and_logdet(covars)
    y = jnp.einsum("rhwf,kgf->rkhwg", X, Linv,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=X.dtype)
    y_mu = jnp.einsum("kf,kgf->kg", means, Linv,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=X.dtype)
    diff = y - y_mu[None, :, None, None, :]
    quad = jnp.sum(diff * diff, axis=-1)
    return -0.5 * (F * _LOG_2PI + logdet[None, :, None, None] + quad)
