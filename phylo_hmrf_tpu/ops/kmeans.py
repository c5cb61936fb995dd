"""K-means initialization — pure JAX (TPU-native stand-in for the reference's
sklearn MiniBatchKMeans at `phylo_hmrf.py:234-240`; it only seeds the EM, so
exactness vs sklearn is not required, determinism is)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# peak-memory budget for running every k-means trial lockstep (vmap);
# above it trials run sequentially on device (lax.map) — see _kmeans_multi
_VMAP_TRIAL_BYTES = 2 << 30


def _pairwise_sq_dists(X: jnp.ndarray, C: jnp.ndarray) -> jnp.ndarray:
    """(N, F) x (K, F) -> (N, K) squared distances via the MXU."""
    xx = jnp.sum(X * X, axis=1, keepdims=True)
    cc = jnp.sum(C * C, axis=1)
    xc = X @ C.T
    return xx + cc[None, :] - 2.0 * xc


def _kmeans_pp_init(key, X: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-means++ seeding (on-device, O(N*K))."""
    n = X.shape[0]
    key, sub = jax.random.split(key)
    first = jax.random.randint(sub, (), 0, n)
    centers = jnp.zeros((k, X.shape[1]), X.dtype).at[0].set(X[first])

    def body(i, carry):
        centers, key, d2 = carry
        last = jax.lax.dynamic_index_in_dim(centers, i - 1, keepdims=True)
        d2 = jnp.minimum(d2, _pairwise_sq_dists(X, last)[:, 0])
        key, sub = jax.random.split(key)
        # sample proportional to squared distance
        idx = jax.random.categorical(sub, jnp.log(d2 + 1e-12))
        centers = centers.at[i].set(X[idx])
        return centers, key, d2

    d2 = jnp.full((n,), jnp.inf, X.dtype)
    centers, _, _ = jax.lax.fori_loop(1, k, body, (centers, key, d2))
    return centers


def _lloyd_traced(key, X, centers0, k: int, n_iters: int):
    def step(carry, _):
        centers, _ = carry
        d2 = _pairwise_sq_dists(X, centers)
        # explicit int32: under jax x64 argmin defaults to int64, which
        # would break the scan carry type
        assign = jnp.argmin(d2, axis=1).astype(jnp.int32)
        onehot = jax.nn.one_hot(assign, k, dtype=X.dtype)
        counts = onehot.sum(0)
        sums = onehot.T @ X
        new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
        # keep old center for empty clusters
        new_centers = jnp.where(counts[:, None] > 0, new_centers, centers)
        return (new_centers, assign), None

    (centers, assign), _ = jax.lax.scan(
        step, (centers0, jnp.zeros(X.shape[0], jnp.int32)), None,
        length=n_iters)
    d2 = _pairwise_sq_dists(X, centers)
    assign = jnp.argmin(d2, axis=1).astype(jnp.int32)
    inertia = jnp.sum(jnp.min(d2, axis=1))
    return centers, assign, inertia


@functools.partial(jax.jit, static_argnames=("k", "n_iters", "m"))
def _kmeans_multi(keys, X, k: int, n_iters: int, m: int):
    """All n_init trials fused into one device program (vmap over the
    trial axis) with a single best-of selection on device. The previous
    host loop ran trials sequentially with an eager k-means++ and a
    blocking float(inertia) per trial — tens of small dispatches whose
    wall time was dominated by per-call tunnel RTT (measured 32-400 s on
    real chr22 data depending on link weather vs ~2 s fused)."""

    def one_trial(key):
        key, k1, k2 = jax.random.split(key, 3)
        if m < X.shape[0]:
            idx = jax.random.choice(k1, X.shape[0], (m,), replace=False)
            seed_X = X[idx]
        else:
            seed_X = X
        centers0 = _kmeans_pp_init(k2, seed_X, k)
        centers, _, inertia = _lloyd_traced(key, X, centers0, k, n_iters)
        return centers, inertia

    # vmap runs all trials lockstep, so the live (n_init, N, K) distance
    # and one-hot buffers scale with the trial count; at genome scale
    # (N in the tens of millions) that multiplies peak HBM by n_init.
    # Above a ~2 GB single-trial footprint fall back to lax.map: still ONE
    # fused dispatch (the tunnel-RTT motivation), sequential trial memory.
    trial_bytes = 2 * X.shape[0] * k * X.dtype.itemsize
    if keys.shape[0] * trial_bytes > _VMAP_TRIAL_BYTES:
        centers_all, inertia_all = jax.lax.map(one_trial, keys)
    else:
        centers_all, inertia_all = jax.vmap(one_trial)(keys)
    best = jnp.argmin(inertia_all)
    centers = centers_all[best]
    d2 = _pairwise_sq_dists(X, centers)
    labels = jnp.argmin(d2, axis=1).astype(jnp.int32)
    return centers, labels, inertia_all[best]


def kmeans(key, X: jnp.ndarray, k: int, n_iters: int = 100,
           n_init: int = 10, pp_subsample: int = 65536):
    # n_init matches the reference's MiniBatchKMeans(n_init=10)
    # (phylo_hmrf.py:238)
    """Best-of-n_init Lloyd k-means with k-means++ seeding.

    Returns (centers (K, F), labels (N,), inertia). The ++ seeding runs on a
    subsample for large N (seeding is O(N*K) per center pick otherwise).
    All trials run in one jitted dispatch (`_kmeans_multi`)."""
    keys = jax.random.split(key, n_init)
    m = min(int(X.shape[0]), pp_subsample)
    return _kmeans_multi(keys, X, k, n_iters, m)
