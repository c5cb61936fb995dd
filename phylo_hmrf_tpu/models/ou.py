"""Ornstein-Uhlenbeck emission moments on a phylogenetic tree — pure JAX.

Per hidden state, a parameter vector

    params = [sigma2_root, alpha_1..alpha_B, lambda_1..lambda_B,
              theta_0, theta_1..theta_B]            (B = n_nodes - 1 branches)

generates the mean vector and covariance matrix of the leaf species via the
OU recursion (behavioral parity with reference ``phylo_hmrf.py:1038-1138``;
note the reference folds branch lengths into the per-branch alpha, i.e. the
recursion uses ``exp(-alpha_i)`` directly, NOT ``exp(-alpha_i * t_i)``):

    E[root] = theta_0                  Var[root] = sigma2_root
    E[i] = E[p(i)] e_i + theta_i (1 - e_i)              with e_i = exp(-alpha_i)
    Var[i] = lambda_i/(2 alpha_i) (1 - e_i^2) + Var[p(i)] e_i^2
    Cov(leaf_a, leaf_b) = Var[mrca] * exp(-sum_{branches between a,b below mrca} alpha)

Branch k (0-based) belongs to node k+1; node 0 is always the root (the
reference normalizes each edge so the smaller index is the parent).

The M-step objective (``ou_nll_stats``) matches the reference loss at
``phylo_hmrf.py:1093-1113`` including the lambda_0/sqrt(n) L2 term, but uses
a symmetric-eigenvalue jitter + linear solve instead of the reference's
cond/pinv retry loop (same value on the non-degenerate path; TPU friendly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from phylo_hmrf_tpu.config import SMALL_EPS
from phylo_hmrf_tpu.tree import PhyloTree

_ALPHA_FLOOR = 1e-7  # reference: ratio = lambda/(2 alpha) only where alpha > 1e-7


def split_params(params: jnp.ndarray, n_nodes: int):
    """Split a flat per-state parameter vector into (sigma2_root, alpha,
    lam, theta). ``theta`` is node-indexed: theta[0] is the root optimum."""
    B = n_nodes - 1
    sigma2_root = params[..., 0]
    alpha = params[..., 1:1 + B]
    lam = params[..., 1 + B:1 + 2 * B]
    theta = params[..., 1 + 2 * B:]
    return sigma2_root, alpha, lam, theta


def ou_moments(params: jnp.ndarray, tree: PhyloTree):
    """OU moments for one state: returns (leaf_mean (L,), leaf_cov (L, L))."""
    n = tree.n_nodes
    sigma2_root, alpha, lam, theta = split_params(params, n)

    # node-indexed branch quantities; root entry is a zero pad so that
    # e_full[root] = 0 reproduces the reference's `np.insert(beta1_exp, 0, 0)`
    zero = jnp.zeros((1,), dtype=params.dtype)
    alpha_full = jnp.concatenate([zero, alpha])
    ratio = jnp.where(alpha > _ALPHA_FLOOR, lam / (2.0 * alpha), 0.0)
    ratio_full = jnp.concatenate([zero, ratio])
    e_full = jnp.concatenate([zero, jnp.exp(-alpha)])

    # unrolled tree recursion: the tree is static and tiny (single digits of
    # nodes), so straight-line code beats lax.scan latency by a wide margin
    # inside the vmapped M-step (each scan step is a separate tiny kernel)
    mean_l = [None] * n
    var_l = [None] * n
    mean_l[0] = theta[0]
    var_l[0] = sigma2_root
    for node in tree.topo_order[1:]:
        node = int(node)
        p = int(tree.parent[node])
        e = e_full[node]
        mean_l[node] = mean_l[p] * e + theta[node] * (1.0 - e)
        var_l[node] = ratio_full[node] * (1.0 - e * e) + var_l[p] * (e * e)
    mean = jnp.stack(mean_l)
    var = jnp.stack(var_l)

    # cross-covariances: Cov(a,b) = Var[mrca] * exp(-(A2 @ alpha_full)[pair])
    A2 = jnp.asarray(tree.A2, dtype=params.dtype)
    s1 = A2 @ alpha_full
    s2 = var[jnp.asarray(tree.pair_mrca)] * jnp.exp(-s1)

    L = tree.n_leaves
    cov = jnp.zeros((L, L), params.dtype)
    cov = cov.at[tree.pair_rows, tree.pair_cols].set(s2)
    cov = cov + cov.T
    leaf_var = var[jnp.asarray(tree.leaf_nodes)]
    cov = cov.at[jnp.arange(L), jnp.arange(L)].set(leaf_var)
    leaf_mean = mean[jnp.asarray(tree.leaf_nodes)]
    return leaf_mean, cov


def ou_moments_batch(params_batch: jnp.ndarray, tree: PhyloTree):
    """vmapped moments over K states: (K, n_params) -> ((K, L), (K, L, L))."""
    return jax.vmap(functools.partial(ou_moments, tree=tree))(params_batch)


def _regularize(V: jnp.ndarray, floor: float = 1e-6) -> jnp.ndarray:
    """No-op hook kept for API clarity.

    The OU covariance is PSD by construction whenever the box constraints
    hold (variances and selection strengths are non-negative and the tree
    covariance is a Schur product of PSD matrices), so V = cov + min_covar*I
    has min eigenvalue >= min_covar > 0 on the entire optimizer domain. The
    reference's cond/pinv retry loop (`phylo_hmrf.py:1108-1133`) only fires
    for unconstrained NaN excursions, which the L-BFGS driver already
    rejects (non-finite trial values are discarded). An eigvalsh-based
    jitter here costs a non-fusable eigendecomposition per objective
    evaluation — measured at ~20% of the whole M-step."""
    return V


def _chol_unrolled(V: jnp.ndarray):
    """Cholesky factor of a tiny static-F SPD matrix as straight-line code.

    F is single-digit (number of species), so the F(F+1)/2 scalar updates
    unroll into fully fusable elementwise ops — unlike `jnp.linalg.cholesky`
    / `slogdet` / `solve`, which each lower to an unfusable LAPACK-style
    kernel whose dispatch latency dominates the vmapped M-step objective
    (measured ~2x of the whole L-BFGS iteration at F=4). Returns the list
    of lists lower-triangular entries L[i][j] (i >= j), plus a ``bad``
    scalar bool: True iff some pivot was non-positive (V not PD). The
    diagonal is clamped away from zero so a non-PD V yields finite
    (meaningless) factors rather than NaN — callers turn ``bad`` into an
    +inf objective, which the L-BFGS line search rejects cleanly (a NaN
    would also be rejected, but poisons step-size heuristics)."""
    F = V.shape[0]
    L = [[None] * F for _ in range(F)]
    bad = jnp.zeros((), jnp.bool_)
    tiny = jnp.asarray(1e-30, V.dtype)
    for j in range(F):
        s = V[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        bad = bad | (s <= 0)
        L[j][j] = jnp.sqrt(jnp.maximum(s, tiny))
        for i in range(j + 1, F):
            t = V[i, j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t / L[j][j]
    return L, bad


def _logdet_trace_solve(V: jnp.ndarray, Sn: jnp.ndarray):
    """(log(det V + small_eps), tr(V^{-1} Sn)) via one unrolled Cholesky.

    Exact same values as slogdet-based log(det + small_eps) (reference
    `phylo_hmrf.py:1111`) + `jnp.linalg.solve` on the SPD
    domain (the box-constrained optimizer path keeps V SPD by construction,
    see `_regularize`); a non-PD excursion yields an +inf logdet, which the
    L-BFGS line search rejects — matching the reference's retry-on-invalid
    policy (`phylo_hmrf.py:1108-1133`). (The reference's clamped slogdet
    can return a finite value for an indefinite V with positive
    determinant; that off-domain point is rejected here instead — gated by
    tests/test_mstep.py::test_logdet_trace_nonpd.)"""
    F = V.shape[0]
    L, bad = _chol_unrolled(V)
    det = (L[0][0] * L[0][0])
    for j in range(1, F):
        det = det * (L[j][j] * L[j][j])
    logdet = jnp.where(bad, jnp.inf, jnp.log(det + SMALL_EPS))
    # tr(V^{-1} Sn) = sum(W * W') with W = L^{-1} Sn^{1/2}... simpler:
    # forward-substitute Y = L^{-1} Sn (rows sequential, columns vectorized),
    # then tr(V^{-1} Sn) = tr(L^{-T} Y) = sum_ij (L^{-1})_ij * Y_ji; do the
    # second substitution explicitly on Y^T columns.
    Y = [None] * F                      # Y[i]: (F,) row of L^{-1} Sn
    for i in range(F):
        t = Sn[i]
        for k in range(i):
            t = t - L[i][k] * Y[k]
        Y[i] = t / L[i][i]
    # back-substitute Z = L^{-T} Y; only diag(Z) is needed for the trace,
    # but each Z row depends on later rows, so compute rows F-1..0.
    Z = [None] * F
    trace = jnp.zeros((), V.dtype)
    for i in range(F - 1, -1, -1):
        t = Y[i]
        for k in range(i + 1, F):
            t = t - L[k][i] * Z[k]
        Z[i] = t / L[i][i]
        trace = trace + Z[i][i]
    return logdet, trace


def ou_nll_stats(params: jnp.ndarray, post_c: jnp.ndarray, obs_c: jnp.ndarray,
                 obs2_c: jnp.ndarray, tree: PhyloTree, n_samples: float,
                 lambda_0: float, min_covar: float) -> jnp.ndarray:
    """M-step loss for one state given sufficient statistics.

    post_c: scalar sum of posteriors; obs_c: (F,) = gamma^T X row;
    obs2_c: (F, F) = sum_i gamma_ic x_i x_i^T.

    loss = post_c*log(det V + eps)/n + tr(V^{-1} S_c)/n
           + lambda_0/sqrt(n) * ||params||^2                 (reference :1111-1113)
    with S_c = obs2_c - outer(obs_c, m) - outer(m, obs_c) + post_c * outer(m, m).
    """
    m, cov = ou_moments(params, tree)
    F = cov.shape[0]
    V = cov + min_covar * jnp.eye(F, dtype=cov.dtype)
    V = _regularize(V)

    obsmean = jnp.outer(obs_c, m)
    Sn = obs2_c - obsmean - obsmean.T + post_c * jnp.outer(m, m)

    logdet, trace_term = _logdet_trace_solve(V, Sn)
    lam1 = 1.0 / jnp.sqrt(jnp.asarray(n_samples, params.dtype))
    return (post_c * logdet / n_samples
            + trace_term / n_samples
            + lambda_0 * lam1 * jnp.dot(params, params))


def ou_nll_init(params: jnp.ndarray, xbar: jnp.ndarray, xxT: jnp.ndarray,
                tree: PhyloTree, min_covar: float) -> jnp.ndarray:
    """Init-time per-cluster loss (reference ``_ou_lik_varied_single``,
    `phylo_hmrf.py:1246-1325`):

    loss = log det V + tr(V^{-1} S),   S = X^T X / n - outer(xbar, m)
                                           - outer(m, xbar) + outer(m, m)
    xbar: (F,) cluster sample mean; xxT: (F, F) = X^T X / n.
    """
    m, cov = ou_moments(params, tree)
    F = cov.shape[0]
    V = cov + min_covar * jnp.eye(F, dtype=cov.dtype)
    V = _regularize(V)
    obsmean = jnp.outer(xbar, m)
    Sn = xxT - obsmean - obsmean.T + jnp.outer(m, m)
    logdet, trace_term = _logdet_trace_solve(V, Sn)
    return logdet + trace_term


def check_params(params: np.ndarray, n_nodes: int,
                 lo: float = 0.0, hi: float = 100.0) -> int:
    """Validity flag matching reference ``_check_params``
    (`phylo_hmrf.py:1405-1425`): 1 = ok, -1 = out of box, -2 = NaN."""
    params = np.asarray(params)
    B = n_nodes - 1
    p1 = params[..., 1:]
    alpha, lam, theta = p1[..., :B], p1[..., B:2 * B], p1[..., 2 * B:]
    if np.isnan(p1).any():
        return -2
    ok = ((alpha >= lo).all() and (alpha <= hi).all()
          and (lam >= lo).all() and (lam <= hi).all()
          and (theta >= -hi).all() and (theta <= hi).all())
    return 1 if ok else -1


def propagate_mean_guess(mean_values: np.ndarray, tree: PhyloTree,
                         rng: np.random.Generator,
                         w2: float, n_params: int) -> np.ndarray:
    """Tree-propagated initial guess (reference ``_ou_init_guess``,
    `phylo_hmrf.py:1453-1480`): thetas start from leaf means averaged up the
    tree; other params are w2 * U[0,1)."""
    n = tree.n_nodes
    guess = w2 * rng.random(n_params)
    mean_full = np.zeros(n)
    flag = np.zeros(n)
    mean_full[tree.leaf_nodes] = mean_values
    flag[tree.leaf_nodes] = 2
    for j in range(n - 1, 0, -1):
        p = int(tree.parent[j])
        if flag[p] == 0:
            mean_full[p] = mean_full[j]
            flag[p] += 1
        elif flag[p] == 1:
            mean_full[p] = 0.5 * mean_full[p] + 0.5 * mean_full[j]
            flag[p] += 1
    guess[n_params - n:] = mean_full
    return guess
