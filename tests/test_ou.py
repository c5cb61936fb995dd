"""OU moment synthesis and M-step objective tests.

The numpy oracle `_ou_moments_np` below re-derives the reference recursion
(reference phylo_hmrf.py:1070-1088) independently so the JAX implementation
is checked against straight-line numpy, plus closed-form OU identities on a
2-leaf tree.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phylo_hmrf_tpu.tree import build_tree
from phylo_hmrf_tpu.models.ou import (
    ou_moments, ou_moments_batch, ou_nll_stats, ou_nll_init, split_params,
    check_params, propagate_mean_guess,
)


def _ou_moments_np(params, tree):
    """Straight-line numpy oracle for the OU recursion."""
    n = tree.n_nodes
    B = n - 1
    sigma2_root = params[0]
    alpha = params[1:1 + B]
    lam = params[1 + B:1 + 2 * B]
    theta = params[1 + 2 * B:]
    mean = np.zeros(n)
    var = np.zeros(n)
    mean[0], var[0] = theta[0], sigma2_root
    for node in tree.topo_order[1:]:
        node = int(node)
        a = alpha[node - 1]
        e = np.exp(-a)
        ratio = lam[node - 1] / (2 * a) if a > 1e-7 else 0.0
        p = int(tree.parent[node])
        mean[node] = mean[p] * e + theta[node] * (1 - e)
        var[node] = ratio * (1 - e ** 2) + var[p] * e ** 2
    L = tree.n_leaves
    cov = np.zeros((L, L))
    alpha_full = np.concatenate([[0.0], alpha])
    for k in range(tree.pair_list.shape[0]):
        _, _, mrca = tree.pair_list[k]
        s = np.exp(-(tree.A2[k] * alpha_full).sum()) * var[mrca]
        i, j = tree.pair_rows[k], tree.pair_cols[k]
        cov[i, j] = cov[j, i] = s
    for i, leaf in enumerate(tree.leaf_nodes):
        cov[i, i] = var[leaf]
    return mean[tree.leaf_nodes], cov


def _random_params(tree, rng, k=None):
    shape = (tree.n_params,) if k is None else (k, tree.n_params)
    p = rng.random(shape)
    p[..., 0] += 0.1           # root variance
    p[..., 1:tree.n_nodes] += 0.05   # alphas away from the floor
    return p


def test_moments_match_numpy_oracle(example_tree, rng):
    for _ in range(10):
        params = _random_params(example_tree, rng)
        m_np, c_np = _ou_moments_np(params, example_tree)
        m_jx, c_jx = ou_moments(jnp.asarray(params), example_tree)
        np.testing.assert_allclose(m_jx, m_np, rtol=1e-5)
        np.testing.assert_allclose(c_jx, c_np, rtol=1e-5, atol=1e-7)


def test_covariance_is_psd(example_tree, rng):
    for _ in range(20):
        params = _random_params(example_tree, rng)
        _, cov = ou_moments(jnp.asarray(params), example_tree)
        eig = np.linalg.eigvalsh(np.asarray(cov))
        assert eig.min() > -1e-6


@pytest.mark.smoke
def test_two_leaf_closed_form():
    # root 0 with two leaf children 1, 2
    tree = build_tree([(0, 1), (0, 2)])
    sigma2_root = 0.3
    a1, a2 = 0.7, 1.3
    l1, l2 = 0.9, 0.4
    th = [0.5, 2.0, -1.0]
    params = jnp.asarray([sigma2_root, a1, a2, l1, l2, *th])
    mean, cov = ou_moments(params, tree)
    e1, e2 = np.exp(-a1), np.exp(-a2)
    np.testing.assert_allclose(
        mean, [th[0] * e1 + th[1] * (1 - e1), th[0] * e2 + th[2] * (1 - e2)],
        rtol=1e-5)
    v1 = l1 / (2 * a1) * (1 - e1 ** 2) + sigma2_root * e1 ** 2
    v2 = l2 / (2 * a2) * (1 - e2 ** 2) + sigma2_root * e2 ** 2
    c12 = sigma2_root * np.exp(-(a1 + a2))
    np.testing.assert_allclose(cov, [[v1, c12], [c12, v2]], rtol=1e-5)


def test_alpha_floor_zeroes_ratio():
    tree = build_tree([(0, 1), (0, 2)])
    params = jnp.asarray([0.5, 1e-9, 1.0, 3.0, 1.0, 0.0, 1.0, 1.0])
    _, cov = ou_moments(params, tree)
    # branch 1 alpha below floor -> its Brownian term is dropped (parity with
    # reference `ratio1[b] = lam[b]/(2 beta[b])` applied only where alpha>1e-7)
    assert np.isfinite(np.asarray(cov)).all()
    np.testing.assert_allclose(cov[0, 0], 0.5 * np.exp(-2e-9), rtol=1e-5)


def test_batch_matches_single(example_tree, rng):
    params = _random_params(example_tree, rng, k=5)
    means, covs = ou_moments_batch(jnp.asarray(params), example_tree)
    for c in range(5):
        m1, c1 = ou_moments(jnp.asarray(params[c]), example_tree)
        np.testing.assert_allclose(means[c], m1, rtol=1e-5)
        np.testing.assert_allclose(covs[c], c1, rtol=1e-5)


def test_nll_stats_matches_dense_formula(example_tree, rng):
    """ou_nll_stats must equal the direct det/inv formula of the reference."""
    tree = example_tree
    params = _random_params(tree, rng)
    F = tree.n_leaves
    n_samples = 1000.0
    lambda_0, min_covar = 1.0, 1e-3
    post_c = 321.0
    obs_c = rng.random(F) * post_c
    A = rng.random((F, F))
    obs2_c = A @ A.T * post_c

    loss = ou_nll_stats(jnp.asarray(params), post_c, jnp.asarray(obs_c),
                        jnp.asarray(obs2_c), tree, n_samples, lambda_0,
                        min_covar)

    m, cov = _ou_moments_np(params, tree)
    V = cov + min_covar * np.eye(F)
    obsmean = np.outer(obs_c, m)
    Sn = obs2_c - obsmean - obsmean.T + post_c * np.outer(m, m)
    expected = (post_c * np.log(np.linalg.det(V) + 1e-16) / n_samples
                + np.sum(np.linalg.inv(V) * Sn) / n_samples
                + lambda_0 / np.sqrt(n_samples) * params @ params)
    np.testing.assert_allclose(float(loss), expected, rtol=1e-4)


def test_nll_init_matches_dense_formula(example_tree, rng):
    tree = example_tree
    params = _random_params(tree, rng)
    F = tree.n_leaves
    X = rng.random((500, F)) + 0.5
    xbar = X.mean(0)
    xxT = X.T @ X / X.shape[0]
    loss = ou_nll_init(jnp.asarray(params), jnp.asarray(xbar),
                       jnp.asarray(xxT), tree, 1e-3)
    m, cov = _ou_moments_np(params, tree)
    V = cov + 1e-3 * np.eye(F)
    obsmean = np.outer(xbar, m)
    Sn = xxT - obsmean - obsmean.T + np.outer(m, m)
    expected = (np.log(np.linalg.det(V) + 1e-16)
                + np.sum(np.linalg.inv(V) * Sn))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-4)


def test_nll_differentiable(example_tree, rng):
    tree = example_tree
    params = jnp.asarray(_random_params(tree, rng))
    g = jax.grad(ou_nll_stats)(
        params, 100.0, jnp.ones(4) * 50, jnp.eye(4) * 120.0,
        tree, 1000.0, 1.0, 1e-3)
    assert np.isfinite(np.asarray(g)).all()


def test_check_params(example_tree):
    n = example_tree.n_nodes
    good = np.full(example_tree.n_params, 0.5)
    assert check_params(good, n) == 1
    bad = good.copy()
    bad[2] = -1.0
    assert check_params(bad, n) == -1
    nan = good.copy()
    nan[3] = np.nan
    assert check_params(nan, n) == -2


def test_propagate_mean_guess(example_tree):
    rng = np.random.default_rng(1)
    leaf_means = np.array([1.0, 2.0, 3.0, 4.0])
    g = propagate_mean_guess(leaf_means, example_tree, rng, 1.0,
                             example_tree.n_params)
    theta = g[example_tree.n_params - example_tree.n_nodes:]
    # leaves keep their means
    np.testing.assert_allclose(theta[[2, 5, 6, 7]], leaf_means)
    # node 4 averages leaves 6 and 5 in descending-child order
    np.testing.assert_allclose(theta[4], 0.5 * 3.0 + 0.5 * 2.0)


def test_split_params_roundtrip(example_tree, rng):
    params = jnp.asarray(_random_params(example_tree, rng))
    s, a, l, t = split_params(params, example_tree.n_nodes)
    assert a.shape == (7,) and l.shape == (7,) and t.shape == (8,)
    np.testing.assert_allclose(
        np.concatenate([[s], a, l, t]), params, rtol=1e-7)
