"""M-step optimizer tests: the vmapped boxed L-BFGS must recover OU moments
from sufficient statistics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phylo_hmrf_tpu.models.ou import ou_moments, ou_nll_stats
from phylo_hmrf_tpu.ops.lbfgs import (
    box_decode, box_encode, minimize_boxed, minimize_lbfgs)


def test_box_roundtrip():
    p = np.array([0.01, 0.5, 10.0, 99.9])
    z = box_encode(jnp.asarray(p), 1e-16, 100.0)
    p2 = box_decode(z, 1e-16, 100.0)
    np.testing.assert_allclose(p2, p, rtol=1e-3)
    assert np.isfinite(np.asarray(z)).all()
    # values below the logit-clip floor saturate near the box edge
    tiny = box_decode(box_encode(jnp.asarray(1e-10), 1e-16, 100.0),
                      1e-16, 100.0)
    assert 0 < float(tiny) <= 1e-3


@pytest.mark.smoke
def test_lbfgs_quadratic():
    A = jnp.asarray(np.diag([1.0, 4.0, 9.0]))
    b = jnp.asarray([1.0, -2.0, 3.0])

    def fn(x):
        return 0.5 * x @ A @ x - b @ x

    x, f = minimize_lbfgs(fn, jnp.zeros(3), 50)
    # f32 objective resolution bounds the parameter accuracy near the optimum
    np.testing.assert_allclose(x, np.linalg.solve(np.asarray(A), b),
                               atol=5e-4)
    x_opt = np.linalg.solve(np.asarray(A), np.asarray(b))
    f_opt = 0.5 * x_opt @ np.asarray(A) @ x_opt - np.asarray(b) @ x_opt
    assert float(f) <= f_opt + 1e-6


def test_lbfgs_vmapped_rosenbrock():
    def fn(x):
        return (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2

    x0 = jnp.asarray(np.random.default_rng(0).random((6, 2)) * 0.5)
    xs, fs = jax.vmap(lambda x: minimize_lbfgs(fn, x, 200))(x0)
    np.testing.assert_allclose(xs, np.ones((6, 2)), atol=1e-2)


def test_boxed_respects_bounds():
    def fn(x):
        return jnp.sum((x + 5.0) ** 2)   # unconstrained min at -5

    x, f = minimize_boxed(fn, jnp.asarray([1.0, 2.0]), 0.5, 10.0, 100)
    assert (np.asarray(x) >= 0.5 - 1e-6).all()
    np.testing.assert_allclose(x, [0.5, 0.5], atol=1e-3)


def test_mstep_recovers_moments(example_tree, rng):
    """Fit OU params to stats generated from a known state: the recovered
    moments (not the raw params, which are not identifiable) must match."""
    tree = example_tree
    P = tree.n_params
    true = rng.random(P) * 0.8 + 0.3
    m_true, V_true = ou_moments(jnp.asarray(true), tree)
    m_true, V_true = np.asarray(m_true, np.float64), np.asarray(V_true, np.float64)
    V_full = V_true + 1e-3 * np.eye(4)

    n = 200000
    X = rng.multivariate_normal(m_true, V_full, size=n)
    post_c = float(n)
    obs_c = X.sum(0)
    obs2_c = X.T @ X

    def fn(p):
        return ou_nll_stats(p, post_c, jnp.asarray(obs_c, jnp.float32),
                            jnp.asarray(obs2_c, jnp.float32), tree,
                            float(n), 0.0, 1e-3)

    guess = jnp.asarray(rng.random(P) * 0.5 + 0.2, jnp.float32)
    p_hat, f_hat = minimize_boxed(fn, guess, 1e-16, 100.0, 200)
    f_true = fn(jnp.asarray(true, jnp.float32))
    assert float(f_hat) <= float(f_true) + 1e-2

    m_hat, V_hat = ou_moments(p_hat, tree)
    np.testing.assert_allclose(np.asarray(m_hat), m_true, atol=0.05)
    np.testing.assert_allclose(np.asarray(V_hat) + 1e-3 * np.eye(4), V_full,
                               atol=0.08)


def test_logdet_trace_nonpd():
    """The unrolled Cholesky objective matches slogdet/solve on SPD inputs
    and rejects non-PD V with +inf (not NaN): the boxed L-BFGS line search
    must see a clean ordering signal on off-domain excursions (ADVICE r2)."""
    from phylo_hmrf_tpu.models.ou import _logdet_trace_solve

    rng = np.random.default_rng(3)
    A = rng.random((4, 4))
    V = A @ A.T + 0.5 * np.eye(4)
    Sn = rng.random((4, 4))
    Sn = Sn + Sn.T
    ld, tr = _logdet_trace_solve(jnp.asarray(V, jnp.float32),
                                 jnp.asarray(Sn, jnp.float32))
    np.testing.assert_allclose(float(ld), np.linalg.slogdet(V)[1], rtol=1e-5)
    np.testing.assert_allclose(float(tr), np.trace(np.linalg.solve(V, Sn)),
                               rtol=1e-4)

    # indefinite V (positive determinant, so the reference's clamped
    # slogdet would be finite): here +inf, never NaN
    V_bad = np.diag([1.0, -2.0, -3.0, 1.0])
    ld_bad, tr_bad = _logdet_trace_solve(jnp.asarray(V_bad, jnp.float32),
                                         jnp.asarray(Sn, jnp.float32))
    assert np.isposinf(float(ld_bad))
    assert not np.isnan(float(tr_bad))


@pytest.mark.smoke
def test_fused_mstep_matches_separate_path(example_tree, rng):
    """`_mstep_solve_full` (solve + device validity + speculative moments in
    one dispatch, one fetch) must be bitwise-equal to the separate
    solve / host check_params / _moments sequence it replaced."""
    from phylo_hmrf_tpu.models.hmrf import (
        _moments, _mstep_solve, _mstep_solve_full)
    from phylo_hmrf_tpu.models.ou import check_params

    tree = example_tree
    K, P, F = 3, tree.n_params, tree.n_leaves
    m0 = rng.random((K, F)) * 2 + 0.5
    n = 5000.0
    post = np.full(K, n)
    obs = m0 * n
    obs2 = np.einsum("kf,kg->kfg", m0, m0) * n + np.eye(F) * n
    guess = rng.random((K, P)) * 0.5 + 0.2

    args = (jnp.asarray(guess, jnp.float32), jnp.asarray(post, jnp.float32),
            jnp.asarray(obs, jnp.float32), jnp.asarray(obs2, jnp.float32),
            jnp.asarray(K * n, jnp.float32), jnp.asarray(1e-4, jnp.float32),
            jnp.asarray(1e-3, jnp.float32))
    kw = dict(tree=tree, lo=1e-16, hi=100.0, iters=60)

    solved_ref, _ = _mstep_solve(*args, **kw)
    solved_ref = np.asarray(solved_ref, np.float64)
    valid_ref = np.array([check_params(solved_ref[c], tree.n_nodes) > 0
                          for c in range(K)])
    means_ref, covars_ref = _moments(
        jnp.asarray(solved_ref, jnp.float32), tree=tree)
    # the fused path adds the min_covar jitter on device, in-dtype
    covars_ref = covars_ref + jnp.float32(1e-3) * jnp.eye(F, dtype=jnp.float32)

    solved, valid, means, covars = jax.device_get(
        _mstep_solve_full(*args, **kw))

    np.testing.assert_array_equal(np.asarray(solved, np.float64), solved_ref)
    np.testing.assert_array_equal(np.asarray(valid, bool), valid_ref)
    np.testing.assert_array_equal(np.asarray(means), np.asarray(means_ref))
    np.testing.assert_array_equal(np.asarray(covars), np.asarray(covars_ref))
