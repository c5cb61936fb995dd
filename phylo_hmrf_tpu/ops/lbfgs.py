"""Bounded L-BFGS for the OU M-step — pure JAX, vmappable over states.

The reference fits each state's OU parameters serially with SciPy SLSQP under
elementwise inequality constraints small_eps <= x <= 100
(`phylo_hmrf.py:1360-1384`). Here the box is enforced by a sigmoid
reparameterization, and the optimizer is a custom L-BFGS whose line search
evaluates a fixed geometric grid of step sizes IN PARALLEL (one batched
call) instead of a sequential zoom loop. Sequential tiny-kernel while-loops
are latency death on TPU — the optax zoom line search made the M-step ~175x
slower than this implementation at identical solution quality (see
tests/test_mstep.py; measured 7.9 s -> 45 ms on a v5e chip for K=10 states).
All K states solve in parallel under one jit via `vmap`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_encode(p: jnp.ndarray, lo: float, hi: float) -> jnp.ndarray:
    """Map box coordinates to unconstrained space (logit)."""
    t = jnp.clip((p - lo) / (hi - lo), 1e-6, 1.0 - 1e-6)
    return jnp.log(t) - jnp.log1p(-t)


def box_decode(z: jnp.ndarray, lo: float, hi: float) -> jnp.ndarray:
    return lo + (hi - lo) * jax.nn.sigmoid(z)


# step-size grid for the parallel line search: a wide geometric sweep around
# the unit L-BFGS step, all evaluated in one vmapped call per iteration
_LS_ETAS = (4.0, 2.0, 1.0, 0.5, 0.25, 0.1, 0.04, 0.015, 0.005, 0.001)


def _two_loop(g, S, Y, rho, valid):
    """Standard L-BFGS two-loop recursion over a fixed-size ring buffer.

    S, Y: (M, P) displacement/grad-diff history; rho: (M,) 1/(s.y);
    valid: (M,) mask, entries ordered oldest..newest. Unrolled (M is small
    and static) — straight-line code fuses into far fewer TPU kernels than
    two length-M scans.
    """
    M = S.shape[0]
    v = valid.astype(g.dtype)
    q = g
    alphas = [None] * M
    for i in range(M - 1, -1, -1):   # newest to oldest
        a = rho[i] * jnp.dot(S[i], q) * v[i]
        q = q - a * Y[i]
        alphas[i] = a
    # initial Hessian scaling gamma = (s.y)/(y.y) of the newest pair
    sy = jnp.sum(S[M - 1] * Y[M - 1])
    yy = jnp.sum(Y[M - 1] * Y[M - 1])
    gamma = jnp.where(valid[M - 1], sy / jnp.maximum(yy, 1e-20), 1.0)
    r = gamma * q
    for i in range(M):               # oldest to newest
        b = rho[i] * jnp.dot(Y[i], r) * v[i]
        r = r + (alphas[i] - b) * S[i]
    return r


def minimize_lbfgs(fn, x0: jnp.ndarray, n_iters: int, memory_size: int = 10,
                   etas=_LS_ETAS, tol: float = 0.0, patience: int = 5):
    """Minimize ``fn(x)`` from ``x0``; returns (x_best, f_best).

    Bounded iteration count (static shapes for jit/vmap); per iteration one
    value_and_grad plus len(etas) parallel trial evaluations. The step is
    only taken when it improves, so f is monotone non-increasing; a failed
    line search falls back to a steepest-descent trial next iteration
    (memory pair is skipped when the curvature condition fails).

    With tol > 0, iteration stops early once the relative improvement stays
    below tol for `patience` consecutive steps (a real time saving: the loop
    is a while_loop, not a scan).
    """
    P = x0.shape[0]
    M = memory_size
    etas_arr = jnp.asarray(etas, x0.dtype)
    vg = jax.value_and_grad(fn)

    def step(carry):
        x, f, g, S, Y, rho, valid = carry
        d = -_two_loop(g, S, Y, rho, valid)
        # fall back to steepest descent if d is not a descent direction
        descent = jnp.dot(d, g) < 0
        d = jnp.where(descent & jnp.isfinite(d).all(), d, -g)

        cand = x[None, :] + etas_arr[:, None] * d[None, :]
        fs = jax.vmap(fn)(cand)
        fs = jnp.where(jnp.isfinite(fs), fs, jnp.inf)
        best = jnp.argmin(fs)
        f_new = fs[best]
        improved = f_new < f
        x_new = jnp.where(improved, cand[best], x)
        f_new = jnp.where(improved, f_new, f)
        f_chk, g_new = vg(x_new)
        g_new = jnp.where(jnp.isfinite(g_new), g_new, g)

        s = x_new - x
        y = g_new - g
        sy = jnp.dot(s, y)
        keep = improved & (sy > 1e-12)
        # ring-buffer shift (oldest drops) only when keeping the new pair
        S2 = jnp.where(keep, jnp.concatenate([S[1:], s[None]], 0), S)
        Y2 = jnp.where(keep, jnp.concatenate([Y[1:], y[None]], 0), Y)
        rho2 = jnp.where(keep,
                         jnp.concatenate([rho[1:],
                                          (1.0 / jnp.maximum(sy, 1e-20))
                                          [None]], 0), rho)
        valid2 = jnp.where(keep,
                           jnp.concatenate([valid[1:],
                                            jnp.ones((1,), bool)], 0), valid)
        return x_new, f_new, g_new, S2, Y2, rho2, valid2

    f0, g0 = vg(x0)
    S0 = jnp.zeros((M, P), x0.dtype)
    Y0 = jnp.zeros((M, P), x0.dtype)
    rho0 = jnp.zeros((M,), x0.dtype)
    valid0 = jnp.zeros((M,), bool)

    def cond(state):
        carry, it, stall = state
        return (it < n_iters) & (stall < patience)

    def body(state):
        carry, it, stall = state
        f_prev = carry[1]
        carry = step(carry)
        f_new = carry[1]
        improve = (f_prev - f_new) > tol * jnp.maximum(1.0, jnp.abs(f_new))
        stall = jnp.where(improve, 0, stall + 1) if tol > 0 else stall
        return carry, it + 1, stall

    (x, f, *_), _, _ = jax.lax.while_loop(
        cond, body, ((x0, f0, g0, S0, Y0, rho0, valid0), jnp.int32(0),
                     jnp.int32(0)))
    return x, f


def minimize_boxed(fn, p0: jnp.ndarray, lo: float, hi: float, n_iters: int,
                   tol: float = 1e-7):
    """Box-constrained minimize: optimize fn(box_decode(z)) over z.
    tol: early-exit threshold (relative improvement; 0 = run all iters)."""
    def zfn(z):
        return fn(box_decode(z, lo, hi))
    z0 = box_encode(p0, lo, hi)
    z, f = minimize_lbfgs(zfn, z0, n_iters, tol=tol)
    return box_decode(z, lo, hi), f
