"""Bounded L-BFGS for the OU M-step — pure JAX, vmappable over states.

The reference fits each state's OU parameters serially with SciPy SLSQP under
elementwise inequality constraints small_eps <= x <= 100
(`phylo_hmrf.py:1360-1384`). Here the box is enforced by a sigmoid
reparameterization and the optimizer is optax L-BFGS (zoom linesearch) run
under `lax.scan`, so all K states solve in parallel under one jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def box_encode(p: jnp.ndarray, lo: float, hi: float) -> jnp.ndarray:
    """Map box coordinates to unconstrained space (logit)."""
    t = jnp.clip((p - lo) / (hi - lo), 1e-6, 1.0 - 1e-6)
    return jnp.log(t) - jnp.log1p(-t)


def box_decode(z: jnp.ndarray, lo: float, hi: float) -> jnp.ndarray:
    return lo + (hi - lo) * jax.nn.sigmoid(z)


def minimize_lbfgs(fn, x0: jnp.ndarray, n_iters: int, memory_size: int = 15):
    """Minimize ``fn(x)`` from ``x0``; returns (x_best, f_best).

    Runs a fixed number of L-BFGS steps (static shape for jit/vmap) and keeps
    the best iterate seen, so a late linesearch failure cannot regress the
    result.
    """
    opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(fn)

    def step(carry, _):
        x, state, best_x, best_f = carry
        f, g = value_and_grad(x, state=state)
        updates, state = opt.update(g, state, x, value=f, grad=g,
                                    value_fn=fn)
        x_new = optax.apply_updates(x, updates)
        better = f < best_f
        best_x = jnp.where(better, x, best_x)
        best_f = jnp.where(better, f, best_f)
        # guard against NaN excursions: reset to best-so-far
        bad = ~jnp.isfinite(f)
        x_new = jnp.where(bad, best_x, x_new)
        return (x_new, state, best_x, best_f), None

    f0 = fn(x0)
    state0 = opt.init(x0)
    (x, _, best_x, best_f), _ = jax.lax.scan(
        step, (x0, state0, x0, f0), None, length=n_iters)
    f_last = fn(x)
    better = f_last < best_f
    return (jnp.where(better, x, best_x), jnp.where(better, f_last, best_f))


def minimize_boxed(fn, p0: jnp.ndarray, lo: float, hi: float, n_iters: int):
    """Box-constrained minimize: optimize fn(box_decode(z)) over z."""
    def zfn(z):
        return fn(box_decode(z, lo, hi))
    z0 = box_encode(p0, lo, hi)
    z, f = minimize_lbfgs(zfn, z0, n_iters)
    return box_decode(z, lo, hi), f
