"""Weighted-Potts MRF operations on dense masked grids — pure JAX.

Everything here is vectorized over the pixel grid and jit/vmap-friendly.
It replaces the reference's per-sample Python neighbor loops
(`phylo_hmrf.py:398-468`, its #2-ranked hot loop) and the energy bookkeeping
of the C++ GCO stack.

Conventions (see data/regions.py): edge weight maps ``w[d, i, j]`` give the
weight of the edge from pixel (i, j) to its DIRS[d]-neighbor; 0 = no edge.
Labels at invalid pixels are ignored because all their incident edges carry
zero weight; out-of-bounds neighbor labels are filled with K (one_hot of K
over K classes is the zero vector).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from phylo_hmrf_tpu.data.regions import DIRS


def weight_maps(dmaps: jnp.ndarray, beta1: float) -> jnp.ndarray:
    """w_e = exp(-beta1 * d_e) (reference `phylo_hmrf.py:585`); +inf -> 0."""
    return jnp.exp(-beta1 * dmaps)


def valid_maps(dmaps: jnp.ndarray) -> jnp.ndarray:
    """Unweighted edge indicators (for estimate_type != 3 potentials)."""
    return jnp.isfinite(dmaps).astype(jnp.float32)


def _shift_fwd(arr: jnp.ndarray, di: int, dj: int, fill) -> jnp.ndarray:
    """result[i, j] = arr[i + di, j + dj], `fill` outside."""
    H, W = arr.shape[0], arr.shape[1]
    pad = [(0, di), (max(0, -dj), max(0, dj))] + [(0, 0)] * (arr.ndim - 2)
    a = jnp.pad(arr, pad, constant_values=fill)
    return a[di:di + H, max(0, dj):max(0, dj) + W]


def _shift_bwd(arr: jnp.ndarray, di: int, dj: int, fill) -> jnp.ndarray:
    """result[i, j] = arr[i - di, j - dj], `fill` outside."""
    H, W = arr.shape[0], arr.shape[1]
    pad = [(di, 0), (max(0, dj), max(0, -dj))] + [(0, 0)] * (arr.ndim - 2)
    a = jnp.pad(arr, pad, constant_values=fill)
    return a[0:H, max(0, -dj):max(0, -dj) + W]


def neighbor_sums(labels: jnp.ndarray, wmaps: jnp.ndarray, n_states: int):
    """Per-pixel weighted neighbor-label agreement.

    Returns (agree (H, W, K), wsum (H, W)):
      agree[p, c] = sum over edges incident to p of w_e * [label(other) == c]
      wsum[p]     = sum over edges incident to p of w_e
    """
    K = n_states
    onehot = jax.nn.one_hot(labels, K, dtype=wmaps.dtype)
    agree = jnp.zeros(labels.shape + (K,), wmaps.dtype)
    wsum = jnp.zeros(labels.shape, wmaps.dtype)
    for d, (di, dj) in enumerate(DIRS):
        w = wmaps[d]
        # forward edge seen from the source pixel
        nb_label = _shift_fwd(labels, di, dj, K)
        agree += w[..., None] * jax.nn.one_hot(nb_label, K, dtype=wmaps.dtype)
        wsum += w
        # the same edge seen from the neighbor pixel
        agree += _shift_bwd(w[..., None] * onehot, di, dj, 0.0)
        wsum += _shift_bwd(w, di, dj, 0.0)
    return agree, wsum


def neighbor_sums_soft(q: jnp.ndarray, wmaps: jnp.ndarray):
    """Soft (mean-field) analogue of `neighbor_sums`: q is a per-pixel label
    distribution (H, W, K). Returns (agree (H, W, K), wsum (H, W)) with
    agree[p, c] = sum over incident edges of w_e * q_other(c)."""
    agree = jnp.zeros_like(q)
    wsum = jnp.zeros(q.shape[:2], q.dtype)
    for d, (di, dj) in enumerate(DIRS):
        w = wmaps[d]
        agree += w[..., None] * _shift_fwd(q, di, dj, 0.0)
        wsum += w
        agree += _shift_bwd(w[..., None] * q, di, dj, 0.0)
        wsum += _shift_bwd(w, di, dj, 0.0)
    return agree, wsum


def _pinned_grid_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Full pixel-grid sum with a PINNED reduction order: per-row sums
    (axis=1 — a Reduce with one output per row, which XLA evaluates
    sequentially per output element) combined by a sequential lax.scan
    over rows.

    A plain ``jnp.sum`` over the whole grid is a single-output Reduce whose
    input the CPU backend splits across its thread pool, and the split
    points follow the pool size — so under
    ``--xla_force_host_platform_device_count=N`` the f64 result (hence the
    EM trajectory) varies with N. The f64 strict-parity mode routes its
    cost/stat reductions through here so single-device and CI-mesh runs
    are bitwise identical (VERDICT r3 item 4)."""
    row = jnp.sum(x, axis=1)
    return jax.lax.scan(lambda a, r: (a + r, None),
                        jnp.zeros_like(row[0]), row)[0]


def _pinned(dtype) -> bool:
    return jnp.dtype(dtype) == jnp.float64


def pairwise_potential(labels: jnp.ndarray, wmaps: jnp.ndarray,
                       n_states: int, beta: float) -> jnp.ndarray:
    """pp[p, c] = sum_{edges at p} w_e * V[c, label(other)] with the Potts
    matrix V = beta * (1 - I) (reference `_pairwise_compareLocal`,
    `phylo_hmrf.py:412-436`). Pass unweighted `valid_maps` as ``wmaps`` to get
    the estimate_type != 3 behavior."""
    agree, wsum = neighbor_sums(labels, wmaps, n_states)
    return beta * (wsum[..., None] - agree)


def potts_energy(labels: jnp.ndarray, unary: jnp.ndarray, wmaps: jnp.ndarray,
                 mask: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Total MRF energy: sum_p unary[p, s_p] + beta * sum_e w_e [s_u != s_v].

    This is the objective the reference minimizes with alpha-beta swap graph
    cuts (`pygco.cut_general_graph`, `phylo_hmrf.py:496`).
    """
    gsum = _pinned_grid_sum if _pinned(unary.dtype) else jnp.sum
    onehot = jax.nn.one_hot(labels, unary.shape[-1], dtype=unary.dtype)
    u = jnp.sum(unary * onehot, axis=-1)
    e_unary = gsum(jnp.where(mask, u, 0.0))
    e_pair = 0.0
    for d, (di, dj) in enumerate(DIRS):
        nb = _shift_fwd(labels, di, dj, -1)
        diff = (labels != nb).astype(wmaps.dtype)
        e_pair += gsum(wmaps[d] * diff)
    return e_unary + beta * e_pair


def posteriors_and_costs(logprob: jnp.ndarray, labels: jnp.ndarray,
                         pp: jnp.ndarray, mask: jnp.ndarray,
                         small_eps: float = 1e-16):
    """Mean-field-style posteriors and the four reference costs.

    Parity with `_compute_posteriors_graph` / `_compute_cost_v1`
    (`phylo_hmrf.py:334-396`):
      posteriors        = normalize(exp(logprob - pp)) per pixel
      pairwise_cost     = mean_p pp[p, s_p]
      pairwise_cost_nrm = -mean_p log(softmax(-pp)[p, s_p] + eps)
      unary_cost        = -mean_p logprob[p, s_p]
      cost1             = unary_cost + pairwise_cost_nrm
    Means are over valid pixels. Returns (posteriors, cost_vec(4,), n_valid).
    """
    gsum = _pinned_grid_sum if _pinned(logprob.dtype) else jnp.sum
    m = mask.astype(logprob.dtype)
    n_valid = jnp.sum(m)
    # all-false masks occur in device-padding regions; keep costs finite
    n_valid_safe = jnp.maximum(n_valid, 1.0)

    posteriors = jax.nn.softmax(logprob - pp, axis=-1)
    pp_norm = jax.nn.softmax(-pp, axis=-1)

    # select-at-label via one-hot contraction (gathers are slow on TPU)
    onehot = jax.nn.one_hot(labels, logprob.shape[-1], dtype=logprob.dtype)
    pp_map = jnp.sum(pp * onehot, axis=-1)
    lp_map = jnp.sum(logprob * onehot, axis=-1)
    ppn_map = jnp.sum(pp_norm * onehot, axis=-1)

    pairwise_cost = gsum(jnp.where(mask, pp_map, 0.0)) / n_valid_safe
    unary_cost = -gsum(jnp.where(mask, lp_map, 0.0)) / n_valid_safe
    pairwise_cost_nrm = -gsum(
        jnp.where(mask, jnp.log(ppn_map + small_eps), 0.0)) / n_valid_safe
    cost1 = unary_cost + pairwise_cost_nrm
    cost_vec = jnp.stack(
        [pairwise_cost, pairwise_cost_nrm, unary_cost, cost1])
    return posteriors, cost_vec, n_valid


def sufficient_stats(posteriors: jnp.ndarray, img: jnp.ndarray,
                     mask: jnp.ndarray):
    """Masked sufficient statistics (reference `phylo_hmrf.py:311-314`):
    post (K,), obs (K, F), obs2 (K, F, F). Formulated as two matmuls so the
    MXU does the work; the f64 strict-parity mode takes a pinned-order
    row-scan instead (matmul reduction splits follow the backend thread
    pool — see `_pinned_grid_sum`)."""
    K = posteriors.shape[-1]
    F = img.shape[-1]
    if _pinned(posteriors.dtype):
        return _sufficient_stats_pinned(posteriors, img, mask)
    g = jnp.where(mask[..., None], posteriors, 0.0).reshape(-1, K)
    x = img.reshape(-1, F)
    post = jnp.sum(g, axis=0)
    obs = jnp.einsum("nk,nf->kf", g, x,
                     precision=jax.lax.Precision.HIGHEST)
    xx = (x[:, :, None] * x[:, None, :]).reshape(-1, F * F)
    obs2 = jnp.einsum("nk,nq->kq", g, xx,
                      precision=jax.lax.Precision.HIGHEST).reshape(K, F, F)
    return post, obs, obs2


def _sufficient_stats_pinned(posteriors: jnp.ndarray, img: jnp.ndarray,
                             mask: jnp.ndarray):
    """Device-count-invariant f64 stats: per-row (axis=W) reductions are
    per-output-element (sequential in XLA), rows combine in a sequential
    scan — the same fixed-order-accumulation idea as the multi-process
    per-region host sums (`multiproc._global_stats`), one level down."""
    K = posteriors.shape[-1]
    F = img.shape[-1]
    g3 = jnp.where(mask[..., None], posteriors, 0.0)      # (H, W, K)

    def body(carry, gw):
        g_r, x_r = gw                                      # (W, K), (W, F)
        p, o, o2 = carry
        p = p + jnp.sum(g_r, axis=0)
        o = o + jnp.sum(g_r[:, :, None] * x_r[:, None, :], axis=0)
        xx_r = x_r[:, :, None] * x_r[:, None, :]           # (W, F, F)
        o2 = o2 + jnp.sum(g_r[:, :, None, None] * xx_r[:, None], axis=0)
        return (p, o, o2), None

    init = (jnp.zeros((K,), g3.dtype), jnp.zeros((K, F), g3.dtype),
            jnp.zeros((K, F, F), g3.dtype))
    (post, obs, obs2), _ = jax.lax.scan(body, init, (g3, img))
    return post, obs, obs2
