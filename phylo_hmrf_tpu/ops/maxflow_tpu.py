"""Exact s-t min-cut on masked 2D grids — data-parallel push-relabel in JAX.

This is the TPU replacement for the reference's serial Boykov-Kolmogorov
maxflow (`gco_source/maxflow.cpp:472`, the innermost hot loop of the whole
reference program): a Jacobi/lock-free push-relabel over the pixel grid.
Every pixel owns terminal arcs (unary costs), so augmenting paths are a few
pixels long and the sweep count stays small; a periodic global relabel (BFS
toward the sink, run as min-plus sweeps) keeps heights tight.

On top of it, `swap_optimize` runs exact alpha-beta swap — the reference's
E-step optimizer (`GCoptimization.cpp:1338`) — entirely on device: one jitted
`swap_move(labels, a, b)` is reused for every label pair (a, b are traced),
so the whole multi-label optimization is K(K-1)/2 kernel dispatches per
cycle with no host synchronization inside a cycle.

Direction convention: 8 directed neighbor arcs; directions 0..3 are DIRS
(right, down, down-right, down-left), 4..7 their reversals. caps[d, i, j] is
the residual capacity of the arc from (i, j) to its direction-d neighbor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from phylo_hmrf_tpu.data.regions import DIRS
from phylo_hmrf_tpu.ops.potts import _shift_bwd, _shift_fwd

ALL_DIRS = tuple(DIRS) + tuple((-di, -dj) for (di, dj) in DIRS)
_EPS = 1e-6


def _neighbor(x, d, fill):
    """value at the direction-d neighbor of each pixel."""
    di, dj = ALL_DIRS[d]
    if di > 0 or (di == 0 and dj > 0):
        return _shift_fwd(x, di, dj, fill)
    return _shift_bwd(x, -di, -dj, fill)


def _rev(d: int) -> int:
    return (d + 4) % 8


def grid_mincut(excess0: jnp.ndarray, cap_t0: jnp.ndarray,
                caps0: jnp.ndarray, max_sweeps: int = 3000,
                relabel_every: int = 32):
    """Phase-1 push-relabel min-cut.

    excess0 (H, W): source-arc capacities (pre-saturated: excess = cap_s).
    cap_t0 (H, W): sink-arc capacities.
    caps0 (8, H, W): directed neighbor-arc capacities (see ALL_DIRS).

    Returns source_side (H, W) bool: True = pixel on the source side of a
    minimum cut (standard phase-1 invariant: nodes lifted to height >= n are
    disconnected from the sink in the residual graph).
    """
    H, W = excess0.shape
    n = H * W + 2
    h0 = jnp.zeros((H, W), jnp.int32)

    def global_relabel(h, cap_t, caps):
        """BFS distance-to-sink over the residual graph via min-plus sweeps;
        unreachable nodes go to height n."""
        d0 = jnp.where(cap_t > _EPS, 1, n).astype(jnp.int32)

        def sweep(state):
            d, changed, it = state
            best = d
            for dd in range(8):
                nb_d = _neighbor(d, dd, n)
                cand = jnp.where(caps[dd] > _EPS, nb_d + 1, n)
                best = jnp.minimum(best, cand)
            best = jnp.minimum(best, jnp.where(cap_t > _EPS, 1, n))
            best = jnp.minimum(best, n)
            changed = jnp.any(best != d)
            return best, changed, it + 1

        def cond(state):
            _, changed, it = state
            return changed & (it < n)

        d, _, _ = jax.lax.while_loop(cond, sweep, (d0, jnp.bool_(True),
                                                   jnp.int32(0)))
        # heights are valid lower bounds on residual distance, so the exact
        # BFS distance can only lift them; max keeps monotonicity
        return jnp.maximum(h, d)

    def one_iteration(state):
        e, h, cap_t, caps, it = state

        # periodic global relabel
        def with_relabel(args):
            h, cap_t, caps = args
            return global_relabel(h, cap_t, caps)

        h = jax.lax.cond(it % relabel_every == 0, with_relabel,
                         lambda args: args[0], (h, cap_t, caps))

        # push to sink (sink height 0: admissible when h == 1)
        can = (h == 1)
        delta = jnp.where(can, jnp.minimum(e, cap_t), 0.0)
        e = e - delta
        cap_t = cap_t - delta

        # push to neighbors — Jacobi form: all outgoing deltas are computed
        # against the LOCAL excess only (sequential elementwise budget, no
        # neighbor reads between directions), incoming flow lands after the
        # loop. This keeps one whole sweep a radius-1 stencil (the previous
        # eager-incoming form grew the dependency radius by one per
        # direction) and updates the (8, H, W) capacity tensor once instead
        # of 16 scatter-adds.
        outs = []
        for d in range(8):
            nb_h = _neighbor(h, d, -1)
            admissible = (h == nb_h + 1) & (h < n)
            delta = jnp.where(admissible, jnp.minimum(e, caps[d]), 0.0)
            e = e - delta
            outs.append(delta)
        out_stack = jnp.stack(outs)
        # reverse arc of direction d gains the flow its neighbor sent via
        # _rev(d); the same quantity is the excess arriving at each pixel
        inc_stack = jnp.stack([_neighbor(outs[_rev(d)], d, 0.0)
                               for d in range(8)])
        caps = caps - out_stack + inc_stack
        e = e + jnp.sum(inc_stack, axis=0)

        # relabel active nodes with no admissible arcs
        active = (e > _EPS) & (h < n)
        min_h = jnp.where(cap_t > _EPS, 0, n).astype(jnp.int32)
        for d in range(8):
            nb_h = _neighbor(h, d, n)
            min_h = jnp.minimum(min_h, jnp.where(caps[d] > _EPS, nb_h, n))
        new_h = jnp.minimum(min_h + 1, n).astype(jnp.int32)
        # only lift (heights are monotone) and only where no admissible push
        # happened (active nodes whose height is not admissible to any arc)
        h = jnp.where(active, jnp.maximum(h, new_h), h)
        return e, h, cap_t, caps, it + 1

    def cond(state):
        e, h, cap_t, caps, it = state
        return jnp.any((e > _EPS) & (h < n)) & (it < max_sweeps)

    # dtype-preserving: f64 capacities in the strict-parity mode, f32
    # otherwise (the fused-kernel variant below is f32-only)
    dt = (excess0.dtype if jnp.issubdtype(excess0.dtype, jnp.floating)
          else jnp.float32)
    e, h, cap_t, caps, _ = jax.lax.while_loop(
        cond, one_iteration,
        (excess0.astype(dt), h0, cap_t0.astype(dt),
         caps0.astype(dt), jnp.int32(0)))

    # source side = cannot reach the sink in the residual graph
    d = jnp.where(cap_t > _EPS, 1, n).astype(jnp.int32)

    def sweep(state):
        d, changed, it = state
        best = d
        for dd in range(8):
            nb_d = _neighbor(d, dd, n)
            best = jnp.minimum(best, jnp.where(caps[dd] > _EPS, nb_d + 1, n))
        best = jnp.minimum(best, jnp.where(cap_t > _EPS, 1, best))
        changed = jnp.any(best != d)
        return best, changed, it + 1

    d, _, _ = jax.lax.while_loop(lambda s: s[1] & (s[2] < n), sweep,
                                 (d, jnp.bool_(True), jnp.int32(0)))
    return d >= n


def grid_mincut_fused(excess0: jnp.ndarray, cap_t0: jnp.ndarray,
                      caps0: jnp.ndarray, max_sweeps: int = 3000,
                      relabel_every: int = 32,
                      interpret: bool = False):
    """`grid_mincut` with the two stencil hot loops running as
    temporally-blocked Pallas kernels (ops/mincut_pallas.py): 4
    push-relabel iterations or 8 BFS min-plus sweeps per kernel instance
    instead of one XLA-op sweep per loop iteration. Same optimal cut
    (push-relabel is schedule-independent); ~3x fewer HBM round-trips and
    8-32x fewer dispatches on the measured chr22 swap moves.

    Accepts a leading region-batch axis (excess0 (R, H, W), caps0
    (R, 8, H, W)) — the kernels carry the batch in their grid, one dispatch
    chain for a whole same-shape bucket. The batched while_loop runs until
    the LAST region converges (regions share the loop), which is the price
    of one dispatch chain; `_optimize_batched` is the caller that wants
    this trade."""
    from phylo_hmrf_tpu.ops.mincut_pallas import (
        bfs_sweeps_pallas, pr_iterations_pallas)

    if excess0.ndim == 2:
        return grid_mincut_fused(excess0[None], cap_t0[None], caps0[None],
                                 max_sweeps, relabel_every, interpret)[0]
    R, H, W = excess0.shape
    n = H * W + 2
    n_j = jnp.int32(n)

    def bfs_fixpoint(d0, caps):
        def body(state):
            d, _, k = state
            d2 = bfs_sweeps_pallas(d, caps, n_j, n_inner=8,
                                   interpret=interpret)
            return d2, jnp.any(d2 != d), k + 8

        d, _, _ = jax.lax.while_loop(
            lambda s: s[1] & (s[2] < n), body,
            (d0, jnp.bool_(True), jnp.int32(0)))
        return d

    def one_block(state):
        e, h, cap_t, caps, it = state

        def with_relabel(args):
            h, cap_t, caps = args
            d0 = jnp.where(cap_t > _EPS, 1, n).astype(jnp.int32)
            return jnp.maximum(h, bfs_fixpoint(d0, caps))

        h = jax.lax.cond(it % relabel_every == 0, with_relabel,
                         lambda args: args[0], (h, cap_t, caps))
        e, h, cap_t, caps = pr_iterations_pallas(
            e, h, cap_t, caps, n_j, n_inner=4, interpret=interpret)
        return e, h, cap_t, caps, it + 4

    def cond(state):
        e, h, cap_t, caps, it = state
        return jnp.any((e > _EPS) & (h < n)) & (it < max_sweeps)

    h0 = jnp.zeros((R, H, W), jnp.int32)
    e, h, cap_t, caps, _ = jax.lax.while_loop(
        cond, one_block,
        (excess0.astype(jnp.float32), h0, cap_t0.astype(jnp.float32),
         caps0.astype(jnp.float32), jnp.int32(0)))

    # source side = cannot reach the sink in the residual graph
    d0 = jnp.where(cap_t > _EPS, 1, n).astype(jnp.int32)
    return bfs_fixpoint(d0, caps) >= n




def _plane(unary_k: jnp.ndarray, idx) -> jnp.ndarray:
    """unary_k (K, H, W) -> (H, W): the idx-th state's unary plane.

    Moves consume the K-major unary and gather only the planes they touch
    (2 of K for a swap, 1 + a label gather for an expansion) instead of the
    onehot-einsum over the full (H, W, K) tensor — at K=20 this cuts the
    t-link setup's HBM reads 10x and lets one precomputed unary serve every
    move of a labeling pass (VERDICT r2 item 1c)."""
    return jax.lax.dynamic_index_in_dim(unary_k, idx, axis=0, keepdims=False)


def _incident_wsum(wmaps, beta: float):
    """beta * (sum of the edge weights incident to each pixel): the
    maximum possible pairwise-energy DECREASE from relabeling that pixel
    alone. Invalid edges carry weight exactly 0, so masked/border pixels
    contribute nothing."""
    s = jnp.zeros_like(wmaps[0])
    for d in range(4):
        di, dj = ALL_DIRS[d]
        s = s + wmaps[d] + _shift_bwd(wmaps[d], di, dj, 0.0)
    return beta * s


# (R, 4, H, W) -> (R, H, W), jitted once: `_optimize_batched` hoists the
# incident sums out of its per-move dispatch loop (they depend only on the
# weight maps and beta, constant across all moves and cycles of a pass)
_WSUM_BATCH = jax.jit(jax.vmap(_incident_wsum, in_axes=(0, None)))


def _swap_graph(labels, unary_k, wmaps, mask, a, b, beta: float,
                wsum=None):
    """Binary min-cut graph of one alpha-beta swap move (single region):
    returns (excess0, cap_t0, caps0, in_play). Pure jnp — safe to vmap
    over a region batch (the cut itself is dispatched separately so the
    Pallas kernels can carry the batch in their grid).

    Dominance (persistency) freezing: a pixel whose unary margin for its
    CURRENT label strictly beats the total incident pairwise weight keeps
    that label in every optimal move solution (flipping it back would
    strictly improve regardless of its neighbors' assignment — the
    dead-end-elimination argument applies pixel-independently), so it is
    removed from the cut and handled as a frozen neighbor. On
    near-converged labelings this shrinks the active cut to the contested
    boundary pixels and push-relabel converges in a handful of sweeps."""
    in_play = ((labels == a) | (labels == b)) & mask
    u_a = _plane(unary_k, a)
    u_b = _plane(unary_k, b)

    if wsum is None:   # depends only on (wmaps, beta): hoistable per pass
        wsum = _incident_wsum(wmaps, beta)
    keep_a = (labels == a) & ((u_b - u_a) > wsum)
    keep_b = (labels == b) & ((u_a - u_b) > wsum)
    in_play = in_play & ~keep_a & ~keep_b

    # t-links: c0 = cost(label a), c1 = cost(label b), including frozen
    # neighbors (labels not in {a, b} or dominance-frozen) as unary shifts
    c0 = jnp.where(in_play, u_a, 0.0)
    c1 = jnp.where(in_play, u_b, 0.0)
    for d in range(4):
        di, dj = ALL_DIRS[d]
        w = wmaps[d]
        for fwd in (True, False):
            if fwd:
                nb_lab = _shift_fwd(labels, di, dj, -1)
                nb_play = _shift_fwd(in_play, di, dj, False)
                w_e = w
            else:
                nb_lab = _shift_bwd(labels, di, dj, -1)
                nb_play = _shift_bwd(in_play, di, dj, False)
                w_e = _shift_bwd(w, di, dj, 0.0)
            frozen = (~nb_play) & (nb_lab >= 0)
            add = jnp.where(frozen, w_e, 0.0) * beta
            c0 = c0 + jnp.where(nb_lab != a, add, 0.0)
            c1 = c1 + jnp.where(nb_lab != b, add, 0.0)

    diff = jnp.where(in_play, c1 - c0, 0.0)
    excess0 = jnp.maximum(diff, 0.0)          # S -> p arcs (cut => label b)
    cap_t0 = jnp.maximum(-diff, 0.0)          # p -> T arcs (cut => label a)

    # pairwise Potts arcs between in-play neighbors: undirected beta * w
    caps0 = jnp.zeros((8,) + labels.shape, unary_k.dtype)
    for d in range(4):
        di, dj = ALL_DIRS[d]
        nb_play = _shift_fwd(in_play, di, dj, False)
        lam = jnp.where(in_play & nb_play, wmaps[d] * beta, 0.0)
        caps0 = caps0.at[d].add(lam)
        caps0 = caps0.at[_rev(d)].add(_neighbor(lam, _rev(d), 0.0))
    return excess0, cap_t0, caps0, in_play


def swap_move(labels: jnp.ndarray, unary_k: jnp.ndarray, wmaps: jnp.ndarray,
              mask: jnp.ndarray, a, b, beta: float,
              max_sweeps: int = 3000, relabel_every: int = 32,
              use_pallas: bool = False):
    """One exact alpha-beta swap move: pixels labeled a or b may exchange
    labels; solved as a binary min-cut (source side = label a).

    unary_k is the K-major (K, H, W) unary field. a, b are traced scalars,
    so one compiled function serves every pair. ``use_pallas`` routes the
    min-cut through the temporally-blocked kernels (TPU; same optimal cut).
    Returns (new_labels, n_changed) — the change count feeds the GCO-style
    pair pruning in `_optimize_batched`.
    """
    excess0, cap_t0, caps0, in_play = _swap_graph(
        labels, unary_k, wmaps, mask, a, b, beta)
    cut = grid_mincut_fused if use_pallas else grid_mincut
    source_side = cut(excess0, cap_t0, caps0, max_sweeps, relabel_every)
    new_labels = jnp.where(source_side, a, b).astype(labels.dtype)
    new_labels = jnp.where(in_play, new_labels, labels)
    n_changed = jnp.sum((new_labels != labels).astype(jnp.int32))
    return new_labels, n_changed


def _expansion_graph(labels, unary_k, wmaps, mask, alpha, beta: float,
                     wsum=None):
    """Binary min-cut graph of one alpha-expansion move (single region,
    Kolmogorov-Zabih reduction — see `expansion_move`): returns
    (excess0, cap_t0, caps0, in_play). Pure jnp, vmap-safe."""
    alpha = jnp.asarray(alpha, labels.dtype)
    is_alpha = mask & (labels == alpha)
    in_play = mask & (labels != alpha)
    u_alpha = _plane(unary_k, alpha)
    u_cur = jnp.take_along_axis(unary_k, labels[None].astype(jnp.int32),
                                axis=0)[0]

    # dominance (persistency) freezing — see `_swap_graph`: a pixel whose
    # alpha-margin strictly beats its total incident pairwise weight keeps
    # its label in every optimal expansion; it becomes a frozen neighbor
    if wsum is None:   # depends only on (wmaps, beta): hoistable per pass
        wsum = _incident_wsum(wmaps, beta)
    in_play = in_play & ~((u_alpha - u_cur) > wsum)
    # masked-in pixels excluded from the cut but not labeled alpha: their
    # edges contribute constant shifts (before freezing this class only
    # held weight-0 edges, so the terms below were vacuous)
    frozen_cur = mask & (labels != alpha) & ~in_play

    c0 = jnp.where(in_play, u_cur, 0.0)     # keep current label
    c1 = jnp.where(in_play, u_alpha, 0.0)   # take alpha
    caps0 = jnp.zeros((8,) + labels.shape, unary_k.dtype)
    for d in range(4):
        di, dj = ALL_DIRS[d]
        lam = wmaps[d] * beta                       # edge p -> d-neighbor q
        nb_lab = _shift_fwd(labels, di, dj, -1)
        nb_play = _shift_fwd(in_play, di, dj, False)
        nb_alpha = _shift_fwd(is_alpha, di, dj, False)
        nb_froz = _shift_fwd(frozen_cur, di, dj, False)
        both = in_play & nb_play
        same = nb_lab == labels
        c1 = c1 + jnp.where(both & same, lam, 0.0)
        # the q-side unary shift (D - C = -lam) lives at the neighbor pixel
        shift_q = jnp.where(both, lam, 0.0)
        c1 = c1 - _neighbor(shift_q, _rev(d), 0.0)
        caps0 = caps0.at[d].add(
            jnp.where(both, jnp.where(same, 2.0 * lam, lam), 0.0))
        # neighbor frozen at alpha: p pays lam iff it keeps (l_p != alpha)
        c0 = c0 + jnp.where(in_play & nb_alpha, lam, 0.0)
        # p frozen at alpha with movable q: q pays lam iff it keeps
        pen_q = jnp.where(is_alpha & nb_play, lam, 0.0)
        c0 = c0 + _neighbor(pen_q, _rev(d), 0.0)
        # neighbor frozen at its current (non-alpha) label l_q: p pays lam
        # if it takes alpha (alpha != l_q always), and lam*[l_p != l_q]
        # if it keeps
        c1 = c1 + jnp.where(in_play & nb_froz, lam, 0.0)
        c0 = c0 + jnp.where(in_play & nb_froz & ~same, lam, 0.0)
        # p frozen at current with movable q (mirror of the above at q)
        q_c1 = jnp.where(frozen_cur & nb_play, lam, 0.0)
        c1 = c1 + _neighbor(q_c1, _rev(d), 0.0)
        q_c0 = jnp.where(frozen_cur & nb_play & ~same, lam, 0.0)
        c0 = c0 + _neighbor(q_c0, _rev(d), 0.0)

    diff = jnp.where(in_play, c1 - c0, 0.0)
    excess0 = jnp.maximum(diff, 0.0)          # S -> p (cut => take alpha)
    cap_t0 = jnp.maximum(-diff, 0.0)          # p -> T (cut => keep)
    return excess0, cap_t0, caps0, in_play


def expansion_move(labels: jnp.ndarray, unary_k: jnp.ndarray,
                   wmaps: jnp.ndarray, mask: jnp.ndarray, alpha,
                   beta: float, max_sweeps: int = 3000,
                   relabel_every: int = 32,
                   use_pallas: bool = False):
    """One exact alpha-expansion move: every pixel may switch to ``alpha``
    (reference ships expansion in GCO, `gco_source/GCoptimization.cpp:965`).

    Binary variable x per movable pixel (label != alpha): 0 = keep, 1 = take
    alpha; solved as one grid min-cut (source side = keep). For weighted
    Potts the move energy is submodular, so the Kolmogorov-Zabih reduction
    applies: edge (p,q), lam = beta*w, both movable =>
      c1_p += lam*[l_p == l_q]          (C - A)
      c1_q -= lam                       (D - C)
      directed arc p->q with capacity lam*(2 - [l_p != l_q])   (B+C-A-D)
    and a neighbor frozen at alpha shifts c0 by lam. ``alpha`` is a traced
    scalar, so one compiled function serves every label. unary_k is the
    K-major (K, H, W) unary. Returns (new_labels, n_changed).
    """
    alpha = jnp.asarray(alpha, labels.dtype)
    excess0, cap_t0, caps0, in_play = _expansion_graph(
        labels, unary_k, wmaps, mask, alpha, beta)
    cut = grid_mincut_fused if use_pallas else grid_mincut
    source_side = cut(excess0, cap_t0, caps0, max_sweeps, relabel_every)
    new_labels = jnp.where(source_side, labels, alpha).astype(labels.dtype)
    new_labels = jnp.where(in_play, new_labels, labels)
    n_changed = jnp.sum((new_labels != labels).astype(jnp.int32))
    return new_labels, n_changed


# ---------------------------------------------------------------------------
# module-level jitted entry points, batched over a leading region axis.
# Everything is traced (labels, unary, a/b/alpha, beta), so one compiled
# kernel per bucket shape serves every move of every cycle of every EM
# iteration.
# ---------------------------------------------------------------------------

def _cut_batch(excess0, cap_t0, caps0, max_sweeps, relabel_every,
               use_pallas):
    """Batched min-cut (R, H, W): one natively-batched fused dispatch
    chain on TPU (the Pallas kernels carry R in their grid — vmapping the
    manual-DMA pallas_call cannot lower), vmapped XLA loops elsewhere."""
    if use_pallas:
        return grid_mincut_fused(excess0, cap_t0, caps0, max_sweeps,
                                 relabel_every)
    return jax.vmap(lambda e, t, c: grid_mincut(
        e, t, c, max_sweeps, relabel_every))(excess0, cap_t0, caps0)


@functools.partial(jax.jit, static_argnames=("max_sweeps", "relabel_every",
                                             "use_pallas"))
def _swap_move_batch(labels, unary_k, wmaps, mask, a, b, beta, wsum, *,
                     max_sweeps: int, relabel_every: int = 32,
                     use_pallas: bool = False):
    """Swap move over a region batch: labels (R, H, W), unary_k
    (R, K, H, W), wmaps (R, 4, H, W), mask (R, H, W); one (a, b) pair for
    the whole batch (regions share the pair schedule, VERDICT r2 item 6).
    ``wsum`` is the precomputed incident-weight sum (R, H, W) — constant
    across every move of a labeling pass, so the caller hoists it instead
    of re-reading the full weight maps per dispatch.
    Returns (labels (R, H, W), n_changed (R,))."""
    excess0, cap_t0, caps0, in_play = jax.vmap(
        lambda l, u, w, m, s: _swap_graph(l, u, w, m, a, b, beta, s))(
            labels, unary_k, wmaps, mask, wsum)
    side = _cut_batch(excess0, cap_t0, caps0, max_sweeps, relabel_every,
                      use_pallas)
    new_labels = jnp.where(side, a, b).astype(labels.dtype)
    new_labels = jnp.where(in_play, new_labels, labels)
    n_changed = jnp.sum(new_labels != labels, dtype=jnp.int32,
                        axis=(1, 2))
    return new_labels, n_changed


@functools.partial(jax.jit, static_argnames=("max_sweeps", "relabel_every",
                                             "use_pallas"))
def _expansion_move_batch(labels, unary_k, wmaps, mask, alpha, beta, wsum,
                          *, max_sweeps: int, relabel_every: int = 32,
                          use_pallas: bool = False):
    alpha = jnp.asarray(alpha, labels.dtype)
    excess0, cap_t0, caps0, in_play = jax.vmap(
        lambda l, u, w, m, s: _expansion_graph(l, u, w, m, alpha, beta, s))(
            labels, unary_k, wmaps, mask, wsum)
    side = _cut_batch(excess0, cap_t0, caps0, max_sweeps, relabel_every,
                      use_pallas)
    new_labels = jnp.where(side, labels, alpha).astype(labels.dtype)
    new_labels = jnp.where(in_play, new_labels, labels)
    n_changed = jnp.sum(new_labels != labels, dtype=jnp.int32,
                        axis=(1, 2))
    return new_labels, n_changed


@functools.partial(jax.jit, static_argnames=("n_states",))
def _energy_hist(labels, unary_k, wmaps, mask, beta, *, n_states: int):
    """Per-region MRF energy (R,) + label histogram (n_states,) summed over
    the batch, from the K-major unary (same values as ops.potts.potts_energy
    — the invalid-edge weights are 0, so border fills never contribute)."""
    from phylo_hmrf_tpu.ops.potts import _pinned, _pinned_grid_sum
    gsum = _pinned_grid_sum if _pinned(unary_k.dtype) else jnp.sum

    def one(l, u, w, m):
        u_cur = jnp.take_along_axis(u, l[None].astype(jnp.int32), axis=0)[0]
        e = gsum(jnp.where(m, u_cur, 0.0))
        for d, (di, dj) in enumerate(DIRS):
            nb = _shift_fwd(l, di, dj, -1)
            e = e + beta * gsum(w[d] * (l != nb).astype(u.dtype))
        hist = jnp.zeros((n_states,), jnp.int32).at[l].add(
            m.astype(jnp.int32), mode="drop")
        return e, hist

    e, hist = jax.vmap(one)(labels, unary_k, wmaps, mask)
    return e, hist.sum(0)


def _auto_pallas(use_pallas) -> bool:
    """"auto" => fused min-cut kernels on TPU, plain jnp elsewhere."""
    if use_pallas == "auto":
        return jax.default_backend() == "tpu"
    return bool(use_pallas)


def _optimize_batched(unary_k: jnp.ndarray, wmaps: jnp.ndarray,
                      mask: jnp.ndarray, init_labels: jnp.ndarray,
                      beta: float, n_states: int, method: str,
                      max_cycles: int, max_sweeps: int = 3000,
                      tol: float = 1e-6, use_pallas="auto") -> jnp.ndarray:
    """Exact move-making over a batch of same-shape regions — the multi-
    label optimizer behind `swap_optimize` / `expansion_optimize` /
    `exact_labels_batched`.

    Replaces the reference's serial GCO cycle loop
    (`gco_source/GCoptimization.cpp:1282-1336`) with sequential on-device
    move dispatches (asynchronously pipelined; host syncs only at cycle
    boundaries) and ports its pruning idea: a move is skipped when none of
    the labels it depends on changed since the move last ran. For swap
    moves that is the pair (a, b); for expansion moves any label change
    matters (every pixel may switch to alpha). Change counts come back
    from the device once per cycle, so the pruning decisions for cycle
    N+1 use actual counts from cycles <= N and optimistic (assume-changed)
    marks for moves of the current cycle. The pruning is GCO's heuristic:
    a frozen-neighbor relabel (c -> d) does not mark (a, b) dirty; the
    per-cycle energy convergence check bounds any residual gap, and the
    real-data gates (<=0.1% energy, >=99% agreement vs the 5000-cycle C++
    oracle) hold with it on (tests/test_real_data.py).
    """
    # beta at the unary's precision: the f64 strict-parity mode must not
    # round cut capacities through f32 (betas like 0.1 are not
    # f32-representable and would fork the energy from the f64 oracle)
    beta_j = jnp.asarray(beta, unary_k.dtype)
    up = _auto_pallas(use_pallas)
    # incident-weight sums depend only on (wmaps, beta): one dispatch for
    # the whole pass instead of one rebuild inside every move
    wsum_b = _WSUM_BATCH(wmaps, beta_j)
    labels = jnp.where(mask, init_labels, 0).astype(jnp.int32)
    e, hist_j = _energy_hist(labels, unary_k, wmaps, mask, beta_j,
                             n_states=n_states)
    prev_e = float(np.asarray(e).sum())
    hist = np.asarray(hist_j)

    if method == "expansion":
        moves = [(a,) for a in range(n_states)]
    else:
        moves = [(a, b) for a in range(n_states)
                 for b in range(a + 1, n_states)]

    last_run = {}        # move -> global move counter at last execution
    changed_actual = {}  # label (or "any") -> counter of last real change
    t = 0
    for _ in range(max_cycles):
        maybe = hist > 0
        changed_opt = dict(changed_actual)
        pending = []     # (move, counter, n_changed device scalar (R,))
        for mv in moves:
            lr = last_run.get(mv)
            if method == "expansion":
                if lr is not None and changed_opt.get("any", -1) <= lr:
                    continue
                labels, nch = _expansion_move_batch(
                    labels, unary_k, wmaps, mask, jnp.int32(mv[0]), beta_j,
                    wsum_b, max_sweeps=max_sweeps, use_pallas=up)
                changed_opt["any"] = t
            else:
                a, b = mv
                # a pair is skippable while BOTH labels are provably empty;
                # an executed move may repopulate either, so mark both
                if not (maybe[a] or maybe[b]):
                    continue
                if lr is not None and changed_opt.get(a, -1) <= lr \
                        and changed_opt.get(b, -1) <= lr:
                    continue
                labels, nch = _swap_move_batch(
                    labels, unary_k, wmaps, mask, jnp.int32(a),
                    jnp.int32(b), beta_j, wsum_b, max_sweeps=max_sweeps,
                    use_pallas=up)
                changed_opt[a] = changed_opt[b] = t
                maybe[a] = maybe[b] = True
            last_run[mv] = t
            pending.append((mv, t, nch))
            t += 1
        if not pending:
            break

        # one host sync per cycle: change counts, energies, histogram
        e, hist_j = _energy_hist(labels, unary_k, wmaps, mask, beta_j,
                                 n_states=n_states)
        nch_all = np.asarray(jnp.stack([p[2] for p in pending]))
        hist = np.asarray(hist_j)
        e_now = float(np.asarray(e).sum())
        total_changed = 0
        for (mv, tt, _), n in zip(pending, nch_all):
            n_tot = int(n.sum())
            total_changed += n_tot
            if n_tot > 0:
                for lab in (mv if method != "expansion" else ("any",)):
                    changed_actual[lab] = max(
                        changed_actual.get(lab, -1), tt)
        if total_changed == 0:
            break
        if prev_e - e_now <= tol * max(1.0, abs(prev_e)):
            break
        prev_e = e_now
    return labels


def swap_optimize(unary: jnp.ndarray, wmaps: jnp.ndarray, mask: jnp.ndarray,
                  init_labels: jnp.ndarray, beta: float, n_states: int,
                  max_cycles: int = 10, max_sweeps: int = 3000,
                  tol: float = 1e-6, use_pallas="auto") -> jnp.ndarray:
    """Exact alpha-beta swap on device (single region, state-minor
    (H, W, K) unary — see `_optimize_batched` for the engine)."""
    return _optimize_batched(
        jnp.transpose(unary, (2, 0, 1))[None], wmaps[None], mask[None],
        init_labels[None], beta, n_states, "swap", max_cycles, max_sweeps,
        tol, use_pallas)[0]


def expansion_optimize(unary: jnp.ndarray, wmaps: jnp.ndarray,
                       mask: jnp.ndarray, init_labels: jnp.ndarray,
                       beta: float, n_states: int, max_cycles: int = 10,
                       max_sweeps: int = 3000, tol: float = 1e-6,
                       use_pallas="auto") -> jnp.ndarray:
    """Exact alpha-expansion on device (single region, state-minor
    (H, W, K) unary — see `_optimize_batched` for the engine)."""
    return _optimize_batched(
        jnp.transpose(unary, (2, 0, 1))[None], wmaps[None], mask[None],
        init_labels[None], beta, n_states, "expansion", max_cycles,
        max_sweeps, tol, use_pallas)[0]


@functools.partial(jax.jit, static_argnames=("icm_max_sweeps",))
def _start_batch(unary_k, wmaps, mask, warm, beta, *, icm_max_sweeps: int):
    """Batched labeling start: annealed mean field proposes, checkerboard
    ICM polishes both the proposal and the warm start, lower energy wins
    (jnp path; state-minor transpose happens once here)."""
    from phylo_hmrf_tpu.ops.icm import icm_with_energy, mean_field

    unary = jnp.transpose(unary_k, (0, 2, 3, 1))

    def one(u, w, m, wr):
        mf = mean_field(u, w, beta)
        cand_a, e_a = icm_with_energy(u, w, m, mf, beta, icm_max_sweeps)
        cand_b, e_b = icm_with_energy(u, w, m, wr, beta, icm_max_sweeps)
        return jnp.where(e_a <= e_b, cand_a, cand_b)

    return jax.vmap(one)(unary, wmaps, mask, warm)


@functools.partial(jax.jit, static_argnames=("icm_max_sweeps",))
def _start_batch_pallas(unary_k, wmaps, mask, warm, beta, *,
                        icm_max_sweeps: int):
    """`_start_batch` on the fused K-major Pallas kernels (TPU)."""
    from phylo_hmrf_tpu.ops.finish_pallas import potts_energy_pallas
    from phylo_hmrf_tpu.ops.icm_pallas import icm_pallas
    from phylo_hmrf_tpu.ops.mf_pallas import mean_field_pallas_kmajor

    mf = mean_field_pallas_kmajor(unary_k, wmaps, beta)
    cand_a = icm_pallas(None, wmaps, mask, mf, beta, icm_max_sweeps,
                        unary_k=unary_k)
    cand_b = icm_pallas(None, wmaps, mask, warm, beta, icm_max_sweeps,
                        unary_k=unary_k)
    mask_i = mask.astype(jnp.int32)
    e_a = potts_energy_pallas(unary_k, mask_i, cand_a, wmaps, beta)
    e_b = potts_energy_pallas(unary_k, mask_i, cand_b, wmaps, beta)
    return jnp.where((e_a <= e_b)[:, None, None], cand_a, cand_b)


def exact_labels_batched(unary_k: jnp.ndarray, wmaps: jnp.ndarray,
                         mask: jnp.ndarray, warm: jnp.ndarray, beta: float,
                         n_states: int, max_cycles: int = 2,
                         icm_max_sweeps: int = 60, method: str = "swap",
                         max_sweeps: int = 3000, tol: float = 1e-6,
                         use_pallas="auto") -> jnp.ndarray:
    """Full-quality labeling over a batch of same-shape regions: annealed
    mean field + ICM proposes, exact on-device graph-cut move-making
    finishes (``method``: "swap" matches the reference's E-step, pygco swap
    at phylo_hmrf.py:496; "expansion" is the GCO alpha-expansion it also
    ships, GCoptimization.cpp:965). unary_k is K-major (R, K, H, W) — the
    layout `gaussian_logpdf_kmajor` emits and every kernel here consumes."""
    up = _auto_pallas(use_pallas)
    beta_j = jnp.asarray(beta, unary_k.dtype)
    start_fn = _start_batch_pallas if up else _start_batch
    start = start_fn(unary_k, wmaps, mask, warm, beta_j,
                     icm_max_sweeps=icm_max_sweeps)
    return _optimize_batched(unary_k, wmaps, mask, start, beta, n_states,
                             method, max_cycles, max_sweeps, tol, up)


def exact_labels(unary: jnp.ndarray, wmaps: jnp.ndarray, mask: jnp.ndarray,
                 warm: jnp.ndarray, beta: float, n_states: int,
                 max_cycles: int = 2, icm_max_sweeps: int = 60,
                 method: str = "swap", use_pallas="auto") -> jnp.ndarray:
    """Single-region `exact_labels_batched` with a state-minor (H, W, K)
    unary (the flat-sample layout tests and callers hold)."""
    return exact_labels_batched(
        jnp.transpose(unary, (2, 0, 1))[None], wmaps[None], mask[None],
        warm[None], beta, n_states, max_cycles, icm_max_sweeps, method,
        use_pallas=use_pallas)[0]
