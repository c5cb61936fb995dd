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

    e, h, cap_t, caps, _ = jax.lax.while_loop(
        cond, one_iteration,
        (excess0.astype(jnp.float32), h0, cap_t0.astype(jnp.float32),
         caps0.astype(jnp.float32), jnp.int32(0)))

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
    8-32x fewer dispatches on the measured chr22 swap moves."""
    from phylo_hmrf_tpu.ops.mincut_pallas import (
        bfs_sweeps_pallas, pr_iterations_pallas)

    H, W = excess0.shape
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

    h0 = jnp.zeros((H, W), jnp.int32)
    e, h, cap_t, caps, _ = jax.lax.while_loop(
        cond, one_block,
        (excess0.astype(jnp.float32), h0, cap_t0.astype(jnp.float32),
         caps0.astype(jnp.float32), jnp.int32(0)))

    # source side = cannot reach the sink in the residual graph
    d0 = jnp.where(cap_t > _EPS, 1, n).astype(jnp.int32)
    return bfs_fixpoint(d0, caps) >= n


def swap_move(labels: jnp.ndarray, unary: jnp.ndarray, wmaps: jnp.ndarray,
              mask: jnp.ndarray, a, b, beta: float,
              max_sweeps: int = 3000, relabel_every: int = 32,
              use_pallas: bool = False) -> jnp.ndarray:
    """One exact alpha-beta swap move: pixels labeled a or b may exchange
    labels; solved as a binary min-cut (source side = label a).

    a, b are traced scalars, so one compiled function serves every pair.
    ``use_pallas`` routes the min-cut through the temporally-blocked
    kernels (TPU; same optimal cut).
    """
    K = unary.shape[-1]
    in_play = ((labels == a) | (labels == b)) & mask
    onehot_a = jax.nn.one_hot(a, K, dtype=unary.dtype)
    onehot_b = jax.nn.one_hot(b, K, dtype=unary.dtype)
    u_a = jnp.einsum("hwk,k->hw", unary, onehot_a)
    u_b = jnp.einsum("hwk,k->hw", unary, onehot_b)

    # t-links: c0 = cost(label a), c1 = cost(label b), including frozen
    # neighbors (labels not in {a, b}) as unary shifts
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
    caps0 = jnp.zeros((8,) + labels.shape, unary.dtype)
    for d in range(4):
        di, dj = ALL_DIRS[d]
        nb_play = _shift_fwd(in_play, di, dj, False)
        lam = jnp.where(in_play & nb_play, wmaps[d] * beta, 0.0)
        caps0 = caps0.at[d].add(lam)
        caps0 = caps0.at[_rev(d)].add(_neighbor(lam, _rev(d), 0.0))

    cut = grid_mincut_fused if use_pallas else grid_mincut
    source_side = cut(excess0, cap_t0, caps0, max_sweeps, relabel_every)
    new_labels = jnp.where(source_side, a, b).astype(labels.dtype)
    return jnp.where(in_play, new_labels, labels)


def expansion_move(labels: jnp.ndarray, unary: jnp.ndarray,
                   wmaps: jnp.ndarray, mask: jnp.ndarray, alpha,
                   beta: float, max_sweeps: int = 3000,
                   relabel_every: int = 32,
                   use_pallas: bool = False) -> jnp.ndarray:
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
    scalar, so one compiled function serves every label.
    """
    K = unary.shape[-1]
    alpha = jnp.asarray(alpha, labels.dtype)
    is_alpha = mask & (labels == alpha)
    in_play = mask & (labels != alpha)
    onehot_a = jax.nn.one_hot(alpha, K, dtype=unary.dtype)
    onehot_cur = jax.nn.one_hot(labels, K, dtype=unary.dtype)
    u_alpha = jnp.einsum("hwk,k->hw", unary, onehot_a)
    u_cur = jnp.einsum("hwk,hwk->hw", unary, onehot_cur)

    c0 = jnp.where(in_play, u_cur, 0.0)     # keep current label
    c1 = jnp.where(in_play, u_alpha, 0.0)   # take alpha
    caps0 = jnp.zeros((8,) + labels.shape, unary.dtype)
    for d in range(4):
        di, dj = ALL_DIRS[d]
        lam = wmaps[d] * beta                       # edge p -> d-neighbor q
        nb_lab = _shift_fwd(labels, di, dj, -1)
        nb_play = _shift_fwd(in_play, di, dj, False)
        nb_alpha = _shift_fwd(is_alpha, di, dj, False)
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

    diff = jnp.where(in_play, c1 - c0, 0.0)
    excess0 = jnp.maximum(diff, 0.0)          # S -> p (cut => take alpha)
    cap_t0 = jnp.maximum(-diff, 0.0)          # p -> T (cut => keep)
    cut = grid_mincut_fused if use_pallas else grid_mincut
    source_side = cut(excess0, cap_t0, caps0, max_sweeps, relabel_every)
    new_labels = jnp.where(source_side, labels, alpha).astype(labels.dtype)
    return jnp.where(in_play, new_labels, labels)


def _auto_pallas(use_pallas) -> bool:
    """"auto" => fused min-cut kernels on TPU, plain jnp elsewhere."""
    if use_pallas == "auto":
        return jax.default_backend() == "tpu"
    return bool(use_pallas)


def expansion_optimize(unary: jnp.ndarray, wmaps: jnp.ndarray,
                       mask: jnp.ndarray, init_labels: jnp.ndarray,
                       beta: float, n_states: int, max_cycles: int = 10,
                       max_sweeps: int = 3000, tol: float = 1e-6,
                       use_pallas="auto") -> jnp.ndarray:
    """Exact alpha-expansion on device: host loop over cycles, one jitted
    expansion_move per label (alpha traced => K dispatches per cycle)."""
    from phylo_hmrf_tpu.ops.potts import potts_energy

    energy = jax.jit(functools.partial(potts_energy, beta=beta))
    move = jax.jit(functools.partial(expansion_move, beta=beta,
                                     max_sweeps=max_sweeps,
                                     use_pallas=_auto_pallas(use_pallas)))
    labels = jnp.where(mask, init_labels, 0).astype(jnp.int32)
    prev_e = float(energy(labels, unary, wmaps, mask))
    for _ in range(max_cycles):
        for a in range(n_states):
            labels = move(labels, unary, wmaps, mask, jnp.int32(a))
        e = float(energy(labels, unary, wmaps, mask))
        if prev_e - e <= tol * max(1.0, abs(prev_e)):
            break
        prev_e = e
    return labels


def exact_labels(unary: jnp.ndarray, wmaps: jnp.ndarray, mask: jnp.ndarray,
                 warm: jnp.ndarray, beta: float, n_states: int,
                 max_cycles: int = 2, icm_max_sweeps: int = 60,
                 method: str = "swap") -> jnp.ndarray:
    """Full-quality labeling: annealed mean field + ICM proposes, exact
    on-device graph-cut move-making finishes (``method``: "swap" matches the
    reference's E-step, pygco swap at phylo_hmrf.py:496; "expansion" is the
    GCO alpha-expansion it also ships, GCoptimization.cpp:965)."""
    from phylo_hmrf_tpu.ops.icm import icm_with_energy, mean_field

    mf = mean_field(unary, wmaps, beta)
    cand_a, e_a = icm_with_energy(unary, wmaps, mask, mf, beta,
                                  icm_max_sweeps)
    cand_b, e_b = icm_with_energy(unary, wmaps, mask, warm, beta,
                                  icm_max_sweeps)
    start = jnp.where(e_a <= e_b, cand_a, cand_b)
    if method == "expansion":
        return expansion_optimize(unary, wmaps, mask, start, beta, n_states,
                                  max_cycles=max_cycles)
    return swap_optimize(unary, wmaps, mask, start, beta, n_states,
                         max_cycles=max_cycles)


def round_robin_pairs(n: int):
    """Tournament schedule: n-1 (or n) rounds of floor(n/2) disjoint pairs
    covering every unordered pair exactly once. Disjoint pairs within a
    round touch disjoint label sets, so their swap moves commute and can be
    solved as one batched min-cut."""
    players = list(range(n)) + ([None] if n % 2 else [])
    m = len(players)
    rounds = []
    for _ in range(m - 1):
        rnd = []
        for i in range(m // 2):
            a, b = players[i], players[m - 1 - i]
            if a is not None and b is not None:
                rnd.append((min(a, b), max(a, b)))
        rounds.append(rnd)
        players = [players[0]] + [players[-1]] + players[1:-1]
    return rounds


def _swap_moves_batched(labels, unary, wmaps, mask, pairs_a, pairs_b, *,
                        beta: float, max_sweeps: int):
    """Apply a round of disjoint swap moves as one vmapped min-cut batch.
    pairs_a/pairs_b: (P,) label indices; the moves touch disjoint pixels."""
    def one(a, b):
        return swap_move(labels, unary, wmaps, mask, a, b, beta, max_sweeps)

    out = jax.vmap(one)(pairs_a, pairs_b)     # (P, H, W)
    # each pixel changed by at most one move (labels are disjoint):
    # fold the batch back by taking any changed value
    changed = out != labels[None]
    pick = jnp.argmax(changed, axis=0)
    merged = jnp.take_along_axis(out, pick[None], axis=0)[0]
    any_changed = jnp.any(changed, axis=0)
    return jnp.where(any_changed, merged, labels)


def swap_optimize(unary: jnp.ndarray, wmaps: jnp.ndarray, mask: jnp.ndarray,
                  init_labels: jnp.ndarray, beta: float, n_states: int,
                  max_cycles: int = 10, max_sweeps: int = 3000,
                  tol: float = 1e-6, batch_pairs: bool = False,
                  use_pallas="auto") -> jnp.ndarray:
    """Exact alpha-beta swap on device. Host loop over cycles (one energy
    fetch per cycle decides convergence).

    batch_pairs=True solves each round-robin round of disjoint pairs as one
    vmapped min-cut batch — fewer dispatches but the straggler pair gates
    every sweep (vmapped while_loops run to the slowest element). Measured
    on real chr22: ~3x slower than sequential at K=5 and 18x slower at K=20
    (12 s vs 227 s, 4 cycles) — sequential dispatch is asynchronously
    pipelined, so dispatch latency never dominates in practice. Kept only
    as a reference implementation."""
    from phylo_hmrf_tpu.ops.potts import potts_energy

    energy = jax.jit(functools.partial(potts_energy, beta=beta))
    labels = jnp.where(mask, init_labels, 0).astype(jnp.int32)
    prev_e = float(energy(labels, unary, wmaps, mask))

    if batch_pairs and n_states >= 3:
        rounds = round_robin_pairs(n_states)
        batched = jax.jit(functools.partial(
            _swap_moves_batched, beta=beta, max_sweeps=max_sweeps))
        for _ in range(max_cycles):
            for rnd in rounds:
                pa = jnp.asarray([p[0] for p in rnd], jnp.int32)
                pb = jnp.asarray([p[1] for p in rnd], jnp.int32)
                labels = batched(labels, unary, wmaps, mask, pa, pb)
            e = float(energy(labels, unary, wmaps, mask))
            if prev_e - e <= tol * max(1.0, abs(prev_e)):
                break
            prev_e = e
        return labels

    move = jax.jit(functools.partial(swap_move, beta=beta,
                                     max_sweeps=max_sweeps,
                                     use_pallas=_auto_pallas(use_pallas)))
    for _ in range(max_cycles):
        hist = np.bincount(
            np.asarray(jnp.where(mask, labels, n_states)).ravel(),
            minlength=n_states + 1)[:n_states]
        # a pair is skippable only while BOTH labels are provably empty; a
        # label can only gain pixels from a move it participates in, so any
        # executed move(a,b) marks both labels possibly-non-empty for the
        # rest of the cycle (no per-pair device fetch needed)
        maybe = hist > 0
        for a in range(n_states):
            for b in range(a + 1, n_states):
                if not (maybe[a] or maybe[b]):
                    continue
                labels = move(labels, unary, wmaps, mask,
                              jnp.int32(a), jnp.int32(b))
                maybe[a] = maybe[b] = True
        e = float(energy(labels, unary, wmaps, mask))
        if prev_e - e <= tol * max(1.0, abs(prev_e)):
            break
        prev_e = e
    return labels
