"""Spatial (row-sharded) E-step with halo exchange — grid "context
parallelism".

Region-granular sharding (parallel/sharding.py) cannot help when one region
dominates (e.g. a whole chromosome at 10kb resolution: ~25x more pixels per
grid than 50kb). Here a single region's rows are sharded over the mesh and
every label/mean-field sweep exchanges one boundary row with the neighbor
devices via `jax.lax.ppermute` over ICI. This is the TPU equivalent of the
reference's block decomposition of oversized chromosomes (SURVEY.md section
5, "long-context / sequence parallelism": reference utility.py:385-393
splits at centromeres because one CPU process per region was the only
scaling axis; here the mesh is).

Correctness of the halo: all Potts operators in ops/potts.py consume
per-direction edge-weight maps; an edge crossing the shard boundary has its
weight stored on exactly one side, so extending labels/q AND weights by one
exchanged row makes each shard's interior rows exact. `ppermute` zero-fills
at the mesh ends, which is precisely the "no edge" encoding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from phylo_hmrf_tpu.config import SMALL_EPS
from phylo_hmrf_tpu.data.regions import DIRS
from phylo_hmrf_tpu.models.emission import gaussian_logpdf
from phylo_hmrf_tpu.ops.potts import (
    neighbor_sums, neighbor_sums_soft, sufficient_stats, valid_maps,
    weight_maps)


def _perms(axis: str):
    n = jax.lax.axis_size(axis)
    down = [(i, i + 1) for i in range(n - 1)]   # send to the device below
    up = [(i + 1, i) for i in range(n - 1)]     # send to the device above
    return down, up


def extend_rows(x: jnp.ndarray, axis: str, row_axis: int = 0,
                depth: int = 1) -> jnp.ndarray:
    """Add ``depth`` halo rows on each side of `row_axis`, filled with the
    neighboring shard's boundary rows (zeros at the mesh ends). Depth > 1
    feeds the temporally-blocked kernels: one exchange per `depth` sweeps
    (the exchanged rows evolve in-kernel exactly as the neighbor computes
    them — the shrinking-wedge argument, ops/mf_pallas.py)."""
    down, up = _perms(axis)
    take = [slice(None)] * x.ndim
    take[row_axis] = slice(-depth, None)
    from_above = jax.lax.ppermute(x[tuple(take)], axis, down)
    take[row_axis] = slice(0, depth)
    from_below = jax.lax.ppermute(x[tuple(take)], axis, up)
    return jnp.concatenate([from_above, x, from_below], axis=row_axis)


def _mean_field_halo(unary, wmaps_ext, beta, axis, temps, iters_per_temp,
                     damping):
    """Annealed mean field on a row shard. unary (Hl, W, K);
    wmaps_ext (4, Hl+2, W)."""
    q = jax.nn.softmax(-unary, axis=-1)
    temps_arr = jnp.repeat(jnp.asarray(temps, unary.dtype), iters_per_temp)

    def field_of(q):
        q_ext = extend_rows(q, axis)
        agree_ext, wsum_ext = neighbor_sums_soft(q_ext, wmaps_ext)
        agree = agree_ext[1:-1]
        wsum = wsum_ext[1:-1]
        return unary + beta * (wsum[..., None] - agree)

    def step(q, T):
        q_new = jax.nn.softmax(-field_of(q) / T, axis=-1)
        return damping * q + (1.0 - damping) * q_new, None

    q, _ = jax.lax.scan(step, q, temps_arr)
    return jnp.argmin(field_of(q), axis=-1).astype(jnp.int32)


def _mf_base(unary_k, w_ext, beta):
    """base = unary + beta * wsum with cross-shard backward weights.
    unary_k (K, Hl, W); w_ext (4, Hl+2, W) halo-extended."""
    from phylo_hmrf_tpu.ops.potts import _shift_bwd

    wsum_ext = jnp.zeros(w_ext.shape[1:], w_ext.dtype)
    for d, (dr, dc) in enumerate(DIRS):
        wsum_ext = wsum_ext + w_ext[d] + _shift_bwd(w_ext[d], dr, dc, 0.0)
    return unary_k + beta * wsum_ext[None, 1:-1]


def _mean_field_halo_pallas(unary, w_ext, beta, axis, temps, iters_per_temp,
                            damping):
    """Fused-kernel variant of `_mean_field_halo`: ONE deep (8-row) halo
    exchange per temperature, then all of that temperature's sweeps run
    inside the temporally-blocked Pallas kernel (ops/mf_pallas.py,
    pre_extended mode) — 8x fewer ICI collectives than per-sweep exchange,
    identical labels (the exchanged rows evolve in-kernel exactly as the
    neighbor shard computes them)."""
    from phylo_hmrf_tpu.ops.mf_pallas import _HALO, mf_sweep_pallas, \
        mf_sweeps_pallas

    unary_k = jnp.transpose(unary, (2, 0, 1))        # (K, Hl, W)
    base = _mf_base(unary_k, w_ext, beta)
    q = jax.nn.softmax(-unary_k, axis=0)

    interp = jax.default_backend() != "tpu"   # CPU tests: interpret mode

    if 1 <= iters_per_temp <= _HALO and q.shape[1] >= _HALO:
        # the per-E-step-constant slabs are exchanged once
        base_ext = extend_rows(base, axis, row_axis=1, depth=_HALO)
        w_ext8 = extend_rows(w_ext[:, 1:-1], axis, row_axis=1, depth=_HALO)
        for T in temps:
            q_ext = extend_rows(q, axis, row_axis=1, depth=_HALO)
            q = mf_sweeps_pallas(q_ext, base_ext, w_ext8, T, damping, beta,
                                 n_inner=iters_per_temp,
                                 pre_extended=True, interpret=interp)
    else:
        temps_arr = jnp.repeat(jnp.asarray(temps, unary.dtype),
                               iters_per_temp)

        def step(q, T):
            q_ext = extend_rows(q, axis, row_axis=1)     # (K, Hl+2, W)
            return mf_sweep_pallas(q_ext, base, w_ext, T, damping, beta,
                                   halo_extended=True,
                                   interpret=interp), None

        q, _ = jax.lax.scan(step, q, temps_arr)
    # final hard assignment at T -> 0 (once; plain jnp)
    q_hwk = jnp.transpose(q, (1, 2, 0))
    q_ext = extend_rows(q_hwk, axis)
    agree_ext, wsum_ext = neighbor_sums_soft(q_ext, w_ext)
    field = unary + beta * (wsum_ext[1:-1][..., None] - agree_ext[1:-1])
    return jnp.argmin(field, axis=-1).astype(jnp.int32)


def _icm_halo_pallas(unary, w_ext, mask, init_labels, beta, max_sweeps,
                     axis):
    """Fused-kernel variant of `_icm_halo`: one deep (8-row) label-halo
    exchange per TWO checkerboard sweeps, then the temporally-blocked
    sweep-pair kernel on the local slab (ops/icm_pallas.py). Phase parity
    stays globally consistent via the kernel's row_offset scalar. 32x fewer
    ICI collectives than the per-phase exchange; identical labels (wedge
    argument)."""
    from phylo_hmrf_tpu.ops.icm_pallas import _HALO, _icm_sweep_pair_padded, \
        icm_phase_pallas

    Hl, W, K = unary.shape
    unary_k = jnp.transpose(unary, (2, 0, 1))[None]
    mask_i = mask.astype(jnp.int32)[None]
    row0 = jax.lax.axis_index(axis) * Hl
    labels0 = jnp.where(mask, init_labels, 0).astype(jnp.int32)
    interp = jax.default_backend() != "tpu"   # CPU tests: interpret mode

    if Hl >= _HALO:
        # per-E-step-constant slabs exchanged once
        unp = extend_rows(unary_k[0], axis, row_axis=1, depth=_HALO)[None]
        wp = extend_rows(w_ext[:, 1:-1], axis, row_axis=1, depth=_HALO)[None]
        maskp = extend_rows(mask_i[0], axis, row_axis=0, depth=_HALO)[None]

        def cond(state):
            _, changed, sweep = state
            return (changed > 0) & (sweep < max_sweeps)

        def body(state):
            labels, _, sweep = state
            labp = extend_rows(labels, axis, row_axis=0, depth=_HALO)[None]
            new = _icm_sweep_pair_padded(labp, unp, wp, maskp, beta,
                                         interpret=interp,
                                         row_offset=row0)[0]
            changed = jnp.sum((new != labels).astype(jnp.int32))
            return new, jax.lax.psum(changed, axis), sweep + 2

        labels, _, _ = jax.lax.while_loop(
            cond, body, (labels0, jnp.int32(1), jnp.int32(0)))
        return labels

    def one_sweep(labels):
        changed = jnp.zeros((), jnp.int32)
        for a in (0, 1):
            for b in (0, 1):
                lab_ext = extend_rows(labels, axis)
                a_eff = (a + row0) % 2   # local parity of global phase a
                new = icm_phase_pallas(lab_ext[None], unary_k, w_ext[None],
                                       mask_i, beta, a_eff, b,
                                       halo_extended=True,
                                       interpret=interp)[0]
                changed += jnp.sum((new != labels).astype(jnp.int32))
                labels = new
        return labels, jax.lax.psum(changed, axis)

    def cond(state):
        _, changed, sweep = state
        return (changed > 0) & (sweep < max_sweeps)

    def body(state):
        labels, _, sweep = state
        labels, changed = one_sweep(labels)
        return labels, changed, sweep + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.int32(1), jnp.int32(0)))
    return labels


def _phase_masks_local(Hl: int, W: int, axis: str):
    # offset local rows by the shard's global row offset so checkerboard
    # parity stays globally consistent even for odd per-shard heights
    # (ICM's exact block-coordinate-descent guarantee needs global parity)
    row0 = jax.lax.axis_index(axis) * Hl
    i = row0 + jax.lax.broadcasted_iota(jnp.int32, (Hl, W), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (Hl, W), 1)
    return [(i % 2 == a) & (j % 2 == b) for a in (0, 1) for b in (0, 1)]


def _icm_halo(unary, wmaps_ext, mask, init_labels, beta, max_sweeps, axis):
    Hl, W, K = unary.shape
    phases = _phase_masks_local(Hl, W, axis)
    labels0 = jnp.where(mask, init_labels, 0).astype(jnp.int32)

    def one_sweep(labels):
        changed = jnp.zeros((), jnp.int32)
        for ph in phases:
            lab_ext = extend_rows(labels, axis)
            agree_ext, _ = neighbor_sums(lab_ext, wmaps_ext, K)
            score = unary - beta * agree_ext[1:-1]
            best = jnp.argmin(score, axis=-1).astype(jnp.int32)
            new_labels = jnp.where(ph & mask, best, labels)
            changed += jnp.sum((new_labels != labels).astype(jnp.int32))
            labels = new_labels
        return labels, jax.lax.psum(changed, axis)

    def cond(state):
        _, changed, sweep = state
        return (changed > 0) & (sweep < max_sweeps)

    def body(state):
        labels, _, sweep = state
        labels, changed = one_sweep(labels)
        return labels, changed, sweep + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.int32(1), jnp.int32(0)))
    return labels


def _energy_halo(labels, unary, wmaps_local, mask, beta, axis):
    """Global MRF energy of a row-sharded labeling (psum over shards).
    Each shard sums its own pixels and the edges whose weights it stores;
    forward neighbors may live on the next shard -> extend labels."""
    from phylo_hmrf_tpu.ops.potts import _shift_fwd

    onehot = jax.nn.one_hot(labels, unary.shape[-1], dtype=unary.dtype)
    u = jnp.sum(unary * onehot, axis=-1)
    e = jnp.sum(jnp.where(mask, u, 0.0))
    lab_ext = extend_rows(labels, axis)
    for d, (di, dj) in enumerate(DIRS):
        nb_ext = _shift_fwd(lab_ext, di, dj, -1)
        nb = nb_ext[1:-1]
        diff = (labels != nb).astype(unary.dtype)
        e += beta * jnp.sum(wmaps_local[d] * diff)
    return jax.lax.psum(e, axis)


def estep_region_rowsharded(img, mask, dmaps, warm, means, covars, beta,
                            beta1, *, weighted_pp: bool,
                            max_sweeps: int, axis: str = "data",
                            temps=(4.0, 2.0, 1.0, 0.5, 0.25),
                            iters_per_temp: int = 8, damping: float = 0.5,
                            use_pallas: bool = False):
    """Shard-local E-step body (call under shard_map with rows of one region
    sharded over `axis`). Shapes are per-shard: img (Hl, W, F), mask
    (Hl, W), dmaps (4, Hl, W), warm (Hl, W).

    Returns (labels (Hl, W), stats psum-reduced, cost_vec (4,) global,
    n_valid global). With ``use_pallas`` (and kernel-compatible local
    shapes: Hl % 8 == 0, W % 128 == 0) the MF/ICM sweeps between halo
    exchanges run as the fused Pallas kernels.
    """
    logprob = gaussian_logpdf(img, means, covars)
    unary = -logprob
    w_cut = weight_maps(dmaps, beta1)
    w_ext = extend_rows(w_cut, axis, row_axis=1)

    Hl, W = mask.shape
    if use_pallas and Hl % 8 == 0 and W % 128 == 0:
        mf = _mean_field_halo_pallas(unary, w_ext, beta, axis, temps,
                                     iters_per_temp, damping)
        cand_a = _icm_halo_pallas(unary, w_ext, mask, mf, beta, max_sweeps,
                                  axis)
        cand_b = _icm_halo_pallas(unary, w_ext, mask, warm, beta, max_sweeps,
                                  axis)
    else:
        mf = _mean_field_halo(unary, w_ext, beta, axis, temps,
                              iters_per_temp, damping)
        cand_a = _icm_halo(unary, w_ext, mask, mf, beta, max_sweeps, axis)
        cand_b = _icm_halo(unary, w_ext, mask, warm, beta, max_sweeps, axis)
    e_a = _energy_halo(cand_a, unary, w_cut, mask, beta, axis)
    e_b = _energy_halo(cand_b, unary, w_cut, mask, beta, axis)
    labels = jnp.where(e_a <= e_b, cand_a, cand_b)

    w_pp = w_cut if weighted_pp else valid_maps(dmaps)
    wpp_ext = extend_rows(w_pp, axis, row_axis=1)
    K = unary.shape[-1]
    lab_ext = extend_rows(labels, axis)
    agree_ext, wsum_ext = neighbor_sums(lab_ext, wpp_ext, K)
    pp = beta * (wsum_ext[1:-1][..., None] - agree_ext[1:-1])

    # local sums, then global means via psum
    m = mask.astype(logprob.dtype)
    n_local = jnp.sum(m)
    onehot = jax.nn.one_hot(labels, K, dtype=logprob.dtype)
    posteriors = jax.nn.softmax(logprob - pp, axis=-1)
    pp_norm = jax.nn.softmax(-pp, axis=-1)
    pp_map = jnp.sum(pp * onehot, -1)
    lp_map = jnp.sum(logprob * onehot, -1)
    ppn_map = jnp.sum(pp_norm * onehot, -1)
    sums = jnp.stack([
        jnp.sum(jnp.where(mask, pp_map, 0.0)),
        -jnp.sum(jnp.where(mask, jnp.log(ppn_map + SMALL_EPS), 0.0)),
        -jnp.sum(jnp.where(mask, lp_map, 0.0)),
    ])
    sums = jax.lax.psum(sums, axis)
    n_valid = jax.lax.psum(n_local, axis)
    n_safe = jnp.maximum(n_valid, 1.0)
    pairwise_cost = sums[0] / n_safe
    pairwise_nrm = sums[1] / n_safe
    unary_cost = sums[2] / n_safe
    cost_vec = jnp.stack([pairwise_cost, pairwise_nrm, unary_cost,
                          unary_cost + pairwise_nrm])

    post, obs, obs2 = sufficient_stats(posteriors, img, mask)
    stats = tuple(jax.lax.psum(s, axis) for s in (post, obs, obs2))
    return labels, stats, cost_vec, n_valid


def make_rowsharded_estep(mesh: Mesh, *, weighted_pp: bool,
                          max_sweeps: int, axis: str = "data",
                          use_pallas: bool = False):
    """jitted shard_map wrapper: global shapes in, global shapes out.
    img (H, W, F) with H divisible by mesh size (pad rows with mask=False)."""
    body = functools.partial(
        estep_region_rowsharded,
        weighted_pp=weighted_pp, max_sweeps=max_sweeps, axis=axis,
        use_pallas=use_pallas)
    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(None, axis), P(axis), P(), P(),
                  P(), P()),
        out_specs=(P(axis), (P(), P(), P()), P(), P()),
        check_vma=False)
    return jax.jit(sharded)
