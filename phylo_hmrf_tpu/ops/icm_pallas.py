"""Pallas TPU kernel: one checkerboard-ICM phase update.

Same tiling/halo scheme as ops/mf_pallas.py (row tiles, 8-row halo DMA,
region batch as a grid dimension), but with hard labels: the kernel computes
the weighted neighbor agreement from the int32 label slab, takes the argmin
of ``unary - beta * agree`` over states, and commits it only at pixels of the
active checkerboard color. Four phase invocations = one exact
block-coordinate-descent sweep (energy monotone); the sweep loop with
early exit runs outside under `lax.while_loop`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phylo_hmrf_tpu.data.regions import DIRS
from phylo_hmrf_tpu.ops.mf_pallas import _HALO, _pick_tile_h, \
    _shift2, _shift_cols, _VMEM_LIMIT, pick_tile_h


def _icm_phase_kernel(scalars_ref, unary_ref, mask_ref, labp_ref, wp_ref,
                      out_ref, lab_scratch, w_scratch, sem, *, tile_h: int):
    r = pl.program_id(0)
    i = pl.program_id(1)
    beta = scalars_ref[0, 0]
    phase_a = scalars_ref[1, 0].astype(jnp.int32)
    phase_b = scalars_ref[2, 0].astype(jnp.int32)

    row0 = i * tile_h
    cp_l = pltpu.make_async_copy(
        labp_ref.at[r, pl.ds(row0, tile_h + 2 * _HALO), :], lab_scratch,
        sem.at[0])
    cp_w = pltpu.make_async_copy(
        wp_ref.at[r, :, pl.ds(row0, tile_h + 2 * _HALO), :], w_scratch,
        sem.at[1])
    cp_l.start()
    cp_w.start()
    cp_l.wait()
    cp_w.wait()

    lab = lab_scratch[:]      # (TH + 2*_HALO, W) int32
    w = w_scratch[:]          # (4, TH + 2*_HALO, W)
    K = unary_ref.shape[1]
    c = _HALO

    ks = jax.lax.broadcasted_iota(jnp.int32, (K, tile_h, lab.shape[1]), 0)

    agree = jnp.zeros((K, tile_h, lab.shape[1]), w.dtype)
    for d, (dr, dc) in enumerate(DIRS):
        lab_sh = _shift_cols(lab[None], dc)[0]
        lab_shm = _shift_cols(lab[None], -dc)[0]
        w_sh = _shift_cols(w[d:d + 1], -dc)[0]
        w_d = w[d]
        # forward edge: neighbor at (+dr, +dc)
        nb = lab_sh[c + dr:c + dr + tile_h, :]
        agree += (w_d[c:c + tile_h, :][None]
                  * (nb[None] == ks).astype(w.dtype))
        # backward edge: neighbor at (-dr, -dc), weight stored at neighbor
        nbm = lab_shm[c - dr:c - dr + tile_h, :]
        agree += (w_sh[c - dr:c - dr + tile_h, :][None]
                  * (nbm[None] == ks).astype(w.dtype))

    score = unary_ref[0] - beta * agree
    best = jnp.argmin(score, axis=0).astype(jnp.int32)

    rows = jax.lax.broadcasted_iota(jnp.int32, best.shape, 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, best.shape, 1)
    phase = ((rows % 2) == phase_a) & ((cols % 2) == phase_b)
    valid = mask_ref[0] != 0
    center = lab[c:c + tile_h, :]
    out_ref[0] = jnp.where(phase & valid, best, center)


def _icm_sweeppair_kernel(scalars_ref, unp_ref, maskp_ref, labp_ref, wp_ref,
                          out_ref, lab_scratch, un_scratch, mask_scratch,
                          w_scratch, sem, *, tile_h: int):
    """Two full checkerboard sweeps (8 phases) in one kernel instance.

    Same temporal-blocking scheme as `mf_pallas._mf_multisweep_kernel`: each
    phase reads labels within +-1 row, so the 8-row halo is a validity wedge
    that shrinks one row per phase — 8 phases keep every center row exact.
    The unary slab (the dominant HBM traffic, K*H*W f32, previously re-read
    by all 4 phase calls of every sweep) is DMAed once per pair."""
    r = pl.program_id(0)
    i = pl.program_id(1)
    beta = scalars_ref[0, 0]
    row_offset = scalars_ref[1, 0].astype(jnp.int32)

    row0 = i * tile_h
    slab_rows = pl.ds(row0, tile_h + 2 * _HALO)
    cp_l = pltpu.make_async_copy(labp_ref.at[r, slab_rows, :], lab_scratch,
                                 sem.at[0])
    cp_u = pltpu.make_async_copy(unp_ref.at[r, :, slab_rows, :], un_scratch,
                                 sem.at[1])
    cp_m = pltpu.make_async_copy(maskp_ref.at[r, slab_rows, :], mask_scratch,
                                 sem.at[2])
    cp_w = pltpu.make_async_copy(wp_ref.at[r, :, slab_rows, :], w_scratch,
                                 sem.at[3])
    cp_l.start()
    cp_u.start()
    cp_m.start()
    cp_w.start()
    cp_l.wait()
    cp_u.wait()
    cp_m.wait()
    cp_w.wait()

    lab = lab_scratch[:]      # (S, W) int32
    unary = un_scratch[:]     # (K, S, W)
    w = w_scratch[:]          # (4, S, W)
    K = unary.shape[0]
    S = lab.shape[0]
    W = lab.shape[1]

    valid = mask_scratch[:] != 0
    ks = jax.lax.broadcasted_iota(jnp.int32, (K, S, W), 0)
    rows = (jax.lax.broadcasted_iota(jnp.int32, (S, W), 0)
            + row0 - _HALO + row_offset)
    cols = jax.lax.broadcasted_iota(jnp.int32, (S, W), 1)
    # shifted weights are constant across phases
    w_sh = [_shift2(w[d], -dr, -dc)
            for d, (dr, dc) in enumerate(DIRS)]

    for _ in range(2):                 # two sweeps
        for a in (0, 1):               # 4 checkerboard phases each
            for b in (0, 1):
                agree = jnp.zeros((K, S, W), w.dtype)
                for d, (dr, dc) in enumerate(DIRS):
                    nb = _shift2(lab[None], dr, dc)[0]
                    agree += (w[d][None]
                              * (nb[None] == ks).astype(w.dtype))
                    nbm = _shift2(lab[None], -dr, -dc)[0]
                    agree += (w_sh[d][None]
                              * (nbm[None] == ks).astype(w.dtype))
                score = unary - beta * agree
                best = jnp.argmin(score, axis=0).astype(jnp.int32)
                phase = ((rows % 2) == a) & ((cols % 2) == b)
                lab = jnp.where(phase & valid, best, lab)

    out_ref[0] = lab[_HALO:_HALO + tile_h, :]


def _vmem_use_icm_pair(th: int, K: int, W: int) -> int:
    """VMEM model of one sweep-pair instance: unary slab + one-hot iota/agree
    temporaries dominate; labels/mask/weights are small."""
    slab = th + 2 * _HALO
    return 4 * ((1 + 3) * K * slab * W   # unary + agree/one-hot/score temps
                + (4 + 4 + 3) * slab * W  # w + shifted w + lab/mask/iotas
                + 2 * th * W)             # out block, double-buffered


def _pick_tile_h_icm_pair(H: int, K: int, W: int,
                          budget_bytes: int = 0) -> int:
    return pick_tile_h(H, lambda th: _vmem_use_icm_pair(th, K, W),
                       budget_bytes)


@functools.partial(jax.jit, static_argnames=("interpret",))
def icm_sweep_pair_pallas(labels, unary_k, wmaps, mask, beta, *,
                          interpret: bool = False):
    """Two exact checkerboard-ICM sweeps in one temporally-blocked kernel.

    Same result as 8 chained `icm_phase_pallas` calls (2 sweeps of 4 phases
    in (0,0),(0,1),(1,0),(1,1) order), ~6x less HBM traffic. labels
    (R, H, W) int32; unary_k (R, K, H, W); wmaps (R, 4, H, W); mask
    (R, H, W) int32."""
    labp = jnp.pad(labels, [(0, 0), (_HALO, _HALO), (0, 0)])
    pad4 = [(0, 0), (0, 0), (_HALO, _HALO), (0, 0)]
    out = _icm_sweep_pair_padded(
        labp, jnp.pad(unary_k, pad4),
        jnp.pad(wmaps, pad4),
        jnp.pad(mask, [(0, 0), (_HALO, _HALO), (0, 0)]),
        beta, interpret=interpret)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def _icm_sweep_pair_padded(labp, unp, wp, maskp, beta, *,
                           interpret: bool = False, row_offset=0):
    """Sweep-pair call on pre-padded inputs (labp/maskp (R, H+2*_HALO, W),
    unp (R, K, H+2*_HALO, W), wp (R, 4, H+2*_HALO, W)); the loop-invariant
    unary/weight/mask pads hoist out of the ICM while_loop this way (the
    unary re-pad alone was ~2x the kernel's own HBM traffic). The _HALO
    rows may instead carry a row-sharded shard's ppermute-exchanged halo
    (parallel/halo.py) — then ``row_offset`` (the shard's global first row)
    keeps the checkerboard parity globally consistent, and the wedge
    argument makes one 8-row exchange per 8 phases exact."""
    R, K, H2, W = unp.shape
    H = H2 - 2 * _HALO
    tile_h = _pick_tile_h_icm_pair(H, K, W)
    scalars = jnp.stack([jnp.asarray(beta, unp.dtype),
                         jnp.asarray(row_offset, unp.dtype)])

    slab = tile_h + 2 * _HALO
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(R, H // tile_h),
        in_specs=[
            pl.BlockSpec((2, 1), lambda r, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W), lambda r, i: (r, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slab, W), jnp.int32),
            pltpu.VMEM((K, slab, W), unp.dtype),
            pltpu.VMEM((slab, W), jnp.int32),
            pltpu.VMEM((4, slab, W), unp.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    kernel = functools.partial(_icm_sweeppair_kernel, tile_h=tile_h)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, H, W), jnp.int32),
        interpret=interpret,
        **kwargs,
    )(scalars.reshape(2, 1), unp, maskp, labp, wp)


@functools.partial(jax.jit, static_argnames=("interpret", "halo_extended"))
def icm_phase_pallas(labels, unary_k, wmaps, mask, beta, phase_a, phase_b,
                     *, interpret: bool = False,
                     halo_extended: bool = False):
    """One checkerboard phase over a region batch.

    labels (R, H, W) int32; unary_k (R, K, H, W); wmaps (R, 4, H, W);
    mask (R, H, W) int32 (1 = valid). Returns updated labels.

    With ``halo_extended``, labels and wmaps carry one exchanged halo row
    on each side (row-sharded shard, parallel/halo.py); unary_k/mask stay
    center-only, and the caller passes phase_a already offset by the
    shard's global row parity. Returns center rows only."""
    R, K, H, W = unary_k.shape
    tile_h = _pick_tile_h(H, K, W)
    hp = _HALO - 1 if halo_extended else _HALO
    labp = jnp.pad(labels, [(0, 0), (hp, hp), (0, 0)])
    wp = jnp.pad(wmaps, [(0, 0), (0, 0), (hp, hp), (0, 0)])
    scalars = jnp.stack([jnp.asarray(beta, unary_k.dtype),
                         jnp.asarray(phase_a, unary_k.dtype),
                         jnp.asarray(phase_b, unary_k.dtype)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(R, H // tile_h),
        in_specs=[
            pl.BlockSpec((3, 1), lambda r, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, tile_h, W), lambda r, i: (r, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, W), lambda r, i: (r, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W), lambda r, i: (r, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _HALO, W), jnp.int32),
            pltpu.VMEM((4, tile_h + 2 * _HALO, W), unary_k.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_icm_phase_kernel, tile_h=tile_h)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, H, W), jnp.int32),
        interpret=interpret,
        **kwargs,
    )(scalars.reshape(3, 1), unary_k, mask, labp, wp)


def icm_pallas(unary, wmaps, mask, init_labels, beta, max_sweeps: int = 60,
               interpret: bool = False, *, unary_k=None):
    """Batched checkerboard ICM via the temporally-blocked sweep-pair kernel.

    unary (R, H, W, K); wmaps (R, 4, H, W); mask (R, H, W) bool;
    init_labels (R, H, W). Pass ``unary_k`` (R, K, H, W) instead of
    ``unary`` to skip the strided K-major relayout (~1.8 ms at chr21
    scale). Semantics identical to vmapped ops.icm.icm: the
    loop exits at a fixed point (a converged labeling is a fixed point of
    any further sweeps, so pair granularity reaches the same labels; a
    capped run may overshoot the odd max_sweeps bound by one sweep)."""
    if unary_k is None:
        unary_k = jnp.transpose(unary, (0, 3, 1, 2))
    mask_i = mask.astype(jnp.int32)
    labels0 = jnp.where(mask, init_labels, 0).astype(jnp.int32)
    # loop-invariant pads hoisted out of the while_loop (the unary re-pad
    # alone was ~2x the kernel's own HBM traffic per iteration)
    pad4 = [(0, 0), (0, 0), (_HALO, _HALO), (0, 0)]
    unp = jnp.pad(unary_k, pad4)
    wp = jnp.pad(wmaps, pad4)
    maskp = jnp.pad(mask_i, [(0, 0), (_HALO, _HALO), (0, 0)])

    def cond(state):
        _, changed, sweep = state
        return (changed > 0) & (sweep < max_sweeps)

    def body(state):
        labels, _, sweep = state
        labp = jnp.pad(labels, [(0, 0), (_HALO, _HALO), (0, 0)])
        new = _icm_sweep_pair_padded(labp, unp, wp, maskp, beta,
                                     interpret=interpret)
        changed = jnp.sum((new != labels).astype(jnp.int32))
        return new, changed, sweep + 2

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.int32(1), jnp.int32(0)))
    return labels
