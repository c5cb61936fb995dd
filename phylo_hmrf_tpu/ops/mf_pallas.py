"""Pallas TPU kernel: fused annealed-mean-field sweep.

One sweep of ops/icm.py's `mean_field` reads q, the per-direction edge
weights and the unary field, computes the expected-Potts field and writes
the damped softmax update. The jnp path materializes the (H, W, K)
agreement tensor in HBM between fused stages; this kernel keeps the whole
update in VMEM per row-tile:

  layout  (K, H, W) — lanes ride W (multiple of 128), K is the major axis
  grid    row tiles of TH rows; each tile DMAs a (K, TH+2, W) halo slab of q
          and a (4, TH+2, W) slab of weights from HBM
  compute agree[k] = sum_d (w_d * shift_fwd(q_k) + shift_bwd(w_d * q_k));
          field = base + beta * (-agree)   [base = unary + beta * wsum is
          precomputed once per E-step: wsum does not depend on q]
          q_new = damp * q + (1 - damp) * softmax(-field / T) over K

Boundary rows are handled by zero-padding q/w with one row on each side at
the caller (zero weights contribute nothing); column shifts zero-pad in
registers.

Used automatically by `mean_field(..., backend="auto")` on TPU; the jnp path
remains the reference implementation and the CPU/interpret fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phylo_hmrf_tpu.data.regions import DIRS

_HALO = 8  # 8-row halo keeps DMA slabs sublane-aligned


def _shift_cols(x: jnp.ndarray, dc: int) -> jnp.ndarray:
    """result[..., c] = x[..., c + dc], zero outside. x: (..., W)."""
    if dc == 0:
        return x
    W = x.shape[-1]
    zeros = jnp.zeros(x.shape[:-1] + (abs(dc),), x.dtype)
    if dc > 0:
        return jnp.concatenate([x[..., dc:], zeros], axis=-1)
    return jnp.concatenate([zeros, x[..., :W + dc]], axis=-1)


def _shift_rows(x: jnp.ndarray, dr: int) -> jnp.ndarray:
    """result[..., r, :] = x[..., r + dr, :], zero outside. x: (..., S, W)."""
    if dr == 0:
        return x
    S = x.shape[-2]
    zeros = jnp.zeros(x.shape[:-2] + (abs(dr), x.shape[-1]), x.dtype)
    if dr > 0:
        return jnp.concatenate([x[..., dr:, :], zeros], axis=-2)
    return jnp.concatenate([zeros, x[..., :S + dr, :]], axis=-2)


def _shift2(x: jnp.ndarray, dr: int, dc: int) -> jnp.ndarray:
    """result[..., r, c] = x[..., r + dr, c + dc], zero outside — the
    in-slab neighbor view every stencil kernel here uses."""
    return _shift_rows(_shift_cols(x, dc), dr)


def _mf_sweep_kernel(scalars_ref, base_ref, qp_ref, wp_ref, out_ref,
                     q_scratch, w_scratch, sem, *, tile_h: int):
    r = pl.program_id(0)      # region within the batch
    i = pl.program_id(1)      # row tile
    T = scalars_ref[0, 0]
    damp = scalars_ref[1, 0]
    beta = scalars_ref[2, 0]

    # 8-row halo on each side keeps every DMA slab 8-row aligned (Mosaic
    # sublane tiling); the center rows sit at offset _HALO
    row0 = i * tile_h
    cp_q = pltpu.make_async_copy(
        qp_ref.at[r, :, pl.ds(row0, tile_h + 2 * _HALO), :], q_scratch,
        sem.at[0])
    cp_w = pltpu.make_async_copy(
        wp_ref.at[r, :, pl.ds(row0, tile_h + 2 * _HALO), :], w_scratch,
        sem.at[1])
    cp_q.start()
    cp_w.start()
    cp_q.wait()
    cp_w.wait()

    q = q_scratch[:]          # (K, TH + 2*_HALO, W)
    w = w_scratch[:]          # (4, TH + 2*_HALO, W)
    K = q.shape[0]
    c = _HALO                 # first center row within the slab

    agree = jnp.zeros((K, tile_h, q.shape[2]), q.dtype)
    for d, (dr, dc) in enumerate(DIRS):
        # column-shift the FULL slabs first (lane-dim concat at sublane
        # offset 0 — Mosaic rejects lane concats of sublane-offset slices),
        # then row-slice.
        q_sh = _shift_cols(q, dc)
        w_sh = _shift_cols(w[d:d + 1], -dc)[0]
        q_shm = _shift_cols(q, -dc)
        w_d = w[d]
        # forward edge: neighbor at (+dr, +dc), weight at the center pixel
        agree += w_d[c:c + tile_h, :][None] * q_sh[:, c + dr:c + dr + tile_h]
        # backward edge: neighbor at (-dr, -dc), weight stored at neighbor
        agree += (w_sh[c - dr:c - dr + tile_h, :][None]
                  * q_shm[:, c - dr:c - dr + tile_h])

    # base = unary + beta * wsum precomputed; field = base - beta * agree
    field = base_ref[0] - beta * agree
    z = -field / T
    z = z - jnp.max(z, axis=0, keepdims=True)
    e = jnp.exp(z)
    q_new = e / jnp.sum(e, axis=0, keepdims=True)
    out_ref[0] = damp * q[:, c:c + tile_h, :] + (1.0 - damp) * q_new


def _mf_multisweep_kernel(scalars_ref, qp_ref, wp_ref, bp_ref, out_ref,
                          q_scratch, w_scratch, b_scratch, sem, *,
                          tile_h: int, n_inner: int):
    """``n_inner`` Jacobi sweeps at one temperature inside one kernel
    instance (temporal blocking).

    The 8-row halo shrinks by one valid row per sweep: after sweep s, slab
    rows within distance s of the slab edge hold garbage, so n_inner <=
    _HALO keeps every center row exact. Garbage stays finite (the update is
    a damped softmax), and out-of-array rows can never reach a valid pixel:
    every edge touching an invalid pixel has weight exactly 0
    (`data/regions.py::edge_distance_maps` writes +inf distance there, and
    exp(-beta1*inf) = 0). This cuts HBM traffic ~n_inner-fold vs chaining
    single-sweep calls — q, weights and base stay in VMEM across sweeps."""
    r = pl.program_id(0)
    i = pl.program_id(1)
    T = scalars_ref[0, 0]
    damp = scalars_ref[1, 0]
    beta = scalars_ref[2, 0]

    row0 = i * tile_h
    slab = pl.ds(row0, tile_h + 2 * _HALO)
    cp_q = pltpu.make_async_copy(qp_ref.at[r, :, slab, :], q_scratch,
                                 sem.at[0])
    cp_w = pltpu.make_async_copy(wp_ref.at[r, :, slab, :], w_scratch,
                                 sem.at[1])
    cp_b = pltpu.make_async_copy(bp_ref.at[r, :, slab, :], b_scratch,
                                 sem.at[2])
    cp_q.start()
    cp_w.start()
    cp_b.start()
    cp_q.wait()
    cp_w.wait()
    cp_b.wait()

    w = w_scratch[:]          # (4, S, W)
    base = b_scratch[:]       # (K, S, W)
    q = q_scratch[:]          # (K, S, W)
    K = q.shape[0]
    # shifted weights are constant across the inner sweeps
    w_sh = [_shift2(w[d], -dr, -dc)
            for d, (dr, dc) in enumerate(DIRS)]

    for _ in range(n_inner):
        agree = jnp.zeros(q.shape, q.dtype)
        for d, (dr, dc) in enumerate(DIRS):
            # forward edge: neighbor at (+dr, +dc), weight at the pixel
            agree += w[d][None] * _shift2(q, dr, dc)
            # backward edge: neighbor at (-dr, -dc), weight at the neighbor
            agree += w_sh[d][None] * _shift2(q, -dr, -dc)
        field = base - beta * agree
        z = -field / T
        z = z - jnp.max(z, axis=0, keepdims=True)
        e = jnp.exp(z)
        q = damp * q + (1.0 - damp) * (e / jnp.sum(e, axis=0, keepdims=True))

    out_ref[0] = q[:, _HALO:_HALO + tile_h, :]


_VMEM_LIMIT = 100 << 20   # v5e VMEM is 128 MiB; leave headroom


def _vmem_use(th: int, K: int, W: int) -> int:
    """Measured-accurate VMEM model of one kernel instance: q slab + its two
    column-shifted temporaries, weight slab x2, double-buffered base/out
    blocks, and the agree accumulator (all f32)."""
    slab = th + 2 * _HALO
    return 4 * (3 * K * slab * W      # q slab + q_sh + q_shm
                + 2 * 4 * slab * W    # weight slab (+ shifted copy)
                + 2 * 2 * K * th * W  # base + out, double-buffered
                + K * th * W)         # agree


def pick_tile_h(H: int, vmem_model, budget_bytes: int = 0) -> int:
    """Largest multiple-of-8 row tile that divides H and fits the VMEM
    budget (default: half the compiler limit). ``vmem_model(th)`` returns
    the kernel instance's VMEM bytes at tile ``th``. Raises for H not a
    multiple of 8: the kernel grids are H // tile_h instances, so a
    non-divisible H would silently drop the tail rows."""
    if H % 8:
        raise ValueError(
            f"kernel grids need H to be a multiple of 8, got H={H} "
            f"(pad_h must be a multiple of 8)")
    budget = budget_bytes or _VMEM_LIMIT // 2
    for th in (256, 128, 64, 32, 16, 8):
        if H % th:
            continue
        if vmem_model(th) <= budget:
            return th
    return 8


def _pick_tile_h(H: int, K: int, W: int,
                 budget_bytes: int = 0) -> int:
    return pick_tile_h(H, lambda th: _vmem_use(th, K, W), budget_bytes)


def _vmem_use_multi(th: int, K: int, W: int) -> int:
    """VMEM model of one multisweep instance: q/base slabs + w slab, the
    per-direction shifted-weight copies, the agree accumulator and two
    shift temporaries on the full slab, and the double-buffered out block."""
    slab = th + 2 * _HALO
    return 4 * ((2 + 3 + 1) * K * slab * W   # q + base + agree + 2 shift tmps
                + (4 + 4) * slab * W         # w slab + shifted copies
                + 2 * K * th * W)            # out block, double-buffered


def _pick_tile_h_multi(H: int, K: int, W: int,
                       budget_bytes: int = 0) -> int:
    return pick_tile_h(H, lambda th: _vmem_use_multi(th, K, W),
                       budget_bytes)


@functools.partial(jax.jit, static_argnames=("n_inner", "interpret",
                                             "pre_extended"))
def mf_sweeps_pallas(q: jnp.ndarray, base: jnp.ndarray, wmaps: jnp.ndarray,
                     T, damp, beta, *, n_inner: int,
                     interpret: bool = False,
                     pre_extended: bool = False) -> jnp.ndarray:
    """``n_inner`` (<= _HALO) mean-field sweeps at one temperature in a
    single temporally-blocked kernel — exact same result as ``n_inner``
    chained `mf_sweep_pallas` calls, ~n_inner-fold less HBM traffic.

    q, base: (R, K, H, W); wmaps: (R, 4, H, W); also accepts unbatched.

    With ``pre_extended``, all inputs already carry _HALO (8) extra rows on
    each side — a row-sharded shard's ppermute-exchanged halo
    (parallel/halo.py) — instead of the kernel zero-padding them. The
    exchanged rows evolve in-kernel exactly as the neighboring shard
    computes them (their update stencils are fully contained in the slab
    for the first d sweeps at depth d — the same shrinking wedge as the
    intra-tile halo), so one 8-row exchange per 8 sweeps is exact.
    Returns center rows only."""
    if not 1 <= n_inner <= _HALO:
        raise ValueError(f"n_inner must be in [1, {_HALO}], got {n_inner}")
    squeeze = q.ndim == 3
    if squeeze:
        q, base, wmaps = q[None], base[None], wmaps[None]
    if pre_extended:
        R, K, H2, W = q.shape
        H = H2 - 2 * _HALO
        tile_h = _pick_tile_h_multi(H, K, W)
        qp, wp, bp = q, wmaps, base
    else:
        R, K, H, W = q.shape
        pad = [(0, 0), (0, 0), (_HALO, _HALO), (0, 0)]
        tile_h = _pick_tile_h_multi(H, K, W)
        qp = jnp.pad(q, pad)
        wp = jnp.pad(wmaps, pad)
        bp = jnp.pad(base, pad)
    scalars = jnp.stack([jnp.asarray(T, q.dtype),
                         jnp.asarray(damp, q.dtype),
                         jnp.asarray(beta, q.dtype)])

    slab = tile_h + 2 * _HALO
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(R, H // tile_h),
        in_specs=[
            pl.BlockSpec((3, 1), lambda r, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, K, tile_h, W), lambda r, i: (r, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K, slab, W), q.dtype),
            pltpu.VMEM((4, slab, W), q.dtype),
            pltpu.VMEM((K, slab, W), q.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    kernel = functools.partial(_mf_multisweep_kernel, tile_h=tile_h,
                               n_inner=n_inner)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, K, H, W), q.dtype),
        interpret=interpret,
        **kwargs,
    )(scalars.reshape(3, 1), qp, wp, bp)
    return out[0] if squeeze else out


@functools.partial(jax.jit, static_argnames=("interpret", "halo_extended"))
def mf_sweep_pallas(q: jnp.ndarray, base: jnp.ndarray, wmaps: jnp.ndarray,
                    T, damp, beta, *, interpret: bool = False,
                    halo_extended: bool = False) -> jnp.ndarray:
    """One mean-field sweep over a region batch.

    q, base: (R, K, H, W); wmaps: (R, 4, H, W); H a multiple of 8 and W of
    128 (regions are padded that way). Also accepts unbatched (K, H, W) /
    (4, H, W). The batch is a grid dimension (not vmap: ANY-space refs
    cannot be batched by vmap).

    With ``halo_extended``, q and wmaps carry ONE extra row on each side
    (a row-sharded shard's exchanged halo, parallel/halo.py) while base
    stays center-only: the kernel's boundary rows then see the neighboring
    shard's q/w instead of zeros. Returns center rows only."""
    squeeze = q.ndim == 3
    if squeeze:
        q, base, wmaps = q[None], base[None], wmaps[None]
    if halo_extended:
        R, K, H2, W = q.shape
        H = H2 - 2
        pad = [(0, 0), (0, 0), (_HALO - 1, _HALO - 1), (0, 0)]
    else:
        R, K, H, W = q.shape
        pad = [(0, 0), (0, 0), (_HALO, _HALO), (0, 0)]
    tile_h = _pick_tile_h(H, K, W)
    qp = jnp.pad(q, pad)
    wp = jnp.pad(wmaps, pad)
    scalars = jnp.stack([jnp.asarray(T, q.dtype),
                         jnp.asarray(damp, q.dtype),
                         jnp.asarray(beta, q.dtype)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(R, H // tile_h),
        in_specs=[
            pl.BlockSpec((3, 1), lambda r, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, tile_h, W), lambda r, i: (r, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, K, tile_h, W), lambda r, i: (r, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K, tile_h + 2 * _HALO, W), q.dtype),
            pltpu.VMEM((4, tile_h + 2 * _HALO, W), q.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_mf_sweep_kernel, tile_h=tile_h)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, K, H, W), q.dtype),
        interpret=interpret,
        **kwargs,
    )(scalars.reshape(3, 1), base, qp, wp)
    return out[0] if squeeze else out


def mean_field_pallas_kmajor(unary_k: jnp.ndarray, wmaps: jnp.ndarray,
                             beta: float,
                             temps=(4.0, 2.0, 1.0, 0.5, 0.25),
                             iters_per_temp: int = 8, damping: float = 0.5,
                             interpret: bool = False) -> jnp.ndarray:
    """`mean_field_pallas` for a K-major (R, K, H, W) unary field — the
    layout every kernel here consumes, so no (R, H, W, K) transpose (a
    strided relayout measured at ~1.8 ms at chr21 scale) is ever needed.
    Returns labels (R, H, W) int32."""
    from phylo_hmrf_tpu.ops.potts import _shift_bwd

    qk = jax.nn.softmax(-unary_k, axis=1)
    uk = unary_k

    def one_base(wm_r, uk_r):
        # wsum[p] = sum_d (w_d[p] + w_d[p - (dr, dc)]): constant per E-step
        wsum = jnp.sum(wm_r, axis=0)
        for d, (dr, dc) in enumerate(DIRS):
            wsum = wsum + _shift_bwd(wm_r[d], dr, dc, 0.0)
        return uk_r + beta * wsum[None]

    base = jax.vmap(one_base)(wmaps, uk)

    if 1 <= iters_per_temp <= _HALO:
        # temporal blocking: all sweeps of one temperature in a single
        # kernel (exact same result as chained single sweeps, ~8x less
        # HBM traffic); temps is a short static tuple, so unroll over it
        for T in temps:
            qk = mf_sweeps_pallas(qk, base, wmaps, T, damping, beta,
                                  n_inner=iters_per_temp,
                                  interpret=interpret)
    else:
        temps_arr = jnp.repeat(jnp.asarray(temps, uk.dtype),
                               iters_per_temp)

        def step(qk, T):
            return mf_sweep_pallas(qk, base, wmaps, T, damping, beta,
                                   interpret=interpret), None

        qk, _ = jax.lax.scan(step, qk, temps_arr)

    # final hard assignment at T -> 0: argmin of the expected field,
    # computed K-major (same adds in the same direction order as
    # `neighbor_sums_soft`)
    def one_final(q_r, wm_r, uk_r):
        agree = jnp.zeros_like(q_r)
        wsum = jnp.zeros(q_r.shape[1:], q_r.dtype)
        for d, (dr, dc) in enumerate(DIRS):
            w = wm_r[d]
            agree += w[None] * _shift2(q_r, dr, dc)
            wsum += w
            agree += _shift2(w[None] * q_r, -dr, -dc)
            wsum += _shift2(w[None], -dr, -dc)[0]
        field = uk_r + beta * (wsum[None] - agree)
        return jnp.argmin(field, axis=0).astype(jnp.int32)

    return jax.vmap(one_final)(qk, wmaps, uk)


def mean_field_pallas(unary: jnp.ndarray, wmaps: jnp.ndarray, beta: float,
                      temps=(4.0, 2.0, 1.0, 0.5, 0.25),
                      iters_per_temp: int = 8, damping: float = 0.5,
                      interpret: bool = False) -> jnp.ndarray:
    """Drop-in Pallas replacement for ops.icm.mean_field.

    unary (H, W, K) or batched (R, H, W, K); wmaps (4, H, W) or (R, 4, H, W).
    Returns hardened labels, (H, W) / (R, H, W) int32.
    """
    squeeze = unary.ndim == 3
    if squeeze:
        unary, wmaps = unary[None], wmaps[None]
    labels = mean_field_pallas_kmajor(
        jnp.transpose(unary, (0, 3, 1, 2)), wmaps, beta, temps,
        iters_per_temp, damping, interpret)
    return labels[0] if squeeze else labels
