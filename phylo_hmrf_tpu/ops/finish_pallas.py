"""Pallas TPU kernel: fused posterior/cost/sufficient-stats pass.

The E-step tail (reference `phylo_hmrf.py:270-468` — pairwise potentials,
mean-field posteriors, the four costs, and the (K,), (K,F), (K,F,F)
sufficient statistics) only *reduces*: nothing downstream ever reads the
per-pixel posteriors. The jnp path (`ops/potts.py`) materializes the
(H, W, K) agreement tensor, the potential, two softmaxes and the posterior
field in HBM — ~8x the essential traffic. This kernel computes everything
per row-tile in VMEM and emits just the per-region accumulators:

  post (R, K)   obs (R, K, F)   obs2 (R, K, F*F)
  sums (R, 8) = [pp_sum, ppn_sum, lp_sum, n_valid, 0, 0, 0, 0]

from which the caller forms the reference cost vector
(`posteriors_and_costs` semantics, `phylo_hmrf.py:334-396`):

  pairwise_cost     = pp_sum / n_valid
  pairwise_cost_nrm = -ppn_sum / n_valid
  unary_cost        = -lp_sum / n_valid
  cost1             = unary_cost + pairwise_cost_nrm

Accumulation uses the sequential-grid revisit pattern: the per-region
output blocks keep index (r, 0) across all row tiles i, so they stay
resident in VMEM and accumulate; they flush to HBM when r advances.

Float note: per-tile MXU accumulation reassociates the big reductions vs
the jnp einsum, so stats/costs match the jnp path to ~1e-6 relative (gated
in tests/test_finish_pallas.py), not bitwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phylo_hmrf_tpu.data.regions import DIRS
from phylo_hmrf_tpu.ops.mf_pallas import _HALO, _shift2, \
    _VMEM_LIMIT, pick_tile_h


def _finish_kernel(scalars_ref, lp_ref, img_ref, mask_ref, labp_ref, wp_ref,
                   post_ref, obs_ref, obs2_ref, sums_ref,
                   lab_scratch, w_scratch, sem, *, tile_h: int,
                   negate: bool = False):
    r = pl.program_id(0)
    i = pl.program_id(1)
    beta = scalars_ref[0, 0]
    small_eps = scalars_ref[1, 0]

    row0 = i * tile_h
    slab_rows = pl.ds(row0, tile_h + 2 * _HALO)
    cp_l = pltpu.make_async_copy(labp_ref.at[r, slab_rows, :], lab_scratch,
                                 sem.at[0])
    cp_w = pltpu.make_async_copy(wp_ref.at[r, :, slab_rows, :], w_scratch,
                                 sem.at[1])
    cp_l.start()
    cp_w.start()
    cp_l.wait()
    cp_w.wait()

    lab = lab_scratch[:]        # (S, W) int32
    w = w_scratch[:]            # (4, S, W)
    # IEEE negation is exact, so accepting the unary field (-logprob)
    # directly and flipping it per-tile here is bitwise identical to the
    # caller materializing a second K-major slab just to negate it —
    # which is what `-unary_k` at a pallas_call operand would do (custom
    # calls take buffers; XLA cannot fuse elementwise into them). At
    # K=30 on a 3424^2 region that slab is 1.4 GB of peak HBM.
    logprob = -lp_ref[0] if negate else lp_ref[0]   # (K, TH, W)
    img = img_ref[0]            # (F, TH, W)
    valid = mask_ref[0] != 0    # (TH, W)
    K = logprob.shape[0]
    F = img.shape[0]
    W = lab.shape[1]
    c = _HALO

    # weighted neighbor agreement + weight sum at center rows (the exact
    # `neighbor_sums` computation, ops/potts.py:49)
    ks = jax.lax.broadcasted_iota(jnp.int32, (K, tile_h, W), 0)
    agree = jnp.zeros((K, tile_h, W), w.dtype)
    wsum = jnp.zeros((tile_h, W), w.dtype)
    lab_center = lab[c:c + tile_h, :]
    for d, (dr, dc) in enumerate(DIRS):
        nb = _shift2(lab[None], dr, dc)[0][c:c + tile_h, :]
        w_d = w[d, c:c + tile_h, :]
        agree += w_d[None] * (nb[None] == ks).astype(w.dtype)
        wsum += w_d
        nbm = _shift2(lab[None], -dr, -dc)[0][c:c + tile_h, :]
        w_sh = _shift2(w[d][None], -dr, -dc)[0][c:c + tile_h, :]
        agree += w_sh[None] * (nbm[None] == ks).astype(w.dtype)
        wsum += w_sh
    pp = beta * (wsum[None] - agree)                     # (K, TH, W)

    # posteriors and the two softmax fields, K-major
    z1 = logprob - pp
    z1 = z1 - jnp.max(z1, axis=0, keepdims=True)
    e1 = jnp.exp(z1)
    g = e1 / jnp.sum(e1, axis=0, keepdims=True)          # posteriors
    z2 = -pp - jnp.max(-pp, axis=0, keepdims=True)
    e2 = jnp.exp(z2)
    ppn = e2 / jnp.sum(e2, axis=0, keepdims=True)

    onehot = (lab_center[None] == ks).astype(w.dtype)    # (K, TH, W)
    vm = valid.astype(w.dtype)
    pp_map = jnp.sum(pp * onehot, axis=0)
    lp_map = jnp.sum(logprob * onehot, axis=0)
    ppn_map = jnp.sum(ppn * onehot, axis=0)
    pp_sum = jnp.sum(vm * pp_map)
    lp_sum = jnp.sum(vm * lp_map)
    ppn_sum = jnp.sum(vm * jnp.log(ppn_map + small_eps))
    n_valid = jnp.sum(vm)

    # masked sufficient statistics on the MXU: g (K, N) @ x-features (N, ...)
    gm = (g * vm[None]).reshape(K, tile_h * W)
    x = img.reshape(F, tile_h * W)
    post_t = jnp.sum(gm, axis=1)                                    # (K,)
    obs_t = jax.lax.dot_general(
        gm, x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                         # (K, F)
    xx = (x[:, None, :] * x[None, :, :]).reshape(F * F, tile_h * W)
    obs2_t = jax.lax.dot_general(
        gm, xx, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                         # (K, F*F)

    sums_t = jnp.stack([pp_sum, ppn_sum, lp_sum, n_valid,
                        0.0, 0.0, 0.0, 0.0])

    # the outputs are single full-array blocks (tiny, so exempt from the
    # (8, 128) tile rule) resident in VMEM for the whole grid; accumulate
    # into row r across the row tiles i
    rr = pl.ds(r, 1)

    @pl.when(i == 0)
    def _init():
        post_ref[rr, :] = post_t[None]
        obs_ref[rr, :, :] = obs_t[None]
        obs2_ref[rr, :, :] = obs2_t[None]
        sums_ref[rr, :] = sums_t[None]

    @pl.when(i != 0)
    def _acc():
        post_ref[rr, :] += post_t[None]
        obs_ref[rr, :, :] += obs_t[None]
        obs2_ref[rr, :, :] += obs2_t[None]
        sums_ref[rr, :] += sums_t[None]


def _energy_kernel(scalars_ref, un_ref, mask_ref, labp_ref, wp_ref,
                   out_ref, lab_scratch, w_scratch, sem, *, tile_h: int):
    """Per-region MRF energy sums (`ops/potts.py::potts_energy` semantics):
    e = sum_p(valid) unary[p, s_p] + beta * sum_d sum_p w_d[p] [s_p != s_nb].
    Forward edges only — each edge counted once at its source pixel; w = 0
    on every edge leaving the grid or touching an invalid pixel."""
    r = pl.program_id(0)
    i = pl.program_id(1)
    beta = scalars_ref[0, 0]

    row0 = i * tile_h
    slab_rows = pl.ds(row0, tile_h + 2 * _HALO)
    cp_l = pltpu.make_async_copy(labp_ref.at[r, slab_rows, :], lab_scratch,
                                 sem.at[0])
    cp_w = pltpu.make_async_copy(wp_ref.at[r, :, slab_rows, :], w_scratch,
                                 sem.at[1])
    cp_l.start()
    cp_w.start()
    cp_l.wait()
    cp_w.wait()

    lab = lab_scratch[:]
    w = w_scratch[:]
    unary = un_ref[0]          # (K, TH, W)
    valid = mask_ref[0] != 0
    K = unary.shape[0]
    W = lab.shape[1]
    c = _HALO
    lab_center = lab[c:c + tile_h, :]

    ks = jax.lax.broadcasted_iota(jnp.int32, (K, tile_h, W), 0)
    u_at = jnp.sum(unary * (lab_center[None] == ks).astype(unary.dtype),
                   axis=0)
    e_u = jnp.sum(jnp.where(valid, u_at, 0.0))
    e_p = jnp.zeros((), unary.dtype)
    for d, (dr, dc) in enumerate(DIRS):
        nb = _shift2(lab[None], dr, dc)[0][c:c + tile_h, :]
        diff = (lab_center != nb).astype(unary.dtype)
        e_p += jnp.sum(w[d, c:c + tile_h, :] * diff)
    tot = jnp.stack([e_u + beta * e_p, 0.0, 0.0, 0.0,
                     0.0, 0.0, 0.0, 0.0])

    rr = pl.ds(r, 1)

    @pl.when(i == 0)
    def _init():
        out_ref[rr, :] = tot[None]

    @pl.when(i != 0)
    def _acc():
        out_ref[rr, :] += tot[None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def potts_energy_pallas(unary_k: jnp.ndarray, mask: jnp.ndarray,
                        labels: jnp.ndarray, wmaps: jnp.ndarray, beta, *,
                        interpret: bool = False) -> jnp.ndarray:
    """Per-region total MRF energy, fused reduction. unary_k (R, K, H, W);
    mask (R, H, W) int32; labels (R, H, W) int32; wmaps (R, 4, H, W).
    Returns (R,) energies matching `potts_energy` to reduction order."""
    R, K, H, W = unary_k.shape
    F = 1
    tile_h = _pick_tile_h_finish(H, K, F, W)
    labp = jnp.pad(labels, [(0, 0), (_HALO, _HALO), (0, 0)])
    wp = jnp.pad(wmaps, [(0, 0), (0, 0), (_HALO, _HALO), (0, 0)])
    scalars = jnp.asarray([[beta]], unary_k.dtype)

    slab = tile_h + 2 * _HALO
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(R, H // tile_h),
        in_specs=[
            pl.BlockSpec((1, 1), lambda r, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, tile_h, W), lambda r, i: (r, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, W), lambda r, i: (r, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((R, 8), lambda r, i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slab, W), jnp.int32),
            pltpu.VMEM((4, slab, W), unary_k.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_energy_kernel, tile_h=tile_h)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, 8), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(scalars, unary_k, mask, labp, wp)
    return out[:, 0]


def _vmem_use_finish(th: int, K: int, F: int, W: int) -> int:
    slab = th + 2 * _HALO
    return 4 * ((2 + 4) * K * th * W        # logprob block + pp/g/ppn temps
                + (F + F * F + 2) * th * W  # img block + xx + mask/maps
                + (4 + 4) * slab * W        # w slab + shifted copies
                + 2 * slab * W)             # label slab + shifted


def _pick_tile_h_finish(H: int, K: int, F: int, W: int,
                        budget_bytes: int = 0) -> int:
    return pick_tile_h(H, lambda th: _vmem_use_finish(th, K, F, W),
                       budget_bytes)


@functools.partial(jax.jit, static_argnames=("interpret", "negate"))
def finish_stats_pallas(logprob_k: jnp.ndarray, img_f: jnp.ndarray,
                        mask: jnp.ndarray, labels: jnp.ndarray,
                        wpp: jnp.ndarray, beta, small_eps, *,
                        interpret: bool = False, negate: bool = False):
    """Fused posterior/cost/stats pass over a region batch.

    logprob_k (R, K, H, W); img_f (R, F, H, W); mask (R, H, W) int32;
    labels (R, H, W) int32; wpp (R, 4, H, W) — the pairwise-potential
    weight maps (`weight_maps` for estimate_type==3, `valid_maps`
    otherwise). With ``negate`` the first operand is the UNARY field
    (-logprob) and is flipped in-kernel — bitwise identical, and it
    spares the caller a second K-major HBM slab (see _finish_kernel).
    Returns (post (R, K), obs (R, K, F), obs2 (R, K, F, F),
    sums (R, 8) = [pp_sum, ppn_sum, lp_sum, n_valid, 0...]).
    """
    R, K, H, W = logprob_k.shape
    F = img_f.shape[1]
    tile_h = _pick_tile_h_finish(H, K, F, W)
    labp = jnp.pad(labels, [(0, 0), (_HALO, _HALO), (0, 0)])
    wp = jnp.pad(wpp, [(0, 0), (0, 0), (_HALO, _HALO), (0, 0)])
    scalars = jnp.stack([jnp.asarray(beta, logprob_k.dtype),
                         jnp.asarray(small_eps, logprob_k.dtype)])

    slab = tile_h + 2 * _HALO
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(R, H // tile_h),
        in_specs=[
            pl.BlockSpec((2, 1), lambda r, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, tile_h, W), lambda r, i: (r, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, tile_h, W), lambda r, i: (r, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, W), lambda r, i: (r, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((R, K), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, K, F), lambda r, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, K, F * F), lambda r, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 8), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((slab, W), jnp.int32),
            pltpu.VMEM((4, slab, W), logprob_k.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_finish_kernel, tile_h=tile_h, negate=negate)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT)
    post, obs, obs2, sums = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((R, K), jnp.float32),
            jax.ShapeDtypeStruct((R, K, F), jnp.float32),
            jax.ShapeDtypeStruct((R, K, F * F), jnp.float32),
            jax.ShapeDtypeStruct((R, 8), jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(scalars.reshape(2, 1), logprob_k, img_f, mask, labp, wp)
    return post, obs, obs2.reshape(R, K, F, F), sums
