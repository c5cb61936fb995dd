"""Pallas TPU kernels for the push-relabel grid min-cut hot loops.

`ops/maxflow_tpu.py::grid_mincut` spends its time in two stencil loops:
the Jacobi push-relabel iteration and the min-plus BFS of the periodic
global relabel (measured on a real chr22 swap move: 398 push sweeps and
1240 BFS sweeps at ~0.09 ms each — dozens of (H, W)/(8, H, W) HBM
round-trips per sweep). Both are radius-bounded stencils, so the same
temporal-blocking wedge as ops/mf_pallas.py applies:

* one BFS min-plus sweep has radius 1 -> 8 sweeps per kernel instance;
* one push-relabel iteration has radius 2 (outgoing flow depends on
  neighbor heights -> radius 1; incoming flow on neighbors' outgoing and
  the relabel min over post-push capacities -> radius 2)
  -> 4 iterations per instance under the 8-row halo.

Out-of-array rows are inert by construction: zero capacities mean no flow
crosses and no BFS distance propagates, so halo garbage never reaches a
center row within the wedge. The cut itself is exact regardless of the
sweep schedule — push-relabel's invariants do not depend on update order
(gated against the C++ Dinic oracle and brute force in
tests/test_maxflow_tpu.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phylo_hmrf_tpu.ops.mf_pallas import _HALO, _shift2, \
    _VMEM_LIMIT, pick_tile_h
from phylo_hmrf_tpu.ops.maxflow_tpu import ALL_DIRS, _EPS, _rev


def _nb(x, d):
    """Value at the direction-d neighbor inside a slab (zero shifted in).
    The shifted-in value never matters: every read is guarded by a
    capacity-positive test and boundary arcs have capacity exactly 0."""
    di, dj = ALL_DIRS[d]
    return _shift2(x, di, dj)


def _bfs_kernel(scalars_ref, dp_ref, caps_ref, out_ref,
                d_scratch, caps_scratch, sem, *, tile_h: int, n_inner: int):
    """The sink-seed term (d <= 1 where cap_t > 0) is already baked into the
    caller's d0, and min-plus updates only decrease d, so re-applying the
    seed every sweep (as the jnp path does) is a no-op — the kernel needs
    no cap_t at all.

    Grid is (R, tiles): a leading region-batch axis so batched multi-label
    optimizers (`maxflow_tpu._optimize_batched`) run one kernel over a
    whole same-shape bucket — vmap of a manual-DMA pallas_call cannot
    lower on TPU (ANY-space blocks must cover the full array)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    n = scalars_ref[0, 0]

    row0 = i * tile_h
    slab_rows = pl.ds(row0, tile_h + 2 * _HALO)
    cp_d = pltpu.make_async_copy(dp_ref.at[b, slab_rows, :], d_scratch,
                                 sem.at[0])
    cp_c = pltpu.make_async_copy(caps_ref.at[b, :, slab_rows, :],
                                 caps_scratch, sem.at[1])
    cp_d.start()
    cp_c.start()
    cp_d.wait()
    cp_c.wait()

    d = d_scratch[:]          # (S, W) int32
    caps = caps_scratch[:]    # (8, S, W)
    c = _HALO

    for _ in range(n_inner):
        best = d
        for dd in range(8):
            nb_d = _nb(d, dd)
            # shifted-in zeros would act as distance 0: masked by capacity
            # (boundary arcs have capacity exactly 0)
            cand = jnp.where(caps[dd] > _EPS, nb_d + 1, n)
            best = jnp.minimum(best, cand)
        d = jnp.minimum(best, n)

    out_ref[0] = d[c:c + tile_h, :]


def _pr_kernel(scalars_ref, ep_ref, hp_ref, captp_ref, caps_ref,
               e_out, h_out, capt_out, caps_out,
               e_s, h_s, capt_s, caps_s, sem, *, tile_h: int, n_inner: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n = scalars_ref[0, 0]

    row0 = i * tile_h
    slab_rows = pl.ds(row0, tile_h + 2 * _HALO)
    cps = [pltpu.make_async_copy(ep_ref.at[b, slab_rows, :], e_s,
                                 sem.at[0]),
           pltpu.make_async_copy(hp_ref.at[b, slab_rows, :], h_s,
                                 sem.at[1]),
           pltpu.make_async_copy(captp_ref.at[b, slab_rows, :], capt_s,
                                 sem.at[2]),
           pltpu.make_async_copy(caps_ref.at[b, :, slab_rows, :], caps_s,
                                 sem.at[3])]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    e = e_s[:]
    h = h_s[:]
    cap_t = capt_s[:]
    caps = caps_s[:]
    c = _HALO

    for _ in range(n_inner):
        # push to sink (h == 1)
        can = h == 1
        delta = jnp.where(can, jnp.minimum(e, cap_t), 0.0)
        e = e - delta
        cap_t = cap_t - delta

        # Jacobi neighbor pushes: outgoing against the local budget only
        outs = []
        for dd in range(8):
            nb_h = _nb(h, dd)
            admissible = (h == nb_h + 1) & (h < n)
            d_out = jnp.where(admissible, jnp.minimum(e, caps[dd]), 0.0)
            e = e - d_out
            outs.append(d_out)
        inc = [_nb(outs[_rev(dd)], dd) for dd in range(8)]
        caps = jnp.stack([caps[dd] - outs[dd] + inc[dd] for dd in range(8)])
        for dd in range(8):
            e = e + inc[dd]

        # relabel active nodes with no admissible arc
        active = (e > _EPS) & (h < n)
        min_h = jnp.where(cap_t > _EPS, 0, n).astype(jnp.int32)
        for dd in range(8):
            nb_h = _nb(h, dd)
            min_h = jnp.minimum(min_h,
                                jnp.where(caps[dd] > _EPS, nb_h, n))
        new_h = jnp.minimum(min_h + 1, n).astype(jnp.int32)
        h = jnp.where(active, jnp.maximum(h, new_h), h)

    e_out[0] = e[c:c + tile_h, :]
    h_out[0] = h[c:c + tile_h, :]
    capt_out[0] = cap_t[c:c + tile_h, :]
    caps_out[0] = caps[:, c:c + tile_h, :]


def _pick_tile(H: int, W: int, fields: int,
               budget_bytes: int = 0) -> int:
    return pick_tile_h(H, lambda th: 4 * fields * (th + 2 * _HALO) * W,
                       budget_bytes)


@functools.partial(jax.jit, static_argnames=("n_inner", "interpret"))
def bfs_sweeps_pallas(d, caps, n, *, n_inner: int = 8,
                      interpret: bool = False):
    """``n_inner`` min-plus BFS sweeps toward the sink in one kernel.
    d (R, H, W) int32 distances (seeded by the caller); caps (R, 8, H, W).
    Also accepts unbatched (H, W)/(8, H, W). Returns the updated distances
    (monotone toward the fixpoint)."""
    if d.ndim == 2:
        return bfs_sweeps_pallas(d[None], caps[None], n, n_inner=n_inner,
                                 interpret=interpret)[0]
    R, H, W = d.shape
    tile_h = _pick_tile(H, W, fields=8 + 4 + 8)
    dp = jnp.pad(d, [(0, 0), (_HALO, _HALO), (0, 0)], constant_values=0)
    capsp = jnp.pad(caps, [(0, 0), (0, 0), (_HALO, _HALO), (0, 0)])
    scalars = jnp.asarray([[n]], jnp.int32)
    slab = tile_h + 2 * _HALO

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(R, H // tile_h),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slab, W), jnp.int32),
            pltpu.VMEM((8, slab, W), caps.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_bfs_kernel, tile_h=tile_h, n_inner=n_inner)
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
    )(scalars, dp, capsp)


@functools.partial(jax.jit, static_argnames=("n_inner", "interpret"))
def pr_iterations_pallas(e, h, cap_t, caps, n, *, n_inner: int = 4,
                         interpret: bool = False):
    """``n_inner`` (<= 4 under the 8-row halo: radius 2/iteration)
    push-relabel iterations in one kernel. e/h/cap_t (R, H, W), caps
    (R, 8, H, W); also accepts unbatched. Returns (e, h, cap_t, caps)."""
    if e.ndim == 2:
        out = pr_iterations_pallas(e[None], h[None], cap_t[None],
                                   caps[None], n, n_inner=n_inner,
                                   interpret=interpret)
        return tuple(a[0] for a in out)
    R, H, W = e.shape
    tile_h = _pick_tile(H, W, fields=2 * (8 + 3) + 8)
    pad2 = [(0, 0), (_HALO, _HALO), (0, 0)]
    ep = jnp.pad(e, pad2)
    hp = jnp.pad(h, pad2)
    captp = jnp.pad(cap_t, pad2)
    capsp = jnp.pad(caps, [(0, 0), (0, 0), (_HALO, _HALO), (0, 0)])
    scalars = jnp.asarray([[n]], jnp.int32)
    slab = tile_h + 2 * _HALO

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(R, H // tile_h),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, W), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, W), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, W), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile_h, W), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((slab, W), e.dtype),
            pltpu.VMEM((slab, W), jnp.int32),
            pltpu.VMEM((slab, W), e.dtype),
            pltpu.VMEM((8, slab, W), e.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    kernel = functools.partial(_pr_kernel, tile_h=tile_h, n_inner=n_inner)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((R, H, W), e.dtype),
            jax.ShapeDtypeStruct((R, H, W), jnp.int32),
            jax.ShapeDtypeStruct((R, H, W), e.dtype),
            jax.ShapeDtypeStruct((R, 8, H, W), e.dtype),
        ],
        interpret=interpret,
        **kwargs,
    )(scalars, ep, hp, captp, capsp)
