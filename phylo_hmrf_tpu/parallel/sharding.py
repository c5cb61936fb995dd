"""Multi-chip E-step: regions sharded over the device mesh.

Replaces the reference's one-OS-process-per-region fan-out + mp.Queue gather
(base.py:352-396) with `jax.shard_map` over a `Mesh`: each device runs the
jitted E-step on its region shard, sufficient statistics reduce with `psum`
over ICI (the Queue gather's TPU-native equivalent), and per-region
costs/labels stay sharded until the host reads them.

Regions never share Potts edges (edge lists are built per region in the
reference too, phylo_hmrf.py:101), so the shard boundary is exact — no halo
exchange is needed at region granularity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from phylo_hmrf_tpu.models.hmrf import _estep_bucket


def pad_bucket_to_devices(img, mask, dmaps, n_devices: int):
    """Pad a region bucket's leading axis to a multiple of n_devices with
    empty (all-masked-out) regions. Empty regions contribute zero stats and
    their costs are ignored by the caller (n_valid == 0)."""
    R = img.shape[0]
    pad = (-R) % n_devices
    if pad == 0:
        return img, mask, dmaps, R
    img = np.concatenate(
        [img, np.zeros((pad,) + img.shape[1:], img.dtype)], axis=0)
    mask = np.concatenate(
        [mask, np.zeros((pad,) + mask.shape[1:], bool)], axis=0)
    dmaps = np.concatenate(
        [dmaps, np.full((pad,) + dmaps.shape[1:], np.inf, dmaps.dtype)],
        axis=0)
    return img, mask, dmaps, R


def make_sharded_estep(mesh: Mesh, *, weighted_pp: bool,
                       labeler: str, max_sweeps: int,
                       use_pallas: bool = False, axis: str = "data"):
    """Build a jitted, shard_mapped E-step over `mesh`.

    The returned function has the same signature/returns as
    models.hmrf._estep_bucket but requires the bucket's leading region axis
    to be divisible by the mesh size; per-region stats come back sharded
    over the mesh like the labels (the host's fixed-order f64 sum replaces
    the former on-device psum, keeping the reduction order identical to a
    single-device run's)."""

    local = functools.partial(
        _estep_bucket, weighted_pp=weighted_pp,
        labeler=labeler, max_sweeps=max_sweeps, use_pallas=use_pallas)

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P(), P(), P()),
        out_specs=(P(axis), (P(axis), P(axis), P(axis)), P(axis), P(axis)),
        check_vma=False)
    return jax.jit(sharded)


def device_put_bucket(mesh: Mesh, img, mask, dmaps, axis: str = "data"):
    """Place bucket arrays with the leading axis sharded over the mesh so the
    E-step consumes them without a relayout."""
    spec = NamedSharding(mesh, P(axis))
    return (jax.device_put(jnp.asarray(img), spec),
            jax.device_put(jnp.asarray(mask), spec),
            jax.device_put(jnp.asarray(dmaps), spec))
