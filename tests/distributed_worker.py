"""Worker for the real 2-process jax.distributed test
(test_misc.py::test_distributed_two_processes). Each process owns 2 virtual
CPU devices; the 4-device "data" mesh spans the process boundary, so the
psum (sufficient-stats reduction) and the ppermute halo exchange exercised
here really cross processes — the communication patterns the framework uses
on pods (parallel/sharding.py, parallel/halo.py)."""

import json
import os
import sys


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from phylo_hmrf_tpu.parallel.distributed import initialize_distributed
    info = initialize_distributed(f"127.0.0.1:{port}", nproc, pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from phylo_hmrf_tpu.parallel.halo import extend_rows

    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("data",))
    n = len(devs)

    # sufficient-stats reduction pattern: per-shard partial sums -> psum
    glob = np.arange(n * 4, dtype=np.float32).reshape(n, 4)
    x = jax.make_array_from_callback(
        (n, 4), NamedSharding(mesh, P("data")), lambda idx: glob[idx])

    def stats_body(xs):
        return jax.lax.psum(jnp.sum(xs), "data")

    psum_val = float(jax.jit(jax.shard_map(
        stats_body, mesh=mesh, in_specs=P("data"), out_specs=P()))(x))

    # halo-exchange pattern: each shard's one row extends with neighbors'
    rows = np.arange(n * 8, dtype=np.float32).reshape(n, 8)
    r = jax.make_array_from_callback(
        (n, 8), NamedSharding(mesh, P("data")), lambda idx: rows[idx])

    def halo_body(xs):
        ext = extend_rows(xs, "data")          # (1+1+1, 8) per shard
        return jnp.sum(ext, axis=1)            # (3,)

    halo = jax.jit(jax.shard_map(
        halo_body, mesh=mesh, in_specs=P("data"), out_specs=P("data")))(r)
    shards = sorted(halo.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    halo_local = np.concatenate([np.asarray(s.data) for s in shards])

    # bit-exact cross-process collectives (parallel/multiproc.py):
    # 2^24 + 1 is not f32-representable, so a downcasting allgather would
    # round the sum; the ragged broadcast must return process 0's rows on
    # every process even though the local leading dims differ
    from phylo_hmrf_tpu.parallel.multiproc import (_allreduce_sum,
                                                   _broadcast_from_zero)
    red = _allreduce_sum(np.asarray([float(2**24 + 1 + pid)], np.float64))
    mine = (np.arange((3 + 2 * pid) * 2, dtype=np.float64)
            .reshape(-1, 2) + 0.1 + pid)
    bc = _broadcast_from_zero(mine)

    print("WORKER_JSON " + json.dumps({
        "pid": pid,
        "distributed": info["distributed"],
        "process_count": info["process_count"],
        "n_devices": info["n_devices"],
        "n_local_devices": info["n_local_devices"],
        "psum": psum_val,
        "psum_expected": float(glob.sum()),
        "halo_local": halo_local.tolist(),
        "allreduce_big": float(red[0]),
        "bcast": bc.tolist(),
    }), flush=True)


if __name__ == "__main__":
    main()
