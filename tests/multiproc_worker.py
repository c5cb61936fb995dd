"""Worker for the multi-host data-parallel EM tests
(tests/test_multiproc_fit.py). Runs a MultiProcessPhyloHMRF fit over this
process's share of a deterministic 4-region synthetic problem and prints
the cost rows + final params as JSON. With --kill-after, the process
raises SIGKILL on itself mid-fit (elastic-recovery scenario); with
--resume, it resumes from the given checkpoint."""

import argparse
import json
import os
import signal
import sys


def build_problem(tree):
    import numpy as np
    from phylo_hmrf_tpu.data.regions import (
        flat_index_order, region_from_samples)
    from phylo_hmrf_tpu.models.ou import ou_moments
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    K = 3
    params = rng.random((K, tree.n_params)) * 0.5 + 0.2
    n = tree.n_nodes
    for c in range(K):
        params[c, tree.n_params - n:] = 0.6 * c + 0.3
    moments = [ou_moments(jnp.asarray(params[c]), tree) for c in range(K)]
    means = np.stack([np.asarray(m) for m, _ in moments])
    covs = np.stack([np.asarray(V) + 1e-3 * np.eye(tree.n_leaves)
                     for _, V in moments])
    regions = []
    for ridx, h0 in enumerate((16, 12, 20, 14)):
        ii, jj = np.indices((h0, h0))
        lab = ((ii // 5 + jj // 5 + ridx) % K).astype(np.int32)
        rows, cols = flat_index_order(h0, h0, True)
        lab_flat = lab[rows, cols]
        x = np.stack([rng.multivariate_normal(means[c], covs[c] * 0.3)
                      for c in lab_flat]).astype(np.float32)
        regions.append(region_from_samples(
            np.abs(x) + 0.05, h0, h0, True, pad_h=8, pad_w=8,
            region_id=ridx))
    return regions


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--miter", type=int, default=4)
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--kill-after", type=int, default=0,
                    help="SIGKILL self after this many iterations (pid 0)")
    ap.add_argument("--stall-after", type=int, default=0,
                    help="hang (sleep forever) after this many iterations")
    ap.add_argument("--collective-timeout", type=float, default=0,
                    help="set PHMRF_COLLECTIVE_TIMEOUT_S for this worker")
    ap.add_argument("--init", choices=["fixed", "kmeans"], default="fixed")
    ap.add_argument("--spatial", action="store_true",
                    help="row-shard each local region over this process's "
                         "devices (shard_mode='spatial') — composes halo "
                         "sharding with cross-process data parallelism")
    ap.add_argument("--devices", type=int, default=1,
                    help="virtual CPU devices per process")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if args.collective_timeout:
        os.environ["PHMRF_COLLECTIVE_TIMEOUT_S"] = str(
            args.collective_timeout)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from phylo_hmrf_tpu.parallel.distributed import initialize_distributed
    initialize_distributed(f"127.0.0.1:{args.port}", args.nproc, args.pid)

    import numpy as np
    from phylo_hmrf_tpu.config import PhyloHMRFConfig
    from phylo_hmrf_tpu.parallel.multiproc import (
        MultiProcessPhyloHMRF, partition_regions)
    from phylo_hmrf_tpu.tree import build_tree

    tree = build_tree([(0, 1), (0, 2), (2, 3), (2, 4)],
                      species=["a", "b", "c"])
    regions = build_problem(tree)
    local, total = partition_regions(regions, args.nproc, args.pid)
    cfg = PhyloHMRFConfig(n_states=3, seed=1, max_iter=args.miter,
                          min_iter=99, threshold=0, patience=99,
                          mstep_iters=25, pad_h=8, pad_w=8,
                          final_polish=False,
                          shard_mode="spatial" if args.spatial else "region")
    mesh = None
    if args.spatial:
        from phylo_hmrf_tpu.parallel.mesh import make_mesh
        # each process's mesh spans only ITS OWN (addressable) devices —
        # the composition under test is per-process halo sharding x
        # cross-process data parallelism
        mesh = make_mesh(devices=jax.local_devices())
    model = MultiProcessPhyloHMRF(tree, local, cfg, n_samples_total=total,
                                  mesh=mesh)
    if args.init == "kmeans":
        model.initialize()   # local k-means, process-0 params broadcast
    else:
        # deterministic identical init on every process (and in the
        # single-process comparator): fixed params + zero warm labels
        import jax.numpy as jnp
        from phylo_hmrf_tpu.models.ou import ou_moments
        rng3 = np.random.default_rng(5)
        model.params_vec = (rng3.random((3, tree.n_params)) * 0.5
                            + 0.2).astype(np.float64)
        model.init_ou_params = model.params_vec.copy()
        means, covs = [], []
        for c in range(3):
            m, V = ou_moments(jnp.asarray(model.params_vec[c]), tree)
            means.append(np.asarray(m))
            covs.append(np.asarray(V) + cfg.min_covar * np.eye(3))
        model.means_ = np.stack(means)
        model.covars_ = np.stack(covs)
        model.labels_local = [np.zeros(r.shape, np.int32)
                              for r in model.regions]
        model.init_labels = np.zeros(model.n_samples, np.int32)

    kill_after = args.kill_after
    ckpt = args.checkpoint or None

    def cb(m, it, cost_row, grids):
        if kill_after and args.pid == 0 and it + 1 >= kill_after:
            os.kill(os.getpid(), signal.SIGKILL)
        if args.stall_after and it + 1 >= args.stall_after:
            import time
            time.sleep(3600)

    result = model.fit(verbose=False, checkpoint_path=ckpt,
                       checkpoint_every=2, callback=cb)
    print("WORKER_JSON " + json.dumps({
        "pid": args.pid,
        "cost_vec": np.asarray(result.cost_vec).tolist(),
        "params_sum": float(np.sum(result.params_vec)),
        "n_iters": int(result.n_iters),
    }))


if __name__ == "__main__":
    main()
