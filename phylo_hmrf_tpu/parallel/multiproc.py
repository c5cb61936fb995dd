"""Multi-host data-parallel EM: one process per host, regions partitioned
across processes.

This is the host-scale analogue of the reference's one-OS-process-per-
region fan-out (`base.py:352-372`): each process loads and E-steps only its
own regions on its own chips, and the cross-process traffic is exactly what
the reference put through mp.Queue — sufficient statistics and the weighted
cost scalars — here reduced with `jax.experimental.multihost_utils` over
the jax.distributed backend (`parallel/distributed.py`).

Consistency model: process 0's k-means/OU init is broadcast to all
processes (`initialize`), every process then sees identical global stats
and cost scalars each iteration, so the (replicated) M-step and all
convergence/patience decisions evolve in lockstep; per-region labels stay
process-local, exactly like the reference's worker-local labels. The fit
loop itself is unchanged — the subclass only fills the two reduction
hooks (`estep` stats, `_cost_allreduce`) and the global sample count.

Elastic recovery composes with checkpoint/resume: process 0 writes the
checkpoint (pass `checkpoint_path` only there, or per-process paths); on a
worker failure the job restarts and resumes from the last checkpoint —
gated end-to-end by tests/test_multiproc_fit.py (SIGKILL of a 2-process
fit, restart, resumed costs match the uninterrupted run).
"""

from __future__ import annotations

import numpy as np

from phylo_hmrf_tpu.models.hmrf import PhyloHMRF


def partition_regions(regions, n_processes: int, process_id: int):
    """Deterministic size-balanced partition: regions sorted by sample
    count, dealt snake-wise over processes. Returns (local_regions,
    n_samples_total)."""
    order = sorted(range(len(regions)),
                   key=lambda i: (-regions[i].n_samples, i))
    owner = {}
    for rank, idx in enumerate(order):
        lap, pos = divmod(rank, n_processes)
        owner[idx] = pos if lap % 2 == 0 else n_processes - 1 - pos
    local = [r for i, r in enumerate(regions) if owner[i] == process_id]
    total = int(sum(r.n_samples for r in regions))
    return local, total


def _allreduce_sum(x: np.ndarray) -> np.ndarray:
    """Sum an identical-shaped host array across all jax processes."""
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return x
    gathered = multihost_utils.process_allgather(
        np.asarray(x, np.float64))
    return np.sum(gathered, axis=0)


class MultiProcessPhyloHMRF(PhyloHMRF):
    """PhyloHMRF over this process's region subset; stats/costs reduce
    globally. Construct with the LOCAL regions and the GLOBAL sample count
    (see `partition_regions`)."""

    def __init__(self, tree, local_regions, config=None, *,
                 n_samples_total: int, mesh=None):
        super().__init__(tree, local_regions, config, mesh=mesh)
        self.n_samples_total = int(n_samples_total)

    def initialize(self):
        """Local k-means/OU init, then broadcast process 0's parameters so
        every process starts the EM from the same state (warm-start label
        grids stay local — they are re-labeled by the first E-step)."""
        import jax
        from jax.experimental import multihost_utils

        super().initialize()
        if jax.process_count() > 1:
            synced = multihost_utils.broadcast_one_to_all(
                (self.params_vec, self.init_ou_params, self.means_,
                 self.covars_))
            self.params_vec, self.init_ou_params = (
                np.asarray(synced[0]), np.asarray(synced[1]))
            self.means_, self.covars_ = (np.asarray(synced[2]),
                                         np.asarray(synced[3]))

    def estep(self, means, covars, warm_grids):
        label_grids, (post, obs, obs2), costs, nvalid = super().estep(
            means, covars, warm_grids)
        post = _allreduce_sum(post)
        obs = _allreduce_sum(obs)
        obs2 = _allreduce_sum(obs2)
        return label_grids, (post, obs, obs2), costs, nvalid

    def _cost_allreduce(self, partial: np.ndarray) -> np.ndarray:
        return _allreduce_sum(partial)
