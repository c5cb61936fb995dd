"""Fault-injection worker (test_io_cli.py::test_crash_recovery_sigkill):
runs a checkpointed fit and SIGKILLs ITSELF mid-EM — a real crash, not an
exception — leaving whatever the last checkpoint flush wrote on disk."""

import os
import signal
import sys


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    ckpt_path, kill_iter = sys.argv[1], int(sys.argv[2])

    from phylo_hmrf_tpu.config import PhyloHMRFConfig
    from phylo_hmrf_tpu.models.hmrf import PhyloHMRF
    from phylo_hmrf_tpu.tree import build_tree
    from tests.test_em import synth_problem

    tree = build_tree([(0, 1), (1, 2), (1, 3), (3, 4), (4, 5), (4, 6),
                       (3, 7)], branch_lengths=[0, 32, 20, 6, 6, 6, 12])
    rng = np.random.default_rng(7)
    _, _, _, regions, _ = synth_problem(tree, rng, K=3, H0=16)
    cfg = PhyloHMRFConfig(final_polish=False, n_states=3, max_iter=8, seed=1,
                          mstep_iters=30, pad_h=8, pad_w=8, min_iter=0,
                          threshold=1e-12)
    model = PhyloHMRF(tree, regions, cfg)

    def cb(model, it, cost_row, label_grids):
        if it == kill_iter:
            os.kill(os.getpid(), signal.SIGKILL)   # hard crash, no cleanup

    model.fit(verbose=False, checkpoint_path=ckpt_path, checkpoint_every=1,
              callback=cb)
    print("UNEXPECTED: fit completed")


if __name__ == "__main__":
    main()
