"""Golden debug dumps, simulation utilities, bed/analysis helpers,
distributed init no-op, profiling utilities."""

import os

import numpy as np
import pytest

from phylo_hmrf_tpu.tree import save_debug_dumps
from phylo_hmrf_tpu.utils.bedio import (
    parse_alignment_blocks, state_enrichment, write_tobed)
from phylo_hmrf_tpu.utils.profiling import ConvergenceMonitor, PhaseTimer
from phylo_hmrf_tpu.utils.simulate import (
    generate_sample_from_state, ou_moments_np, sample_potts_labels,
    simulate_region)


def test_debug_dumps_golden(example_tree, tmp_path):
    """ou_A1.txt / ou_A2.txt / base_mtx_* must match the reference's format
    and the hand-derived golden values of the example tree."""
    save_debug_dumps(example_tree, str(tmp_path))
    A1 = np.loadtxt(tmp_path / "ou_A1.txt")
    A2 = np.loadtxt(tmp_path / "ou_A2.txt")
    np.testing.assert_array_equal(A1, example_tree.A1)
    np.testing.assert_array_equal(A2, example_tree.A2)
    b0 = np.loadtxt(tmp_path / "base_mtx_0")
    np.testing.assert_array_equal(b0, np.ones((4, 4)))
    assert os.path.exists(tmp_path / "base_mtx_7")


def test_simulate_region(example_tree, rng):
    K = 3
    params = rng.random((K, example_tree.n_params)) * 0.5 + 0.2
    region, labels = simulate_region(rng, example_tree, params, 24, 24, True,
                                     pad_h=8, pad_w=8)
    assert region.is_diag
    assert labels.shape == (24, 24)
    np.testing.assert_array_equal(labels, labels.T)  # symmetric label map
    v = region.flat_values()
    assert np.isfinite(v).all() and (v > 0).all()


def test_potts_sampler_is_smooth(rng):
    labels = sample_potts_labels(rng, 40, 40, 3, beta=1.5, n_sweeps=20)
    # strong coupling -> neighbors mostly agree
    same = (labels[:-1, :] == labels[1:, :]).mean()
    assert same > 0.7, same
    assert set(np.unique(labels)) <= {0, 1, 2}


def test_generate_sample_from_state(example_tree, rng):
    params = rng.random(example_tree.n_params) * 0.5 + 0.2
    X = generate_sample_from_state(rng, example_tree, params, 20000)
    m, V = ou_moments_np(params, example_tree)
    np.testing.assert_allclose(X.mean(0), m, atol=0.05)
    np.testing.assert_allclose(np.cov(X.T), V + 1e-3 * np.eye(4), atol=0.05)


def test_state_enrichment():
    chroms = np.array([1, 1, 1, 1, 2, 2, 2, 2])
    states = np.array([0, 0, 0, 1, 1, 1, 1, 0])
    log_fc, fc = state_enrichment(chroms, states)
    assert fc.shape == (2, 2)
    # state 0 enriched on chr1 (3/4 vs global 4/8)
    np.testing.assert_allclose(fc[0, 0], (3 / 4) / (4 / 8))


def test_write_tobed(tmp_path):
    src = tmp_path / "in.txt"
    src.write_text("chr1\t0\t100\nchr1\t100\t200\n")
    out = tmp_path / "out.bed"
    write_tobed(str(src), str(out))
    lines = out.read_text().strip().split("\n")
    assert lines[0].split("\t") == ["chr1", "0", "100", "0"]
    assert lines[1].split("\t")[3] == "1"


def test_parse_alignment_blocks(tmp_path):
    f = tmp_path / "aln.txt"
    f.write_text(
        "hg38.chr21:100-5000 + x\n"
        "panTro5.chr21:200-4800 + x\n"
        "gorGor4.chr21:100-5100 + x\n"
        "panPan2.chr21:150-4700 + x\n"
        "hg38.chr21:6000-6200 + x\n"       # too short
        "panTro5.chr21:6000-6150 + x\n"
        "gorGor4.chr21:6000-6220 + x\n"
        "panPan2.chr21:6000-6190 + x\n"
        "hg38.chr2:0-9000 + x\n"           # chr2 -> chr2A allowed
        "panTro5.chr2A:0-9100 + x\n"
        "gorGor4.chr2:0-9050 + x\n"
        "panPan2.chr2B:0-9060 + x\n")
    out = parse_alignment_blocks(str(f), min_length=1000)
    assert "chr21" in out and len(out["chr21"]) == 1
    assert out["chr21"][0] == [100, 5000, 4900]
    assert "chr2" in out


@pytest.mark.smoke
def test_distributed_noop():
    from phylo_hmrf_tpu.parallel.distributed import initialize_distributed
    info = initialize_distributed()
    assert info["distributed"] is False
    assert info["process_count"] == 1


def test_phase_timer_and_monitor(tmp_path):
    t = PhaseTimer()
    with t.phase("estep"):
        pass
    with t.phase("estep"):
        pass
    s = t.summary()
    assert s["estep"]["count"] == 2

    log = tmp_path / "mon.jsonl"
    mon = ConvergenceMonitor(tol=1e-2, patience=5, log_file=str(log))
    mon.report(0, 1.0, 2.0, 3.0)
    mon.report(1, 1.0, 2.0, 3.0001)
    assert mon.converged
    assert not mon.exhausted_patience
    assert len(log.read_text().strip().split("\n")) == 2


def test_fit_accumulate_tracks_states(example_tree, rng):
    from phylo_hmrf_tpu.config import PhyloHMRFConfig
    from phylo_hmrf_tpu.models.hmrf import PhyloHMRF
    from tests.test_em import synth_problem
    _, _, _, regions, _ = synth_problem(example_tree, rng, K=3, H0=16)
    cfg = PhyloHMRFConfig(final_polish=False, n_states=3, max_iter=3, seed=1, mstep_iters=20,
                          pad_h=8, pad_w=8, min_iter=0, threshold=1e-9)
    model = PhyloHMRF(example_tree, regions, cfg)
    res = model.fit_accumulate(verbose=False)
    assert res.state_list is not None
    assert res.state_list.shape == (res.n_iters, model.n_samples)


def test_edge_dump_format(rng, tmp_path):
    from phylo_hmrf_tpu.data.regions import (flat_index_order,
                                             region_from_samples,
                                             save_edge_dump)
    rows, cols = flat_index_order(6, 6, True)
    vals = (rng.random((rows.shape[0], 2)) + 0.1).astype(np.float32)
    region = region_from_samples(vals, 6, 6, True, pad_h=2, pad_w=2)
    f = tmp_path / "edge_weightList_undirected.txt"
    save_edge_dump(region, str(f), beta1=0.5)
    data = np.loadtxt(f)
    assert data.shape[1] == 3
    assert (data[:, 0] < data[:, 1]).all()       # id1 < id2 ordering
    assert ((data[:, 2] > 0) & (data[:, 2] <= 1)).all()   # exp(-0.5 d)


def test_distributed_two_processes():
    """Real multi-process jax.distributed: two OS processes, each with 2
    virtual CPU devices, form one 4-device mesh; the sufficient-stats psum
    and the ppermute halo exchange cross the process boundary
    (parallel/distributed.py::initialize_distributed beyond its no-op
    branch)."""
    import json
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), "2"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-2000:]
        line = [ln for ln in out.splitlines()
                if ln.startswith("WORKER_JSON ")]
        assert line, out[-2000:]
        outs.append(json.loads(line[0][len("WORKER_JSON "):]))

    row_sum = [64 * i + 28 for i in range(4)]    # arange(32).reshape(4,8)
    for res in outs:
        assert res["distributed"] is True
        assert res["process_count"] == 2
        assert res["n_devices"] == 4 and res["n_local_devices"] == 2
        assert res["psum"] == res["psum_expected"] == 120.0
        halo = np.asarray(res["halo_local"]).reshape(2, 3)
        for k in range(2):
            i = 2 * res["pid"] + k
            top = row_sum[i - 1] if i > 0 else 0.0
            bot = row_sum[i + 1] if i < 3 else 0.0
            np.testing.assert_allclose(halo[k],
                                       [top, row_sum[i], bot])
        # _allreduce_sum is bit-exact above 2^24 (a downcasting allgather
        # would round both addends to 2^24): (2^24+1) + (2^24+2), exact
        assert res["allreduce_big"] == float(2 * 2**24 + 3)
        # ragged broadcast returns process 0's rows on BOTH processes
        np.testing.assert_array_equal(
            np.asarray(res["bcast"]),
            np.arange(6, dtype=np.float64).reshape(3, 2) + 0.1)


def test_fit_v1_variant(example_tree, rng):
    """Legacy v1 fit(): patience 20, no min-iteration stop guard, moments
    restored from the iter>=3 minimum (phylo_hmrf_v1/base.py:191)."""
    from phylo_hmrf_tpu.config import PhyloHMRFConfig
    from phylo_hmrf_tpu.models.hmrf import PhyloHMRF, _moments
    import jax.numpy as jnp
    from tests.test_em import synth_problem

    _, _, _, regions, _ = synth_problem(example_tree, rng, K=3, H0=16)
    cfg = PhyloHMRFConfig(final_polish=False, n_states=3, max_iter=6, seed=1,
                          mstep_iters=30, pad_h=8, pad_w=8)
    model = PhyloHMRF(example_tree, regions, cfg)
    res = model.fit_v1(verbose=False)
    assert cfg.min_iter == model.cfg.min_iter == 5   # cfg restored
    assert np.isfinite(res.cost_vec).all()
    # moments correspond to params_vec1 (the iter>=3 minimum), not the
    # overall best
    means, _ = _moments(jnp.asarray(res.params_vec1, jnp.float32),
                        tree=example_tree)
    np.testing.assert_allclose(res.means, np.asarray(means, np.float64),
                               rtol=1e-6)


def test_kmeans_seqmap_matches_vmap(monkeypatch):
    """Above the memory budget k-means trials run via lax.map instead of
    vmap; both paths must pick the same best trial from the same keys."""
    import jax
    import jax.numpy as jnp

    from phylo_hmrf_tpu.ops import kmeans as km

    X = jnp.asarray(np.random.default_rng(3).normal(
        size=(601, 3)).astype(np.float32))
    key = jax.random.PRNGKey(7)
    c_ref, l_ref, i_ref = km.kmeans(key, X, 4, n_iters=25, n_init=3)
    # same shapes would hit the cached trace; drop it so the patched
    # budget is read at the fresh trace
    km._kmeans_multi.clear_cache()
    monkeypatch.setattr(km, "_VMAP_TRIAL_BYTES", 0)
    c_map, l_map, i_map = km.kmeans(key, X, 4, n_iters=25, n_init=3)
    km._kmeans_multi.clear_cache()
    # vmap vs lax.map change float reduction order, so near-tied trials
    # may pick different winners on noise data — gate solution QUALITY,
    # not bitwise centers
    assert np.asarray(c_map).shape == np.asarray(c_ref).shape
    assert np.asarray(l_map).shape == np.asarray(l_ref).shape
    np.testing.assert_allclose(float(i_map), float(i_ref), rtol=1e-3)


def test_multiproc_region_key_no_collision():
    """Chromosomes absent from chrom_order sort after ordered ones — raw
    chrom numbers must not collide with order positions."""
    from phylo_hmrf_tpu.parallel.multiproc import MultiProcessPhyloHMRF

    class _R:
        def __init__(self, chrom, rid):
            self.chrom, self.region_id = chrom, rid

    class _Stub:
        chrom_order = [5, 1]
        _region_key = MultiProcessPhyloHMRF._region_key

    s = _Stub()
    k5 = s._region_key(_R(5, 0))
    k1 = s._region_key(_R(1, 0))
    k0 = s._region_key(_R(0, 0))   # not in chrom_order
    assert k5 == (0, 0) and k1 == (1, 0)
    assert k0[0] >= len(s.chrom_order)       # disjoint key space
    assert len({k5, k1, k0}) == 3
