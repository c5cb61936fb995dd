"""Multi-host data-parallel EM (parallel/multiproc.py): real OS-process
boundaries via jax.distributed, region partitioning, global stats/cost
reduction, and elastic recovery (SIGKILL + restart from checkpoint)."""

import json
import os
import signal
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(nproc, extra_per_pid, timeout=240, allow_fail=False):
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, WORKER, "--port", str(port), "--pid", str(pid),
         "--nproc", str(nproc)] + extra_per_pid(pid),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(nproc)]
    outs = {}
    try:
        for pid, p in enumerate(procs):
            out, err = p.communicate(timeout=timeout)
            if p.returncode != 0:
                if allow_fail:
                    continue
                raise AssertionError(err[-2000:])
            line = [ln for ln in out.splitlines()
                    if ln.startswith("WORKER_JSON ")]
            assert line, out[-2000:] + err[-2000:]
            outs[pid] = json.loads(line[0][len("WORKER_JSON "):])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


def test_two_process_fit_matches_single():
    """2-process data-parallel EM (2 regions per process) must reproduce
    the single-process fit over all 4 regions: same global stats, same
    cost trajectory, same parameters."""
    single = _run_workers(1, lambda pid: ["--miter", "3"])
    multi = _run_workers(2, lambda pid: ["--miter", "3"])

    assert multi[0]["cost_vec"] == multi[1]["cost_vec"]  # lockstep
    cv_s = np.asarray(single[0]["cost_vec"])
    cv_m = np.asarray(multi[0]["cost_vec"])
    assert cv_s.shape == cv_m.shape
    # iteration 0 is a pure deterministic E-step on identical params: the
    # global stats/costs must match to reduction-order noise
    np.testing.assert_allclose(cv_m[0], cv_s[0], rtol=1e-5, atol=1e-7)
    # later iterations amplify the f32 reduction-order noise through the
    # nonconvex M-step (different bucket groupings sum stats in different
    # orders), so the trajectories stay close but not bitwise
    np.testing.assert_allclose(cv_m, cv_s, rtol=0.05, atol=1e-4)
    assert multi[0]["params_sum"] == pytest.approx(
        single[0]["params_sum"], rel=0.05)


def test_two_process_kmeans_broadcast_consistent():
    """With per-process local k-means init, process 0's parameters are
    broadcast: both processes must still march in lockstep."""
    multi = _run_workers(2, lambda pid: ["--miter", "2", "--init", "kmeans"])
    assert multi[0]["cost_vec"] == multi[1]["cost_vec"]
    assert multi[0]["params_sum"] == multi[1]["params_sum"]


@pytest.mark.slow
def test_elastic_recovery_sigkill_restart(tmp_path):
    """A worker death mid-fit (SIGKILL of process 0 at iteration 2) kills
    the job; restarting both processes from their last checkpoints resumes
    and finishes with the same trajectory as an uninterrupted run."""
    cks = [str(tmp_path / f"ck{pid}.npz") for pid in range(2)]

    # uninterrupted comparator
    ref = _run_workers(2, lambda pid: ["--miter", "5"])

    # run that dies at iteration 2 — after the first checkpoint write
    # (checkpoint_every=2 writes after iteration 1's M-step); process 1
    # blocks on the next collective and is killed by the driver
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, WORKER, "--port", str(port), "--pid", str(pid),
         "--nproc", "2", "--miter", "5", "--checkpoint", cks[pid],
         "--kill-after", "3"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)]
    procs[0].wait(timeout=240)
    assert procs[0].returncode == -signal.SIGKILL
    try:
        procs[1].wait(timeout=20)
    except subprocess.TimeoutExpired:
        pass
    finally:
        if procs[1].poll() is None:
            procs[1].kill()
            procs[1].wait(timeout=30)
    assert os.path.exists(cks[0]) and os.path.exists(cks[1])

    # restart: both processes resume from their checkpoints
    resumed = _run_workers(
        2, lambda pid: ["--miter", "5", "--checkpoint", cks[pid]])
    assert resumed[0]["cost_vec"] == resumed[1]["cost_vec"]
    cv_ref = np.asarray(ref[0]["cost_vec"])
    cv_res = np.asarray(resumed[0]["cost_vec"])
    # the resumed run only records post-resume iterations; its rows must
    # match the tail of the uninterrupted trajectory
    tail = cv_ref[-cv_res.shape[0]:]
    np.testing.assert_allclose(cv_res, tail, rtol=1e-9, atol=1e-12)
    assert resumed[0]["params_sum"] == pytest.approx(
        ref[0]["params_sum"], rel=1e-6)


def test_cli_two_process_end_to_end(tmp_path):
    """The CLI drives multi-host mode: --coordinator/--num_processes/
    --process_id partition regions across two OS processes and each writes
    its per-process .mat (proc{i}/ subdirectory)."""
    import scipy.io

    ex = tmp_path / "ex"
    gen = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "make_synthetic_example.py")
    subprocess.run([sys.executable, gen, "--out", str(ex), "--n-bins",
                    "30", "--n-states", "3"], check=True,
                   capture_output=True)
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # PYTHONPATH is pinned to the repo alone: an inherited site hook (the
    # TPU tunnel's .axon_site) would override JAX_PLATFORMS=cpu at import
    # and put both processes on the single real chip
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1",
               PYTHONPATH=repo)
    procs = [subprocess.Popen(
        [sys.executable, "-m", "phylo_hmrf_tpu.cli", "-n", "3",
         "-p", str(ex), "--chromvec", "21,22", "--miter", "2",
         "--output", str(tmp_path / "out"), "--seed", "1",
         "--coordinator", f"127.0.0.1:{port}",
         "--num_processes", "2", "--process_id", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(tmp_path), env=env)
        for pid in range(2)]
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err[-3000:]
    mats = []
    for pid in range(2):
        f = tmp_path / "out" / f"proc{pid}" / "estimate_ou_0_1.00_3.mat"
        assert f.exists()
        mats.append(scipy.io.loadmat(str(f)))
    # params/costs are replicated; the state/len vectors are per-process
    np.testing.assert_allclose(mats[0]["cost_vec"], mats[1]["cost_vec"])
    np.testing.assert_allclose(mats[0]["params_vec1"],
                               mats[1]["params_vec1"])
    n0 = mats[0]["state_vec"].size
    n1 = mats[1]["state_vec"].size
    assert n0 > 0 and n1 > 0
