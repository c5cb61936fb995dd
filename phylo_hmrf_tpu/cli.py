"""Command-line driver — flag-compatible with the reference
(`python phylo_hmrf.py [opts]`, reference phylo_hmrf.py:1531-1761).

Canonical example run (reference README.md:51):
    python -m phylo_hmrf_tpu.cli -n 20 -r 1 --reload 0 --chromvec 21,22 \
        --miter 100 -p example_input --output out/
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from phylo_hmrf_tpu.config import LABELERS


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Phylo-HMRF state estimation (TPU-native)")
    a = p.add_argument
    a("-n", "--num_states", default="10")
    a("-f", "--chromosome", default="1")
    a("-p", "--root_path", default=".")
    # accepted-for-compatibility flags (no effect on the main estimation
    # path in the reference either: phylo_hmrf.py:1535-1548)
    a("-l", "--length", default="one")
    a("-m", "--multiple", default="true")
    a("-a", "--species_name", default="human")
    a("-o", "--sort_states", default="false")
    a("-s", "--simu_version", default="1")
    a("-u", "--position1", default="0")
    a("-v", "--position2", default="50000")
    a("-r", "--run_id", default="0")
    a("-c", "--cons_param", default="1")
    a("-t", "--method_mode", default="1")
    a("-d", "--initial_mode", default="0")
    a("-i", "--initial_weight", default="0.3")
    a("-k", "--initial_weight1", default="0.1")
    a("-j", "--initial_magnitude", default="1")
    a("-w", "--filter_sigma", default="0.25")
    a("-b", "--beta", default="1")
    a("--beta1", default="0.5")
    a("--num_neighbor", default="8")
    a("--filter_mode", default="0")
    a("-e", "--threshold", default="0.001")
    a("-g", "--estimate_type", default="0")
    a("-q", "--annotation", default="test")
    a("--dtype", default="0", help="diagonal type")
    a("--reload", dest="reload_mode", default="0")
    a("--quantile", default="1")
    a("--miter", default="60")
    a("--resolution", default="50000")
    a("--ref_species", default="hg38")
    a("--chromvec", default="1")
    a("--output", default=".")
    # TPU-native extensions
    a("--labeler", default="mf_icm",
      help=f"one of {', '.join(LABELERS)}, or a budgeted hybrid "
           f"'mf_icm+swap@N' / 'mf_icm+expansion@N' (exact graph-cut pass "
           f"every N iterations and on cost stalls, mf_icm otherwise)")
    a("--final_polish", default="1",
      help="1: polish the final state map with one exact on-device swap")
    a("--polish_method", default="expansion", choices=["swap", "expansion"])
    a("--shard_mode", default="region", choices=["region", "spatial"])
    a("--mask_mode", default="structural", choices=["structural", "observed"])
    a("--seed", default="0")
    a("--n_devices", default="0", help="0 = all available devices")
    a("--coordinator", default="",
      help="multi-host: jax.distributed coordinator address host:port "
           "(or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / "
           "JAX_PROCESS_ID); regions are partitioned across processes and "
           "stats/costs allreduce (parallel/multiproc.py)")
    a("--num_processes", default="0", help="multi-host: total process count")
    a("--process_id", default="-1", help="multi-host: this process's id")
    a("--checkpoint", default="", help="EM checkpoint file; enables resume")
    a("--checkpoint_every", default="5",
      help="save the EM checkpoint every N iterations")
    a("--n_workers", default="0", help="data-loading process pool size")
    a("--profile_dir", default="", help="write a jax.profiler trace here")
    a("--cost_log", default="", help="JSONL per-iteration cost log file")
    a("--run_json", default="",
      help="write a machine-readable run artifact (config, walls, phase "
           "timings, cost trajectory, final metrics) to this path")
    return p.parse_args(argv)


def _write_run_json(path, *, opts, cfg, x_max, walls, model, result,
                    out_file, dist):
    """Machine-readable run artifact (VERDICT r4 item 7): everything
    PARITY §Canonical states in prose — phase timings, cost trajectory,
    final metrics — as one re-checkable JSON."""
    import json

    import jax

    used = np.unique(result.labels).size if result.labels is not None else 0
    cost = np.asarray(result.cost_vec, dtype=float)
    doc = {
        "schema": "phylo_hmrf_tpu.run/1",
        "config": {
            "n_states": cfg.n_states, "beta": cfg.beta, "beta1": cfg.beta1,
            "estimate_type": cfg.estimate_type, "max_iter": cfg.max_iter,
            "threshold": cfg.threshold, "resolution": cfg.resolution,
            "labeler": cfg.labeler, "final_polish": cfg.final_polish,
            "polish_method": cfg.polish_method, "seed": cfg.seed,
            "dtype": cfg.dtype, "chromvec": opts.chromvec,
            "num_processes": dist["process_count"],
        },
        "environment": {
            "backend": jax.default_backend(),
            "device_kind": jax.devices()[0].device_kind,
            "n_devices": len(jax.devices()),
        },
        # peak device memory (bytes), where the runtime exposes it — the
        # measured number behind SCALING.md's 10kb HBM budget table
        "hbm_peak_bytes": (lambda s: int(s["peak_bytes_in_use"])
                           if s and "peak_bytes_in_use" in s else None)(
            getattr(jax.local_devices()[0], "memory_stats", lambda: None)()),
        "x_max": x_max,
        "n_samples": int(model.n_samples),
        "n_regions": len(model.regions),
        "walls_s": {k: round(v, 3) for k, v in walls.items()},
        "phase_timings": model.timer.summary(),
        "cost_trajectory": cost.tolist(),
        "final": {
            "n_iters": int(result.n_iters),
            "iter_id1": int(result.iter_id1),
            "iter_id2": int(result.iter_id2),
            "final_cost1": float(cost[-1, 3]) if cost.size else None,
            "best_cost1": float(cost[:, 3].min()) if cost.size else None,
            "states_used": int(used),
            "output_file": out_file,
        },
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"run artifact -> {path}")


def run(opts) -> str:
    from phylo_hmrf_tpu.config import PhyloHMRFConfig
    from phylo_hmrf_tpu.data.contacts import quantile_contact_vec, \
        x_max_from_quantiles
    from phylo_hmrf_tpu.data.pipeline import (load_cache, load_dataset,
                                              save_cache)
    from phylo_hmrf_tpu.models.hmrf import PhyloHMRF
    from phylo_hmrf_tpu.tree import load_tree
    from phylo_hmrf_tpu.utils.io import save_estimate

    import time
    t_start = time.perf_counter()
    walls = {}

    data_path = opts.root_path
    cfg = PhyloHMRFConfig(
        n_states=int(opts.num_states),
        beta=float(opts.beta), beta1=float(opts.beta1),
        cons_param=float(opts.cons_param),
        estimate_type=int(opts.estimate_type),
        initial_mode=int(opts.initial_mode),
        initial_weight=float(opts.initial_weight),
        initial_weight1=float(opts.initial_weight1),
        initial_magnitude=float(opts.initial_magnitude),
        max_iter=int(opts.miter), threshold=float(opts.threshold),
        resolution=int(opts.resolution),
        num_neighbor=int(opts.num_neighbor),
        filter_mode=int(opts.filter_mode),
        filter_sigma=float(opts.filter_sigma),
        diagonal_type=int(opts.dtype),
        labeler=opts.labeler, seed=int(opts.seed),
        final_polish=bool(int(opts.final_polish)),
        polish_method=opts.polish_method,
        shard_mode=opts.shard_mode, mask_mode=opts.mask_mode,
        run_id=int(opts.run_id), output_path=opts.output,
        annotation=opts.annotation)

    tree = load_tree(os.path.join(data_path, "edge.1.txt"),
                     os.path.join(data_path, "branch_length.1.txt"),
                     os.path.join(data_path, "species_name.1.txt"))
    with open(os.path.join(data_path, "path_list.txt")) as f:
        paths = [line.strip() for line in f if line.strip()]
    # paths in path_list.txt may be relative to the CWD, the data dir's
    # parent (the reference layout: example_input/test_data/...), or the
    # data dir itself — resolve in that order
    def _resolve(p):
        if os.path.isabs(p) or os.path.exists(p):
            return p
        parent = os.path.dirname(data_path.rstrip("/")) or "."
        cand = os.path.join(parent, p)
        if os.path.exists(cand):
            return cand
        return os.path.join(data_path, p)
    paths = [_resolve(p) for p in paths]
    species = list(tree.species)

    if opts.chromvec == "-1":
        chrom_vec = list(range(1, 23))
    else:
        chrom_vec = [int(c) for c in opts.chromvec.split(",")]

    ref_filename = os.path.join(data_path, f"{opts.ref_species}.chrom.sizes")

    # jax.distributed must initialize before ANYTHING touches the XLA
    # backend (jax.default_backend/jax.devices included) — and before data
    # loading, so each process can load only its own chromosomes
    import jax
    from phylo_hmrf_tpu.parallel.distributed import initialize_distributed
    dist = initialize_distributed(
        opts.coordinator or None,
        int(opts.num_processes) or None,
        None if int(opts.process_id) < 0 else int(opts.process_id))

    # persistent compilation cache (set before anything can compile): the
    # exact-swap kernels take ~30-45 s to compile the first time; cached
    # compiles make reruns near-instant
    cache_dir = os.environ.get("PHMRF_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/phylo_hmrf_jax"))
    if cache_dir:
        try:
            # scope by backend: CPU AOT artifacts compiled on another host
            # are rejected with noisy feature-mismatch warnings when the
            # same directory serves both TPU and CPU runs
            cache_dir = os.path.join(cache_dir, jax.default_backend())
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        except Exception:
            pass

    # Async first-sync warmup: on a remote-attached TPU (axon tunnel) the
    # FIRST blocking device round trip of a process pays a one-time runtime
    # bring-up measured at 14-57 s — independent of the program (a jitted
    # a+1 pays it too; subsequent init work is ~6 s). Pay it in a daemon
    # thread concurrently with quantile scan + data loading below; it is
    # tunnel wait, not CPU, so it overlaps even on a single-core host.
    # Single-process only: multi-process runs coordinate collectives and
    # should not race stray device work.
    if dist["process_count"] == 1:
        import threading

        def _warm_device():
            try:
                import jax.numpy as _jnp
                jax.device_get(jax.jit(lambda a: a + 1)(_jnp.zeros((8,))))
            except Exception:
                pass
        threading.Thread(target=_warm_device, daemon=True,
                         name="device-first-sync-warm").start()

    local_chroms = chrom_vec
    region_filters = None
    cache_scope = opts.output
    if dist["process_count"] > 1:
        from phylo_hmrf_tpu.parallel.multiproc import (
            partition_chromosome_regions, partition_chromosomes)
        if dist["process_count"] > len(chrom_vec):
            # pod-scale: more processes than chromosomes — fan out at
            # REGION granularity (the reference's finer per-region worker
            # boundary, utility.py:422-435). Processes beyond the region
            # count get an empty share and still join every collective.
            local_chroms, region_filters = partition_chromosome_regions(
                chrom_vec, data_path, cfg, dist["process_count"],
                dist["process_index"])
        else:
            local_chroms = partition_chromosomes(
                chrom_vec, data_path, cfg, dist["process_count"],
                dist["process_index"])
        # preprocessing caches are per-process AND per-partition: the dir
        # name carries the local chromosome set (plus a region-filter hash
        # for pod-scale partitions) so a --reload 1 rerun with a different
        # --num_processes misses the cache (and rebuilds) instead of
        # silently loading another partition's regions
        chrom_tag = "-".join(str(c) for c in local_chroms) or "none"
        if region_filters is not None:
            import hashlib
            h = hashlib.sha1(repr(sorted(
                (c, tuple(v)) for c, v in region_filters.items()))
                .encode()).hexdigest()[:8]
            chrom_tag += f"_r{h}"
        cache_scope = os.path.join(
            opts.output, f"proc{dist['process_index']}_c{chrom_tag}")

    # quantile normalization constant (reference phylo_hmrf.py:1648-1664);
    # multi-process runs scan only local chromosomes and allgather the rows
    x_max = None
    qfile = "chrom_quantile_test.txt"
    use_qfile = int(opts.quantile) == 0 and os.path.exists(qfile)
    if dist["process_count"] > 1 and int(opts.quantile) == 0:
        # the shortcut must be a COLLECTIVE decision: if one host's cwd has
        # a stale cache file and another's does not, the two would execute
        # mismatched collective sequences (one skips gather_quantile_rows,
        # the other blocks in it) — a hang at best. All processes take the
        # file path only when every process has the file, and the rows then
        # come from process 0 so every process normalizes identically even
        # if the per-host files differ.
        from phylo_hmrf_tpu.parallel.multiproc import _allreduce_sum
        n_have = int(_allreduce_sum(np.asarray([float(use_qfile)]))[0])
        use_qfile = n_have == dist["process_count"]
    if use_qfile:
        m_vec = np.loadtxt(qfile, delimiter="\t")
        if dist["process_count"] > 1:
            from phylo_hmrf_tpu.parallel.multiproc import (
                _broadcast_from_zero)
            m_vec = _broadcast_from_zero(
                np.ascontiguousarray(np.atleast_2d(m_vec), np.float64))
        x_max = float(np.median(m_vec[:, 6]))
    else:
        # pod-scale region partitions can give SEVERAL processes regions
        # of the same chromosome; exactly one (the owner of the
        # chromosome's lowest region_id) scans its quantile stats, or the
        # gathered multiset would duplicate chromosome blocks unevenly and
        # shift the x_max median away from the single-process value
        scan_chroms = local_chroms
        if region_filters is not None:
            from phylo_hmrf_tpu.parallel.multiproc import (
                quantile_scan_chromosomes)
            scan_chroms = quantile_scan_chromosomes(
                chrom_vec, data_path, cfg, region_filters)
        m_vec = quantile_contact_vec(scan_chroms, cfg.resolution,
                                     ref_filename, paths, species,
                                     cfg.legacy_bin_count)
        if dist["process_count"] > 1:
            from phylo_hmrf_tpu.parallel.multiproc import (
                gather_quantile_rows)
            m_vec = gather_quantile_rows(
                m_vec,
                scan_chroms if region_filters is not None else None,
                chrom_vec)
        if dist["process_index"] == 0:
            np.savetxt(qfile, m_vec, fmt="%.4f", delimiter="\t")
        x_max = x_max_from_quantiles(m_vec)
    print(f"x_max = {x_max}")
    walls["quantile_s"] = time.perf_counter() - t_start

    t_load = time.perf_counter()
    regions = None
    if int(opts.reload_mode) == 1:
        regions = load_cache(cache_scope, cfg)
        if regions is None:
            print("cache missing, recomputing")
    if regions is None:
        regions, _ = load_dataset(local_chroms, cfg, ref_filename, paths,
                                  species, data_path, x_max,
                                  n_workers=int(opts.n_workers),
                                  region_filters=region_filters)
        if regions:
            save_cache(regions, cache_scope, cfg)
    walls["load_s"] = time.perf_counter() - t_load

    mesh = None
    n_dev = int(opts.n_devices) or len(jax.local_devices())
    if n_dev > 1:
        from phylo_hmrf_tpu.parallel.mesh import make_mesh
        # multi-process runs shard over this process's OWN chips (the
        # model is data-parallel across processes; the global device list
        # contains non-addressable remote chips)
        local = (jax.local_devices() if dist["process_count"] > 1 else None)
        mesh = make_mesh((n_dev,), devices=local)

    if dist["process_count"] > 1:
        from phylo_hmrf_tpu.parallel.multiproc import (
            MultiProcessPhyloHMRF, _allreduce_sum)
        n_local = int(sum(r.n_samples for r in regions))
        total = int(_allreduce_sum(np.asarray([float(n_local)]))[0])
        print(f"[distributed] process {dist['process_index']}/"
              f"{dist['process_count']}: chroms {local_chroms}, "
              f"{len(regions)} regions, {n_local}/{total} samples")
        model = MultiProcessPhyloHMRF(tree, regions, cfg,
                                      n_samples_total=total, mesh=mesh,
                                      chrom_order=chrom_vec)
    else:
        model = PhyloHMRF(tree, regions, cfg, mesh=mesh)
    ckpt_path = opts.checkpoint or None
    if ckpt_path is not None and dist["process_count"] > 1:
        # each process checkpoints its OWN local-region labels + history;
        # a shared path would interleave/clobber one sidecar across
        # processes and resume would load another process's labels. The
        # chromosome tag (like the cache dir) makes a resume under a
        # different partition a clean cache-miss, not a shape mismatch.
        ckpt_path = (f"{ckpt_path}.proc{dist['process_index']}"
                     f"_c{chrom_tag}")
    from phylo_hmrf_tpu.utils.profiling import jax_trace
    t_fit = time.perf_counter()
    with jax_trace(opts.profile_dir or None):
        result = model.fit(checkpoint_path=ckpt_path,
                           checkpoint_every=int(opts.checkpoint_every),
                           resume=bool(ckpt_path),
                           cost_log=opts.cost_log or None)
    walls["fit_s"] = time.perf_counter() - t_fit
    print("phase timings:", model.timer.report())

    out_dir = opts.output
    if dist["process_count"] > 1:
        # every process contributes its label shards; process 0 writes the
        # ONE reference-schema .mat a single-process run would produce
        # (phylo_hmrf.py:1743-1748)
        import dataclasses
        from phylo_hmrf_tpu.parallel.multiproc import gather_global_result
        state_vec, len_vec_g = gather_global_result(model, result,
                                                    chrom_vec)
        if dist["process_index"] != 0:
            return ""
        merged = dataclasses.replace(result, labels=state_vec,
                                     state_list=None)
        out_file = save_estimate(merged, len_vec_g, out_dir, cfg.run_id,
                                 cfg.lambda_0, cfg.n_states)
        print(f"saved {out_file} (merged from "
              f"{dist['process_count']} processes)")
        if opts.run_json:
            walls["total_s"] = time.perf_counter() - t_start
            _write_run_json(opts.run_json, opts=opts, cfg=cfg, x_max=x_max,
                            walls=walls, model=model, result=merged,
                            out_file=out_file, dist=dist)
        return out_file
    out_file = save_estimate(result, model.len_vec, out_dir,
                             cfg.run_id, cfg.lambda_0, cfg.n_states)
    print(f"saved {out_file}")
    if opts.run_json:
        walls["total_s"] = time.perf_counter() - t_start
        _write_run_json(opts.run_json, opts=opts, cfg=cfg, x_max=x_max,
                        walls=walls, model=model, result=result,
                        out_file=out_file, dist=dist)
    return out_file


def main(argv=None):
    run(parse_args(argv))


if __name__ == "__main__":
    main()
