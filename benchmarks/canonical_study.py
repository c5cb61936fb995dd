"""Canonical-workload quality study (VERDICT r4 items 1, 2, 6).

Runs the reference's one documented configuration (README.md:51 —
chr21+22 joint, K=20, estimate_type=3, miter 100) end to end under several
E-step labeler policies, from the identical seeded init, and records
final cost1 / exact f64 MRF energy / best-match agreement / wall for each:

  production   mf_icm every iteration + exact final polish (the default)
  hybrid@N     mf_icm+expansion@N budgeted hybrids (N in 2, 5, 10)
  expansion    exact on-device alpha-expansion every iteration
  swap         exact on-device alpha-beta swap every iteration — the
               reference's labeling schedule (phylo_hmrf.py:492-498), with
               the serial C++ cut replaced by the device cut (verified
               energy-exact vs the C++ oracle; a full C++-swap EM at K=20
               costs ~19x the K=5 study's 2393 s and is run instead as a
               single-pass oracle audit under converged params, --oracle)

Extras batched into the same process (one tunnel bring-up):
  --oracle     C++ 5000-cycle swap audit at K=20 under the swap arm's
               converged params (BASELINE 0.1% energy gate at the true K)
  --lockstep   f64 exact-vs-exact EM lockstep at K=20 on the dense chr22
               256-bin window (C++ Dinic swap vs device push-relabel swap)
  --f64wall    wall cost of the f64 strict-parity mode vs f32, same config

Writes one JSON artifact (default benchmarks/canonical_study.json) that
PARITY.md cites.

Usage:
  python benchmarks/canonical_study.py --input /tmp/canon_input \
      [--miter 100] [--arms production,swap] [--oracle --lockstep --f64wall]
(reconstruct the input first: python -m phylo_hmrf_tpu.data.reconstruct
 --out /tmp/canon_input --reference /root/reference/example_input)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ARMS = {
    "production": dict(labeler="mf_icm", final_polish=True),
    "hybrid2": dict(labeler="mf_icm+expansion@2", final_polish=True),
    "hybrid5": dict(labeler="mf_icm+expansion@5", final_polish=True),
    "hybrid10": dict(labeler="mf_icm+expansion@10", final_polish=True),
    "expansion": dict(labeler="expansion_tpu", final_polish=False),
    "swap": dict(labeler="swap_tpu", final_polish=False),
}


def _cfg(miter, k=20, **kw):
    from phylo_hmrf_tpu.config import PhyloHMRFConfig
    return PhyloHMRFConfig(n_states=k, estimate_type=3, max_iter=miter,
                           seed=0, beta=1.0, beta1=0.5, **kw)


def load_canonical(input_dir, miter):
    from phylo_hmrf_tpu.data.contacts import (quantile_contact_vec,
                                              x_max_from_quantiles)
    from phylo_hmrf_tpu.data.pipeline import load_dataset
    from phylo_hmrf_tpu.tree import load_tree

    tree = load_tree(os.path.join(input_dir, "edge.1.txt"),
                     os.path.join(input_dir, "branch_length.1.txt"),
                     os.path.join(input_dir, "species_name.1.txt"))
    with open(os.path.join(input_dir, "path_list.txt")) as f:
        paths = [line.strip() for line in f if line.strip()]
    paths = [p if os.path.isabs(p) or os.path.exists(p)
             else os.path.join(os.path.dirname(input_dir.rstrip("/")), p)
             for p in paths]
    species = list(tree.species)
    cfg = _cfg(miter)
    ref_filename = os.path.join(input_dir, "hg38.chrom.sizes")
    m_vec = quantile_contact_vec([21, 22], cfg.resolution, ref_filename,
                                 paths, species, cfg.legacy_bin_count)
    x_max = x_max_from_quantiles(m_vec)
    regions, _ = load_dataset([21, 22], cfg, ref_filename, paths, species,
                              input_dir, x_max)
    return tree, regions, x_max


def run_arm(tree, regions, miter, name, overrides):
    from phylo_hmrf_tpu.models.hmrf import PhyloHMRF

    cfg = _cfg(miter, **overrides)
    model = PhyloHMRF(tree, regions, cfg)
    t0 = time.perf_counter()
    result = model.fit(verbose=False)
    wall = time.perf_counter() - t0
    cost = np.asarray(result.cost_vec, float)
    print(f"[{name}] iters={result.n_iters} wall={wall:.1f}s "
          f"final_cost1={cost[-1, 3]:.4f} best={cost[:, 3].min():.4f}",
          flush=True)
    return {
        "labeler": cfg.labeler,
        "final_polish": cfg.final_polish,
        "wall_s": round(wall, 2),
        "n_iters": int(result.n_iters),
        "final_cost1": float(cost[-1, 3]),
        "best_cost1": float(cost[:, 3].min()),
        "cost_trajectory": np.round(cost, 6).tolist(),
        "phase_timings": model.timer.summary(),
    }, result, model


def exact_energy_f64(regions, means, covars, labels_flat, beta, beta1):
    """Double-precision MRF energy of a flat labeling under given moments
    (unary from the host f64 logpdf oracle, Potts pairwise from the exact
    edge list) — the cross-arm comparable quality number."""
    import jax.numpy as jnp

    from phylo_hmrf_tpu import native
    from phylo_hmrf_tpu.data.regions import flat_edge_list
    from phylo_hmrf_tpu.models.emission import gaussian_logpdf

    total = 0.0
    off = 0
    for region in regions:
        n = region.n_samples
        lab = np.ascontiguousarray(labels_flat[off:off + n]).astype(np.int32)
        off += n
        X = region.flat_values().astype(np.float64)
        logprob = np.asarray(gaussian_logpdf(
            jnp.asarray(X, jnp.float32), jnp.asarray(means, jnp.float32),
            jnp.asarray(covars, jnp.float32)), np.float64)
        edges = flat_edge_list(region)
        w = np.exp(-beta1 * edges[:, 2])
        ei = edges[:, :2].astype(np.int64)
        total += native.potts_energy(ei, w, -logprob, beta, lab)
    return float(total)


def oracle_audit(tree, regions, swap_result, beta, beta1):
    """Single-pass C++ 5000-cycle swap under the swap arm's converged
    params, against the device labels — the BASELINE 0.1% energy gate at
    the TRUE K=20 (a full C++-swap EM is infeasible at this K)."""
    import jax.numpy as jnp

    from phylo_hmrf_tpu import native
    from phylo_hmrf_tpu.data.regions import flat_edge_list
    from phylo_hmrf_tpu.models.emission import gaussian_logpdf
    from phylo_hmrf_tpu.utils.metrics import best_match_accuracy

    out = []
    off = 0
    for region in regions:
        n = region.n_samples
        dev_lab = np.ascontiguousarray(
            swap_result.labels[off:off + n]).astype(np.int32)
        off += n
        X = region.flat_values().astype(np.float64)
        logprob = np.asarray(gaussian_logpdf(
            jnp.asarray(X, jnp.float32),
            jnp.asarray(swap_result.means, jnp.float32),
            jnp.asarray(swap_result.covars, jnp.float32)), np.float64)
        edges = flat_edge_list(region)
        w = np.exp(-beta1 * edges[:, 2])
        ei = edges[:, :2].astype(np.int64)
        t0 = time.perf_counter()
        # warm-start the oracle from the device labels (the reference
        # warm-starts each EM iteration's cut from the previous labels)
        oracle = native.potts_swap(ei, w, -logprob, beta, dev_lab.copy(),
                                   5000)
        t_cpp = time.perf_counter() - t0
        e_cpp = native.potts_energy(ei, w, -logprob, beta, oracle)
        e_dev = native.potts_energy(ei, w, -logprob, beta, dev_lab)
        row = {
            "chrom": int(region.chrom),
            "n_samples": int(n),
            "e_device": e_dev,
            "e_cpp_oracle": e_cpp,
            "energy_gap": (e_dev - e_cpp) / abs(e_cpp),
            "agreement": float(best_match_accuracy(dev_lab, oracle)),
            "cpp_wall_s": round(t_cpp, 1),
        }
        print(f"[oracle] chr{row['chrom']}: gap="
              f"{row['energy_gap']:.2e} agree={row['agreement']:.4f} "
              f"cpp={t_cpp:.0f}s", flush=True)
        out.append(row)
    return out


def lockstep_k20(tree, regions, n_iter=5):
    """f64 exact-vs-exact EM lockstep at K=20 on the dense chr22 window
    (the K=20-feasible analogue of PARITY's K=5 lockstep row)."""
    import jax

    from phylo_hmrf_tpu.config import PhyloHMRFConfig
    from phylo_hmrf_tpu.data.regions import region_from_samples
    from phylo_hmrf_tpu.models.hmrf import PhyloHMRF
    from phylo_hmrf_tpu.utils.metrics import best_match_accuracy

    chr22 = [r for r in regions if r.chrom == 22] or regions[-1:]
    full = chr22[0]
    lo, hi = 200, 456
    keep = ((full.flat_rows >= lo) & (full.flat_rows < hi)
            & (full.flat_cols >= lo) & (full.flat_cols < hi))
    crop = [region_from_samples(full.flat_values()[keep], hi - lo, hi - lo,
                                True, pad_h=8, pad_w=128)]
    kw = dict(n_states=20, estimate_type=3, max_iter=n_iter, seed=0,
              beta=1.0, beta1=0.5, mstep_iters=40, min_iter=n_iter - 1,
              final_polish=False, dtype="float64", use_pallas="off")
    try:
        fits = {}
        walls = {}
        for name, labeler in (("cpp", "swap"), ("dev", "swap_tpu")):
            model = PhyloHMRF(tree, crop,
                              PhyloHMRFConfig(labeler=labeler, **kw))
            t0 = time.perf_counter()
            fits[name] = model.fit(verbose=False, track_states=True)
            walls[name] = time.perf_counter() - t0
    finally:
        jax.config.update("jax_enable_x64", False)
    ca, cb = fits["cpp"].cost_vec, fits["dev"].cost_vec
    n = min(len(ca), len(cb))
    per_it = [float(best_match_accuracy(fits["cpp"].state_list[i],
                                        fits["dev"].state_list[i]))
              for i in range(n)]
    out = {
        "window": [lo, hi],
        "n_iters": n,
        "max_abs_dcost1": float(np.abs(cb[:n, 3] - ca[:n, 3]).max()),
        "per_iter_agreement_min": min(per_it),
        "final_agreement": float(best_match_accuracy(fits["cpp"].labels,
                                                     fits["dev"].labels)),
        "wall_cpp_s": round(walls["cpp"], 1),
        "wall_dev_s": round(walls["dev"], 1),
    }
    print(f"[lockstep K=20] {out}", flush=True)
    return out


def f64_wall(tree, regions, miter=10):
    """Wall cost of the f64 strict-parity mode (VERDICT r4 item 6): the
    same canonical-config fit in f32 (production kernels) vs f64 (pinned
    reductions, fused Pallas kernels bypassed)."""
    import jax

    from phylo_hmrf_tpu.models.hmrf import PhyloHMRF

    out = {}
    for name, extra in (("f32", {}),
                        ("f64", dict(dtype="float64", use_pallas="off"))):
        cfg = _cfg(miter, labeler="mf_icm", final_polish=False,
                   min_iter=miter - 1, **extra)
        try:
            model = PhyloHMRF(tree, regions, cfg)
            t0 = time.perf_counter()
            result = model.fit(verbose=False)
            wall = time.perf_counter() - t0
        finally:
            jax.config.update("jax_enable_x64", False)
        out[name] = {"wall_s": round(wall, 1),
                     "n_iters": int(result.n_iters),
                     "per_iter_s": round(wall / max(result.n_iters, 1), 2),
                     "final_cost1": float(result.cost_vec[-1, 3]),
                     "phase_timings": model.timer.summary()}
        print(f"[f64wall {name}] {out[name]['wall_s']}s / "
              f"{out[name]['n_iters']} iters", flush=True)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="canonical input dir (data/reconstruct.py output)")
    ap.add_argument("--out", default=os.path.join(REPO, "benchmarks",
                                                  "canonical_study.json"))
    ap.add_argument("--miter", type=int, default=100)
    ap.add_argument("--arms", default="production,hybrid2,hybrid5,hybrid10,"
                                      "expansion,swap")
    ap.add_argument("--oracle", action="store_true")
    ap.add_argument("--lockstep", action="store_true")
    ap.add_argument("--f64wall", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from phylo_hmrf_tpu.utils.metrics import best_match_accuracy

    # persistent compile cache (same default as the CLI) so arm walls are
    # not dominated by XLA compiles
    cache_dir = os.environ.get("PHMRF_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/phylo_hmrf_jax"))
    if cache_dir and cache_dir != "0":
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(cache_dir, jax.default_backend()))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    t_all = time.perf_counter()
    tree, regions, x_max = load_canonical(args.input, args.miter)

    # pay the remote-tunnel first-sync bring-up BEFORE any arm, and record
    # it, so per-arm walls are device work (PARITY §Canonical accounting)
    t0 = time.perf_counter()
    jax.device_get(jax.jit(lambda a: a + 1)(jnp.zeros((8,))))
    first_sync_s = round(time.perf_counter() - t0, 1)
    print(f"first device sync: {first_sync_s}s", flush=True)
    n_samples = int(sum(r.n_samples for r in regions))
    print(f"loaded {len(regions)} regions, {n_samples} samples, "
          f"x_max={x_max:.2f}", flush=True)

    doc = {
        "schema": "phylo_hmrf_tpu.canonical_study/1",
        "config": {"n_states": 20, "estimate_type": 3, "miter": args.miter,
                   "chromvec": [21, 22], "seed": 0, "beta": 1.0,
                   "beta1": 0.5},
        "environment": {"backend": jax.default_backend(),
                        "device_kind": jax.devices()[0].device_kind,
                        "first_sync_s": first_sync_s},
        "n_samples": n_samples,
        "x_max": x_max,
        "arms": {},
    }

    results = {}
    for name in [a for a in args.arms.split(",") if a]:
        row, result, model = run_arm(tree, regions, args.miter, name,
                                     ARMS[name])
        # cross-comparable exact f64 energy of the final labeling under the
        # arm's own converged moments
        row["final_energy_f64"] = exact_energy_f64(
            regions, result.means, result.covars, result.labels, 1.0, 0.5)
        doc["arms"][name] = row
        results[name] = result

    anchor = ("swap" if "swap" in results
              else "expansion" if "expansion" in results else None)
    if anchor:
        doc["agreement_vs_" + anchor] = {
            name: float(best_match_accuracy(results[name].labels,
                                            results[anchor].labels))
            for name in results if name != anchor}

    # extras are best-effort: a failure in one must not lose the arm
    # results already gathered (f64 on the TPU backend is emulated and can
    # be slow or unsupported per-op)
    for key, flag, fn in (
            ("oracle_audit_k20", args.oracle and "swap" in results,
             lambda: oracle_audit(tree, regions, results["swap"], 1.0, 0.5)),
            ("f64_lockstep_k20", args.lockstep,
             lambda: lockstep_k20(tree, regions)),
            ("f64_wall", args.f64wall, lambda: f64_wall(tree, regions))):
        if not flag:
            continue
        try:
            doc[key] = fn()
        except Exception as exc:   # noqa: BLE001
            doc[key] = {"error": f"{type(exc).__name__}: {exc}"}
            print(f"[{key}] FAILED: {exc}", flush=True)

    doc["total_wall_s"] = round(time.perf_counter() - t_all, 1)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
