"""Benchmark: chr21-scale EM iteration on TPU vs the CPU reference path.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Problem: one chr21-like diagonal synteny region (653x653 bins at 50kb ->
~213k upper-triangle samples, see BASELINE.md), 4 species, 10 states.

* TPU path: the production jitted E-step (batched-Cholesky unaries +
  annealed-mean-field/ICM labeling + posteriors + stats) and the vmapped
  L-BFGS M-step. Median per-EM-iteration wall time over `--iters` runs.
* CPU reference path: exact alpha-beta-swap graph cuts (C++, the reference's
  E-step optimizer), vectorized numpy posterior/stat pass (generous to the
  baseline: the reference's per-sample Python loops are far slower), and
  per-state SciPy SLSQP M-step — the reference's algorithm stack on one CPU.
  Measured once and cached in benchmarks/cpu_baseline.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, "benchmarks", "cpu_baseline.json")

H0 = 653          # chr21 synteny 14.0-46.7Mb at 50kb (BASELINE.md)
K = 10
F = 4
SEED = 0


def _ou_moments_ref(p, tree):
    """Reference (numpy) OU moment recursion — CPU-baseline M-step oracle."""
    nn = tree.n_nodes
    B = nn - 1
    alpha, lam, theta = p[1:1 + B], p[1 + B:1 + 2 * B], p[1 + 2 * B:]
    mean, var = np.zeros(nn), np.zeros(nn)
    mean[0], var[0] = theta[0], p[0]
    for node in tree.topo_order[1:]:
        node = int(node)
        a = alpha[node - 1]
        e = np.exp(-a)
        ratio = lam[node - 1] / (2 * a) if a > 1e-7 else 0.0
        par = int(tree.parent[node])
        mean[node] = mean[par] * e + theta[node] * (1 - e)
        var[node] = ratio * (1 - e ** 2) + var[par] * e ** 2
    L = tree.n_leaves
    cov = np.zeros((L, L))
    alpha_full = np.concatenate([[0.0], alpha])
    for k2 in range(tree.pair_list.shape[0]):
        mrca = tree.pair_list[k2, 2]
        s = np.exp(-(tree.A2[k2] * alpha_full).sum()) * var[mrca]
        i, j = tree.pair_rows[k2], tree.pair_cols[k2]
        cov[i, j] = cov[j, i] = s
    for i, leaf in enumerate(tree.leaf_nodes):
        cov[i, i] = var[leaf]
    return mean[tree.leaf_nodes], cov


def _bench_tree_and_moments(rng):
    """The 4-species bench tree + K separated-state OU moments."""
    from phylo_hmrf_tpu.tree import build_tree

    tree = build_tree([(0, 1), (1, 2), (1, 3), (3, 4), (4, 5), (4, 6),
                       (3, 7)], branch_lengths=[0, 32, 20, 6, 6, 6, 12])
    params = rng.random((K, tree.n_params)) * 0.5 + 0.2
    for c in range(K):
        params[c, tree.n_params - tree.n_nodes:] = 0.25 * c + 0.2
    means = np.zeros((K, F))
    covs = np.zeros((K, F, F))
    for c in range(K):
        m, V = _ou_moments_ref(params[c], tree)
        means[c] = m
        covs[c] = V + 1e-3 * np.eye(F)
    return tree, params, means, covs


def _sample_blocky(rng, h0, means, covs, shift=0):
    """Blocky true labels on an h0 x h0 diagonal region + per-state Gaussian
    emissions (one Cholesky per state) + a 15%-corrupted warm start."""
    from phylo_hmrf_tpu.data.regions import flat_index_order

    ii, jj = np.indices((h0, h0))
    true_lab = ((ii // 24 + jj // 24 + shift) % K).astype(np.int32)
    rows, cols = flat_index_order(h0, h0, True)
    lab_flat = true_lab[rows, cols]
    x = np.empty((lab_flat.shape[0], F), np.float32)
    for c in range(K):
        sel = lab_flat == c
        Lc = np.linalg.cholesky(covs[c] * 0.5)
        x[sel] = means[c] + rng.standard_normal((sel.sum(), F)) @ Lc.T
    x = np.abs(x).astype(np.float32) + 0.05
    warm = lab_flat.copy()
    flip = rng.random(warm.shape[0]) < 0.15
    warm[flip] = rng.integers(0, K, flip.sum())
    return x, lab_flat, warm


def build_problem():
    from phylo_hmrf_tpu.data.regions import region_from_samples

    rng = np.random.default_rng(SEED)
    tree, params, means, covs = _bench_tree_and_moments(rng)
    x, _, warm = _sample_blocky(rng, H0, means, covs)
    region = region_from_samples(x, H0, H0, True, pad_h=32, pad_w=128)
    return tree, region, means, covs, warm, params


# per-device peaks (dense bf16-matmul TFLOP/s, HBM GB/s) keyed by a prefix
# of jax Device.device_kind; public figures per chip generation. v2/v3
# entries are per core (one jax device = one core there).
_CHIP_PEAKS = (
    ("TPU v2", (22.5, 300.0)),
    ("TPU v3", (61.5, 450.0)),
    ("TPU v4 lite", (138.0, 614.0)),
    ("TPU v4", (275.0, 1228.0)),
    ("TPU v5 lite", (197.0, 819.0)),
    ("TPU v5e", (197.0, 819.0)),
    ("TPU v5", (459.0, 2765.0)),
    ("TPU v6 lite", (918.0, 1640.0)),
    ("TPU v6", (918.0, 1640.0)),
)


def _cost(jitted, *args):
    """(flops, HBM bytes) from XLA's compile-time cost model. Dynamic
    while_loop bodies are counted at one trip, so both are lower bounds;
    Pallas custom calls report bytes (buffer sizes) but zero flops."""
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _roofline(t_iter_s, flops, hbm_bytes):
    """Achieved FLOP/s and HBM bandwidth vs chip peaks (VERDICT r2 item 5).

    The E-step is stencil/reduction work (VPU + HBM), not matmul work, so
    MFU against the MXU peak is structurally low — the number that matters
    for this workload is hbm_util. Reported for every bench mode."""
    import jax

    kind = jax.devices()[0].device_kind
    peaks = next((p for pre, p in _CHIP_PEAKS if kind.startswith(pre)),
                 None)
    out = {
        "device_kind": kind,
        "flops_per_iter": flops,
        "hbm_bytes_per_iter": hbm_bytes,
        "achieved_tflops": round(flops / t_iter_s / 1e12, 4),
        "achieved_hbm_gbs": round(hbm_bytes / t_iter_s / 1e9, 2),
    }
    if peaks is not None:
        out["mfu"] = round(out["achieved_tflops"] / peaks[0], 5)
        out["hbm_util"] = round(out["achieved_hbm_gbs"] / peaks[1], 4)
    return out


def _em_roofline(estep, mstep, e_args, p0, t_iter):
    """Utilization dict for one EM iteration: flops from the pure-XLA
    E-step variant (Pallas custom calls report zero flops), bytes from the
    production (fused) path, plus the M-step's costs."""
    import functools

    import jax

    from phylo_hmrf_tpu.models.hmrf import _estep_bucket

    estep_plain = jax.jit(functools.partial(
        _estep_bucket, weighted_pp=False, labeler="mf_icm", max_sweeps=60,
        use_pallas=False))
    flops_e, _ = _cost(estep_plain, *e_args)
    _, bytes_e = _cost(estep, *e_args)
    _, (post, obs, obs2), _, _ = estep(*e_args)
    flops_m, bytes_m = _cost(mstep, p0, post.sum(0), obs.sum(0),
                             obs2.sum(0))
    return _roofline(t_iter, flops_e + flops_m, bytes_e + bytes_m)


def bench_tpu(tree, region, means, covs, warm, iters):
    import functools
    import jax
    import jax.numpy as jnp
    from phylo_hmrf_tpu.models.hmrf import _estep_bucket
    from phylo_hmrf_tpu.models.ou import ou_nll_stats
    from phylo_hmrf_tpu.ops.lbfgs import minimize_boxed

    img = jnp.asarray(region.img[None])
    mask = jnp.asarray(region.mask[None])
    dmaps = jnp.asarray(region.dmaps[None])
    warm_g = jnp.asarray(region.labels_to_grid(warm)[None])
    means_j = jnp.asarray(means, jnp.float32)
    covs_j = jnp.asarray(covs, jnp.float32)

    estep = jax.jit(functools.partial(
        _estep_bucket, weighted_pp=False,
        labeler="mf_icm", max_sweeps=60, use_pallas=True))
    beta_j, beta1_j = jnp.float32(1.0), jnp.float32(0.5)

    n_samples = float(region.n_samples)

    def solve_state(p0, post_c, obs_c, obs2_c):
        def fn(p):
            return ou_nll_stats(p, post_c, obs_c, obs2_c, tree, n_samples,
                                1.0, 1e-3)
        return minimize_boxed(fn, p0, 1e-16, 100.0, 150)

    mstep = jax.jit(jax.vmap(solve_state))
    rng = np.random.default_rng(1)
    p0 = jnp.asarray(rng.random((K, tree.n_params)), jnp.float32)

    def em_chain(n):
        """Dispatch n chained EM iterations; return a scalar that forces a
        host fetch (block_until_ready does not synchronize through the
        remote-TPU tunnel, so timing is fetch-to-fetch)."""
        warm = warm_g
        acc = jnp.float32(0)
        for _ in range(n):
            labels, (post, obs, obs2), costs, nv = estep(
                img, mask, dmaps, warm, means_j, covs_j, beta_j, beta1_j)
            params, fval = mstep(p0, post.sum(0), obs.sum(0),
                                 obs2.sum(0))
            warm = labels
            acc = acc + jnp.sum(params) + jnp.sum(costs)
        return float(acc)

    em_chain(1)   # warmup/compile
    em_chain(2)   # second distinct chain length compiles nothing new

    def timed(n):
        vals = []
        for _ in range(iters):
            t0 = time.perf_counter()
            em_chain(n)
            vals.append(time.perf_counter() - t0)
        return float(np.median(vals)), float(np.min(vals))

    (t1_med, t1_min), (t5_med, t5_min) = timed(1), timed(5)
    # difference out the constant dispatch/fetch overhead of the tunnel.
    # median is the headline (continuity with BENCH_r1-r4); min is the
    # best-case estimate that separates tunnel day-variance from real
    # kernel regressions (VERDICT r4 weak #1)
    t_iter = max((t5_med - t1_med) / 4.0, 1e-9)
    t_iter_min = max((t5_min - t1_min) / 4.0, 1e-9)

    # standalone M-step wall (chained): with the E-step phases this
    # reconstructs the headline: estep_total_s + mstep_s ~= value
    _, (post, obs, obs2), _, _ = estep(img, mask, dmaps, warm_g, means_j,
                                       covs_j, beta_j, beta1_j)
    m_args = (p0, post.sum(0), obs.sum(0), obs2.sum(0))

    def m_chain(n):
        acc = jnp.float32(0)
        for _ in range(n):
            params, fval = mstep(*m_args)
            acc = acc + jnp.sum(params)
        return float(acc)

    m_chain(1)
    m_chain(2)

    def m_timed(n):
        vals = []
        for _ in range(iters):
            t0 = time.perf_counter()
            m_chain(n)
            vals.append(time.perf_counter() - t0)
        return float(np.median(vals))

    t_mstep = max((m_timed(5) - m_timed(1)) / 4.0, 1e-9)

    e_args = (img, mask, dmaps, warm_g, means_j, covs_j, beta_j, beta1_j)
    util = _em_roofline(estep, mstep, e_args, p0, t_iter)
    return t_iter, {"t_iter_min": t_iter_min, "mstep_s": t_mstep,
                    "repeats": iters}, util


def bench_spatial(tree, region, means, covs, warm, iters):
    """Row-sharded (halo-exchange) E-step + vmapped M-step over the devices
    present (1 on the single bench chip — measures the spatial-path kernels;
    the mesh scales it on pods). Same chained-dispatch timing as bench_tpu."""
    import functools
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec
    from phylo_hmrf_tpu.models.ou import ou_nll_stats
    from phylo_hmrf_tpu.ops.lbfgs import minimize_boxed
    from phylo_hmrf_tpu.parallel.halo import make_rowsharded_estep
    from phylo_hmrf_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    mesh = make_mesh((n_dev,))
    rows = NamedSharding(mesh, PartitionSpec("data"))
    rows1 = NamedSharding(mesh, PartitionSpec(None, "data"))
    img = jax.device_put(jnp.asarray(region.img), rows)
    mask = jax.device_put(jnp.asarray(region.mask), rows)
    dmaps = jax.device_put(jnp.asarray(region.dmaps), rows1)
    warm_g = jax.device_put(jnp.asarray(region.labels_to_grid(warm)), rows)
    means_j = jnp.asarray(means, jnp.float32)
    covs_j = jnp.asarray(covs, jnp.float32)
    estep = make_rowsharded_estep(mesh, weighted_pp=False, max_sweeps=60,
                                  use_pallas=True)
    beta_j, beta1_j = jnp.float32(1.0), jnp.float32(0.5)
    n_samples = float(region.n_samples)

    def solve_state(p0, post_c, obs_c, obs2_c):
        def fn(p):
            return ou_nll_stats(p, post_c, obs_c, obs2_c, tree, n_samples,
                                1.0, 1e-3)
        return minimize_boxed(fn, p0, 1e-16, 100.0, 150)

    mstep = jax.jit(jax.vmap(solve_state))
    rng = np.random.default_rng(1)
    p0 = jnp.asarray(rng.random((K, tree.n_params)), jnp.float32)

    def em_chain(n):
        warm = warm_g
        acc = jnp.float32(0)
        for _ in range(n):
            labels, (post, obs, obs2), costs, nv = estep(
                img, mask, dmaps, warm, means_j, covs_j, beta_j, beta1_j)
            # row-sharded estep stats are already psum'd to (K, ...)
            params, fval = mstep(p0, post, obs, obs2)
            warm = labels
            acc = acc + jnp.sum(params) + jnp.sum(costs)
        return float(acc)

    em_chain(1)
    em_chain(2)

    def timed(n):
        vals = []
        for _ in range(iters):
            t0 = time.perf_counter()
            em_chain(n)
            vals.append(time.perf_counter() - t0)
        return float(np.median(vals))

    t1, t5 = timed(1), timed(5)
    return max((t5 - t1) / 4.0, 1e-9)


def bench_cpu(tree, region, means, covs, warm):
    """One reference-faithful EM iteration on the CPU."""
    from scipy.optimize import minimize as sp_minimize
    from scipy.stats import multivariate_normal
    from phylo_hmrf_tpu import native
    from phylo_hmrf_tpu.data.regions import flat_edge_list

    t0 = time.perf_counter()
    X = region.flat_values().astype(np.float64)
    logprob = np.stack([
        multivariate_normal(means[c], covs[c]).logpdf(X)
        for c in range(K)], axis=1)
    edges = flat_edge_list(region)
    w = np.exp(-0.5 * edges[:, 2])
    ei = edges[:, :2].astype(np.int64)
    labels = native.potts_swap(ei, w, -logprob, 1.0, warm.astype(np.int32),
                               5000)
    # posterior pass (vectorized numpy scatter — generous to the baseline)
    n = X.shape[0]
    pp = np.zeros((n, K))
    Vp = 1.0 * (1 - np.eye(K))
    np.add.at(pp, ei[:, 0], Vp[:, labels[ei[:, 1]]].T)
    np.add.at(pp, ei[:, 1], Vp[:, labels[ei[:, 0]]].T)
    wp = np.exp(logprob - pp)
    gamma = wp / wp.sum(1, keepdims=True)
    post = gamma.sum(0)
    obs = gamma.T @ X
    obs2 = np.einsum("nk,nf,ng->kfg", gamma, X, X)
    t_estep = time.perf_counter() - t0

    # M-step: per-state SLSQP on the same OU objective (reference
    # phylo_hmrf.py:1383: SLSQP, tol=1e-6, box constraints)
    def nll(p, c):
        m, cov = _ou_moments_ref(p, tree)
        V = cov + 1e-3 * np.eye(F)
        obsmean = np.outer(obs[c], m)
        Sn = obs2[c] - obsmean - obsmean.T + post[c] * np.outer(m, m)
        det = np.linalg.det(V)
        if det <= 0 or not np.isfinite(det):
            return 1e10
        return (post[c] * np.log(det + 1e-16) / n
                + np.sum(np.linalg.inv(V) * Sn) / n
                + 1.0 / np.sqrt(n) * p @ p)

    t1 = time.perf_counter()
    rng = np.random.default_rng(1)
    cons = ({"type": "ineq", "fun": lambda x: x - 1e-16},
            {"type": "ineq", "fun": lambda x: -x + 100})
    for c in range(K):
        guess = rng.random(tree.n_params)
        sp_minimize(nll, guess, args=(c,), method="SLSQP", constraints=cons,
                    tol=1e-6)
    t_mstep = time.perf_counter() - t1
    return t_estep + t_mstep, t_estep, t_mstep


REAL_CACHE = os.path.join(REPO, "benchmarks", "cpu_baseline_real.json")
REAL_INPUT = "/root/reference/example_input"


def build_real_problem():
    """Real chr22 Hi-C (3 species present in this mirror), k-means-init
    moments — the unary field the EM actually sees at iteration 0."""
    from phylo_hmrf_tpu.config import PhyloHMRFConfig
    from phylo_hmrf_tpu.data.pipeline import load_dataset
    from phylo_hmrf_tpu.models.hmrf import PhyloHMRF
    from phylo_hmrf_tpu.tree import build_tree

    species = ["gorGor4", "panTro5", "panPan2"]
    paths = [os.path.join(REAL_INPUT, "test_data", f"hic_{s}")
             for s in species]
    tree = build_tree([(0, 1), (0, 2), (2, 3), (2, 4)], species=species)
    cfg = PhyloHMRFConfig(n_states=K, seed=SEED)
    regions, _ = load_dataset(
        [22], cfg, os.path.join(REAL_INPUT, "hg38.chrom.sizes"),
        paths, species, REAL_INPUT)
    model = PhyloHMRF(tree, regions, cfg)
    model.initialize()
    region = regions[0]
    warm = region.labels_to_flat(model.labels_local[0]).astype(np.int32)
    return (tree, region, model.means_.copy(), model.covars_.copy(), warm,
            None)


def bench_phases_staged(tree, region, means, covs, warm, iters):
    """Cumulative-staged E-step phase breakdown (self-consistent by
    construction — VERDICT r4 weak #2): stage k compiles the SAME
    production E-step chain truncated after phase k, each stage is timed
    with the chained-dispatch difference method, and the reported phases
    are successive stage differences. Their sum IS the full E-step wall
    (estep_total_s), which together with mstep_s reconstructs the headline
    per-iteration value. The previous breakdown timed each phase as a
    standalone dispatch (ICM from an MF start converges in a different
    number of sweep pairs than mid-chain, so the standalone sum exceeded
    the fused-chain wall by ~1.7x and read as nonsense next to the
    headline)."""
    import functools
    import jax
    import jax.numpy as jnp
    from phylo_hmrf_tpu.models.hmrf import _estep_bucket, _finish_fused
    from phylo_hmrf_tpu.ops.potts import weight_maps

    on_tpu = jax.default_backend() == "tpu"
    img = jnp.asarray(region.img[None])
    mask = jnp.asarray(region.mask[None])
    dmaps = jnp.asarray(region.dmaps[None])
    warm_g = jnp.asarray(region.labels_to_grid(warm)[None])
    means_j = jnp.asarray(means, jnp.float32)
    covs_j = jnp.asarray(covs, jnp.float32)
    beta, beta1 = 1.0, 0.5

    if on_tpu:
        from phylo_hmrf_tpu.models.emission import gaussian_logpdf_kmajor
        from phylo_hmrf_tpu.ops.finish_pallas import potts_energy_pallas
        from phylo_hmrf_tpu.ops.icm_pallas import icm_pallas
        from phylo_hmrf_tpu.ops.mf_pallas import mean_field_pallas_kmajor

        # the four truncations of _estep_bucket's fused pallas path
        # (models/hmrf.py:109-133); stage 3 is the production program
        def stage0(img, mask, dmaps, warm):
            w_cut = weight_maps(dmaps, beta1)
            unary_k = -gaussian_logpdf_kmajor(img, means_j, covs_j)
            return unary_k.sum(), w_cut.sum()

        def stage1(img, mask, dmaps, warm):
            w_cut = weight_maps(dmaps, beta1)
            unary_k = -gaussian_logpdf_kmajor(img, means_j, covs_j)
            mf_labels = mean_field_pallas_kmajor(unary_k, w_cut, beta)
            return mf_labels.sum()

        def stage2(img, mask, dmaps, warm):
            w_cut = weight_maps(dmaps, beta1)
            unary_k = -gaussian_logpdf_kmajor(img, means_j, covs_j)
            mf_labels = mean_field_pallas_kmajor(unary_k, w_cut, beta)
            cand_a = icm_pallas(None, w_cut, mask, mf_labels, beta, 60,
                                unary_k=unary_k)
            cand_b = icm_pallas(None, w_cut, mask, warm, beta, 60,
                                unary_k=unary_k)
            mask_i = mask.astype(jnp.int32)
            e_a = potts_energy_pallas(unary_k, mask_i, cand_a, w_cut, beta)
            e_b = potts_energy_pallas(unary_k, mask_i, cand_b, w_cut, beta)
            return jnp.where((e_a <= e_b)[:, None, None], cand_a, cand_b)

        stage3 = functools.partial(
            _estep_bucket, means=means_j, covars=covs_j,
            beta=jnp.float32(beta), beta1=jnp.float32(beta1),
            weighted_pp=False, labeler="mf_icm", max_sweeps=60,
            use_pallas=True)
    else:
        from phylo_hmrf_tpu.models.emission import gaussian_logpdf
        from phylo_hmrf_tpu.ops.icm import icm_with_energy, mean_field

        def stage0(img, mask, dmaps, warm):
            w_cut = weight_maps(dmaps, beta1)
            unary = -gaussian_logpdf(img, means_j, covs_j)
            return unary.sum(), w_cut.sum()

        def stage1(img, mask, dmaps, warm):
            w_cut = weight_maps(dmaps, beta1)
            unary = -gaussian_logpdf(img, means_j, covs_j)
            mf = jax.vmap(lambda u, w: mean_field(u, w, beta))(unary, w_cut)
            return mf.sum()

        def stage2(img, mask, dmaps, warm):
            w_cut = weight_maps(dmaps, beta1)
            unary = -gaussian_logpdf(img, means_j, covs_j)
            mf = jax.vmap(lambda u, w: mean_field(u, w, beta))(unary, w_cut)

            def one(u, w, m, wl, ml):
                ca, ea = icm_with_energy(u, w, m, ml, beta, 60)
                cb, eb = icm_with_energy(u, w, m, wl, beta, 60)
                return jnp.where(ea <= eb, ca, cb)
            return jax.vmap(one)(unary, w_cut, mask, warm, mf)

        stage3 = functools.partial(
            _estep_bucket, means=means_j, covars=covs_j,
            beta=jnp.float32(beta), beta1=jnp.float32(beta1),
            weighted_pp=False, labeler="mf_icm", max_sweeps=60,
            use_pallas=False)

    # steady-state warm labels: the headline chain feeds each iteration's
    # labels back as the next warm start, so its warm-start ICM converges
    # in ~1 sweep pair; time the stages under the same regime (the
    # corrupted cold start would overstate the ICM phase ~2x)
    warm_steady = jax.jit(stage3)(img, mask, dmaps, warm_g)[0]

    def timed(fn):
        jitted = jax.jit(fn)
        args = (img, mask, dmaps, warm_steady)

        def chain(n):
            acc = jnp.float32(0)
            for _ in range(n):
                leaves = jax.tree.leaves(jitted(*args))
                acc = acc + jnp.sum(
                    leaves[0].ravel()[:8].astype(jnp.float32))
            return float(acc)

        def run(n):
            vals = []
            for _ in range(iters):
                t0 = time.perf_counter()
                chain(n)
                vals.append(time.perf_counter() - t0)
            return float(np.median(vals))
        run(1)
        run(2)
        return max((run(5) - run(1)) / 4.0, 1e-9)

    t0, t1, t2, t3 = (timed(stage0), timed(stage1), timed(stage2),
                      timed(stage3))
    # enforce monotonicity against timing noise before differencing
    t1 = max(t1, t0)
    t2 = max(t2, t1)
    t3 = max(t3, t2)
    return {
        "unary_s": t0,
        "mf_s": t1 - t0,
        "icm_select_s": t2 - t1,
        "posterior_stats_s": t3 - t2,
        "estep_total_s": t3,
        "note": "cumulative-staged truncations of the production fused "
                "E-step; phases sum to estep_total_s by construction; "
                "estep_total_s + protocol.mstep_s reconstructs the "
                "headline value within remote-tunnel measurement noise "
                "(~+-1.5 ms between separate dispatch-chain passes)",
    }


GENOME_SIZES = (653, 685, 540, 480, 720, 610, 590, 450, 400, 380, 520,
                430, 370, 350, 330, 310, 600, 290, 270, 640, 460, 560)


def bench_genome(iters):
    """Genome-scale multi-region throughput: 22 synthetic diagonal regions
    with realistic 50kb synteny-block sizes (~7.3M true samples), batched
    through the model's single-bucket path (all regions padded to one
    shape so the kernels batch over the full region axis in one dispatch
    chain). Reports seconds per EM iteration (E-step + M-step)."""
    import functools
    import jax
    import jax.numpy as jnp
    from phylo_hmrf_tpu.data.regions import region_from_samples
    from phylo_hmrf_tpu.models.hmrf import _estep_bucket
    from phylo_hmrf_tpu.models.ou import ou_nll_stats
    from phylo_hmrf_tpu.ops.lbfgs import minimize_boxed

    rng = np.random.default_rng(SEED)
    tree, params, means, covs = _bench_tree_and_moments(rng)

    # shape buckets like the production model (hmrf._map_buckets): pad
    # each region to the next multiple of 128 in both dims -> 4 shape
    # classes for these 22 sizes, ~1.8x less padded area than one
    # max-padded bucket (measured 12.4M vs 7.0M pixels)
    regions, warms = [], []
    n_true = 0
    for ridx, h0 in enumerate(GENOME_SIZES):
        x, lab_flat, warm = _sample_blocky(rng, h0, means, covs, shift=ridx)
        reg = region_from_samples(x, h0, h0, True, pad_h=128, pad_w=128,
                                  region_id=ridx)
        regions.append(reg)
        warms.append(reg.labels_to_grid(warm))
        n_true += lab_flat.shape[0]

    shape_idx = {}
    for i, r in enumerate(regions):
        shape_idx.setdefault(r.shape, []).append(i)
    buckets = []
    for shape, idxs in sorted(shape_idx.items()):
        buckets.append((
            jnp.asarray(np.stack([regions[i].img for i in idxs])),
            jnp.asarray(np.stack([regions[i].mask for i in idxs])),
            jnp.asarray(np.stack([regions[i].dmaps for i in idxs])),
            jnp.asarray(np.stack([warms[i] for i in idxs]))))
    means_j = jnp.asarray(means, jnp.float32)
    covs_j = jnp.asarray(covs, jnp.float32)
    estep = jax.jit(functools.partial(
        _estep_bucket, weighted_pp=False,
        labeler="mf_icm", max_sweeps=60, use_pallas=True))
    beta_j, beta1_j = jnp.float32(1.0), jnp.float32(0.5)

    def solve_state(p0, post_c, obs_c, obs2_c):
        def fn(p):
            return ou_nll_stats(p, post_c, obs_c, obs2_c, tree,
                                float(n_true), 1.0, 1e-3)
        return minimize_boxed(fn, p0, 1e-16, 100.0, 150)

    mstep = jax.jit(jax.vmap(solve_state))
    p0 = jnp.asarray(np.random.default_rng(1).random((K, tree.n_params)),
                     jnp.float32)

    def em_chain(n):
        warm_list = [b[3] for b in buckets]
        acc = jnp.float32(0)
        for _ in range(n):
            post = obs = obs2 = None
            # per-shape dispatches chain back-to-back on device (no host
            # sync between buckets), exactly like the model's bucket loop
            for bi, (bimg, bmask, bdmaps, _) in enumerate(buckets):
                labels, (p, o, o2), costs, nv = estep(
                    bimg, bmask, bdmaps, warm_list[bi], means_j, covs_j,
                    beta_j, beta1_j)
                warm_list[bi] = labels
                post = p.sum(0) if post is None else post + p.sum(0)
                obs = o.sum(0) if obs is None else obs + o.sum(0)
                obs2 = o2.sum(0) if obs2 is None else obs2 + o2.sum(0)
                acc = acc + jnp.sum(costs)
            pr, fval = mstep(p0, post, obs, obs2)
            acc = acc + jnp.sum(pr)
        return float(acc)

    em_chain(1)
    em_chain(2)

    def timed(n):
        vals = []
        for _ in range(iters):
            t0 = time.perf_counter()
            em_chain(n)
            vals.append(time.perf_counter() - t0)
        return float(np.median(vals))

    t1, t3 = timed(1), timed(3)
    t_iter = max((t3 - t1) / 2.0, 1e-9)

    # roofline: sum per-bucket E-step costs + one M-step
    flops = bytes_ = 0.0
    estep_plain = jax.jit(functools.partial(
        _estep_bucket, weighted_pp=False, labeler="mf_icm", max_sweeps=60,
        use_pallas=False))
    for bimg, bmask, bdmaps, bwarm in buckets:
        e_args = (bimg, bmask, bdmaps, bwarm, means_j, covs_j, beta_j,
                  beta1_j)
        f, _ = _cost(estep_plain, *e_args)
        _, b = _cost(estep, *e_args)
        flops += f
        bytes_ += b
    bimg, bmask, bdmaps, bwarm = buckets[0]
    _, (post, obs, obs2), _, _ = estep(bimg, bmask, bdmaps, bwarm, means_j,
                                       covs_j, beta_j, beta1_j)
    fm, bm = _cost(mstep, p0, post.sum(0), obs.sum(0), obs2.sum(0))
    util = _roofline(t_iter, flops + fm, bytes_ + bm)
    return t_iter, n_true, util


def main():
    global H0, K, F
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--remeasure-cpu", action="store_true")
    ap.add_argument("--stress", action="store_true",
                    help="10kb-resolution scale (3264^2 grid, 5.3M samples; "
                         "BASELINE config #4); no CPU baseline at this size")
    ap.add_argument("--real", action="store_true",
                    help="real chr22 Hi-C data (3 species) instead of the "
                         "synthetic chr21-sized problem; adds the E-step "
                         "phase breakdown")
    ap.add_argument("--spatial", action="store_true",
                    help="with --stress: run the row-sharded (halo) E-step "
                         "with the fused Pallas kernels instead of the "
                         "single-device bucket path")
    ap.add_argument("--genome", action="store_true",
                    help="genome-scale throughput: 22 synthetic regions "
                         "(~2.8M samples) batched as one bucket")
    ap.add_argument("--states", type=int, default=0,
                    help="override the state count K (e.g. 30 for the "
                         "BASELINE all-chrom config)")
    args = ap.parse_args()

    if args.states:
        K = args.states

    if args.genome:
        tpu_s, n_true, util = bench_genome(args.iters)
        print(json.dumps({
            "metric": "genome_22region_em_iteration_time",
            "value": round(tpu_s, 4),
            "unit": "s",
            "vs_baseline": 0,
            "n_samples": n_true,
            "utilization": util,
        }))
        return

    if args.real:
        F = 3
        tree, region, means, covs, warm, _ = build_real_problem()
        if os.path.exists(REAL_CACHE) and not args.remeasure_cpu:
            with open(REAL_CACHE) as f:
                cpu = json.load(f)
        else:
            total, te, tm = bench_cpu(tree, region, means, covs, warm)
            cpu = {"total_s": total, "estep_s": te, "mstep_s": tm,
                   "H0": region.H0, "K": K, "F": F}
            os.makedirs(os.path.dirname(REAL_CACHE), exist_ok=True)
            with open(REAL_CACHE, "w") as f:
                json.dump(cpu, f, indent=1)
        tpu_s, proto, util = bench_tpu(tree, region, means, covs, warm,
                                       args.iters)
        phases = bench_phases_staged(tree, region, means, covs, warm,
                                     args.iters)
        print(json.dumps({
            "metric": "chr22_real_em_iteration_time",
            "value": round(tpu_s, 4),
            "unit": "s",
            "vs_baseline": round(cpu["total_s"] / tpu_s, 2),
            "protocol": {"median_s": round(tpu_s, 5),
                         "min_s": round(proto["t_iter_min"], 5),
                         "repeats": proto["repeats"],
                         "mstep_s": round(proto["mstep_s"], 5)},
            "phases": {k: (round(v, 5) if isinstance(v, float) else v)
                       for k, v in phases.items()},
            "utilization": util,
        }))
        return

    if args.stress:
        H0 = 3264
        tree, region, means, covs, warm, _ = build_problem()
        util = None
        if args.spatial:
            tpu_s = bench_spatial(tree, region, means, covs, warm,
                                  args.iters)
            metric = "chr21_10kb_spatial_em_iteration_time"
        else:
            tpu_s, _, util = bench_tpu(tree, region, means, covs, warm,
                                       args.iters)
            metric = "chr21_10kb_em_iteration_time"
        out = {
            "metric": metric,
            "value": round(tpu_s, 4),
            "unit": "s",
            "vs_baseline": 0,
        }
        if util is not None:
            out["utilization"] = util
        print(json.dumps(out))
        return

    tree, region, means, covs, warm, _ = build_problem()

    if os.path.exists(CACHE) and not args.remeasure_cpu:
        with open(CACHE) as f:
            cpu = json.load(f)
    else:
        total, te, tm = bench_cpu(tree, region, means, covs, warm)
        cpu = {"total_s": total, "estep_s": te, "mstep_s": tm,
               "H0": H0, "K": K, "F": F}
        os.makedirs(os.path.dirname(CACHE), exist_ok=True)
        with open(CACHE, "w") as f:
            json.dump(cpu, f, indent=1)

    tpu_s, proto, util = bench_tpu(tree, region, means, covs, warm,
                                   args.iters)
    speedup = cpu["total_s"] / tpu_s
    # per-phase breakdown in the default JSON too: cumulative-staged
    # truncations of the production E-step, so the phases sum to
    # estep_total_s and estep_total_s + protocol.mstep_s ~= value
    phases = bench_phases_staged(tree, region, means, covs, warm,
                                 args.iters)
    print(json.dumps({
        "metric": "chr21_50kb_em_iteration_time",
        "value": round(tpu_s, 4),
        "unit": "s",
        "vs_baseline": round(speedup, 2),
        "protocol": {"median_s": round(tpu_s, 5),
                     "min_s": round(proto["t_iter_min"], 5),
                     "repeats": proto["repeats"],
                     "mstep_s": round(proto["mstep_s"], 5)},
        "phases": {k: (round(v, 5) if isinstance(v, float) else v)
                   for k, v in phases.items()},
        "utilization": util,
    }))


if __name__ == "__main__":
    # the remote-TPU tunnel occasionally throws a transient
    # FAILED_PRECONDITION on first contact; one retry clears it
    try:
        main()
    except Exception:
        time.sleep(5)
        main()
