"""PhyloHMRF — the model class and EM engine.

TPU-native redesign of the reference's `_BaseGraph.fit_accumulate_test` +
`phyloHMRF` (reference base.py:301-455, phylo_hmrf.py:51-1528):

* the per-region process fan-out (`base.py:357`) becomes jitted, vmapped
  E-steps over shape-bucketed region stacks (optionally shard_mapped over a
  device mesh, see parallel/sharding.py);
* graph-cut labeling becomes the annealed mean-field + checkerboard ICM
  labeler (ops/icm.py), with the exact C++ swap oracle as a CPU option;
* the serial per-state SLSQP M-step (`phylo_hmrf.py:1515`) becomes one
  vmapped boxed L-BFGS solve over all K states;
* sufficient statistics reduce with a masked-matmul segment sum instead of
  `np.einsum` per worker (`phylo_hmrf.py:314`).

Host-side control flow (convergence bookkeeping, best-iteration tracking,
retry policies) replicates the reference exactly.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from phylo_hmrf_tpu.config import (PhyloHMRFConfig, SMALL_EPS,
                                   parse_hybrid_labeler)
from phylo_hmrf_tpu.data.regions import RegionGrid, flat_edge_list
from phylo_hmrf_tpu.models.emission import (gaussian_logpdf,
                                            gaussian_logpdf_kmajor)
from phylo_hmrf_tpu.models.ou import (
    check_params, ou_moments_batch, ou_nll_init, ou_nll_stats,
    propagate_mean_guess)
from phylo_hmrf_tpu.ops.icm import label_optimize
from phylo_hmrf_tpu.ops.kmeans import kmeans
from phylo_hmrf_tpu.ops.lbfgs import minimize_boxed
from phylo_hmrf_tpu.ops.potts import (
    pairwise_potential, posteriors_and_costs, sufficient_stats, valid_maps,
    weight_maps)
from phylo_hmrf_tpu.tree import PhyloTree


def _gauss_logpdf_np(X, mean, cov, min_covar):
    """Double-precision Gaussian logpdf with the reference's robustness
    semantics (sklearn log_multivariate_normal_density + jitter loop,
    reference phylo_hmrf.py:266-268, 1108-1133): symmetrize, Cholesky with
    escalating min_covar jitter, eigen-pinv as the last resort."""
    c = 0.5 * (np.asarray(cov, np.float64) + np.asarray(cov, np.float64).T)
    F = c.shape[0]
    d = X - np.asarray(mean, np.float64)
    for mult in (0.0, 1.0, 10.0):
        try:
            L = np.linalg.cholesky(c + mult * min_covar * np.eye(F))
            sol = np.linalg.solve(L, d.T)
            logdet = 2.0 * np.log(np.diag(L)).sum()
            return -0.5 * (np.sum(sol * sol, axis=0) + logdet
                           + F * np.log(2.0 * np.pi))
        except np.linalg.LinAlgError:
            continue
    w, v = np.linalg.eigh(c)
    w_inv = np.where(w > 1e-12, 1.0 / np.maximum(w, 1e-12), 0.0)
    sol = (d @ v) * np.sqrt(w_inv)
    logdet = np.log(np.maximum(w, 1e-12)).sum()
    return -0.5 * (np.sum(sol * sol, axis=1) + logdet
                   + F * np.log(2.0 * np.pi))


@dataclasses.dataclass
class FitResult:
    """Mirrors the reference's fit_accumulate_test return tuple
    (base.py:455) + restored moments."""
    params_vec: np.ndarray     # best-cost OU params (K, n_params)
    params_vec1: np.ndarray    # best-cost-from-iter-3 OU params
    params_list: np.ndarray    # (n_iters, K, n_params)
    iter_id1: int              # iteration of the overall best cost
    iter_id2: int              # iteration of the best cost from iter >= 3
    cost_vec: np.ndarray       # (n_iters, 4): [iter, pairwise, unary, cost1]
    labels: np.ndarray         # (N,) flat states at iter_id2
    means: np.ndarray          # (K, F) restored from params_vec
    covars: np.ndarray         # (K, F, F) restored from params_vec
    n_iters: int = 0
    state_list: np.ndarray | None = None   # (n_iters, N) when track_states


def _estep_bucket(img, mask, dmaps, warm, means, covars, beta, beta1, *,
                  weighted_pp: bool, labeler: str, max_sweeps: int,
                  use_pallas: bool = False):
    """One jitted E-step over a stacked region bucket.

    img (R,H,W,F), mask (R,H,W), dmaps (R,4,H,W), warm (R,H,W) labels.
    Returns (labels (R,H,W), per-region (post (R,K), obs (R,K,F),
    obs2 (R,K,F,F)), cost_vec (R,4), n_valid (R,)). Stats come back
    PER REGION so the host can sum them in a fixed global region order in
    f64 — the reduction is then bitwise identical no matter how regions
    are bucketed or partitioned across processes (the multi-process
    trajectory equals the single-process one exactly).
    With ``use_pallas`` (TPU), the annealed
    mean-field stage runs as the fused Pallas kernel batched over regions.
    """
    from phylo_hmrf_tpu.ops.icm import icm_with_energy, mean_field

    w_cut = weight_maps(dmaps, beta1)                    # elementwise: ok batched

    if labeler == "mf_icm" and use_pallas:
        # fully batched Pallas path, K-major end to end (the unary is
        # emitted state-major; no strided relayout anywhere): fused-MF
        # proposal + sweep-pair ICM for both starts (separate calls: each
        # convergence while_loop exits on its own — the warm start usually
        # converges in one pair mid-EM); selection energies and the
        # posterior/cost/stats tail come from the fused reduction kernels
        from phylo_hmrf_tpu.models.emission import gaussian_logpdf_kmajor
        from phylo_hmrf_tpu.ops.finish_pallas import potts_energy_pallas
        from phylo_hmrf_tpu.ops.icm_pallas import icm_pallas
        from phylo_hmrf_tpu.ops.mf_pallas import mean_field_pallas_kmajor

        unary_k = -gaussian_logpdf_kmajor(img, means, covars)  # (R,K,H,W)
        mf_labels = mean_field_pallas_kmajor(unary_k, w_cut, beta)
        cand_a = icm_pallas(None, w_cut, mask, mf_labels, beta, max_sweeps,
                            unary_k=unary_k)
        cand_b = icm_pallas(None, w_cut, mask, warm, beta, max_sweeps,
                            unary_k=unary_k)
        mask_i = mask.astype(jnp.int32)
        e_a = potts_energy_pallas(unary_k, mask_i, cand_a, w_cut, beta)
        e_b = potts_energy_pallas(unary_k, mask_i, cand_b, w_cut, beta)
        labels_pre = jnp.where((e_a <= e_b)[:, None, None], cand_a, cand_b)
        stats, cost_vec, n_valid = _finish_fused(
            unary_k, img, mask, dmaps, labels_pre, beta, beta1, weighted_pp,
            from_unary=True)
        return labels_pre, stats, cost_vec, n_valid

    logprob = gaussian_logpdf(img, means, covars)        # (R,H,W,K)
    unary = -logprob

    if labeler == "mf_icm":
        mf_labels = jax.vmap(lambda u, w: mean_field(u, w, beta))(
            unary, w_cut)
    else:
        mf_labels = warm   # unused placeholder with the right shape

    def one(unary_r, wcut_r, dmaps_r, mask_r, warm_r, mf_r, logprob_r,
            img_r):
        if labeler == "mf_icm":
            cand_a, e_a = icm_with_energy(unary_r, wcut_r, mask_r, mf_r,
                                          beta, max_sweeps)
            cand_b, e_b = icm_with_energy(unary_r, wcut_r, mask_r, warm_r,
                                          beta, max_sweeps)
            labels = jnp.where(e_a <= e_b, cand_a, cand_b)
        else:
            labels = label_optimize(unary_r, wcut_r, mask_r, warm_r, beta,
                                    method=labeler, max_sweeps=max_sweeps)
        w_pp = wcut_r if weighted_pp else valid_maps(dmaps_r)
        K = unary_r.shape[-1]
        pp = pairwise_potential(labels, w_pp, K, beta)
        posteriors, cost_vec, n_valid = posteriors_and_costs(
            logprob_r, labels, pp, mask_r, SMALL_EPS)
        post, obs, obs2 = sufficient_stats(posteriors, img_r, mask_r)
        return labels, post, obs, obs2, cost_vec, n_valid

    labels, post, obs, obs2, cost_vec, n_valid = jax.vmap(one)(
        unary, w_cut, dmaps, mask, warm, mf_labels, logprob, img)
    return labels, (post, obs, obs2), cost_vec, n_valid


def _finish_fused(lp_k, img, mask, dmaps, labels, beta, beta1,
                  weighted_pp: bool, from_unary: bool = False):
    """Pallas fused posterior/cost/stats reduction (ops/finish_pallas.py);
    lp_k is the K-major (R, K, H, W) log-density field — or, with
    ``from_unary``, the already-materialized unary field (-logprob), which
    the kernel flips per-tile (bitwise identical; avoids a second K-major
    HBM slab at the pallas_call boundary). Returns (per-region
    (post, obs, obs2), cost_vec (R,4), n_valid (R,)) with
    `posteriors_and_costs` cost semantics."""
    from phylo_hmrf_tpu.ops.finish_pallas import finish_stats_pallas

    w_pp = weight_maps(dmaps, beta1) if weighted_pp else valid_maps(dmaps)
    img_f = jnp.transpose(img, (0, 3, 1, 2))
    post, obs, obs2, sums = finish_stats_pallas(
        lp_k, img_f, mask.astype(jnp.int32), labels.astype(jnp.int32),
        w_pp, beta, SMALL_EPS, negate=from_unary)
    n_valid = sums[:, 3]
    nv = jnp.maximum(n_valid, 1.0)
    pairwise_cost = sums[:, 0] / nv
    pairwise_nrm = -sums[:, 1] / nv
    unary_cost = -sums[:, 2] / nv
    cost_vec = jnp.stack(
        [pairwise_cost, pairwise_nrm, unary_cost,
         unary_cost + pairwise_nrm], axis=-1)
    return (post, obs, obs2), cost_vec, n_valid


def _finish_bucket(img, mask, dmaps, labels, means, covars, beta, beta1, *,
                   weighted_pp: bool, use_pallas: bool = False):
    """Posterior/stats pass for externally supplied labels (swap backend)."""
    if use_pallas:
        from phylo_hmrf_tpu.models.emission import gaussian_logpdf_kmajor
        lp_k = gaussian_logpdf_kmajor(img, means, covars)
        return _finish_fused(lp_k, img, mask, dmaps, labels, beta, beta1,
                             weighted_pp)
    logprob = gaussian_logpdf(img, means, covars)

    def one(dmaps_r, mask_r, labels_r, logprob_r, img_r):
        w_cut = weight_maps(dmaps_r, beta1)
        w_pp = w_cut if weighted_pp else valid_maps(dmaps_r)
        K = logprob_r.shape[-1]
        pp = pairwise_potential(labels_r, w_pp, K, beta)
        posteriors, cost_vec, n_valid = posteriors_and_costs(
            logprob_r, labels_r, pp, mask_r, SMALL_EPS)
        post, obs, obs2 = sufficient_stats(posteriors, img_r, mask_r)
        return post, obs, obs2, cost_vec, n_valid

    post, obs, obs2, cost_vec, n_valid = jax.vmap(one)(
        dmaps, mask, labels, logprob, img)
    return (post, obs, obs2), cost_vec, n_valid


# ---------------------------------------------------------------------------
# module-level jitted entry points. Closures capture nothing model-specific:
# scalars (beta, n_samples, ...) are traced and the tree is a hashable static
# argument, so every PhyloHMRF instance in a process shares compiled kernels.
# ---------------------------------------------------------------------------

def _map_buckets(fn, items):
    """Run ``fn(*item)`` over shape buckets, threaded when there are
    several.

    XLA compiles lazily, per (shape, K) signature, largely single-threaded
    per program — an all-chromosome run has ~22 distinct region shapes, so
    a cold start otherwise pays ~22 serial compiles. Compilation releases
    the GIL, so plain threads overlap them. Warm calls gain too: one
    bucket's host-side cycle syncs (exact move-making) no longer serialize
    the next bucket's dispatch chain. Results come back in input order and
    every shared-state update stays on the calling thread, so results and
    trajectories are unchanged."""
    items = list(items)
    if len(items) <= 1:
        return [fn(*it) for it in items]
    import concurrent.futures as cf
    with cf.ThreadPoolExecutor(max_workers=min(len(items), 16)) as ex:
        return list(ex.map(lambda it: fn(*it), items))


_ESTEP_JIT = jax.jit(_estep_bucket, static_argnames=(
    "weighted_pp", "labeler", "max_sweeps", "use_pallas"))
_FINISH_JIT = jax.jit(_finish_bucket, static_argnames=("weighted_pp", "use_pallas"))
_UNARY_JIT = jax.jit(lambda img, means, covars: -gaussian_logpdf(
    img, means, covars))
_UNARY_KMAJOR_JIT = jax.jit(lambda img, means, covars: -gaussian_logpdf_kmajor(
    img, means, covars))


@functools.partial(jax.jit, static_argnames=("tree", "lo", "hi", "iters"))
def _mstep_solve(p0, post, obs, obs2, n_samples, lambda_0, min_covar, *,
                 tree, lo, hi, iters):
    def one(p0_c, post_c, obs_c, obs2_c):
        def fn(p):
            return ou_nll_stats(p, post_c, obs_c, obs2_c, tree, n_samples,
                                lambda_0, min_covar)
        return minimize_boxed(fn, p0_c, lo, hi, iters)
    return jax.vmap(one)(p0, post, obs, obs2)


def _check_params_device(solved, n_nodes: int, lo=0.0, hi=100.0):
    """Vectorized device twin of ``ou.check_params`` (reference
    ``_check_params``, phylo_hmrf.py:1405-1425): per-state validity of the
    (K, P) solved params. f32 device comparisons agree bitwise with the
    host's f64 test because the f32->f64 cast is exact and the bounds are
    exactly representable."""
    B = n_nodes - 1
    p1 = solved[:, 1:]
    alpha, lam, theta = p1[:, :B], p1[:, B:2 * B], p1[:, 2 * B:]
    finite = ~jnp.isnan(p1).any(axis=1)
    in_box = ((alpha >= lo).all(1) & (alpha <= hi).all(1)
              & (lam >= lo).all(1) & (lam <= hi).all(1)
              & (theta >= -hi).all(1) & (theta <= hi).all(1))
    return finite & in_box


@functools.partial(jax.jit, static_argnames=("tree", "lo", "hi", "iters"))
def _mstep_solve_full(p0, post, obs, obs2, n_samples, lambda_0, min_covar, *,
                      tree, lo, hi, iters):
    """M-step solve + validity + OU moments in ONE dispatch so the host
    blocks on exactly one device_get per EM iteration. The separate
    solve-fetch / check / moments-fetch sequence paid three D2H round
    trips over the remote TPU tunnel (0.05-8 s each, PARITY §Canonical) —
    the dominant share of the round-4 canonical M-step wall (13.7 s / 32
    iters). The speculative moments are only consumed when every state
    passes validity on attempt 0 (the overwhelmingly common case: the
    sigmoid box reparameterization keeps solutions inside the reference
    box by construction, so only a NaN solve can fail); otherwise
    ``mstep`` falls back to the exact retry path.

    The returned covariances already carry the ``min_covar`` diagonal
    jitter, added HERE in the model dtype so the device tensor the next
    E-step consumes is bitwise-equal to the host mirror (an f64 host add
    rounded back to f32 can differ by one ulp from the f32 add — double
    rounding — which would fork the pipelined-fit trajectory from the
    sequential one)."""
    solved, _ = _mstep_solve(
        p0, post, obs, obs2, n_samples, lambda_0, min_covar,
        tree=tree, lo=lo, hi=hi, iters=iters)
    valid = _check_params_device(solved, tree.n_nodes)
    means, covars = ou_moments_batch(solved, tree)
    covars = covars + min_covar * jnp.eye(covars.shape[-1], dtype=covars.dtype)
    return solved, valid, means, covars


@functools.partial(jax.jit, static_argnames=("tree", "lo", "hi", "iters"))
def _init_solve(p0, xbar, xxT, min_covar, *, tree, lo, hi, iters):
    def one(p0_c, xbar_c, xxT_c):
        def fn(p):
            return ou_nll_init(p, xbar_c, xxT_c, tree, min_covar)
        return minimize_boxed(fn, p0_c, lo, hi, iters)
    return jax.vmap(one)(p0, xbar, xxT)


@functools.partial(jax.jit, static_argnames=("tree",))
def _moments(params, *, tree):
    return ou_moments_batch(params, tree)


@functools.partial(jax.jit, static_argnames=("k",))
def _init_cluster_stats(X, labels, k: int):
    """Per-cluster count / mean / second moment from device-resident
    k-means labels, as one-hot segment-sum matmuls (MXU) instead of a host
    loop over clusters. Keeping this on device lets ``initialize`` block on
    exactly ONE device_get — over the remote tunnel each D2H fetch pays a
    0.1-8 s round trip (PARITY §Canonical), and the old host path needed
    the labels before it could form the M-step init stats."""
    f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    Xd = X.astype(f64)
    onehot = jax.nn.one_hot(labels, k, dtype=Xd.dtype)
    cnt = onehot.sum(0)
    denom = jnp.maximum(cnt, 1.0)
    xbar = (onehot.T @ Xd) / denom[:, None]
    n, f = X.shape
    xpair = (Xd[:, :, None] * Xd[:, None, :]).reshape(n, f * f)
    xxT = ((onehot.T @ xpair) / denom[:, None]).reshape(k, f, f)
    return xbar, xxT, cnt


@functools.partial(jax.jit, static_argnames=("tree", "n_params"))
def _init_guess(centers, rand_part, *, tree, n_params: int):
    """Tree-propagated initial guesses on device — a bitwise mirror of
    `propagate_mean_guess` (models/ou.py:251, reference ``_ou_init_guess``
    phylo_hmrf.py:1453-1480): the flag bookkeeping is purely structural, so
    it runs at trace time and emits the exact 0.5-weighted add sequence the
    host loop performs. ``rand_part`` carries the host RNG draws so the
    stream order matches the host path draw-for-draw."""
    n = tree.n_nodes
    k = centers.shape[0]
    vals = [None] * n
    for li, leaf in enumerate(tree.leaf_nodes):
        vals[int(leaf)] = centers[:, li]
    flags = [0 if v is None else 2 for v in vals]
    for j in range(n - 1, 0, -1):
        p = int(tree.parent[j])
        if flags[p] == 0:
            vals[p] = vals[j]
            flags[p] = 1
        elif flags[p] == 1:
            vals[p] = 0.5 * vals[p] + 0.5 * vals[j]
            flags[p] = 2
    zero = jnp.zeros((k,), centers.dtype)
    mean_full = jnp.stack(
        [v if v is not None else zero for v in vals], axis=1)
    return jnp.concatenate([rand_part[:, :n_params - n], mean_full], axis=1)


class PhyloHMRF:
    """Phylo-HMRF model over a set of region grids."""

    def __init__(self, tree: PhyloTree, regions: Sequence[RegionGrid],
                 config: PhyloHMRFConfig | None = None, mesh=None):
        self.tree = tree
        self.regions = list(regions)
        self.cfg = config or PhyloHMRFConfig()
        self.mesh = mesh
        cfg = self.cfg

        self.n_states = cfg.n_states
        self.n_features = tree.n_leaves
        self.n_params = tree.n_params

        # opt-in strict-parity precision: the reference runs f64 end to end
        # (f64 sklearn logpdf phylo_hmrf.py:266-268, SLSQP on f64
        # objectives :1383); dtype="float64" runs the unary, costs and
        # M-step objective in f64 on device (jax x64). The fused Pallas
        # kernels are f32-only, so they are bypassed in this mode.
        if cfg.dtype not in ("float32", "float64"):
            raise ValueError(f"dtype must be float32/float64, got "
                             f"{cfg.dtype!r}")
        if cfg.dtype == "float64" and not jax.config.jax_enable_x64:
            # jax x64 is inherently process-global: flipping it here
            # affects every later trace in this process (weak-type
            # promotion, integer carry widths). Warn so a caller mixing
            # f32 and f64 models in one process knows the f32 models now
            # trace under x64 semantics (their arrays stay f32, but
            # unpinned literals promote differently).
            import warnings
            warnings.warn(
                "dtype='float64' enables jax_enable_x64 for the whole "
                "process; construct f64 models in a dedicated process if "
                "you also run f32 models", stacklevel=2)
            jax.config.update("jax_enable_x64", True)
        self._dtype = jnp.dtype(cfg.dtype)
        self._np_dtype = np.dtype(cfg.dtype)

        # flat-sample layout (reference len_vec offsets)
        self.offsets = np.zeros(len(self.regions) + 1, dtype=np.int64)
        for i, r in enumerate(self.regions):
            if r.img.shape[-1] != self.n_features:
                raise ValueError(
                    f"region {i} has {r.img.shape[-1]} features, tree has "
                    f"{self.n_features} leaves")
            self.offsets[i + 1] = self.offsets[i] + r.n_samples
        self.n_samples = int(self.offsets[-1])
        # in multi-process data-parallel runs (parallel/multiproc.py) this
        # is the GLOBAL sample count; the local/global distinction matters
        # for the cost normalization and the M-step's 1/n, lambda_0/sqrt(n)
        self.n_samples_total = self.n_samples

        # (0, 10) when this process's pod-scale share is empty (more
        # processes than regions) — downstream gathers need the column dim
        self.len_vec = np.asarray([
            r.len_vec_row(int(self.offsets[i]), int(self.offsets[i + 1]))
            for i, r in enumerate(self.regions)],
            dtype=np.int64).reshape(-1, 10)

        # shape buckets for jitted batching; with a mesh, bucket leading axes
        # are padded to the mesh size and placed region-sharded on devices
        self._n_shards = (int(self.mesh.devices.size)
                          if self.mesh is not None else 1)
        self._spatial = (self._n_shards > 1 and cfg.shard_mode == "spatial")
        if self._spatial:
            if cfg.labeler != "mf_icm":
                raise ValueError(
                    f"shard_mode='spatial' only supports labeler='mf_icm' "
                    f"(the row-sharded E-step is the MF+ICM pipeline); got "
                    f"labeler={cfg.labeler!r} — use shard_mode='region' "
                    f"for the other labelers")
            for r in self.regions:
                if r.shape[0] % self._n_shards:
                    raise ValueError(
                        f"spatial sharding needs region H divisible by the "
                        f"mesh size ({self._n_shards}); region "
                        f"{r.region_id} has H={r.shape[0]} — raise pad_h")
        self._buckets = {}
        for idx, r in enumerate(self.regions):
            self._buckets.setdefault(r.shape, []).append(idx)
        self._bucket_arrays = {}
        # device-side warm-label cache: shape -> (tuple of the per-region
        # label entries an estep produced, padded bucket labels on device);
        # hit when the warm grids passed in ARE those same entries — keyed
        # per entry, so any caller holding the previous estep's outputs
        # (fit's warm start, predict(), or an externally reconstructed
        # list) skips the per-iteration host<->device label round-trip
        # (~16 MB/iteration over the tunnel at canonical scale). Entries
        # are immutable jax arrays, so identity implies unchanged content.
        self._dev_warm = {}
        self._dev_warm_hits = 0
        for shape, idxs in self._buckets.items():
            img = np.stack([self.regions[i].img
                            for i in idxs]).astype(self._np_dtype)
            mask = np.stack([self.regions[i].mask for i in idxs])
            dmaps = np.stack([self.regions[i].dmaps
                              for i in idxs]).astype(self._np_dtype)
            if self._n_shards > 1 and not self._spatial:
                from phylo_hmrf_tpu.parallel.sharding import (
                    device_put_bucket, pad_bucket_to_devices)
                img, mask, dmaps, _ = pad_bucket_to_devices(
                    img, mask, dmaps, self._n_shards)
                img, mask, dmaps = device_put_bucket(self.mesh, img, mask,
                                                     dmaps)
            else:
                img, mask, dmaps = (jnp.asarray(img), jnp.asarray(mask),
                                    jnp.asarray(dmaps))
            self._bucket_arrays[shape] = (idxs, img, mask, dmaps)

        self._hybrid = parse_hybrid_labeler(cfg.labeler)
        labeler = ("mf_icm" if (self._hybrid is not None or cfg.labeler in
                   ("swap", "swap_tpu", "expansion", "expansion_tpu"))
                   else cfg.labeler)
        if cfg.use_pallas == "auto":
            use_pallas = jax.default_backend() == "tpu"
        else:
            use_pallas = cfg.use_pallas == "on"
        if cfg.dtype == "float64":
            use_pallas = False   # the fused kernels are f32-only
        self._beta = jnp.asarray(cfg.beta, self._dtype)
        self._beta1 = jnp.asarray(cfg.beta1, self._dtype)
        self._labeler_static = labeler
        self._use_pallas = use_pallas
        if self._spatial:
            from jax.sharding import NamedSharding, PartitionSpec
            from phylo_hmrf_tpu.parallel.halo import make_rowsharded_estep
            self._spatial_estep = make_rowsharded_estep(
                self.mesh, weighted_pp=(cfg.estimate_type == 3),
                max_sweeps=cfg.icm_max_sweeps, use_pallas=use_pallas)
            rows = NamedSharding(self.mesh, PartitionSpec("data"))
            rows1 = NamedSharding(self.mesh, PartitionSpec(None, "data"))
            self._spatial_arrays = [
                (jax.device_put(jnp.asarray(r.img), rows),
                 jax.device_put(jnp.asarray(r.mask), rows),
                 jax.device_put(jnp.asarray(r.dmaps), rows1))
                for r in self.regions]
        elif self._n_shards > 1:
            from phylo_hmrf_tpu.parallel.sharding import make_sharded_estep
            self._sharded_estep = make_sharded_estep(
                self.mesh, weighted_pp=(cfg.estimate_type == 3),
                labeler=labeler, max_sweeps=cfg.icm_max_sweeps,
                use_pallas=use_pallas)

        # mutable fit state
        self._rng = np.random.default_rng(cfg.seed)
        self.params_vec = None       # (K, P) current OU params
        self.init_ou_params = None   # (K, P) k-means-fit OU params
        self.means_ = None           # (K, F)
        self.covars_ = None          # (K, F, F)
        self._moments_dev = None     # device twins of (means_, covars_) when
                                     # the last mstep produced them on device
        self.labels_local = None     # list of (H, W) warm-start label grids

    # ------------------------------------------------------------------
    # initialization (reference `_init`, phylo_hmrf.py:205-264)
    # ------------------------------------------------------------------

    def flat_values(self) -> np.ndarray:
        if not self.regions:
            # pod-scale multi-process runs can deal this process an EMPTY
            # region share; the (0, F) shape keeps the init allgather and
            # the downstream reductions well-formed
            return np.zeros((0, self.n_features), np.float32)
        return np.concatenate([r.flat_values() for r in self.regions], axis=0)

    def _init_arrays(self):
        """(X, per-region [start, stop) slices into X) consumed by
        ``initialize``. The multi-process subclass returns the GLOBAL
        sample matrix here so k-means + the per-cluster OU fits are
        identical to a single-process run's."""
        slices = [(int(self.offsets[i]), int(self.offsets[i + 1]))
                  for i in range(len(self.regions))]
        return self.flat_values(), slices

    def initialize(self):
        cfg = self.cfg
        X, init_slices = self._init_arrays()
        K = self.n_states

        pre = None
        if cfg.kmeans_backend == "sklearn":
            # reference-parity init (`phylo_hmrf.py:234-240`)
            from sklearn.cluster import MiniBatchKMeans
            km = MiniBatchKMeans(n_clusters=K, random_state=cfg.seed,
                                 batch_size=2000, max_iter=1000, n_init=10)
            km.fit(X)
            centers = np.asarray(km.cluster_centers_, np.float64)
            labels = np.asarray(km.labels_)
        else:
            # fully device-resident init pipeline: k-means -> per-cluster
            # stats -> tree-propagated guesses -> attempt-0 OU init solve,
            # all dispatched async, then ONE blocking device_get. Over the
            # remote tunnel each D2H fetch pays a 0.1-8 s round trip, so
            # the old (fetch labels -> host stats -> fetch solve) chain
            # made init wall nondeterministic (measured 7-46 s canonical).
            key = jax.random.PRNGKey(cfg.seed)
            X_dev = jnp.asarray(X)
            centers_d, labels_d, _ = kmeans(key, X_dev, K)
            xbar_d, xxT_d, cnt_d = _init_cluster_stats(X_dev, labels_d, K)
            # host RNG draws in the legacy order (params first, then one
            # guess per cluster) so the stream matches the host path
            params_draw = self._rng.random((K, self.n_params))
            rand_part = np.stack([
                cfg.initial_magnitude * self._rng.random(self.n_params)
                for _ in range(K)])
            f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
            guesses_d = _init_guess(
                centers_d.astype(f64), jnp.asarray(rand_part, f64),
                tree=self.tree, n_params=self.n_params)
            solved_d, _ = _init_solve(
                guesses_d.astype(self._dtype), xbar_d.astype(self._dtype),
                xxT_d.astype(self._dtype),
                jnp.asarray(cfg.min_covar, self._dtype),
                tree=self.tree, lo=cfg.param_lo, hi=cfg.param_hi,
                iters=cfg.mstep_iters)
            (centers, labels, xbar, xxT, cnt, guesses, solved0) = \
                jax.device_get((centers_d, labels_d, xbar_d, xxT_d, cnt_d,
                                guesses_d, solved_d))
            centers = np.asarray(centers, np.float64)
            pre = dict(
                xbar=np.asarray(xbar, np.float64),
                xxT=np.asarray(xxT, np.float64),
                occupied=np.asarray(cnt) > 0,
                params=np.asarray(params_draw, np.float64),
                guesses=np.asarray(guesses, np.float64),
                solved0=np.asarray(solved0, np.float64))

        # multi-process hook: the k-means result seeds labels_local, so any
        # cross-process tie-break/compilation nondeterminism here would
        # fork the warm starts (and the whole trajectory); the multiproc
        # subclass broadcasts process 0's result bit-exactly (the OU init
        # params computed from pre-sync stats are themselves broadcast from
        # process 0 right after `initialize`, multiproc.py)
        centers, labels = self._sync_init(centers, labels)

        self.means_ = centers.copy()
        cv = np.cov(X.T) + cfg.min_covar * np.eye(self.n_features)
        self.covars_ = np.tile(cv, (K, 1, 1))
        self._moments_dev = None    # iteration 0 consumes the host init

        self.init_ou_params = self._fit_init_params(X, labels, centers, pre)
        self.params_vec = self.init_ou_params.copy()

        # warm-start label grids per region
        self.labels_local = []
        for i, r in enumerate(self.regions):
            s0, s1 = init_slices[i]
            self.labels_local.append(r.labels_to_grid(labels[s0:s1]))
        self.init_labels = labels.copy()

    def _sync_init(self, centers, labels):
        """Identity hook; `MultiProcessPhyloHMRF` broadcasts process 0's
        k-means result so every process warm-starts identically."""
        return centers, labels

    def _fit_init_params(self, X, labels, centers, pre=None) -> np.ndarray:
        """Per-cluster OU fits (reference `_init_ou_param` + `_ou_optimize_init`,
        phylo_hmrf.py:184-203, 1427-1498), vmapped over clusters.

        ``pre`` (from the fused device init pipeline in ``initialize``)
        carries the already-fetched cluster stats, RNG draws, guesses and
        the attempt-0 solve, so the common path adds zero device round
        trips here; retries (rare: a cluster failing `check_params`) fall
        back to host-dispatched solves."""
        cfg = self.cfg
        K = self.n_states
        F = self.n_features
        P = self.n_params
        if pre is not None:
            xbar, xxT, occupied = pre["xbar"], pre["xxT"], pre["occupied"]
            params, guesses = pre["params"].copy(), pre["guesses"].copy()
        else:
            xbar = np.zeros((K, F))
            xxT = np.zeros((K, F, F))
            occupied = np.zeros(K, dtype=bool)
            for c in range(K):
                sel = labels == c
                if sel.sum() == 0:
                    continue
                occupied[c] = True
                Xc = X[sel]
                xbar[c] = Xc.mean(0)
                xxT[c] = Xc.T @ Xc / Xc.shape[0]

            # reference ctor random init (:109)
            params = self._rng.random((K, P))
            guesses = np.stack([
                propagate_mean_guess(centers[c], self.tree, self._rng,
                                     cfg.initial_magnitude, P)
                for c in range(K)])

        for attempt in range(cfg.mstep_retries):
            if attempt == 0 and pre is not None:
                solved = pre["solved0"]
            else:
                solved, _ = _init_solve(
                    jnp.asarray(guesses, self._dtype),
                    jnp.asarray(xbar, self._dtype),
                    jnp.asarray(xxT, self._dtype),
                    jnp.asarray(cfg.min_covar, self._dtype),
                    tree=self.tree, lo=cfg.param_lo, hi=cfg.param_hi,
                    iters=cfg.mstep_iters)
                solved = np.asarray(solved, np.float64)
            bad = []
            for c in range(K):
                if not occupied[c]:
                    continue
                if check_params(solved[c], self.tree.n_nodes) > 0:
                    params[c] = solved[c]
                else:
                    bad.append(c)
            if not bad:
                break
            for c in bad:
                guesses[c] = propagate_mean_guess(
                    centers[c], self.tree, self._rng, cfg.initial_magnitude, P)
        else:
            for c in bad:
                # reference fallback: tree-propagated random guess
                params[c] = propagate_mean_guess(
                    centers[c], self.tree, self._rng, cfg.initial_magnitude, P)
        return params

    # ------------------------------------------------------------------
    # E-step
    # ------------------------------------------------------------------

    def estep(self, means, covars, warm_grids, exact_method=None,
              defer=False):
        """Run the E-step over all buckets.

        ``exact_method`` ("swap"/"expansion") forces an exact on-device
        graph-cut labeling for this call — the hybrid labelers
        ("mf_icm+swap@N") use it for their periodic exact passes.
        Returns (label_grids per region, PER-REGION stats (post (R, K),
        obs (R, K, F), obs2 (R, K, F, F)), costs (n_regions, 4),
        n_valid (n_regions,)). Stats are reduced later by `_global_stats`
        in a fixed global region order so the trajectory is independent of
        bucketing and process partitioning.

        ``defer=True`` returns ``(label_grids, collect)`` instead, where
        ``collect()`` performs the single blocking device fetch and returns
        ``(stats, costs, nvalid)``. The pipelined fit dispatches the next
        iteration's E-step against speculative device moments BEFORE
        collecting this one, so the fetch overlaps device execution — the
        values are bitwise identical either way (`means`/`covars` may be
        the device twins from `mstep_dispatch`; they equal the host
        mirrors' model-dtype casts by construction).
        """
        cfg = self.cfg
        if self._spatial and exact_method is not None:
            # fit can't reach this (init rejects hybrid/exact labelers in
            # spatial mode) but a direct caller must not get a silent
            # mean-field pass when it asked for an exact one
            raise ValueError("exact_method is not supported with "
                             "shard_mode='spatial'; use shard_mode='region'")
        K, F = self.n_states, self.n_features
        R = len(self.regions)
        post = np.zeros((R, K))
        obs = np.zeros((R, K, F))
        obs2 = np.zeros((R, K, F, F))
        costs = np.zeros((len(self.regions), 4))
        nvalid = np.zeros(len(self.regions))
        label_grids = [None] * len(self.regions)

        means_j = jnp.asarray(means, self._dtype)
        covars_j = jnp.asarray(covars, self._dtype)

        # All stats fetches are deferred and shipped host-side in ONE
        # device_get at the end of the bucket loop: a per-bucket
        # np.asarray both pays a D2H round-trip per array (the remote
        # tunnel's RTT is wildly variable, 1 ms-seconds) and serializes
        # the next bucket's dispatch behind the previous bucket's fetch.
        # Values are bitwise identical either way — the host-side f64
        # widening and region-order reduction are unchanged.
        pending = []

        def _scatter_pending():
            got = jax.device_get([t[1:] for t in pending])
            for (idxs, *_), (p, o, o2, cv, nv) in zip(pending, got):
                p, o, o2 = (np.asarray(p, np.float64),
                            np.asarray(o, np.float64),
                            np.asarray(o2, np.float64))
                cv = np.asarray(cv, np.float64)
                nv = np.asarray(nv, np.float64)
                for bi, ri in enumerate(idxs):
                    post[ri], obs[ri], obs2[ri] = p[bi], o[bi], o2[bi]
                    costs[ri] = cv[bi]
                    nvalid[ri] = nv[bi]

        def _finish(label_grids):
            if not defer:
                _scatter_pending()
                return label_grids, (post, obs, obs2), costs, nvalid
            for t in pending:   # start the D2H copies behind the scenes
                for a in t[1:]:
                    try:
                        a.copy_to_host_async()
                    except AttributeError:
                        break

            def collect():
                _scatter_pending()
                return (post, obs, obs2), costs, nvalid
            return label_grids, collect

        if self._spatial:
            from jax.sharding import NamedSharding, PartitionSpec
            rows = NamedSharding(self.mesh, PartitionSpec("data"))
            for ri, (img, mask, dmaps) in enumerate(self._spatial_arrays):
                warm = jax.device_put(jnp.asarray(warm_grids[ri]), rows)
                labels, (p, o, o2), cv, nv = self._spatial_estep(
                    img, mask, dmaps, warm, means_j, covars_j,
                    self._beta, self._beta1)
                pending.append(([ri], p.reshape(1, K), o.reshape(1, K, F),
                                o2.reshape(1, K, F, F), cv.reshape(1, 4),
                                nv.reshape(1)))
                label_grids[ri] = labels
            return _finish(label_grids)

        if cfg.labeler in ("swap_tpu", "expansion_tpu"):
            exact_method = ("expansion" if cfg.labeler == "expansion_tpu"
                            else "swap")
        if exact_method is not None:
            label_grids, dev_buckets = self._exact_labels_all(
                means_j, covars_j, warm_grids, method=exact_method,
                return_buckets=True)
            for shape, (idxs, img, mask, dmaps) in \
                    self._bucket_arrays.items():
                if dev_buckets is not None:
                    # labels never leave the device: the bucket tensor
                    # from the batched cut feeds the finish kernel as-is
                    # (single-shard buckets carry no device padding, so
                    # its region axis already matches img's)
                    labels_j = dev_buckets[shape]
                else:
                    labels_np = np.stack([np.asarray(label_grids[i])
                                          for i in idxs])
                    r_pad = img.shape[0] - labels_np.shape[0]
                    if r_pad > 0:
                        labels_np = np.concatenate(
                            [labels_np,
                             np.zeros((r_pad,) + labels_np.shape[1:],
                                      labels_np.dtype)], axis=0)
                    labels_j = jnp.asarray(labels_np)
                (p, o, o2), cv, nv = _FINISH_JIT(
                    img, mask, dmaps, labels_j, means_j,
                    covars_j, self._beta, self._beta1,
                    weighted_pp=(cfg.estimate_type == 3),
                    use_pallas=self._use_pallas)
                pending.append((idxs, p, o, o2, cv, nv))
                if dev_buckets is not None:
                    # exact labels warm-start the next fast iteration
                    # device-resident, like the fast path's cache
                    self._dev_warm[shape] = (
                        tuple(label_grids[ri] for ri in idxs),
                        dev_buckets[shape])
            return _finish(label_grids)

        def one_bucket(shape, idxs, img, mask, dmaps):
            # warm labels stay on device across iterations: when the warm
            # source is the previous E-step's own output list (the common
            # case — fit warm-starts from the best-so-far labels, which is
            # the last E-step whenever the cost improved), reuse the cached
            # bucket tensor instead of a host->device round-trip (the label
            # traffic dominated the per-iteration time over the remote-TPU
            # tunnel at canonical scale: ~16 MB/iteration)
            cached = self._dev_warm.get(shape)
            r_pad = img.shape[0] - len(idxs)
            hit = cached is not None and all(
                warm_grids[ri] is e for ri, e in zip(idxs, cached[0]))
            if hit:
                warm = cached[1]
            else:
                warm_np = np.stack([np.asarray(warm_grids[i])
                                    for i in idxs])
                if r_pad > 0:   # device-padding regions (all-masked)
                    warm_np = np.concatenate(
                        [warm_np, np.zeros((r_pad,) + warm_np.shape[1:],
                                           warm_np.dtype)], axis=0)
                warm = jnp.asarray(warm_np)
            if self._n_shards > 1:
                from jax.sharding import NamedSharding, PartitionSpec
                warm = jax.device_put(
                    warm, NamedSharding(self.mesh, PartitionSpec("data")))
            if cfg.labeler in ("swap", "expansion"):
                labels = self._swap_labels(idxs, means, covars, warm_grids,
                                           method=cfg.labeler)
                labels_np = np.stack(labels)
                if r_pad > 0:
                    labels_np = np.concatenate(
                        [labels_np, np.zeros((r_pad,) + labels_np.shape[1:],
                                             labels_np.dtype)], axis=0)
                labels_j = jnp.asarray(labels_np)
                (p, o, o2), cv, nv = _FINISH_JIT(
                    img, mask, dmaps, labels_j, means_j, covars_j,
                    self._beta, self._beta1,
                    weighted_pp=(cfg.estimate_type == 3),
                    use_pallas=self._use_pallas)
                out_labels = labels
            elif self._n_shards > 1:
                labels_j, (p, o, o2), cv, nv = self._sharded_estep(
                    img, mask, dmaps, warm, means_j, covars_j,
                    self._beta, self._beta1)
                out_labels = labels_j
            else:
                labels_j, (p, o, o2), cv, nv = _ESTEP_JIT(
                    img, mask, dmaps, warm, means_j, covars_j,
                    self._beta, self._beta1,
                    weighted_pp=(cfg.estimate_type == 3),
                    labeler=self._labeler_static,
                    max_sweeps=cfg.icm_max_sweeps,
                    use_pallas=self._use_pallas)
                out_labels = labels_j
            return hit, (idxs, p, o, o2, cv, nv), out_labels

        results = _map_buckets(
            one_bucket,
            [(shape, *arrs) for shape, arrs in self._bucket_arrays.items()])
        # shared-state updates on the calling thread, in bucket order
        for (shape, (idxs, *_)), (hit, pend, out_labels) in zip(
                self._bucket_arrays.items(), results):
            self._dev_warm_hits += int(hit)
            pending.append(pend)
            for bi, ri in enumerate(idxs):
                # defer the device->host copy: consumers (.mat export,
                # checkpoints, track_states) convert lazily via __array__
                label_grids[ri] = out_labels[bi]
            if isinstance(out_labels, jnp.ndarray):
                self._dev_warm[shape] = (
                    tuple(label_grids[ri] for ri in idxs), out_labels)
        return _finish(label_grids)

    def _exact_labels_all(self, means_j, covars_j, warm_grids,
                          method: str = "swap", return_buckets: bool = False):
        """Exact on-device labeling (mean field + ICM + parallel-push-relabel
        alpha-beta swap or alpha-expansion) for every region.

        Same-shape regions batch: each bucket's unary is computed K-major in
        one jit and every move vmaps over the bucket's region axis (regions
        share the move schedule), so a many-region genome run costs ~the
        per-bucket move schedule instead of a per-region one. Mesh-sharded
        buckets fall back to the per-region path (the bucket tensors live
        region-sharded across devices)."""
        from phylo_hmrf_tpu.ops.maxflow_tpu import (exact_labels,
                                                    exact_labels_batched)

        cfg = self.cfg
        out = [None] * len(self.regions)
        if self._n_shards == 1:
            def one_bucket(shape, idxs, img, mask, dmaps):
                unary_k = _UNARY_KMAJOR_JIT(img, means_j, covars_j)
                wm = weight_maps(dmaps, cfg.beta1)
                warm = jnp.stack([jnp.asarray(warm_grids[i])
                                  for i in idxs]).astype(jnp.int32)
                return exact_labels_batched(
                    unary_k, wm, mask, warm, cfg.beta, self.n_states,
                    max_cycles=cfg.swap_tpu_cycles,
                    icm_max_sweeps=cfg.icm_max_sweeps, method=method,
                    use_pallas=self._use_pallas)

            labels_all = _map_buckets(
                one_bucket,
                [(shape, *arrs)
                 for shape, arrs in self._bucket_arrays.items()])
            buckets = {}
            for (shape, (idxs, *_)), labels in zip(
                    self._bucket_arrays.items(), labels_all):
                buckets[shape] = labels
                for bi, ri in enumerate(idxs):
                    # device views; consumers convert lazily via __array__
                    out[ri] = labels[bi]
            if return_buckets:
                return out, buckets
            return out
        for ri, r in enumerate(self.regions):
            unary = _UNARY_JIT(jnp.asarray(r.img, self._dtype), means_j,
                               covars_j)
            wm = weight_maps(jnp.asarray(r.dmaps, self._dtype), cfg.beta1)
            labels = exact_labels(unary, wm, jnp.asarray(r.mask),
                                  jnp.asarray(warm_grids[ri]), cfg.beta,
                                  self.n_states,
                                  max_cycles=cfg.swap_tpu_cycles,
                                  icm_max_sweeps=cfg.icm_max_sweeps,
                                  method=method,
                                  use_pallas=self._use_pallas)
            out[ri] = np.asarray(labels)
        if return_buckets:
            return out, None   # sharded path: no bucket-batched tensors
        return out

    def _swap_labels(self, idxs, means, covars, warm_grids,
                     method: str = "swap"):
        """Exact graph-cut labeling on the host (CPU backend): alpha-beta
        swap (the reference's optimizer) or alpha-expansion."""
        from phylo_hmrf_tpu import native

        solver = (native.potts_expansion if method == "expansion"
                  else native.potts_swap)
        out = []
        for i in idxs:
            r = self.regions[i]
            X = r.flat_values().astype(np.float64)
            logprob = np.stack([
                _gauss_logpdf_np(X, means[c], covars[c],
                                 self.cfg.min_covar)
                for c in range(self.n_states)], axis=1)
            edges = flat_edge_list(r, self.cfg.num_neighbor)
            w = np.exp(-self.cfg.beta1 * edges[:, 2])
            warm_flat = r.labels_to_flat(warm_grids[i]).astype(np.int32)
            labels = solver(
                edges[:, :2].astype(np.int64), w, -logprob, self.cfg.beta,
                warm_flat, self.cfg.swap_max_cycles)
            out.append(r.labels_to_grid(labels))
        return out

    # ------------------------------------------------------------------
    # compile prewarm
    # ------------------------------------------------------------------

    def prewarm_compiles(self):
        """Warm, in a background daemon thread, the exact graph-cut programs
        the final polish will dispatch (K-major unary + mean-field/ICM start
        + move cuts, per bucket shape).

        XLA compiles (and persistent-cache deserializations) are host-CPU
        work while the EM loop is device-bound, so running them concurrently
        hides the polish's compile cost (~105 s cold / 5-17 s cache-warm at
        canonical K=20 scale) behind the k-means init and the EM iterations
        instead of paying it serially when the polish finally dispatches.
        Programs the EM loop itself compiles at iteration 0 (the fast
        E-step; a hybrid labeler's exact pass, which fires at it=0) are
        deliberately NOT prewarmed: the jit caches do not deduplicate
        in-flight compiles across threads, so a near-simultaneous warm-up
        would compile the same program twice and steal CPU from the real
        one.

        The warm-up calls go through the *same* code path as the real ones
        (same shapes, dtypes, static arguments), so the in-process jit
        caches are populated for the exact signatures fit uses. The dummy
        inputs make execution near-free: zero unaries mean zero t-link
        capacities, so every push-relabel cut starts with zero excess and
        its while_loop exits immediately. The model's mutable state is
        never touched, so trajectories are bit-identical with the prewarm
        on or off (tests/test_em.py::test_prewarm_identical_fit).

        Returns the started thread, or None when there is nothing to warm
        (disabled, already done, mesh-sharded, no polish, or the polish
        method already runs per-iteration)."""
        cfg = self.cfg
        if (not cfg.prewarm_compiles or self._n_shards != 1
                or getattr(self, "_prewarmed", False)):
            return None
        if not cfg.final_polish or cfg.labeler in (
                "swap", "swap_tpu", "expansion", "expansion_tpu"):
            return None   # no polish pass will run (fit skips it)
        if self._hybrid is not None and self._hybrid[0] == cfg.polish_method:
            return None   # the hybrid's it=0 exact pass compiles it already
        import threading
        self._prewarmed = True
        t = threading.Thread(target=self._prewarm_body, daemon=True,
                             name="phmrf-prewarm")
        t.start()
        return t

    def _prewarm_body(self):
        from phylo_hmrf_tpu.ops.maxflow_tpu import exact_labels_batched

        cfg = self.cfg
        K, F = self.n_states, self.n_features
        means_d = jnp.zeros((K, F), self._dtype)
        covars_d = jnp.tile(jnp.eye(F, dtype=self._dtype), (K, 1, 1))
        try:
            for shape, (idxs, img, mask, dmaps) in \
                    self._bucket_arrays.items():
                R = img.shape[0]
                warm0 = jnp.zeros((R,) + tuple(shape), jnp.int32)
                # real-shaped unary (warms the K-major unary program),
                # then zeroed so the cuts below converge immediately
                unary0 = _UNARY_KMAJOR_JIT(img, means_d, covars_d) * 0
                wm = weight_maps(dmaps, cfg.beta1)
                exact_labels_batched(
                    unary0, wm, mask, warm0, cfg.beta, K, max_cycles=1,
                    icm_max_sweeps=cfg.icm_max_sweeps,
                    method=cfg.polish_method, use_pallas=self._use_pallas)
        except Exception:
            # best-effort: a failed warm-up only means the real dispatch
            # compiles on demand, exactly as without the prewarm
            pass

    # ------------------------------------------------------------------
    # M-step (reference `_do_mstep` + `_ou_optimize2`, phylo_hmrf.py:1500,1327)
    # ------------------------------------------------------------------

    def _blend_guess(self) -> np.ndarray:
        """Reference initial-guess blend (`phylo_hmrf.py:1368-1380`)."""
        cfg = self.cfg
        K, P, n1 = self.n_states, self.n_params, self.tree.n_nodes
        if cfg.initial_mode == 1:
            rand = 2.0 * self._rng.random((K, P)) - 1.0
            rand[:, :P - n1] = self._rng.random((K, P - n1))
            rand = cfg.initial_magnitude * rand
        else:
            rand = cfg.initial_magnitude * self._rng.random((K, P))
        a1, a2 = cfg.initial_weight, cfg.initial_weight1
        return (a1 * self.init_ou_params + a2 * self.params_vec
                + (1.0 - a1 - a2) * rand)

    def _global_stats(self, stats):
        """Per-region (R, ...) stats -> global (K, ...) sums, in region
        order. Multi-process runs override this with an allgather that
        rebuilds the SAME global (R_global, ...) arrays in the same order,
        so the f64 sum — and with it the whole EM trajectory — is bitwise
        identical to a single-process run's."""
        post_r, obs_r, obs2_r = stats
        return post_r.sum(0), obs_r.sum(0), obs2_r.sum(0)

    def _global_costs(self, costs: np.ndarray,
                      ratio_vec: np.ndarray) -> np.ndarray:
        """Per-region cost rows (R, 4) -> the four global cost scalars
        (sample-weighted means, reference base.py:388-389). Overridden by
        multi-process runs with a deterministic-order global gather."""
        return costs.T @ ratio_vec

    def _solve_full_dev(self, guess, post, obs, obs2):
        cfg = self.cfg
        return _mstep_solve_full(
            jnp.asarray(guess, self._dtype),
            jnp.asarray(post, self._dtype),
            jnp.asarray(obs, self._dtype),
            jnp.asarray(obs2, self._dtype),
            jnp.asarray(self.n_samples_total, self._dtype),
            jnp.asarray(cfg.lambda_0, self._dtype),
            jnp.asarray(cfg.min_covar, self._dtype), tree=self.tree,
            lo=cfg.param_lo, hi=cfg.param_hi, iters=cfg.mstep_iters)

    def _moments_np(self, params):
        """Host-path moments with the in-dtype min_covar jitter — bitwise
        the tensors `_mstep_solve_full` returns for the same params (the
        jitter add happens in the model dtype in both, so no double
        rounding can fork the two)."""
        means, covars = _moments(jnp.asarray(params, self._dtype),
                                 tree=self.tree)
        covars = covars + (jnp.asarray(self.cfg.min_covar, covars.dtype)
                           * jnp.eye(self.n_features, dtype=covars.dtype))
        return np.asarray(means, np.float64), np.asarray(covars, np.float64)

    def mstep_dispatch(self, stats) -> dict:
        """Enqueue the attempt-0 M-step solve and return a handle for
        `mstep_finalize`, WITHOUT blocking on the device.

        The speculative device moments are published to `self._moments_dev`
        immediately, so the caller may dispatch the next E-step against
        them before the validity bits have even left the device (the
        pipelined fit does exactly this; `mstep_finalize` rolls the
        speculation back in the rare invalid-solve case)."""
        post, obs, obs2 = self._global_stats(stats)
        out = self._solve_full_dev(self._blend_guess(), post, obs, obs2)
        solved, valid, means_d, covars_d = out
        for a in out:
            try:
                a.copy_to_host_async()
            except AttributeError:  # non-jax backends / older arrays
                break
        self._moments_dev = (means_d, covars_d)
        return {"out": out, "stats": (post, obs, obs2)}

    def mstep_finalize(self, handle) -> bool:
        """Block on the dispatched solve, accept valid states, and run the
        reference retry/fallback ladder for invalid ones. Returns True if
        the speculation was rolled back (some state failed attempt 0), in
        which case `self._moments_dev`, `means_`, `covars_` and
        `params_vec` have been corrected and any E-step dispatched against
        the speculative moments must be re-issued."""
        cfg = self.cfg
        post, obs, obs2 = handle["stats"]
        params = self.params_vec.copy()
        pending = np.ones(self.n_states, dtype=bool)
        rolled_back = False
        fused_moments = None
        for attempt in range(cfg.mstep_retries):
            if attempt == 0:
                out = handle["out"]
            else:
                out = self._solve_full_dev(self._blend_guess(), post, obs,
                                           obs2)
            # ONE blocking device_get per attempt (was: solved fetch + host
            # check + moments dispatch + 2 more fetches = 3 round trips)
            solved, valid, means_d, covars_d = jax.device_get(out)
            solved = np.asarray(solved, np.float64)
            valid = np.asarray(valid, bool)
            take = pending & valid
            params[take] = solved[take]
            if attempt == 0:
                if valid.all():
                    # moments(params) == moments(solved) row-for-row:
                    # every state accepted this very solve
                    fused_moments = (np.asarray(means_d, np.float64),
                                     np.asarray(covars_d, np.float64))
                else:
                    rolled_back = True
            pending = pending & ~valid
            if not pending.any():
                break
        if pending.any():
            # reference fallback: keep the k-means-fit init params (:1348)
            params[pending] = self.init_ou_params[pending]

        self.params_vec = params
        if fused_moments is not None:
            means, covars = fused_moments
        else:
            means, covars = self._moments_np(params)
            # correct the published speculative device moments (upload of
            # the f64 mirrors reproduces the device values exactly: they
            # are f64-widened model-dtype tensors)
            self._moments_dev = (jnp.asarray(means, self._dtype),
                                 jnp.asarray(covars, self._dtype))
        self.means_ = means
        self.covars_ = covars   # min_covar jitter already applied in-dtype
        return rolled_back

    def mstep(self, stats) -> np.ndarray:
        self.mstep_finalize(self.mstep_dispatch(stats))
        return self.params_vec

    # ------------------------------------------------------------------
    # EM driver (reference `fit_accumulate_test`, base.py:301-455)
    # ------------------------------------------------------------------

    def fit(self, verbose: bool = True, callback=None,
            checkpoint_path: str | None = None, checkpoint_every: int = 5,
            resume: bool = False, patience: int | None = None,
            track_states: bool = False, monitor=None,
            cost_log: str | None = None) -> FitResult:
        from phylo_hmrf_tpu.utils import checkpoint as ckpt
        from phylo_hmrf_tpu.utils.profiling import (ConvergenceMonitor,
                                                    PhaseTimer)

        cfg = self.cfg
        patience = cfg.patience if patience is None else patience
        state_list = [] if track_states else None
        if monitor is None:
            monitor = ConvergenceMonitor(cfg.threshold, patience,
                                         log_file=cost_log)
        self.monitor_ = monitor
        self.timer = PhaseTimer()
        # overlap XLA compilation / compile-cache loads with the k-means
        # init and the EM iterations (see prewarm_compiles)
        prewarm_thread = self.prewarm_compiles()
        it_start = 0
        restored = None
        if resume and checkpoint_path is not None:
            restored = ckpt.load_checkpoint(checkpoint_path)
        if restored is not None:
            arrays, meta = restored
            book = ckpt.restore_model(self, arrays, meta)
            it_start = int(book["iter"]) + 1
            prev = np.asarray(book["prev"])
            cost_rows = [list(r) for r in book["cost_rows"]]
            min_cost = list(book["min_cost"])
            min_cost1 = list(book["min_cost1"])
            params_best = arrays["params_best"].copy()
            params_best1 = arrays["params_best1"].copy()
            # per-iteration history (params rows, + state rows when tracked)
            # lives in the append-only sidecar log, so checkpoints are O(1)
            # per save instead of rewriting the whole history every time
            hist_offset = int(book["hist_offset"])
            hist_states = bool(book["hist_states"])
            recs = ckpt.read_history(checkpoint_path, int(book["hist_count"]),
                                     2 if hist_states else 1)
            params_list = [r[0] for r in recs]
            if track_states and hist_states:
                state_list = [r[1] for r in recs]
            # (track_states without hist_states: the checkpoint never
            # recorded states — state_list restarts from the resume point)
            t_label_grids = [arrays[f"t_labels_{i}"].copy()
                             for i in range(len(self.regions))]
            n_iters = it_start
            hist_pending = []
            if verbose:
                print(f"[resume] from iter {it_start}")
        else:
            if self.params_vec is None:
                t0 = time.time()
                with self.timer.phase("init"):
                    self.initialize()
                if verbose:
                    print(f"[init] k-means + OU init in "
                          f"{time.time() - t0:.2f}s")
            prev = np.array([1e-3, 1e-3, 1e-3])  # pairwise/unary/cost1 "pre"
            cost_rows = []
            params_list = []
            min_cost = [0, 1000.0]
            min_cost1 = [0, 1000.0]
            params_best = self.params_vec.copy()
            params_best1 = self.params_vec.copy()
            t_label_grids = list(self.labels_local)
            n_iters = 0
            hist_offset = 0      # fresh run: first flush truncates any stale log
            hist_pending = []

        ratio_vec = (self.len_vec[:, 0].astype(np.float64)
                     / self.n_samples_total)

        d3_prev = np.inf
        d12_prev = np.inf
        if it_start > 0 and len(cost_rows) >= 2:
            # recompute the last relative cost changes so a resumed hybrid
            # run makes the same exact-vs-fast decision the uninterrupted
            # run would (inf here would force an exact pass at the resume
            # iteration and fork the trajectory)
            c_prev, c_last = cost_rows[-2][3], cost_rows[-1][3]
            d3_prev = abs((c_last - c_prev) / c_prev)
            d12_prev = max(
                abs((cost_rows[-1][1] - cost_rows[-2][1])
                    / cost_rows[-2][1]),
                abs((cost_rows[-1][2] - cost_rows[-2][2])
                    / cost_rows[-2][2]))
        self.hybrid_exact_iters_ = []
        self._mstep_rollbacks_ = 0
        # the CPU-host labelers consume the f64 host moments directly (the
        # f64 logpdf oracle `_gauss_logpdf_np`); every other path casts to
        # the model dtype, for which the device twins published by
        # `mstep_dispatch` are bitwise-equal by construction
        use_dev_moments = cfg.labeler not in ("swap", "expansion")

        def _exact_for(it_n):
            """Hybrid exact-pass trigger for iteration ``it_n``. Exact pass
            when (a) the period comes up, (b) cost1 improvement is about to
            satisfy the stop rule (within 3x of the threshold) so the run
            cannot converge onto the weak labeler's fixed point, or (c) the
            trajectory is still moving fast (relative cost1 change above
            hybrid_exact_hi): the fast labeler's drift vs exact cuts is
            largest exactly while the params are in motion (measured 4.7%
            shifted-energy gap at a moving iteration vs <=0.1% in the
            plateau on real chr22 — tests/test_real_data.py). The cheap
            path serves the plateau band threshold*3 < d3 <
            hybrid_exact_hi, plus whatever the period skips. The stop rule
            has TWO routes (d3 < thr, OR d1 AND d2 < thr) — both are
            anticipated, else the run could terminate off a fast-labeler
            iteration via the d1&d2 route. Pure in the loop state (reads
            d3_prev/d12_prev, mutates nothing), so the speculative
            next-iteration dispatch and the top-of-loop consumption compute
            the same answer."""
            if self._hybrid is None:
                return None
            method, period = self._hybrid
            if (it_n % period == 0 or d3_prev < 3 * cfg.threshold
                    or d12_prev < 3 * cfg.threshold
                    or d3_prev > cfg.hybrid_exact_hi):
                return method
            return None

        def _dispatch_estep(exact_method):
            if use_dev_moments and self._moments_dev is not None:
                means, covars = self._moments_dev
            else:
                means, covars = self.means_, self.covars_
            return self.estep(means, covars, self.labels_local,
                              exact_method=exact_method, defer=True)

        # E-step/M-step software pipeline: the next iteration's E-step is
        # dispatched against the CURRENT M-step's not-yet-verified device
        # moments, so the M-step's D2H fetch (validity bits + f64 mirrors)
        # rides along with the next E-step's device execution instead of
        # blocking the loop — one blocking fetch per iteration instead of
        # two (each is a 0.05+ s round trip over a remote-tunnel TPU,
        # PARITY §Canonical). Values are bitwise-identical to the
        # sequential loop; the rare invalid attempt-0 solve rolls the
        # speculation back (`mstep_finalize`) and re-dispatches.
        pending_estep = None    # (it, exact_method, label_grids, collect)
        pending_mstep = None    # handle from mstep_dispatch

        def _finalize_pending_mstep():
            nonlocal pending_mstep, pending_estep
            if pending_mstep is None:
                return
            with self.timer.phase("mstep"):
                rolled = self.mstep_finalize(pending_mstep)
            pending_mstep = None
            if rolled:
                # the speculative E-step consumed stale moments: discard it
                # and re-dispatch against the corrected ones
                self._mstep_rollbacks_ += 1
                pending_estep = None

        for it in range(it_start, cfg.max_iter):
            exact_method = _exact_for(it)
            if exact_method is not None:
                self.hybrid_exact_iters_.append(it)
            _finalize_pending_mstep()
            t0 = time.time()
            with self.timer.phase("estep"):
                if (pending_estep is not None
                        and pending_estep[:2] == (it, exact_method)):
                    label_grids, collect = pending_estep[2:]
                else:
                    label_grids, collect = _dispatch_estep(exact_method)
                pending_estep = None
                stats, costs, _ = collect()
            t1 = time.time()

            # Reference gather (base.py:388-389): the accumulated
            # "pairwise_cost" that drives convergence and is exported in
            # cost_vec is the worker's *normalized* pairwise cost
            # (phylo_hmrf.py:307 returns [raw, normalized, unary, cost1];
            # base.py uses vec1[id1+1] = normalized). The raw value
            # (vec1[id1] = "pairwise_cost1") is only printed.
            reduced = self._global_costs(costs, ratio_vec)
            pairwise_cost_raw = float(reduced[0])
            pairwise_cost = float(reduced[1])
            unary_cost = float(reduced[2])
            cost1 = float(reduced[3])

            d1 = abs((pairwise_cost - prev[0]) / prev[0])
            d2 = abs((unary_cost - prev[1]) / prev[1])
            d3 = abs((cost1 - prev[2]) / prev[2])
            prev = np.array([pairwise_cost, unary_cost, cost1])
            d3_prev = d3
            d12_prev = max(d1, d2)

            monitor.report(it, pairwise_cost, unary_cost, cost1)
            cost_rows.append([it, pairwise_cost, unary_cost, cost1])
            params_list.append(self.params_vec.copy())
            hist_rec = [params_list[-1]]
            n_iters = it + 1
            if track_states:
                state_list.append(np.concatenate([
                    self.regions[i].labels_to_flat(label_grids[i])
                    for i in range(len(self.regions))])
                    if self.regions else np.zeros(0, np.int32))
                hist_rec.append(state_list[-1])
            hist_pending.append(hist_rec)

            if verbose:
                print(f"[iter {it:3d}] pairwise={pairwise_cost:.6f} "
                      f"(raw={pairwise_cost_raw:.6f}) "
                      f"unary={unary_cost:.6f} cost1={cost1:.6f} "
                      f"estep={t1 - t0:.2f}s")

            if cost1 < min_cost[1]:
                min_cost = [it, cost1]
                params_best = self.params_vec.copy()
                self.labels_local = label_grids   # warm start from best
            if cost1 < min_cost1[1] and it >= cfg.best_from_iter:
                min_cost1 = [it, cost1]
                params_best1 = self.params_vec.copy()
                t_label_grids = label_grids

            if callback is not None:
                callback(self, it, cost_rows[-1], label_grids)

            if (((d1 < cfg.threshold and d2 < cfg.threshold)
                 or d3 < cfg.threshold) and it > cfg.min_iter):
                break
            if it - min_cost1[0] > patience:
                break

            t2 = time.time()
            with self.timer.phase("mstep"):
                pending_mstep = self.mstep_dispatch(stats)
            if (cfg.em_pipeline and use_dev_moments
                    and it + 1 < cfg.max_iter):
                # speculative next E-step: device work + D2H copies overlap
                # the pending M-step fetch. Host labelers ("swap"/
                # "expansion") cannot speculate: they consume the f64 host
                # moments, which only exist after mstep_finalize — a
                # speculative dispatch would label with the PREVIOUS
                # iteration's moments and silently flatten the trajectory
                # (the C++ cut is host-blocking anyway, so there is nothing
                # to overlap).
                nxt_exact = _exact_for(it + 1)
                with self.timer.phase("estep"):
                    g, c = _dispatch_estep(nxt_exact)
                pending_estep = (it + 1, nxt_exact, g, c)
            else:
                _finalize_pending_mstep()
            if verbose:
                print(f"[iter {it:3d}] mstep={time.time() - t2:.2f}s")

            if (checkpoint_path is not None
                    and (it + 1) % checkpoint_every == 0):
                # the checkpoint must capture the post-mstep model (params,
                # moments, rng), so the pending fetch is drained here
                _finalize_pending_mstep()
                # flush only the rows added since the last save (O(1)/save),
                # then atomically replace the main npz pointing at them
                hist_offset = ckpt.append_history(
                    checkpoint_path, hist_pending, truncate_to=hist_offset)
                hist_pending = []
                extra = {"params_best": params_best,
                         "params_best1": params_best1}
                for ri, g in enumerate(t_label_grids):
                    extra[f"t_labels_{ri}"] = g
                ckpt.save_checkpoint(
                    checkpoint_path, self,
                    {"iter": it, "prev": prev, "cost_rows": cost_rows,
                     "min_cost": min_cost, "min_cost1": min_cost1,
                     "hist_count": len(params_list),
                     "hist_offset": hist_offset,
                     "hist_states": bool(track_states)},
                    extra)

        # drain: a pending M-step at loop exit still finalizes so the model
        # state (params_vec, moments, rng stream) matches the sequential
        # loop's — a second fit() on this model must not fork
        _finalize_pending_mstep()

        # restore: params_vec1 = best-from-3; moments from overall best
        self.params_vec = params_best1.copy()
        self.means_, self.covars_ = self._moments_np(params_best)
        self._moments_dev = None

        if prewarm_thread is not None:
            # the polish blocks on any still-compiling program anyway (the
            # jit cache serializes per signature); joining first keeps the
            # phase timer honest about what is compile vs cut compute
            prewarm_thread.join()
        if cfg.final_polish and cfg.labeler not in (
                "swap", "swap_tpu", "expansion", "expansion_tpu"):
            # one exact on-device graph-cut pass over the best-iteration
            # labels under the restored best-iteration moments
            with self.timer.phase("final_polish"):
                t_label_grids = self._exact_labels_all(
                    jnp.asarray(self.means_, self._dtype),
                    jnp.asarray(self.covars_, self._dtype), t_label_grids,
                    method=cfg.polish_method)

        labels_flat = (np.concatenate([
            self.regions[i].labels_to_flat(t_label_grids[i])
            for i in range(len(self.regions))]) if self.regions
            else np.zeros(0, np.int32))

        return FitResult(
            params_vec=params_best, params_vec1=params_best1,
            params_list=np.asarray(params_list),
            iter_id1=min_cost[0], iter_id2=min_cost1[0],
            cost_vec=np.asarray(cost_rows), labels=labels_flat,
            means=self.means_.copy(), covars=self.covars_.copy(),
            n_iters=n_iters,
            state_list=(np.asarray(state_list) if track_states else None))

    def fit_accumulate(self, **kw) -> FitResult:
        """Legacy fit variant (reference ``fit_accumulate``, base.py:164-299):
        patience of 20 iterations past the best cost and per-iteration state
        tracking (the reference's ``state_vecList``)."""
        kw.setdefault("patience", 20)
        kw.setdefault("track_states", True)
        return self.fit(**kw)

    def fit_v1(self, **kw) -> FitResult:
        """Legacy v1 ``fit()`` (reference phylo_hmrf_v1/base.py:191-268):
        whole-frame EM — here a run over the given regions — with patience
        20, NO minimum-iteration guard on the threshold stop (v1 may stop at
        iter 0), and a single best-cost minimum tracked from iter >= 3 whose
        params are restored for both the returned params and the moments
        (the main engine restores moments from the overall best instead).
        v1's full-frame posterior pass is the same mean-field posterior this
        engine computes per region."""
        cfg0 = self.cfg
        self.cfg = dataclasses.replace(cfg0, min_iter=-1)
        try:
            kw.setdefault("patience", 20)
            result = self.fit(**kw)
        finally:
            self.cfg = cfg0
        # v1 restores the iter>=3 minimum everywhere (base.py:259-260)
        self.params_vec = result.params_vec1.copy()
        self.means_, self.covars_ = self._moments_np(result.params_vec1)
        self._moments_dev = None
        return dataclasses.replace(result, means=self.means_.copy(),
                                   covars=self.covars_.copy())

    # ------------------------------------------------------------------
    # inference-only path (reference `predict`, phylo_hmrf.py:470)
    # ------------------------------------------------------------------

    def predict(self) -> np.ndarray:
        """MAP state labels for all samples under the current parameters."""
        if self.means_ is None:
            raise RuntimeError("model not initialized/fit")
        warm = self.labels_local or [
            np.zeros(r.shape, np.int32) for r in self.regions]
        label_grids, _, _, _ = self.estep(self.means_, self.covars_, warm)
        return (np.concatenate([
            self.regions[i].labels_to_flat(label_grids[i])
            for i in range(len(self.regions))]) if self.regions
            else np.zeros(0, np.int32))

    def score_samples(self, labels_flat: np.ndarray | None = None):
        """(total log probability, per-sample posteriors).

        The reference declares this API but leaves it an empty stub
        (base.py:119-123, hmmlearn heritage). Here: posteriors are the
        MRF mean-field posteriors (predict_proba); the score is the
        emission log-evidence sum_n logsumexp_k logprob(n, k) with a
        uniform state prior — the quantity the stub's docstring promises
        ("log probability under the model").
        """
        from scipy.special import logsumexp

        if self.means_ is None:
            raise RuntimeError("model not initialized/fit")
        posteriors = self.predict_proba(labels_flat)
        means_j = jnp.asarray(self.means_, self._dtype)
        covars_j = jnp.asarray(self.covars_, self._dtype)
        total = 0.0
        for i, r in enumerate(self.regions):
            logprob = -np.asarray(
                _UNARY_JIT(jnp.asarray(r.img), means_j, covars_j))
            lse = logsumexp(
                logprob[r.flat_rows, r.flat_cols].astype(np.float64),
                axis=-1)
            total += float(lse.sum()) - lse.shape[0] * np.log(self.n_states)
        return total, posteriors

    def predict_proba(self, labels_flat: np.ndarray | None = None
                      ) -> np.ndarray:
        """Per-sample state posteriors (N, K) under the current parameters
        (reference ``predict_proba`` / ``_predict_posteriors1``,
        base.py:146-162, phylo_hmrf.py:324-332): the mean-field-style
        normalization of exp(logprob - pairwise_potential) at the given (or
        freshly predicted) labeling."""
        from phylo_hmrf_tpu.ops.icm import label_optimize  # noqa: F401

        cfg = self.cfg
        if self.means_ is None:
            raise RuntimeError("model not initialized/fit")
        if labels_flat is None:
            labels_flat = self.predict()
        means_j = jnp.asarray(self.means_, self._dtype)
        covars_j = jnp.asarray(self.covars_, self._dtype)
        out = np.zeros((self.n_samples, self.n_states), np.float64)
        for i, r in enumerate(self.regions):
            flat = labels_flat[self.offsets[i]:self.offsets[i + 1]]
            grid = r.labels_to_grid(flat)
            logprob = -_UNARY_JIT(jnp.asarray(r.img), means_j, covars_j)
            w_cut = weight_maps(jnp.asarray(r.dmaps), cfg.beta1)
            w_pp = (w_cut if cfg.estimate_type == 3
                    else valid_maps(jnp.asarray(r.dmaps)))
            pp = pairwise_potential(jnp.asarray(grid), w_pp, self.n_states,
                                    cfg.beta)
            post = jax.nn.softmax(logprob - pp, axis=-1)
            out[self.offsets[i]:self.offsets[i + 1]] = np.asarray(
                post)[r.flat_rows, r.flat_cols]
        return out
