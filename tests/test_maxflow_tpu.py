"""Data-parallel push-relabel min-cut / on-device alpha-beta swap, gated
against brute force and the exact C++ Dinic oracle."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from phylo_hmrf_tpu import native
from phylo_hmrf_tpu.data.regions import (
    flat_edge_list, flat_index_order, region_from_samples)
from phylo_hmrf_tpu.ops.maxflow_tpu import (
    expansion_move, expansion_optimize, grid_mincut, swap_optimize)
from phylo_hmrf_tpu.ops.potts import weight_maps, potts_energy
from phylo_hmrf_tpu.data.regions import DIRS


def _binary_energy(x, excess, cap_t, caps):
    """Cut value of assignment x (True = source side / x=0 semantics):
    pay excess (S->p) where p is on the sink side, cap_t where on the source
    side, and neighbor caps where the arc crosses S->T."""
    H, W = x.shape
    e = np.where(~x, excess, 0.0).sum() + np.where(x, cap_t, 0.0).sum()
    from phylo_hmrf_tpu.ops.maxflow_tpu import ALL_DIRS
    for d, (di, dj) in enumerate(ALL_DIRS):
        for i in range(H):
            for j in range(W):
                ii, jj = i + di, j + dj
                if 0 <= ii < H and 0 <= jj < W:
                    if x[i, j] and not x[ii, jj]:
                        e += caps[d, i, j]
    return e


def test_mincut_matches_bruteforce(rng):
    H, W = 3, 4
    for trial in range(6):
        excess = rng.random((H, W)) * 2
        cap_t = rng.random((H, W)) * 2
        caps = np.zeros((8, H, W))
        # undirected 8-neighbor arcs
        for d in range(4):
            lam = rng.random((H, W))
            caps[d] = lam
        # mirror into reverse directions consistently
        from phylo_hmrf_tpu.ops.maxflow_tpu import ALL_DIRS, _rev
        for d in range(4):
            di, dj = ALL_DIRS[d]
            for i in range(H):
                for j in range(W):
                    ii, jj = i + di, j + dj
                    if 0 <= ii < H and 0 <= jj < W:
                        caps[_rev(d), ii, jj] = caps[d, i, j]
                    else:
                        caps[d, i, j] = 0.0

        src = np.asarray(grid_mincut(jnp.asarray(excess),
                                     jnp.asarray(cap_t),
                                     jnp.asarray(caps)))
        e_pr = _binary_energy(src, excess, cap_t, caps)
        best = min(
            _binary_energy(np.asarray(assign).reshape(H, W).astype(bool),
                           excess, cap_t, caps)
            for assign in itertools.product([False, True], repeat=H * W))
        assert e_pr <= best + 1e-4, (trial, e_pr, best)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
@pytest.mark.smoke
def test_swap_optimize_matches_cpp(rng):
    H0, K, beta, beta1 = 20, 4, 1.0, 0.5
    rows, cols = flat_index_order(H0, H0, True)
    vals = (rng.random((rows.shape[0], 3)) + 0.1).astype(np.float32)
    region = region_from_samples(vals, H0, H0, True, pad_h=4, pad_w=4)
    N = region.n_samples
    unary_flat = (rng.random((N, K)) * 2).astype(np.float64)
    warm = rng.integers(0, K, N).astype(np.int32)

    edges = flat_edge_list(region)
    w = np.exp(-beta1 * edges[:, 2])
    ei = edges[:, :2].astype(np.int64)
    cpp_labels = native.potts_swap(ei, w, unary_flat, beta, warm, 100)
    e_cpp = native.potts_energy(ei, w, unary_flat, beta, cpp_labels)

    unary_grid = np.zeros(region.shape + (K,), np.float32)
    unary_grid[region.flat_rows, region.flat_cols] = unary_flat
    wm = weight_maps(jnp.asarray(region.dmaps), beta1)
    out = swap_optimize(jnp.asarray(unary_grid), wm,
                        jnp.asarray(region.mask),
                        jnp.asarray(region.labels_to_grid(warm)),
                        beta, K)
    out_flat = region.labels_to_flat(np.asarray(out)).astype(np.int32)
    e_tpu = native.potts_energy(ei, w, unary_flat, beta, out_flat)

    # both are exact swap: same fixed-point quality (order may differ ->
    # allow a hair of slack either way)
    assert e_tpu <= e_cpp + 1e-6 + 1e-4 * abs(e_cpp), (e_tpu, e_cpp)


def test_expansion_move_is_optimal_bruteforce(rng):
    """One expansion move must reach the minimum over the full move space
    (every subset of movable pixels switching to alpha)."""
    H = W = 3
    K, beta = 3, 1.0
    for trial in range(4):
        unary = (rng.random((H, W, K)) * 2).astype(np.float32)
        labels0 = rng.integers(0, K, (H, W)).astype(np.int32)
        mask = np.ones((H, W), bool)
        mask[0, 0] = trial % 2 == 0          # exercise a masked pixel too
        wmaps = np.zeros((4, H, W), np.float32)
        for d, (di, dj) in enumerate(DIRS):
            lam = rng.random((H, W)).astype(np.float32)
            for i in range(H):
                for j in range(W):
                    ii, jj = i + di, j + dj
                    ok = (0 <= ii < H and 0 <= jj < W and mask[i, j]
                          and mask[ii, jj])
                    wmaps[d, i, j] = lam[i, j] if ok else 0.0
        labels0 = np.where(mask, labels0, 0).astype(np.int32)
        alpha = int(rng.integers(0, K))

        out, n_changed = expansion_move(
            jnp.asarray(labels0),
            jnp.asarray(np.transpose(unary, (2, 0, 1))),   # K-major
            jnp.asarray(wmaps), jnp.asarray(mask), jnp.int32(alpha), beta)
        out = np.asarray(out)
        assert int(n_changed) == int((out != labels0).sum())
        e_move = float(potts_energy(jnp.asarray(out), jnp.asarray(unary),
                                    jnp.asarray(wmaps), jnp.asarray(mask),
                                    beta))

        movable = [(i, j) for i in range(H) for j in range(W)
                   if mask[i, j] and labels0[i, j] != alpha]
        best = np.inf
        for bits in itertools.product([0, 1], repeat=len(movable)):
            cand = labels0.copy()
            for (i, j), b in zip(movable, bits):
                if b:
                    cand[i, j] = alpha
            e = float(potts_energy(jnp.asarray(cand), jnp.asarray(unary),
                                   jnp.asarray(wmaps), jnp.asarray(mask),
                                   beta))
            best = min(best, e)
        assert e_move <= best + 1e-4, (trial, e_move, best)
        # the move never switches pixels away from non-alpha labels
        assert np.all((out == labels0) | (out == alpha))


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_expansion_optimize_matches_cpp(rng):
    """TPU alpha-expansion vs the C++ expansion on the same instance: both
    are exact move-making optimizers, so converged energies must agree to
    visiting-order slack (mirrors the swap gate above)."""
    H0, K, beta, beta1 = 20, 4, 1.0, 0.5
    rows, cols = flat_index_order(H0, H0, True)
    vals = (rng.random((rows.shape[0], 3)) + 0.1).astype(np.float32)
    region = region_from_samples(vals, H0, H0, True, pad_h=4, pad_w=4)
    N = region.n_samples
    unary_flat = (rng.random((N, K)) * 2).astype(np.float64)
    warm = rng.integers(0, K, N).astype(np.int32)

    edges = flat_edge_list(region)
    w = np.exp(-beta1 * edges[:, 2])
    ei = edges[:, :2].astype(np.int64)
    cpp_labels = native.potts_expansion(ei, w, unary_flat, beta, warm, 100)
    e_cpp = native.potts_energy(ei, w, unary_flat, beta, cpp_labels)
    e_warm = native.potts_energy(ei, w, unary_flat, beta, warm)
    assert e_cpp <= e_warm + 1e-9   # expansion moves never increase energy

    unary_grid = np.zeros(region.shape + (K,), np.float32)
    unary_grid[region.flat_rows, region.flat_cols] = unary_flat
    wm = weight_maps(jnp.asarray(region.dmaps), beta1)
    out = expansion_optimize(jnp.asarray(unary_grid), wm,
                             jnp.asarray(region.mask),
                             jnp.asarray(region.labels_to_grid(warm)),
                             beta, K)
    out_flat = region.labels_to_flat(np.asarray(out)).astype(np.int32)
    e_tpu = native.potts_energy(ei, w, unary_flat, beta, out_flat)
    assert e_tpu <= e_cpp + 1e-6 + 1e-4 * abs(e_cpp), (e_tpu, e_cpp)


def test_fused_mincut_matches_jnp(rng):
    """grid_mincut_fused (temporally-blocked Pallas kernels, interpret
    mode) must produce a cut with the same cost as the jnp push-relabel
    on random weighted-Potts swap instances (cuts may differ when several
    minimum cuts exist; the cost may not)."""
    import jax.numpy as jnp
    from phylo_hmrf_tpu.ops.maxflow_tpu import (
        grid_mincut, grid_mincut_fused, ALL_DIRS, _rev, _neighbor)

    H, W = 16, 128
    for trial in range(3):
        excess = jnp.asarray(
            (rng.random((H, W)) * 2 * (rng.random((H, W)) < 0.5))
            .astype(np.float32))
        cap_t = jnp.asarray(
            (rng.random((H, W)) * 2 * (rng.random((H, W)) < 0.5))
            .astype(np.float32))
        caps = np.zeros((8, H, W), np.float32)
        for d in range(4):
            di, dj = ALL_DIRS[d]
            lam = (rng.random((H, W)) * 0.5).astype(np.float32)
            if di:
                lam[-di:, :] = 0
            if dj > 0:
                lam[:, -dj:] = 0
            elif dj < 0:
                lam[:, :-dj] = 0
            caps[d] += lam
            caps[_rev(d)] += np.asarray(
                _neighbor(jnp.asarray(lam), _rev(d), 0.0))
        caps = jnp.asarray(caps)

        side_a = np.asarray(grid_mincut(excess, cap_t, caps))
        side_b = np.asarray(grid_mincut_fused(excess, cap_t, caps,
                                              interpret=True))

        def cut_cost(side):
            # source-side nodes pay their sink arcs, sink-side their
            # source arcs; crossing neighbor arcs pay their capacity
            c = float(jnp.sum(jnp.where(side, cap_t, excess)))
            for d in range(8):
                nb_side = np.asarray(_neighbor(jnp.asarray(side), d, True))
                c += float(np.sum(np.asarray(caps)[d]
                                  * (side & ~nb_side)))
            return c

        assert cut_cost(side_b) == pytest.approx(cut_cost(side_a), rel=1e-5)


def test_exact_labels_batched_matches_single(rng):
    """The region-batched optimizer must reach the same (or better) energy
    as per-region calls: regions share the move schedule, and batch-level
    pruning can only run MORE moves per region than single-region pruning."""
    from phylo_hmrf_tpu.ops.maxflow_tpu import (
        exact_labels, exact_labels_batched)

    H0, K, R, beta, beta1 = 16, 4, 3, 1.0, 0.5
    regions = []
    for r_i in range(R):
        rows, cols = flat_index_order(H0, H0, True)
        vals = (rng.random((rows.shape[0], 3)) + 0.1).astype(np.float32)
        regions.append(region_from_samples(vals, H0, H0, True,
                                           pad_h=4, pad_w=4))
    unaries, warms, wms = [], [], []
    for reg in regions:
        u = np.zeros(reg.shape + (K,), np.float32)
        u[reg.flat_rows, reg.flat_cols] = rng.random(
            (reg.n_samples, K)) * 2
        unaries.append(u)
        warms.append(reg.labels_to_grid(
            rng.integers(0, K, reg.n_samples).astype(np.int32)))
        wms.append(np.asarray(weight_maps(jnp.asarray(reg.dmaps), beta1)))

    singles = [
        np.asarray(exact_labels(jnp.asarray(u), jnp.asarray(w),
                                jnp.asarray(reg.mask), jnp.asarray(wa),
                                beta, K, max_cycles=3))
        for reg, u, w, wa in zip(regions, unaries, wms, warms)]

    unary_k = jnp.asarray(np.stack(
        [np.transpose(u, (2, 0, 1)) for u in unaries]))
    batched = np.asarray(exact_labels_batched(
        unary_k, jnp.asarray(np.stack(wms)),
        jnp.asarray(np.stack([reg.mask for reg in regions])),
        jnp.asarray(np.stack(warms)), beta, K, max_cycles=3))

    for i, reg in enumerate(regions):
        e_single = float(potts_energy(
            jnp.asarray(singles[i]), jnp.asarray(unaries[i]),
            jnp.asarray(wms[i]), jnp.asarray(reg.mask), beta))
        e_batch = float(potts_energy(
            jnp.asarray(batched[i]), jnp.asarray(unaries[i]),
            jnp.asarray(wms[i]), jnp.asarray(reg.mask), beta))
        assert e_batch <= e_single + 1e-4 + 1e-5 * abs(e_single), (
            i, e_batch, e_single)


def test_dominance_freezing_exact(rng):
    """Dominance (persistency) freezing prunes pixels from the move cuts;
    the moves must stay exactly optimal. Strong unaries (freezing fires on
    most pixels) x brute force over all labelings on a small grid."""
    from phylo_hmrf_tpu.ops.maxflow_tpu import expansion_move, swap_move

    H = W = 3
    K = 3
    beta = 0.7
    for trial in range(6):
        unary = rng.random((H, W, K)).astype(np.float32)
        # make some pixels strongly opinionated so the margin test fires
        strong = rng.random((H, W)) < 0.6
        fav = rng.integers(0, K, (H, W))
        for k in range(K):
            unary[..., k] = np.where(strong & (fav == k), unary[..., k],
                                     unary[..., k] + 50.0 * strong)
        wmaps = np.ones((4, H, W), np.float32)
        mask = np.ones((H, W), bool)
        labels0 = rng.integers(0, K, (H, W)).astype(np.int32)
        unary_k = jnp.asarray(np.transpose(unary, (2, 0, 1)))

        def energy(lab):
            e = float(np.sum(unary[np.arange(H)[:, None],
                                   np.arange(W)[None], lab]))
            e += beta * float((lab[:, :-1] != lab[:, 1:]).sum()
                              + (lab[:-1] != lab[1:]).sum()
                              + (lab[:-1, :-1] != lab[1:, 1:]).sum()
                              + (lab[:-1, 1:] != lab[1:, :-1]).sum())
            return e

        alpha = int(rng.integers(0, K))
        out, _ = expansion_move(jnp.asarray(labels0), unary_k,
                                jnp.asarray(wmaps), jnp.asarray(mask),
                                jnp.int32(alpha), beta)
        out = np.asarray(out)
        # brute force over the expansion move space
        import itertools
        best = None
        movable = [(i, j) for i in range(H) for j in range(W)
                   if labels0[i, j] != alpha]
        for bits in itertools.product([0, 1], repeat=len(movable)):
            lab = labels0.copy()
            for (i, j), s in zip(movable, bits):
                if s:
                    lab[i, j] = alpha
            e = energy(lab)
            if best is None or e < best:
                best = e
        assert energy(out) == pytest.approx(best, abs=1e-3), trial

        a, b = 0, 1
        out2, _ = swap_move(jnp.asarray(labels0), unary_k,
                            jnp.asarray(wmaps), jnp.asarray(mask),
                            jnp.int32(a), jnp.int32(b), beta)
        out2 = np.asarray(out2)
        movable = [(i, j) for i in range(H) for j in range(W)
                   if labels0[i, j] in (a, b)]
        best = None
        for bits in itertools.product([0, 1], repeat=len(movable)):
            lab = labels0.copy()
            for (i, j), s in zip(movable, bits):
                lab[i, j] = a if s else b
            e = energy(lab)
            if best is None or e < best:
                best = e
        assert energy(out2) == pytest.approx(best, abs=1e-3), trial


def test_swap_optimize_f64_beta(rng):
    """Strict-parity mode: an f32-unrepresentable beta (0.1) must reach the
    cut capacities at f64 (regression: beta was cast through jnp.float32
    regardless of the unary dtype)."""
    import jax

    from phylo_hmrf_tpu.ops.maxflow_tpu import _energy_hist

    jax.config.update("jax_enable_x64", True)
    try:
        H0, K, beta, beta1 = 12, 3, 0.1, 0.5
        rows, cols = flat_index_order(H0, H0, True)
        vals = (rng.random((rows.shape[0], 3)) + 0.1).astype(np.float64)
        region = region_from_samples(vals, H0, H0, True, pad_h=4, pad_w=4)
        N = region.n_samples
        unary_flat = (rng.random((N, K)) * 2).astype(np.float64)
        warm = rng.integers(0, K, N).astype(np.int32)

        edges = flat_edge_list(region)
        w = np.exp(-beta1 * edges[:, 2])
        ei = edges[:, :2].astype(np.int64)

        unary_grid = np.zeros(region.shape + (K,), np.float64)
        unary_grid[region.flat_rows, region.flat_cols] = unary_flat
        wm = weight_maps(jnp.asarray(region.dmaps, jnp.float64), beta1)
        mask = jnp.asarray(region.mask)
        out = swap_optimize(jnp.asarray(unary_grid), wm, mask,
                            jnp.asarray(region.labels_to_grid(warm)),
                            beta, K, use_pallas=False)
        out_flat = region.labels_to_flat(np.asarray(out)).astype(np.int32)
        e_tpu = native.potts_energy(ei, w, unary_flat, beta, out_flat)
        cpp_labels = native.potts_swap(ei, w, unary_flat, beta, warm, 100)
        e_cpp = native.potts_energy(ei, w, unary_flat, beta, cpp_labels)
        assert e_tpu <= e_cpp + 1e-9 + 1e-4 * abs(e_cpp), (e_tpu, e_cpp)

        # the on-device energy itself must be f64 and match the f64 oracle
        # tightly — an f32-rounded beta forks it at ~1e-8 relative
        uk = jnp.asarray(np.transpose(unary_grid, (2, 0, 1))[None])
        e_dev, _ = _energy_hist(jnp.asarray(np.asarray(out)[None]), uk,
                                wm[None], mask[None],
                                jnp.asarray(beta, jnp.float64), n_states=K)
        assert e_dev.dtype == jnp.float64
        np.testing.assert_allclose(float(np.asarray(e_dev).sum()), e_tpu,
                                   rtol=1e-12, atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)
