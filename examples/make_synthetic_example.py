"""Generate a self-contained synthetic example dataset in the reference's
input layout, so the canonical invocation runs out of the box:

    python examples/make_synthetic_example.py --out example_synth
    python -m phylo_hmrf_tpu.cli -n 8 -p example_synth --chromvec 21,22 \
        --miter 20 --output out_synth

Uses the example 4-species tree topology and OU emissions over a Potts
state map, written as per-species contact lists (chrN.50K.txt), chrom.sizes,
synteny files, and the four tree/species/path files.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="example_synth")
    ap.add_argument("--n-bins", type=int, default=120)
    ap.add_argument("--n-states", type=int, default=5)
    ap.add_argument("--resolution", type=int, default=50000)
    ap.add_argument("--chroms", default="21,22")
    ap.add_argument("--scale-by-chrom", action="store_true",
                    help="scale each chromosome's bin count by the real "
                         "hg38 relative length (chr1 gets --n-bins, chr22 "
                         "~0.20x of it) — for genome-shaped dress "
                         "rehearsals with distinct region sizes")
    ap.add_argument("--blocks-per-chrom", default="1",
                    help="synteny blocks per chromosome — one N for all, "
                         "or a comma list matched to --chroms (e.g. '3,1' "
                         "for non-uniform regions-per-chromosome); "
                         "pod-scale region-granularity partitions "
                         "(more processes than chromosomes) need "
                         "several regions per chromosome to fan out")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from phylo_hmrf_tpu.tree import build_tree
    from phylo_hmrf_tpu.utils.simulate import (
        ou_moments_np, sample_potts_labels)

    rng = np.random.default_rng(args.seed)
    out = args.out
    os.makedirs(out, exist_ok=True)

    # example 4-species tree (same topology as the reference example input)
    edges = [(0, 1), (1, 2), (1, 3), (3, 4), (4, 5), (4, 6), (3, 7)]
    species = ["speciesA", "speciesB", "speciesC", "speciesD"]
    tree = build_tree(edges, branch_lengths=[0, 32, 20, 6, 6, 6, 12],
                      species=species)

    with open(os.path.join(out, "edge.1.txt"), "w") as f:
        for a, b in edges:
            f.write(f"{a}\t{b}\n")
    with open(os.path.join(out, "branch_length.1.txt"), "w") as f:
        f.write("\t".join(str(v) for v in [0, 32, 20, 6, 6, 6, 12]) + "\n")
    with open(os.path.join(out, "species_name.1.txt"), "w") as f:
        f.write("\n".join(species) + "\n")

    paths = []
    for s in species:
        d = os.path.join(out, f"hic_{s}")
        os.makedirs(d, exist_ok=True)
        paths.append(d)
    with open(os.path.join(out, "path_list.txt"), "w") as f:
        f.write("\n".join(os.path.abspath(p) for p in paths) + "\n")

    res = args.resolution
    n = args.n_bins
    K = args.n_states
    chroms = [int(c) for c in args.chroms.split(",")]
    bpc = [int(b) for b in str(args.blocks_per_chrom).split(",")]
    if len(bpc) == 1:
        bpc = bpc * len(chroms)
    assert len(bpc) == len(chroms), "--blocks-per-chrom list must match " \
                                    "--chroms"
    blocks = dict(zip(chroms, bpc))
    # hg38 chromosome lengths relative to chr1 (248.9 Mb)
    rel = {1: 1.00, 2: .974, 3: .797, 4: .764, 5: .729, 6: .686, 7: .640,
           8: .583, 9: .556, 10: .537, 11: .543, 12: .535, 13: .459,
           14: .430, 15: .410, 16: .363, 17: .335, 18: .323, 19: .236,
           20: .259, 21: .188, 22: .204}
    if args.scale_by_chrom:
        bins = {c: max(32, int(n * rel.get(c, 1.0))) for c in chroms}
    else:
        bins = {c: n for c in chroms}

    # per-state OU params with spread optima
    params = rng.random((K, tree.n_params)) * 0.5 + 0.2
    for c in range(K):
        params[c, tree.n_params - tree.n_nodes:] = 0.8 * c / K + 0.4
    moments = [ou_moments_np(params[c], tree) for c in range(K)]

    with open(os.path.join(out, "hg38.chrom.sizes"), "w") as f:
        for c in chroms:
            f.write(f"chr{c}\t{bins[c] * res}\n")

    for c in chroms:
        n = bins[c]
        # the Gibbs sampler is O(n^2 K) per sweep — at 10kb dress-rehearsal
        # scale (3000+ bins) sample the state field at 1/8 resolution and
        # block-upsample (states are spatially coherent at both scales)
        if n > 1024:
            n_c = (n + 7) // 8
            coarse = sample_potts_labels(rng, n_c, n_c, K, beta=1.2,
                                         n_sweeps=15)
            labels = np.kron(coarse, np.ones((8, 8), np.int32))[:n, :n]
        else:
            labels = sample_potts_labels(rng, n, n, K, beta=1.2, n_sweeps=15)
        labels = np.triu(labels) + np.triu(labels, 1).T
        ii, jj = np.triu_indices(n)
        # distance-decay background + state-dependent signal per species
        decay = np.exp(-0.05 * (jj - ii))
        for si, (s, d) in enumerate(zip(species, paths)):
            m = np.array([moments[k][0][si] for k in range(K)])
            v = np.array([moments[k][1][si, si] for k in range(K)]) + 1e-3
            sig = np.expm1(np.abs(
                m[labels[ii, jj]]
                + rng.standard_normal(ii.shape[0]) * np.sqrt(
                    v[labels[ii, jj]])))
            values = 50.0 * decay * (0.3 + sig)
            # drop a random 10% to exercise union alignment + hole fill
            keep = rng.random(ii.shape[0]) > 0.1
            # vectorized write (a Python row loop takes minutes at the
            # 10kb dress-rehearsal scale of ~5M rows per file)
            import pandas as pd
            pd.DataFrame({0: ii[keep] * res, 1: jj[keep] * res,
                          2: np.round(values[keep], 4)}).to_csv(
                os.path.join(d, f"chr{c}.{res // 1000}K.txt"),
                sep="\t", header=False, index=False,
                float_format="%.4f")

        start, stop = 2 * res, (n - 2) * res
        nb = max(1, blocks[c])
        # contiguous blocks on resolution boundaries; each row is its own
        # synteny block -> its own region
        cuts = [start + ((stop - start) * i // nb) // res * res
                for i in range(nb)] + [stop]
        with open(os.path.join(out, f"chr{c}.synteny.txt"), "w") as f:
            for a, b in zip(cuts[:-1], cuts[1:]):
                f.write(f"{a}\t{b}\t{b - a}\n")

    np.save(os.path.join(out, "true_params.npy"), params)
    print(f"wrote synthetic example to {out}/ "
          f"({len(chroms)} chroms x {len(species)} species, "
          f"{min(bins.values())}-{max(bins.values())} bins)")


if __name__ == "__main__":
    main()
