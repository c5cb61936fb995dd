"""Post-fit analysis walkthrough — the Python port of the reference's
MATLAB `processing/` workflow (smooth_state_test.m, write_stateToFile_test.m,
state color maps), driven from a fitted `estimate_ou_*.mat`:

    # 1. fit (see make_synthetic_example.py, or real data)
    python examples/make_synthetic_example.py --out example_synth
    python -m phylo_hmrf_tpu.cli -n 5 -p example_synth --chromvec 21,22 \
        --miter 20 --output out_synth
    # 2. analyze
    python examples/analyze_output.py out_synth/estimate_ou_0_1.00_5.mat \
        --out analysis

Produces, per chromosome:
  - estimate_test<chrom>.ori.txt / .smooth.txt — per-bin-pair state rows
    [chrom, start1, stop1, chrom, start2, stop2, state]
    (reference `write_stateToFile_test.m` format)
  - estimate_test<chrom>.<region>.{ori,smooth}.txt — dense state matrices
  - state_map.<chrom>.<region>.png — RGB state map (if matplotlib present)
plus a state-occupancy table and per-state feature means on stdout.
"""

import argparse
import os
import sys

import numpy as np
import scipy.io

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from phylo_hmrf_tpu.postprocess.smooth import (
    smooth_state_vec, states_to_grid, states_to_rgb, write_state_files)
from phylo_hmrf_tpu.utils.metrics import cnt_estimate


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mat", help="estimate_ou_*.mat from the CLI")
    ap.add_argument("--out", default="analysis")
    ap.add_argument("--bin-size", type=int, default=50000)
    ap.add_argument("--smooth-threshold", type=int, default=None,
                    help="small-region pixel threshold (reference\n"
                    "read_state_test.m: 80, or 25 for short windows)")
    args = ap.parse_args(argv)

    m = scipy.io.loadmat(args.mat)
    state_vec = np.asarray(m["state_vec"]).ravel().astype(np.int64)
    len_vec = np.asarray(m["len_vec"], dtype=np.int64)
    K = int(np.asarray(m["params_vec1"]).shape[0])
    chroms = sorted(set(int(r[9]) for r in len_vec))
    for row in len_vec:
        n, H0, W0, is_diag = int(row[0]), int(row[3]), int(row[4]), row[8]
        dense = H0 * (H0 + 1) // 2 if is_diag else H0 * W0
        if n != dense:
            raise SystemExit(
                f"region {int(row[7])}: {n} samples != dense grid size "
                f"{dense} — this estimate was fitted with "
                f"mask_mode='observed'; the grid reconstruction here "
                f"assumes the default structural mask")
    os.makedirs(args.out, exist_ok=True)

    # state occupancy (reference cnt_estimate)
    cnt, ratio, used = cnt_estimate(state_vec, K)
    print("state occupancy (reference cnt_estimate order — counts follow\n"
          "the sorted list of states actually used):")
    for i, s in enumerate(used):
        print(f"  state {int(s):2d}: {int(cnt[i]):9d} pixels "
              f"({ratio[i]:6.2%})")

    # connected-component smoothing (reference smooth_state_test.m:
    # regions smaller than `size` pixels absorb the majority neighbor state)
    smoothed = smooth_state_vec(state_vec, len_vec, K,
                                threshold=args.smooth_threshold)
    changed = (smoothed != state_vec).mean()
    print(f"smoothing changed {changed:.3%} of pixels")

    for chrom in chroms:
        f1 = write_state_files(state_vec, len_vec, chrom, args.bin_size,
                               args.out, annotation="ori")
        f2 = write_state_files(smoothed, len_vec, chrom, args.bin_size,
                               args.out, annotation="smooth")
        print(f"chr{chrom}: wrote {f1} / {f2}")

    # RGB state maps per region
    try:
        from matplotlib import pyplot as plt
        for ridx, row in enumerate(len_vec):
            start, stop, H0, W0 = (int(row[1]), int(row[2]), int(row[3]),
                                   int(row[4]))
            grid = states_to_grid(smoothed[start:stop], H0, W0,
                                  bool(row[8]))
            png = os.path.join(args.out,
                               f"state_map.{int(row[9])}.{ridx}.png")
            plt.imsave(png, states_to_rgb(grid, n_components=K))
            print(f"wrote {png}")
    except ImportError:
        print("matplotlib not available — skipping PNG state maps")


if __name__ == "__main__":
    main()
