"""Size the 10kb-resolution scale config (BASELINE "Scale configs" row).

Answers three questions with numbers (SCALING.md "10kb memory budget"
cites this script's output):

1. What are the TRUE 10kb region grids?  For chr21/22 the reference ships
   real inferCARs synteny blocks (example_input/chrNN.synteny.txt); this
   script runs them through the repo's own `split_regions` at 10kb.  For
   the chromosomes the reference does not ship blocks for, the upper
   bound on any single region is a whole chromosome arm (a synteny block
   cannot cross the centromere: the reference splits blocks there,
   utility.py:385-393), so arm lengths from hg38 sizes + centromere
   positions bound the worst case.

2. How much HBM does the fused E-step need per bucket at K states?  An
   analytic per-slab model of `_estep_bucket`'s pallas path
   (models/hmrf.py:107-135), validated against the measured
   `peak_bytes_in_use` from `--measure` runs on the real chip.

3. Which grids fit one v5e chip (16 GB), and how many spatial shards
   (parallel/halo.py row-sharding) do the rest need?

Usage:
    python benchmarks/budget_10kb.py                # analytic table
    python benchmarks/budget_10kb.py --measure H    # measured peak for an
                                                    # H^2 bucket on the chip
    python benchmarks/budget_10kb.py --k 30 --hbm-gb 16
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_INPUT = "/root/reference/example_input"

# hg38 autosome lengths (bp) and centromere intervals (bp, approximate —
# UCSC hg38 cytoBand acen boundaries rounded to 0.1 Mb).  Only used for
# the arms-as-upper-bound rows; chr21/22 use the shipped synteny files.
HG38 = {
    1: (248_956_422, (121_700_000, 125_100_000)),
    2: (242_193_529, (91_800_000, 96_000_000)),
    3: (198_295_559, (87_800_000, 94_000_000)),
    4: (190_214_555, (48_200_000, 51_800_000)),
    5: (181_538_259, (46_100_000, 50_000_000)),
    6: (170_805_979, (58_500_000, 62_600_000)),
    7: (159_345_973, (58_100_000, 62_100_000)),
    8: (145_138_636, (43_200_000, 47_200_000)),
    9: (138_394_717, (42_200_000, 45_500_000)),
    10: (133_797_422, (38_000_000, 41_600_000)),
    11: (135_086_622, (51_000_000, 55_800_000)),
    12: (133_275_309, (33_200_000, 37_800_000)),
    13: (114_364_328, (16_500_000, 18_900_000)),
    14: (107_043_718, (16_100_000, 18_200_000)),
    15: (101_991_189, (17_500_000, 20_500_000)),
    16: (90_338_345, (35_300_000, 38_400_000)),
    17: (83_257_441, (22_700_000, 27_400_000)),
    18: (80_373_285, (15_400_000, 21_500_000)),
    19: (58_617_616, (24_200_000, 28_100_000)),
    20: (64_444_167, (25_700_000, 30_400_000)),
    21: (46_709_983, (10_900_000, 13_000_000)),
    22: (50_818_468, (13_700_000, 17_400_000)),
}


def estep_hbm_bytes(H: int, W: int, K: int, F: int = 4, R: int = 1) -> int:
    """Peak HBM of one bucket through `_estep_bucket`'s fused pallas path.

    Slab inventory (f32 unless noted), per region of the R-bucket:
      persistent across EM (device-resident bucket arrays):
        img (H,W,F) 4F B/px; dmaps (4,H,W) 16 B/px; warm labels int32
        4 B/px; mask bool 1 B/px
      transient at the E-step peak (all live while the finish kernel runs):
        unary_k (K,H,W) 4K B/px   <- dominant; ONE slab (the finish kernel
                                     negates in-kernel, ops/finish_pallas.py)
        w_cut (4,H,W) 16 B/px (CSE'd with the finish w_pp when
                               estimate_type==3 — same expression, one jit)
        mf/cand_a/cand_b labels int32 12 B/px; mask_i int32 4 B/px
        img_f transpose (F,H,W) 4F B/px; halo-padded labp 4 + wp 16 B/px
    ~15% slop for XLA workspace/fragmentation (calibrated on measured
    peaks; see SCALING.md table).
    """
    px = H * W * R
    persistent = px * (4 * F + 16 + 4 + 1)
    transient = px * (4 * K + 16 + 12 + 4 + 4 * F + 4 + 16)
    return int((persistent + transient) * 1.15)


def real_synteny_grids(res: int):
    """True 10kb grids from the reference's shipped synteny files."""
    from phylo_hmrf_tpu.data.synteny import read_synteny_file, split_regions
    out = []
    for c in (21, 22):
        path = os.path.join(REF_INPUT, f"chr{c}.synteny.txt")
        if not os.path.exists(path):
            continue
        _, pairs = split_regions(read_synteny_file(path)[:, :3], c, res)
        for p in pairs:
            h = int(np.ceil(p[4] / res))
            w = int(np.ceil(p[5] / res))
            out.append((c, int(p[7]), h, w))
    return out


def arm_grids(res: int):
    """Worst-case single-region grid per chromosome: the longer arm."""
    rows = []
    for c, (size, (c0, c1)) in sorted(HG38.items()):
        p_arm = c0
        q_arm = size - c1
        arm = max(p_arm, q_arm)
        rows.append((c, int(np.ceil(arm / res))))
    return rows


def shards_needed(H: int, W: int, K: int, hbm_bytes: int, f: int = 4) -> int:
    """Spatial shards (row-sharded halo E-step) so each shard's slab set
    fits. Rows split H; every per-pixel slab splits with them."""
    n = 1
    while estep_hbm_bytes((H + n - 1) // n, W, K, f) > hbm_bytes:
        n *= 2
    return n


def measure(H: int, K: int, F: int = 4) -> dict:
    """Run one fused E-step on an H^2 bucket on the default device; report
    the steady-state wall (and the runtime peak where the backend exposes
    memory_stats — the axon tunnel does not, so OOM-boundary probing via
    --probe is the memory evidence there)."""
    import time

    import jax
    import jax.numpy as jnp
    from phylo_hmrf_tpu.models.hmrf import _ESTEP_JIT

    dev = jax.local_devices()[0]
    stats0 = getattr(dev, "memory_stats", lambda: None)() or {}
    base = stats0.get("bytes_in_use", 0)

    H = -(-H // 128) * 128   # pallas lane tiling: W aligned to 128
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, H, H, F)), jnp.float32)
    mask = jnp.asarray(np.ones((1, H, H), bool))
    dmaps = jnp.asarray(rng.random((1, 4, H, H)), jnp.float32)
    warm = jnp.zeros((1, H, H), jnp.int32)
    means = jnp.asarray(rng.random((K, F)), jnp.float32)
    covars = jnp.asarray(np.stack([np.eye(F)] * K), jnp.float32)

    def go():
        out = _ESTEP_JIT(img, mask, dmaps, warm, means, covars,
                         jnp.float32(1.0), jnp.float32(0.5),
                         weighted_pp=True, labeler="mf_icm", max_sweeps=60,
                         use_pallas=True)
        # host fetch, not block_until_ready: the latter does not
        # synchronize through the axon tunnel (see bench.py)
        np.asarray(out[3])
        return out

    go()                                   # compile + first run
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        go()
        walls.append(time.perf_counter() - t0)
    stats1 = getattr(dev, "memory_stats", lambda: None)() or {}
    peak = stats1.get("peak_bytes_in_use", 0)
    return {"H": H, "K": K,
            "measured_peak_gb": round((peak - base) / 2**30, 3),
            "model_gb": round(estep_hbm_bytes(H, H, K, F) / 2**30, 3),
            "estep_wall_s": round(float(np.median(walls)), 3)}


def probe(sizes, K: int) -> dict:
    """OOM-boundary probe: run the fused E-step at each H (one subprocess
    per size so an OOM cannot poison later trials); report ok/oom + wall.
    Brackets the analytic model against the chip's real 16 GB."""
    import subprocess
    out = {}
    for H in sizes:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--measure", str(H), "--k", str(K)],
            capture_output=True, text=True, timeout=900)
        line = (r.stdout.strip().splitlines() or [""])[-1]
        if r.returncode == 0 and line.startswith("{"):
            out[H] = json.loads(line)
        else:
            tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
            oom = any("RESOURCE_EXHAUSTED" in ln or "memory" in ln.lower()
                      for ln in tail)
            out[H] = {"H": H, "K": K, "oom": oom,
                      "error": tail[-1][:200] if tail else "unknown"}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=10_000)
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--hbm-gb", type=float, default=16.0)
    ap.add_argument("--measure", type=int, default=0,
                    help="measure the real peak for an H^2 bucket instead")
    ap.add_argument("--probe", default="",
                    help="comma list of H sizes to OOM-probe in "
                         "subprocesses (e.g. 7424,8704)")
    args = ap.parse_args()

    if args.measure:
        print(json.dumps(measure(args.measure, args.k)))
        return
    if args.probe:
        sizes = [int(s) for s in args.probe.split(",")]
        print(json.dumps(probe(sizes, args.k), indent=1))
        return

    res, K = args.res, args.k
    budget = int(args.hbm_gb * 2**30 * 0.85)  # leave 15% for M-step/init

    print(f"# 10kb budget  (K={K}, F=4, f32, per-chip HBM "
          f"{args.hbm_gb:.0f} GB, usable {budget / 2**30:.1f} GB)\n")

    print("## True synteny-block grids (reference example_input, "
          f"res={res})")
    print("| chrom | region | grid | E-step HBM (model) | fits 1 chip |")
    print("|---|---|---|---|---|")
    for c, rid, h, w in real_synteny_grids(res):
        b = estep_hbm_bytes(h, w, K)
        print(f"| chr{c} | {rid} | {h}x{w} | {b / 2**30:.2f} GB | "
              f"{'yes' if b <= budget else 'NO'} |")

    print("\n## Worst-case single region per chromosome (longest arm)")
    print("| chrom | arm bins | E-step HBM (model) | spatial shards "
          "needed |")
    print("|---|---|---|---|")
    for c, bins in arm_grids(res):
        b = estep_hbm_bytes(bins, bins, K)
        n = shards_needed(bins, bins, K, budget)
        print(f"| chr{c} | {bins} | {b / 2**30:.2f} GB | {n} |")

    # largest square grid that fits one chip at this K
    h = 256
    while estep_hbm_bytes(h + 256, h + 256, K) <= budget:
        h += 256
    print(f"\nLargest single-chip square bucket at K={K}: ~{h}^2 "
          f"({estep_hbm_bytes(h, h, K) / 2**30:.1f} GB)")


if __name__ == "__main__":
    main()
