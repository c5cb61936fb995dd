"""Offline analysis / BED helpers (reference utility.py:49-265).

Ports: region intersection, BED export, per-chromosome state enrichment
(the reference's `state_enrichment` has unbound locals — utility.py:152-179;
the intended semantics are implemented here), and the inferCARs-style
synteny-alignment block parser used to prepare `chr*.synteny.txt` inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def intersect_region(file1: str, file2: str):
    """Serial-indexed interval intersection (reference `intersect_region`,
    utility.py:119-138): rows of file2 whose serial-matched row in file1
    overlaps them."""
    d1 = pd.read_table(file1, header=None)
    d2 = pd.read_table(file2, header=None)
    chrom1 = np.asarray(d1[0])
    start1, stop1 = np.asarray(d1[1]), np.asarray(d1[2])
    chrom2 = np.asarray(d2[0])
    start2, stop2 = np.asarray(d2[1]), np.asarray(d2[2])
    serial2 = np.asarray(d2[3], dtype=np.int64)
    flag = ((chrom1[serial2] == chrom2)
            & (start1[serial2] < stop2) & (stop1[serial2] > start2))
    return serial2[flag], serial2


def write_tobed(filename: str, output_filename: str) -> None:
    """3-column interval file -> 4-column BED with serial ids (reference
    `write_tobed`, utility.py:139-150)."""
    d = pd.read_table(filename, header=None)
    out = pd.DataFrame({
        "chrom": d[0], "start": d[1], "stop": d[2],
        "serial": np.arange(len(d))})
    out.to_csv(output_filename, header=False, index=False, sep="\t")


def state_enrichment(chroms: np.ndarray, state_vec: np.ndarray):
    """Per-chromosome state enrichment: fraction of each state per chromosome
    over its global fraction. Returns (log2 fold change, fold change),
    both (n_chroms, n_states)."""
    chroms = np.asarray(chroms)
    state_vec = np.asarray(state_vec)
    chrom_vals = np.unique(chroms)
    state_vals = np.unique(state_vec)
    n = state_vec.shape[0]
    global_frac = np.array([(state_vec == s).mean() for s in state_vals])
    mtx = np.zeros((len(chrom_vals), len(state_vals)))
    for i, c in enumerate(chrom_vals):
        sel = state_vec[chroms == c]
        for j, s in enumerate(state_vals):
            mtx[i, j] = (sel == s).mean() if sel.size else 0.0
    fold = mtx / np.maximum(global_frac[None, :], 1e-16)
    return np.log2(fold + 1e-16), fold


def parse_alignment_blocks(filename: str, min_length: int,
                           n_species: int = 4):
    """Parse inferCARs-style multi-species alignment blocks into per-
    chromosome region lists (reference `find_region`/`find_region1`,
    utility.py:179-242): groups of `n_species` lines like
    `genome.chrN:start-stop ...`; a block is kept when all species map to the
    same chromosome (chr2 may map to chr2A/chr2B) and every span is at least
    `min_length`.

    Returns {chrom: [[start, stop, length], ...]} keyed by the first
    species' chromosome, using the first species' coordinates.
    """
    with open(filename) as f:
        lines = f.readlines()
    out = {}
    i = 0
    while i < len(lines):
        line = lines[i]
        if line and line[0] != ">" and ":" in line and i + n_species <= len(
                lines):
            seg = lines[i:i + n_species]
            if not all(":" in s for s in seg):
                i += 1
                continue
            chrom_vec, len_vec = [], []
            ok = True
            for s in seg:
                head = s.split(" ")[0]
                try:
                    name, span = head.split(":")
                    chrom = name.split(".")[1]
                    start, stop = (int(v) for v in span.split("-"))
                except (IndexError, ValueError):
                    ok = False
                    break
                chrom_vec.append(chrom)
                len_vec.append([start, stop, stop - start])
            if ok and _same_chrom(chrom_vec) and min(
                    r[2] for r in len_vec) >= min_length:
                out.setdefault(chrom_vec[0], []).append(len_vec[0])
            i += n_species
        else:
            i += 1
    return out


def _same_chrom(chrom_vec) -> bool:
    base = chrom_vec[0]
    allowed = ({"chr2", "chr2A", "chr2B"} if base == "chr2"
               else {base})
    return all(c in allowed for c in chrom_vec)
