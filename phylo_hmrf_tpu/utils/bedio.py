"""Offline analysis / BED helpers (reference utility.py:49-265).

Ports: region intersection, BED export, per-chromosome state enrichment
(the reference's `state_enrichment` has unbound locals — utility.py:152-179;
the intended semantics are implemented here), and the inferCARs-style
synteny-alignment block parser used to prepare `chr*.synteny.txt` inputs.
"""

from __future__ import annotations

import os

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


def merge_contact_file(path1: str, output_filename: str,
                       chrom_vec=None, resolution: int = 50000) -> None:
    """Concatenate per-chromosome 3-column contact lists into one
    tab-separated file with a leading ``chrN`` label column, NaN written as
    ``NAN`` (reference ``merge_contact_file``, utility.py:49-78)."""
    if chrom_vec is None:
        chrom_vec = list(range(1, 23))
    kb = resolution // 1000
    frames = []
    for chrom in chrom_vec:
        d = pd.read_table(f"{path1}/chr{chrom}.{kb}K.txt", header=None)
        t = pd.DataFrame({"chrom": [f"chr{chrom}"] * len(d),
                          "start1": d[0], "start2": d[1], "value": d[2]})
        frames.append(t)
    pd.concat(frames, ignore_index=True).to_csv(
        output_filename, header=False, index=False, na_rep="NAN", sep="\t")


def merge_estimate_file(path1: str, species_vec, output_filename: str,
                        chrom_vec=None, output_path: str = ".") -> None:
    """Merge per-chromosome 11-column estimate exports (``test{N}.txt``:
    start1 bin1 stop1 start2 bin2 stop2 state f_1..f_S) into one file keyed
    by ``chrN``, then split one 4-column file per species (reference
    ``merge_estimate_file``, utility.py:80-117)."""
    if chrom_vec is None:
        chrom_vec = list(range(1, 23))
    frames = []
    for chrom in chrom_vec:
        d = pd.read_table(f"{path1}/test{chrom}.txt", header=None)
        cols = list(d)
        # one feature column per species (the reference hardcodes 4
        # species at utility.py:93; this port follows species_vec)
        if len(cols) < 7 + len(species_vec):
            raise ValueError(
                f"test{chrom}.txt has {len(cols)} columns; expected "
                f"{7 + len(species_vec)} for {len(species_vec)} species")
        sub = [cols[0], cols[1], cols[4]] + cols[7:7 + len(species_vec)]
        t = d.loc[:, sub].copy()
        t[cols[0]] = [f"chr{chrom}"] * len(t)
        frames.append(t)
    merged = pd.concat(frames, ignore_index=True)
    merged.to_csv(output_filename, header=False, index=False, sep="\t")
    cols = list(merged)
    for i, sp in enumerate(species_vec):
        merged.loc[:, [cols[0], cols[1], cols[2], cols[3 + i]]].to_csv(
            os.path.join(output_path, f"estimate_{sp}.txt"),
            header=False, index=False, sep="\t")


def chrom_contactMtx(input_filename: str, chrom) -> str:
    """Rewrite a raw ``*.{res}Kb.*`` contact list as a 4-column BED
    (chrom, bin1, bin2, value) with coordinates divided by the resolution
    parsed from the filename and NaN -> -1 (reference ``chrom_contactMtx``,
    utility.py:2664-2690). Returns the output path."""
    str_vec = input_filename.split(".")
    resolution = int(str_vec[1][:str_vec[1].find("Kb")]) * 1000
    if str_vec[1].find("chr") < 0:
        chrom = f"chr{chrom}"
    d = pd.read_table(input_filename, header=None)
    value = np.array(d[2], dtype=np.float64)
    value[np.isnan(value)] = -1
    out = pd.DataFrame({
        "chrom": [chrom] * len(d),
        "x1": (np.asarray(d[0]) // resolution).astype(np.int64),
        "x2": (np.asarray(d[1]) // resolution).astype(np.int64),
        "value": value})
    output_filename = f"{input_filename[:input_filename.find('.txt')]}.bed"
    out.to_csv(output_filename, header=False, index=False, sep="\t")
    return output_filename


def overlap_openChromatin(loc1, loc2) -> list:
    """Indices of feature regions (``loc1``: dict/frame with chr/start/stop)
    overlapping any open-chromatin interval (``loc2``: [chrom, start, stop]
    columns) (reference ``overlap_openChromatin``, utility.py:2692-2723)."""
    chrom1 = np.asarray(loc1["chr"])
    start1 = np.asarray(loc1["start"])
    stop1 = np.asarray(loc1["stop"])
    chrom2, start2, stop2 = (np.asarray(loc2[0]), np.asarray(loc2[1]),
                             np.asarray(loc2[2]))
    chrom_dict = {c: np.where(chrom1 == c)[0] for c in set(chrom1)}
    sel_idx = set()
    for j in range(len(chrom2)):
        b1 = chrom_dict.get(chrom2[j])
        if b1 is None:
            continue
        hit = (start1[b1] < stop2[j]) & (stop1[b1] > start2[j])
        sel_idx.update(b1[hit].tolist())
    return sorted(sel_idx)
