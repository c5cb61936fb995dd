"""P22 offline-analysis tail: merge/export helpers, symmetric-index family,
masked rasterizer, position-carrying region loader (reference utility.py:49,
:80, :701-758, :2231, :2664, :2692, :536)."""

import numpy as np
import pandas as pd
import pytest

from phylo_hmrf_tpu.postprocess.smooth import (
    symmetric_idx, symmetric_idx1, symmetric_state, symmetric_state1,
    symmetric_state1_vec)
from phylo_hmrf_tpu.utils.bedio import (
    chrom_contactMtx, merge_contact_file, merge_estimate_file,
    overlap_openChromatin)
from phylo_hmrf_tpu.data.pipeline import (
    load_region_with_positions, write_matrix_image_v1_mask)

pytestmark = pytest.mark.smoke


# ---------------------------------------------------------------------------
# symmetric index / state family
# ---------------------------------------------------------------------------

def test_symmetric_idx_matches_loop():
    for d1, d2 in [(3, 3), (2, 5), (4, 1)]:
        got = symmetric_idx(d1, d2)
        want = [i * d2 + j for i in range(d1) for j in range(d2) if i <= j]
        np.testing.assert_array_equal(got, want)
        up, lo = symmetric_idx1(d1, d2)
        np.testing.assert_array_equal(up, want)
        want_lo = [i * d2 + j for i in range(d1) for j in range(d2) if i >= j]
        np.testing.assert_array_equal(lo, want_lo)


def test_symmetric_state_roundtrip(rng):
    m = rng.integers(0, 5, size=(6, 6)).astype(float)
    out = symmetric_state(m.copy())
    np.testing.assert_array_equal(out, out.T)
    np.testing.assert_array_equal(np.triu(out), np.triu(m))

    ws = 4
    flat = np.arange(ws * (ws + 1) // 2, dtype=float) + 1
    dense = symmetric_state1(flat, ws)
    np.testing.assert_array_equal(dense, dense.T)
    iu = np.triu_indices(ws)
    np.testing.assert_array_equal(dense[iu], flat)

    len_vec = np.zeros((2, 10), dtype=np.int64)
    len_vec[:, 3] = ws
    got = symmetric_state1_vec([flat, flat * 2], len_vec)
    assert len(got) == 2 * ws
    np.testing.assert_array_equal(np.asarray(got[:ws]), dense)


# ---------------------------------------------------------------------------
# merge / export helpers
# ---------------------------------------------------------------------------

def test_merge_contact_file(tmp_path):
    for chrom, vals in [(21, [1.0, np.nan]), (22, [3.5])]:
        rows = [f"{i * 50000}\t{(i + 1) * 50000}\t{v}"
                for i, v in enumerate(vals)]
        (tmp_path / f"chr{chrom}.50K.txt").write_text("\n".join(rows) + "\n")
    out = tmp_path / "merged.txt"
    merge_contact_file(str(tmp_path), str(out), chrom_vec=[21, 22])
    lines = out.read_text().strip().split("\n")
    assert len(lines) == 3
    assert lines[0].split("\t")[0] == "chr21"
    assert lines[1].split("\t")[3] == "NAN"
    assert lines[2].split("\t") == ["chr22", "0", "50000", "3.5"]


def test_merge_estimate_file(tmp_path):
    # 11 columns: start1 bin1 stop1 start2 bin2 stop2 state f1..f4
    species = ["hg38", "panTro5", "panPan2", "gorGor4"]
    for chrom in (21, 22):
        row = [chrom * 10, 1, chrom * 10 + 5, chrom * 20, 2, chrom * 20 + 5,
               7, 1.5, 2.5, 3.5, 4.5]
        (tmp_path / f"test{chrom}.txt").write_text(
            "\t".join(map(str, row)) + "\n")
    out = tmp_path / "est.txt"
    merge_estimate_file(str(tmp_path), species, str(out),
                        chrom_vec=[21, 22], output_path=str(tmp_path))
    merged = pd.read_table(out, header=None)
    assert list(merged[0]) == ["chr21", "chr22"]
    assert merged.shape == (2, 7)      # chrom, bin1, bin2, state, f1..f3
    per_sp = pd.read_table(tmp_path / "estimate_panTro5.txt", header=None)
    assert per_sp.shape == (2, 4)
    assert per_sp.iloc[0, 3] == 2.5    # second species' value


def test_merge_estimate_file_many_species(tmp_path):
    """More than 4 species: the column pick must follow species_vec (the
    reference is 4-species-hardcoded at utility.py:93; this port is
    general), not silently drop the extra feature columns (ADVICE r4)."""
    species = [f"sp{i}" for i in range(6)]
    row = [10, 1, 15, 20, 2, 25, 3] + [float(i + 1) for i in range(6)]
    (tmp_path / "test21.txt").write_text("\t".join(map(str, row)) + "\n")
    out = tmp_path / "est.txt"
    merge_estimate_file(str(tmp_path), species, str(out),
                        chrom_vec=[21], output_path=str(tmp_path))
    merged = pd.read_table(out, header=None)
    assert merged.shape == (1, 9)      # chrom, bin1, bin2, f1..f6
    assert list(merged.iloc[0, 3:]) == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    per_sp = pd.read_table(tmp_path / "estimate_sp5.txt", header=None)
    assert per_sp.iloc[0, 3] == 6.0

    # short input must raise, not silently mis-slice
    (tmp_path / "test22.txt").write_text(
        "\t".join(map(str, row[:10])) + "\n")
    with pytest.raises(ValueError):
        merge_estimate_file(str(tmp_path), species, str(out),
                            chrom_vec=[22], output_path=str(tmp_path))


def test_chrom_contactMtx(tmp_path):
    f = tmp_path / "contacts.50Kb.txt"
    f.write_text("0\t50000\t2.0\n100000\t150000\tnan\n")
    out = chrom_contactMtx(str(f), 21)
    d = pd.read_table(out, header=None)
    assert list(d[0]) == ["chr21", "chr21"]
    assert list(d[1]) == [0, 2]
    assert list(d[2]) == [1, 3]
    assert d.iloc[1, 3] == -1          # NaN -> -1


def test_overlap_openChromatin():
    loc1 = {"chr": np.array(["chr1", "chr1", "chr2"]),
            "start": np.array([0, 100, 0]),
            "stop": np.array([50, 200, 50])}
    loc2 = [np.array(["chr1", "chr3"]), np.array([40, 0]),
            np.array([120, 10])]
    assert overlap_openChromatin(loc1, loc2) == [0, 1]


# ---------------------------------------------------------------------------
# masked rasterizer + position-carrying loader
# ---------------------------------------------------------------------------

def _v1_mask_oracle(value, pos):
    """Direct loop transcription of the reference semantics."""
    value = np.array(value, dtype=np.float64)
    pos = np.asarray(pos, dtype=np.int64)
    start = int(min(pos[:, 0].min(), pos[:, 1].min()))
    stop = int(max(pos[:, 0].max(), pos[:, 1].max()))
    ws = stop - start + 1
    for f in range(value.shape[1]):
        t1 = value[:, f]
        positive = t1[t1 > 0]
        if positive.size:
            t1[t1 < np.quantile(positive, 0.05)] = 0
    mtx = np.zeros((ws, ws, value.shape[1]))
    for i in range(value.shape[0]):
        i1, i2 = pos[i, 0] - start, pos[i, 1] - start
        mtx[i1, i2] = value[i]
        mtx[i2, i1] = value[i]
    temp1 = mtx.sum(2)
    vi1 = np.where(temp1.ravel() > 0)[0]
    temp1[temp1 <= 0] = 0
    mask = np.ones((ws, ws))
    for i in range(1, ws - 1):
        for j in range(i + 1, ws - 1):
            if np.sum(temp1[i - 1:i + 1, j - 1:j + 1]) <= 0:
                mask[j, i] = 0
                mask[i, j] = 0
    vi2 = np.where(mask.ravel() > 0)[0]
    return mtx, start, vi1, vi2


def test_write_matrix_image_v1_mask_vs_oracle(rng):
    n, F = 60, 3
    pos = rng.integers(5, 20, size=(n, 2))
    pos = np.sort(pos, axis=1)
    value = rng.uniform(0, 2, size=(n, F))
    value[rng.uniform(size=n) < 0.4] = 0.0    # holes so the mask triggers
    got = write_matrix_image_v1_mask(value.copy(), pos)
    want = _v1_mask_oracle(value.copy(), pos)
    np.testing.assert_allclose(got[0], want[0])
    assert got[1] == want[1]
    np.testing.assert_array_equal(got[2], want[2])
    np.testing.assert_array_equal(got[3], want[3])
    assert len(got[3]) < got[0].shape[0] ** 2  # mask actually removed pixels


def test_load_region_with_positions(rng):
    from phylo_hmrf_tpu.config import PhyloHMRFConfig
    cfg = PhyloHMRFConfig(resolution=50000, num_neighbor=4)
    bins = np.arange(8)
    rr, cc = np.meshgrid(bins, bins, indexing="ij")
    keep = rr <= cc
    position = np.stack([rr[keep], cc[keep]], axis=1) * 1
    x = rng.uniform(0.5, 2.0, size=(position.shape[0], 2))
    # diagonal block [0, 8) x [0, 8) in genomic coords
    res = cfg.resolution
    pair = [0, 8 * res, 0, 8 * res, 8 * res, 8 * res, 0, 0, 21]
    region, positions = load_region_with_positions(
        x, position, pair, cfg, chrom=21)
    assert positions.shape == (region.n_samples, 2)
    # every returned position is one of the input upper-triangle bin pairs
    serials = positions[:, 0] * 8 + positions[:, 1]
    input_serials = position[:, 0] * 8 + position[:, 1]
    assert np.isin(serials, input_serials).all()
