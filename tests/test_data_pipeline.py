"""Data pipeline tests: contact alignment, normalization, synteny splits,
hole fill, filters, rasterization, caching — plus a real-data run on the
reference example chr22 files."""

import os

import numpy as np
import pytest

from phylo_hmrf_tpu.config import PhyloHMRFConfig, THRESH1
from phylo_hmrf_tpu.data.contacts import (
    align_species_contacts, bin_count, normalize_feature, quantile_contact,
    x_max_from_quantiles)
from phylo_hmrf_tpu.data.filters import (
    _hole_fill_python, anisotropic_diffusion, bilateral_filter, hole_fill)
from phylo_hmrf_tpu.data.pipeline import (
    load_cache, load_chromosome, load_dataset, rasterize_region, save_cache)
from phylo_hmrf_tpu.data.synteny import (
    select_region_samples, split_regions)

from tests.conftest import EXAMPLE_INPUT


# ---------------------------------------------------------------------------
# synthetic fixture: 2 species, 1 chromosome, 200 bins
# ---------------------------------------------------------------------------

@pytest.fixture()
def tiny_dataset(tmp_path, rng):
    res = 50000
    n_bins = 60
    chrom_size = n_bins * res + 12345   # not divisible: exercises legacy N
    sizes = tmp_path / "ref.chrom.sizes"
    sizes.write_text(f"chr1\t{chrom_size}\nchrX\t999\n")

    paths = []
    for s, frac in (("spA", 0.9), ("spB", 0.8)):
        d = tmp_path / f"hic_{s}"
        d.mkdir()
        rows = []
        for i in range(n_bins):
            for j in range(i, min(i + 12, n_bins)):
                if rng.random() < frac:
                    v = np.exp(-0.3 * (j - i)) * 100 * (1 + rng.random())
                    rows.append(f"{i * res}\t{j * res}\t{v:.4f}")
        (d / "chr1.50K.txt").write_text("\n".join(rows) + "\n")
        paths.append(str(d))

    synteny = tmp_path / "chr1.synteny.txt"
    start, stop = 5 * res, 55 * res
    synteny.write_text(f"{start}\t{stop}\t{stop - start}\n")
    return dict(tmp_path=tmp_path, sizes=str(sizes), paths=paths,
                species=["spA", "spB"], res=res, n_bins=n_bins,
                chrom_size=chrom_size)


def test_bin_count_legacy_quirk():
    assert bin_count(1000, 100, legacy=True) == 10
    assert bin_count(1050, 100, legacy=True) == 10   # py2 floor division
    assert bin_count(1050, 100, legacy=False) == 11


@pytest.mark.smoke
def test_align_union_and_fill(tiny_dataset, rng):
    d = tiny_dataset
    position, values = align_species_contacts(
        1, d["res"], d["sizes"], d["paths"], d["species"])
    assert values.shape[1] == 2
    # union: every pair present in at least one species
    assert (values.max(axis=1) > 0).all()
    # zero-fill: some pairs missing in one species
    assert ((values == 0).any(axis=1)).any()
    # serial encoding consistent with positions
    N = bin_count(d["chrom_size"], d["res"])
    np.testing.assert_array_equal(
        position[:, 2], N * position[:, 0] + position[:, 1])
    assert (np.diff(position[:, 2]) > 0).all()   # sorted unique


def test_nan_to_minus_one(tmp_path):
    res = 50000
    (tmp_path / "s.chrom.sizes").write_text(f"chr1\t{10 * res}\n")
    d = tmp_path / "sp"
    d.mkdir()
    (d / "chr1.50K.txt").write_text("0\t0\t1.5\n0\t50000\tnan\n")
    position, values = align_species_contacts(
        1, res, str(tmp_path / "s.chrom.sizes"), [str(d)], ["sp"])
    assert values[position[:, 1] == 1][0, 0] == -1


def test_normalize_feature_reference_formula(rng):
    x = rng.random((500, 3)) * np.array([10, 100, 5]) - 1
    x_orig = x.copy()
    out, vec1, x_min, x_max = normalize_feature(x.copy(), 0.0, 9.0)
    clamped = np.maximum(x_orig, 0)
    for i in range(3):
        m1, m2 = clamped[:, i].min(), clamped[:, i].max()
        expected = 0.0 + (clamped[:, i] - m1) * 9.0 / (m2 - m1)
        np.testing.assert_allclose(out[:, i], expected, rtol=1e-10)
    assert out.min() >= 0 and out.max() <= 9.0 + 1e-9


def test_quantile_x_max(tiny_dataset):
    d = tiny_dataset
    m_vec = quantile_contact(1, d["res"], d["sizes"], d["paths"],
                             d["species"])
    assert m_vec.shape == (2, 10)
    assert (m_vec[:, 6] >= m_vec[:, 4]).all()   # max >= p95
    x_max = x_max_from_quantiles(m_vec)
    assert x_max == np.median(m_vec[:, 6])


def test_split_regions_no_centromere():
    blocks = np.array([[100, 500, 400], [600, 900, 300]])
    region_list, pairs = split_regions(blocks, 1, 10, {})
    assert len(pairs) == 2
    assert pairs[0][:4] == [100, 500, 100, 500]
    assert pairs[0][6] == 0 and pairs[1][6] == 1   # region ids
    assert pairs[0][7] == 0 and pairs[1][7] == 1   # serial ids


def test_split_regions_centromere():
    # reference semantics: a block spanning the configured centromere is cut
    # into [start, p1] and [p2, stop]; the pair enumeration then yields two
    # diagonal blocks and one off-diagonal block (utility.py:2140-2182)
    blocks = np.array([[0, 1000, 1000]])
    region_list, pairs = split_regions(blocks, 3, 10, {3: (400, 600)})
    assert len(region_list) == 2
    assert len(pairs) == 3
    diag = [p for p in pairs if p[0] == p[2] and p[1] == p[3]]
    offd = [p for p in pairs if not (p[0] == p[2] and p[1] == p[3])]
    assert len(diag) == 2 and len(offd) == 1
    assert diag[0][:2] == [0, 400] and diag[1][:2] == [600, 1000]
    assert offd[0][:4] == [0, 400, 600, 1000]


def test_hole_fill_sequential_semantics():
    # a chain of holes where sequential in-place filling propagates: the
    # vectorized (one-shot) fill would differ, so this guards the semantics
    n = 8
    m = np.full((n, n), 2.0)
    m[3, 4] = 0.0
    m[3, 5] = 0.0
    m[4, 5] = 0.0
    out_c = hole_fill(m.copy(), symmetric=True)
    out_py = _hole_fill_python(m.copy().astype(np.float64), True, THRESH1)
    np.testing.assert_allclose(out_c, out_py)
    assert (out_c[3, 4] > THRESH1 and out_c[3, 5] > THRESH1
            and out_c[4, 5] > THRESH1)
    # symmetric mirror applied
    np.testing.assert_allclose(out_c, out_c.T)


def test_hole_fill_rect_matches_python(rng):
    m = rng.random((12, 9))
    m[m < 0.3] = 0.0
    out_c = hole_fill(m.copy(), symmetric=False)
    out_py = _hole_fill_python(m.copy().astype(np.float64), False, THRESH1)
    np.testing.assert_allclose(out_c, out_py)


def test_hole_fill_skips_border_rows():
    # reference scan starts at i=2 and stops before the last row/col
    m = np.full((6, 6), 2.0)
    m[0, 3] = 0.0
    m[5, 5] = 0.0
    out = hole_fill(m.copy(), symmetric=False)
    assert out[0, 3] == 0.0 and out[5, 5] == 0.0


def test_anisotropic_diffusion_properties(rng):
    img = rng.random((20, 20)) * 4
    out = anisotropic_diffusion(img, niter=5, kappa=50, gamma=0.1)
    assert out.shape == img.shape
    # diffusion smooths: total variation decreases
    tv = lambda a: np.abs(np.diff(a, axis=0)).sum() + np.abs(
        np.diff(a, axis=1)).sum()
    assert tv(out) < tv(img)
    # one iteration with huge kappa ~ pure Laplacian step; zero iterations = id
    np.testing.assert_allclose(
        anisotropic_diffusion(img, niter=0), img)


def test_bilateral_preserves_edges(rng):
    img = np.zeros((20, 20))
    img[:, 10:] = 10.0
    img += rng.standard_normal((20, 20)) * 0.05
    out = bilateral_filter(img, sigma_color=0.5, sigma_spatial=2.0)
    # noise reduced
    assert out[:, :8].std() < img[:, :8].std()
    # edge magnitude preserved
    assert (out[:, 12:].mean() - out[:, :8].mean()) > 9.0


def test_rasterize_diag_region(rng):
    cfg = PhyloHMRFConfig(filter_mode=99, filter_sigma=0.0)  # no smoothing
    pos = np.array([[3, 3], [3, 4], [4, 4], [4, 6], [6, 6]])
    x = rng.random((5, 2)) + 1.0
    values, H0, W0, s1, s2, keep = rasterize_region(x, pos, True, cfg)
    assert keep is None
    assert (H0, W0, s1, s2) == (4, 4, 3, 3)
    assert values.shape == (10, 2)       # upper-tri of 4x4
    # sample (3,3) -> flat index 0
    np.testing.assert_allclose(values[0], x[0], rtol=1e-6)


def test_pipeline_end_to_end_synthetic(tiny_dataset):
    d = tiny_dataset
    cfg = PhyloHMRFConfig(pad_h=8, pad_w=8)
    regions, x_max = load_dataset([1], cfg, d["sizes"], d["paths"],
                                  d["species"], str(d["tmp_path"]))
    assert len(regions) == 1
    r = regions[0]
    assert r.is_diag
    assert r.img.shape[-1] == 2
    assert r.n_samples == r.H0 * (r.H0 + 1) // 2
    assert np.isfinite(r.flat_values()).all()
    # features are log1p of [0, x_max]-scaled values
    assert r.flat_values().max() <= np.log(1 + x_max) + 1e-5

    # cache roundtrip
    out = str(d["tmp_path"] / "cache")
    save_cache(regions, out, cfg)
    regions2 = load_cache(out, cfg)
    assert len(regions2) == 1
    np.testing.assert_allclose(regions2[0].flat_values(), r.flat_values(),
                               rtol=1e-6)
    np.testing.assert_array_equal(regions2[0].mask, r.mask)
    np.testing.assert_allclose(regions2[0].dmaps, r.dmaps, rtol=1e-5)


def test_load_dataset_worker_pool_matches_serial(tmp_path):
    """Cross-chromosome process-pool loading (the reference's one-process-
    per-chromosome unit, utility.py:284-298) must reproduce the serial
    load exactly, in the same region order."""
    import subprocess
    import sys
    out = str(tmp_path / "ex")
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__), "..",
                                 "examples", "make_synthetic_example.py"),
                    "--out", out, "--n-bins", "40", "--n-states", "3"],
                   check=True, capture_output=True)
    species = ["speciesA", "speciesB", "speciesC", "speciesD"]
    paths = [os.path.join(out, f"hic_{s}") for s in species]
    cfg = PhyloHMRFConfig(pad_h=8, pad_w=8)
    args = ([21, 22], cfg, os.path.join(out, "hg38.chrom.sizes"),
            paths, species, out)
    r_ser, x1 = load_dataset(*args, n_workers=0)
    r_par, x2 = load_dataset(*args, n_workers=2)
    assert x1 == x2
    assert len(r_ser) == len(r_par)
    for a, b in zip(r_ser, r_par):
        assert (a.chrom, a.region_id) == (b.chrom, b.region_id)
        np.testing.assert_array_equal(a.mask, b.mask)
        np.testing.assert_allclose(a.flat_values(), b.flat_values(),
                                   rtol=0, atol=0)
        np.testing.assert_allclose(a.dmaps, b.dmaps, rtol=0, atol=0)


@pytest.mark.slow
def test_pipeline_real_chr22():
    """Real reference example data (3 of 4 species are present in this
    mirror); full diagonal-block pipeline on chr22."""
    species = ["gorGor4", "panTro5", "panPan2"]
    paths = [os.path.join(EXAMPLE_INPUT, "test_data", f"hic_{s}")
             for s in species]
    for p in paths:
        if not os.path.exists(os.path.join(p, "chr22.50K.txt")):
            pytest.skip("example data missing")
    cfg = PhyloHMRFConfig()
    regions, x_max = load_dataset(
        [22], cfg, os.path.join(EXAMPLE_INPUT, "hg38.chrom.sizes"),
        paths, species, EXAMPLE_INPUT)
    assert len(regions) == 1
    r = regions[0]
    # chr22 synteny 16,554,072-50,780,062 at 50kb: ~685 bins
    assert 660 <= r.H0 <= 700, r.H0
    assert r.is_diag
    assert r.n_samples == r.H0 * (r.H0 + 1) // 2
    v = r.flat_values()
    assert np.isfinite(v).all()
    assert (v >= 0).all()
    # most pixels should be nonzero after union-fill + interpolation
    assert (v.max(axis=1) > 0).mean() > 0.5


def test_observed_mask_mode(tiny_dataset):
    d = tiny_dataset
    cfg = PhyloHMRFConfig(pad_h=8, pad_w=8, mask_mode="observed")
    regions, _ = load_dataset([1], cfg, d["sizes"], d["paths"],
                              d["species"], str(d["tmp_path"]))
    r = regions[0]
    structural_n = r.H0 * (r.H0 + 1) // 2
    # the tiny dataset covers only a 12-bin band around the diagonal:
    # far-off-diagonal interior pixels must be dropped
    assert r.n_samples < structural_n
    assert np.isfinite(r.flat_values()).all()
    # dropped pixels carry no mask/edges
    assert r.mask.sum() == r.n_samples

    # cache roundtrip preserves the subset
    out = str(d["tmp_path"] / "cache_obs")
    save_cache(regions, out, cfg)
    regions2 = load_cache(out, cfg)
    assert regions2[0].n_samples == r.n_samples
    np.testing.assert_array_equal(regions2[0].flat_rows, r.flat_rows)


def test_hole_fill_center_including_variant(rng):
    """near_interpolation2 semantics (reference utility.py:663-685): median
    over the full 3x3 window including the below-threshold center; C++ and
    python fallback agree; differs from the center-excluding variant."""
    from phylo_hmrf_tpu.config import THRESH1
    m = (rng.random((12, 12)) + 0.2).astype(np.float64)
    m = 0.5 * (m + m.T)
    holes = [(3, 5), (4, 4), (6, 9), (7, 7)]
    for i, j in holes:
        m[i, j] = m[j, i] = 0.0
    out_c = hole_fill(m.copy(), symmetric=True, include_center=True)
    out_py = _hole_fill_python(m.copy(), True, THRESH1, include_center=True)
    np.testing.assert_allclose(out_c, out_py)
    out_excl = hole_fill(m.copy(), symmetric=True)
    assert not np.allclose(out_c, out_excl)
    # center inclusion drags the median down (0 is in the window)
    i, j = holes[0]
    assert out_c[i, j] <= out_excl[i, j]
    assert out_c[i, j] == out_c[j, i]
    with pytest.raises(ValueError):
        hole_fill(m.copy(), symmetric=False, include_center=True)


def test_synth_generator_scale_by_chrom(tmp_path):
    """--scale-by-chrom gives chromosomes hg38-proportional bin counts."""
    import subprocess
    import sys
    out = str(tmp_path / "gex")
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__), "..",
                                 "examples", "make_synthetic_example.py"),
                    "--out", out, "--n-bins", "100", "--n-states", "3",
                    "--chroms", "1,19,21", "--scale-by-chrom"],
                   check=True, capture_output=True)
    sizes = {}
    with open(os.path.join(out, "hg38.chrom.sizes")) as f:
        for line in f:
            c, n = line.split()
            sizes[c] = int(n) // 50000
    assert sizes["chr1"] == 100
    assert sizes["chr19"] == 32      # 0.236 * 100 = 23 -> min-bin clamp 32
    assert sizes["chr21"] == 32      # 0.188 * 100 = 18 -> min-bin clamp 32
