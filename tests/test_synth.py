"""Synthetic-cohort store factory (io/synth.py + codec_gen_cohort):
native == python oracle, partition invariance, planted-relative
semantics, store roundtrip. The north-star disk benchmarks build their
100k x 1M ground-truth stores through this path."""

import numpy as np
import pytest

from snprelate_tpu.io.store import open_packed_store, unpack2bit
from snprelate_tpu.io.synth import (default_planted_pairs,
                                    generate_synthetic_store)
from snprelate_tpu.native import _py_gen_row, gen_cohort_rows, get_lib


def test_native_matches_python_oracle():
    if get_lib() is None:
        pytest.skip("no compiler: native path unavailable")
    dup = [(0, 7), (3, 12)]
    pc = [(1, 20), (5, 33)]
    nat = gen_cohort_rows(42, 5, 8, 50, 25, 0.05, 3, dup, pc)
    for r in range(8):
        py = _py_gen_row(42, 5 + r, 50, 25, 0.05, 3, dup, pc)
        assert np.array_equal(unpack2bit(nat[r:r + 1], 50)[0], py)


def test_row_partition_invariance():
    a = gen_cohort_rows(42, 0, 16, 50, 25, 0.05, 3, [(0, 7)], [(1, 20)])
    b = np.concatenate(
        [gen_cohort_rows(42, 0, 5, 50, 25, 0.05, 3, [(0, 7)], [(1, 20)]),
         gen_cohort_rows(42, 5, 11, 50, 25, 0.05, 3, [(0, 7)], [(1, 20)])])
    assert np.array_equal(a, b)


def test_planted_pairs_and_structure():
    dup, pc = [(10, 999)], [(20, 998)]
    g = unpack2bit(
        gen_cohort_rows(7, 0, 6000, 2000, 1000, 0.05, 3, dup, pc), 2000)
    # duplicates identical (incl. missing pattern)
    assert np.array_equal(g[:, 10], g[:, 999])
    # parent-child: zero IBS0, kinship ~0.25 by the KING-robust formula
    s, c = g[:, 20].astype(int), g[:, 998].astype(int)
    ok = (s < 3) & (c < 3)
    sm, cm = s[ok], c[ok]
    assert (np.abs(sm - cm) == 2).sum() == 0
    phi = 0.5 - ((sm - cm) ** 2).sum() / (
        4.0 * min((sm == 1).sum(), (cm == 1).sum()))
    assert 0.2 < phi < 0.3
    # two-population freq shift ~0.05 per allele = 0.2 dosage across pops
    v = g.astype(float)
    v[v == 3] = np.nan
    fa, fb = np.nanmean(v[:, :998]), np.nanmean(v[:, 1000:997 + 1000])
    assert 0.1 < fb - fa < 0.3
    miss = np.isnan(v).mean()
    assert 0.008 < miss < 0.016  # miss_u8=3 -> 3/256


def test_store_roundtrip(tmp_path):
    pre = str(tmp_path / "synth")
    t = generate_synthetic_store(pre, 500, 256, pop_boundary=250,
                                 n_chrom=4)
    d = open_packed_store(pre)
    assert d.n_samp == 500 and d.n_snp == 256
    assert d.sample_annot["pop"].sum() == 250
    assert d.snp_chromosome.min() == 1 and d.snp_chromosome.max() == 4
    g = d.geno()
    for a, b in t["dup_pairs"]:
        assert np.array_equal(g[:, a], g[:, b])
    # regenerating any row range reproduces the stored bytes exactly
    again = gen_cohort_rows(t["seed"], 100, 50, 500, 250, t["structure"],
                            t["miss_u8"], t["dup_pairs"], t["pc_pairs"])
    assert np.array_equal(np.asarray(d.genotype_packed[100:150]), again)


def test_default_planted_pairs_distinct():
    for n, b in ((2000, 1000), (100_000, 49152), (333, 100)):
        dup, pc = default_planted_pairs(n, b)
        flat = [i for pr in dup + pc for i in pr]
        assert len(set(flat)) == len(flat)
        assert max(flat) < n and min(flat) >= 0
