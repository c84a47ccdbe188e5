"""Edge-of-domain contracts: tiny cohorts, degenerate selections,
all-missing loci, clamped eigen counts, extreme tile sizes. The reference
fails loudly on empty working sets (SNPRelate.cpp:103-106) and stays
well-defined down to two samples — these tests pin the same behavior."""

import math

import numpy as np
import pytest

from snprelate_tpu.io.store import create_geno


def _mk(g):
    g = np.asarray(g, np.uint8)
    return create_geno(
        g, sample_id=[f"s{i}" for i in range(g.shape[1])],
        snp_id=np.arange(g.shape[0]),
        snp_position=np.arange(g.shape[0]) * 10,
        snp_chromosome=np.ones(g.shape[0], np.int32))


def test_no_snp_after_filter_raises():
    """All-monomorphic data + remove_monosnp -> 'There is no SNP!'
    (SNPRelate.cpp:105), not a zero-length engine shape error."""
    from snprelate_tpu import ibs

    data = _mk(np.zeros((20, 6)))
    with pytest.raises(ValueError, match="no SNP"):
        ibs(data, autosome_only=False, remove_monosnp=True,
            missing_rate=math.nan)


def test_nonautosome_only_raises():
    from snprelate_tpu import ibs

    g = np.tile([0, 1, 2, 1], (9, 1))
    data = create_geno(np.asarray(g, np.uint8),
                       sample_id=list("abcd"), snp_id=np.arange(9),
                       snp_position=np.arange(9) * 10,
                       snp_chromosome=np.full(9, 23, np.int32))  # X only
    with pytest.raises(ValueError, match="no SNP"):
        ibs(data, autosome_only=True, missing_rate=math.nan)


def test_two_samples_one_valid_snp():
    """n=2 with a single informative locus: every pairwise estimator is
    still well-defined (or NaN exactly where the reference is)."""
    from snprelate_tpu import diss, ibd_king, ibd_mom, ibs_num

    # SNP0: (1,2)  SNP1: missing for s1  SNP2: all-missing
    g = np.array([[1, 2], [0, 3], [3, 3]])
    data = _mk(g)
    num = ibs_num(data, autosome_only=False, remove_monosnp=False,
                  missing_rate=math.nan)
    assert num.ibs0[0, 1] == 0 and num.ibs1[0, 1] == 1
    assert num.ibs2[0, 1] == 0

    king = ibd_king(data, autosome_only=False, remove_monosnp=False,
                    missing_rate=math.nan, type="KING-robust")
    # SumSq=1 over min(N1_Aa,N2_Aa)=min(1,0)=0 -> NaN (0/0 guarded)
    assert math.isnan(king.kinship[0, 1])

    d = diss(data, autosome_only=False, remove_monosnp=False,
             missing_rate=math.nan)
    assert np.isfinite(d.diss[0, 1])

    mom = ibd_mom(data, autosome_only=False, remove_monosnp=False,
                  missing_rate=math.nan, kinship=True)
    assert mom.k0.shape == (2, 2)


def test_single_sample_matrices():
    from snprelate_tpu import grm, ibs

    g = np.tile([[0], [1], [2], [1]], (5, 1))
    data = _mk(g)
    r = ibs(data, autosome_only=False, remove_monosnp=False,
            missing_rate=math.nan)
    assert r.ibs.shape == (1, 1) and r.ibs[0, 0] == 1.0
    m = grm(data, method="GCTA", autosome_only=False, remove_monosnp=False,
            missing_rate=math.nan)
    assert m.grm.shape == (1, 1) and np.isfinite(m.grm[0, 0])


def test_all_missing_snp_does_not_poison_counts():
    rng = np.random.default_rng(7)
    g = rng.choice([0, 1, 2], size=(40, 9)).astype(np.uint8)
    g[13] = 3  # one all-missing locus
    from snprelate_tpu import ibs_num, snp_rate_freq

    data = _mk(g)
    num = ibs_num(data, autosome_only=False, remove_monosnp=False,
                  missing_rate=math.nan)
    tot = num.ibs0 + num.ibs1 + num.ibs2
    assert (tot == 39).all()  # the all-missing locus never counts
    fr = snp_rate_freq(data)
    assert math.isnan(fr["AlleleFreq"][13])
    assert fr["MissingRate"][13] == 1.0


def test_eigen_cnt_clamps_to_n():
    from snprelate_tpu import pca

    rng = np.random.default_rng(1)
    g = rng.choice([0, 1, 2], size=(60, 5)).astype(np.uint8)
    data = _mk(g)
    p = pca(data, eigen_cnt=32, autosome_only=False, remove_monosnp=False,
            missing_rate=math.nan)
    assert p.eigenvect.shape == (5, 5)
    p0 = pca(data, eigen_cnt=0, autosome_only=False, remove_monosnp=False,
             missing_rate=math.nan)  # <=0 -> all (R/PCA.R eigen.cnt<=0)
    assert p0.eigenvect.shape == (5, 5)


def test_sample_block_extremes_match_default():
    from snprelate_tpu import grm

    rng = np.random.default_rng(3)
    g = rng.choice([0, 1, 2, 3], size=(120, 17)).astype(np.uint8)
    data = _mk(g)
    base = grm(data, method="GCTA", autosome_only=False,
               remove_monosnp=False, missing_rate=math.nan)
    for blk in (1, 5, 17, 64):
        t = grm(data, method="GCTA", sample_block=blk, autosome_only=False,
                remove_monosnp=False, missing_rate=math.nan)
        np.testing.assert_allclose(t.grm, base.grm, rtol=1e-12,
                                   err_msg=f"sample_block={blk}")


def test_cross_counts_single_query():
    from snprelate_tpu.ops.pairwise import cross_pair_counts, pair_counts
    from snprelate_tpu.workspace import init_workspace

    rng = np.random.default_rng(5)
    g = rng.choice([0, 1, 2, 3], size=(90, 11)).astype(np.uint8)
    data = _mk(g)
    ws, _ = init_workspace(data, autosome_only=False, remove_monosnp=False,
                           missing_rate=math.nan)
    c = cross_pair_counts(ws, g.T[:1])
    full = pair_counts(ws)
    for name in ("nvalid", "ibs0"):
        np.testing.assert_array_equal(
            getattr(c, name)[0], getattr(full, name)[0], err_msg=name)


def test_ld_degenerate_pairs():
    from snprelate_tpu import ld_pair

    x = np.array([0, 1, 2, 1, 0, 2, 1, 1])
    const = np.ones_like(x)
    nomiss = np.full_like(x, 3)
    for m in ("composite", "corr", "r", "dprime", "cov"):
        v = ld_pair(const, x, method=m)["ld"]
        assert not np.isfinite(v) or abs(v) < 1e-12, (m, v)
        assert not np.isfinite(ld_pair(nomiss, x, method=m)["ld"])


def test_fst_singleton_population():
    from snprelate_tpu import fst

    rng = np.random.default_rng(11)
    g = rng.choice([0, 1, 2], size=(200, 7)).astype(np.uint8)
    data = _mk(g)
    pop = np.array(["A"] * 6 + ["B"], object)
    r = fst(data, pop, method="W&C84", autosome_only=False,
            remove_monosnp=False, missing_rate=math.nan)
    assert np.isfinite(r.Fst)


def test_hcluster_two_samples():
    from snprelate_tpu import hcluster, ibs

    g = np.tile([[0, 2], [1, 1], [2, 0], [0, 1]], (8, 1))
    data = _mk(g)
    r = ibs(data, autosome_only=False, remove_monosnp=False,
            missing_rate=math.nan)
    tree = hcluster(1.0 - r.ibs, sample_id=r.sample_id)
    assert tree.merge.shape == (1, 2)
