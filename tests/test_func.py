"""Per-SNP / per-sample statistics and small analyses, cross-validated
against dense numpy computations (reference: test_Func.R style)."""

import numpy as np


def test_snp_rate_freq_vs_dense(hapmap):
    from snprelate_tpu import snp_rate_freq, get_geno

    import warnings

    rv = snp_rate_freq(hapmap, sample_id=hapmap.sample_id[:77], with_id=True)
    g = get_geno(hapmap, sample_id=hapmap.sample_id[:77], snpfirstdim=True)
    with warnings.catch_warnings():
        # all-missing SNPs: AlleleFreq is NaN by contract on both sides
        warnings.simplefilter("ignore", RuntimeWarning)
        af = np.nanmean(g, axis=1) / 2
    np.testing.assert_allclose(rv["AlleleFreq"], af, rtol=1e-12)
    np.testing.assert_allclose(rv["MinorFreq"], np.minimum(af, 1 - af),
                               rtol=1e-12)
    np.testing.assert_allclose(rv["MissingRate"],
                               np.isnan(g).mean(axis=1), rtol=1e-12)


def test_samp_miss_rate(hapmap):
    from snprelate_tpu import samp_miss_rate, get_geno

    mr = samp_miss_rate(hapmap)
    g = get_geno(hapmap, snpfirstdim=True)
    np.testing.assert_allclose(mr, np.isnan(g).mean(axis=0), rtol=1e-12)


def test_hwe_known_values(hapmap):
    from snprelate_tpu.models.hwe import hwe_pvalue
    from snprelate_tpu import hwe

    # perfectly balanced genotypes are in HWE
    assert hwe_pvalue(50, 25, 25) == 1.0
    # all het is a strong HWE violation
    assert hwe_pvalue(100, 0, 0) < 1e-20
    pv = hwe(hapmap, sample_id=hapmap.sample_id[:90])
    assert pv.shape == (hapmap.n_snp,)
    ok = np.isfinite(pv)
    assert ((pv[ok] >= 0) & (pv[ok] <= 1)).all()


def test_fst_two_pops(hapmap):
    from snprelate_tpu import fst

    pop = hapmap.sample_annot["pop.group"][:90]
    r1 = fst(hapmap, population=pop, sample_id=hapmap.sample_id[:90],
             method="W&C84")
    assert 0 < r1.Fst < 0.3
    assert np.isfinite(r1.MeanFst)
    r2 = fst(hapmap, population=pop, sample_id=hapmap.sample_id[:90],
             method="W&H02")
    assert 0 < r2.Fst < 0.5
    assert r2.Beta.shape[0] == len(set(pop.tolist()))
    # diagonal within-population betas
    assert np.allclose(r2.Beta, r2.Beta.T)


def test_ind_inb_methods(hapmap):
    from snprelate_tpu import ind_inb, ind_inb_coef, get_geno, snp_rate_freq

    for m in ("mom.weir", "mom.visscher", "gcta1", "gcta2", "gcta3"):
        r = ind_inb(hapmap, sample_id=hapmap.sample_id[:40], method=m)
        assert r.inbreeding.shape == (40,)
        assert np.isfinite(r.inbreeding).all(), m
        assert (np.abs(r.inbreeding) < 1.5).all(), m

    # cross-check mom.weir per-sample against ind_inb_coef on dense data
    from snprelate_tpu.workspace import init_workspace, snp_stats
    ws, _ = init_workspace(hapmap, sample_id=hapmap.sample_id[:40])
    af, _, _, _ = snp_stats(ws)
    g = ws.geno().astype(float)
    g[g == 3] = np.nan
    r = ind_inb(hapmap, sample_id=hapmap.sample_id[:40], method="mom.weir")
    for j in (0, 7, 39):
        v = ind_inb_coef(g[:, j], af, method="mom.weir")
        np.testing.assert_allclose(r.inbreeding[j], v, rtol=1e-10)


def test_ind_inb_mle(hapmap):
    from snprelate_tpu import ind_inb

    r = ind_inb(hapmap, sample_id=hapmap.sample_id[:20], method="mle")
    assert np.isfinite(r.inbreeding).all()
    assert (r.out_num_iter > 0).all()
    assert ((r.inbreeding > -0.1) & (r.inbreeding < 1.0)).all()


def test_select_snp(hapmap):
    from snprelate_tpu import select_snp

    ids = select_snp(hapmap, sample_id=hapmap.sample_id[:90], maf=0.05)
    ids2 = select_snp(hapmap, sample_id=hapmap.sample_id[:90])
    assert len(ids) < len(ids2)


def test_summary(hapmap):
    from snprelate_tpu import summary

    info = summary(hapmap)
    assert info["n.samp"] == 279 and info["n.snp"] == 9088
    assert info["sample.id.unique"] and info["snp.id.unique"]
