"""Golden-value relatedness tests, mirroring the reference's
inst/unitTests/test_rel.R: re-run each analysis on the bundled hapmap GDS
(first 60-90 samples, missing.rate=NaN) and compare to the stored results.
"""

import numpy as np
import pytest


def test_ibs_golden(hapmap, golden):
    """test_rel.R:97-124 — snpgdsIBS on samples[:90], missing.rate=NaN."""
    from snprelate_tpu import ibs

    res = ibs(hapmap, sample_id=hapmap.sample_id[:90], missing_rate=np.nan)
    assert list(res.sample_id) == list(golden["IBS"]["sample.id"])
    assert np.array_equal(res.snp_id, golden["IBS"]["snp.id"])
    np.testing.assert_allclose(res.ibs, golden["IBS"]["ibs"], rtol=0, atol=1e-12)


def test_ibs_chunk_invariance(hapmap):
    """Analog of the reference's num.thread 1-vs-2 determinism contract
    (test_rel.R:107-120): results identical across chunkings."""
    from snprelate_tpu import ibs_num

    a = ibs_num(hapmap, sample_id=hapmap.sample_id[:60], chunk=512)
    b = ibs_num(hapmap, sample_id=hapmap.sample_id[:60], chunk=4096)
    assert np.array_equal(a.ibs0, b.ibs0)
    assert np.array_equal(a.ibs1, b.ibs1)
    assert np.array_equal(a.ibs2, b.ibs2)
    # symmetry and diagonal sanity
    assert np.array_equal(a.ibs0, a.ibs0.T)
    assert (np.diag(a.ibs0) == 0).all()


def test_pca_genmat_golden(hapmap, golden):
    """test_rel.R:128-189 — snpgdsPCA genmat on samples[:90]."""
    from snprelate_tpu import pca

    res = pca(hapmap, sample_id=hapmap.sample_id[:90], need_genmat=True,
              eigen_cnt=8, missing_rate=np.nan)
    np.testing.assert_allclose(res.genmat, golden["PCA"]["genmat"],
                               rtol=1e-9, atol=1e-9)
    # eigenvalues: genmat is deterministic, so eigvals must match its spectrum
    w = np.linalg.eigvalsh(golden["PCA"]["genmat"])[::-1]
    np.testing.assert_allclose(res.eigenval[:8], w[:8], rtol=1e-8)
    assert res.eigenvect.shape == (90, 8)
    np.testing.assert_allclose(res.varprop[:8] * np.trace(res.genmat),
                               res.eigenval[:8], rtol=1e-8)


def test_grm_gcta_vs_numpy(hapmap):
    """Cross-validate GCTA GRM against a direct dense float64 NumPy
    implementation of genPCA.cpp:1148-1237 (independent-implementation
    check, the reference's own test style in test_GRM.R)."""
    from snprelate_tpu import grm
    from snprelate_tpu.workspace import init_workspace

    ws, _ = init_workspace(hapmap, sample_id=hapmap.sample_id[:60])
    g = ws.geno().astype(np.float64)  # (nsnp, 60)
    valid = g < 3
    num = valid.sum(1)
    gsum = np.where(valid, g, 0).sum(1)
    avg = np.where(num > 0, gsum / num, 0)
    s = avg / 2
    scale = np.where((s > 0) & (s < 1), 1 / np.sqrt(s * (1 - s)), 0)
    x = (np.where(valid, g, avg[:, None]) - avg[:, None]) * scale[:, None]
    cov = x.T @ x
    poly = (gsum > 0) & (gsum < 2 * num)
    vp = (valid & poly[:, None]).astype(np.float64)
    expected = cov / (2 * (vp.T @ vp))

    res = grm(hapmap, sample_id=hapmap.sample_id[:60], method="GCTA",
              missing_rate=np.nan)
    np.testing.assert_allclose(res.grm, expected, rtol=1e-8, atol=1e-12)


def test_grm_eigenstrat_matches_pca_genmat(hapmap):
    from snprelate_tpu import grm, pca

    res = grm(hapmap, sample_id=hapmap.sample_id[:60], method="Eigenstrat",
              missing_rate=np.nan)
    p = pca(hapmap, sample_id=hapmap.sample_id[:60], need_genmat=True,
            genmat_only=True, missing_rate=np.nan)
    np.testing.assert_allclose(res.grm, p.genmat, rtol=1e-12)


def test_grm_corr_unit_diag(hapmap):
    from snprelate_tpu import grm

    res = grm(hapmap, sample_id=hapmap.sample_id[:60], method="Corr",
              missing_rate=np.nan)
    np.testing.assert_allclose(np.diag(res.grm), 1.0)
    assert np.allclose(res.grm, res.grm.T)


def test_king_golden(hapmap, golden):
    """test_rel.R:228-273 — KING robust + homo on samples[:60]."""
    from snprelate_tpu import ibd_king

    v1, v2 = golden["KING"]
    rob = ibd_king(hapmap, sample_id=hapmap.sample_id[:60],
                   missing_rate=np.nan, type="KING-robust")
    assert np.array_equal(rob.snp_id, v1["snp.id"])
    np.testing.assert_allclose(rob.IBS0, v1["IBS0"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(rob.kinship, v1["kinship"], rtol=1e-12)

    hom = ibd_king(hapmap, sample_id=hapmap.sample_id[:60],
                   missing_rate=np.nan, type="KING-homo")
    np.testing.assert_allclose(hom.k0, v2["k0"], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(hom.k1, v2["k1"], rtol=1e-9, atol=1e-12)


def test_mom_golden(hapmap, golden):
    """test_rel.R:193-224 — snpgdsIBDMoM on samples[:90]."""
    from snprelate_tpu import ibd_mom

    res = ibd_mom(hapmap, sample_id=hapmap.sample_id[:90], missing_rate=np.nan)
    g = golden["MoM"]
    assert np.array_equal(res.snp_id, g["snp.id"])
    np.testing.assert_allclose(res.afreq, g["afreq"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(res.k0, g["k0"], rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(res.k1, g["k1"], rtol=1e-10, atol=1e-12)


def test_beta_golden(hapmap, golden):
    """test_rel.R:277-304 — snpgdsIndivBeta on samples[:90]."""
    from snprelate_tpu import indiv_beta

    res = indiv_beta(hapmap, sample_id=hapmap.sample_id[:90],
                     missing_rate=np.nan)
    g = golden["Beta"]
    assert np.array_equal(res.snp_id, g["snp.id"])
    np.testing.assert_allclose(res.beta, g["beta"], rtol=1e-12, atol=1e-14)


def test_eigmix_golden(hapmap, golden):
    """test_rel.R:308-329 — snpgdsEIGMIX ibd matrix on samples[:90]."""
    from snprelate_tpu import eigmix

    res = eigmix(hapmap, sample_id=hapmap.sample_id[:90], eigen_cnt=0,
                 ibdmat=True, missing_rate=np.nan)
    np.testing.assert_allclose(res.ibd, golden["EIGMIX"], rtol=1e-8,
                               atol=1e-9)


def test_diss_sanity(hapmap):
    from snprelate_tpu import diss

    res = diss(hapmap, sample_id=hapmap.sample_id[:40])
    d = res.diss
    assert np.allclose(d, d.T)
    assert np.isfinite(d).all()
    assert (d >= 0).all()


def test_pca_corr_loading_sampload_golden(hapmap, golden):
    """test_rel.R:128-189 — corr (eig 1:2), snploading (8 comps, 3 d.p.),
    sample-loading projection onto samples[:100] (4 d.p.). Eigenvector signs
    are solver-dependent; flips are resolved per component and applied
    consistently across all three outputs."""
    from snprelate_tpu import pca, pca_corr, pca_snp_loading, pca_samp_loading

    res = pca(hapmap, sample_id=hapmap.sample_id[:90], need_genmat=True,
              eigen_cnt=8, missing_rate=np.nan)
    g = golden["PCA"]

    load = pca_snp_loading(res, hapmap)
    # per-component sign flips vs golden
    flips = np.ones(8)
    for k in range(8):
        a, b = load.snploading[k], g["snploading"][k]
        flips[k] = 1.0 if np.nansum(np.abs(a - b)) <= \
            np.nansum(np.abs(a + b)) else -1.0
    np.testing.assert_allclose(
        np.round(load.snploading * flips[:, None], 3), g["snploading"],
        rtol=0, atol=0.00101)

    corr = pca_corr(res, hapmap, eig_which=[1, 2])
    assert corr.snpcorr.shape == (2, 9088)
    mine = np.round(corr.snpcorr * flips[:2, None], 3)
    both = np.isfinite(mine) & np.isfinite(g["corr"])
    assert np.isnan(mine).sum() == np.isnan(g["corr"]).sum()
    np.testing.assert_allclose(mine[both], g["corr"][both], rtol=0,
                               atol=0.00101)

    sl = pca_samp_loading(load, hapmap, sample_id=hapmap.sample_id[:100])
    np.testing.assert_allclose(
        np.round(sl.eigenvect * flips[None, :], 4), g["samploading"],
        rtol=0, atol=0.000101)


def test_randomized_pca_matches_exact(hapmap):
    """Randomized PCA (CRandomPCA analog) must recover the exact top
    components (test: subspace iteration convergence on hapmap[:90])."""
    from snprelate_tpu import pca

    ex = pca(hapmap, sample_id=hapmap.sample_id[:90], eigen_cnt=8,
             missing_rate=np.nan)
    rd = pca(hapmap, sample_id=hapmap.sample_id[:90], algorithm="randomized",
             eigen_cnt=8, iter_num=12, seed=7, missing_rate=np.nan)
    np.testing.assert_allclose(rd.eigenval[:4], ex.eigenval[:4], rtol=5e-3)
    for k in range(4):
        c = abs(np.dot(rd.eigenvect[:, k], ex.eigenvect[:, k]) /
                (np.linalg.norm(rd.eigenvect[:, k])
                 * np.linalg.norm(ex.eigenvect[:, k])))
        assert c > 0.999, (k, c)
    np.testing.assert_allclose(rd.TraceXTX, ex.TraceXTX, rtol=1e-9)


def test_randomized_pca_cached_equals_streamed(hapmap, monkeypatch):
    """The HBM-cached device-resident path must reproduce the host-streamed
    path (same math, same chunk order)."""
    from snprelate_tpu import pca

    kw = dict(sample_id=hapmap.sample_id[:90], algorithm="randomized",
              eigen_cnt=6, iter_num=4, seed=11, missing_rate=np.nan)
    cached = pca(hapmap, **kw)
    monkeypatch.setenv("SNPRELATE_TPU_HBM_CACHE", "0")  # force streaming
    streamed = pca(hapmap, **kw)
    # the cached path uses a QR span basis + Gram factorization (same
    # subspace math as the streamed SVD; agreement to f64 Gram precision)
    np.testing.assert_allclose(cached.eigenval[:6], streamed.eigenval[:6],
                               rtol=1e-8)
    np.testing.assert_allclose(np.abs(cached.eigenvect),
                               np.abs(streamed.eigenvect), atol=1e-6)
    assert cached.TraceXTX == streamed.TraceXTX


def test_pca_corr_outgds(hapmap, tmp_path):
    """pca_corr(outgds=) writes the packedreal16 correlation artifact
    (R/PCA.R:151-163) that reads back to 1e-4."""
    from snprelate_tpu import pca, pca_corr
    from snprelate_tpu.io.gds import open_gds

    p = pca(hapmap, sample_id=hapmap.sample_id[:60], eigen_cnt=4,
            missing_rate=np.nan, eigen_method="DSPEV")
    out = str(tmp_path / "corr.gds")
    res = pca_corr(p, hapmap, snp_id=hapmap.snp_id[:500], outgds=out)
    f = open_gds(out)
    # artifact is per-SNP streamed: C-order (n_snp, n_eig)
    stored = np.asarray(f.index("correlation").read()).T
    got = np.where(np.isnan(res.snpcorr), np.nan, res.snpcorr)
    assert stored.shape == res.snpcorr.shape
    mask = ~np.isnan(got)
    np.testing.assert_allclose(stored[mask], got[mask], atol=5.1e-5)
    assert np.all(np.isnan(stored[~mask]))
    assert list(f.index("sample.id").read()) == list(p.sample_id)


def test_use_matrix_packed_equivalence(hapmap):
    """useMatrix=TRUE analog: packed-triangle outputs equal the dense
    outputs (the reference's dspMatrix equivalence contract,
    test_rel.R:111-115, 242-260)."""
    import snprelate_tpu as sr
    from snprelate_tpu import PackedSymmetric

    sid = hapmap.sample_id[:40]
    kw = dict(sample_id=sid, missing_rate=np.nan)

    d = sr.ibs(hapmap, **kw)
    p = sr.ibs(hapmap, use_matrix=True, **kw)
    assert isinstance(p.ibs, PackedSymmetric)
    assert p.ibs.packed.shape == (40 * 41 // 2,)
    np.testing.assert_array_equal(p.ibs.full(), d.ibs)
    # indexing matches the dense matrix (both triangles)
    np.testing.assert_array_equal(p.ibs[3, 7], d.ibs[3, 7])
    np.testing.assert_array_equal(p.ibs[7, 3], d.ibs[7, 3])
    np.testing.assert_array_equal(p.ibs.diagonal(), np.diag(d.ibs))

    d = sr.ibd_king(hapmap, **kw)
    p = sr.ibd_king(hapmap, use_matrix=True, **kw)
    np.testing.assert_array_equal(p.kinship.full(), d.kinship)
    np.testing.assert_array_equal(p.IBS0.full(), d.IBS0)
    # ibd_selection accepts packed results (reference handles dspMatrix)
    sel_d = sr.ibd_selection(d, kinship_cutoff=0.25)
    sel_p = sr.ibd_selection(p, kinship_cutoff=0.25)
    assert list(sel_d["ID1"]) == list(sel_p["ID1"])
    np.testing.assert_array_equal(sel_d["kinship"], sel_p["kinship"])

    d = sr.ibd_mom(hapmap, kinship=True, **kw)
    p = sr.ibd_mom(hapmap, kinship=True, use_matrix=True, **kw)
    np.testing.assert_array_equal(p.k0.full(), d.k0)
    np.testing.assert_array_equal(p.k1.full(), d.k1)
    np.testing.assert_array_equal(p.kinship.full(), d.kinship)

    d = sr.grm(hapmap, **kw)
    p = sr.grm(hapmap, use_matrix=True, **kw)
    np.testing.assert_array_equal(p.grm.full(), d.grm)

    d = sr.indiv_beta(hapmap, **kw)
    p = sr.indiv_beta(hapmap, use_matrix=True, **kw)
    np.testing.assert_array_equal(p.beta.full(), d.beta)
