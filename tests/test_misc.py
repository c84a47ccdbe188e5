"""Cluster/admixture/pair-score/sliding-window/allele utilities."""

import numpy as np


def test_hcluster_cuttree(hapmap):
    from snprelate_tpu import ibs, hcluster, cut_tree

    r = ibs(hapmap, sample_id=hapmap.sample_id[:60])
    hc = hcluster(r)
    assert hc.merge.shape == (59, 2)
    ct = cut_tree(hc, n_perm=100, seed=0)
    # 60 HapMap samples = YRI + CEU+... should split into >= 2 groups
    groups = set(ct.samp_group.tolist())
    assert len(groups) >= 2
    pops = hapmap.sample_annot["pop.group"][:60]
    # group labels should correlate strongly with population labels
    main = [g for g in groups if g.startswith("G")]
    if len(main) >= 2:
        # continental ancestry must never mix within a main cluster
        # (JPT+HCB clustering together is expected)
        for g in main:
            in_g = set(pops[ct.samp_group == g].tolist())
            assert not ({"YRI"} & in_g and in_g - {"YRI"}), in_g


def test_admix_prop(hapmap):
    from snprelate_tpu import pca, admix_prop

    res = pca(hapmap, sample_id=hapmap.sample_id[:90], eigen_cnt=4,
              missing_rate=np.nan)
    pops = hapmap.sample_annot["pop.group"][:90]
    groups = {p: hapmap.sample_id[:90][pops == p].tolist()
              for p in np.unique(pops)}
    if len(groups) >= 2:
        prop = admix_prop(res, groups)
        assert prop.shape == (90, len(groups))
        np.testing.assert_allclose(prop.sum(1), 1.0, atol=1e-9)
        b = admix_prop(res, groups, bound=True)
        assert (b >= 0).all() and (b <= 1).all()


def test_pair_score(hapmap):
    from snprelate_tpu import pair_score

    s1 = hapmap.sample_id[:5]
    s2 = hapmap.sample_id[5:10]
    r = pair_score(hapmap, s1, s2, method="IBS", type="per.pair")
    assert len(r["score"]["Avg"]) == 5
    assert ((r["score"]["Avg"] >= 0) & (r["score"]["Avg"] <= 2)).all()
    m = pair_score(hapmap, s1, s2, method="GVH", type="matrix")
    assert m["score"].shape[0] == 5
    p = pair_score(hapmap, s1, s2, method="GVH.major", type="per.snp")
    assert p["score"].shape[0] == 3


def test_pair_score_vs_manual(hapmap):
    from snprelate_tpu import pair_score
    from snprelate_tpu.workspace import init_workspace

    s1, s2 = [hapmap.sample_id[0]], [hapmap.sample_id[1]]
    r = pair_score(hapmap, s1, s2, method="IBS", type="per.pair")
    ws, _ = init_workspace(hapmap, sample_id=hapmap.sample_id[:2],
                           autosome_only=False, remove_monosnp=False)
    g = ws.geno()
    ok = (g[:, 0] < 3) & (g[:, 1] < 3)
    ibs_scores = 2 - np.abs(g[ok, 0].astype(int) - g[ok, 1].astype(int))
    np.testing.assert_allclose(r["score"]["Avg"][0], ibs_scores.mean())
    assert r["score"]["Num"][0] == ok.sum()


def test_sliding_window_freq(hapmap):
    from snprelate_tpu import sliding_window

    res = sliding_window(hapmap, "snpgdsSNPRateFreq", winsize=500,
                         shift=250, unit="locus",
                         sample_id=hapmap.sample_id[:30],
                         snp_id=hapmap.snp_id[:1000])
    assert len(res) >= 1
    first = next(iter(res.values()))
    assert len(first["val"]) == len(first["start"])


def test_allele_switch(hapmap):
    from snprelate_tpu import create_geno_set, allele_switch

    d = create_geno_set(hapmap, sample_id=hapmap.sample_id[:10],
                        snp_id=hapmap.snp_id[:50])
    g0 = d.geno()
    want = []
    for i, al in enumerate(d.snp_allele):
        a, b = str(al).split("/")
        want.append(b if i % 2 == 0 else a)  # switch every other SNP
    flags = allele_switch(d, want)
    sw = np.asarray([f is True for f in flags])
    assert sw.sum() > 0
    g1 = d.geno()
    v = g0 < 3
    assert np.array_equal(g1[sw][v[sw]], 2 - g0[sw][v[sw]])
    assert np.array_equal(g1[~sw], g0[~sw])


def test_combine_geno(hapmap):
    from snprelate_tpu import create_geno_set, combine_geno

    d1 = create_geno_set(hapmap, sample_id=hapmap.sample_id[:10],
                         snp_id=hapmap.snp_id[:200])
    d2 = create_geno_set(hapmap, sample_id=hapmap.sample_id[10:20],
                         snp_id=hapmap.snp_id[100:300])
    m = combine_geno([d1, d2])
    assert m.n_samp == 20
    assert m.n_snp == 100  # overlap 100..200
    g = m.geno()
    np.testing.assert_array_equal(
        g[:, :10], hapmap.geno(np.arange(100, 200), np.arange(10)))


def test_snp_list_intersect(hapmap):
    from snprelate_tpu import snp_list, snp_list_intersect, create_geno_set

    d1 = create_geno_set(hapmap, snp_id=hapmap.snp_id[:300])
    d2 = create_geno_set(hapmap, snp_id=hapmap.snp_id[150:450])
    l1, l2 = snp_list(d1), snp_list(d2)
    rv = snp_list_intersect(l1, l2)
    assert len(rv["idx1"]) == 150
    # identical lists: never a flip (ambiguous A/T-C/G pairs set bit2)
    assert all(f is not None and (f & 1) == 0 for f in rv["flag2"])


def test_draw_tree_parity(hapmap):
    """snpgdsDrawTree options: z-score plot, kinship axis, group shadows,
    merge Z labels (R/AllUtilities.R:1761-1896)."""
    import snprelate_tpu as sr

    ids = np.asarray(hapmap.sample_id[:60], object)
    res = sr.ibs(hapmap, sample_id=ids, missing_rate=np.nan,
                 remove_monosnp=False)
    hc = sr.hcluster(res)
    ct = sr.cut_tree(hc, n_perm=100, seed=1, label_H=True)
    ax = sr.draw_tree(ct, hc, y_label_kinship=True, labels=["a", "b"])
    assert ax is not None
    # annotations exist for merges above threshold
    n_above = int((ct.merge["z"] >= ct.z_threshold).sum())
    texts = [t for t in ax.texts]
    assert len(texts) >= min(n_above, 1)
    ax2 = sr.draw_tree(ct, type="z-score")
    assert ax2.get_ylabel() == "Z score"
    # hcluster-only call still draws
    ax3 = sr.draw_tree(hc)
    assert ax3 is not None


def test_profiler_trace(tmp_path, hapmap):
    """utils.profile.trace writes a jax.profiler trace; the env hook is
    active through the CLI (SNPRELATE_TPU_TRACE)."""
    import os

    from snprelate_tpu import ibs
    from snprelate_tpu.utils import profile

    td = str(tmp_path / "trace")
    with profile.trace(td):
        with profile.trace(td):  # nested -> no-op, no error
            ibs(hapmap, sample_id=hapmap.sample_id[:10])
    found = []
    for root, _dirs, files in os.walk(td):
        found += files
    assert any(f.endswith((".pb", ".json.gz", ".trace.json.gz"))
               or "xplane" in f for f in found), found
