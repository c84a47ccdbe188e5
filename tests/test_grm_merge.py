"""GRM merge metamorphic tests (reference: inst/unitTests/test_GRM.R):
merging per-subset GRMs over no-missing SNPs equals the whole-set GRM."""

import numpy as np


def _split_snps(hapmap):
    from snprelate_tpu import snp_rate_freq

    mr = snp_rate_freq(hapmap)["MissingRate"]
    snpid = hapmap.snp_id[mr == 0]
    return snpid, snpid[:1000], snpid[1000:3000], snpid[3000:]


def test_merge_gcta(hapmap, tmp_path):
    from snprelate_tpu import grm
    from snprelate_tpu.models.grm import merge_grm

    snpid, s1, s2, s3 = _split_snps(hapmap)
    fns = []
    for i, s in enumerate([s1, s2, s3]):
        fn = str(tmp_path / f"tmp{i+1}.gds")
        grm(hapmap, snp_id=s, method="GCTA", out_fn=fn)
        fns.append(fn)
    out = str(tmp_path / "merged.gds")
    merge_grm(fns, out)

    full = grm(hapmap, method="GCTA", snp_id=snpid)
    from snprelate_tpu.models.grm import load_grm
    merged, _ = load_grm(out)
    np.testing.assert_allclose(merged.grm, full.grm, rtol=1e-9, atol=1e-12)
    assert np.array_equal(merged.snp_id, full.snp_id)


def test_merge_indivbeta(hapmap, tmp_path):
    from snprelate_tpu import grm
    from snprelate_tpu.models.grm import merge_grm

    snpid, s1, s2, s3 = _split_snps(hapmap)
    fns = []
    for i, s in enumerate([s1, s2, s3]):
        fn = str(tmp_path / f"b{i+1}.gds")
        grm(hapmap, snp_id=s, method="IndivBeta", out_fn=fn)
        fns.append(fn)
    full = grm(hapmap, method="IndivBeta", snp_id=snpid)
    merged = merge_grm(fns)
    np.testing.assert_allclose(merged.grm, full.grm, rtol=1e-8, atol=1e-10)


def test_grm_weighted_is_eigmix(hapmap):
    """method="Weighted" = EIGMIX-based GRM (R/IBD.R:552-556)."""
    import numpy as np
    from snprelate_tpu import grm

    kw = dict(sample_id=hapmap.sample_id[:40], missing_rate=np.nan)
    w = grm(hapmap, method="Weighted", **kw)
    e = grm(hapmap, method="EIGMIX", **kw)
    assert w.method == "EIGMIX"
    np.testing.assert_array_equal(w.grm, e.grm)


def test_merge_stream_equals_dense(hapmap, tmp_path):
    """File->file merge (streamed, O(block x n)) == in-memory merge for
    both the weighted-average family and IndivBeta's re-centering; the
    streamed route must never call load_grm (no densified parts)."""
    from snprelate_tpu import grm
    from snprelate_tpu.models import grm as G

    _, s1, s2, s3 = _split_snps(hapmap)
    for method, tol in (("GCTA", 0), ("IndivBeta", 1e-12)):
        fns = []
        for i, s in enumerate([s1, s2, s3]):
            fn = str(tmp_path / f"{method}{i}.gds")
            grm(hapmap, snp_id=s, method=method, out_fn=fn)
            fns.append(fn)
        parts = []
        for fn in fns:
            r, av = G.load_grm(fn)
            r.avg_val = av
            parts.append(r)
        dense = G.merge_grm(parts)

        out = str(tmp_path / f"{method}_merged.gds")
        orig = G.load_grm
        G.load_grm = lambda fn: (_ for _ in ()).throw(
            AssertionError("streamed merge densified a part"))
        try:
            G.merge_grm(fns, out)
        finally:
            G.load_grm = orig
        merged, av = G.load_grm(out)
        np.testing.assert_allclose(merged.grm, dense.grm,
                                   rtol=tol, atol=tol)
        assert np.array_equal(merged.snp_id, dense.snp_id)
        if method == "IndivBeta":
            assert av is not None and np.isclose(av, dense.avg_val)


def test_merge_stream_weight_modes(hapmap, tmp_path):
    """Boolean drop-weights flow through the streamed route identically
    (the reference's weight=c(TRUE,FALSE,...) subset-removal semantics,
    R/IBD.R:657-668)."""
    from snprelate_tpu import grm
    from snprelate_tpu.models import grm as G

    _, s1, s2, s3 = _split_snps(hapmap)
    fns = []
    for i, s in enumerate([s1, s2, s3]):
        fn = str(tmp_path / f"w{i}.gds")
        grm(hapmap, snp_id=s, method="GCTA", out_fn=fn)
        fns.append(fn)
    w = np.asarray([True, True, False])
    parts = [G.load_grm(fn)[0] for fn in fns]
    dense = G.merge_grm(parts, weight=w)
    out = str(tmp_path / "wm.gds")
    G.merge_grm(fns, out, weight=w)
    merged, _ = G.load_grm(out)
    np.testing.assert_allclose(merged.grm, dense.grm, rtol=0, atol=0)
    assert np.array_equal(merged.snp_id, dense.snp_id)
