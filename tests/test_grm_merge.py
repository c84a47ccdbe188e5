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
