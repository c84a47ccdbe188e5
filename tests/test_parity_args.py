"""Argument-level parity behaviors added in round 2:

- get_geno(snpfirstdim=None) = the reference's snpfirstdim=NA (storage
  orientation; hapmap_geno.gds is sample.order -> sample-major).
- merge_grm/save_grm out_prec ("single") and out_compress ("LZMA_RA",
  "ZIP", "") roundtrips (snpgdsMergeGRM's out.prec/out.compress args).
- eigmix(sample_block=) / eigmix(mesh=) equal the single-device result.
"""

import numpy as np
import pytest


def test_get_geno_storage_order_default(hapmap):
    from snprelate_tpu import get_geno

    g_auto = get_geno(hapmap, sample_id=hapmap.sample_id[:10])
    g_snp = get_geno(hapmap, sample_id=hapmap.sample_id[:10],
                     snpfirstdim=True)
    # hapmap_geno.gds carries the sample.order attribute
    assert hapmap.source_snpfirstdim is False
    assert g_auto.shape == (10, hapmap.n_snp)
    np.testing.assert_array_equal(g_auto, g_snp.T)


@pytest.mark.parametrize("prec,compress", [
    ("double", "LZMA_RA"), ("single", "ZIP"), ("double", "")])
def test_grm_out_prec_compress_roundtrip(hapmap, tmp_path, prec, compress):
    from snprelate_tpu import grm
    from snprelate_tpu.models.grm import load_grm

    fn = str(tmp_path / "g.gds")
    r = grm(hapmap, sample_id=hapmap.sample_id[:30], method="GCTA",
            out_fn=fn, out_prec=prec, out_compress=compress)
    back, av = load_grm(fn)
    tol = 1e-6 if prec == "single" else 1e-12
    np.testing.assert_allclose(back.grm, r.grm, rtol=tol, atol=tol)
    assert back.method == "GCTA"
    np.testing.assert_array_equal(back.sample_id, r.sample_id)


def test_merge_grm_out_args(hapmap, tmp_path):
    from snprelate_tpu import grm, merge_grm
    from snprelate_tpu.models.grm import load_grm

    sid = hapmap.sample_id[:25]
    snps = hapmap.snp_id
    half = len(snps) // 2
    f1, f2 = str(tmp_path / "a.gds"), str(tmp_path / "b.gds")
    grm(hapmap, sample_id=sid, snp_id=snps[:half], out_fn=f1,
        missing_rate=np.nan)
    grm(hapmap, sample_id=sid, snp_id=snps[half:], out_fn=f2,
        missing_rate=np.nan)
    out = str(tmp_path / "m.gds")
    merge_grm([f1, f2], out_fn=out, out_prec="single",
              out_compress="LZMA_RA")
    merged, _ = load_grm(out)
    ref = merge_grm([f1, f2])
    np.testing.assert_allclose(merged.grm, ref.grm, rtol=1e-6, atol=1e-6)


def test_ibd_king_sample_block(hapmap):
    from snprelate_tpu import ibd_king

    sid = hapmap.sample_id[:35]
    for t in ("KING-robust", "KING-homo"):
        base = ibd_king(hapmap, sample_id=sid, type=t)
        blk = ibd_king(hapmap, sample_id=sid, type=t, sample_block=16)
        if t == "KING-robust":
            np.testing.assert_allclose(blk.kinship, base.kinship,
                                       rtol=1e-12, equal_nan=True)
            np.testing.assert_allclose(blk.IBS0, base.IBS0,
                                       rtol=1e-12, equal_nan=True)
        else:
            np.testing.assert_allclose(blk.k0, base.k0, rtol=1e-12,
                                       equal_nan=True)
            np.testing.assert_allclose(blk.k1, base.k1, rtol=1e-12,
                                       equal_nan=True)


def test_eigmix_sample_block_and_mesh(hapmap):
    import jax
    from jax.sharding import Mesh
    from snprelate_tpu import eigmix

    sid = hapmap.sample_id[:40]
    base = eigmix(hapmap, sample_id=sid, ibdmat=True, eigen_cnt=0)
    blk = eigmix(hapmap, sample_id=sid, ibdmat=True, eigen_cnt=0,
                 sample_block=17)
    np.testing.assert_allclose(blk.ibd, base.ibd, rtol=1e-10, atol=1e-12)

    mesh = Mesh(np.array(jax.devices("cpu")[:4]).reshape(4, 1),
                ("data", "samp"))
    sh = eigmix(hapmap, sample_id=sid, ibdmat=True, eigen_cnt=0, mesh=mesh)
    np.testing.assert_allclose(sh.ibd, base.ibd, rtol=1e-10, atol=1e-12)


def test_with_id_false_drops_ids(hapmap):
    from snprelate_tpu import grm, indiv_beta, ld_mat, pca, pca_corr

    sid = hapmap.sample_id[:20]
    r = grm(hapmap, sample_id=sid, with_id=False)
    assert r.sample_id is None and r.snp_id is None
    b = indiv_beta(hapmap, sample_id=sid, with_id=False)
    assert b.sample_id is None and b.snp_id is None
    m = ld_mat(hapmap, snp_id=hapmap.snp_id[:50], slide=-1, with_id=False)
    assert m.sample_id is None and m.snp_id is None
    p = pca(hapmap, sample_id=sid, eigen_cnt=4)
    c = pca_corr(p, hapmap, snp_id=hapmap.snp_id[:50], with_id=False)
    assert c.sample_id is None and c.snp_id is None


def test_create_geno_set_file_to_file(hapmap, tmp_path):
    import numpy as np
    from snprelate_tpu import create_geno_set, open_snp_gds
    from snprelate_tpu.io.store import example_filename

    dest = str(tmp_path / "subset.gds")
    sub = create_geno_set(example_filename(),
                          sample_id=hapmap.sample_id[:12],
                          snp_id=hapmap.snp_id[:300], dest_fn=dest,
                          snpfirstdim=True)
    back = open_snp_gds(dest)
    np.testing.assert_array_equal(back.sample_id, sub.sample_id)
    np.testing.assert_array_equal(back.snp_id, sub.snp_id)
    np.testing.assert_array_equal(back.geno(), sub.geno())


def test_combine_geno_out_fn_and_paths(hapmap, tmp_path):
    import numpy as np
    from snprelate_tpu import combine_geno, create_geno_set, open_snp_gds

    a = str(tmp_path / "a.gds")
    b = str(tmp_path / "b.gds")
    create_geno_set(hapmap, sample_id=hapmap.sample_id[:8],
                    snp_id=hapmap.snp_id[:200], dest_fn=a)
    create_geno_set(hapmap, sample_id=hapmap.sample_id[8:16],
                    snp_id=hapmap.snp_id[:200], dest_fn=b)
    out = str(tmp_path / "c.gds")
    merged = combine_geno([a, b], out_fn=out)  # GDS paths in, GDS out
    back = open_snp_gds(out)
    assert merged.n_samp == 16
    np.testing.assert_array_equal(back.geno(), merged.geno())


def test_transpose_rewrites_gds_orientation(hapmap, tmp_path):
    import numpy as np
    from snprelate_tpu import create_geno_set, open_snp_gds, transpose

    fn = str(tmp_path / "t.gds")
    sub = create_geno_set(hapmap, sample_id=hapmap.sample_id[:10],
                          snp_id=hapmap.snp_id[:100], dest_fn=fn)
    assert open_snp_gds(fn).source_snpfirstdim is False
    transpose(fn, snpfirstdim=True)
    back = open_snp_gds(fn)
    assert back.source_snpfirstdim is True
    np.testing.assert_array_equal(back.geno(), sub.geno())
    # in-memory: identity (store is always snp-major)
    assert transpose(sub) is sub


def test_admix_table_reference_shape(hapmap):
    import math
    from snprelate_tpu import admix_table

    prop = np.array([[0.9, 0.1], [0.8, 0.2], [0.2, 0.8], [0.1, 0.9]])
    group = np.array(["a", "a", "b", "b"], object)
    tables = admix_table(prop, group)
    assert len(tables) == 2  # one per ancestral component
    t0 = {r["group"]: r for r in tables[0]}
    assert t0["a"]["num"] == 2 and math.isclose(t0["a"]["mean"], 0.85)
    assert math.isclose(t0["b"]["max"], 0.2)
    srt = admix_table(prop, group, sort=True)
    means0 = [r["mean"] for r in srt[0]]
    assert means0 == sorted(means0, reverse=True)


def test_num_thread_accepted_everywhere(hapmap):
    """num.thread is part of every reference estimator signature
    (R/PCA.R:22, R/IBD.R:543, ...): accepted for drop-in script
    compatibility, results identical (the determinism contract replaces
    thread-count invariance, test_rel.R:107-120)."""
    import snprelate_tpu as sr

    sid = hapmap.sample_id[:20]
    a = sr.ibs(hapmap, sample_id=sid)
    b = sr.snpgdsIBS(hapmap, sample_id=sid, num_thread=4)
    np.testing.assert_array_equal(a.ibs, b.ibs)
    p = sr.snpgdsPCA(hapmap, sample_id=sid, eigen_cnt=2, num_thread=2)
    assert p.eigenval.shape[0] >= 2
