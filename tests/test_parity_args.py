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
