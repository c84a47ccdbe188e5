"""Run the golden-value correctness checks ON the TPU backend.

The CPU/x64 test suite establishes exact parity with the reference; this
script validates the TPU execution path: the reduced-basis integer gram
counts must be EXACT (int4 MXU), floating covariance paths must match the
reference within HIGHEST-precision matmul tolerance.

Usage: python tools/verify_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices())
    from snprelate_tpu import ibs, ibd_king, ibd_mom, pca, grm, open_snp_gds
    from snprelate_tpu.io.rdata import parse_rdata

    hap = open_snp_gds("/root/reference/inst/extdata/hapmap_geno.gds")
    valid_dir = "/root/reference/inst/unitTests/valid"

    def gold(name, var):
        d = parse_rdata(f"{valid_dir}/Validate.{name}.RData")[var]
        return d.value if hasattr(d, "value") else d

    ok = True

    # integer-exact analyses
    g = gold("IBS", "ibs")
    r = ibs(hap, sample_id=hap.sample_id[:90], missing_rate=np.nan)
    err = np.nanmax(np.abs(r.ibs - g["ibs"]))
    print(f"IBS max err: {err:.2e} (expect ~0)")
    ok &= err < 1e-12

    g = gold("KING", ".king")[0]
    g = g.value if hasattr(g, "value") else g
    r = ibd_king(hap, sample_id=hap.sample_id[:60], missing_rate=np.nan)
    err = np.nanmax(np.abs(r.kinship - g["kinship"]))
    print(f"KING-robust kinship max err: {err:.2e} (expect ~0)")
    ok &= err < 1e-12

    g = gold("MoM", "ibd")
    g = g.value if hasattr(g, "value") else g
    r = ibd_mom(hap, sample_id=hap.sample_id[:90], missing_rate=np.nan)
    err = max(np.nanmax(np.abs(r.k0 - g["k0"])),
              np.nanmax(np.abs(r.k1 - g["k1"])))
    print(f"MoM k0/k1 max err: {err:.2e} (expect ~0, counts exact)")
    ok &= err < 1e-9

    # floating analyses: f32 HIGHEST-precision chunked accumulation
    g = gold("PCA", ".rv")
    g = g.value if hasattr(g, "value") else g
    r = pca(hap, sample_id=hap.sample_id[:90], need_genmat=True, eigen_cnt=8,
            missing_rate=np.nan)
    rel = np.nanmax(np.abs(r.genmat - g["genmat"])) / \
        np.nanmax(np.abs(g["genmat"]))
    print(f"PCA genmat max rel err: {rel:.2e} (expect <2e-5 in f32-HIGHEST)")
    ok &= rel < 2e-5

    g = gold("EIGMIX", ".eigmix")
    g = np.asarray(g.value if hasattr(g, "value") else g)
    from snprelate_tpu import eigmix
    r = eigmix(hap, sample_id=hap.sample_id[:90], eigen_cnt=0, ibdmat=True,
               missing_rate=np.nan)
    rel = np.nanmax(np.abs(r.ibd - g)) / np.nanmax(np.abs(g))
    print(f"EIGMIX ibd max rel err: {rel:.2e} (expect <2e-5)")
    ok &= rel < 2e-5

    r = grm(hap, sample_id=hap.sample_id[:60], method="GCTA")
    print(f"GRM GCTA finite: {np.isfinite(r.grm).all()}, "
          f"diag mean {np.diag(r.grm).mean():.4f}")
    ok &= bool(np.isfinite(r.grm).all())

    # large-N paths on the TPU: row-tiled GRM and streaming KING must match
    # their HBM-resident counterparts on real hardware
    rt = grm(hap, sample_id=hap.sample_id[:60], method="GCTA",
             sample_block=128)
    rel = np.nanmax(np.abs(rt.grm - r.grm)) / np.nanmax(np.abs(r.grm))
    print(f"row-tiled GRM vs full max rel err: {rel:.2e} (expect <1e-6)")
    ok &= rel < 1e-6

    from snprelate_tpu import ibd_king, ibd_selection, king_ibd_selection
    kfull = ibd_king(hap, type="KING-robust", missing_rate=np.nan,
                     remove_monosnp=False)
    sel = ibd_selection(kfull, kinship_cutoff=0.25)
    stream = king_ibd_selection(hap, kinship_cutoff=0.25,
                                missing_rate=np.nan, remove_monosnp=False,
                                sample_block=128)
    same = sorted(zip(sel["ID1"], sel["ID2"])) == \
        sorted(zip(stream["ID1"], stream["ID2"]))
    print(f"streaming KING pairs: {len(stream['ID1'])} "
          f"(full-path {len(sel['ID1'])}, identical={same})")
    ok &= same

    # serving path: the rectangular cross engine must be integer-exact vs
    # the symmetric engine on the MXU (query rows = first 6 cohort rows)
    from snprelate_tpu import get_geno, king_cross
    sid = hap.sample_id[:40].tolist()
    qg = get_geno(hap, sample_id=sid[:6], snpfirstdim=False)
    qg = np.where(np.isnan(qg), 3, qg).astype(np.uint8)
    kx = king_cross(hap, qg, sample_id=sid, autosome_only=False,
                    remove_monosnp=False, missing_rate=np.nan)
    ksym = ibd_king(hap, sample_id=sid, autosome_only=False,
                    remove_monosnp=False, missing_rate=np.nan)
    off = ~np.eye(40, dtype=bool)[:6]  # self-pairs: symmetric diag is NaN
    err = np.nanmax(np.abs(np.where(off, kx.kinship - ksym.kinship[:6], 0)))
    print(f"cross-engine kinship vs symmetric max err: {err:.2e} "
          f"(expect ~0, integer counters)")
    ok &= err < 1e-12

    # multi-host tile partition on the chip: two rank runs + assembly
    # must reproduce the plain super-tile GRM exactly
    import tempfile

    from snprelate_tpu import grm as grm_fn
    with tempfile.TemporaryDirectory() as td:
        ck = str(td) + "/grid"
        base = grm_fn(hap, snp_id=hap.snp_id[:2000], method="GCTA",
                      tiles=True, tile_group=128, missing_rate=np.nan)
        for rank in (1, 0):
            assert grm_fn(hap, snp_id=hap.snp_id[:2000], method="GCTA",
                          tiles=True, tile_group=128, checkpoint=ck,
                          missing_rate=np.nan,
                          tile_rank=(rank, 2)) is None
        asm = grm_fn(hap, snp_id=hap.snp_id[:2000], method="GCTA",
                     tiles=True, tile_group=128, checkpoint=ck,
                     missing_rate=np.nan)
    trk = bool(np.array_equal(asm.grm, base.grm, equal_nan=True))
    print(f"tile_rank 2-rank GRM == plain super-tile: {trk}")
    ok &= trk

    print("TPU VERIFY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
