"""Worker for the 4-process jax.distributed test: one of N processes,
each owning 2 virtual CPU devices, runs the SUPER-TILE engines and the
KING screens over the global mesh (mesh= column-shards every tile/strip
across all 2N devices, so per-tile outputs span the process boundary and
exercise host_read's all-gather materialization)."""

import sys


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_enable_x64", True)

    from snprelate_tpu.parallel.distributed import (global_mesh,
                                                    init_distributed)

    init_distributed(coordinator_address=f"localhost:{port}",
                     num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc

    import numpy as np

    from snprelate_tpu.io.store import create_geno
    from snprelate_tpu.ops.tiles import (eigmix_parts_tiled,
                                         grm_tiled, pair_counts_tiled)
    from snprelate_tpu.workspace import init_workspace

    # identical synthetic data on every process (same seed); two planted
    # twin pairs, one crossing a tile boundary at group=128
    rng = np.random.default_rng(11)
    n_snp, n_samp = 600, 320
    g = rng.choice([0, 1, 2, 3], size=(n_snp, n_samp),
                   p=[0.35, 0.3, 0.3, 0.05]).astype(np.uint8)
    g[:, 200] = g[:, 5]
    g[:, 11] = g[:, 10]
    data = create_geno(g, sample_id=[f"s{i}" for i in range(n_samp)],
                       snp_id=np.arange(n_snp),
                       snp_position=np.arange(n_snp) * 50,
                       snp_chromosome=np.ones(n_snp, np.int32))
    ws, _ = init_workspace(data, autosome_only=False, remove_monosnp=False,
                           missing_rate=np.nan, verbose=False)

    mesh = global_mesh(n_samp_axis=2)

    # super-tile engines, every tile column-sharded across the 4 processes
    grm = grm_tiled(ws, group=128, chunk=128, mesh=mesh)
    counts = pair_counts_tiled(ws, group=128, chunk=128, mesh=mesh)
    num, wvg, het = eigmix_parts_tiled(ws, group=128, chunk=128, mesh=mesh)
    from snprelate_tpu.ops.tiles import king_homo_parts_tiled

    khc, kwaf, kwaf2 = king_homo_parts_tiled(ws, group=128, chunk=128,
                                             mesh=mesh)

    # row-strip engines: every strip's sample columns sharded across the
    # processes (host_read all-gathers each yielded strip)
    from snprelate_tpu.ops.pairwise import (basis_gram_rows,
                                            gcta_parts_rows, pca_cov_rows)

    strips = {}
    rows_counts = np.empty((5, n_samp, n_samp), np.int64)
    for r0, nr, blk in basis_gram_rows(ws, sample_block=128, chunk=128,
                                       mesh=mesh):
        rows_counts[:, r0:r0 + nr] = blk
    strips["rows_counts"] = rows_counts
    rows_cov = np.empty((n_samp, n_samp))
    rows_vgr = np.empty((n_samp, n_samp), np.int64)
    for r0, nr, cov_b, vgr_b, _nl in gcta_parts_rows(
            ws, sample_block=128, chunk=128, mesh=mesh):
        rows_cov[r0:r0 + nr] = cov_b
        rows_vgr[r0:r0 + nr] = vgr_b
    strips["rows_cov"] = rows_cov
    strips["rows_vgr"] = rows_vgr
    rows_pca = np.empty((n_samp, n_samp))
    for r0, nr, cov_b in pca_cov_rows(ws, sample_block=128, chunk=128,
                                      mesh=mesh):
        rows_pca[r0:r0 + nr] = cov_b
    strips["rows_pca"] = rows_pca

    # loadings family (mesh= batches chunks across every device)
    from snprelate_tpu.models.pca import pca
    from snprelate_tpu.models.pca_ext import pca_corr, pca_snp_loading

    pr = pca(data, eigen_cnt=4, autosome_only=False, remove_monosnp=False,
             missing_rate=float("nan"))
    strips["corr"] = pca_corr(pr, data, snp_id=np.arange(200),
                              mesh=mesh).snpcorr
    strips["snpload"] = pca_snp_loading(pr, data, mesh=mesh).snploading

    # KING screens: row-strip route and super-tile route
    from snprelate_tpu.models.king import king_ibd_selection

    def table(d):
        o = np.lexsort((np.asarray(d["ID2"], object),
                        np.asarray(d["ID1"], object)))
        return (np.asarray(d["ID1"], object)[o].astype(str),
                np.asarray(d["ID2"], object)[o].astype(str),
                np.asarray(d["IBS0"], np.float64)[o],
                np.asarray(d["kinship"], np.float64)[o])

    strip = king_ibd_selection(data, 0.2, autosome_only=False,
                               remove_monosnp=False,
                               missing_rate=float("nan"), tiles=False,
                               sample_block=128, chunk=128, mesh=mesh)
    tiled = king_ibd_selection(data, 0.2, autosome_only=False,
                               remove_monosnp=False,
                               missing_rate=float("nan"), tiles=True,
                               tile_group=128, chunk=128, mesh=mesh)

    if pid == 0:
        s1, s2, sI, sk = table(strip)
        t1, t2, tI, tk = table(tiled)
        np.savez(out, grm=grm, counts=np.stack(counts.base()),
                 num=num, wvg=wvg, het=het,
                 khc=np.stack(khc.base()), kwaf=kwaf, kwaf2=kwaf2,
                 strip_id1=s1, strip_id2=s2, strip_ibs0=sI, strip_kin=sk,
                 tile_id1=t1, tile_id2=t2, tile_ibs0=tI, tile_kin=tk,
                 **strips)
    import jax.experimental.multihost_utils as mh

    mh.sync_global_devices("done")


if __name__ == "__main__":
    main()
