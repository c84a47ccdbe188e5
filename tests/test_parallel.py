"""Multi-device tests on the virtual 8-CPU-device mesh: sharded results must
be identical to single-device (the TPU analog of the reference's
num.thread=1 vs 2 determinism contract, test_rel.R:107-120)."""

import numpy as np


def test_sharded_pair_counts_match(hapmap):
    import jax
    from snprelate_tpu.workspace import init_workspace
    from snprelate_tpu.ops.pairwise import pair_counts
    from snprelate_tpu.parallel.mesh import make_mesh, sharded_pair_counts

    assert len(jax.devices()) == 8
    ws, _ = init_workspace(hapmap, sample_id=hapmap.sample_id[:60])
    base = pair_counts(ws, chunk=1024).base()
    for ndata, nsamp in [(8, 1), (4, 2), (2, 4)]:
        mesh = make_mesh(ndata, nsamp)
        c = sharded_pair_counts(ws, mesh, chunk=1024)
        for got, want in zip(c.base(), base):
            assert np.array_equal(got, want), (ndata, nsamp)


def test_sharded_cov_matches(hapmap):
    from snprelate_tpu.workspace import init_workspace
    from snprelate_tpu.ops.pairwise import pca_covariance
    from snprelate_tpu.parallel.mesh import make_mesh, sharded_pca_covariance

    ws, _ = init_workspace(hapmap, sample_id=hapmap.sample_id[:60])
    base = pca_covariance(ws, chunk=1024)
    mesh = make_mesh(4, 2)
    cov = sharded_pca_covariance(ws, mesh, chunk=1024)
    np.testing.assert_allclose(cov, base, rtol=1e-12, atol=1e-12)


def test_pca_grm_mesh_api(hapmap):
    """pca(mesh=) and grm(mesh=) must equal the single-device results."""
    import numpy as np
    from snprelate_tpu import grm, pca
    from snprelate_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4, 2)
    p0 = pca(hapmap, sample_id=hapmap.sample_id[:50], need_genmat=True,
             genmat_only=True)
    p1 = pca(hapmap, sample_id=hapmap.sample_id[:50], need_genmat=True,
             genmat_only=True, mesh=mesh)
    np.testing.assert_allclose(p1.genmat, p0.genmat, rtol=1e-12)
    g0 = grm(hapmap, sample_id=hapmap.sample_id[:50], method="GCTA")
    g1 = grm(hapmap, sample_id=hapmap.sample_id[:50], method="GCTA",
             mesh=mesh)
    np.testing.assert_allclose(g1.grm, g0.grm, rtol=1e-12)


def test_plane_grams_helper(hapmap):
    """plane_grams (full 9-dof joint counts) agrees with the reduced
    4-gram engine on every derived counter — the two independent
    formulations cross-validate each other."""
    import numpy as np
    from snprelate_tpu.ops.pairwise import pair_counts, plane_grams
    from snprelate_tpu.workspace import init_workspace

    ws, _ = init_workspace(hapmap, sample_id=hapmap.sample_id[:60])
    c4 = pair_counts(ws, chunk=1024)
    n_pad = -(-ws.n_samp // 128) * 128
    chunks = [p for p in __import__(
        "snprelate_tpu.parallel.stream", fromlist=["device_chunks"]
    ).device_chunks(ws, 1024, n_pad)]
    C = plane_grams(chunks, n_pad)[:, :, :ws.n_samp, :ws.n_samp]
    assert np.array_equal(C.sum((0, 1)), c4.nvalid)
    assert np.array_equal(C[0, 2] + C[2, 0], c4.ibs0)
    assert np.array_equal(C[0, 0] + C[1, 1] + C[2, 2], c4.ibs2)
    assert np.array_equal(C[1, 1], c4.n11)
    assert np.array_equal(C[1].sum(0), c4.n1_het)
    assert np.array_equal(C[:, 1].sum(0), c4.n2_het)
    assert np.array_equal(C[0, 0] + C[2, 2], c4.both_hom_eq)


def test_sharded_randomized_pca_matches(hapmap):
    """mesh= randomized PCA equals the single-device cached path (same
    subspace math; summation order differs only across devices)."""
    import numpy as np
    from snprelate_tpu import pca
    from snprelate_tpu.parallel.mesh import make_mesh

    kw = dict(sample_id=hapmap.sample_id[:90], algorithm="randomized",
              eigen_cnt=6, iter_num=4, seed=11, missing_rate=np.nan,
              chunk=512)
    base = pca(hapmap, **kw)
    for shape in [(8, 1), (4, 2)]:
        mesh = make_mesh(*shape)
        sh = pca(hapmap, mesh=mesh, **kw)
        np.testing.assert_allclose(sh.eigenval[:6], base.eigenval[:6],
                                   rtol=1e-8)
        np.testing.assert_allclose(np.abs(sh.eigenvect),
                                   np.abs(base.eigenvect), atol=1e-7)
        np.testing.assert_allclose(sh.TraceXTX, base.TraceXTX, rtol=1e-12)


def test_global_mesh_and_init():
    from snprelate_tpu.parallel.distributed import global_mesh, init_distributed

    init_distributed(num_processes=1)  # no-op single process
    mesh = global_mesh(n_samp_axis=2)
    assert mesh.shape["samp"] == 2 and mesh.shape["data"] == 4


def test_sharded_king_screen_matches(hapmap):
    """king_ibd_selection(mesh=) — strip carries column-sharded over all
    mesh devices — equals the single-device streaming path."""
    import numpy as np
    from snprelate_tpu import king_ibd_selection
    from snprelate_tpu.parallel.mesh import make_mesh

    kw = dict(kinship_cutoff=0.2, missing_rate=np.nan,
              remove_monosnp=False, sample_block=128)
    base = king_ibd_selection(hapmap, **kw)

    def key(d):
        return sorted(zip(d["ID1"].tolist(), d["ID2"].tolist(),
                          np.round(d["kinship"], 12).tolist(),
                          np.round(d["IBS0"], 12).tolist()))

    assert len(base["ID1"]) > 0
    for shape in [(8, 1), (4, 2)]:
        mesh = make_mesh(*shape)
        sh = king_ibd_selection(hapmap, mesh=mesh, **kw)
        assert key(sh) == key(base), shape


def test_sharded_row_tiled_grm_matches(hapmap):
    """grm(sample_block=, mesh=) — row tiles with column-sharded strips —
    equals the single-device results for GCTA and Eigenstrat."""
    import numpy as np
    from snprelate_tpu import grm
    from snprelate_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4, 2)
    for method in ("GCTA", "Eigenstrat"):
        base = grm(hapmap, sample_id=hapmap.sample_id[:60], method=method)
        t = grm(hapmap, sample_id=hapmap.sample_id[:60], method=method,
                sample_block=128, mesh=mesh)
        np.testing.assert_allclose(t.grm, base.grm, rtol=1e-10,
                                   err_msg=method)


def test_mesh_on_super_tiles(hapmap):
    """grm(tiles=True, mesh=): column-sharded tile scans over the virtual
    mesh equal the single-device tile and full engines."""
    import numpy as np
    from snprelate_tpu import grm
    from snprelate_tpu.parallel.mesh import make_mesh

    sid = hapmap.sample_id[:60]
    base = grm(hapmap, sample_id=sid, method="GCTA")
    for shape in [(8, 1), (4, 2)]:
        mesh = make_mesh(*shape)
        t = grm(hapmap, sample_id=sid, method="GCTA", sample_block=128,
                tiles=True, tile_group=128, chunk=512, mesh=mesh)
        np.testing.assert_allclose(t.grm, base.grm, rtol=1e-10,
                                   err_msg=str(shape))


def test_mesh_on_loadings_family(hapmap):
    """mesh= on the loadings family (pca_corr / SNP loadings / sample
    projection / EIGMIX loadings, VERDICT r1 #7): sharded == single-device
    bitwise (the same per-chunk kernel runs either way, the batch axis is
    sharded over every mesh device)."""
    import numpy as np
    import snprelate_tpu as sr
    from snprelate_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4, 2)
    sid = hapmap.sample_id[:60]
    p = sr.pca(hapmap, sample_id=sid, eigen_cnt=8)

    c0 = sr.pca_corr(p, hapmap, eig_which=[1, 2, 3], chunk=512)
    c1 = sr.pca_corr(p, hapmap, eig_which=[1, 2, 3], chunk=512, mesh=mesh)
    np.testing.assert_array_equal(c1.snpcorr, c0.snpcorr)

    l0 = sr.pca_snp_loading(p, hapmap, chunk=512)
    l1 = sr.pca_snp_loading(p, hapmap, chunk=512, mesh=mesh)
    np.testing.assert_array_equal(l1.snploading, l0.snploading)
    np.testing.assert_array_equal(l1.avgfreq, l0.avgfreq)

    s0 = sr.pca_samp_loading(l0, hapmap, sample_id=hapmap.sample_id[:90],
                             chunk=512)
    s1 = sr.pca_samp_loading(l0, hapmap, sample_id=hapmap.sample_id[:90],
                             chunk=512, mesh=mesh)
    np.testing.assert_allclose(s1.eigenvect, s0.eigenvect, rtol=1e-12,
                               atol=1e-14)

    e = sr.eigmix(hapmap, sample_id=sid, eigen_cnt=6, diagadj=False)
    el0 = sr.pca_snp_loading(e, hapmap, chunk=512)
    el1 = sr.pca_snp_loading(e, hapmap, chunk=512, mesh=mesh)
    np.testing.assert_array_equal(el1.snploading, el0.snploading)
    es0 = sr.pca_samp_loading(el0, hapmap, sample_id=hapmap.sample_id[:90],
                              chunk=512)
    es1 = sr.pca_samp_loading(el0, hapmap, sample_id=hapmap.sample_id[:90],
                              chunk=512, mesh=mesh)
    np.testing.assert_allclose(es1.eigenvect, es0.eigenvect, rtol=1e-12,
                               atol=1e-14)


def test_mesh_on_all_count_estimators(hapmap):
    """mesh= on every count-based estimator (the num.thread analog on each
    reference API) equals the single-device result — both the sharded
    full-square route and the sharded row-strip route."""
    import numpy as np
    import snprelate_tpu as sr
    from snprelate_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4, 2)
    sid = hapmap.sample_id[:50]
    kw = dict(sample_id=sid, missing_rate=np.nan)

    for fn, field in [(sr.ibs, "ibs"), (sr.ibs_num, "ibs2"),
                      (sr.ibd_mom, "k0"), (sr.indiv_beta, "beta"),
                      (sr.diss, "diss")]:
        a = getattr(fn(hapmap, **kw), field)
        b = getattr(fn(hapmap, mesh=mesh, **kw), field)
        np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-14,
                                   err_msg=fn.__name__)

    for type_ in ("KING-robust", "KING-homo"):
        a = sr.ibd_king(hapmap, type=type_, **kw)
        b = sr.ibd_king(hapmap, type=type_, mesh=mesh, **kw)
        f = "kinship" if type_ == "KING-robust" else "k0"
        np.testing.assert_allclose(getattr(b, f), getattr(a, f),
                                   rtol=1e-10, err_msg=type_)

    # row-strip route under mesh (explicit sample_block)
    from snprelate_tpu.workspace import init_workspace
    from snprelate_tpu.ops.pairwise import pair_counts

    ws, _ = init_workspace(hapmap, sample_id=sid)
    base = pair_counts(ws).base()
    rows = pair_counts(ws, sample_block=128, mesh=mesh).base()
    for got, want in zip(rows, base):
        np.testing.assert_array_equal(got, want)
