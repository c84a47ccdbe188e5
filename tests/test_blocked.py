"""Block-triangular symmetric gram path (nblk > 1): the streaming engines
switch to upper-sample-block-triangle matmuls above 2048 padded samples
(ops/pairwise.py `_choose_nblk`). The hapmap fixtures are too small to hit
it, so cross-check every blocked engine against direct dense NumPy on a
2048-sample random cohort with missingness."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def big_data():
    from snprelate_tpu.io.store import create_geno

    rng = np.random.default_rng(7)
    n_snp, n_samp = 384, 2048
    g = rng.choice([0, 1, 2, 3], size=(n_snp, n_samp),
                   p=[0.35, 0.3, 0.3, 0.05]).astype(np.uint8)
    data = create_geno(
        g, sample_id=[f"s{i}" for i in range(n_samp)],
        snp_id=np.arange(n_snp), snp_position=np.arange(n_snp) * 50,
        snp_chromosome=np.ones(n_snp, np.int32))
    return data, g


def _workspace(data):
    from snprelate_tpu.workspace import init_workspace

    ws, _ = init_workspace(data, autosome_only=False, remove_monosnp=False,
                           missing_rate=np.nan, verbose=False)
    return ws


def test_choose_nblk():
    from snprelate_tpu.ops.pairwise import _choose_nblk, _pad_blocks

    assert _choose_nblk(128) == 1
    assert _choose_nblk(1024) == 1
    assert _choose_nblk(2048) == 2
    assert _choose_nblk(4096) == 4
    assert _choose_nblk(8192) == 8
    assert _choose_nblk(9088) == 1  # 71*128: blocks would be misaligned
    # engines pad up to a blockable size instead
    assert _pad_blocks(279) == (384, 1)
    assert _pad_blocks(2048) == (2048, 2)
    assert _pad_blocks(9000) == (9216, 8)
    n_pad, nblk = _pad_blocks(9000)
    assert _choose_nblk(n_pad) == nblk


def test_sym_blocks_assemble():
    import jax.numpy as jnp

    from snprelate_tpu.ops.pairwise import _assemble_sym, _sym_blocks

    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 512))
    w = x * rng.standard_normal((64, 1))  # per-SNP weight: stays symmetric
    for nblk in (1, 2, 4):
        blocks = _sym_blocks(jnp.asarray(w), jnp.asarray(x), nblk,
                             preferred_element_type=jnp.float64)
        full = _assemble_sym(blocks, nblk)
        np.testing.assert_allclose(full, w.T @ x, rtol=1e-9, atol=1e-12)


def test_pca_covariance_blocked(big_data):
    from snprelate_tpu.ops.pairwise import _pad_blocks, pca_covariance

    data, g = big_data
    ws = _workspace(data)
    assert _pad_blocks(ws.n_samp)[1] == 2
    cov = pca_covariance(ws)

    gf = g.astype(np.float64)
    valid = g < 3
    num = valid.sum(1)
    avg = np.where(valid, gf, 0).sum(1) / num
    s = avg * 0.5
    scale = np.where((s > 0) & (s < 1), 1.0 / np.sqrt(s * (1 - s)), 0.0)
    x = (np.where(valid, gf, avg[:, None]) - avg[:, None]) * scale[:, None]
    np.testing.assert_allclose(cov, x.T @ x, rtol=1e-9, atol=1e-9)


def test_gcta_blocked(big_data):
    from snprelate_tpu.ops.pairwise import gcta_grm_parts

    data, g = big_data
    ws = _workspace(data)
    cov, vgram, nlocus = gcta_grm_parts(ws)
    valid = g < 3
    num = valid.sum(1)
    gsum = np.where(valid, g, 0).sum(1)
    poly = (gsum > 0) & (gsum < 2 * num)
    vp = (valid & poly[:, None]).astype(np.int64)
    assert nlocus == int(poly.sum())
    np.testing.assert_array_equal(vgram, vp.T @ vp)
    assert np.allclose(cov, cov.T)


def test_king_homo_blocked(big_data):
    from snprelate_tpu.ops.pairwise import king_homo_counts

    data, g = big_data
    ws = _workspace(data)
    counts, waf, waf2 = king_homo_counts(ws)
    valid = (g < 3)
    num = valid.sum(1)
    gsum = np.where(valid, g, 0).sum(1)
    p = np.where(num > 0, 0.5 * gsum / num, 0.0)
    w = p * (1 - p)
    v = valid.astype(np.float64)
    np.testing.assert_allclose(waf, (v * w[:, None]).T @ v, rtol=1e-10)
    np.testing.assert_allclose(waf2, (v * (w * w)[:, None]).T @ v,
                               rtol=1e-10)
    # spot-check integer planes against direct counts
    i, j = 13, 1777
    both = valid[:, i] & valid[:, j]
    d = np.abs(g[:, i].astype(int) - g[:, j].astype(int))[both]
    assert counts.ibs0[i, j] == (d == 2).sum()
    assert counts.ibs2[i, j] == (d == 0).sum()


def test_eigmix_blocked(big_data):
    from snprelate_tpu.ops.pairwise import eigmix_parts

    data, g = big_data
    ws = _workspace(data)
    num_mat, wvg, het = eigmix_parts(ws)
    gf = g.astype(np.float64)
    valid = g < 3
    n_valid = valid.sum(1)
    avg = np.where(valid, gf, 0).sum(1) / n_valid
    x = np.where(valid, gf, avg[:, None]) - avg[:, None]
    np.testing.assert_allclose(num_mat, x.T @ x, rtol=1e-9, atol=1e-9)
    af = 0.5 * avg
    d = 4 * af * (1 - af)
    v = valid.astype(np.float64)
    np.testing.assert_allclose(wvg, (v * d[:, None]).T @ v, rtol=1e-10)
    np.testing.assert_array_equal(het, (g == 1).sum(0))


def test_grm_row_tiled_equals_full(big_data):
    """Row-tiled large-N GRM path == HBM-resident path (GCTA+Eigenstrat)."""
    import snprelate_tpu as sr

    data, _g = big_data
    for method in ("GCTA", "Eigenstrat"):
        full = sr.grm(data, method=method, autosome_only=False,
                      remove_monosnp=False, missing_rate=np.nan)
        tiled = sr.grm(data, method=method, autosome_only=False,
                       remove_monosnp=False, missing_rate=np.nan,
                       sample_block=512)
        np.testing.assert_allclose(tiled.grm, full.grm, rtol=1e-9,
                                   atol=1e-12, err_msg=method)


def test_king_streaming_selection(big_data):
    """Streaming KING screening == full-matrix ibd_king + ibd_selection."""
    import snprelate_tpu as sr

    data, _g = big_data
    kw = dict(autosome_only=False, remove_monosnp=False,
              missing_rate=np.nan)
    full = sr.ibd_king(data, type="KING-robust", **kw)
    ref = sr.ibd_selection(full, kinship_cutoff=0.08)
    stream = sr.king_ibd_selection(data, kinship_cutoff=0.08,
                                   sample_block=512, **kw)
    assert len(stream["ID1"]) == len(ref["ID1"])

    def key(d):
        return sorted(zip(d["ID1"].tolist(), d["ID2"].tolist(),
                          np.round(d["kinship"], 12).tolist()))

    assert key(stream) == key(ref)
    np.testing.assert_allclose(np.sort(stream["IBS0"]),
                               np.sort(ref["IBS0"]), rtol=1e-12)

    # hit_cap=0 forces the dense-bitmask fallback on every non-empty
    # strip — results must be identical to the compact path
    dense = sr.king_ibd_selection(data, kinship_cutoff=0.08,
                                  sample_block=512, hit_cap=0, **kw)
    assert key(dense) == key(ref)

    # hit_cap=2 mixes the two paths across strips (compact where a strip
    # has <= 2 candidates, dense where it has more)
    mixed = sr.king_ibd_selection(data, kinship_cutoff=0.08,
                                  sample_block=512, hit_cap=2, **kw)
    assert key(mixed) == key(ref)


def test_king_streaming_selection_family(big_data):
    """family_id on the streaming screen: per-pair within/between
    estimator selection in the strip kernel == full-matrix
    ibd_king(family_id=) + ibd_selection (VERDICT r1 #6). Relatives are
    planted both inside and across families so BOTH estimators fire at
    the cutoff (random iid pairs never pass it)."""
    import snprelate_tpu as sr
    from snprelate_tpu.io.store import create_geno

    _data, g0 = big_data
    g = g0.copy()
    n_snp, n = g.shape
    rng = np.random.default_rng(1)

    def noisy_copy(src, dst, frac=0.2):
        m = rng.random(n_snp) < frac
        g[m, dst] = rng.choice([0, 1, 2], size=int(m.sum()))
        g[~m, dst] = g[~m, src]

    # families of 8 with singletons sprinkled in (empty string = none)
    fam = [f"F{i // 8}" if i % 5 else "" for i in range(n)]
    noisy_copy(16, 17)    # within family F2
    noisy_copy(700, 701)  # within family F87 (both cross a 512 strip? no —
                          # same strip; the pair below crosses strips)
    noisy_copy(24, 1500)  # across families F3 / F187
    noisy_copy(40, 45)    # 40 in F5, 45 is a singleton (i%5==0)
    data = create_geno(
        g, sample_id=[f"s{i}" for i in range(n)], snp_id=np.arange(n_snp),
        snp_position=np.arange(n_snp) * 50,
        snp_chromosome=np.ones(n_snp, np.int32))

    kw = dict(autosome_only=False, remove_monosnp=False,
              missing_rate=np.nan)
    full = sr.ibd_king(data, type="KING-robust", family_id=fam, **kw)
    ref = sr.ibd_selection(full, kinship_cutoff=0.05)
    pairs = set(zip(ref["ID1"].tolist(), ref["ID2"].tolist()))
    assert {("s16", "s17"), ("s700", "s701"), ("s24", "s1500"),
            ("s40", "s45")} <= pairs
    # the within-family estimator actually differs from between here
    nofam = sr.ibd_selection(sr.ibd_king(data, type="KING-robust", **kw),
                             kinship_cutoff=0.05)
    m_f = dict(zip(zip(ref["ID1"].tolist(), ref["ID2"].tolist()),
                   ref["kinship"].tolist()))
    m_0 = dict(zip(zip(nofam["ID1"].tolist(), nofam["ID2"].tolist()),
                   nofam["kinship"].tolist()))
    assert m_f[("s16", "s17")] != m_0[("s16", "s17")]
    assert m_f[("s24", "s1500")] == m_0[("s24", "s1500")]

    def key(d):
        return sorted(zip(d["ID1"].tolist(), d["ID2"].tolist(),
                          np.round(d["kinship"], 12).tolist()))

    for cap in (65536, 0):
        stream = sr.king_ibd_selection(data, kinship_cutoff=0.05,
                                       family_id=fam, sample_block=512,
                                       hit_cap=cap, **kw)
        assert key(stream) == key(ref), f"hit_cap={cap}"


def test_grm_super_tiles_equal_full(big_data):
    """Super-tile engine (ops/tiles.py, VERDICT r1 #2) == HBM-resident
    GRM for GCTA and Eigenstrat, and the transfer meter stays within the
    documented bound: slab uploads = k (stats pass) + tile-pass loads
    with a one-slab column cache <= k + k(k+1)/2."""
    import snprelate_tpu as sr
    from snprelate_tpu.ops.tiles import StoreSlabSource, TransferMeter, \
        grm_tiled

    data, _g = big_data
    ws = _workspace(data)
    n = ws.n_samp
    for method in ("GCTA", "Eigenstrat"):
        full = sr.grm(data, method=method, autosome_only=False,
                      remove_monosnp=False, missing_rate=np.nan)
        meter = TransferMeter()
        tiled = grm_tiled(ws, group=512, method=method, chunk=128,
                          meter=meter)
        np.testing.assert_allclose(tiled, full.grm, rtol=1e-9, atol=1e-12,
                                   err_msg=method)
        k = -(-n // 512)
        assert meter.slab_loads <= k + k * (k + 1) // 2
        slab_bytes = -(-ws.n_snp // 128) * 128 * (512 // 4)
        assert meter.h2d_bytes == meter.slab_loads * slab_bytes

    # grm(tiles=True) routes through the same engine
    t2 = sr.grm(data, method="GCTA", autosome_only=False,
                remove_monosnp=False, missing_rate=np.nan,
                sample_block=512, tiles=True, tile_group=512, chunk=128)
    full = sr.grm(data, method="GCTA", autosome_only=False,
                  remove_monosnp=False, missing_rate=np.nan)
    np.testing.assert_allclose(t2.grm, full.grm, rtol=1e-9, atol=1e-12)


def test_grm_super_tiles_checkpoint(big_data, tmp_path):
    """Grid checkpointer: a crashed tile run resumes, skipping completed
    tiles; a changed config invalidates them."""
    import snprelate_tpu as sr
    from snprelate_tpu.ops import tiles as T

    data, _g = big_data
    ws = _workspace(data)
    ck = str(tmp_path / "tiles.ck")
    full = sr.grm(data, method="GCTA", autosome_only=False,
                  remove_monosnp=False, missing_rate=np.nan)

    # crash after the first 3 tiles
    calls = {"n": 0}
    orig = T._gcta_tile_scan

    def boom(*a, **k):
        calls["n"] += 1
        if calls["n"] > 3:
            raise RuntimeError("simulated crash")
        return orig(*a, **k)

    T._gcta_tile_scan = boom
    try:
        with np.testing.assert_raises(RuntimeError):
            T.grm_tiled(ws, group=512, chunk=128, checkpoint=ck)
    finally:
        T._gcta_tile_scan = orig

    # resume: only the remaining tiles are computed. The double-buffered
    # D2H pipeline lags saves by ONE tile, so a crash during scan 4 has
    # durably saved tiles 1-2 (tile 3 was still pending) — at most one
    # completed tile is recomputed on resume.
    calls2 = {"n": 0}

    def count(*a, **k):
        calls2["n"] += 1
        return orig(*a, **k)

    T._gcta_tile_scan = count
    try:
        mat = T.grm_tiled(ws, group=512, chunk=128, checkpoint=ck)
    finally:
        T._gcta_tile_scan = orig
    k = -(-ws.n_samp // 512)
    total_tiles = k * (k + 1) // 2
    assert calls2["n"] == total_tiles - 2
    np.testing.assert_allclose(mat, full.grm, rtol=1e-9, atol=1e-12)

    # different chunk => stale tiles discarded, full recompute
    calls3 = {"n": 0}

    def count3(*a, **k):
        calls3["n"] += 1
        return orig(*a, **k)

    T._gcta_tile_scan = count3
    try:
        mat = T.grm_tiled(ws, group=512, chunk=64, checkpoint=ck)
    finally:
        T._gcta_tile_scan = orig
    assert calls3["n"] == total_tiles
    np.testing.assert_allclose(mat, full.grm, rtol=1e-9, atol=1e-12)


def test_king_screen_super_tiles(big_data):
    """Tile-route KING screen (king_ibd_selection(tiles=True)) == the
    strip route, with family semantics and a tiny hit_cap exercising the
    compacted-retry path."""
    import snprelate_tpu as sr
    from snprelate_tpu.io.store import create_geno

    _data, g0 = big_data
    g = g0.copy()
    n_snp, n = g.shape
    rng = np.random.default_rng(2)
    for a, b in ((3, 4), (600, 1800), (1025, 1026)):
        m = rng.random(n_snp) < 0.85
        g[m, b] = g[m, a]
    data = create_geno(
        g, sample_id=[f"s{i}" for i in range(n)], snp_id=np.arange(n_snp),
        snp_position=np.arange(n_snp) * 50,
        snp_chromosome=np.ones(n_snp, np.int32))
    fam = [f"F{i // 16}" if i % 7 else "" for i in range(n)]
    kw = dict(autosome_only=False, remove_monosnp=False,
              missing_rate=np.nan, kinship_cutoff=0.05, family_id=fam)

    base = sr.king_ibd_selection(data, sample_block=512, **kw)
    assert len(base["ID1"]) >= 3

    def key(d):
        return sorted(zip(d["ID1"].tolist(), d["ID2"].tolist(),
                          np.round(d["kinship"], 12).tolist(),
                          np.round(d["IBS0"], 12).tolist()))

    tiled = sr.king_ibd_selection(data, tiles=True, tile_group=512,
                                  chunk=128, **kw)
    assert key(tiled) == key(base)
    # hit_cap=1 forces the doubled-cap retry on every non-empty tile
    tiny = sr.king_ibd_selection(data, tiles=True, tile_group=512,
                                 chunk=128, hit_cap=1, **kw)
    assert key(tiny) == key(base)
    # mesh= column-shards each tile scan; hits identical
    from snprelate_tpu.parallel.mesh import make_mesh
    meshed = sr.king_ibd_selection(data, tiles=True, tile_group=512,
                                   chunk=128, mesh=make_mesh(4, 2), **kw)
    assert key(meshed) == key(base)
    # tile_devices= schedules whole tiles per device; hits identical
    # (hit_cap=1 also exercises the cap retry against PENDING counters)
    import jax
    devd = sr.king_ibd_selection(data, tile_group=512, chunk=128,
                                 tile_devices=jax.devices()[:3],
                                 hit_cap=1, **kw)
    assert key(devd) == key(base)


def test_pair_counts_super_tiles_bit_exact(big_data):
    """Integer basis super tiles (pair_counts_tiled) == full engine,
    bit-exact, including the off-diagonal hv/vh transpose mirroring."""
    from snprelate_tpu.ops.pairwise import pair_counts
    from snprelate_tpu.ops.tiles import pair_counts_tiled

    data, _g = big_data
    ws = _workspace(data)
    full = pair_counts(ws)
    tiled = pair_counts_tiled(ws, group=512, chunk=128)
    np.testing.assert_array_equal(np.stack(tiled.base()),
                                  np.stack(full.base()))


def test_super_tiles_odd_sample_count(big_data):
    """Tile engines with n not divisible by the group OR by 4: last-byte
    and last-group padding must contribute nothing."""
    import snprelate_tpu as sr
    from snprelate_tpu.workspace import init_workspace
    from snprelate_tpu.ops.pairwise import pair_counts
    from snprelate_tpu.ops.tiles import grm_tiled, pair_counts_tiled

    data, _g = big_data
    sid = list(data.sample_id[:1021])  # odd, non-multiple of 4
    ws, _ = init_workspace(data, sample_id=sid, autosome_only=False,
                           remove_monosnp=False, missing_rate=np.nan)
    full = pair_counts(ws)
    tiled = pair_counts_tiled(ws, group=256, chunk=128)
    np.testing.assert_array_equal(np.stack(tiled.base()),
                                  np.stack(full.base()))
    g_full = sr.grm(data, sample_id=sid, method="GCTA",
                    autosome_only=False, remove_monosnp=False,
                    missing_rate=np.nan)
    g_tile = grm_tiled(ws, group=256, chunk=128)
    np.testing.assert_allclose(g_tile, g_full.grm, rtol=1e-9, atol=1e-12)


def test_eigmix_king_homo_super_tiles(big_data):
    """EIGMIX and KING-homo super-tile engines == the full in-HBM parts
    (counts bit-exact; float grams to f64 tolerance)."""
    from snprelate_tpu.ops.pairwise import eigmix_parts, king_homo_counts
    from snprelate_tpu.ops.tiles import (StoreSlabSource,
                                         eigmix_parts_tiled,
                                         king_homo_parts_tiled)

    data, _g = big_data
    ws = _workspace(data)
    src = StoreSlabSource(ws, group=512, chunk=128)

    num0, wvg0, het0 = eigmix_parts(ws)
    num1, wvg1, het1 = eigmix_parts_tiled(ws, source=src)
    np.testing.assert_allclose(num1, num0, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(wvg1, wvg0, rtol=1e-10, atol=1e-12)
    np.testing.assert_array_equal(het1, het0)

    c0, waf0, waf20 = king_homo_counts(ws)
    src2 = StoreSlabSource(ws, group=512, chunk=128)
    c1, waf1, waf21 = king_homo_parts_tiled(ws, source=src2)
    np.testing.assert_array_equal(np.stack(c1.base()), np.stack(c0.base()))
    np.testing.assert_allclose(waf1, waf0, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(waf21, waf20, rtol=1e-10, atol=1e-12)


def test_randomized_pca_slabs_equals_plain(big_data):
    """Slab-wise randomized PCA (the biobank path) == the plain
    randomized PCA on the same data and seed: identical subspace math,
    only the accumulation partitioning differs."""
    import snprelate_tpu as sr
    from snprelate_tpu.ops.tiles import StoreSlabSource
    from snprelate_tpu.models.pca_randomized import randomized_pca_slabs

    data, _g = big_data
    ws = _workspace(data)
    base = sr.pca(data, algorithm="randomized", eigen_cnt=6, iter_num=3,
                  seed=17, autosome_only=False, remove_monosnp=False,
                  missing_rate=np.nan, chunk=128)
    src = StoreSlabSource(ws, group=512, chunk=128)
    slab = randomized_pca_slabs(src, ws.n_samp, eigen_cnt=6, iter_num=3,
                                seed=17)
    np.testing.assert_allclose(slab.eigenval[:6], base.eigenval[:6],
                               rtol=1e-8)
    np.testing.assert_allclose(np.abs(slab.eigenvect),
                               np.abs(base.eigenvect), atol=1e-7)
    np.testing.assert_allclose(slab.TraceXTX, base.TraceXTX, rtol=1e-10)


def test_pair_counts_row_tiled(big_data):
    from snprelate_tpu.ops.pairwise import pair_counts

    data, _g = big_data
    ws = _workspace(data)
    full = pair_counts(ws)
    tiled = pair_counts(ws, sample_block=512)
    np.testing.assert_array_equal(np.stack(tiled.base()),
                                  np.stack(full.base()))


def test_grm_row_tiled_checkpoint(big_data, tmp_path):
    """Row-tiled GRM resumes from per-tile checkpoints."""
    import os

    import snprelate_tpu as sr
    from snprelate_tpu.ops.pairwise import TileCheckpointer

    data, _g = big_data
    kw = dict(method="GCTA", autosome_only=False, remove_monosnp=False,
              missing_rate=np.nan, sample_block=512)
    full = sr.grm(data, **kw)
    n = full.grm.shape[0]

    # simulate a crashed run that completed the first tile
    ckpt = str(tmp_path / "grm_rows")
    tck = TileCheckpointer(ckpt, meta=(41, len(full.snp_id), n, 512))
    tck.save_tile(0, full.grm[:512])
    resumed = sr.grm(data, checkpoint=ckpt, **kw)
    np.testing.assert_allclose(resumed.grm, full.grm, rtol=1e-12)
    # all tiles now exist on disk
    assert len([f for f in os.listdir(tmp_path)
                if f.startswith("grm_rows.tile")]) == -(-n // 512)

    # a rerun on the now-complete checkpoint recomputes nothing
    again = sr.grm(data, checkpoint=ckpt, **kw)
    np.testing.assert_allclose(again.grm, full.grm, rtol=1e-12)

    # a different configuration discards stale tiles (meta mismatch)
    tck2 = TileCheckpointer(ckpt, meta=(41, 999, n, 512))
    assert tck2.load_rows(lambda r0, a: None) == 0


def test_pair_counts_row_tiled_checkpoint(big_data, tmp_path):
    """Row-tiled pair_counts resumes from per-tile strip checkpoints."""
    from snprelate_tpu.ops.pairwise import pair_counts

    data, _g = big_data
    ws = _workspace(data)
    full = pair_counts(ws, sample_block=512)
    ckpt = str(tmp_path / "counts_rows")
    once = pair_counts(ws, sample_block=512, checkpoint=ckpt)
    np.testing.assert_array_equal(np.stack(once.base()),
                                  np.stack(full.base()))
    # resume with the tiles already complete
    again = pair_counts(ws, sample_block=512, checkpoint=ckpt)
    np.testing.assert_array_equal(np.stack(again.base()),
                                  np.stack(full.base()))


def test_king_homo_eigmix_row_tiled(big_data):
    """Row-tiled KING-homo / EIGMIX strips == HBM-resident engines."""
    from snprelate_tpu.ops.pairwise import eigmix_parts, king_homo_counts

    data, _g = big_data
    ws = _workspace(data)
    c_full, waf_full, waf2_full = king_homo_counts(ws)
    c_t, waf_t, waf2_t = king_homo_counts(ws, sample_block=512)
    np.testing.assert_array_equal(np.stack(c_t.base()),
                                  np.stack(c_full.base()))
    np.testing.assert_allclose(waf_t, waf_full, rtol=1e-10)
    np.testing.assert_allclose(waf2_t, waf2_full, rtol=1e-10)

    num_f, wvg_f, het_f = eigmix_parts(ws)
    num_t, wvg_t, het_t = eigmix_parts(ws, sample_block=512)
    np.testing.assert_allclose(num_t, num_f, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(wvg_t, wvg_f, rtol=1e-10)
    np.testing.assert_array_equal(het_t, het_f)


def test_king_streaming_subblock_compaction(big_data, monkeypatch):
    """Shrinking the int32 flat-index block limit forces the sub-block
    nonzero compaction path; results must be unchanged."""
    import snprelate_tpu as sr
    from snprelate_tpu.models import king as king_mod

    data, _g = big_data
    kw = dict(autosome_only=False, remove_monosnp=False,
              missing_rate=np.nan)
    ref = sr.king_ibd_selection(data, kinship_cutoff=0.08,
                                sample_block=512, **kw)
    monkeypatch.setattr(king_mod, "_FLAT_BLOCK_LIMIT", 1 << 14)
    sub = sr.king_ibd_selection(data, kinship_cutoff=0.08,
                                sample_block=512, **kw)

    def key(d):
        return sorted(zip(d["ID1"].tolist(), d["ID2"].tolist(),
                          np.round(d["kinship"], 12).tolist()))

    assert key(sub) == key(ref)


def test_packed_and_mesh_fixes(hapmap):
    """Regression coverage: PackedSymmetric negative-index semantics,
    indiv_beta_rel on packed results, grm EIGMIX/IndivBeta under mesh,
    pair_counts(mesh=, checkpoint=) routing to the resumable row path."""
    import snprelate_tpu as sr
    import pytest as _pytest

    sid = hapmap.sample_id[:30]
    b = sr.indiv_beta(hapmap, sample_id=sid, use_matrix=True)
    d = sr.indiv_beta(hapmap, sample_id=sid)
    np.testing.assert_array_equal(b.beta[-1, 0], d.beta[-1, 0])
    with _pytest.raises(IndexError):
        b.beta[30, 0]
    rp = sr.indiv_beta_rel(b, 0.02)
    rd = sr.indiv_beta_rel(d, 0.02)
    np.testing.assert_array_equal(rp.beta.full(), rd.beta)

    from snprelate_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(4, 2)
    for method in ("EIGMIX", "IndivBeta"):
        a = sr.grm(hapmap, sample_id=sid, method=method)
        m = sr.grm(hapmap, sample_id=sid, method=method, mesh=mesh)
        np.testing.assert_allclose(m.grm, a.grm, rtol=1e-10,
                                   err_msg=method)


def test_pair_counts_mesh_checkpoint(hapmap, tmp_path):
    from snprelate_tpu.ops.pairwise import pair_counts
    from snprelate_tpu.parallel.mesh import make_mesh
    from snprelate_tpu.workspace import init_workspace

    ws, _ = init_workspace(hapmap, sample_id=hapmap.sample_id[:40])
    mesh = make_mesh(4, 2)
    base = pair_counts(ws).base()
    ckpt = str(tmp_path / "pc")
    got = pair_counts(ws, mesh=mesh, checkpoint=ckpt).base()
    for g, w in zip(got, base):
        np.testing.assert_array_equal(g, w)
    import glob
    assert glob.glob(ckpt + ".tile*")  # checkpoint was honored, not dropped


def test_count_estimators_sample_block_passthrough(big_data):
    """ibs/ibs_num/diss/ibd_mom accept sample_block= (the tutorial's
    large-N form) and match the default path exactly."""
    import snprelate_tpu as sr

    data, _g = big_data
    kw = dict(autosome_only=False, remove_monosnp=False,
              missing_rate=np.nan)
    for fn, field in [(sr.ibs, "ibs"), (sr.ibs_num, "ibs2"),
                      (sr.ibd_mom, "k0"), (sr.diss, "diss")]:
        a = getattr(fn(data, **kw), field)
        b = getattr(fn(data, sample_block=512, **kw), field)
        np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-14,
                                   err_msg=fn.__name__)


def test_super_tiles_mesh(big_data):
    """mesh= on the count/EIGMIX/KING-homo super-tile engines: tile scans
    column-sharded over the virtual mesh == single-device (counts
    bit-exact, floats to f64 tolerance)."""
    from snprelate_tpu.ops.pairwise import eigmix_parts, king_homo_counts, \
        pair_counts
    from snprelate_tpu.ops.tiles import (StoreSlabSource,
                                         eigmix_parts_tiled,
                                         king_homo_parts_tiled,
                                         pair_counts_tiled)
    from snprelate_tpu.parallel.mesh import make_mesh

    data, _g = big_data
    ws = _workspace(data)
    mesh = make_mesh(4, 2)

    full = pair_counts(ws)
    tiled = pair_counts_tiled(ws, group=512, chunk=128, mesh=mesh)
    np.testing.assert_array_equal(np.stack(tiled.base()),
                                  np.stack(full.base()))

    num0, wvg0, het0 = eigmix_parts(ws)
    src = StoreSlabSource(ws, group=512, chunk=128)
    num1, wvg1, het1 = eigmix_parts_tiled(ws, source=src, mesh=mesh)
    np.testing.assert_allclose(num1, num0, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(wvg1, wvg0, rtol=1e-10, atol=1e-12)
    np.testing.assert_array_equal(het1, het0)

    c0, waf0, waf20 = king_homo_counts(ws)
    src2 = StoreSlabSource(ws, group=512, chunk=128)
    c1, waf1, waf21 = king_homo_parts_tiled(ws, source=src2, mesh=mesh)
    np.testing.assert_array_equal(np.stack(c1.base()), np.stack(c0.base()))
    np.testing.assert_allclose(waf1, waf0, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(waf21, waf20, rtol=1e-10, atol=1e-12)


def test_eigmix_homo_tiles_checkpoint(big_data, tmp_path):
    """Grid checkpoints on the EIGMIX / KING-homo tile engines: a
    completed run leaves per-tile files, and a resume recomputes nothing
    (scan monkeypatched to raise)."""
    from snprelate_tpu.ops import tiles as T
    from snprelate_tpu.ops.pairwise import eigmix_parts, king_homo_counts

    data, _g = big_data
    ws = _workspace(data)
    num0, wvg0, het0 = eigmix_parts(ws)
    c0, waf0, waf20 = king_homo_counts(ws)

    ck_e = str(tmp_path / "eig.ck")
    ck_k = str(tmp_path / "kh.ck")
    num1, wvg1, het1 = T.eigmix_parts_tiled(ws, group=512, chunk=128,
                                            checkpoint=ck_e)
    c1, waf1, waf21 = T.king_homo_parts_tiled(ws, group=512, chunk=128,
                                              checkpoint=ck_k)
    np.testing.assert_allclose(num1, num0, rtol=1e-10, atol=1e-12)
    np.testing.assert_array_equal(np.stack(c1.base()), np.stack(c0.base()))

    def boom(*a, **k):
        raise AssertionError("tile recomputed on resume")

    orig_e, orig_k = T._eigmix_tile_scan_c, T._king_homo_tile_scan_c
    T._eigmix_tile_scan_c = T._king_homo_tile_scan_c = boom
    try:
        num2, wvg2, het2 = T.eigmix_parts_tiled(ws, group=512, chunk=128,
                                                checkpoint=ck_e)
        c2, waf2, waf22 = T.king_homo_parts_tiled(ws, group=512, chunk=128,
                                                  checkpoint=ck_k)
    finally:
        T._eigmix_tile_scan_c, T._king_homo_tile_scan_c = orig_e, orig_k
    np.testing.assert_allclose(num2, num0, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(wvg2, wvg0, rtol=1e-10, atol=1e-12)
    np.testing.assert_array_equal(het2, het0)
    np.testing.assert_array_equal(np.stack(c2.base()), np.stack(c0.base()))
    np.testing.assert_allclose(waf2, waf0, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(waf22, waf20, rtol=1e-10, atol=1e-12)


def test_tile_devices_scheduling(big_data, tmp_path):
    """Tile-grid device scheduling (devices=): whole tiles round-robin
    over jax devices == the single-device tile engine == the full engine
    (counts bit-exact, GRM to f64 tolerance); grm(tile_devices=) routes;
    a run checkpointed single-device resumes under devices= without
    recomputing saved tiles."""
    import jax
    import snprelate_tpu as sr
    from snprelate_tpu.ops import tiles as T
    from snprelate_tpu.ops.pairwise import pair_counts

    data, _g = big_data
    sid = list(data.sample_id[:1021])  # odd n: ragged last group
    from snprelate_tpu.workspace import init_workspace

    ws, _ = init_workspace(data, sample_id=sid, autosome_only=False,
                           remove_monosnp=False, missing_rate=np.nan)
    devs = jax.devices()[:3]
    assert len(devs) == 3, "conftest provides 8 virtual CPU devices"

    full_c = pair_counts(ws)
    dev_c = T.pair_counts_tiled(ws, group=256, chunk=128, devices=devs)
    np.testing.assert_array_equal(np.stack(dev_c.base()),
                                  np.stack(full_c.base()))

    full = sr.grm(data, sample_id=sid, method="GCTA", autosome_only=False,
                  remove_monosnp=False, missing_rate=np.nan)
    dev_m = T.grm_tiled(ws, group=256, chunk=128, devices=devs)
    np.testing.assert_allclose(dev_m, full.grm, rtol=1e-9, atol=1e-12)

    routed = sr.grm(data, sample_id=sid, method="GCTA",
                    autosome_only=False, remove_monosnp=False,
                    missing_rate=np.nan, tile_group=256, chunk=128,
                    tile_devices=devs)
    np.testing.assert_allclose(routed.grm, full.grm, rtol=1e-9,
                               atol=1e-12)

    # estimator-level exposure: every count estimator forwards
    # tile_devices to the engine (bit-exact / tolerance vs default route)
    ek = dict(autosome_only=False, remove_monosnp=False,
              missing_rate=np.nan)
    b_num = sr.ibs_num(data, sample_id=sid, **ek)
    d_num = sr.ibs_num(data, sample_id=sid, chunk=128,
                       tile_devices=devs, **ek)
    for f in ("ibs0", "ibs1", "ibs2"):
        np.testing.assert_array_equal(getattr(d_num, f), getattr(b_num, f))
    b_kh = sr.ibd_king(data, sample_id=sid, type="KING-homo", **ek)
    d_kh = sr.ibd_king(data, sample_id=sid, type="KING-homo", chunk=128,
                       tile_devices=devs, **ek)
    np.testing.assert_allclose(d_kh.k0, b_kh.k0, rtol=1e-10, atol=1e-12)
    b_em = sr.eigmix(data, sample_id=sid, eigen_cnt=4, **ek)
    d_em = sr.eigmix(data, sample_id=sid, eigen_cnt=4, chunk=128,
                     tile_devices=devs, **ek)
    np.testing.assert_allclose(d_em.eigenval[:4], b_em.eigenval[:4],
                               rtol=1e-9)

    # checkpoint interop: tiles saved by a single-device run are reused
    # verbatim by a devices= resume (same meta: tag/n_snp/n/group/chunk)
    ck = str(tmp_path / "devtiles.ck")
    base = T.grm_tiled(ws, group=256, chunk=128, checkpoint=ck)
    orig = T._gcta_tile_scan

    def boom(*a, **k):
        raise AssertionError("tile recomputed on devices= resume")

    T._gcta_tile_scan = boom
    try:
        resumed = T.grm_tiled(ws, group=256, chunk=128, checkpoint=ck,
                              devices=devs)
    finally:
        T._gcta_tile_scan = orig
    np.testing.assert_allclose(resumed, base, rtol=0, atol=0)

    with pytest.raises(ValueError, match="not both"):
        next(T.gcta_grm_tiles(T.StoreSlabSource(ws, 256, 128), ws.n_samp,
                              mesh=object(), devices=devs))


def test_tile_devices_eigmix_king_homo(big_data):
    """devices= scheduling on the EIGMIX / KING-homo tile engines ==
    single-device tile engine (counts bit-exact, floats to tolerance)."""
    import jax
    from snprelate_tpu.ops import tiles as T

    data, _g = big_data
    ws = _workspace(data)
    devs = jax.devices()[:3]

    num0, wvg0, het0 = T.eigmix_parts_tiled(ws, group=512, chunk=128)
    num1, wvg1, het1 = T.eigmix_parts_tiled(ws, group=512, chunk=128,
                                            devices=devs)
    np.testing.assert_allclose(num1, num0, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(wvg1, wvg0, rtol=1e-10, atol=1e-12)
    np.testing.assert_array_equal(het1, het0)

    c0, waf0, waf20 = T.king_homo_parts_tiled(ws, group=512, chunk=128)
    c1, waf1, waf21 = T.king_homo_parts_tiled(ws, group=512, chunk=128,
                                              devices=devs)
    np.testing.assert_array_equal(np.stack(c1.base()), np.stack(c0.base()))
    np.testing.assert_allclose(waf1, waf0, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(waf21, waf20, rtol=1e-10, atol=1e-12)
