"""Streamed GRM artifact (VERDICT r2 #2): the SNPRELATE_OUTPUT writer
streams row blocks through an incremental coder (O(row block) memory, the
analog of grm_save_to_gds streaming rows during computation,
genPCA.cpp:1571-1583), tile-grid checkpoints assemble straight into the
GDS artifact without densifying n x n, and the artifact streams back as
row blocks."""

import numpy as np
import pytest

from snprelate_tpu.io.store import create_geno
from snprelate_tpu.workspace import init_workspace


def _toy(n_snp=500, n_samp=83, seed=3):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 4, size=(n_snp, n_samp)).astype(np.uint8)
    g[g == 3] = rng.integers(0, 3, size=(g == 3).sum())
    g[rng.random(g.shape) < 0.03] = 3
    return create_geno(g, [f"s{i}" for i in range(n_samp)],
                       np.arange(n_snp), np.arange(n_snp) * 11,
                       np.ones(n_snp, np.int32))


@pytest.mark.parametrize("compress", ["", "ZIP", "ZIP_RA", "LZMA_RA"])
def test_save_grm_stream_roundtrip(tmp_path, compress):
    from snprelate_tpu.models.grm import grm, load_grm, load_grm_rows

    data = _toy()
    res = grm(data, autosome_only=False, missing_rate=np.nan)
    fn = str(tmp_path / f"g_{compress or 'raw'}.gds")
    res2 = grm(data, autosome_only=False, missing_rate=np.nan,
               out_fn=fn, out_compress=compress)
    back, _av = load_grm(fn)
    assert back.method == "GCTA"
    np.testing.assert_array_equal(back.sample_id, res.sample_id)
    np.testing.assert_array_equal(back.snp_id, res.snp_id)
    np.testing.assert_allclose(back.grm, res.grm, rtol=0, atol=0)

    # streamed read-back: row blocks smaller than the matrix
    rows = list(load_grm_rows(fn, block_rows=17))
    got = np.concatenate([r for _r0, r in rows])
    assert rows[0][0] == 0 and rows[1][0] == 17
    np.testing.assert_array_equal(got, res.grm)


def test_save_grm_single_precision(tmp_path):
    from snprelate_tpu.models.grm import grm, load_grm

    data = _toy(n_samp=41)
    fn = str(tmp_path / "g32.gds")
    res = grm(data, autosome_only=False, missing_rate=np.nan, out_fn=fn,
              out_prec="single", out_compress="ZIP")
    back, _ = load_grm(fn)
    np.testing.assert_allclose(back.grm, res.grm, rtol=1e-6)


@pytest.mark.parametrize("method", ["GCTA", "Eigenstrat"])
def test_tiles_to_gds_no_densify(tmp_path, method):
    """Rank runs -> tile checkpoints -> grm_tiles_to_gds: the artifact
    matches the densified grm() matrix exactly, and the assembly path
    never builds an (n, n) array (tile row blocks only)."""
    from snprelate_tpu.models.grm import grm, grm_tiles_to_gds, load_grm

    data = _toy(n_snp=600, n_samp=300)
    ck = str(tmp_path / "tiles.ck")
    # two rank processes' worth of tiles (in-process here)
    for rank in (0, 1):
        out = grm(data, autosome_only=False, missing_rate=np.nan,
                  method=method, tile_rank=(rank, 2), checkpoint=ck,
                  tile_group=128, chunk=128)
        assert out is None
    ref = grm(data, autosome_only=False, missing_rate=np.nan,
              method=method)

    fn = str(tmp_path / "grm.gds")
    ws, _ = init_workspace(data, autosome_only=False,
                           missing_rate=np.nan)
    n, k = grm_tiles_to_gds(ck, fn, ws.sample_id, ws.snp_id,
                            method=method, compress="ZIP")
    assert n == 300 and k == 3
    back, _ = load_grm(fn)
    np.testing.assert_allclose(back.grm, ref.grm, rtol=1e-12, atol=1e-12)

    # the tile meta survives (assembly is read-only: no wipe)
    import os

    assert os.path.exists(ck + ".meta.npy")
    assert any(f.endswith(".npz") for f in os.listdir(tmp_path))


def test_tiles_to_gds_missing_tile_raises(tmp_path):
    from snprelate_tpu.models.grm import grm, grm_tiles_to_gds

    data = _toy(n_snp=600, n_samp=300)
    ck = str(tmp_path / "tiles.ck")
    out = grm(data, autosome_only=False, missing_rate=np.nan,
              tile_rank=(0, 2), checkpoint=ck, tile_group=128, chunk=128)
    assert out is None  # rank 1 never ran
    ws, _ = init_workspace(data, autosome_only=False, missing_rate=np.nan)
    with pytest.raises(FileNotFoundError, match="missing"):
        grm_tiles_to_gds(ck, str(tmp_path / "grm.gds"), ws.sample_id,
                         ws.snp_id)


def test_row_block_order_enforced(tmp_path):
    from snprelate_tpu.models.grm import save_grm_rows

    blocks = [(4, np.zeros((4, 8))), (0, np.zeros((4, 8)))]
    with pytest.raises(ValueError, match="out of order"):
        save_grm_rows(str(tmp_path / "x.gds"), [f"s{i}" for i in range(8)],
                      np.arange(5), "GCTA", iter(blocks), 8)


def test_read_leaf_rows_never_materializes_uncoded_leaf(tmp_path):
    """The biobank GRM artifact (compress='') streams back through the
    mmap in O(step) pieces: read_leaf_rows must not pull the whole data
    block through _LazyBlocks.__getitem__ (a 40 GB artifact would need
    40 GB of RAM)."""
    from snprelate_tpu.io.gds import read_leaf_rows, _LazyBlocks
    from snprelate_tpu.models.grm import save_grm_rows

    n = 64
    m = np.random.default_rng(0).random((n, n))
    m = m + m.T
    fn = str(tmp_path / "grm.gds")
    save_grm_rows(fn, [f"s{i}" for i in range(n)], np.arange(10), "GCTA",
                  iter([(0, m)]), n, compress="")

    bombed = {}
    orig = _LazyBlocks.__getitem__

    def bomb(self, bid):
        bombed[bid] = True
        return orig(self, bid)

    _LazyBlocks.__getitem__ = bomb
    try:
        blocks = list(read_leaf_rows(fn, "grm", block_rows=16))
    finally:
        _LazyBlocks.__getitem__ = orig
    back = np.concatenate([b for _, b in blocks])
    np.testing.assert_allclose(back, m, rtol=0, atol=0)
    # small header/metadata nodes may materialize; the grm data block id
    # is 9 (save_grm_rows emits it as data_id=9)
    assert 9 not in bombed


def test_gds_file_is_mmapped():
    """GDSFile holds an mmap, not an in-RAM copy of the file."""
    import mmap

    import snprelate_tpu as sr
    from snprelate_tpu.io.gds import GDSFile

    f = GDSFile(sr.example_filename())
    assert isinstance(f._data, mmap.mmap)
