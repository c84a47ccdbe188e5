"""Reader for CoreArray GDS files (the gdsfmt container used by SNPRelate).

SNPRelate stores SNP genotype data in GDS files (see reference
``R/AllUtilities.R:32-175`` for the expected node layout and
``vignettes/SNPRelate.Rmd:88-135`` for the format description). The container
itself is produced by the external gdsfmt package; this module is a clean-room
reader reverse-engineered from the bundled ``hapmap_geno.gds``:

File layout::

    [12B magic "COREARRAYx0A"] [2B version] [4B entry block id]
    fragment*  — each fragment:
        [6B little-endian size | flag bit 47 = head fragment]
        head:        [6B next-fragment pos][4B block id][6B block size][data]
        continuation:[6B next-fragment pos][data]

A *block* is the concatenated data of its fragment chain; fragment capacity
may exceed the block size (slack bytes are stale). Node blocks start with a
6-byte used-size, then a sequence of property records. Property names are
stored 7-bit-packed (LSB first), so known properties are matched as fixed
byte tokens; class names are length-prefixed 7-bit-packed ASCII strings
(e.g. ``dBit2`` -> ``64 61 9a 2e 03``).

Genotype coding matches the reference (vignettes/SNPRelate.Rmd:104):
2-bit value = count of A allele (0,1,2); 3 = missing. Orientation is flagged
by a ``snp.order`` (snp-major) or ``sample.order`` (sample-major) attribute
on the genotype node (R/AllUtilities.R:136-147).
"""

from __future__ import annotations

import lzma
import struct
import zlib
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

MAGIC = b"COREARRAYx0A"

# --- property tokens: [type byte] + 7-bit packed property name ---
TOK_NCHILD = bytes.fromhex("08c643754ef601")  # folder: u32 child count
TOK_DIRBLOB = bytes.fromhex("01c7437517e57d")  # folder: 6B size + entries
TOK_NATTR = bytes.fromhex("0807f37d9d937d")  # u32 attribute count
TOK_ATTRBLOB = bytes.fromhex("0108f37ddd45791f")  # 6B size + attr records
TOK_CODER = bytes.fromhex("15c4466d10")  # [1B len][coder name]
TOK_NDIM = bytes.fromhex("07c4e3641f")  # u16 ndim
TOK_DIMS = bytes.fromhex("02c3436104")  # hmm: [1B nbytes] part of next
TOK_DIMS_PFX = bytes.fromhex("02c34361")  # [1B nbytes][u32 x ndim]
TOK_PTR = bytes.fromhex("09c4c37c0c")  # u32 data block id
TOK_SIZES = bytes.fromhex("e051250410")  # [u64 total bytes][u64 stored bytes]


def _unpack7(b: bytes, nchar: int) -> str:
    v = int.from_bytes(b, "little")
    return "".join(chr((v >> (7 * i)) & 0x7F) for i in range(nchar))


def _u48(b: bytes, off: int = 0) -> int:
    return int.from_bytes(b[off : off + 6], "little")


@dataclass
class GDSNode:
    """One node of the GDS hierarchy."""

    name: str
    classname: str  # "" for folders
    blockid: int
    is_folder: bool
    dims: tuple[int, ...] = ()
    coder: str = ""
    total_bytes: int = -1
    stored_bytes: int = -1
    data_blockid: int = -1
    attributes: dict[str, Any] = field(default_factory=dict)
    children: "dict[str, GDSNode]" = field(default_factory=dict)
    _file: "Optional[GDSFile]" = None

    def index(self, path: str) -> "GDSNode":
        node = self
        for part in path.split("/"):
            node = node.children[part]
        return node

    def read(self) -> Any:
        """Decode this node's data into numpy / list-of-str."""
        assert self._file is not None
        return self._file._read_node_data(self)

    def ls(self) -> list[str]:
        return list(self.children)


class _LazyBlocks:
    """Block-id -> content mapping over the mmapped file.

    ``[bid]`` materializes one block's bytes on demand (joining its
    fragment spans); ``iter_chunks(bid, step)`` streams a block's bytes
    without ever joining it — the path that keeps ``read_leaf_rows`` on
    a tens-of-GB GRM leaf in O(step) memory."""

    def __init__(self, data, frags):
        self._data = data
        self._frags = frags  # bid -> (bsize, [(start, stop), ...])

    def __contains__(self, bid) -> bool:
        return bid in self._frags

    def __getitem__(self, bid) -> bytes:
        bsize, spans = self._frags[bid]
        return b"".join(self._data[a:b] for a, b in spans)[:bsize]

    def size(self, bid) -> int:
        return self._frags[bid][0]

    def iter_chunks(self, bid, step: int = 1 << 20):
        bsize, spans = self._frags[bid]
        left = bsize
        for a, b in spans:
            for p in range(a, b, step):
                if left <= 0:
                    return
                piece = self._data[p: min(p + step, b)]
                if len(piece) > left:
                    piece = piece[:left]
                left -= len(piece)
                yield piece


class GDSFile:
    """A parsed CoreArray GDS file. Read-only."""

    def __init__(self, path: str):
        import mmap as _mmap

        self.path = path
        with open(path, "rb") as f:
            try:
                # map instead of read: a biobank GRM artifact is tens of
                # GB — header parsing touches KBs, and block content is
                # materialized lazily (only what a caller asks for)
                self._data = _mmap.mmap(f.fileno(), 0,
                                        access=_mmap.ACCESS_READ)
            except (ValueError, OSError):  # 0-byte / mmap-less fs
                self._data = f.read()
        if self._data[:12] != MAGIC:
            raise ValueError(f"{path}: not a GDS file (bad magic)")
        self.version = struct.unpack_from("<H", self._data, 12)[0]
        self.entry_id = struct.unpack_from("<I", self._data, 14)[0]
        self._blocks = self._scan_blocks()
        self.root = self._parse_node(self.entry_id, name="")

    # --- low-level ---

    def _scan_blocks(self) -> "_LazyBlocks":
        data = self._data
        heads: dict[int, tuple[int, int, int]] = {}  # id -> (pos, size, next)
        conts: dict[int, tuple[int, int]] = {}  # pos -> (size, next)
        pos = 18
        while pos < len(data):
            v = _u48(data, pos)
            head = bool(v & 0x800000000000)
            size = v & 0x7FFFFFFFFFFF
            if size == 0:
                break
            nxt = _u48(data, pos + 6)
            if head:
                bid = struct.unpack_from("<I", data, pos + 12)[0]
                heads[bid] = (pos, size, nxt)
            else:
                conts[pos] = (size, nxt)
            pos += size
        frags: dict[int, tuple[int, list[tuple[int, int]]]] = {}
        for bid, (pos, size, nxt) in heads.items():
            bsize = _u48(data, pos + 16)
            spans = [(pos + 22, pos + size)]
            got = size - 22
            while nxt and got < bsize:
                csize, cnext = conts[nxt]
                spans.append((nxt + 12, nxt + csize))
                got += csize - 12
                nxt = cnext
            frags[bid] = (bsize, spans)
        return _LazyBlocks(data, frags)

    # --- node parsing ---

    def _parse_node(self, blockid: int, name: str) -> GDSNode:
        raw = self._blocks[blockid]
        used = _u48(raw, 0)
        b = raw[:used]
        is_folder = len(b) >= 10 and b[8:10] != b"\x00\x01"
        classname = ""
        if not is_folder:
            nlen = b[10]
            nbytes = (7 * nlen + 7) // 8
            classname = _unpack7(b[11 : 11 + nbytes], nlen)
        node = GDSNode(name=name, classname=classname, blockid=blockid,
                       is_folder=is_folder, _file=self)

        i = b.find(TOK_CODER)
        if i >= 0:
            clen = b[i + len(TOK_CODER)]
            node.coder = b[i + len(TOK_CODER) + 1 : i + len(TOK_CODER) + 1 + clen].decode()
        i = b.find(TOK_SIZES)
        if i >= 0:
            off = i + len(TOK_SIZES)
            node.total_bytes = struct.unpack_from("<Q", b, off)[0]
            node.stored_bytes = struct.unpack_from("<Q", b, off + 8)[0]
        i = b.find(TOK_DIMS_PFX)
        if i >= 0:
            off = i + len(TOK_DIMS_PFX)
            nbytes = b[off]
            ndim = nbytes // 4
            dims = struct.unpack_from(f"<{ndim}I", b, off + 1)
            node.dims = tuple(int(x) for x in dims)
        i = b.find(TOK_PTR)
        if i >= 0:
            node.data_blockid = struct.unpack_from("<I", b, i + len(TOK_PTR))[0]
        i = b.find(TOK_ATTRBLOB)
        if i >= 0:
            off = i + len(TOK_ATTRBLOB)
            asize = _u48(b, off)
            node.attributes = _parse_attrs(b[off + 6 : off + asize])
        if is_folder:
            i = b.find(TOK_DIRBLOB)
            if i >= 0:
                off = i + len(TOK_DIRBLOB)
                dsize = _u48(b, off)
                for cname, cid, _flags in _parse_dir(b[off + 6 : off + dsize]):
                    node.children[cname] = self._parse_node(cid, cname)
        return node

    # --- data decoding ---

    _DTYPES = {
        "dInt8": np.int8, "dUInt8": np.uint8,
        "dInt16": np.int16, "dUInt16": np.uint16,
        "dInt32": np.int32, "dUInt32": np.uint32,
        "dInt64": np.int64, "dUInt64": np.uint64,
        "dFloat32": np.float32, "dFloat64": np.float64,
    }

    def _raw_stream(self, node: GDSNode) -> bytes:
        if node.data_blockid < 0:
            return b""
        raw = self._blocks[node.data_blockid]
        if node.coder == "":
            return raw
        if node.coder.startswith("ZIP_RA"):
            return _decompress_ra(raw, node.total_bytes, "zlib")
        if node.coder.startswith("LZMA_RA"):
            return _decompress_ra(raw, node.total_bytes, "xz")
        if node.coder.startswith("LZ4_RA"):
            return _decompress_ra(raw, node.total_bytes, "lz4")
        if node.coder.startswith("LZ4"):
            data, _used = _lz4_frame_decompress(raw)
            return data
        if node.coder.startswith("ZIP"):
            d = zlib.decompressobj()
            return d.decompress(raw)
        if node.coder.startswith("LZMA"):
            return lzma.decompress(raw)
        raise NotImplementedError(f"GDS coder {node.coder!r}")

    def _read_node_data(self, node: GDSNode) -> Any:
        stream = self._raw_stream(node)
        cname = node.classname
        n = int(np.prod(node.dims)) if node.dims else 0
        if cname in self._DTYPES:
            arr = np.frombuffer(stream, dtype=self._DTYPES[cname], count=n)
            return arr.reshape(node.dims)
        if cname == "dBit2":
            nbytes = (n + 3) // 4
            packed = np.frombuffer(stream, dtype=np.uint8, count=nbytes)
            vals = _unpack_bit2(packed, n)
            return vals.reshape(node.dims)
        if cname == "dBit1":
            nbytes = (n + 7) // 8
            packed = np.frombuffer(stream, dtype=np.uint8, count=nbytes)
            bits = np.unpackbits(packed, bitorder="little")[:n]
            return bits.reshape(node.dims)
        if cname in ("dVStr8", "dStr8"):
            parts = stream.split(b"\x00")
            out = [p.decode("utf-8", errors="replace") for p in parts[:n]]
            return out
        if cname.startswith("dFStr"):
            width = node.total_bytes // max(n, 1)
            out = [stream[i * width : (i + 1) * width].rstrip(b"\x00").decode(
                "utf-8", errors="replace") for i in range(n)]
            return out
        if cname == "dPackedReal16":
            arr = np.frombuffer(stream, dtype=np.int16, count=n).astype(np.float64)
            scale = float(node.attributes.get("scale", 0.0001))
            offset = float(node.attributes.get("offset", 0.0))
            out = arr * scale + offset
            out[arr == -32768] = np.nan
            return out.reshape(node.dims)
        if cname == "dPackedReal24":
            b3 = np.frombuffer(stream, dtype=np.uint8, count=3 * n).reshape(n, 3)
            v = (b3[:, 0].astype(np.int32) | (b3[:, 1].astype(np.int32) << 8)
                 | (b3[:, 2].astype(np.int32) << 16))
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            scale = float(node.attributes.get("scale", 0.00001))
            offset = float(node.attributes.get("offset", 0.0))
            out = v.astype(np.float64) * scale + offset
            out[v == -(1 << 23)] = np.nan
            return out.reshape(node.dims)
        raise NotImplementedError(f"GDS class {cname!r} not supported yet")

    # --- convenience ---

    def index(self, path: str) -> GDSNode:
        return self.root.index(path)

    def ls(self) -> list[str]:
        return self.root.ls()


_XZ_MAGIC = b"\xfd7zXZ\x00"
_LZ4_MAGIC = b"\x04\x22\x4d\x18"


def _lz4_block_decompress(src: bytes) -> bytes:
    """Decode one raw LZ4 block (the standard sequence format: token,
    literals, 2-byte offset, match with overlap-replication semantics).
    Prefers the native codec (codec_lz4_block, ~GB/s); this byte loop is
    the no-compiler fallback."""
    from ..native import lz4_block

    native = lz4_block(src)
    if native is not None:
        return native
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        out += src[i : i + lit]
        i += lit
        if i >= n:
            break  # final sequence: literals only
        off = src[i] | (src[i + 1] << 8)
        i += 2
        if off == 0:
            raise ValueError("LZ4 block: zero match offset")
        ml = token & 15
        if ml == 15:
            while True:
                b = src[i]
                i += 1
                ml += b
                if b != 255:
                    break
        ml += 4
        start = len(out) - off
        if start < 0:
            raise ValueError("LZ4 block: match offset before start")
        if off >= ml:
            out += out[start : start + ml]
        else:  # overlapping match: replicate the trailing pattern
            pattern = bytes(out[start:])
            reps = -(-ml // off)
            out += (pattern * reps)[:ml]
    return bytes(out)


def _lz4_frame_decompress(src: bytes, start: int = 0):
    """Decode one LZ4 frame starting at ``start``. Returns
    (decompressed bytes, bytes consumed including the frame header/footer).
    Checksums (xxhash) are skipped, not verified."""
    if src[start : start + 4] != _LZ4_MAGIC:
        raise ValueError("not an LZ4 frame")
    pos = start + 4
    flg = src[pos]
    bchk = (flg >> 4) & 1
    csize = (flg >> 3) & 1
    cchk = (flg >> 2) & 1
    dictid = flg & 1
    if (flg >> 6) != 0x01:
        raise ValueError("unsupported LZ4 frame version")
    pos += 2  # FLG + BD
    if csize:
        pos += 8
    if dictid:
        pos += 4
    pos += 1  # header checksum byte
    out = bytearray()
    while True:
        bsize = struct.unpack_from("<I", src, pos)[0]
        pos += 4
        if bsize == 0:  # EndMark
            break
        uncompressed = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        block = src[pos : pos + bsize]
        pos += bsize
        out += block if uncompressed else _lz4_block_decompress(block)
        if bchk:
            pos += 4
    if cchk:
        pos += 4
    return bytes(out), pos - start


def _lz4_frame_compress(data: bytes, block: int = 65536) -> bytes:
    """Minimal valid LZ4 frame writer (all blocks stored uncompressed —
    used by tests and as a compatibility emitter; any LZ4 decoder reads
    it). Header checksum is a placeholder byte (unverified by our reader)."""
    parts = [_LZ4_MAGIC, bytes([0x40, 0x40, 0x00])]  # FLG: v01, BD: 64KB max
    for i in range(0, len(data), block):
        piece = data[i : i + block]
        parts.append(struct.pack("<I", len(piece) | 0x80000000))
        parts.append(piece)
    parts.append(struct.pack("<I", 0))
    return b"".join(parts)


def _decompress_ra(raw: bytes, total_bytes: int, kind: str) -> bytes:
    """Decode a gdsfmt random-access blocked stream (ZIP_RA / LZMA_RA)
    into one bytes object (see ``_decompress_ra_iter``)."""
    return b"".join(_decompress_ra_iter(raw, total_bytes, kind))


def _decompress_ra_iter(raw: bytes, total_bytes: int, kind: str):
    """Decode a gdsfmt random-access blocked stream (ZIP_RA / LZMA_RA),
    yielding one decompressed block at a time (so a large leaf never
    materializes its full uncompressed size — read_leaf_rows streams).

    The RA layout (gdsfmt dStream 'CdRA' classes) is a short stream header
    (algorithm magic, version, block-size code, block count) followed by
    independently compressed blocks, each preceded by a fixed-size header
    carrying the compressed/uncompressed sizes; newer versions may append a
    seek index after the last block. Rather than hard-coding those header
    encodings, this parser self-calibrates: each zlib/xz member marks its own
    start (magic bytes) and end (stream end), so block boundaries are located
    by scanning a bounded window past the previous block's end and validated
    by actually decompressing. Output is truncated at ``total_bytes`` (the
    node's uncompressed size), which also skips any trailing seek index.
    """
    got, pos, n = 0, 0, len(raw)
    # RA streams use a FIXED uncompressed block size: every block but the
    # last must decode to the same length, and the per-block header gap
    # (bytes between one member's end and the next's start) is constant.
    # Both invariants reject false boundary candidates whose bytes merely
    # look like a compression magic (e.g. ~1/1024 of random byte pairs
    # pass the 2-byte zlib header check).
    block_len: int | None = None
    header_gap: int | None = None

    def find_start(p: int) -> int:
        limit = min(n - 1, p + 64)
        while p < limit:
            if kind == "zlib":
                # zlib member header: CM=8, CINFO<=7, FCHECK makes the
                # 16-bit value divisible by 31
                if (raw[p] & 0x0F) == 0x08 and raw[p] <= 0x78 \
                        and ((raw[p] << 8) | raw[p + 1]) % 31 == 0:
                    return p
            elif kind == "xz":
                if raw[p : p + 6] == _XZ_MAGIC:
                    return p
            else:
                if raw[p : p + 4] == _LZ4_MAGIC:
                    return p
            p += 1
        return -1

    rawmv = memoryview(raw)

    def try_decode(p: int):
        """Attempt to decode one member at p: (chunk, consumed) or None.

        Feeds the decompressor a bounded window (grown geometrically on
        incomplete members) — ``raw[p:]`` would copy the whole remaining
        payload per block, O(n^2) over a multi-GB RA stream (a 33 GB
        GRM artifact read-back ran for an hour without yielding its
        first block)."""
        cap = 1 << 20
        while True:
            end = min(n, p + cap)
            try:
                if kind == "zlib":
                    d = zlib.decompressobj()
                    chunk = d.decompress(rawmv[p:end])
                    if d.eof:
                        return chunk, (end - p) - len(d.unused_data)
                elif kind == "xz":
                    d = lzma.LZMADecompressor(lzma.FORMAT_XZ)
                    chunk = d.decompress(rawmv[p:end])
                    if d.eof:
                        return chunk, (end - p) - len(d.unused_data)
                else:
                    return _lz4_frame_decompress(raw, p)
            except (zlib.error, lzma.LZMAError, ValueError, IndexError,
                    struct.error):
                return None
            if end >= n:
                return None  # member truncated at stream end
            cap *= 4

    def block_ok(chunk: bytes) -> bool:
        if block_len is None:
            return True  # first block calibrates the size
        if got + len(chunk) >= total_bytes:
            return len(chunk) <= block_len  # final block may be short
        return len(chunk) == block_len

    while got < total_bytes:
        chunk = None
        # constant header gap: try the calibrated offset first
        if header_gap is not None and pos + header_gap < n:
            r = try_decode(pos + header_gap)
            if r is not None and block_ok(r[0]):
                chunk, consumed = r
                p = pos + header_gap
        if chunk is None:
            p = find_start(pos)
            while p >= 0:
                r = try_decode(p)
                if r is not None and block_ok(r[0]):
                    chunk, consumed = r
                    break
                p = find_start(p + 1)
        if chunk is None:
            raise ValueError(
                f"RA stream parse failure at offset {pos} "
                f"({got}/{total_bytes} bytes decoded)")
        if block_len is None:
            block_len = len(chunk)
        elif header_gap is None:
            # calibrate from the SECOND block: the first gap also spans
            # the stream header, which is longer than per-block headers
            header_gap = p - pos
        if got + len(chunk) > total_bytes:
            chunk = chunk[: total_bytes - got]
        got += len(chunk)
        pos = p + consumed
        yield chunk


def _unpack_bit2(packed: np.ndarray, n: int) -> np.ndarray:
    """Unpack 2-bit values, first value in the low bits of each byte."""
    out = np.empty(packed.size * 4, dtype=np.uint8)
    out[0::4] = packed & 0x03
    out[1::4] = (packed >> 2) & 0x03
    out[2::4] = (packed >> 4) & 0x03
    out[3::4] = (packed >> 6) & 0x03
    return out[:n]


def _parse_dir(blob: bytes):
    """Folder directory: sequence of [6B size][fixed header][name] entries."""
    pos = 0
    while pos + 6 <= len(blob):
        esize = _u48(blob, pos)
        if esize < 31:
            break
        e = blob[pos : pos + esize]
        blockid = struct.unpack_from("<I", e, 12)[0]
        flags = struct.unpack_from("<I", e, 21)[0]
        nlen = e[30]
        name = e[31 : 31 + nlen].decode("utf-8", errors="replace")
        yield name, blockid, flags
        pos += esize


# Attribute value type codes observed in gdsfmt streams
def _parse_attrs(blob: bytes) -> dict[str, Any]:
    out: dict[str, Any] = {}
    pos = 0
    while pos < len(blob):
        nlen = blob[pos]
        pos += 1
        name = blob[pos : pos + nlen].decode("utf-8", errors="replace")
        pos += nlen
        if pos >= len(blob):
            out[name] = None
            break
        t = blob[pos]
        pos += 1
        if t == 0x00:  # NULL / flag attribute
            out[name] = None
        elif t == 0x01:  # int8
            out[name] = struct.unpack_from("<b", blob, pos)[0]; pos += 1
        elif t == 0x03:  # int16
            out[name] = struct.unpack_from("<h", blob, pos)[0]; pos += 2
        elif t == 0x05:  # int32
            out[name] = struct.unpack_from("<i", blob, pos)[0]; pos += 4
        elif t == 0x07:  # int64
            out[name] = struct.unpack_from("<q", blob, pos)[0]; pos += 8
        elif t == 0x0B:  # float32
            out[name] = struct.unpack_from("<f", blob, pos)[0]; pos += 4
        elif t == 0x0C:  # float64
            out[name] = struct.unpack_from("<d", blob, pos)[0]; pos += 8
        elif t == 0x0E:  # string, 1-byte length
            slen = blob[pos]; pos += 1
            out[name] = blob[pos : pos + slen].decode("utf-8", errors="replace")
            pos += slen
        elif t == 0x12:  # bool
            out[name] = bool(blob[pos]); pos += 1
        else:
            raise NotImplementedError(
                f"GDS attribute value type 0x{t:02x} for {name!r} "
                f"(context: {blob[max(0,pos-8):pos+16].hex()})")
    return out


def open_gds(path: str) -> GDSFile:
    return GDSFile(path)


# ===========================================================================
# GDS writer: emits a CoreArray file readable by gdsfmt/SNPRelate.
#
# Every node replays a byte-layout observed in reference-written files
# (hapmap_geno.gds), substituting only values: dVStr8/dInt32/dUInt8 nodes use
# the ZIP-coded leaf template, dBit2 uses the raw leaf template, folders use
# the directory template. See the format notes at the top of this module.

_T_NCHILD = TOK_NCHILD
_T_DIRBLOB = TOK_DIRBLOB
_T_NATTR = TOK_NATTR
_T_ATTRBLOB = TOK_ATTRBLOB
_T_CODER = TOK_CODER
_T_SIZES = bytes.fromhex("02c9466d50") + TOK_SIZES  # coder stream sizes
_T_CODERPARAM = bytes.fromhex("05ca466d50704121740103")
_T_NDIM = TOK_NDIM
_T_DIMS = TOK_DIMS_PFX
_T_PTR = TOK_PTR


def _pack7(name: str) -> bytes:
    v = 0
    for i, ch in enumerate(name):
        v |= (ord(ch) & 0x7F) << (7 * i)
    return v.to_bytes((7 * len(name) + 7) // 8, "little")


def _p48(v: int) -> bytes:
    return int(v).to_bytes(6, "little")


def _attr_bytes(attrs: dict) -> bytes:
    body = b""
    for name, val in attrs.items():
        nb = name.encode()
        body += bytes([len(nb)]) + nb
        if val is None:
            body += b"\x00"
        elif isinstance(val, bool):
            body += b"\x12" + bytes([1 if val else 0])
        elif isinstance(val, (int, np.integer)):
            body += b"\x05" + struct.pack("<i", int(val))
        elif isinstance(val, float):
            body += b"\x0c" + struct.pack("<d", val)
        else:
            sb = str(val).encode()
            body += b"\x0e" + bytes([len(sb)]) + sb
    out = _T_NATTR + struct.pack("<I", len(attrs))
    out += _T_ATTRBLOB + _p48(len(body) + 6) + body
    return out


def _leaf_node(classname: str, dims, data_blockid: int, attrs: dict,
               coder: str = "", total_bytes: int = 0,
               stored_bytes: int = 0) -> bytes:
    nb = _pack7(classname)
    body = struct.pack("<H", 7 if coder else 5)
    body += b"\x00\x01" + bytes([len(classname)]) + nb
    if coder:
        cb = coder.encode()
        body += _T_CODER + bytes([len(cb)]) + cb
        body += _T_SIZES + struct.pack("<QQ", total_bytes, stored_bytes)
        body += _T_CODERPARAM
    body += _T_NDIM + struct.pack("<H", len(dims))
    body += _T_DIMS + bytes([4 * len(dims)])
    for d in dims:
        body += struct.pack("<I", int(d))
    body += _T_PTR + struct.pack("<I", data_blockid)
    body += _attr_bytes(attrs)
    return _p48(len(body) + 6) + body


def _folder_node(children: "list[tuple[str, int, int]]", attrs: dict) -> bytes:
    """children: list of (name, blockid, flags)."""
    dirblob = b""
    for name, bid, flags in children:
        nb = name.encode()
        entry = b"\x03\x00\x09\x02\xf5\x00" + struct.pack("<I", bid)
        entry += bytes.fromhex("0944743112") + struct.pack("<I", flags)
        entry += bytes.fromhex("1644c66010") + bytes([len(nb)]) + nb
        dirblob += _p48(len(entry) + 6) + entry
    body = struct.pack("<H", 4)
    body += _T_NCHILD + struct.pack("<I", len(children))
    body += _T_DIRBLOB + _p48(len(dirblob) + 6) + dirblob
    body += _attr_bytes(attrs)
    return _p48(len(body) + 6) + body


class GDSWriter:
    """Low-level CoreArray writer (head-fragment-per-block layout)."""

    def __init__(self):
        self.blocks: list[bytes] = []  # index i -> block id i+1

    def add_block(self, content: bytes) -> int:
        self.blocks.append(content)
        return len(self.blocks)

    def reserve(self) -> int:
        self.blocks.append(b"")
        return len(self.blocks)

    def set_block(self, blockid: int, content: bytes):
        self.blocks[blockid - 1] = content

    def write(self, path: str, entry_id: int = 1):
        with open(path, "wb") as f:
            f.write(MAGIC + b"\x00\x01" + struct.pack("<I", entry_id))
            for i, content in enumerate(self.blocks):
                size = 22 + len(content)
                f.write(_p48(size | 0x800000000000))
                f.write(_p48(0))
                f.write(struct.pack("<I", i + 1))
                f.write(_p48(len(content)))
                f.write(content)


def _vstr_data(strings) -> bytes:
    return b"".join(str(s).encode() + b"\x00" for s in strings)


def _zip(data: bytes) -> bytes:
    import zlib as _z
    return _z.compress(data, 6)


def _zip_ra(data: bytes, block: int = 65536) -> bytes:
    """Emit a ZIP_RA-style blocked stream (our reader's RA layout: stream
    header, then per block a 7-byte [zsize u24][uzsize u32] header followed
    by an independent zlib member)."""
    import zlib as _z
    nblocks = -(-len(data) // block) if data else 0
    parts = [b"!ZIP_RA\x10\x04" + struct.pack("<I", nblocks)]
    for i in range(0, len(data), block):
        piece = data[i : i + block]
        z = _z.compress(piece, 6)
        parts.append((len(z) + 7).to_bytes(3, "little")
                     + struct.pack("<I", len(piece)) + z)
    return b"".join(parts)


def write_snp_gds(data, path: str, compress: bool = True,
                  snpfirstdim: bool = False):
    """Write a SNPData as a SNP_ARRAY GDS file (snpgdsCreateGeno-compatible
    layout: sample.id, snp.id, snp.position, snp.chromosome, snp.allele,
    optional snp.rs.id, genotype bit2)."""
    w = GDSWriter()
    root_id = w.reserve()
    children = []

    def leaf(name, classname, arr_bytes, dims, attrs=None, coder="ZIP"):
        if not compress:
            coder = ""
        node_id = w.reserve()
        if coder:
            stored = _zip_ra(arr_bytes) if coder.startswith("ZIP_RA") \
                else _zip(arr_bytes)
            data_id = w.add_block(stored)
            w.set_block(node_id, _leaf_node(classname, dims, data_id,
                                            attrs or {}, coder,
                                            len(arr_bytes), len(stored)))
        else:
            data_id = w.add_block(arr_bytes)
            w.set_block(node_id, _leaf_node(classname, dims, data_id,
                                            attrs or {}))
        children.append((name, node_id, 0))

    def str_or_int(name, values, attrs=None):
        values = np.asarray(values)
        if np.issubdtype(values.dtype, np.integer):
            leaf(name, "dInt32", values.astype("<i4").tobytes(),
                 (len(values),), attrs)
        elif np.issubdtype(values.dtype, np.floating):
            leaf(name, "dFloat64", values.astype("<f8").tobytes(),
                 (len(values),), attrs)
        else:
            leaf(name, "dVStr8", _vstr_data(values), (len(values),), attrs)

    str_or_int("sample.id", data.sample_id)
    str_or_int("snp.id", data.snp_id)
    if data.snp_rs_id is not None:
        str_or_int("snp.rs.id", data.snp_rs_id)
    str_or_int("snp.position", np.asarray(data.snp_position, np.int32))
    chrom = np.asarray(data.snp_chromosome)
    chrom_attrs = {"autosome.start": data.autosome_start,
                   "autosome.end": data.autosome_end}
    chrom_attrs.update({k: int(v) for k, v in data.chrom_codes.items()})
    if np.issubdtype(chrom.dtype, np.integer) and chrom.min() >= 0 \
            and chrom.max() < 256:
        leaf("snp.chromosome", "dUInt8", chrom.astype(np.uint8).tobytes(),
             (len(chrom),), chrom_attrs)
    else:
        str_or_int("snp.chromosome", chrom, chrom_attrs)
    if data.snp_allele is not None:
        str_or_int("snp.allele", data.snp_allele)

    # genotype: contiguous 2-bit stream (no per-row padding)
    dense = data.geno()  # (n_snp, n_samp)
    if snpfirstdim:
        flat = np.ascontiguousarray(dense.T).reshape(-1)
        dims = (data.n_samp, data.n_snp)
        gattr = {"snp.order": None}
    else:
        flat = dense.reshape(-1)
        dims = (data.n_snp, data.n_samp)
        gattr = {"sample.order": None}
    pad = (-len(flat)) % 4
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, np.uint8)])
    q = flat.reshape(-1, 4)
    packed = (q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4)
              | (q[:, 3] << 6)).astype(np.uint8)
    leaf("genotype", "dBit2", packed.tobytes(), dims, gattr, coder="")

    if data.sample_annot:
        annot_children = []
        for name, values in data.sample_annot.items():
            node_before = len(children)
            str_or_int(name, values)
            annot_children.append(children.pop(node_before))
        folder_id = w.add_block(
            _folder_node(annot_children, {"R.class": "data.frame"}))
        children.append(("sample.annot", folder_id, 2))

    w.set_block(root_id, _folder_node(children, {"FileFormat": "SNP_ARRAY"}))
    w.write(path, entry_id=root_id)

# ===========================================================================
# Streaming writer: fragments go straight to disk, and ONE coded leaf may
# be streamed through an incremental compressor in bounded memory — the
# out-of-core GRM artifact path (the reference streams GRM rows into the
# output GDS during computation, genPCA.cpp:1571-1583 grm_save_to_gds /
# R/IBD.R:592-613; this is the same discipline for our writer: output
# memory is O(row block), never O(n^2)).


class _StreamCoder:
    """Incremental coder for one streamed data block. Supports the same
    coders ``save_grm`` emits: '' (raw), ZIP (one zlib stream), LZMA (one
    xz stream) and ZIP_RA (independently-deflated 64 KB blocks with the
    reader's RA layout)."""

    def __init__(self, coder: str, ra_block: int = 65536):
        self.coder = coder
        self.total = 0
        self._buf = b""
        self._nblocks = 0
        self._ra_block = ra_block
        if coder == "ZIP":
            self._c = zlib.compressobj(6)
        elif coder == "LZMA":
            self._c = lzma.LZMACompressor()
        elif coder in ("", "ZIP_RA"):
            self._c = None
        else:
            raise ValueError(f"unsupported streaming coder {coder!r}")

    def header(self) -> bytes:
        """Stream header (ZIP_RA only; nblocks patched at finish via
        nblocks_offset)."""
        if self.coder == "ZIP_RA":
            return b"!ZIP_RA\x10\x04" + struct.pack("<I", 0)
        return b""

    nblocks_patch_offset = 9  # offset of the u32 nblocks inside header()

    def _ra_emit(self, piece: bytes) -> bytes:
        z = zlib.compress(piece, 6)
        self._nblocks += 1
        return ((len(z) + 7).to_bytes(3, "little")
                + struct.pack("<I", len(piece)) + z)

    def feed(self, raw: bytes) -> bytes:
        self.total += len(raw)
        if self.coder == "":
            return raw
        if self.coder == "ZIP_RA":
            # offset walk over a memoryview — `buf = buf[block:]` would
            # recopy the remainder per 64 KB block, O(n^2) on the
            # multi-GB row blocks the GRM artifact streams (a 4.9 GB
            # feed stalled for hours at 100k samples)
            if self._buf:
                raw = self._buf + raw
            mv = memoryview(raw)
            out = []
            off = 0
            end = len(raw) - self._ra_block
            while off <= end:
                out.append(self._ra_emit(mv[off: off + self._ra_block]))
                off += self._ra_block
            self._buf = bytes(mv[off:])
            return b"".join(out)
        return self._c.compress(raw)

    def finish(self) -> bytes:
        if self.coder == "":
            return b""
        if self.coder == "ZIP_RA":
            out = self._ra_emit(self._buf) if self._buf else b""
            self._buf = b""
            return out
        return self._c.flush()

    @property
    def nblocks(self) -> int:
        return self._nblocks


class GDSStreamWriter:
    """CoreArray writer that emits fragments directly to disk.

    Use ``emit(blockid, content)`` for in-memory blocks (same content
    builders as GDSWriter: ``_leaf_node`` / ``_folder_node``), and
    ``stream_leaf`` for one large array node whose data is produced as a
    sequence of byte chunks. Placeholder sizes (fragment length, coder
    total/stored bytes, ZIP_RA block count) are patched in place when the
    stream ends, so nothing larger than one caller-provided chunk is ever
    resident."""

    def __init__(self, path: str, entry_id: int = 1):
        self._f = open(path, "wb")
        self._f.write(MAGIC + b"\x00\x01" + struct.pack("<I", entry_id))

    def emit(self, blockid: int, content: bytes) -> None:
        f = self._f
        f.write(_p48((22 + len(content)) | 0x800000000000))
        f.write(_p48(0))
        f.write(struct.pack("<I", blockid))
        f.write(_p48(len(content)))
        f.write(content)

    def emit_leaf(self, node_id: int, data_id: int, name: str,
                  classname: str, raw: bytes, dims, coder: str = "",
                  attrs=None) -> tuple[str, int, int]:
        """Small (in-memory) leaf: compress + emit node and data blocks;
        returns the directory entry tuple."""
        if coder == "ZIP":
            stored = _zip(raw)
        elif coder == "ZIP_RA":
            stored = _zip_ra(raw)
        elif coder == "LZMA":
            stored = lzma.compress(raw)
        elif coder == "":
            stored = raw
        else:
            raise ValueError(f"unsupported coder {coder!r}")
        self.emit(node_id, _leaf_node(classname, dims, data_id, attrs or {},
                                      coder, len(raw), len(stored)))
        self.emit(data_id, stored)
        return (name, node_id, 0)

    def stream_leaf(self, node_id: int, data_id: int, classname: str,
                    dims, chunks, coder: str = "", attrs=None) -> None:
        """Stream one coded leaf: ``chunks`` yields raw byte pieces. The
        node block is written with placeholder coder sizes and patched
        after the data fragment closes."""
        f = self._f
        node_pos = f.tell()
        node_content = _leaf_node(classname, dims, data_id, attrs or {},
                                  coder or "ZIP", 0, 0)
        # even an uncoded stream writes the sizes token (coder 'ZIP'
        # template) when coder == ''? No: raw leaves carry no sizes --
        # emit the raw template and skip the size patch instead.
        if coder == "":
            node_content = _leaf_node(classname, dims, data_id, attrs or {})
        self.emit(node_id, node_content)
        sizes_at = -1
        if coder != "":
            idx = node_content.find(_T_SIZES)
            assert idx >= 0
            # fragment layout: 22-byte header then content
            sizes_at = node_pos + 22 + idx + len(_T_SIZES)

        sc = _StreamCoder(coder)
        frag_pos = f.tell()
        f.write(_p48(0))  # fragment size, patched
        f.write(_p48(0))
        f.write(struct.pack("<I", data_id))
        f.write(_p48(0))  # content length, patched
        head = sc.header()
        f.write(head)
        stored = len(head)
        for raw in chunks:
            b = sc.feed(bytes(raw))
            stored += len(b)
            f.write(b)
        b = sc.finish()
        stored += len(b)
        f.write(b)
        end = f.tell()
        f.seek(frag_pos)
        f.write(_p48((22 + stored) | 0x800000000000))
        f.seek(frag_pos + 16)
        f.write(_p48(stored))
        if sizes_at >= 0:
            f.seek(sizes_at)
            f.write(struct.pack("<QQ", sc.total, stored))
        if coder == "ZIP_RA":
            f.seek(frag_pos + 22 + _StreamCoder.nblocks_patch_offset)
            f.write(struct.pack("<I", sc.nblocks))
        f.seek(end)

    def close(self) -> None:
        self._f.close()


def read_leaf_rows(path: str, name: str, block_rows: int = 4096):
    """Stream a 2-D float/int leaf back as (row0, rows) blocks in bounded
    memory (incremental decompression; the scale-viable read-back for
    GRM artifacts written by ``save_grm``/``grm_tiles_to_gds``)."""
    f = GDSFile(path)  # mmapped; leaf bytes stream in O(step) pieces
    node = f.index(name)
    nrow, ncol = node.dims
    dt = np.dtype(GDSFile._DTYPES[node.classname]).newbyteorder("<")
    step = 1 << 20
    bid = node.data_blockid
    coder = node.coder

    def decoded_chunks():
        """Uniform decompressed-bytes stream for every coder — nothing
        larger than one compressed piece + one decoded piece lives at a
        time (the RA scanners still materialize the COMPRESSED block,
        whose self-calibrating boundary search needs random access)."""
        if coder == "":
            yield from f._blocks.iter_chunks(bid, step)
        elif coder.startswith("ZIP_RA"):
            yield from _decompress_ra_iter(f._blocks[bid],
                                           node.total_bytes, "zlib")
        elif coder.startswith("LZMA_RA"):
            yield from _decompress_ra_iter(f._blocks[bid],
                                           node.total_bytes, "xz")
        elif coder.startswith("ZIP"):
            dec = zlib.decompressobj()
            for piece in f._blocks.iter_chunks(bid, step):
                yield dec.decompress(piece)
            yield dec.flush()
        elif coder.startswith("LZMA"):
            dec = lzma.LZMADecompressor()
            for piece in f._blocks.iter_chunks(bid, step):
                if dec.eof:
                    break
                yield dec.decompress(piece)
        else:
            raise NotImplementedError(f"GDS coder {coder!r}")

    row_bytes = ncol * dt.itemsize
    src = decoded_chunks()
    parts: list[bytes] = []
    have = 0
    r0 = 0
    while r0 < nrow:
        take = min(block_rows, nrow - r0)
        need = take * row_bytes
        while have < need:
            piece = next(src, None)
            if piece is None:
                break
            parts.append(piece)
            have += len(piece)
        buf = b"".join(parts)
        chunk, rest = buf[:need], buf[need:]
        parts = [rest] if rest else []
        have = len(rest)
        arr = np.frombuffer(chunk, dt).reshape(take, ncol)
        yield r0, arr
        r0 += take
