"""Native host runtime: C++ genotype codec loaded via ctypes.

The shared library is compiled on first use with g++ (cached next to the
source). All users go through the numpy-compatible wrappers below, which
fall back to pure numpy when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "codec.cpp")
_SO = os.path.join(_HERE, "_codec.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    # -march=native unlocks the AVX2 VCF cell parser and wider codegen
    # for the byte loops; the .so is built on (and private to) the host
    # that runs it. Fallback chain for toolchains without the flags.
    for flags in (["-O3", "-march=native", "-funroll-loops", "-fopenmp"],
                  ["-O3", "-fopenmp"],
                  ["-O3"]):
        try:
            subprocess.run(["g++", *flags, "-shared", "-fPIC", "-o",
                            _SO, _SRC], check=True, capture_output=True,
                           timeout=120)
            return True
        except Exception:
            continue
    return False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64 = ctypes.c_int64
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.codec_decode2bit.argtypes = [u8p, i64, i64, u8p, i64]
        lib.codec_pack2bit.argtypes = [u8p, i64, i64, u8p, i64]
        lib.codec_subset_repack.argtypes = [u8p, i64, i64, i64p, i64, u8p,
                                            i64]
        lib.codec_snp_stats.argtypes = [u8p, i64, i64, i64p, i64, i64p, i64p]
        try:
            lib.codec_vcf_gt.argtypes = [ctypes.c_char_p, i64, i64, u8p,
                                         i64]
            lib.codec_vcf_gt.restype = i64
        except AttributeError:
            pass  # stale .so without the VCF parser: wrappers fall back
        try:
            lib.codec_lz4_block.argtypes = [u8p, i64, u8p, i64]
            lib.codec_lz4_block.restype = i64
        except AttributeError:
            pass  # stale .so without LZ4: wrapper falls back
        try:
            lib.codec_transpose_f32.argtypes = [u8p, i64, i64, i64, u8p,
                                                i64]
            lib.codec_transpose_f64.argtypes = [u8p, i64, i64, i64, u8p,
                                                i64]
        except AttributeError:
            pass  # stale .so without transpose: wrapper falls back
        try:
            lib.codec_gen_cohort.argtypes = [
                ctypes.c_uint64, i64, i64, i64, i64, ctypes.c_double,
                ctypes.c_uint8, i64p, i64p, i64, i64p, i64p, i64, u8p,
                i64]
        except AttributeError:
            pass  # stale .so without the generator: wrapper falls back
        try:
            lib.codec_vcf_block.argtypes = [u8p, i64, i64, ctypes.c_int,
                                            i64, u8p, u8p, i64, i64p,
                                            i64p]
            lib.codec_vcf_block.restype = i64
            lib.codec_flip_packed.argtypes = [u8p, i64, i64]
        except AttributeError:
            pass  # stale .so without the block VCF parser
        try:
            lib.codec_packed_to_vcf.argtypes = [u8p, i64, i64, i64, i64,
                                                i64, ctypes.c_char_p]
            lib.codec_packed_to_vcf.restype = i64
        except AttributeError:
            pass  # stale .so without the VCF renderer
        lib.codec_num_threads.restype = ctypes.c_int
        _lib = lib
        return _lib


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def subset_repack(packed: np.ndarray, samp_idx: np.ndarray,
                  dst_bytes: int | None = None) -> np.ndarray:
    """Fused decode + sample gather + 2-bit repack of packed rows.

    packed: (n_rows, src_bytes) uint8; samp_idx: int64 sample indices.
    Returns (n_rows, dst_bytes) uint8, padded with missing.
    """
    packed = np.ascontiguousarray(packed, np.uint8)
    samp_idx = np.ascontiguousarray(samp_idx, np.int64)
    n_rows, src_bytes = packed.shape
    n_sel = len(samp_idx)
    if dst_bytes is None:
        dst_bytes = -(-n_sel // 4)
    lib = get_lib()
    if lib is None:  # numpy fallback
        from ..io.store import pack2bit, unpack2bit

        dense = unpack2bit(packed, src_bytes * 4)[:, samp_idx]
        out = pack2bit(dense)
        if out.shape[1] < dst_bytes:
            out = np.pad(out, ((0, 0), (0, dst_bytes - out.shape[1])),
                         constant_values=0xFF)
        return out
    out = np.empty((n_rows, dst_bytes), np.uint8)
    lib.codec_subset_repack(_u8p(packed), n_rows, src_bytes,
                            _i64p(samp_idx), n_sel, _u8p(out), dst_bytes)
    return out


def snp_stats_packed(packed: np.ndarray, samp_idx: np.ndarray):
    """Per-row (SNP) genotype sum and valid count over a sample subset."""
    packed = np.ascontiguousarray(packed, np.uint8)
    samp_idx = np.ascontiguousarray(samp_idx, np.int64)
    n_rows, src_bytes = packed.shape
    lib = get_lib()
    if lib is None:
        from ..io.store import unpack2bit

        dense = unpack2bit(packed, src_bytes * 4)[:, samp_idx]
        valid = dense < 3
        return (np.where(valid, dense, 0).sum(1).astype(np.int64),
                valid.sum(1).astype(np.int64))
    gsum = np.empty(n_rows, np.int64)
    gnum = np.empty(n_rows, np.int64)
    lib.codec_snp_stats(_u8p(packed), n_rows, src_bytes, _i64p(samp_idx),
                        len(samp_idx), _i64p(gsum), _i64p(gnum))
    return gsum, gnum


def vcf_gt_line(rest: bytes, gt_idx: int, n: int):
    """Genotype codes for one VCF line's sample-column region (see
    codec_vcf_gt); returns None when the native library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "codec_vcf_gt"):
        return None
    out = np.full(n, 3, np.uint8)
    lib.codec_vcf_gt(rest, len(rest), gt_idx, _u8p(out), n)
    return out


def transpose_into(dst: np.ndarray, src: np.ndarray) -> None:
    """dst[:] = src.T with a cache-blocked kernel (float32/float64).

    numpy's strided transpose copy runs ~60 MB/s at super-tile sizes —
    this is the GRM-artifact assembly's hot spot (half the tile volume
    crosses it). Both arrays must have contiguous ELEMENTS within a row
    (arbitrary row pitch is fine, so ``rows[:, c0:c0+nc]`` views work).
    Falls back to a 512-block numpy transpose without the library."""
    n, m = src.shape
    if dst.shape != (m, n):
        raise ValueError(f"dst shape {dst.shape} != transpose of "
                         f"src shape {src.shape}")
    if dst.dtype != src.dtype:
        raise ValueError(f"dtype mismatch: dst {dst.dtype} vs src "
                         f"{src.dtype}")
    lib = get_lib()
    esz = src.dtype.itemsize
    fn = None
    if lib is not None and src.dtype in (np.float32, np.float64):
        fn = getattr(lib, f"codec_transpose_f{esz * 8}", None)
    if (fn is not None and src.strides[1] == esz
            and dst.strides[1] == esz and src.strides[0] > 0
            and dst.strides[0] > 0):
        fn(_as_u8(src), n, m, src.strides[0], _as_u8(dst), dst.strides[0])
        return
    B = 512
    for i0 in range(0, n, B):
        i1 = min(i0 + B, n)
        for j0 in range(0, m, B):
            j1 = min(j0 + B, m)
            dst[j0:j1, i0:i1] = src[i0:i1, j0:j1].T


def _as_u8(a: np.ndarray):
    """Raw base pointer of ``a`` as uint8* (works for strided views)."""
    return ctypes.cast(a.ctypes.data, ctypes.POINTER(ctypes.c_uint8))


def lz4_block(src: bytes, expected: int | None = None):
    """Decode one raw LZ4 block natively; None when the library (or the
    symbol, for a stale .so) is unavailable — io/gds.py then runs its
    pure-python decoder. ``expected`` sizes the output buffer when the
    caller knows the decompressed length (GDS block streams do)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "codec_lz4_block"):
        return None
    srcb = np.frombuffer(src, np.uint8)
    cap = expected if expected else max(4 << 20, 32 * len(src))
    while True:
        out = np.empty(cap, np.uint8)
        n = lib.codec_lz4_block(_u8p(srcb), len(srcb), _u8p(out), cap)
        if n == -2:
            cap *= 4
            continue
        if n < 0:
            raise ValueError("LZ4 block: malformed input")
        return out[:n].tobytes()


def _py_splitmix64(state: int):
    state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = state
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return state, z ^ (z >> 31)


def _py_gen_row(seed, snp, n_samp, pop_boundary, structure, miss_u8,
                dup, pc):
    """Pure-python replication of one codec_gen_cohort row (compiler-less
    fallback + differential test oracle). Returns uint8 genotypes."""
    M = 0xFFFFFFFFFFFFFFFF
    z = (seed ^ ((snp * 0x9E3779B97F4A7C15) & M)) & M
    s = []
    for _ in range(4):
        z, v = _py_splitmix64(z)
        s.append(v)
    z, pu = _py_splitmix64(z)
    p = 0.1 + 0.8 * ((pu >> 11) / 9007199254740992.0)
    p15 = []
    for shift in (-structure, structure):
        q = min(max(p + shift, 0.01), 0.99)
        p15.append(int(q * 32768.0))

    def rotl(x, k):
        return ((x << k) | (x >> (64 - k))) & M

    def nxt():
        r = (rotl((s[1] * 5) & M, 7) * 9) & M
        t = (s[1] << 17) & M
        s[2] ^= s[0]
        s[3] ^= s[1]
        s[1] ^= s[2]
        s[0] ^= s[3]
        s[2] ^= t
        s[3] = rotl(s[3], 45)
        return r

    row = np.empty(n_samp, np.uint8)
    for i in range(n_samp):
        th = p15[0] if i < pop_boundary else p15[1]
        u = nxt()
        v = int((u & 0x7FFF) < th) + int(((u >> 15) & 0x7FFF) < th)
        if ((u >> 30) & 0xFF) < miss_u8:
            v = 3
        row[i] = v
    for a, b in dup:
        row[b] = row[a]
    for a, b in pc:
        u = nxt()
        gs = row[a]
        if gs == 3:
            continue
        trans = 1 if gs == 2 else (u & 1 if gs == 1 else 0)
        th = p15[0] if b < pop_boundary else p15[1]
        v = int(trans) + int(((u >> 1) & 0x7FFF) < th)
        if ((u >> 16) & 0xFF) < miss_u8:
            v = 3
        row[b] = v
    return row


def gen_cohort_rows(seed: int, snp0: int, n_rows: int, n_samp: int,
                    pop_boundary: int, structure: float, miss_u8: int,
                    dup_pairs=None, pc_pairs=None,
                    dst_bytes: int | None = None) -> np.ndarray:
    """Packed 2-bit rows [snp0, snp0+n_rows) of the synthetic two-
    population cohort with planted relatives (see codec_gen_cohort).
    Deterministic in (seed, absolute SNP index) alone — any row-range
    partition regenerates identical bytes."""
    if dst_bytes is None:
        dst_bytes = -(-n_samp // 4)
    dup = np.asarray(dup_pairs if dup_pairs is not None else [],
                     np.int64).reshape(-1, 2)
    pc = np.asarray(pc_pairs if pc_pairs is not None else [],
                    np.int64).reshape(-1, 2)
    for arr in (dup, pc):
        if arr.size and (arr.min() < 0 or arr.max() >= n_samp):
            raise ValueError("planted pair index outside the cohort")
    out = np.empty((n_rows, dst_bytes), np.uint8)
    lib = get_lib()
    if lib is not None and hasattr(lib, "codec_gen_cohort"):
        ds = np.ascontiguousarray(dup[:, 0])
        dd = np.ascontiguousarray(dup[:, 1])
        ps = np.ascontiguousarray(pc[:, 0])
        pd = np.ascontiguousarray(pc[:, 1])
        lib.codec_gen_cohort(
            ctypes.c_uint64(seed), snp0, n_rows, n_samp, pop_boundary,
            ctypes.c_double(structure), ctypes.c_uint8(miss_u8),
            _i64p(ds), _i64p(dd), len(ds), _i64p(ps), _i64p(pd),
            len(ps), _u8p(out), dst_bytes)
        return out
    from ..io.store import pack2bit

    dupl = [tuple(x) for x in dup]
    pcl = [tuple(x) for x in pc]
    for r in range(n_rows):
        row = _py_gen_row(seed, snp0 + r, n_samp, pop_boundary,
                          structure, miss_u8, dupl, pcl)
        out[r] = pack2bit(row[None, :])[0, :dst_bytes]
    return out


def vcf_parse_block(data: bytes, nsamp: int, biallelic_only: bool,
                    max_rows: int = 1 << 16):
    """Parse complete VCF data lines from a byte block (codec_vcf_block).

    Returns (packed_rows (R, nb) uint8, meta (R, 14) int64 field
    offsets into ``data``, consumed_bytes) or None without the native
    library. Header lines are skipped; an incomplete trailing line is
    left unconsumed for the caller to carry into the next block."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "codec_vcf_block"):
        return None
    buf = np.frombuffer(data, np.uint8)
    nb = -(-nsamp // 4)
    total_rows = 0
    total_consumed = 0
    outs, metas = [], []
    row_tmp = np.empty(max(nsamp, 1), np.uint8)
    while True:
        packed = np.empty((max_rows, nb), np.uint8)
        meta = np.empty((max_rows, 14), np.int64)
        consumed = np.zeros(1, np.int64)
        sub = buf[total_consumed:]
        n = lib.codec_vcf_block(
            _u8p(sub), len(sub), nsamp, 0 if biallelic_only else 1,
            max_rows, _u8p(row_tmp), _u8p(packed), nb, _i64p(meta),
            _i64p(consumed))
        if n:
            outs.append(packed[:n])
            metas.append(meta[:n] + total_consumed)
        total_rows += int(n)
        total_consumed += int(consumed[0])
        if n < max_rows:
            break
    if not outs:
        return (np.zeros((0, nb), np.uint8), np.zeros((0, 14), np.int64),
                total_consumed)
    return (np.concatenate(outs), np.concatenate(metas), total_consumed)


def flip_packed_rows(rows: np.ndarray) -> None:
    """In-place REF<->ALT dosage flip of packed 2-bit rows (codes 0<->2,
    1/3 unchanged)."""
    lib = get_lib()
    rows = np.ascontiguousarray(rows)
    if lib is not None and hasattr(lib, "codec_flip_packed"):
        lib.codec_flip_packed(_u8p(rows), rows.shape[0], rows.shape[1])
        return rows
    lut = np.empty(256, np.uint8)
    for v in range(256):
        o = 0
        for k in range(4):
            c = (v >> (2 * k)) & 3
            c = 2 if c == 0 else (0 if c == 2 else c)
            o |= c << (2 * k)
        lut[v] = o
    rows[:] = lut[rows]
    return rows


def packed_rows_to_vcf(rows: np.ndarray, n_samp: int, chrom: int,
                       pos0: int) -> bytes:
    """Render packed 2-bit rows as VCF data lines (codec_packed_to_vcf);
    the synthetic-VCF writer for ingestion benchmarks."""
    rows = np.ascontiguousarray(rows, np.uint8)
    n_rows, nb = rows.shape
    cap = int(n_rows * (48 + 4 * n_samp))
    out = ctypes.create_string_buffer(cap)
    lib = get_lib()
    if lib is None or not hasattr(lib, "codec_packed_to_vcf"):
        from ..io.store import unpack2bit

        cells = np.array(["1/1", "0/1", "0/0", "./."])
        lines = []
        dense = unpack2bit(rows, n_samp)
        for r in range(n_rows):
            pos = pos0 + r
            lines.append(f"{chrom}\t{pos}\trs{pos}\tA\tG\t.\tPASS\t.\t"
                         "GT\t" + "\t".join(cells[dense[r]]))
        return ("\n".join(lines) + "\n").encode()
    n = lib.codec_packed_to_vcf(_u8p(rows), n_rows, nb, n_samp, chrom,
                                pos0, out)
    return out.raw[:n]
