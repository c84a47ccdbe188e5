// Host-side 2-bit genotype codec: the native IO runtime feeding the TPU
// engines (analog of the reference's packed-genotype codecs and
// CGenoReadBySNP block reader, dGenGWAS.cpp:1218-1535 — re-designed as a
// flat C API fusing decode + sample-subset + repack in one pass).
//
// Build: g++ -O3 -shared -fPIC -fopenmp -o _codec.so codec.cpp
// Loaded via ctypes (snprelate_tpu/native/__init__.py); all entry points
// use plain C types.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstddef>

#ifdef _OPENMP
#include <omp.h>
#endif

#if defined(__AVX2__)
#include <immintrin.h>
#endif

extern "C" {

// Decode 2-bit packed rows to uint8 genotypes.
// src: (n_rows, src_bytes); dst: (n_rows, n_out) with n_out <= 4*src_bytes.
void codec_decode2bit(const uint8_t *src, int64_t n_rows, int64_t src_bytes,
                      uint8_t *dst, int64_t n_out)
{
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < n_rows; r++) {
        const uint8_t *s = src + r * src_bytes;
        uint8_t *d = dst + r * n_out;
        int64_t full = n_out / 4;
        for (int64_t k = 0; k < full; k++) {
            uint8_t g = s[k];
            d[4 * k + 0] = g & 3;
            d[4 * k + 1] = (g >> 2) & 3;
            d[4 * k + 2] = (g >> 4) & 3;
            d[4 * k + 3] = (g >> 6) & 3;
        }
        int64_t rem = n_out & 3;
        if (rem) {
            uint8_t g = s[full];
            for (int64_t j = 0; j < rem; j++) {
                d[4 * full + j] = (g >> (2 * j)) & 3;
            }
        }
    }
}

// Pack uint8 genotypes (values 0..3) to 2-bit rows; the sample axis is
// padded with 3 (missing) to dst_bytes*4.
void codec_pack2bit(const uint8_t *src, int64_t n_rows, int64_t n_samp,
                    uint8_t *dst, int64_t dst_bytes)
{
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < n_rows; r++) {
        const uint8_t *s = src + r * n_samp;
        uint8_t *d = dst + r * dst_bytes;
        int64_t full = n_samp / 4;
        for (int64_t k = 0; k < full; k++) {
            d[k] = (uint8_t)((s[4 * k] & 3) | ((s[4 * k + 1] & 3) << 2) |
                             ((s[4 * k + 2] & 3) << 4) |
                             ((s[4 * k + 3] & 3) << 6));
        }
        if (full < dst_bytes) {
            int64_t rem = n_samp & 3;
            uint8_t g = 0;
            for (int64_t j = 0; j < 4; j++) {
                uint8_t v = (j < rem) ? (uint8_t)(s[4 * full + j] & 3) : 3;
                g |= (uint8_t)(v << (2 * j));
            }
            d[full] = g;
            for (int64_t k = full + 1; k < dst_bytes; k++)
                d[k] = 0xFF;  // all missing
        }
    }
}

// Fused: decode source rows (full sample set), gather a sample subset and
// re-pack — the hot host path when streaming a Workspace selection.
// src: (n_rows, src_bytes) over n_src_samp samples;
// samp_idx: (n_sel) int64 indices; dst: (n_rows, dst_bytes).
void codec_subset_repack(const uint8_t *src, int64_t n_rows,
                         int64_t src_bytes, const int64_t *samp_idx,
                         int64_t n_sel, uint8_t *dst, int64_t dst_bytes)
{
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < n_rows; r++) {
        const uint8_t *s = src + r * src_bytes;
        uint8_t *d = dst + r * dst_bytes;
        int64_t k = 0;
        for (; k + 4 <= n_sel; k += 4) {
            int64_t i0 = samp_idx[k], i1 = samp_idx[k + 1];
            int64_t i2 = samp_idx[k + 2], i3 = samp_idx[k + 3];
            uint8_t g0 = (s[i0 >> 2] >> ((i0 & 3) * 2)) & 3;
            uint8_t g1 = (s[i1 >> 2] >> ((i1 & 3) * 2)) & 3;
            uint8_t g2 = (s[i2 >> 2] >> ((i2 & 3) * 2)) & 3;
            uint8_t g3 = (s[i3 >> 2] >> ((i3 & 3) * 2)) & 3;
            d[k >> 2] = (uint8_t)(g0 | (g1 << 2) | (g2 << 4) | (g3 << 6));
        }
        if (k < n_sel) {
            uint8_t g = 0;
            for (int64_t j = 0; j < 4; j++) {
                uint8_t v = 3;
                if (k + j < n_sel) {
                    int64_t i = samp_idx[k + j];
                    v = (s[i >> 2] >> ((i & 3) * 2)) & 3;
                }
                g |= (uint8_t)(v << (2 * j));
            }
            d[k >> 2] = g;
        }
        for (int64_t b = (n_sel + 3) / 4; b < dst_bytes; b++)
            d[b] = 0xFF;
    }
}

// Per-SNP genotype sum and valid count over packed rows restricted to a
// sample subset (Get_AF_MR_perSNP analog, dGenGWAS.cpp:472-552).
void codec_snp_stats(const uint8_t *src, int64_t n_rows, int64_t src_bytes,
                     const int64_t *samp_idx, int64_t n_sel,
                     int64_t *gsum, int64_t *gnum)
{
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < n_rows; r++) {
        const uint8_t *s = src + r * src_bytes;
        int64_t sum = 0, num = 0;
        for (int64_t k = 0; k < n_sel; k++) {
            int64_t i = samp_idx[k];
            uint8_t v = (s[i >> 2] >> ((i & 3) * 2)) & 3;
            if (v < 3) { sum += v; num++; }
        }
        gsum[r] = sum;
        gnum[r] = num;
    }
}

int codec_num_threads(void)
{
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

// Cache-blocked strided matrix transpose: dst[j,i] = src[i,j] for an
// (n x m) source. Strides are in BYTES between consecutive rows; element
// size 4 or 8. Powers the GRM-artifact row assembly (tile(i,j)^T into
// the row block) where numpy's strided copy runs ~60 MB/s at 12k tiles;
// 64x64 blocks keep both access patterns inside L1/L2.
#define TRANSPOSE_IMPL(T)                                                  \
    const int64_t B = 64;                                                  \
    _Pragma("omp parallel for schedule(static)")                           \
    for (int64_t i0 = 0; i0 < n; i0 += B) {                                \
        int64_t i1 = i0 + B < n ? i0 + B : n;                              \
        for (int64_t j0 = 0; j0 < m; j0 += B) {                            \
            int64_t j1 = j0 + B < m ? j0 + B : m;                          \
            for (int64_t i = i0; i < i1; i++) {                            \
                const T *s = (const T *)(src + i * src_stride);            \
                for (int64_t j = j0; j < j1; j++) {                        \
                    *(T *)(dst + j * dst_stride + i * (int64_t)sizeof(T))  \
                        = s[j];                                            \
                }                                                          \
            }                                                              \
        }                                                                  \
    }

void codec_transpose_f32(const uint8_t *src, int64_t n, int64_t m,
                         int64_t src_stride, uint8_t *dst,
                         int64_t dst_stride)
{
    TRANSPOSE_IMPL(float)
}

void codec_transpose_f64(const uint8_t *src, int64_t n, int64_t m,
                         int64_t src_stride, uint8_t *dst,
                         int64_t dst_stride)
{
    TRANSPOSE_IMPL(double)
}

// Decode one raw LZ4 block (token / literals / 2-byte offset / match
// with overlap-replication semantics) — the native path behind
// io/gds.py::_lz4_block_decompress (the reference reads LZ4 nodes
// through gdsfmt's bundled native LZ4; a byte-loop in Python is ~1000x
// off for biobank-sized genotype nodes).
// Returns bytes written, -1 on malformed input, -2 if dst_cap is too
// small (caller retries with a larger buffer).
int64_t codec_lz4_block(const uint8_t *src, int64_t n, uint8_t *dst,
                        int64_t cap)
{
    int64_t i = 0, o = 0;
    while (i < n) {
        uint32_t token = src[i++];
        int64_t lit = (int64_t)(token >> 4);
        if (lit == 15) {
            uint8_t b;
            do {
                if (i >= n) return -1;
                b = src[i++];
                lit += b;
            } while (b == 255);
        }
        if (i + lit > n) return -1;
        if (o + lit > cap) return -2;
        memcpy(dst + o, src + i, (size_t)lit);
        i += lit;
        o += lit;
        if (i >= n) break;  // final sequence: literals only
        if (i + 2 > n) return -1;
        int64_t off = (int64_t)src[i] | ((int64_t)src[i + 1] << 8);
        i += 2;
        if (off == 0 || off > o) return -1;
        int64_t ml = (int64_t)(token & 15);
        if (ml == 15) {
            uint8_t b;
            do {
                if (i >= n) return -1;
                b = src[i++];
                ml += b;
            } while (b == 255);
        }
        ml += 4;
        if (o + ml > cap) return -2;
        if (off >= ml) {
            memcpy(dst + o, dst + o - off, (size_t)ml);
        } else {  // overlapping match: byte-wise replicates the pattern
            for (int64_t k = 0; k < ml; k++) dst[o + k] = dst[o + k - off];
        }
        o += ml;
    }
    return o;
}


// Parse the genotype columns of one VCF line (the tab-separated region
// starting at the first sample column) into REF-allele dosage codes
// (gnrParseVCF4 semantics, ConvToGDS.cpp:645-1013): count alleles equal to
// "0"; any "."/empty allele -> 3 (missing); haploid "0" -> 2, else 0;
// diploid+ -> min(count, 2). out must be pre-filled with 3; returns the
// number of cells parsed (<= n).
int64_t codec_vcf_gt(const char *s, int64_t len, int64_t gt_idx,
                     uint8_t *out, int64_t n)
{
    int64_t i = 0, cell = 0;
    while (cell < n && i <= len) {
#if defined(__AVX2__)
        // vector fast path: 8 consecutive 4-byte "a/b\t" diploid cells
        // per 32-byte load (the dominant shape when FORMAT is GT-only).
        // movemask bit patterns prove every group is exactly
        // [allele, '/'|'|', allele, '\t'] with single-char non-tab
        // alleles; any other shape falls to the scalar paths below for
        // one cell and the vector loop resumes.
        if (gt_idx == 0) {
            const __m256i v_sl = _mm256_set1_epi8('/');
            const __m256i v_pi = _mm256_set1_epi8('|');
            const __m256i v_tb = _mm256_set1_epi8('\t');
            const __m256i v_z0 = _mm256_set1_epi8('0');
            const __m256i v_dot = _mm256_set1_epi8('.');
            const __m256i v_one = _mm256_set1_epi8(1);
            const __m256i v_three = _mm256_set1_epi8(3);
            const __m256i pick = _mm256_setr_epi8(
                0, 4, 8, 12, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,
                -1, -1, 0, 4, 8, 12, -1, -1, -1, -1, -1, -1, -1, -1,
                -1, -1, -1, -1);
            while (cell + 8 <= n && i + 32 <= len) {
                __m256i v = _mm256_loadu_si256((const __m256i *)(s + i));
                uint32_t msep = (uint32_t)_mm256_movemask_epi8(
                    _mm256_or_si256(_mm256_cmpeq_epi8(v, v_sl),
                                    _mm256_cmpeq_epi8(v, v_pi)));
                uint32_t mtab = (uint32_t)_mm256_movemask_epi8(
                    _mm256_cmpeq_epi8(v, v_tb));
                if ((msep & 0x22222222u) != 0x22222222u ||
                    (mtab & 0x88888888u) != 0x88888888u ||
                    ((msep | mtab) & 0x55555555u) != 0)
                    break;
                __m256i is0 = _mm256_and_si256(
                    _mm256_cmpeq_epi8(v, v_z0), v_one);
                __m256i dos = _mm256_add_epi8(
                    is0, _mm256_srli_epi32(is0, 16));
                __m256i isdot = _mm256_cmpeq_epi8(v, v_dot);
                __m256i mis = _mm256_or_si256(
                    isdot, _mm256_srli_epi32(isdot, 16));
                __m256i res = _mm256_blendv_epi8(
                    _mm256_shuffle_epi8(dos, pick), v_three,
                    _mm256_shuffle_epi8(mis, pick));
                uint32_t lo = (uint32_t)_mm256_extract_epi32(res, 0);
                uint32_t hi = (uint32_t)_mm256_extract_epi32(res, 4);
                memcpy(out + cell, &lo, 4);
                memcpy(out + cell + 4, &hi, 4);
                cell += 8;
                i += 32;
            }
            if (cell >= n || i > len) break;
        }
#endif
        // fast path for the dominant shape when GT is the first FORMAT
        // field: a 3-char "x/y" (or "x|y") diploid call followed by
        // '\t', ':' or end-of-region. Anything else (haploid, multi-
        // digit alleles, triploid+) falls through to the general loop.
        if (gt_idx == 0 && i + 3 <= len) {
            char a = s[i], m = s[i + 1], b = s[i + 2];
            char t = (i + 3 < len) ? s[i + 3] : '\t';
            if ((m == '/' || m == '|') && (t == '\t' || t == ':') &&
                a != '/' && a != '|' && b != '/' && b != '|') {
                if (a != '.' && b != '.')
                    out[cell] = (uint8_t)((a == '0') + (b == '0'));
                cell++;
                if (t == ':') {
                    i += 3;
                    const char *nt = (const char *)memchr(
                        s + i, '\t', (size_t)(len - i));
                    i = nt ? (nt - s) + 1 : len + 1;
                } else {
                    i += 4;
                }
                continue;
            }
        }
        int64_t end = i;
        while (end < len && s[end] != '\t') end++;
        // locate the GT field inside [i, end)
        int64_t gstart = i, gend = end;
        if (gt_idx > 0) {
            int64_t fcount = 0, cur = i;
            gstart = -1;
            for (int64_t k = i; k <= end; k++) {
                if (k == end || s[k] == ':') {
                    if (fcount == gt_idx) { gstart = cur; gend = k; break; }
                    fcount++; cur = k + 1;
                }
            }
            if (gstart < 0) {  // fewer fields than gt_idx: first field
                gstart = i;
                gend = i;
                while (gend < end && s[gend] != ':') gend++;
            }
        } else {
            gend = i;
            while (gend < end && s[gend] != ':') gend++;
        }
        // parse '/'- or '|'-separated alleles
        int cnt = 0, nall = 0, bad = 0;
        int64_t k = gstart;
        if (k >= gend) bad = 1;
        while (k < gend) {
            int64_t t0 = k;
            while (k < gend && s[k] != '/' && s[k] != '|') k++;
            int64_t t1 = k;
            if (t1 == t0 || (t1 - t0 == 1 && s[t0] == '.')) bad = 1;
            else if (t1 - t0 == 1 && s[t0] == '0') cnt++;
            nall++;
            if (k < gend) {
                k++;               // skip the separator
                if (k == gend) {   // trailing separator: empty allele
                    bad = 1;
                    nall++;
                    break;
                }
            }
        }
        if (!bad && nall > 0)
            out[cell] = (nall >= 2) ? (cnt > 2 ? 2 : (uint8_t)cnt)
                                    : (cnt == 1 ? 2 : 0);
        cell++;
        if (end >= len) break;
        i = end + 1;
    }
    return cell;
}

// ---------------------------------------------------------------------
// Block VCF parser: processes every COMPLETE data line in buf[0, len),
// emitting packed 2-bit genotype rows and the byte offsets of the nine
// fixed fields — the whole-line hot loop of gnrParseVCF4
// (ConvToGDS.cpp:645-1013) without any per-line work on the Python
// side (text decode + split + re-encode ran ~54 MB/s; this runs at
// memory speed and the caller only materializes small metadata
// strings from the offset table).
//
// mode 0 = biallelic.only (skip lines whose REF/ALT are not single
// A/C/G/T bases), mode 1 = copy.num.of.ref (keep everything).
// Header lines ('#') are skipped and counted into *consumed.
// meta_out row r holds 14 int64s: start/end offsets (absolute in buf)
// of CHROM, POS, ID, REF, ALT, QUAL, FILTER.
// Returns rows emitted; *consumed = bytes up to the end of the last
// processed (or skipped) line. Parsing stops at max_rows or when the
// next line is incomplete (no '\n' in the buffer).
int64_t codec_vcf_block(const uint8_t *buf, int64_t len, int64_t nsamp,
                        int mode, int64_t max_rows, uint8_t *row_tmp,
                        uint8_t *packed_out, int64_t nb,
                        int64_t *meta_out, int64_t *consumed)
{
    int64_t i = 0, rows = 0;
    *consumed = 0;
    while (i < len && rows < max_rows) {
        const uint8_t *nl =
            (const uint8_t *)memchr(buf + i, '\n', (size_t)(len - i));
        if (!nl) break;  // incomplete line: caller carries it over
        int64_t end = nl - buf;
        int64_t line_end = end;
        if (line_end > i && buf[line_end - 1] == '\r') line_end--;
        if (buf[i] == '#') { i = end + 1; *consumed = i; continue; }
        // locate the 9 fixed fields
        int64_t fs[10], fe[10];
        int nf = 0;
        int64_t p = i;
        while (nf < 9 && p <= line_end) {
            fs[nf] = p;
            while (p < line_end && buf[p] != '\t') p++;
            fe[nf] = p;
            nf++;
            p++;
        }
        if (nf == 9 && p <= line_end) { fs[9] = p; fe[9] = line_end; nf = 10; }
        if (nf < 10) { i = end + 1; *consumed = i; continue; }
        if (mode == 0) {
            // biallelic SNV only: REF and ALT single A/C/G/T
            int64_t rl = fe[3] - fs[3], al = fe[4] - fs[4];
            uint8_t rc = rl == 1 ? buf[fs[3]] : 0;
            uint8_t ac = al == 1 ? buf[fs[4]] : 0;
            const char *ok = "ACGTacgt";
            if (rl != 1 || al != 1 || !rc || !ac ||
                !memchr(ok, rc, 8) || !memchr(ok, ac, 8)) {
                i = end + 1; *consumed = i; continue;
            }
        }
        // GT index within FORMAT
        int64_t gt_idx = -1, fcount = 0, cur = fs[8];
        for (int64_t k = fs[8]; k <= fe[8]; k++) {
            if (k == fe[8] || buf[k] == ':') {
                if (k - cur == 2 && buf[cur] == 'G' && buf[cur + 1] == 'T')
                    { gt_idx = fcount; break; }
                fcount++; cur = k + 1;
            }
        }
        if (gt_idx < 0) { i = end + 1; *consumed = i; continue; }
        memset(row_tmp, 3, (size_t)nsamp);
        codec_vcf_gt((const char *)(buf + fs[9]), fe[9] - fs[9], gt_idx,
                     row_tmp, nsamp);
        codec_pack2bit(row_tmp, 1, nsamp, packed_out + rows * nb, nb);
        int64_t *m = meta_out + rows * 14;
        for (int k = 0; k < 7; k++) { m[2 * k] = fs[k]; m[2 * k + 1] = fe[k]; }
        rows++;
        i = end + 1;
        *consumed = i;
    }
    return rows;
}

// Render packed 2-bit genotype rows as VCF data lines (the synthetic-
// VCF writer for ingestion benchmarks; 4-byte cell memcpy per genotype
// runs at ~1 GB/s). Line: "<chrom>\t<pos>\trs<pos>\tA\tG\t.\tPASS\t.\t
// GT\t<cells>\n" with cells "0/0|0/1|1/1|./." from the dosage codes
// (dosage 2 = REF-hom = "0/0"). Returns bytes written; caller sizes
// out for (40 + 4*n_samp) per row.
int64_t codec_packed_to_vcf(const uint8_t *rows, int64_t n_rows,
                            int64_t nb, int64_t n_samp, int64_t chrom,
                            int64_t pos0, char *out)
{
    static const char cell[4][4] = {
        {'1', '/', '1', '\t'},   // dosage 0: no REF allele
        {'0', '/', '1', '\t'},   // dosage 1
        {'0', '/', '0', '\t'},   // dosage 2
        {'.', '/', '.', '\t'}};  // missing
    char *o = out;
    for (int64_t r = 0; r < n_rows; r++) {
        int64_t pos = pos0 + r;
        o += sprintf(o, "%lld\t%lld\trs%lld\tA\tG\t.\tPASS\t.\tGT\t",
                     (long long)chrom, (long long)pos, (long long)pos);
        const uint8_t *p = rows + r * nb;
        int64_t full = n_samp / 4;
        for (int64_t k = 0; k < full; k++) {
            uint8_t g = p[k];
            memcpy(o, cell[g & 3], 4);
            memcpy(o + 4, cell[(g >> 2) & 3], 4);
            memcpy(o + 8, cell[(g >> 4) & 3], 4);
            memcpy(o + 12, cell[(g >> 6) & 3], 4);
            o += 16;
        }
        for (int64_t j = 4 * full; j < n_samp; j++) {
            memcpy(o, cell[(p[j >> 2] >> ((j & 3) * 2)) & 3], 4);
            o += 4;
        }
        o[-1] = '\n';  // final cell's tab becomes the newline
    }
    return o - out;
}

// Flip REF<->ALT dosage on packed rows in place: 2-bit codes 0<->2,
// 1 and 3 unchanged (the ref.allele switch of gnrParseVCF4, applied
// after parsing because the variant index is defined by parse order).
void codec_flip_packed(uint8_t *rows, int64_t n_rows, int64_t nb)
{
    uint8_t lut[256];
    for (int v = 0; v < 256; v++) {
        int o = 0;
        for (int k = 0; k < 4; k++) {
            int c = (v >> (2 * k)) & 3;
            if (c == 0) c = 2; else if (c == 2) c = 0;
            o |= c << (2 * k);
        }
        lut[v] = (uint8_t)o;
    }
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < n_rows; r++) {
        uint8_t *p = rows + r * nb;
        for (int64_t b = 0; b < nb; b++) p[b] = lut[p[b]];
    }
}

// ---------------------------------------------------------------------
// Synthetic-cohort row generator: fills packed 2-bit genotype rows for
// SNPs [snp0, snp0 + n_rows) of an (n_snp x n_samp) cohort directly on
// the host — the fast path for building real ON-DISK stores at biobank
// scale (the device-PRNG GenSlabSource in tools/bench_biobank.py ships
// every byte over the accelerator link; this writes the same structure
// at memory speed). Deterministic per (seed, absolute SNP index), so any
// row-range partitioning regenerates identical data.
//
// Structure (mirrors GenSlabSource, tools/bench_biobank.py:38-128):
//   - per-SNP base allele freq p ~ U(0.1, 0.9), keyed by SNP index;
//   - two populations split at sample pop_boundary, freqs shifted by
//     -+structure (clipped to [0.01, 0.99]) so PC1 separates them;
//   - HWE genotypes via two 15-bit threshold draws; missing where an
//     8-bit field < miss_u8 (3 -> ~1.17%);
//   - planted relatives, applied after the base row: n_dup duplicate
//     pairs (dst := src, KING kinship 0.5) and n_pc parent-child pairs
//     (dst := one transmitted allele of src + one population allele,
//     kinship 0.25, IBS0 ~ 0) — ground truth for relatedness screens.
// dst: (n_rows, dst_bytes) packed rows, samples padded with missing.

static inline uint64_t gen_splitmix64(uint64_t *x)
{
    uint64_t z = (*x += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
}

typedef struct { uint64_t s[4]; } gen_xoshiro;

static inline uint64_t gen_rotl(uint64_t x, int k)
{
    return (x << k) | (x >> (64 - k));
}

static inline uint64_t gen_next(gen_xoshiro *g)
{
    // xoshiro256** (public-domain construction)
    uint64_t *s = g->s;
    uint64_t r = gen_rotl(s[1] * 5, 7) * 9;
    uint64_t t = s[1] << 17;
    s[2] ^= s[0]; s[3] ^= s[1]; s[1] ^= s[2]; s[0] ^= s[3];
    s[2] ^= t; s[3] = gen_rotl(s[3], 45);
    return r;
}

void codec_gen_cohort(uint64_t seed, int64_t snp0, int64_t n_rows,
                      int64_t n_samp, int64_t pop_boundary,
                      double structure, uint8_t miss_u8,
                      const int64_t *dup_src, const int64_t *dup_dst,
                      int64_t n_dup, const int64_t *pc_src,
                      const int64_t *pc_dst, int64_t n_pc,
                      uint8_t *dst, int64_t dst_bytes)
{
#pragma omp parallel
    {
        uint8_t *row = new uint8_t[(size_t)n_samp];
#pragma omp for schedule(static)
        for (int64_t r = 0; r < n_rows; r++) {
            int64_t snp = snp0 + r;
            uint64_t z = seed ^ ((uint64_t)snp * 0x9E3779B97F4A7C15ULL);
            gen_xoshiro g;
            uint64_t zc = z;
            for (int k = 0; k < 4; k++) g.s[k] = gen_splitmix64(&zc);
            double p = 0.1 + 0.8 * ((double)(gen_splitmix64(&zc) >> 11)
                                    * (1.0 / 9007199254740992.0));
            double pa = p - structure, pb = p + structure;
            if (pa < 0.01) pa = 0.01; if (pa > 0.99) pa = 0.99;
            if (pb < 0.01) pb = 0.01; if (pb > 0.99) pb = 0.99;
            uint32_t p15a = (uint32_t)(pa * 32768.0);
            uint32_t p15b = (uint32_t)(pb * 32768.0);
            uint32_t p15 = p15a;
            for (int64_t i = 0; i < n_samp; i++) {
                if (i == pop_boundary) p15 = p15b;
                uint64_t u = gen_next(&g);
                uint8_t a1 = ((uint32_t)u & 0x7FFF) < p15;
                uint8_t a2 = ((uint32_t)(u >> 15) & 0x7FFF) < p15;
                uint8_t v = (uint8_t)(a1 + a2);
                if (((uint32_t)(u >> 30) & 0xFF) < miss_u8) v = 3;
                row[i] = v;
            }
            for (int64_t d = 0; d < n_dup; d++)
                row[dup_dst[d]] = row[dup_src[d]];
            for (int64_t d = 0; d < n_pc; d++) {
                uint64_t u = gen_next(&g);
                uint8_t gs = row[pc_src[d]];
                if (gs == 3) continue;  // src missing: keep own genotype
                uint8_t trans = (gs == 2) ? 1
                              : (gs == 1 ? (uint8_t)(u & 1) : 0);
                uint32_t pc15 = pc_dst[d] < pop_boundary ? p15a : p15b;
                uint8_t other = ((uint32_t)(u >> 1) & 0x7FFF) < pc15;
                uint8_t v = (uint8_t)(trans + other);
                if (((uint32_t)(u >> 16) & 0xFF) < miss_u8) v = 3;
                row[pc_dst[d]] = v;
            }
            codec_pack2bit(row, 1, n_samp, dst + r * dst_bytes, dst_bytes);
        }
        delete[] row;
    }
}

}  // extern "C"
