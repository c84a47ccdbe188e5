"""Format converters (reference: R/Conversion.R, R/Conversion2.R +
src/ConvToGDS.cpp).

All converters go through the in-memory SNPData container (the analog of a
SNP GDS file); `io.gds.write_snp_gds` can then emit a CoreArray GDS readable
by the reference R package.

- PLINK BED/BIM/FAM <-> SNPData (snpgdsBED2GDS R/Conversion.R:433,
  snpgdsGDS2BED :310; 2-bit code map cvt={2,3,1,0}, ConvToGDS.cpp:586)
- VCF4 -> SNPData (snpgdsVCF2GDS R/Conversion.R:972-1155,
  gnrParseVCF4 ConvToGDS.cpp:645-1013)
- PLINK PED/MAP <-> SNPData (snpgdsPED2GDS :132, snpgdsGDS2PED :26)
- Oxford GEN -> SNPData (snpgdsGEN2GDS :795)
- EIGENSTRAT output (snpgdsGDS2Eigen :695)
"""

from __future__ import annotations

import gzip
import os
import numpy as np

from .store import SNPData, pack2bit
from ..native import flip_packed_rows, vcf_gt_line, vcf_parse_block

_BED_CVT = np.array([2, 3, 1, 0], np.uint8)  # ConvToGDS.cpp:586
_BED_INV = {2: 0, 3: 1, 1: 2, 0: 3}

_BED_BYTE_LUT = None


def _bed_byte_lut() -> np.ndarray:
    """256-entry byte LUT remapping a packed PLINK BED byte (4 genotypes,
    2 bits each, code map _BED_CVT) straight to our packed 2-bit coding —
    snp-major BED -> packed store is then a pure table lookup, never a
    dense genotype matrix."""
    global _BED_BYTE_LUT
    if _BED_BYTE_LUT is None:
        v = np.arange(256, dtype=np.uint16)
        out = np.zeros(256, np.uint16)
        for k in range(4):
            out |= _BED_CVT[(v >> (2 * k)) & 3].astype(np.uint16) \
                << (2 * k)
        _BED_BYTE_LUT = out.astype(np.uint8)
    return _BED_BYTE_LUT

CHROM_CODE_DEFAULT = {"X": 23, "XY": 24, "Y": 25, "M": 26, "MT": 26}


def _open(fn, mode="rt"):
    if str(fn).endswith(".gz"):
        return gzip.open(fn, mode)
    return open(fn, mode)


# ---------------------------------------------------------------------------
# PLINK binary BED


def bed_to_snpdata(bed_fn, fam_fn=None, bim_fn=None, family=False,
                   cvt_chr="int", cvt_snpid="auto", verbose=False,
                   out_gdsfn=None, snpfirstdim=False,
                   compress_annotation="ZIP_RA.max", compress_geno="",
                   option=None, out_store=None) -> SNPData:
    """snpgdsBED2GDS analog: read PLINK .bed/.bim/.fam into SNPData.
    With out_gdsfn, also writes the SNP GDS file (compress options accepted
    for call compatibility; our writer uses ZIP).

    snp-major BED (the PLINK default) converts via a 256-entry byte LUT in
    streamed blocks — the dense genotype matrix is never materialized, so
    biobank-scale BED files convert in O(block) RAM; ``out_store=``
    streams the remapped blocks straight into the packed container and
    returns the reopened memory map."""
    if fam_fn is None and bim_fn is None:
        base = bed_fn[:-4] if bed_fn.endswith(".bed") else bed_fn
        for ext in ("", ".gz"):
            if os.path.exists(base + ".bed" + ext):
                bed_fn = base + ".bed" + ext
                fam_fn = base + ".fam" + (ext if os.path.exists(
                    base + ".fam" + ext) else "")
                bim_fn = base + ".bim" + (ext if os.path.exists(
                    base + ".bim" + ext) else "")
                break
    with _open(fam_fn) as f:
        fam = [line.split() for line in f if line.strip()]
    fam_id = [r[0] for r in fam]
    inv_id = [r[1] for r in fam]
    if len(set(inv_id)) == len(inv_id):
        sample_id = inv_id
    else:
        sample_id = [f"{a}-{b}" for a, b in zip(fam_id, inv_id)]
        if len(set(sample_id)) != len(sample_id):
            raise ValueError("IDs in PLINK BED are not unique!")
    n_samp = len(sample_id)

    with _open(bim_fn) as f:
        bim = [line.split() for line in f if line.strip()]
    n_snp = len(bim)
    chroms = [r[0] for r in bim]
    rs = [r[1] for r in bim]
    pos = [int(float(r[3])) for r in bim]
    a1 = [r[4] for r in bim]
    a2 = [r[5] for r in bim]
    if cvt_chr == "int":
        chrom = np.array([CHROM_CODE_DEFAULT.get(c, _int0(c)) for c in chroms],
                         np.int32)
    else:
        chrom = np.asarray(chroms, object)
    if cvt_snpid == "auto" and len(set(rs)) == n_snp:
        snp_id = np.asarray(rs, object)
        snp_rs = None
    else:
        snp_id = np.arange(1, n_snp + 1)
        snp_rs = np.asarray(rs, object)

    annot = {}
    if family:
        annot = {"family.id": np.asarray(fam_id, object),
                 "father.id": np.asarray([r[2] for r in fam], object),
                 "mother.id": np.asarray([r[3] for r in fam], object),
                 "sex": np.asarray([r[4] for r in fam], object),
                 "phenotype": np.asarray([r[5] for r in fam], object)}

    with _open(bed_fn, "rb") as f:
        head = f.read(3)
        if len(head) < 3 or head[0] != 0x6C or head[1] != 0x1B:
            raise ValueError("Invalid prefix in the bed file.")
        snp_major = head[2] == 1
        if snp_major:
            # streamed byte-LUT remap: BED's snp-major 2-bit rows ARE our
            # packed layout up to the per-genotype code map; the pad
            # fields of the last byte (BED pads with code 0 = dosage 2)
            # are forced to missing (3) to match pack2bit's convention
            nb = -(-n_samp // 4)
            lut = _bed_byte_lut()
            keep = n_samp % 4
            am = np.uint8((1 << (2 * keep)) - 1) if keep else np.uint8(255)
            om = np.uint8(0xFF & ~int(am)) if keep else np.uint8(0)
            out_f = (open(str(out_store) + ".packed", "wb")
                     if out_store is not None else None)
            blocks = []
            block = max(1, (1 << 24) // max(nb, 1))
            done = 0
            try:
                while done < n_snp:
                    m = min(block, n_snp - done)
                    raw = f.read(m * nb)
                    if len(raw) < m * nb:
                        raise ValueError("bed file truncated")
                    pk = lut[np.frombuffer(raw, np.uint8)].reshape(m, nb)
                    if keep:
                        pk[:, -1] = (pk[:, -1] & am) | om
                    if out_f is not None:
                        out_f.write(pk.tobytes())
                    else:
                        blocks.append(pk)
                    done += m
            finally:
                if out_f is not None:
                    out_f.close()
            packed = (None if out_store is not None else
                      (np.concatenate(blocks) if blocks
                       else np.zeros((0, nb), np.uint8)))
        else:
            body = np.frombuffer(head[3:] + f.read(), np.uint8)
            codes = np.stack([(body >> (2 * k)) & 3 for k in range(4)],
                             1).reshape(-1)
            stride = -(-n_snp // 4) * 4
            g = _BED_CVT[codes[: n_samp * stride].reshape(n_samp, stride)
                         [:, :n_snp]].T
            packed = pack2bit(np.ascontiguousarray(g))
            if out_store is not None:
                with open(str(out_store) + ".packed", "wb") as out_f:
                    out_f.write(packed.tobytes())

    allele = np.asarray([f"{x}/{y}" for x, y in zip(a1, a2)], object)
    if out_store is not None:
        from .store import open_packed_store, write_packed_meta

        write_packed_meta(str(out_store), np.asarray(sample_id, object),
                          snp_id, n_samp, np.asarray(pos), chrom,
                          snp_allele=allele, snp_rs_id=snp_rs,
                          sample_annot=annot)
        sd = open_packed_store(str(out_store))
        return _maybe_write_gds(sd, out_gdsfn, snpfirstdim)
    sd = SNPData(
        sample_id=np.asarray(sample_id, object), snp_id=snp_id,
        genotype_packed=packed, n_samp=n_samp,
        snp_position=np.asarray(pos), snp_chromosome=chrom,
        snp_allele=allele, snp_rs_id=snp_rs, sample_annot=annot)
    return _maybe_write_gds(sd, out_gdsfn, snpfirstdim)



def _maybe_write_gds(sd, out_fn, snpfirstdim):
    """Write the converted dataset as a SNP GDS file when requested (the
    reference converters always write; ours return SNPData and write on
    demand)."""
    if out_fn is not None:
        from .gds import write_snp_gds
        write_snp_gds(sd, out_fn, snpfirstdim=bool(snpfirstdim))
    return sd


def _int0(s):
    try:
        return int(s)
    except ValueError:
        return 0


def snpdata_to_bed(data: SNPData, bed_fn: str, sample_id=None, snp_id=None,
                   verbose=False):
    """snpgdsGDS2BED analog: write .bed (SNP-major) + .bim + .fam."""
    from ..workspace import init_workspace

    ws, _ = init_workspace(data, sample_id, snp_id, autosome_only=False,
                           remove_monosnp=False)
    chrom = [str(c) for c in np.asarray(data.snp_chromosome)[ws.snp_idx]]
    inv = {str(v): k for k, v in data.chrom_codes.items()}
    alleles = (data.snp_allele[ws.snp_idx] if data.snp_allele is not None
               else ["A/B"] * ws.n_snp)
    with open(bed_fn + ".bim", "w") as f:
        for i in range(ws.n_snp):
            a = str(alleles[i]).split("/") + ["B"]
            f.write(f"{chrom[i]}\t{ws.snp_id[i]}\t0\t"
                    f"{data.snp_position[ws.snp_idx[i]]}\t{a[0]}\t{a[1]}\n")
    with open(bed_fn + ".fam", "w") as f:
        for s in ws.sample_id:
            f.write(f"0\t{s}\t0\t0\t0\t-9\n")
    with open(bed_fn + ".bed", "wb") as f:
        f.write(bytes([0x6C, 0x1B, 0x01]))  # SNP-major
        inv_map = np.array([3, 2, 0, 1], np.uint8)  # genotype -> bed code
        for s in range(0, ws.n_snp, 4096):
            g = ws.geno(slice(s, min(s + 4096, ws.n_snp)))
            codes = inv_map[g]
            pad = (-codes.shape[1]) % 4
            if pad:
                codes = np.pad(codes, ((0, 0), (0, pad)), constant_values=1)
            c = codes.reshape(codes.shape[0], -1, 4)
            packed = (c[:, :, 0] | (c[:, :, 1] << 2) | (c[:, :, 2] << 4)
                      | (c[:, :, 3] << 6)).astype(np.uint8)
            f.write(packed.tobytes())


# ---------------------------------------------------------------------------
# VCF4


def _vcf_gt_slow(cell: str, gt_idx: int) -> int:
    """REF-allele dosage of one VCF genotype cell (gnrParseVCF4 semantics,
    ConvToGDS.cpp:645-1013): count '0' alleles; any missing allele -> 3;
    haploid doubles."""
    fields = cell.split(":")
    gt = fields[gt_idx] if gt_idx < len(fields) else fields[0]
    alleles = gt.replace("|", "/").split("/")
    cnt = 0
    for a in alleles:
        if a in (".", ""):
            return 3
        cnt += 1 if a == "0" else 0
    return min(cnt, 2) if len(alleles) >= 2 else (2 if cnt == 1 else 0)


_VCF_GT_LUT: dict = {}


def _vcf_gt_code(cell: str, gt_idx: int) -> int:
    """Memoized per-cell genotype decode: the overwhelmingly common
    "a/b"-prefixed cells resolve through a tiny dict of GT prefixes
    (the cell's FORMAT extras are irrelevant to GT), everything else
    falls back to the literal parser."""
    if gt_idx == 0:
        ln = len(cell)
        if ln > 2 and cell[1] in "/|" and (ln == 3 or cell[3] == ":"):
            key = cell[:3]  # diploid single-char alleles
        elif ln == 1 or (ln > 1 and cell[1] == ":"):
            key = cell[0]  # haploid single-char allele
        else:
            return _vcf_gt_slow(cell, gt_idx)
        code = _VCF_GT_LUT.get(key)
        if code is None:
            code = _vcf_gt_slow(key, 0)
            _VCF_GT_LUT[key] = code
        return code
    return _vcf_gt_slow(cell, gt_idx)


def vcf_to_snpdata(vcf_fn, method="biallelic.only", ref_allele=None,
                   ignore_chr_prefix="chr", verbose=False, out_fn=None,
                   snpfirstdim=False, compress_annotation="ZIP_RA.max",
                   compress_geno="", option=None, nblock=1024,
                   out_store=None) -> SNPData:
    """snpgdsVCF2GDS analog (R/Conversion.R:972-1155): parse VCF genotypes
    to dosage of the reference allele. method='biallelic.only' keeps only
    biallelic SNVs; method='copy.num.of.ref' codes any variant by the copy
    number of the reference allele.

    Genotype rows are packed to 2-bit AS THEY PARSE (never a dense
    (n_snp, n_samp) matrix — the reference likewise appends per line
    block, gnrParseVCF4 ConvToGDS.cpp:645-1013). With ``out_store=``
    the packed blocks stream straight into ``<out_store>.packed`` every
    ``nblock`` variants and the return value is the reopened
    memory-mapped container: biobank-scale ingestion in O(nblock x
    n_samp) genotype RAM."""
    fns = [vcf_fn] if isinstance(vcf_fn, str) else list(vcf_fn)
    sample_id = None
    rows = []
    packed_blocks = []
    buf = []
    store_f = (open(str(out_store) + ".packed", "wb")
               if out_store is not None else None)

    def flush():
        if not buf:
            return
        # one vectorized pack per nblock variants (a per-line pack2bit
        # would pay numpy call overhead 1M times at biobank scale)
        blk = pack2bit(np.stack(buf))
        buf.clear()
        if store_f is not None:
            store_f.write(blk.tobytes())
        else:
            packed_blocks.append(blk)

    from ..native import get_lib

    lib = get_lib()
    fast = lib is not None and hasattr(lib, "codec_vcf_block")

    def _fast_file(fn):
        """Block-parse one file through codec_vcf_block: the native
        parser emits packed rows + field offsets per 16 MB block, so no
        per-line text decode/split/encode runs in Python (that path
        measured ~54 MB/s; this runs at parser speed)."""
        nonlocal sample_id
        with _open(fn, "rb") as f:
            while True:  # header
                line = f.readline()
                if not line:
                    return
                if line.startswith(b"##"):
                    continue
                if line.startswith(b"#CHROM"):
                    sids = line.decode().rstrip("\r\n").split("\t")[9:]
                    if sample_id is None:
                        sample_id = sids
                    elif sample_id != sids:
                        raise ValueError(
                            "Different samples across VCF files")
                    break
            nsp = len(sample_id)
            carry = b""
            while True:
                blk = f.read(16 << 20)
                data = carry + blk if carry else blk
                if not data:
                    break
                if not blk and not data.endswith(b"\n"):
                    data += b"\n"
                packed_rows, meta, consumed = vcf_parse_block(
                    data, nsp, method == "biallelic.only")
                carry = data[consumed:] if consumed < len(data) else b""
                flips = []
                for r in range(meta.shape[0]):
                    mv = meta[r]
                    chrom = data[mv[0]:mv[1]].decode()
                    a = data[mv[6]:mv[7]].decode()
                    b = data[mv[8]:mv[9]].decode().split(",")[0]
                    if ignore_chr_prefix and chrom.startswith(
                            ignore_chr_prefix):
                        chrom = chrom[len(ignore_chr_prefix):]
                    if ref_allele is not None:
                        i = len(rows)
                        want = ref_allele[i] if i < len(ref_allele) \
                            else None
                        if want is not None and want == b and want != a:
                            flips.append(r)
                            a, b = b, a
                    rows.append((chrom, int(data[mv[2]:mv[3]]),
                                 data[mv[4]:mv[5]].decode(), a, b,
                                 data[mv[10]:mv[11]].decode(),
                                 data[mv[12]:mv[13]].decode()))
                if flips:
                    idx = np.asarray(flips)
                    sub = packed_rows[idx]  # gather: fancy index copies
                    flip_packed_rows(sub)
                    packed_rows[idx] = sub
                if packed_rows.shape[0]:
                    if store_f is not None:
                        store_f.write(packed_rows.tobytes())
                    else:
                        packed_blocks.append(packed_rows)
                if not blk:
                    break

    try:
        for fn in fns:
            if fast:
                _fast_file(fn)
                continue
            with _open(fn) as f:
                for line in f:
                    if line.startswith("##"):
                        continue
                    if line.startswith("#CHROM"):
                        cols = line.rstrip("\r\n").split("\t")
                        sids = cols[9:]
                        if sample_id is None:
                            sample_id = sids
                        elif sample_id != sids:
                            raise ValueError(
                                "Different samples across VCF files")
                        continue
                    parts = line.rstrip("\r\n").split("\t", 9)
                    if len(parts) < 10:
                        continue
                    chrom, pos, vid, ref, alt = parts[0], parts[1], \
                        parts[2], parts[3], parts[4]
                    qual, filt = parts[5], parts[6]
                    fmt = parts[8].split(":")
                    try:
                        gt_idx = fmt.index("GT")
                    except ValueError:
                        continue
                    alts = alt.split(",")
                    if method == "biallelic.only":
                        if len(alts) != 1 or len(ref) != 1 \
                                or len(alts[0]) != 1 \
                                or alts[0] not in "ACGTacgt" \
                                or ref not in "ACGTacgt":
                            continue
                    if ignore_chr_prefix and chrom.startswith(
                            ignore_chr_prefix):
                        chrom = chrom[len(ignore_chr_prefix):]
                    nsp = len(sample_id)
                    g = vcf_gt_line(parts[9].encode(), gt_idx, nsp)
                    if g is None:  # no native codec: memoized py parser
                        g = np.full(nsp, 3, np.uint8)
                        for i, cell in enumerate(
                                parts[9].split("\t")[:nsp]):
                            g[i] = _vcf_gt_code(cell, gt_idx)
                    a, b = ref, alts[0] if alts else ""
                    if ref_allele is not None:
                        # ref-allele switch applied inline (the parse
                        # order defines the variant index)
                        i = len(rows)
                        want = ref_allele[i] if i < len(ref_allele) \
                            else None
                        if want is not None and want == b and want != a:
                            g = np.where(g <= 2, 2 - g, 3).astype(np.uint8)
                            a, b = b, a
                    rows.append((chrom, int(pos), vid, a, b, qual, filt))
                    buf.append(g)
                    if len(buf) >= nblock:
                        flush()
        flush()
    finally:
        if store_f is not None:
            store_f.close()
    n_snp = len(rows)
    if ref_allele is not None and len(ref_allele) != n_snp:
        raise ValueError("'ref.allele' has the wrong length")
    nsp = len(sample_id or [])
    qual_arr = np.array([float(r[5]) if r[5] not in (".", "") else np.nan
                         for r in rows])
    filt_arr = np.asarray([r[6] for r in rows], object)
    annot = {"qual": qual_arr, "filter": filt_arr}
    if out_store is not None:
        from .store import open_packed_store, write_packed_meta

        write_packed_meta(
            str(out_store), np.asarray(sample_id or [], object),
            np.arange(1, n_snp + 1), nsp,
            np.asarray([r[1] for r in rows], np.int64),
            np.asarray([r[0] for r in rows], object),
            snp_allele=np.asarray([f"{r[3]}/{r[4]}" for r in rows],
                                  object),
            snp_rs_id=np.asarray([r[2] for r in rows], object),
            snp_annot=annot)
        sd = open_packed_store(str(out_store))
        return _maybe_write_gds(sd, out_fn, snpfirstdim)
    packed = (np.concatenate(packed_blocks) if packed_blocks
              else np.zeros((0, -(-nsp // 4)), np.uint8))
    sd = SNPData(
        sample_id=np.asarray(sample_id or [], object),
        snp_id=np.arange(1, n_snp + 1),
        genotype_packed=packed, n_samp=nsp,
        snp_position=np.asarray([r[1] for r in rows], np.int64),
        snp_chromosome=np.asarray([r[0] for r in rows], object),
        snp_allele=np.asarray([f"{r[3]}/{r[4]}" for r in rows], object),
        snp_rs_id=np.asarray([r[2] for r in rows], object))
    sd.snp_annot = annot
    return _maybe_write_gds(sd, out_fn, snpfirstdim)


def _vcf_shard_worker(args):
    """Parse one byte range [start, end) of a plain VCF into
    ``<out>.shard<k>`` packed rows + a metadata npz. A worker owns the
    lines that START inside its range (it reads past ``end`` to finish
    the final line), so the shards tile the file exactly."""
    (fn, start, end, nsp, biallelic, ignore_chr_prefix, out, k) = args
    rows = []
    with open(fn, "rb") as f, \
            open(f"{out}.shard{k}", "wb") as pf:
        # a worker owns the lines that START in [start, end): position
        # to the first line start >= start (seek one byte back so a
        # start that IS a line start is kept, not discarded)
        if start:
            f.seek(start - 1)
            if f.read(1) != b"\n":
                f.readline()
        else:
            f.seek(start)
        abs_off = f.tell()  # absolute offset of the next unparsed byte
        carry = b""
        done = abs_off >= end
        while not done:
            blk = f.read(16 << 20)
            data = carry + blk if carry else blk
            if not data:
                break
            if not blk and not data.endswith(b"\n"):
                data += b"\n"
            rel_end = end - abs_off  # first absolute offset NOT owned
            if rel_end <= len(data):
                # cut at the newline ending the last owned line; a line
                # starting at >= end belongs to the next shard
                jn = data.find(b"\n", max(rel_end - 1, 0))
                if jn >= 0:
                    data = data[: jn + 1]
                    done = True
                elif not blk:
                    done = True  # final owned line had no newline (EOF)
            elif not blk:
                done = True
            packed_rows, meta, consumed = vcf_parse_block(
                data, nsp, biallelic)
            carry = data[consumed:] if consumed < len(data) else b""
            abs_off += consumed
            for r in range(meta.shape[0]):
                mv = meta[r]
                chrom = data[mv[0]:mv[1]].decode()
                if ignore_chr_prefix and chrom.startswith(
                        ignore_chr_prefix):
                    chrom = chrom[len(ignore_chr_prefix):]
                rows.append((chrom, int(data[mv[2]:mv[3]]),
                             data[mv[4]:mv[5]].decode(),
                             data[mv[6]:mv[7]].decode(),
                             data[mv[8]:mv[9]].decode().split(",")[0],
                             data[mv[10]:mv[11]].decode(),
                             data[mv[12]:mv[13]].decode()))
            if packed_rows.shape[0]:
                pf.write(packed_rows.tobytes())
    np.savez(f"{out}.shardmeta{k}.npz",
             chrom=np.asarray([r[0] for r in rows], object),
             pos=np.asarray([r[1] for r in rows], np.int64),
             vid=np.asarray([r[2] for r in rows], object),
             ref=np.asarray([r[3] for r in rows], object),
             alt=np.asarray([r[4] for r in rows], object),
             qual=np.asarray([r[5] for r in rows], object),
             filt=np.asarray([r[6] for r in rows], object))
    return len(rows)


def vcf_to_store_sharded(vcf_fn, out_store, workers=2,
                         method="biallelic.only",
                         ignore_chr_prefix="chr", verbose=False):
    """Multi-process VCF -> packed-store ingestion: the file splits into
    ``workers`` byte ranges (aligned to line starts), each worker block-
    parses its range through the native codec into a packed shard, and
    the shards byte-concatenate into ``<out_store>.packed`` (the store
    is snp-major, so shard order IS variant order). The reference's
    parser is single-threaded (ConvToGDS.cpp:645-1013); this scales
    ingestion with cores while each worker runs the same native block
    parser as :func:`vcf_to_snpdata`.

    Plain (uncompressed) single-file VCF only — gzip streams are not
    byte-addressable. Returns the opened store."""
    import multiprocessing as mp

    from .store import open_packed_store, write_packed_meta

    fn = str(vcf_fn)
    if fn.endswith(".gz"):
        raise ValueError("sharded ingestion needs an uncompressed VCF "
                         "(byte ranges are not seekable in gzip); use "
                         "vcf_to_snpdata(out_store=) instead")
    from ..native import get_lib

    lib = get_lib()
    if lib is None or not hasattr(lib, "codec_vcf_block"):
        raise RuntimeError("sharded ingestion requires the native codec")
    # header: sample ids + the first data-byte offset
    sample_id = None
    with open(fn, "rb") as f:
        while True:
            line = f.readline()
            if not line:
                raise ValueError("no #CHROM header line")
            if line.startswith(b"#CHROM"):
                sample_id = line.decode().rstrip("\r\n").split("\t")[9:]
                if not line.endswith(b"\n"):
                    raise ValueError("header-only VCF")
                data0 = f.tell()
                break
            if not line.startswith(b"#"):
                raise ValueError("data line before #CHROM header")
        f.seek(0, 2)
        fsize = f.tell()
    nsp = len(sample_id)
    workers = max(1, int(workers))
    bounds = [data0 + (fsize - data0) * w // workers
              for w in range(workers + 1)]
    jobs = [(fn, bounds[w], bounds[w + 1], nsp,
             method == "biallelic.only", ignore_chr_prefix,
             str(out_store), w) for w in range(workers)]
    if workers == 1:
        counts = [_vcf_shard_worker(jobs[0])]
    else:
        with mp.get_context("fork").Pool(workers) as pool:
            counts = pool.map(_vcf_shard_worker, jobs)
    if verbose:
        print(f"sharded VCF ingest: {counts} variants/shard")
    # concatenate shards (byte order == variant order)
    metas = []
    with open(str(out_store) + ".packed", "wb") as outf:
        for w in range(workers):
            sf = f"{out_store}.shard{w}"
            with open(sf, "rb") as inf:
                while True:
                    b = inf.read(64 << 20)
                    if not b:
                        break
                    outf.write(b)
            os.remove(sf)
            mf = f"{out_store}.shardmeta{w}.npz"
            with np.load(mf, allow_pickle=True) as z:
                metas.append({k: z[k] for k in z.files})
            os.remove(mf)
    cat = {k: np.concatenate([m[k] for m in metas])
           for k in metas[0]}
    n_snp = len(cat["pos"])
    qual_arr = np.array([float(q) if q not in (".", "") else np.nan
                         for q in cat["qual"]])
    write_packed_meta(
        str(out_store), np.asarray(sample_id, object),
        np.arange(1, n_snp + 1), nsp, cat["pos"], cat["chrom"],
        snp_allele=np.asarray(
            [f"{a}/{b}" for a, b in zip(cat["ref"], cat["alt"])], object),
        snp_rs_id=cat["vid"],
        snp_annot={"qual": qual_arr, "filter": cat["filt"]})
    return open_packed_store(str(out_store))


# ---------------------------------------------------------------------------
# PLINK text PED/MAP


def ped_to_snpdata(ped_fn, map_fn, family=False, verbose=False,
                   out_gdsfn=None, snpfirstdim=False,
                   compress_annotation="ZIP_RA.max",
                   compress_geno="") -> SNPData:
    """snpgdsPED2GDS analog (R/Conversion.R:132 + Conversion2.R:19-188)."""
    with _open(map_fn) as f:
        mp = [line.split() for line in f if line.strip()]
    n_snp = len(mp)
    chrom = np.asarray([_int0(CHROM_CODE_DEFAULT.get(r[0], r[0])) for r in mp],
                       np.int32)
    snp_rs = [r[1] for r in mp]
    pos = np.asarray([int(float(r[-1])) for r in mp])

    sample_id = []
    fam_rows = []
    geno_cols = []
    with _open(ped_fn) as f:
        for line in f:
            p = line.split()
            if not p:
                continue
            fam_rows.append(p[:6])
            sample_id.append(p[1])
            al = p[6:]
            if len(al) != 2 * n_snp:
                raise ValueError("PED line has wrong number of alleles")
            geno_cols.append(al)
    n_samp = len(sample_id)
    if len(set(sample_id)) != n_samp:
        sample_id = [f"{r[0]}-{r[1]}" for r in fam_rows]

    # determine the two alleles per SNP and code dosage of the first allele
    # (vectorized: the allele vocabulary is tiny, so per-SNP counts are a
    # handful of (n_samp, n_snp) comparisons instead of a Python loop over
    # every genotype)
    geno = np.full((n_snp, n_samp), 3, np.uint8)
    alleles = ["A/B"] * n_snp
    if n_samp == 0:
        return _ped_finish(geno, alleles, fam_rows, sample_id, snp_rs,
                           n_snp, pos, chrom, family, out_gdsfn, snpfirstdim)
    al = np.asarray(geno_cols)  # (n_samp, 2*n_snp) strings
    vocab, codes = np.unique(al, return_inverse=True)
    codes = codes.reshape(al.shape)
    c1 = codes[:, 0::2]  # (n_samp, n_snp)
    c2 = codes[:, 1::2]
    miss_syms = np.isin(vocab, ("0", "-9", "N", "."))
    counts = np.zeros((len(vocab), n_snp), np.int64)
    for v in range(len(vocab)):
        if miss_syms[v]:
            continue
        counts[v] = (c1 == v).sum(0) + (c2 == v).sum(0)
    # rank: count desc, then lexicographic (vocab from np.unique is sorted,
    # so a stable sort on -counts keeps lexicographic tie-breaking)
    order = np.argsort(-counts, axis=0, kind="stable")
    ref_idx = order[0]
    alt_idx = order[1] if len(vocab) > 1 else order[0]
    ref_ok = counts[ref_idx, np.arange(n_snp)] > 0
    alt_ok = (len(vocab) > 1) & (counts[alt_idx, np.arange(n_snp)] > 0)
    ref_s = np.where(ref_ok, vocab[ref_idx], "A")
    alt_s = np.where(alt_ok, vocab[alt_idx], "B")
    alleles = [f"{r}/{a}" for r, a in zip(ref_s, alt_s)]
    miss = miss_syms[c1] | miss_syms[c2]
    dosage = ((c1 == ref_idx[None, :]).astype(np.uint8)
              + (c2 == ref_idx[None, :]).astype(np.uint8))
    geno = np.where(miss, np.uint8(3), dosage).T.copy()
    return _ped_finish(geno, alleles, fam_rows, sample_id, snp_rs, n_snp,
                       pos, chrom, family, out_gdsfn, snpfirstdim)


def _ped_finish(geno, alleles, fam_rows, sample_id, snp_rs, n_snp, pos,
                chrom, family, out_gdsfn, snpfirstdim):
    n_samp = len(sample_id)
    annot = {}
    if family:
        annot = {"family.id": np.asarray([r[0] for r in fam_rows], object),
                 "father.id": np.asarray([r[2] for r in fam_rows], object),
                 "mother.id": np.asarray([r[3] for r in fam_rows], object),
                 "sex": np.asarray([r[4] for r in fam_rows], object),
                 "phenotype": np.asarray([r[5] for r in fam_rows], object)}
    snp_id = np.asarray(snp_rs, object) if len(set(snp_rs)) == n_snp \
        else np.arange(1, n_snp + 1)
    sd = SNPData(
        sample_id=np.asarray(sample_id, object), snp_id=snp_id,
        genotype_packed=pack2bit(geno), n_samp=n_samp,
        snp_position=pos, snp_chromosome=chrom,
        snp_allele=np.asarray(alleles, object),
        snp_rs_id=np.asarray(snp_rs, object), sample_annot=annot)
    return _maybe_write_gds(sd, out_gdsfn, snpfirstdim)


def snpdata_to_ped(data: SNPData, ped_fn: str, sample_id=None, snp_id=None,
                   use_snp_rsid=True, format="A/G/C/T", verbose=False):
    """snpgdsGDS2PED analog (R/Conversion.R:26-130): writes .map
    (chr with X/XY/Y/MT recoding, rs-id, genetic distance 0, position)
    and .ped with allele coding per ``format``: "A/G/C/T" (actual
    alleles), "A/B", or "1/2"."""
    from ..workspace import init_workspace

    ws, _ = init_workspace(data, sample_id, snp_id, autosome_only=False,
                           remove_monosnp=False)
    chrom = np.asarray(data.snp_chromosome)[ws.snp_idx].astype(object)
    recode = {str(v): k for k, v in
              {"X": 23, "XY": 24, "Y": 25, "MT": 26}.items()}
    recode.update({str(v): k for k, v in data.chrom_codes.items()
                   if k != "M"})
    chrom = np.asarray([recode.get(str(c), str(c)) for c in chrom], object)
    ids = ws.snp_id
    if use_snp_rsid and data.snp_rs_id is not None:
        ids = np.asarray(data.snp_rs_id)[ws.snp_idx]
    with open(ped_fn + ".map", "w") as f:
        for i in range(ws.n_snp):
            f.write(f"{chrom[i]}\t{ids[i]}\t0\t"
                    f"{data.snp_position[ws.snp_idx[i]]}\n")
    if format == "A/B":
        ab = [["A", "B"]] * ws.n_snp
    elif format == "1/2":
        ab = [["1", "2"]] * ws.n_snp
    elif format == "A/G/C/T":
        alleles = (data.snp_allele[ws.snp_idx] if data.snp_allele is not None
                   else np.asarray(["A/B"] * ws.n_snp, object))
        ab = [str(a).split("/") + ["B"] for a in alleles]
    else:
        raise ValueError("Invalid 'format'.")
    g = ws.geno()  # (S, N)
    with open(ped_fn + ".ped", "w") as f:
        for j in range(ws.n_samp):
            cells = []
            for i in range(ws.n_snp):
                v = g[i, j]
                a, b = ab[i][0], ab[i][1]
                cells.append({0: f"{b} {b}", 1: f"{a} {b}", 2: f"{a} {a}",
                              3: "0 0"}[int(v)])
            f.write(f"0 {ws.sample_id[j]} 0 0 0 -9 " + " ".join(cells) + "\n")


# ---------------------------------------------------------------------------
# Oxford GEN


def gen_to_snpdata(gen_fn, sample_fn=None, chr_code="1", call_threshold=0.9,
                   verbose=False, out_fn=None, snpfirstdim=False,
                   compress_annotation="ZIP_RA.max",
                   compress_geno="", version=">=2.0") -> SNPData:
    """snpgdsGEN2GDS analog (R/Conversion.R:795): genotype probabilities ->
    best-guess dosage of the FIRST allele (A), missing if max prob below
    call_threshold. version selects the SNPTEST sample-file layout:
    ">=2.0" has a header line plus a column-type line (skip 2),
    "<=1.1.5" a header line only (R/Conversion.R:849-858)."""
    if version not in (">=2.0", "<=1.1.5"):
        raise ValueError('version should be ">=2.0" or "<=1.1.5"')
    sample_id = None
    if sample_fn is not None:
        with _open(sample_fn) as f:
            lines = [line.split() for line in f if line.strip()]
        skip = 2 if version == ">=2.0" else 1
        sample_id = [r[1] if len(r) > 1 else r[0] for r in lines[skip:]]
    rows = []
    genos = []
    with _open(gen_fn) as f:
        for line in f:
            p = line.split()
            if not p:
                continue
            vid, rsid, pos, a, b = p[0], p[1], p[2], p[3], p[4]
            probs = np.asarray(p[5:], np.float64).reshape(-1, 3)
            best = probs.argmax(1)
            g = np.where(probs.max(1) >= call_threshold,
                         2 - best, 3).astype(np.uint8)
            rows.append((vid, rsid, int(float(pos)), a, b))
            genos.append(g)
    n_snp = len(rows)
    n_samp = len(genos[0]) if genos else 0
    if sample_id is None:
        sample_id = [f"sample{i+1}" for i in range(n_samp)]
    sd = SNPData(
        sample_id=np.asarray(sample_id, object),
        snp_id=np.arange(1, n_snp + 1),
        genotype_packed=pack2bit(np.stack(genos)) if genos else
        np.zeros((0, 0), np.uint8),
        n_samp=n_samp,
        snp_position=np.asarray([r[2] for r in rows]),
        snp_chromosome=np.asarray([_int0(chr_code)] * n_snp, np.int32),
        snp_allele=np.asarray([f"{r[3]}/{r[4]}" for r in rows], object),
        snp_rs_id=np.asarray([r[1] for r in rows], object))
    return _maybe_write_gds(sd, out_fn, snpfirstdim)


def gen_prob_to_snpdata(gprobs_fn, markers_fn=None, chr_code="1",
                        call_threshold=0.9, verbose=False, out_fn=None,
                        snpfirstdim=False) -> SNPData:
    """BEAGLE genotype-probability importer (the reference ships a
    genotype-probability parser at ConvToGDS.cpp:1379 `gnrParseGProbs`
    under a 'bgl.gprobs (BEAGLE) ==> SNP Prob GDS' heading,
    R/Conversion2.R:16, though no exported R function reaches it).

    BEAGLE 3 .gprobs layout: a header line
    ``marker alleleA alleleB I1 I1 I1 I2 I2 I2 ...`` then one line per
    marker with P(AA), P(AB), P(BB) triplets per sample (A = alleleA).
    Genotype = best-guess dosage of alleleA, missing when the max
    probability is below call_threshold (the GEN-importer convention,
    R/Conversion.R:894-900). markers_fn: optional BEAGLE .markers file
    (``marker position alleleA alleleB``) supplying positions."""
    pos_map = {}
    if markers_fn is not None:
        with _open(markers_fn) as f:
            for line in f:
                p = line.split()
                if len(p) >= 2:
                    pos_map[p[0]] = int(float(p[1]))
    rows = []
    genos = []
    sample_id = None
    with _open(gprobs_fn) as f:
        header = f.readline().split()
        if len(header) < 3 or header[0].lower() != "marker":
            raise ValueError(
                f"'{gprobs_fn}' does not look like a BEAGLE gprobs file "
                "(expected a 'marker alleleA alleleB ...' header)")
        ids = header[3:]
        if len(ids) % 3 != 0:
            raise ValueError("gprobs header: sample columns not in "
                             "triplets")
        sample_id = ids[0::3]
        for line in f:
            p = line.split()
            if not p:
                continue
            rsid, a, b = p[0], p[1], p[2]
            probs = np.asarray(p[3:], np.float64).reshape(-1, 3)
            if probs.shape[0] != len(sample_id):
                raise ValueError(f"marker {rsid}: expected "
                                 f"{len(sample_id)} probability triplets")
            best = probs.argmax(1)
            g = np.where(probs.max(1) >= call_threshold,
                         2 - best, 3).astype(np.uint8)
            rows.append((rsid, pos_map.get(rsid, 0), a, b))
            genos.append(g)
    n_snp = len(rows)
    n_samp = len(sample_id)
    if verbose:
        print(f"BEAGLE gprobs: {n_samp} samples, {n_snp} markers")
    sd = SNPData(
        sample_id=np.asarray(sample_id, object),
        snp_id=np.arange(1, n_snp + 1),
        genotype_packed=pack2bit(np.stack(genos)) if genos else
        np.zeros((0, 0), np.uint8),
        n_samp=n_samp,
        snp_position=np.asarray([r[1] for r in rows]),
        snp_chromosome=np.asarray([_int0(chr_code)] * n_snp, np.int32),
        snp_allele=np.asarray([f"{r[2]}/{r[3]}" for r in rows], object),
        snp_rs_id=np.asarray([r[0] for r in rows], object))
    return _maybe_write_gds(sd, out_fn, snpfirstdim)


# ---------------------------------------------------------------------------
# EIGENSTRAT


def snpdata_to_eigen(data: SNPData, eigen_fn: str, sample_id=None,
                     snp_id=None, verbose=False):
    """snpgdsGDS2Eigen analog (R/Conversion.R:695): write .eigenstratgeno,
    .ind, .snp files."""
    from ..workspace import init_workspace

    ws, _ = init_workspace(data, sample_id, snp_id, autosome_only=False,
                           remove_monosnp=False)
    with open(eigen_fn + ".ind", "w") as f:
        for s in ws.sample_id:
            f.write(f"{s}\tU\tControl\n")
    chrom = np.asarray(data.snp_chromosome)[ws.snp_idx]
    with open(eigen_fn + ".snp", "w") as f:
        for i in range(ws.n_snp):
            f.write(f"{ws.snp_id[i]}\t{chrom[i]}\t0.0\t"
                    f"{data.snp_position[ws.snp_idx[i]]}\n")
    g = ws.geno()
    out = np.where(g <= 2, g, 9).astype(np.uint8)
    with open(eigen_fn + ".eigenstratgeno", "w") as f:
        for i in range(ws.n_snp):
            f.write("".join(map(str, out[i])) + "\n")
