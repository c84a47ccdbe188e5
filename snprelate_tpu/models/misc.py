"""Misc analyses and dataset utilities (reference: R/IBS.R:81-184
snpgdsPairScore, R/AllUtilities.R snpgdsSlidingWindow/AlleleSwitch/SNPList/
CreateGenoSet/CombineGeno, src/SNPRelate.cpp gnrStrandSwitch/gnrAlleleStrand,
src/genSlideWin.cpp gnrSlidingWindow)."""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np

from ..io.store import SNPData, pack2bit
from ..workspace import init_workspace

_M = -1  # missing score
_SCORE_TABLES = {
    # genIBS.cpp:716-737; rows g1, cols g2
    ("IBS", True): [[2, 1, 0], [1, 2, 1], [0, 1, 2]],
    ("IBS", False): [[1, 1, 0], [1, 1, 1], [0, 1, 1]],
    ("GVH", True): [[0, 0, 2], [1, 0, 1], [2, 0, 0]],
    ("GVH", False): [[0, 0, 1], [1, 0, 1], [1, 0, 0]],
    ("HVG", True): [[0, 1, 2], [0, 0, 0], [2, 1, 0]],
    ("HVG", False): [[0, 1, 1], [0, 0, 0], [1, 1, 0]],
    ("GVH.major", None): [[0, 0, 0], [1, 0, 0], [1, 0, 0]],
    ("GVH.minor", None): [[0, 0, 1], [0, 0, 1], [0, 0, 0]],
    ("GVH.major.only", None): [[0, 0, _M], [1, 0, _M], [1, 0, 0]],
    ("GVH.minor.only", None): [[0, 0, 1], [_M, 0, 1], [_M, 0, 0]],
}


def pair_score(data, sample1_id, sample2_id, snp_id=None, method="IBS",
               type="per.pair", dosage=True, with_id=True, output=None,
               verbose=False):
    """snpgdsPairScore (R/IBS.R:81): per-pair genotype scoring with 10
    scoring matrices (gnrPairScore, genIBS.cpp:711-891)."""
    sample1_id = np.asarray(sample1_id, object)
    sample2_id = np.asarray(sample2_id, object)
    if len(np.unique(sample1_id)) != len(sample1_id):
        raise ValueError("'sample1.id' has duplicated element(s).")
    if len(np.unique(sample2_id)) != len(sample2_id):
        raise ValueError("'sample2.id' has duplicated element(s).")
    if len(sample1_id) != len(sample2_id):
        raise ValueError("sample1.id and sample2.id must have equal length")
    union = list(dict.fromkeys(sample1_id.tolist() + sample2_id.tolist()))
    ws, _ = init_workspace(data, sample_id=union, snp_id=snp_id,
                           autosome_only=False, remove_monosnp=False)
    pos = {s: i for i, s in enumerate(ws.sample_id.tolist())}
    c1 = np.asarray([pos[s] for s in sample1_id.tolist()])
    c2 = np.asarray([pos[s] for s in sample2_id.tolist()])

    need_major = method.startswith("GVH.")
    key = (method, None if need_major else dosage)
    if key not in _SCORE_TABLES:
        raise ValueError("Invalid 'method'.")
    table = np.asarray(_SCORE_TABLES[key] + [[_M, _M, _M]], np.float64)
    table = np.hstack([table, np.full((4, 1), _M)])
    table[table == _M] = np.nan

    g = ws.geno()  # (S, N)
    if need_major:
        # flip each SNP so that A is the major allele among the pair samples
        # (flap_allele, genIBS.cpp:695-708)
        sub = np.concatenate([g[:, c1], g[:, c2]], axis=1)
        valid = sub < 3
        gsum = np.where(valid, sub, 0).sum(1)
        nvalid = valid.sum(1)
        flip = gsum < nvalid
        g = np.where(flip[:, None] & (g < 3), 2 - g, g)
    s1 = g[:, c1].astype(np.intp)  # (S, P)
    s2 = g[:, c2].astype(np.intp)
    score = table[s1, s2]  # (S, P) with NaN for missing

    out = {"sample.id": ws.sample_id, "snp.id": ws.snp_id} if with_id else {}
    import warnings as _warnings
    if type == "per.pair":
        num = np.isfinite(score).sum(0)
        with _warnings.catch_warnings():
            # all-NaN slices / ddof<=0 legitimately yield NaN Avg/SD
            _warnings.simplefilter("ignore", RuntimeWarning)
            avg = np.nanmean(score, axis=0)
            sd = np.nanstd(score, axis=0, ddof=1)
        out["score"] = {"Avg": avg, "SD": sd, "Num": num,
                        "Sample1": sample1_id, "Sample2": sample2_id}
    elif type == "per.snp":
        num = np.isfinite(score).sum(1)
        with _warnings.catch_warnings():
            _warnings.simplefilter("ignore", RuntimeWarning)
            avg = np.nanmean(score, axis=1)
            sd = np.nanstd(score, axis=1, ddof=1)
        out["score"] = np.stack([avg, sd, num.astype(float)])
    elif type == "matrix":
        out["score"] = score.T  # (P, S), NaN for missing
    elif type == "gds.file":
        # scores are 0..2 (3 = missing): store as a bit2 SNP_ARRAY GDS with
        # pair labels as sample ids (R/IBS.R:120-156)
        if not output:
            raise ValueError("'output' should be a file name for gds.file")
        sc = np.where(np.isfinite(score), score, 3).astype(np.uint8)
        pair_ids = np.asarray([f"{a}-{b}" for a, b in
                               zip(sample1_id, sample2_id)], object)
        sd = SNPData(
            sample_id=pair_ids, snp_id=ws.snp_id,
            genotype_packed=pack2bit(sc), n_samp=len(pair_ids),
            snp_position=np.asarray(data.snp_position)[ws.snp_idx],
            snp_chromosome=np.asarray(data.snp_chromosome)[ws.snp_idx])
        from ..io.gds import write_snp_gds

        write_snp_gds(sd, output)
    else:
        raise ValueError("Invalid 'type'.")
    return out


def sliding_window(data, fun, winsize=100000, shift=10000, unit="basepair",
                   winstart=None, sample_id=None, snp_id=None,
                   autosome_only=False, remove_monosnp=True, maf=math.nan,
                   missing_rate=math.nan, verbose=False, num_thread=None,
                   **kw):
    """snpgdsSlidingWindow (R/AllUtilities.R:1998 + genSlideWin.cpp): apply
    `fun` per sliding window, per chromosome. `fun` may be "snpgdsFst",
    "snpgdsSNPRateFreq", or a callable fun(data, sample_id, snp_id, **kw).

    Returns {chr: {"start": positions, "n": counts, "val": results}}."""
    ws, _ = init_workspace(data, sample_id, snp_id, autosome_only,
                           remove_monosnp, maf, missing_rate, verbose=verbose)
    chrom = np.asarray(data.snp_chromosome)
    position = np.asarray(data.snp_position)
    in_ws = np.zeros(data.n_snp, bool)
    in_ws[ws.snp_idx] = True
    in_ws &= np.isfinite(position.astype(float)) & (position > 0)

    if isinstance(fun, str):
        if fun == "snpgdsFst":
            from .fst import fst as _fst

            def call(sids, snpids):
                pop = kw["population"]
                sel = np.isin(np.asarray(sample_id if sample_id is not None
                                         else data.sample_id, object), sids)
                r = _fst(data, population=np.asarray(pop, object)[sel]
                         if sample_id is not None else pop,
                         method=kw.get("method", "W&C84"), sample_id=sids,
                         snp_id=snpids, autosome_only=False,
                         remove_monosnp=False)
                return r.Fst
        elif fun == "snpgdsSNPRateFreq":
            from .stats import snp_rate_freq

            def call(sids, snpids):
                return snp_rate_freq(data, sample_id=sids, snp_id=snpids)
        else:
            raise ValueError("'FUN' should be snpgdsFst or snpgdsSNPRateFreq")
    else:
        def call(sids, snpids):
            return fun(data, sids, snpids, **kw)

    res = {}
    from .ld import pd_unique

    def num_win(start: int, end: int) -> int:
        """SlidingNumWin (genSlideWin.cpp:77-84): windows from start by
        shift while start <= end - winsize, plus one — always >= 1, and
        EMPTY windows are enumerated (n = 0, val = NaN)."""
        cnt = 0
        end -= winsize
        while start <= end:
            cnt += 1
            start += shift
        return cnt + 1

    for ch in pd_unique(chrom[in_ws]):
        mask = in_ws & (chrom == ch)
        idx = np.flatnonzero(mask)
        pos = position[idx].astype(np.int64)
        order = np.argsort(pos, kind="stable")
        idx, pos = idx[order], pos[order]
        starts, counts, vals, posmean = [], [], [], []
        if unit == "basepair":
            w0 = int(pos.min()) if winstart is None else int(winstart)
            nwin = num_win(w0, int(pos.max()))
        elif unit == "locus":
            w0 = 0 if winstart is None else int(winstart) - 1
            nwin = num_win(w0, len(idx) - 1)
        else:
            raise ValueError("unit should be basepair or locus")
        for _ in range(nwin):
            if unit == "basepair":
                inwin = (pos >= w0) & (pos < w0 + winsize)
                sel = idx[inwin]
                ppos = pos[inwin]
            else:
                sel = idx[max(w0, 0) : w0 + winsize]
                ppos = pos[max(w0, 0) : w0 + winsize]
            starts.append(w0)
            counts.append(len(sel))
            posmean.append(float(ppos.mean()) if len(sel) else math.nan)
            vals.append(call(ws.sample_id, data.snp_id[sel])
                        if len(sel) else math.nan)
            w0 += shift
        res[f"chr{ch}"] = {"start": np.asarray(starts),
                           "n": np.asarray(counts),
                           "pos.mean": np.asarray(posmean), "val": vals}
    return res


# ---------------------------------------------------------------------------
# allele utilities


def _split_allele(s: str):
    parts = str(s).split("/", 1)
    return parts[0], parts[1] if len(parts) > 1 else ""


def allele_switch(data: SNPData, a_allele, verbose=False):
    """snpgdsAlleleSwitch (R/AllUtilities.R:1686): switch genotype coding so
    the A allele matches `a_allele`. Mutates `data` in place; returns a
    flag array (True switched, False kept, None undetermined)."""
    if data.snp_allele is None:
        raise ValueError("There is no allelic information (snp.allele).")
    a_allele = np.asarray(a_allele, object)
    if len(a_allele) != data.n_snp:
        raise ValueError("The length of 'A.allele' should correspond to "
                         "'snp.allele'.")
    flags = np.empty(data.n_snp, object)
    dense = data.geno()
    new_alleles = data.snp_allele.copy()
    for i in range(data.n_snp):
        want = a_allele[i]
        a, b = _split_allele(data.snp_allele[i])
        if want is None or (isinstance(want, float) and math.isnan(want)):
            flags[i] = None
        elif want == a:
            flags[i] = False
        elif want == b:
            flags[i] = True
            new_alleles[i] = f"{b}/{a}"
        else:
            flags[i] = None
    sw = np.asarray([f is True for f in flags])
    dense[sw] = np.where(dense[sw] <= 2, 2 - dense[sw], dense[sw])
    data.genotype_packed = pack2bit(dense)
    data.snp_allele = new_alleles
    return flags


_COMP = {"A": "T", "T": "A", "C": "G", "G": "C"}


def allele_strand(allele1, allele2, afreq1=None, afreq2=None,
                  same_strand=False):
    """gnrAlleleStrand (SNPRelate.cpp:900-980): per-SNP flip flags between
    two allele annotations, strand-aware. Returns an int array:
    bit0 flip, bit1 different strand, bit2 ambiguity; None if mismatched."""
    n = len(allele1)
    out = np.empty(n, object)
    for i in range(n):
        ra1, ra2 = _split_allele(allele1[i])
        da1, da2 = _split_allele(allele2[i])
        flag = None
        check_afreq = False
        if same_strand:
            if ra1 == da1 and ra2 == da2:
                flag = 0
            elif ra1 == da2 and ra2 == da1:
                flag = 1
        else:
            if ra1 == da1 and ra2 == da2:
                if da2 in _COMP and ra1 == _COMP[da2]:
                    check_afreq = True
                flag = 0
            elif ra1 == da2 and ra2 == da1:
                if da1 in _COMP and ra1 == _COMP[da1]:
                    check_afreq = True
                flag = 1
            elif all(x in _COMP for x in (ra1, ra2, da1, da2)):
                if ra1 == _COMP[da1] and ra2 == _COMP[da2]:
                    if ra1 == da2:
                        check_afreq = True
                    flag = 2
                elif ra1 == _COMP[da2] and ra2 == _COMP[da1]:
                    if ra1 == da1:
                        check_afreq = True
                    flag = 3
            if check_afreq and flag is not None:
                f1 = afreq1[i] if afreq1 is not None else np.nan
                f2 = afreq2[i] if afreq2 is not None else np.nan
                minor1 = f1 <= 0.5
                minor2 = f2 <= 0.5
                flag = (1 if minor1 != minor2 else 0) | (flag & ~0x01) | 0x04
        out[i] = flag
    return out


def snp_list(data: SNPData, sample_id=None):
    """snpgdsSNPList (R/AllUtilities.R:637)."""
    from .stats import snp_rate_freq

    af = snp_rate_freq(data, sample_id=sample_id)["AlleleFreq"]
    return {"snp.id": data.snp_id, "chromosome": data.snp_chromosome,
            "position": data.snp_position, "allele": data.snp_allele,
            "afreq": af}


def snp_list_intersect(*snplists, method="position", na_rm=True,
                       same_strand=False, verbose=False):
    """snpgdsSNPListIntersect (R/AllUtilities.R:667): common SNPs across
    lists, with allele strand flags for the position method."""
    if len(snplists) < 2:
        raise ValueError("need at least two snp lists")

    def keys(sl):
        if method == "position":
            return [f"{c}:{p}" for c, p in zip(sl["chromosome"],
                                               sl["position"])]
        return [f"{i}:{c}:{p}:{a}" for i, c, p, a in
                zip(sl["snp.id"], sl["chromosome"], sl["position"],
                    sl["allele"])]

    klists = [keys(sl) for sl in snplists]
    common = set(klists[0])
    for kl in klists[1:]:
        common &= set(kl)
    common = [k for k in klists[0] if k in common]
    rv = {}
    for i, kl in enumerate(klists):
        lookup = {k: j for j, k in enumerate(kl)}
        rv[f"idx{i+1}"] = np.asarray([lookup[k] for k in common])
    if method == "position":
        i1 = rv["idx1"]
        al1 = np.asarray(snplists[0]["allele"], object)[i1]
        af1 = np.asarray(snplists[0]["afreq"])[i1]
        for i in range(1, len(snplists)):
            ii = rv[f"idx{i+1}"]
            rv[f"flag{i+1}"] = allele_strand(
                al1, np.asarray(snplists[i]["allele"], object)[ii],
                af1, np.asarray(snplists[i]["afreq"])[ii], same_strand)
        if na_rm:
            keep = np.ones(len(i1), bool)
            for i in range(1, len(snplists)):
                keep &= np.asarray([f is not None
                                    for f in rv[f"flag{i+1}"]])
            for key in list(rv):
                rv[key] = rv[key][keep]
    return rv


def create_geno_set(data, sample_id=None, snp_id=None, dest_fn=None,
                    snpfirstdim=False, compress=True,
                    verbose=False) -> SNPData:
    """snpgdsCreateGenoSet (R/AllUtilities.R:1145): subset copy.

    `data` accepts an SNPData or a GDS path (the reference's src.fn);
    with dest_fn the subset is also written as a SNP_ARRAY GDS in the
    requested orientation (the reference's file->file semantics)."""
    import os as _os
    if isinstance(data, (str, bytes, _os.PathLike)):
        from ..io.store import open_snp_gds
        data = open_snp_gds(_os.fspath(data))
    ws, _ = init_workspace(data, sample_id, snp_id, autosome_only=False,
                           remove_monosnp=False, verbose=verbose)
    out = SNPData(
        sample_id=ws.sample_id.copy(), snp_id=ws.snp_id.copy(),
        genotype_packed=pack2bit(ws.geno()), n_samp=ws.n_samp,
        snp_position=np.asarray(data.snp_position)[ws.snp_idx],
        snp_chromosome=np.asarray(data.snp_chromosome)[ws.snp_idx],
        snp_allele=None if data.snp_allele is None
        else data.snp_allele[ws.snp_idx],
        snp_rs_id=None if data.snp_rs_id is None
        else data.snp_rs_id[ws.snp_idx],
        sample_annot={k: np.asarray(v)[ws.samp_idx]
                      for k, v in data.sample_annot.items()},
        autosome_start=data.autosome_start, autosome_end=data.autosome_end,
        chrom_codes=dict(data.chrom_codes))
    if dest_fn is not None:
        from ..io.gds import write_snp_gds
        write_snp_gds(out, dest_fn, compress=compress,
                      snpfirstdim=snpfirstdim)
    return out


def combine_geno(datasets, out_fn=None, method="position",
                 same_strand=False, snpfirstdim=False, compress=True,
                 verbose=False) -> SNPData:
    """snpgdsCombineGeno (R/AllUtilities.R:1285): merge datasets over the
    intersection of SNPs (matched by position or exact id), concatenating
    samples; alleles are aligned to the first dataset (flip flags from
    allele_strand). Datasets may be SNPData objects or GDS paths (the
    reference's gds.fn vector); with out_fn the merge is also written as
    a SNP_ARRAY GDS (the reference's out.fn)."""
    import os as _os

    from ..io.store import open_snp_gds
    datasets = [open_snp_gds(_os.fspath(d))
                if isinstance(d, (str, bytes, _os.PathLike)) else d
                for d in datasets]
    lists = [snp_list(d) for d in datasets]
    rv = snp_list_intersect(*lists, method=method, same_strand=same_strand)
    idx1 = rv["idx1"]
    genos = [datasets[0].geno(idx1)]
    sample_ids = [datasets[0].sample_id]
    for i in range(1, len(datasets)):
        idx = rv[f"idx{i+1}"]
        g = datasets[i].geno(idx)
        if method == "position":
            flags = rv[f"flag{i+1}"]
            flip = np.asarray([bool(f) and (f & 0x01) for f in flags])
            g = np.where(flip[:, None] & (g < 3), 2 - g, g)
        genos.append(g)
        sample_ids.append(datasets[i].sample_id)
    geno = np.concatenate(genos, axis=1)
    sample_id = np.concatenate(sample_ids)
    if len(np.unique(sample_id)) != len(sample_id):
        raise ValueError("Duplicate sample IDs across datasets")
    d0 = datasets[0]
    out = SNPData(
        sample_id=sample_id, snp_id=d0.snp_id[idx1],
        genotype_packed=pack2bit(geno.astype(np.uint8)),
        n_samp=len(sample_id),
        snp_position=np.asarray(d0.snp_position)[idx1],
        snp_chromosome=np.asarray(d0.snp_chromosome)[idx1],
        snp_allele=None if d0.snp_allele is None else d0.snp_allele[idx1],
        autosome_start=d0.autosome_start, autosome_end=d0.autosome_end,
        chrom_codes=dict(d0.chrom_codes))
    if out_fn is not None:
        from ..io.gds import write_snp_gds
        write_snp_gds(out, out_fn, compress=compress,
                      snpfirstdim=snpfirstdim)
    return out


def snpgds_option(data: Optional[SNPData] = None, autosome_start=1,
                  autosome_end=22, **codes):
    """snpgdsOption (R/AllUtilities.R:1910): chromosome coding options."""
    if data is not None:
        cc = {k: v for k, v in data.chrom_codes.items()}
        return {"autosome.start": data.autosome_start,
                "autosome.end": data.autosome_end, "chromosome.code": cc}
    cc = dict(X=autosome_end + 1, XY=autosome_end + 2, Y=autosome_end + 3,
              M=autosome_end + 4, MT=autosome_end + 4)
    cc.update(codes)
    return {"autosome.start": autosome_start, "autosome.end": autosome_end,
            "chromosome.code": cc}


def transpose(data, snpfirstdim=True, compress=True, optimize=True,
              verbose=False):
    """snpgdsTranspose (R/AllUtilities.R:1591) analog. On a GDS PATH it
    rewrites the file with the genotype node in the requested orientation
    (the reference's in-place conversion); on an in-memory SNPData it is
    an identity — the store is always snp-major and orientation is chosen
    at GDS write time (write_snp_gds(snpfirstdim=)). `optimize` is
    accepted for signature parity (cleanup.gds has no analog here: the
    writer always emits compact fragments)."""
    import os as _os
    if isinstance(data, (str, bytes, _os.PathLike)):
        from ..io.gds import write_snp_gds
        from ..io.store import open_snp_gds
        path = _os.fspath(data)
        d = open_snp_gds(path)
        if verbose:
            print(f"Transpose genotype: snpfirstdim={bool(snpfirstdim)}")
        write_snp_gds(d, path, compress=compress,
                      snpfirstdim=bool(snpfirstdim))
        return None
    return data
