"""Command-line interface: `python -m snprelate_tpu <command> ...`.

Production front-end over the library API (the reference is R-only; a CLI
is the natural deployment surface for a framework run on TPU hosts and in
batch schedulers). Every command reads SNP GDS / SeqArray GDS files
(io/store.py) and writes plain text, CSV, .npz or GDS artifacts.

Commands:
  summary       dataset description (snpgdsSummary analog)
  freq          per-SNP allele frequency / MAF / missing rate
  hwe           exact Hardy-Weinberg p-values
  pca           exact or randomized PCA -> eigenval/eigenvec files
  grm           genetic relationship matrix -> SNPRELATE_OUTPUT GDS
  merge-grm     weighted merge of per-subset GRM files
  eigmix        EIGMIX eigenanalysis (+ optional IBD matrix)
  ibs           IBS matrix -> .npz
  diss          individual dissimilarity matrix -> .npz
  king          KING kinship matrix -> .npz (+ optional pair table)
  king-screen   streaming biobank relatedness screen -> pair CSV
  ibd-mom       PLINK method-of-moments IBD -> .npz (+ pair table)
  ibd-mle       maximum-likelihood IBD (EM / downhill.simplex / Jacquard)
  indiv-beta    Weir-Goudet individual beta -> .npz
  inbreeding    per-sample inbreeding coefficients -> CSV
  fst           Weir&Cockerham / Weir&Hill Fst between populations
  ld-mat        full or banded LD matrix -> .npz
  cluster       IBS/diss hierarchical clustering + permutation subgroup cut
  prune         LD pruning -> kept snp.id list
  vcf2gds / bed2gds / ped2gds / gen2gds / gds2bed / gds2ped / gds2eigen
"""

from __future__ import annotations

import argparse
import math
import sys

import numpy as np


def _add_filter_args(p: argparse.ArgumentParser, missing_rate=0.01):
    p.add_argument("--maf", type=float, default=math.nan,
                   help="minor-allele-frequency filter (default: off)")
    p.add_argument("--missing-rate", type=float, default=missing_rate,
                   help=f"missing-rate filter (default {missing_rate})")
    p.add_argument("--no-autosome-only", dest="autosome_only",
                   action="store_false",
                   help="keep non-autosomal SNPs (default: autosomes only)")
    p.add_argument("--keep-monosnp", dest="remove_monosnp",
                   action="store_false",
                   help="keep monomorphic SNPs")
    p.add_argument("--sample-id-file", metavar="FILE",
                   help="text file with one sample.id per line")
    p.add_argument("--snp-id-file", metavar="FILE",
                   help="text file with one snp.id per line")
    p.add_argument("--quiet", action="store_true")


def _ids(path, like=None):
    if path is None:
        return None
    raw = [ln.strip() for ln in open(path) if ln.strip()]
    arr = np.asarray(like) if like is not None else None
    if arr is not None and arr.size and np.issubdtype(arr.dtype,
                                                     np.integer):
        return [int(x) for x in raw]
    if arr is None or not arr.size:  # no reference dtype: autodetect
        if raw and all(x.lstrip("-").isdigit() for x in raw):
            return [int(x) for x in raw]
    return raw


def _filters(data, a):
    return dict(sample_id=_ids(a.sample_id_file, data.sample_id),
                snp_id=_ids(a.snp_id_file, data.snp_id),
                autosome_only=a.autosome_only,
                remove_monosnp=a.remove_monosnp, maf=a.maf,
                missing_rate=a.missing_rate, verbose=not a.quiet)


def _open(path):
    import os

    from .io.store import open_packed_store, open_snp_gds

    # a save_packed_store() prefix (memory-mapped biobank container)
    # works wherever a GDS path does — but only when BOTH container
    # files exist and the path itself is not a file (a stale sibling
    # .meta.npz must never hijack a real GDS path)
    if (not os.path.isfile(str(path))
            and os.path.exists(str(path) + ".meta.npz")
            and os.path.exists(str(path) + ".packed")):
        return open_packed_store(str(path))
    return open_snp_gds(path)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="snprelate-tpu", description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("summary", help="dataset description")
    p.add_argument("gds")

    p = sub.add_parser("freq", help="per-SNP AF/MAF/missing rate CSV")
    p.add_argument("gds")
    p.add_argument("--out", help="output CSV (default stdout)")

    p = sub.add_parser("hwe", help="exact HWE p-values CSV")
    p.add_argument("gds")
    p.add_argument("--out", help="output CSV (default stdout)")

    p = sub.add_parser("pca", help="PCA -> <prefix>.eigenval.txt + "
                       "<prefix>.eigenvec.csv")
    p.add_argument("gds")
    p.add_argument("--out", required=True, metavar="PREFIX")
    p.add_argument("--eigen-cnt", type=int, default=32)
    p.add_argument("--algorithm", choices=["exact", "randomized"],
                   default=None, help="default exact (--rank implies "
                                      "randomized)")
    p.add_argument("--seed", type=int, default=0,
                   help="randomized-algorithm seed")
    p.add_argument("--checkpoint", metavar="FILE",
                   help="crash-resume checkpoint file prefix (one file, "
                        "updated per chunk; <FILE>.tile*.npy per tile on "
                        "the row-tiled paths)")
    p.add_argument("--rank", metavar="RANK/WORLD",
                   help="multi-host randomized PCA: run as this rank of "
                        "WORLD independent processes coordinating only "
                        "through --workdir (shared filesystem); rank 0 "
                        "merges and writes the output files, the others "
                        "exit after their projection")
    p.add_argument("--workdir", metavar="DIR",
                   help="shared artifact directory for --rank")
    p.add_argument("--iters", type=int, default=4,
                   help="randomized power passes (--rank mode)")
    p.add_argument("--aux-dim", type=int, default=None,
                   help="randomized subspace width (default 2*eigen-cnt)")
    p.add_argument("--barrier-timeout", type=float, default=3600.0,
                   help="max seconds to wait on other ranks' artifacts")
    _add_filter_args(p)

    p = sub.add_parser("grm", help="GRM -> SNPRELATE_OUTPUT GDS")
    p.add_argument("gds")
    p.add_argument("--out", required=True, metavar="FILE.gds")
    p.add_argument("--method", default="GCTA",
                   choices=["GCTA", "Eigenstrat", "EIGMIX", "Weighted",
                            "Corr", "IndivBeta"])
    p.add_argument("--prec", default="double", choices=["double", "single"])
    p.add_argument("--compress", default="LZMA_RA")
    p.add_argument("--sample-block", type=int,
                   help="row-tile size for large cohorts (auto if omitted)")
    p.add_argument("--checkpoint", metavar="FILE",
                   help="crash-resume checkpoint file prefix")
    p.add_argument("--tile-rank", metavar="RANK/WORLD",
                   help="multi-host partition: compute only this rank's "
                        "share of the super-tile grid into --checkpoint "
                        "(run once per host with RANK=0..WORLD-1 against "
                        "a shared directory, then once without "
                        "--tile-rank to assemble)")
    p.add_argument("--stream-assemble", action="store_true",
                   help="assemble a COMPLETED tile-grid --checkpoint "
                        "straight into --out in O(group x n) memory "
                        "(never densifies n x n; GCTA/Eigenstrat)")
    _add_filter_args(p)

    p = sub.add_parser("merge-grm", help="merge per-subset GRM GDS files")
    p.add_argument("files", nargs="+")
    p.add_argument("--out", required=True, metavar="FILE.gds")
    p.add_argument("--prec", default="double", choices=["double", "single"])

    p = sub.add_parser("eigmix", help="EIGMIX -> <prefix>.eigenval.txt + "
                       "<prefix>.eigenvec.csv (+ --ibdmat FILE.npz)")
    p.add_argument("gds")
    p.add_argument("--out", required=True, metavar="PREFIX")
    p.add_argument("--eigen-cnt", type=int, default=32)
    p.add_argument("--no-diagadj", dest="diagadj", action="store_false")
    p.add_argument("--ibdmat", metavar="FILE.npz",
                   help="also write the EIGMIX IBD matrix")
    _add_filter_args(p)

    p = sub.add_parser("ibs", help="IBS matrix -> .npz")
    p.add_argument("gds")
    p.add_argument("--out", required=True, metavar="FILE.npz")
    _add_filter_args(p)

    p = sub.add_parser("diss", help="dissimilarity matrix -> .npz")
    p.add_argument("gds")
    p.add_argument("--out", required=True, metavar="FILE.npz")
    _add_filter_args(p)

    p = sub.add_parser("king", help="KING kinship -> .npz (+ pair table)")
    p.add_argument("gds")
    p.add_argument("--out", required=True, metavar="FILE.npz")
    p.add_argument("--type", default="KING-robust",
                   choices=["KING-robust", "KING-homo"])
    p.add_argument("--cutoff", type=float,
                   help="also write <out>.pairs.csv of pairs above this "
                        "kinship")
    _add_filter_args(p)

    p = sub.add_parser("king-screen",
                       help="streaming relatedness screen (never "
                            "materializes the kinship matrix)")
    p.add_argument("gds")
    p.add_argument("--out", required=True, metavar="FILE.csv")
    p.add_argument("--tile-rank", metavar="RANK/WORLD",
                   help="multi-host screening: write only this rank's "
                        "share of the hit pairs (independent process per "
                        "host; concatenate the CSVs for the full result)")
    p.add_argument("--cutoff", type=float, required=True,
                   help="kinship cutoff, e.g. 0.0884 (3rd degree)")
    _add_filter_args(p)

    p = sub.add_parser("ibd-mom", help="PLINK MoM IBD (k0/k1/kinship) -> "
                       ".npz (+ pair table above --cutoff)")
    p.add_argument("gds")
    p.add_argument("--out", required=True, metavar="FILE.npz")
    p.add_argument("--cutoff", type=float,
                   help="also write <out>.pairs.csv above this kinship")
    _add_filter_args(p)

    p = sub.add_parser("ibd-mle", help="MLE IBD (k0/k1 or Jacquard D1-D8) "
                       "-> .npz (+ pair table above --cutoff)")
    p.add_argument("gds")
    p.add_argument("--out", required=True, metavar="FILE.npz")
    p.add_argument("--method", default="EM",
                   choices=["EM", "downhill.simplex", "Jacquard"])
    p.add_argument("--max-niter", type=int, default=1000)
    p.add_argument("--cutoff", type=float,
                   help="also write <out>.pairs.csv above this kinship")
    _add_filter_args(p)

    p = sub.add_parser("inbreeding", help="per-sample inbreeding "
                       "coefficients -> CSV")
    p.add_argument("gds")
    p.add_argument("--out", help="output CSV (default stdout)")
    p.add_argument("--method", default="mom.weir",
                   choices=["mom.weir", "mom.visscher", "mle", "gcta1",
                            "gcta2", "gcta3"])
    _add_filter_args(p, missing_rate=math.nan)

    p = sub.add_parser("indiv-beta", help="Weir-Goudet individual beta -> "
                       ".npz")
    p.add_argument("gds")
    p.add_argument("--out", required=True, metavar="FILE.npz")
    p.add_argument("--no-inbreeding", dest="inbreeding",
                   action="store_false",
                   help="plain-beta diagonal instead of the inbreeding "
                        "form (reference default is inbreeding=TRUE)")
    _add_filter_args(p)

    p = sub.add_parser("fst", help="population differentiation (Fst)")
    p.add_argument("gds")
    p.add_argument("--pop-file", required=True, metavar="FILE",
                   help="one population label per line, aligned to the "
                        "sample order (or to --sample-id-file)")
    p.add_argument("--method", default="W&C84",
                   choices=["W&C84", "W&H02"])
    p.add_argument("--out", metavar="FILE.csv",
                   help="per-SNP Fst CSV (default: print summary only)")
    _add_filter_args(p)

    p = sub.add_parser("ld-mat", help="full or banded LD matrix -> .npz")
    p.add_argument("gds")
    p.add_argument("--out", required=True, metavar="FILE.npz")
    p.add_argument("--slide", type=int, default=250,
                   help="band width in SNPs; <=0 = full matrix")
    p.add_argument("--method", default="composite",
                   choices=["composite", "r", "dprime", "corr", "cov"])
    p.add_argument("--sample-id-file", metavar="FILE")
    p.add_argument("--snp-id-file", metavar="FILE")
    p.add_argument("--quiet", action="store_true")

    p = sub.add_parser("cluster", help="hierarchical clustering + "
                       "permutation-Z subgroup detection -> groups CSV")
    p.add_argument("gds")
    p.add_argument("--out", required=True, metavar="FILE.csv",
                   help="sample.id,group CSV in dendrogram order")
    p.add_argument("--dist", default="ibs", choices=["ibs", "diss"],
                   help="dissimilarity source (1-IBS or snpgdsDiss)")
    p.add_argument("--z-threshold", type=float, default=15.0)
    p.add_argument("--outlier-n", type=int, default=5)
    p.add_argument("--n-perm", type=int, default=5000)
    p.add_argument("--seed", type=int, default=None)
    _add_filter_args(p)

    p = sub.add_parser("prune", help="LD pruning -> kept snp.id list")
    p.add_argument("gds")
    p.add_argument("--out", required=True, metavar="FILE.txt")
    p.add_argument("--ld-threshold", type=float, default=0.2)
    p.add_argument("--method", default="composite",
                   choices=["composite", "r", "dprime", "corr"])
    p.add_argument("--slide-max-bp", type=int, default=500000)
    p.add_argument("--seed", type=int, default=None)
    _add_filter_args(p, missing_rate=0.01)

    p = sub.add_parser("serve", help="long-lived inference service "
                       "(PCA projection + KING matching vs the resident "
                       "cohort)")
    p.add_argument("gds")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8799)
    p.add_argument("--eigen-cnt", type=int, default=16)
    _add_filter_args(p)

    for name, help_ in [("vcf2gds", "VCF -> SNP GDS"),
                        ("bed2gds", "PLINK BED -> SNP GDS"),
                        ("ped2gds", "PLINK PED -> SNP GDS"),
                        ("gen2gds", "Oxford GEN -> SNP GDS"),
                        ("gds2bed", "SNP GDS -> PLINK BED"),
                        ("gds2ped", "SNP GDS -> PLINK PED"),
                        ("gds2eigen", "SNP GDS -> EIGENSTRAT")]:
        p = sub.add_parser(name, help=help_)
        p.add_argument("src", nargs="+" if name == "ped2gds" else None)
        p.add_argument("dst")
        p.add_argument("--quiet", action="store_true")
        if name in ("vcf2gds", "bed2gds"):
            p.add_argument("--store", action="store_true",
                           help="treat DST as a packed-store prefix and "
                                "stream the conversion into "
                                "DST.packed/.meta.npz in bounded RAM "
                                "(biobank-scale ingestion; every other "
                                "command accepts the prefix as its GDS "
                                "argument)")
            if name == "vcf2gds":
                p.add_argument("--workers", type=int, default=1,
                               help="with --store and a plain "
                                    "(uncompressed) VCF: parse this many "
                                    "line-aligned byte ranges in parallel "
                                    "worker processes "
                                    "(vcf_to_store_sharded)")

    a = ap.parse_args(argv)
    from .utils.profile import maybe_env_trace

    with maybe_env_trace():  # SNPRELATE_TPU_TRACE=<dir> -> XLA trace
        out = run(a)
    if out:
        print(out)
    return 0


def run(a) -> str:
    cmd = a.cmd
    if cmd == "summary":
        from .models.stats import summary

        info = summary(_open(a.gds), show=True)
        return "\n".join(f"{k}: {v}" for k, v in info.items())

    if cmd == "freq":
        from .models.stats import snp_rate_freq

        data = _open(a.gds)
        rv = snp_rate_freq(data, with_id=True)
        rows = ["snp.id,allele.freq,minor.freq,missing.rate"]
        rows += [f"{i},{af:.10g},{mf:.10g},{mr:.10g}" for i, af, mf, mr in
                 zip(rv["snp.id"], rv["AlleleFreq"], rv["MinorFreq"],
                     rv["MissingRate"])]
        return _emit(rows, a.out)

    if cmd == "hwe":
        from .models.hwe import hwe

        data = _open(a.gds)
        pv = hwe(data, with_id=True)
        rows = ["snp.id,hwe.p"]
        rows += [f"{i},{p:.10g}" for i, p in zip(pv["snp.id"], pv["pvalue"])]
        return _emit(rows, a.out)

    if cmd == "pca":
        from .models.pca import pca

        data = _open(a.gds)
        if a.rank:
            from .models.pca_rank import pca_rank_process
            from .ops.tiles import (StoreSlabSource, auto_tile_group,
                                    parse_tile_rank)
            from .workspace import init_workspace

            if not a.workdir:
                raise SystemExit("--rank needs --workdir (the shared "
                                 "artifact directory)")
            if a.algorithm == "exact":
                raise SystemExit("--rank runs the rank-distributed "
                                 "RANDOMIZED algorithm; drop --algorithm "
                                 "exact or drop --rank")
            if getattr(a, "checkpoint", None):
                raise SystemExit("--rank resumes through --workdir "
                                 "artifacts, not --checkpoint; drop one")
            tr = parse_tile_rank(a.rank)
            rank, world = tr if tr is not None else (0, 1)
            ws, _ = init_workspace(data, **_filters(data, a))
            group = auto_tile_group(ws.n_snp, n_samp=ws.n_samp)
            src = StoreSlabSource(ws, group, min(4096, ws.n_snp))
            r = pca_rank_process(
                src, ws.n_samp, a.workdir, rank, world,
                eigen_cnt=a.eigen_cnt, aux_dim=a.aux_dim,
                iter_num=a.iters, seed=a.seed, sample_id=ws.sample_id,
                snp_id=ws.snp_id, timeout=a.barrier_timeout)
            if r is None:
                return (f"PCA rank {a.rank}: power/projection artifacts "
                        f"written to {a.workdir}; rank 0 assembles")
        else:
            r = pca(data, eigen_cnt=a.eigen_cnt,
                    algorithm=a.algorithm or "exact",
                    seed=a.seed, checkpoint=a.checkpoint,
                    **_filters(data, a))
        np.savetxt(a.out + ".eigenval.txt", r.eigenval[:a.eigen_cnt])
        with open(a.out + ".eigenvec.csv", "w") as f:
            f.write("sample.id," + ",".join(
                f"PC{i+1}" for i in range(r.eigenvect.shape[1])) + "\n")
            for s, row in zip(r.sample_id, r.eigenvect):
                f.write(str(s) + "," + ",".join(f"{v:.10g}" for v in row)
                        + "\n")
        algo = (f"rank-distributed x{a.rank}" if a.rank
                else a.algorithm or "exact")
        return (f"PCA ({algo}): wrote {a.out}.eigenval.txt and "
                f"{a.out}.eigenvec.csv ({len(r.sample_id)} samples x "
                f"{r.eigenvect.shape[1]} PCs)")

    if cmd == "grm":
        from .models.grm import grm
        from .ops.tiles import parse_tile_rank

        data = _open(a.gds)
        tile_rank = parse_tile_rank(a.tile_rank)  # '0/1' -> full run
        if a.stream_assemble:
            if not a.checkpoint or tile_rank:
                raise SystemExit("--stream-assemble needs a completed "
                                 "--checkpoint tile grid (no --tile-rank)")
            from .models.grm import grm_tiles_to_gds
            from .workspace import init_workspace

            ws, _ = init_workspace(data, **_filters(data, a))
            n, k = grm_tiles_to_gds(a.checkpoint, a.out, ws.sample_id,
                                    ws.snp_id, method=a.method,
                                    prec=a.prec, compress=a.compress)
            return (f"GRM ({a.method}): streamed {k * (k + 1) // 2} tiles "
                    f"({n} samples) -> {a.out} without densifying")
        r = grm(data, method=a.method,
                out_fn=None if tile_rank else a.out, out_prec=a.prec,
                out_compress=a.compress, sample_block=a.sample_block,
                checkpoint=a.checkpoint, tile_rank=tile_rank,
                **_filters(data, a))
        if r is None:
            return (f"GRM ({a.method}): rank {a.tile_rank} tiles saved to "
                    f"{a.checkpoint}; assemble with the same command "
                    f"without --tile-rank")
        return f"GRM ({a.method}): wrote {a.out}"

    if cmd == "merge-grm":
        from .models.grm import merge_grm

        merge_grm(list(a.files), out_fn=a.out, out_prec=a.prec)
        return f"merged {len(a.files)} GRM files -> {a.out}"

    if cmd == "ibs":
        from .models.ibs import ibs

        data = _open(a.gds)
        r = ibs(data, **_filters(data, a))
        np.savez_compressed(a.out, sample_id=np.asarray(r.sample_id, str),
                            ibs=r.ibs)
        return f"IBS: wrote {a.out} ({len(r.sample_id)} samples)"

    if cmd == "eigmix":
        from .models.eigmix import eigmix

        data = _open(a.gds)
        r = eigmix(data, eigen_cnt=a.eigen_cnt, diagadj=a.diagadj,
                   ibdmat=a.ibdmat is not None, **_filters(data, a))
        np.savetxt(a.out + ".eigenval.txt", r.eigenval[:a.eigen_cnt])
        with open(a.out + ".eigenvec.csv", "w") as f:
            f.write("sample.id," + ",".join(
                f"EV{i+1}" for i in range(r.eigenvect.shape[1])) + "\n")
            for s, row in zip(r.sample_id, r.eigenvect):
                f.write(str(s) + "," + ",".join(f"{v:.10g}" for v in row)
                        + "\n")
        msg = (f"EIGMIX: wrote {a.out}.eigenval.txt and {a.out}.eigenvec.csv"
               f" ({len(r.sample_id)} samples)")
        if a.ibdmat:
            np.savez_compressed(a.ibdmat,
                                sample_id=np.asarray(r.sample_id, str),
                                ibd=r.ibd)
            msg += f" + {a.ibdmat}"
        return msg

    if cmd == "diss":
        from .models.diss import diss

        data = _open(a.gds)
        r = diss(data, **_filters(data, a))
        np.savez_compressed(a.out, sample_id=np.asarray(r.sample_id, str),
                            diss=r.diss)
        return f"dissimilarity: wrote {a.out} ({len(r.sample_id)} samples)"

    if cmd == "ibd-mom":
        from .models.ibd_mom import ibd_mom
        from .models.ibd_mle import ibd_selection

        data = _open(a.gds)
        r = ibd_mom(data, kinship=True, **_filters(data, a))
        np.savez_compressed(a.out, sample_id=np.asarray(r.sample_id, str),
                            k0=r.k0, k1=r.k1, kinship=r.kinship)
        msg = f"IBD MoM: wrote {a.out}"
        if a.cutoff is not None:
            tab = ibd_selection(r, kinship_cutoff=a.cutoff)
            pfn = a.out + ".pairs.csv"
            _write_pairs(pfn, tab)
            msg += f" + {pfn} ({len(tab['ID1'])} pairs)"
        return msg

    if cmd == "ibd-mle":
        from .models.ibd_mle import ibd_mle, ibd_selection

        data = _open(a.gds)
        r = ibd_mle(data, method=a.method, max_niter=a.max_niter,
                    kinship=True, **_filters(data, a))
        arrs = dict(sample_id=np.asarray(r.sample_id, str),
                    kinship=r.kinship, afreq=r.afreq)
        if r.k0 is not None:
            arrs.update(k0=r.k0, k1=r.k1)
        if r.D is not None:  # Jacquard D1..D8 matrices
            arrs.update({k: v for k, v in r.D.items()})
        np.savez_compressed(a.out, **arrs)
        msg = f"IBD MLE ({a.method}): wrote {a.out}"
        if a.cutoff is not None:
            tab = ibd_selection(r, kinship_cutoff=a.cutoff)
            pfn = a.out + ".pairs.csv"
            _write_pairs(pfn, tab)
            msg += f" + {pfn} ({len(tab['ID1'])} pairs)"
        return msg

    if cmd == "inbreeding":
        from .models.inbreeding import ind_inb

        data = _open(a.gds)
        r = ind_inb(data, method=a.method, **_filters(data, a))
        rows = ["sample.id,inbreeding"]
        rows += [f"{s},{v:.10g}" for s, v in zip(r.sample_id, r.inbreeding)]
        return _emit(rows, a.out)

    if cmd == "indiv-beta":
        from .models.beta import indiv_beta

        data = _open(a.gds)
        r = indiv_beta(data, inbreeding=a.inbreeding, **_filters(data, a))
        np.savez_compressed(a.out, sample_id=np.asarray(r.sample_id, str),
                            beta=r.beta, inbreeding=bool(r.inbreeding),
                            avg_val=r.avg_val)
        return f"IndivBeta: wrote {a.out} ({len(r.sample_id)} samples)"

    if cmd == "fst":
        from .models.fst import fst

        data = _open(a.gds)
        kw = _filters(data, a)
        pops = [ln.strip() for ln in open(a.pop_file) if ln.strip()]
        r = fst(data, population=pops, method=a.method, with_id=True, **kw)
        summary_ = (f"Fst ({a.method}): Fst={r.Fst:.10g} "
                    f"MeanFst={r.MeanFst:.10g} "
                    f"({len(r.pop_levels)} populations)")
        if a.out:
            rows = ["snp.id,fst"]
            rows += [f"{i},{v:.10g}" for i, v in zip(r.snp_id, r.FstSNP)]
            _emit(rows, a.out)
            summary_ += f"; per-SNP Fst -> {a.out}"
        return summary_

    if cmd == "ld-mat":
        from .models.ld import ld_mat

        data = _open(a.gds)
        r = ld_mat(data, slide=a.slide, method=a.method,
                   sample_id=_ids(a.sample_id_file, data.sample_id),
                   snp_id=_ids(a.snp_id_file, data.snp_id),
                   verbose=not a.quiet)
        np.savez_compressed(a.out, snp_id=np.asarray(r.snp_id, str),
                            ld=r.LD, slide=r.slide)
        return (f"LD matrix ({a.method}, slide={r.slide}): wrote {a.out} "
                f"shape {r.LD.shape}")

    if cmd == "king":
        from .models.king import ibd_king
        from .models.ibd_mle import ibd_selection

        data = _open(a.gds)
        r = ibd_king(data, type=a.type, **_filters(data, a))
        arrs = dict(sample_id=np.asarray(r.sample_id, str))
        if a.type == "KING-homo":  # homo estimates k0/k1, not kinship
            arrs.update(k0=r.k0, k1=r.k1)
        else:
            arrs.update(kinship=r.kinship, IBS0=r.IBS0)
        np.savez_compressed(a.out, **arrs)
        msg = f"KING ({a.type}): wrote {a.out}"
        if a.cutoff is not None:
            tab = ibd_selection(r, kinship_cutoff=a.cutoff)
            pfn = a.out + ".pairs.csv"
            _write_pairs(pfn, tab)
            msg += f" + {pfn} ({len(tab['ID1'])} pairs)"
        return msg

    if cmd == "king-screen":
        from .models.king import king_ibd_selection

        from .ops.tiles import parse_tile_rank

        data = _open(a.gds)
        tile_rank = parse_tile_rank(a.tile_rank)
        tab = king_ibd_selection(data, kinship_cutoff=a.cutoff,
                                 tile_rank=tile_rank, **_filters(data, a))
        _write_pairs(a.out, tab)
        part = f" (rank {a.tile_rank} share)" if tile_rank else ""
        return (f"screen (cutoff {a.cutoff}): {len(tab['ID1'])} pairs"
                f"{part} -> {a.out}")

    if cmd == "cluster":
        from .models.cluster import hcluster, cut_tree
        from .models.diss import diss as diss_fn
        from .models.ibs import ibs as ibs_fn

        data = _open(a.gds)
        src = (ibs_fn if a.dist == "ibs" else diss_fn)(
            data, **_filters(data, a))
        hc = hcluster(src)
        cut = cut_tree(hc, z_threshold=a.z_threshold, outlier_n=a.outlier_n,
                       n_perm=a.n_perm, seed=a.seed)
        order = np.asarray(cut.samp_order)
        with open(a.out, "w") as f:
            f.write("sample.id,group\n")
            for i in order:
                f.write(f"{cut.sample_id[i]},{cut.samp_group[i]}\n")
        ngrp = len(set(np.asarray(cut.samp_group).tolist()))
        return (f"cluster ({a.dist}, Z>{a.z_threshold}): {ngrp} groups "
                f"-> {a.out}")

    if cmd == "prune":
        from .models.ld import ld_pruning

        data = _open(a.gds)
        kw = _filters(data, a)
        kw["maf"] = a.maf if not math.isnan(a.maf) else 0.005
        kept = ld_pruning(data, method=a.method, ld_threshold=a.ld_threshold,
                          slide_max_bp=a.slide_max_bp, seed=a.seed, **kw)
        ids = [str(s) for chrom in kept.values() for s in chrom]
        with open(a.out, "w") as f:
            f.write("\n".join(ids) + "\n")
        return f"LD pruning: kept {len(ids)} SNPs -> {a.out}"

    if cmd == "serve":
        from .serve import serve

        data = _open(a.gds)
        serve(data, host=a.host, port=a.port, eigen_cnt=a.eigen_cnt,
              verbose=not a.quiet, maf=a.maf, missing_rate=a.missing_rate,
              autosome_only=a.autosome_only,
              remove_monosnp=a.remove_monosnp,
              sample_id=_ids(a.sample_id_file, data.sample_id),
              snp_id=_ids(a.snp_id_file, data.snp_id))
        return ""  # serve_forever does not return

    # converters
    from .io import convert as cv
    from .io.gds import write_snp_gds

    quiet = getattr(a, "quiet", True)
    if cmd == "vcf2gds":
        if getattr(a, "store", False):
            if getattr(a, "workers", 1) > 1:
                cv.vcf_to_store_sharded(a.src, a.dst, workers=a.workers,
                                        verbose=not quiet)
            else:
                cv.vcf_to_snpdata(a.src, verbose=not quiet,
                                  out_store=a.dst)
            return f"{cmd}: wrote {a.dst}.packed"
        write_snp_gds(cv.vcf_to_snpdata(a.src, verbose=not quiet), a.dst)
    elif cmd == "bed2gds":
        base = a.src[:-4] if a.src.endswith(".bed") else a.src
        if getattr(a, "store", False):
            cv.bed_to_snpdata(base + ".bed", base + ".fam", base + ".bim",
                              verbose=not quiet, out_store=a.dst)
            return f"{cmd}: wrote {a.dst}.packed"
        write_snp_gds(cv.bed_to_snpdata(base + ".bed", base + ".fam",
                                        base + ".bim", verbose=not quiet),
                      a.dst)
    elif cmd == "ped2gds":
        srcs = a.src if isinstance(a.src, list) else [a.src]
        base = srcs[0][:-4] if srcs[0].endswith(".ped") else srcs[0]
        mapfn = srcs[1] if len(srcs) > 1 else base + ".map"
        write_snp_gds(cv.ped_to_snpdata(base + ".ped", mapfn,
                                        verbose=not quiet), a.dst)
    elif cmd == "gen2gds":
        write_snp_gds(cv.gen_to_snpdata(a.src, verbose=not quiet), a.dst)
    elif cmd == "gds2bed":
        cv.snpdata_to_bed(_open(a.src), a.dst, verbose=not quiet)
    elif cmd == "gds2ped":
        cv.snpdata_to_ped(_open(a.src), a.dst, verbose=not quiet)
    elif cmd == "gds2eigen":
        cv.snpdata_to_eigen(_open(a.src), a.dst, verbose=not quiet)
    else:  # pragma: no cover
        raise SystemExit(f"unknown command {cmd}")
    return f"{cmd}: wrote {a.dst}"


def _emit(rows, out):
    text = "\n".join(rows)
    if out:
        with open(out, "w") as f:
            f.write(text + "\n")
        return f"wrote {out} ({len(rows) - 1} rows)"
    return text


def _write_pairs(path, tab):
    keys = [k for k in ("ID1", "ID2", "kinship", "IBS0", "nsnp", "k0", "k1")
            if k in tab]
    n = len(tab[keys[0]])
    with open(path, "w") as f:
        f.write(",".join(keys) + "\n")
        for i in range(n):
            f.write(",".join(str(tab[k][i]) for k in keys) + "\n")


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
