"""LD toolchain at biobank sample count (VERDICT r4 #2): ld_pruning and
banded ld_mat at 65,536 samples x 229,376 SNPs with planted perfect-LD
twin SNPs, reading a real on-disk packed store.

The reference LD-prunes arbitrary cohorts with thread-parallel window
tests (genLD.cpp:810-925, NEWS:42-48 "faster snpgdsLDpruning"); at this
sample count the per-window joint tables are 4096x larger than its
benchmarks'. The packed device-resident route (ops/ld.PackedLD) keeps
H2D at 1x the 2-bit chromosome, decodes windows on device, and ships
only boolean decision bands / value bands.

Correctness: twin SNP j+1 is a byte-identical copy of SNP j (|LD| = 1);
the pruning scan must drop EXACTLY one of each twin pair and nothing
else (at 65k samples the null LD noise is ~1/sqrt(n) ~ 0.004, far under
the 0.2 threshold), and the banded ld_mat must read ~1.0 at each twin
offset.

Usage: python tools/bench_ld_biobank.py [--samples N] [--snps S]
       [--store PREFIX] [-o OUT.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_store(prefix, n_samp, n_snp, twin_stride=512, verbose=True):
    """Synthetic store + planted twin SNP rows (j+1 := j) every
    twin_stride rows, skipping chromosome boundaries."""
    from snprelate_tpu.io.synth import generate_synthetic_store

    t = generate_synthetic_store(prefix, n_samp, n_snp, seed=23,
                                 dup_pairs=[], pc_pairs=[],
                                 verbose=verbose)
    chrom = 1 + np.arange(n_snp, dtype=np.int64) * 22 // n_snp
    twins = [int(j) for j in range(twin_stride // 2, n_snp - 1,
                                   twin_stride)
             if chrom[j] == chrom[j + 1]]
    nb = -(-n_samp // 4)
    mm = np.memmap(prefix + ".packed", np.uint8, mode="r+",
                   shape=(n_snp, nb))
    for j in twins:
        mm[j + 1] = mm[j]
    mm.flush()
    del mm
    t["twins"] = twins
    with open(prefix + ".twins.json", "w") as f:
        json.dump(twins, f)
    return twins


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=65536)
    ap.add_argument("--snps", type=int, default=229376)
    ap.add_argument("--store", default="/tmp/ldstore")
    ap.add_argument("--threshold", type=float, default=0.2)
    ap.add_argument("--slide", type=int, default=32)
    ap.add_argument("-o", "--out", default="LD_biobank.json")
    args = ap.parse_args()

    import jax

    from snprelate_tpu.io.store import open_packed_store
    from snprelate_tpu.models.ld import ld_mat, ld_pruning

    nb = -(-args.samples // 4)
    pfn = args.store + ".packed"
    if (os.path.exists(pfn) and os.path.getsize(pfn) == args.snps * nb
            and os.path.exists(args.store + ".twins.json")):
        twins = json.load(open(args.store + ".twins.json"))
        build_s = 0.0
    else:
        t0 = time.time()
        twins = build_store(args.store, args.samples, args.snps)
        build_s = time.time() - t0
        print(json.dumps({"phase": "ld_store_build",
                          "wall_s": round(build_s, 1),
                          "twins": len(twins)}), flush=True)
    try:  # real disk reads
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        cache_dropped = True
    except OSError:
        cache_dropped = False
    data = open_packed_store(args.store)

    res = {"n_samples": args.samples, "n_snps": args.snps,
           "backend": jax.default_backend(),
           "page_cache_dropped": cache_dropped,
           "n_twins": len(twins), "store_build_s": round(build_s, 1)}

    # --- phase: LD pruning over all 22 chromosomes
    t0 = time.time()
    kept = ld_pruning(data, method="composite",
                      ld_threshold=args.threshold, start_pos="first",
                      missing_rate=np.nan, remove_monosnp=False,
                      autosome_only=True, maf=np.nan, seed=7,
                      verbose=True)
    prune_s = time.time() - t0
    kept_ids = set(np.concatenate(list(kept.values())).tolist())
    twin_ok = sum((j in kept_ids) != (j + 1 in kept_ids) for j in twins)
    n_kept = len(kept_ids)
    res["pruning"] = {
        "wall_s": round(prune_s, 1),
        "kept": n_kept,
        "expected_kept": args.snps - len(twins),
        "exact": n_kept == args.snps - len(twins)
        and twin_ok == len(twins),
        "twin_pairs_split": int(twin_ok),
    }
    print(json.dumps({"phase": "ld_pruning", **res["pruning"]}),
          flush=True)

    # --- phase: banded ld_mat (slide x n) across the whole SNP axis
    t0 = time.time()
    band = ld_mat(data, slide=args.slide, method="composite",
                  with_id=False).LD
    band_s = time.time() - t0
    tv = [float(band[0, j]) for j in twins]
    res["ld_mat_banded"] = {
        "wall_s": round(band_s, 1),
        "slide": args.slide,
        "twin_ld_min": round(min(tv), 5),
        "twin_ld_max": round(max(tv), 5),
        "offdiag_abs_p99": round(float(np.nanpercentile(
            np.abs(band[np.isfinite(band)]), 99)), 5),
    }
    print(json.dumps({"phase": "ld_mat_banded", **res["ld_mat_banded"]}),
          flush=True)

    ok = res["pruning"]["exact"] and min(tv) > 0.99
    res["ok"] = ok
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({"phase": "total", "ok": ok, "out": args.out}),
          flush=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
