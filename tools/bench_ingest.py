"""Text-ingestion benchmark (VERDICT r4 #4): synthesize a multi-GB VCF
and ingest it into a packed store through the native block parser —
single stream and sharded multi-process.

The reference's parser is single-threaded (ConvToGDS.cpp:645-1013) and
our r4 path ran 13.6M genotypes/s; the AVX2 block parser targets >=10x
that on ONE core, and vcf_to_store_sharded scales with cores on real
hosts (this box has one core, so the worker sweep here demonstrates
correctness and the per-worker rate, not aggregate speedup).

Usage: python tools/bench_ingest.py [--genotypes 1e9] [--samples 50000]
       [--dir /tmp] [-o INGEST.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genotypes", type=float, default=1e9)
    ap.add_argument("--samples", type=int, default=50_000)
    ap.add_argument("--dir", default="/tmp")
    ap.add_argument("--workers", type=int, nargs="*", default=[1, 2])
    ap.add_argument("--keep-vcf", action="store_true")
    ap.add_argument("-o", "--out", default="INGEST.json")
    args = ap.parse_args()

    from snprelate_tpu.io.convert import (vcf_to_snpdata,
                                          vcf_to_store_sharded)
    from snprelate_tpu.native import gen_cohort_rows, packed_rows_to_vcf

    n_samp = args.samples
    n_var = max(1, int(args.genotypes / n_samp))
    vcf_fn = os.path.join(args.dir, "ingest_bench.vcf")
    res = {"n_samples": n_samp, "n_variants": n_var,
           "genotypes": n_samp * n_var}

    # --- write the synthetic VCF (native renderer, 512-variant blocks)
    t0 = time.time()
    with open(vcf_fn, "wb") as f:
        f.write(b"##fileformat=VCFv4.2\n")
        f.write(b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT")
        for i in range(n_samp):
            f.write(f"\ts{i}".encode())
        f.write(b"\n")
        for v0 in range(0, n_var, 512):
            nr = min(512, n_var - v0)
            rows = gen_cohort_rows(99, v0, nr, n_samp, n_samp // 2,
                                   0.05, 3, [], [])
            f.write(packed_rows_to_vcf(rows, n_samp, 1, v0 + 1))
    gen_s = time.time() - t0
    vcf_bytes = os.path.getsize(vcf_fn)
    res["vcf_gb"] = round(vcf_bytes / 1e9, 2)
    res["render_s"] = round(gen_s, 1)
    print(json.dumps({"phase": "render", "gb": res["vcf_gb"],
                      "wall_s": res["render_s"]}), flush=True)

    try:  # measure disk reads, not page-cache hits
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        res["page_cache_dropped"] = True
    except OSError:
        res["page_cache_dropped"] = False

    # --- single-stream ingestion (the vcf_to_snpdata fast path)
    t0 = time.time()
    d1 = vcf_to_snpdata(vcf_fn, out_store=os.path.join(args.dir,
                                                       "ingest_single"))
    single_s = time.time() - t0
    assert d1.n_snp == n_var and d1.n_samp == n_samp
    res["single_stream"] = {
        "wall_s": round(single_s, 1),
        "m_genotypes_per_s": round(n_samp * n_var / single_s / 1e6, 1),
        "mb_per_s": round(vcf_bytes / single_s / 1e6, 1),
        "vs_r4_rate_13p6m": round(n_samp * n_var / single_s / 13.6e6, 1),
    }
    print(json.dumps({"phase": "ingest_single",
                      **res["single_stream"]}), flush=True)

    # --- sharded workers (equality + per-config wall)
    ref_packed = np.asarray(d1.genotype_packed)
    res["sharded"] = []
    for w in args.workers:
        out = os.path.join(args.dir, f"ingest_w{w}")
        t0 = time.time()
        d2 = vcf_to_store_sharded(vcf_fn, out, workers=w)
        wall = time.time() - t0
        eq = (np.array_equal(ref_packed, np.asarray(d2.genotype_packed))
              and list(d1.snp_position) == list(d2.snp_position))
        res["sharded"].append({
            "workers": w, "wall_s": round(wall, 1),
            "m_genotypes_per_s": round(n_samp * n_var / wall / 1e6, 1),
            "equal_to_single": bool(eq)})
        print(json.dumps({"phase": "ingest_sharded",
                          **res["sharded"][-1]}), flush=True)
        for suf in (".packed", ".meta.npz"):
            os.remove(out + suf)
        assert eq, "sharded store != single-stream store"

    os.remove(os.path.join(args.dir, "ingest_single.packed"))
    os.remove(os.path.join(args.dir, "ingest_single.meta.npz"))
    if not args.keep_vcf:
        os.remove(vcf_fn)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({"phase": "total", "out": args.out}), flush=True)


if __name__ == "__main__":
    main()
