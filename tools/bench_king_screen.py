"""At-scale streaming KING screening benchmark (biobank scenario).

Generates a synthetic cohort (default 65,536 samples x 16,384 SNPs, ~1 GB
dense) with planted parent-child pairs, runs ``king_ibd_selection`` on the
default backend (TPU), and checks every planted pair is recovered exactly
with zero false positives among unrelated pairs.

This exercises the row-tiled engine auto block sizing (``_row_tile_setup``
HBM budget) at a scale where the full n x n kinship matrix (17 GB) could
never be materialized.

Usage: python tools/bench_king_screen.py [--nsamp 65536] [--nsnp 16384]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synth_cohort(nsamp: int, nsnp: int, n_planted: int, seed: int = 7):
    """(packed snp-major genotypes, planted (parent, child) index pairs).

    AFs ~ U(0.05, 0.5); genotypes Binomial(2, p); children get one
    transmitted allele from the parent and one random allele (true
    parent-child kinship 0.25)."""
    rng = np.random.default_rng(seed)
    p = rng.uniform(0.05, 0.5, nsnp).astype(np.float32)
    g = rng.binomial(2, p[:, None], (nsnp, nsamp)).astype(np.uint8)
    parents = rng.choice(nsamp // 2, n_planted, replace=False)
    children = nsamp // 2 + parents  # disjoint from parents
    for par, ch in zip(parents, children):
        transmitted = rng.binomial(1, g[:, par] / 2.0)
        g[:, ch] = (transmitted + rng.binomial(1, p)).astype(np.uint8)
    from snprelate_tpu.io.store import pack2bit

    return pack2bit(g), sorted(zip(parents.tolist(), children.tolist()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsamp", type=int, default=65536)
    ap.add_argument("--nsnp", type=int, default=16384)
    ap.add_argument("--planted", type=int, default=64)
    ap.add_argument("--cutoff", type=float, default=0.177)
    ap.add_argument("--sample-block", type=int, default=None)
    args = ap.parse_args()

    from snprelate_tpu import king_ibd_selection
    from snprelate_tpu.io.store import SNPData

    t0 = time.perf_counter()
    packed, planted = synth_cohort(args.nsamp, args.nsnp, args.planted)
    gen_s = time.perf_counter() - t0
    data = SNPData(
        sample_id=np.array([f"s{i}" for i in range(args.nsamp)], object),
        snp_id=np.arange(args.nsnp), genotype_packed=packed,
        n_samp=args.nsamp, snp_position=np.arange(args.nsnp) * 1000,
        snp_chromosome=np.ones(args.nsnp, np.int32))

    t0 = time.perf_counter()
    res = king_ibd_selection(
        data, kinship_cutoff=args.cutoff, missing_rate=np.nan,
        remove_monosnp=False, sample_block=args.sample_block, verbose=True)
    screen_s = time.perf_counter() - t0

    found = sorted(
        (int(str(a)[1:]), int(str(b)[1:])) if int(str(a)[1:]) < int(str(b)[1:])
        else (int(str(b)[1:]), int(str(a)[1:]))
        for a, b in zip(res["ID1"], res["ID2"]))
    planted_set, found_set = set(planted), set(found)
    pairs = 0.5 * args.nsamp * (args.nsamp - 1)
    print(json.dumps({
        "metric": "streaming KING screen wall-clock",
        "n_samp": args.nsamp, "n_snp": args.nsnp,
        "pairs": int(pairs), "gen_s": round(gen_s, 1),
        "screen_s": round(screen_s, 1),
        "pair_snp_per_s": round(pairs * args.nsnp / screen_s / 1e12, 3),
        "planted": len(planted), "recovered":
            len(planted_set & found_set),
        "extra_hits": len(found_set - planted_set),
    }))
    ok = planted_set <= found_set and not (found_set - planted_set)
    print("KING SCREEN:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
