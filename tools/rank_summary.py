"""Combine tile_rank GRM runs + the rank-partitioned PCA into one
end-to-end multi-host artifact.

Accounting (see STATUS.md round 4): on >=2 hosts the critical path is
  max(rank GRM walls) + [pca power/reduce/project critical path]
— the assembly tile re-scan is NOT on it: the rank-distributed PCA
power passes read genotype slabs, not the GRM, so the artifact/stats
scan (reported separately as `assembly_scan_s`) overlaps or follows
independently. The 1-process baseline is sum(rank walls) + the PCA
phases run back-to-back in one process (`pca wall_1proc_s`), matching
how one chip would compute the identical tile grid sequentially.

Usage: python tools/rank_summary.py RANK0.json RANK1.json ASSEMBLY.json
       [-o OUT.json] [--note TEXT]
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ranks", nargs="+",
                    help="rank jsons..., then the assembly json last")
    ap.add_argument("-o", "--out", default="BIOBANK_rank_summary.json")
    ap.add_argument("--note", default=None)
    ap.add_argument("--scan-s", type=float, default=None,
                    help="override the assembly scan wall (use when the "
                         "assembly run's scan caught a tunnel stall and "
                         "another run holds the representative number)")
    a = ap.parse_args()

    *rank_fns, asm_fn = a.ranks
    ranks = [json.load(open(fn)) for fn in rank_fns]
    asm = json.load(open(asm_fn))

    walls = [r["grm"]["wall_s"] for r in ranks]
    pca_1p = asm["pca_rank"]["wall_1proc_s"]
    pca_mh = asm["pca_rank"]["wall_multihost_model_s"]
    t_1proc = sum(walls) + pca_1p
    t_multi = max(walls) + pca_mh
    out = {
        "config": {k: asm[k] for k in
                   ("n_samples", "n_snps", "group", "chunk", "backend",
                    "source")},
        "world": len(ranks),
        "grm": {
            "rank_walls_s": walls,
            "rank_tiles": [r["grm"]["tiles"] for r in ranks],
            "critical_s": max(walls),
            "combined_s": round(sum(walls), 1),
            "scaling_efficiency": round(sum(walls) / max(walls)
                                        / len(ranks), 3),
        },
        "pca": {
            "wall_1proc_s": pca_1p,
            "wall_multihost_model_s": pca_mh,
            "pc1_pop_separation_frac":
                asm["pca"]["pc1_pop_separation_frac"],
        },
        "assembly_scan_s": (a.scan_s if a.scan_s is not None
                            else asm["grm"]["wall_s"]),
        # provenance: which numbers are measured vs substituted/modeled
        "assembly_scan_s_overridden": a.scan_s is not None,
        "provenance": {
            "rank_walls": "measured (sequential runs on one chip; see "
                          "note for tunnel-period spread)",
            "wall_multihost_model_s": "model: critical path from "
                                      "measured per-rank phase walls",
        },
        "end_to_end": {
            "total_1proc_s": round(t_1proc, 1),
            "total_multihost_model_s": round(t_multi, 1),
            "speedup": round(t_1proc / t_multi, 3),
        },
    }
    if a.note:
        out["note"] = a.note
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["end_to_end"]))


if __name__ == "__main__":
    main()
