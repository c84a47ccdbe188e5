"""Biobank KING relatedness screen reading a real ON-DISK packed store,
verified against the store's planted ground truth (io/synth.py sidecar).

The production pattern this measures: stream the 2-bit store through the
super-tile count engine, evaluate KING-robust kinship on device, ship
only the compacted hits (models/king.py king_ibd_selection; the
reference's analog is snpgdsIBDKING + snpgdsIBDSelection over the full
matrix, R/IBD.R:333-531 — unmaterializable at 100k samples).

--thin S screens every S'th SNP (the standard thinned-marker screen;
kinship estimates need ~100k markers, not the full array). --tile-rank
R/W computes one rank's tile-row share and writes its PARTIAL hit table;
ranks partition the pair set exactly, so --assemble unions the rank
JSONs and verifies recovery of every planted duplicate (kinship ~0.5)
and parent-child pair (~0.25) with zero false positives at the cutoff.

Usage:
  python tools/bench_king_store.py --store /tmp/ns100k [--thin 8]
  python tools/bench_king_store.py --store ... --tile-rank 0/2 -o R0.json
  python tools/bench_king_store.py --assemble R0.json R1.json -o K.json
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def verify_against_truth(truth, id1, id2, kinship, cutoff):
    """Compare recovered pairs against the planted dup/pc sets."""
    got = {}
    for a, b, k in zip(id1, id2, kinship):
        ia, ib = int(str(a)[1:]), int(str(b)[1:])  # "s123" -> 123
        got[(min(ia, ib), max(ia, ib))] = float(k)
    dup = {tuple(sorted(p)) for p in truth["dup_pairs"]}
    pc = {tuple(sorted(p)) for p in truth["pc_pairs"]}
    dup_found = dup & got.keys()
    pc_found = pc & got.keys()
    false_pos = got.keys() - dup - pc
    dup_k = [got[p] for p in dup_found]
    pc_k = [got[p] for p in pc_found]
    return {
        "cutoff": cutoff,
        "planted_dup": len(dup), "recovered_dup": len(dup_found),
        "planted_pc": len(pc), "recovered_pc": len(pc_found),
        "false_positives": len(false_pos),
        "dup_kinship_range": ([round(min(dup_k), 4), round(max(dup_k), 4)]
                              if dup_k else None),
        "pc_kinship_range": ([round(min(pc_k), 4), round(max(pc_k), 4)]
                             if pc_k else None),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", default=None,
                    help="packed-store prefix (with .truth.json sidecar)")
    ap.add_argument("--thin", type=int, default=1,
                    help="screen every THIN'th SNP (1 = full set)")
    ap.add_argument("--cutoff", type=float, default=0.177,
                    help="kinship cutoff (0.177 = 2nd-degree bound)")
    ap.add_argument("--tile-rank", default=None, metavar="RANK/WORLD")
    ap.add_argument("--tile-group", type=int, default=None,
                    help="sample-group size of the screen's tile grid "
                         "(default: auto from HBM)")
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--assemble", nargs="+", default=None,
                    help="rank JSONs to union + verify (no compute)")
    ap.add_argument("-o", "--out", default="KING_store.json")
    args = ap.parse_args()

    if args.assemble:
        ranks = [json.load(open(fn)) for fn in args.assemble]
        truth_fn = ranks[0]["store"] + ".truth.json"
        truth = json.load(open(truth_fn))
        id1 = sum((r["hits"]["ID1"] for r in ranks), [])
        id2 = sum((r["hits"]["ID2"] for r in ranks), [])
        kin = sum((r["hits"]["kinship"] for r in ranks), [])
        res = {
            "assembled_from": args.assemble,
            "world": len(ranks),
            "rank_walls_s": [r["wall_s"] for r in ranks],
            "critical_path_s": max(r["wall_s"] for r in ranks),
            "combined_s": round(sum(r["wall_s"] for r in ranks), 1),
            "n_hits": len(id1),
            "config": {k: ranks[0][k] for k in
                       ("store", "n_samples", "n_snps_screened", "thin",
                        "backend")},
            "verify": verify_against_truth(truth, id1, id2, kin,
                                           ranks[0]["cutoff"]),
        }
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        print(json.dumps(res["verify"]))
        ok = (res["verify"]["recovered_dup"] == res["verify"]["planted_dup"]
              and res["verify"]["recovered_pc"] == res["verify"]["planted_pc"]
              and res["verify"]["false_positives"] == 0)
        print(json.dumps({"phase": "king_assemble", "ok": ok,
                          "out": args.out}))
        return

    import jax

    from snprelate_tpu.io.store import open_packed_store
    from snprelate_tpu.models.king import king_ibd_selection
    from snprelate_tpu.ops.tiles import parse_tile_rank

    data = open_packed_store(args.store)
    truth = json.load(open(args.store + ".truth.json"))
    snp_id = (None if args.thin <= 1
              else np.arange(0, data.n_snp, args.thin))
    tr = parse_tile_rank(args.tile_rank) if args.tile_rank else None
    try:  # measure real disk reads, not page-cache hits
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        cache_dropped = True
    except OSError:
        cache_dropped = False

    t0 = time.time()
    sel = king_ibd_selection(
        data, args.cutoff, snp_id=snp_id, autosome_only=False,
        remove_monosnp=False, missing_rate=float("nan"),
        chunk=args.chunk, tiles=True, tile_group=args.tile_group,
        tile_rank=tr, verbose=True)
    wall = time.time() - t0

    n_scr = data.n_snp if snp_id is None else len(snp_id)
    res = {
        "store": args.store,
        "n_samples": data.n_samp,
        "n_snps_screened": int(n_scr),
        "thin": args.thin,
        "cutoff": args.cutoff,
        "backend": jax.default_backend(),
        "page_cache_dropped": cache_dropped,
        "tile_rank": args.tile_rank,
        "wall_s": round(wall, 1),
        "n_hits": len(sel["ID1"]),
        "hits": {
            "ID1": [str(x) for x in sel["ID1"]],
            "ID2": [str(x) for x in sel["ID2"]],
            "kinship": [round(float(x), 5) for x in sel["kinship"]],
            "IBS0": [round(float(x), 6) for x in sel["IBS0"]],
        },
    }
    if tr is None:
        res["tera_pair_snp_per_s"] = round(
            0.5 * data.n_samp * data.n_samp * n_scr / wall / 1e12, 3)
        res["verify"] = verify_against_truth(
            truth, res["hits"]["ID1"], res["hits"]["ID2"],
            res["hits"]["kinship"], args.cutoff)
        print(json.dumps(res["verify"]))
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({"phase": "king_screen", "wall_s": res["wall_s"],
                      "n_hits": res["n_hits"], "out": args.out}))


if __name__ == "__main__":
    main()
