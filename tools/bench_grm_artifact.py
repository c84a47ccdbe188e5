"""Compressed streamed GRM artifact at scale (VERDICT r4 #3): assemble
the completed 100k-tile checkpoint into a ZIP_RA (or LZMA_RA)
SNPRELATE_OUTPUT GDS in O(group x n) memory, then stream it BACK and
verify every row block bit-exact against the tiles.

The reference writes LZMA_RA by default (R/IBD.R:570-591, streamed rows
genPCA.cpp:1571-1583); r4 demonstrated the streaming write only
uncompressed at scale. Compression here is zlib/xz time on one core —
the wall is reported per phase.

Usage: python tools/bench_grm_artifact.py --checkpoint /tmp/ns_ck/grm
       --samples 100000 --snps 1048576 --out /tmp/ns_grm.gds
       [--compress ZIP_RA] [--prec single] [-o ARTIFACT.json]
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
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--samples", type=int, required=True)
    ap.add_argument("--snps", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--compress", default="ZIP_RA")
    ap.add_argument("--prec", default="single")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--readback-only", action="store_true",
                    help="skip the write; verify an existing --out "
                         "(pass the recorded write wall via "
                         "--write-wall)")
    ap.add_argument("--write-wall", type=float, default=None)
    ap.add_argument("-o", "--json", default="ARTIFACT.json")
    a = ap.parse_args()

    from snprelate_tpu.models.grm import (grm_tile_row_blocks,
                                          grm_tiles_to_gds, load_grm_rows)
    from snprelate_tpu.ops.tiles import probe_grid_meta

    n, s = a.samples, a.snps
    got = probe_grid_meta(a.checkpoint, 71, s, n)
    assert got is not None, "no completed GCTA tile grid at checkpoint"
    group = got[0]
    sample_id = np.asarray([f"s{i}" for i in range(n)], object)
    snp_id = np.arange(s)

    if a.readback_only:
        write_s = a.write_wall if a.write_wall is not None else float("nan")
    else:
        t0 = time.time()
        grm_tiles_to_gds(a.checkpoint, a.out, sample_id, snp_id,
                         method="GCTA", prec=a.prec, compress=a.compress,
                         verbose=True)
        write_s = time.time() - t0
    size = os.path.getsize(a.out)
    raw = n * n * (4 if a.prec in ("single", "float32") else 8)
    print(json.dumps({"phase": "artifact_write",
                      "wall_s": round(write_s, 1),
                      "gb": round(size / 1e9, 2),
                      "ratio": round(size / raw, 3)}), flush=True)

    # full streamed read-back vs the tiles, block by block
    t0 = time.time()
    dt = np.float32 if a.prec in ("single", "float32") else np.float64
    blocks = 0
    dsum = 0.0
    dcnt = 0
    tiles_stream = grm_tile_row_blocks(a.checkpoint, "GCTA", n, group,
                                       dtype=dt)
    # block_rows=group aligns the artifact stream with the tile blocks
    for (r0a, rows_a), (r0b, rows_b) in zip(
            load_grm_rows(a.out, block_rows=group), tiles_stream):
        assert r0a == r0b, (r0a, r0b)
        rows_a = np.asarray(rows_a, dt)
        if not np.array_equal(rows_a, np.asarray(rows_b, dt)):
            raise AssertionError(f"row block at {r0a} mismatches tiles")
        d = np.diagonal(rows_a[:, r0a:r0a + rows_a.shape[0]])
        dsum += np.nansum(d)
        dcnt += np.isfinite(d).sum()
        blocks += 1
    read_s = time.time() - t0
    res = {
        "n_samples": n, "n_snps": s, "prec": a.prec,
        "compress": a.compress,
        "write_wall_s": round(write_s, 1),
        "bytes": size,
        "compress_ratio": round(size / raw, 3),
        "readback_wall_s": round(read_s, 1),
        "row_blocks_verified": blocks,
        "readback_equals_tiles": True,
        "grm_diag_mean": round(dsum / max(dcnt, 1), 5),
    }
    with open(a.json, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({"phase": "artifact_total", **{
        k: res[k] for k in ("write_wall_s", "bytes", "readback_wall_s",
                            "row_blocks_verified", "grm_diag_mean")}}),
          flush=True)
    if not a.keep:
        os.remove(a.out)
        print("artifact removed (disk bounded); JSON record kept")


if __name__ == "__main__":
    main()
