"""100k-sample KING relatedness screen on ONE chip via the super-tile
route (`king_ibd_selection(tiles=...)` internals driven directly).

The cohort is generated on device (bench_biobank.GenSlabSource); one
group is a PRNG TWIN of another (same key, same frequency shift), so the
expected relative set is exactly the `group` duplicate pairs
(kinship ~0.5 across the two groups) — recovery is verifiable pair by
pair: the screen must find ALL of them and nothing else at a 0.2 cutoff.

Usage: python tools/bench_king_screen_tiles.py [--samples 100000]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(args):
    import runpy

    mod = runpy.run_path(
        os.path.join(os.path.dirname(__file__), "bench_biobank.py"))
    GenSlabSource = mod["GenSlabSource"]

    from snprelate_tpu.models.king import _king_screen_tiles
    from snprelate_tpu.ops.tiles import auto_tile_group

    n, s = args.samples, args.snps
    group = args.group or auto_tile_group(s, bytes_per_cell=20)

    class TwinSource(GenSlabSource):
        """Last group regenerates the FIRST group's slab (same key, same
        shift): every sample in group 0 has an identical twin."""

        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.twin = (0, self.n_groups - 1)

        def pop_label(self, j):
            if j == self.twin[1]:
                j = self.twin[0]
            return super().pop_label(j)

        def slab(self, j):
            if j == self.twin[1]:
                # same genotypes as group 0; final-group sample padding
                # still applies below
                real_j = self.twin[0]
                shift = 0.05 if super().pop_label(real_j) else -0.05
                out = self._gen(real_j, shift)
                valid = self.n_samp - j * self.group
                if valid < self.group:
                    import jax.numpy as jnp

                    g4 = self.group // 4
                    am = np.empty(g4, np.uint8)
                    om = np.empty(g4, np.uint8)
                    for b in range(g4):
                        keep = min(max(valid - 4 * b, 0), 4)
                        am[b] = (1 << (2 * keep)) - 1
                        om[b] = 0xFF & ~am[b]
                    out = (out & jnp.asarray(am)) | jnp.asarray(om)
                return out
            return super().slab(j)

    src = TwinSource(7, n, s, group, args.chunk)
    k = src.n_groups

    class WS:  # minimal workspace facade for _king_screen_tiles
        n_samp = n
        n_snp = s
        sample_id = np.asarray([f"s{i}" for i in range(n)], object)

    fam = np.full(n, -1, np.int64)
    t0 = time.time()
    res = _king_screen_tiles(WS, fam, args.cutoff, args.hit_cap,
                             group, args.chunk, args.verbose, source=src)
    wall = time.time() - t0

    # expected: sample i of group 0 pairs with the same offset in the
    # last group (for offsets that exist in the final partial group)
    last0 = (k - 1) * group
    n_last = n - last0
    expected = {(f"s{i}", f"s{last0 + i}") for i in range(min(group,
                                                              n_last))}
    got = set(zip(res["ID1"].tolist(), res["ID2"].tolist()))
    missing = expected - got
    extra = got - expected
    pairs_total = n * (n - 1) // 2
    out = {
        "n_samples": n, "n_snps": s, "group": group, "tiles":
        k * (k + 1) // 2, "pairs_screened": pairs_total,
        "wall_s": round(wall, 1),
        "tera_pair_snp_per_s": round(pairs_total * s / wall / 1e12, 3),
        "planted": len(expected), "found": len(got),
        "missing": len(missing), "extra": len(extra),
        "kinship_min_found": (round(float(np.min(res["kinship"])), 4)
                              if len(got) else None),
    }
    print(json.dumps(out))
    assert not missing, f"missed {len(missing)} planted twins"
    assert not extra, f"{len(extra)} false positives"
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=100_000)
    ap.add_argument("--snps", type=int, default=131_072)
    ap.add_argument("--group", type=int, default=None)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--cutoff", type=float, default=0.2)
    ap.add_argument("--hit-cap", type=int, default=65536)
    ap.add_argument("--verbose", action="store_true")
    main(ap.parse_args())
