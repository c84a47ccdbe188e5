"""North-star biobank benchmark (BASELINE.md / VERDICT r1 #1):
GRM(GCTA) + randomized PCA to top-32 PCs at 100k samples x 1M SNPs on ONE
chip, with per-tile checkpoints and measured host-transfer volume.

The synthetic cohort is GENERATED ON DEVICE (jax.random, keyed per
(chunk, group) so every slab visit regenerates identical data): host->
device traffic is then exactly zero for genotypes — the honest number for
this mode, reported as such. ``--source store`` instead reads a real
on-disk 2-bit store through StoreSlabSource, whose TransferMeter counts
the slab uploads (the bounded-traffic demonstration: (1 + ~(k+1)/2) x
dataset instead of the row-strip engine's (n/strip) x). GRM tiles are
computed on device (cov and the per-pair missing denominator,
genPCA.cpp:1202-1236), shipped f32 and written per tile via
TileGridCheckpointer — kill the run at any point and it resumes at the
first missing tile (--selftest-resume demonstrates this in-process).

Output: one JSON line per phase plus a summary JSON written to
BIOBANK.json (wall-clock per phase, pair-SNP/s, transfer volumes).

Usage:
  python tools/bench_biobank.py                     # full 100k x 1M
  python tools/bench_biobank.py --samples 16384 --snps 131072   # smoke
  python tools/bench_biobank.py --selftest-resume   # checkpoint demo
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


class GenSlabSource:
    """Device-generated synthetic cohort with the SlabSource contract.

    Per-SNP allele frequencies U(0.1, 0.9) keyed by chunk index; two
    population halves (groups below/above n_groups/2) shifted by
    +-structure so the top PC separates them (a correctness probe);
    HWE genotypes via two 15-bit threshold draws; ~1.2% missing. The
    same (chunk, group) key always regenerates identical data, so the
    stats pass, every tile visit and every PCA sweep see one consistent
    dataset — the device-memory analog of re-reading a file."""

    def __init__(self, seed, n_samp, n_snp, group, chunk,
                 structure=0.05, missing_u8=3, chunk_sel=None):
        import jax
        import jax.numpy as jnp
        import jax.random as jr
        from jax import lax

        assert n_snp % chunk == 0 and group % 4 == 0
        self.n_samp = n_samp
        self.n_snp = n_snp
        self.group = group
        self.chunk = chunk
        # chunk_sel: generate only these chunk indices (PRNG keys fold in
        # the ABSOLUTE chunk id, so a subset regenerates identical data —
        # the rank-distributed-PCA SNP partition)
        self.chunk_sel = (np.arange(n_snp // chunk) if chunk_sel is None
                          else np.asarray(chunk_sel, np.int64))
        self.n_chunks = len(self.chunk_sel)
        self.n_groups = -(-n_samp // group)
        self.seed = seed
        self._ctor = (seed, n_samp, n_snp, group, chunk, structure,
                      missing_u8)
        self.h2d_bytes = 0  # device-generated: nothing crosses the host

        sel_dev = jnp.asarray(self.chunk_sel, jnp.int32)

        @jax.jit
        def gen(j, pop_shift):
            def one(_, c):
                kp = jr.fold_in(jr.key(seed), c)
                p = jr.uniform(kp, (chunk,), minval=0.1, maxval=0.9)
                p = jnp.clip(p + pop_shift, 0.01, 0.99)
                p15 = (p * 32768.0).astype(jnp.uint32)
                kg = jr.fold_in(jr.fold_in(jr.key(seed ^ 0x5DEECE), c), j)
                r = jr.bits(kg, (chunk, group), jnp.uint32)
                a1 = (r & 0x7FFF) < p15[:, None]
                a2 = ((r >> 15) & 0x7FFF) < p15[:, None]
                g = a1.astype(jnp.uint8) + a2.astype(jnp.uint8)
                km = jr.fold_in(jr.fold_in(jr.key(seed ^ 0xB5297A), c), j)
                miss = jr.bits(km, (chunk, group), jnp.uint8) < missing_u8
                g = jnp.where(miss, jnp.uint8(3), g)
                b = g.reshape(chunk, group // 4, 4)
                packed = (b[..., 0] | (b[..., 1] << 2) | (b[..., 2] << 4)
                          | (b[..., 3] << 6))
                return None, packed

            _, slabs = lax.scan(one, None, sel_dev)
            return slabs

        self._gen = gen

    def with_chunk_sel(self, sel):
        sel = self.chunk_sel[np.asarray(sel)]
        seed, n_samp, n_snp, group, chunk, structure, missing_u8 = \
            self._ctor
        return GenSlabSource(seed, n_samp, n_snp, group, chunk,
                             structure=structure, missing_u8=missing_u8,
                             chunk_sel=sel)

    def pop_label(self, j: int) -> int:
        return 1 if j >= self.n_groups // 2 else 0

    def slab(self, j: int):
        shift = 0.05 if self.pop_label(j) else -0.05
        s = self._gen(j, shift)
        # padding samples of the final group decode as missing (code 3)
        valid = self.n_samp - j * self.group
        if valid < self.group:
            import jax.numpy as jnp

            g4 = self.group // 4
            and_mask = np.empty(g4, np.uint8)
            or_mask = np.empty(g4, np.uint8)
            for b in range(g4):
                keep = min(max(valid - 4 * b, 0), 4)
                am = (1 << (2 * keep)) - 1
                and_mask[b] = am
                or_mask[b] = 0xFF & ~am
            s = (s & jnp.asarray(and_mask)) | jnp.asarray(or_mask)
        return s


def _sync(x):
    # block_until_ready does not wait on the axon tunnel: materialize
    return np.asarray(x[:1, :1] if getattr(x, "ndim", 0) >= 2 else x[:1])


def run(args):
    import jax

    from snprelate_tpu.ops.tiles import (StoreSlabSource, TransferMeter,
                                         gcta_grm_tiles)
    from snprelate_tpu.models.pca_randomized import randomized_pca_slabs

    n, s = args.samples, args.snps
    group, chunk = args.group, args.chunk
    ck = args.checkpoint
    results = {"n_samples": n, "n_snps": s, "group": group, "chunk": chunk,
               "backend": jax.default_backend(), "source": args.source}

    if args.source == "gen":
        src = GenSlabSource(7, n, s, group, chunk)
        meter = None
    else:
        from snprelate_tpu.io.store import SNPData
        from snprelate_tpu.workspace import init_workspace

        gen = GenSlabSource(7, n, s, group, chunk)
        nb = -(-n // 4)
        if args.source == "disk":
            # an ACTUAL on-disk packed store (the save_packed_store /
            # open_packed_store container), read back through a memory
            # map: the host side touches only each slab's byte columns
            # per load (plus one sequential sweep for the stats pass) —
            # the disk analog of CGenoReadBySNP reading each block once
            # per pass (dGenGWAS.cpp:1283-1397)
            from snprelate_tpu.io.store import (open_packed_store,
                                                write_packed_meta)

            prefix = args.store_path or "/tmp/biobank_store"
            if prefix.endswith(".packed"):  # accept the file path too
                prefix = prefix[: -len(".packed")]
            pfn = prefix + ".packed"
            if not (os.path.exists(pfn)
                    and os.path.getsize(pfn) == s * nb
                    and os.path.exists(prefix + ".meta.npz")):
                t0 = time.time()
                mm = np.memmap(pfn, np.uint8, mode="w+", shape=(s, nb))
                for j in range(gen.n_groups):
                    sl = np.asarray(gen.slab(j)).reshape(s, group // 4)
                    c0 = j * (group // 4)
                    w = min(group // 4, nb - c0)
                    mm[:, c0: c0 + w] = sl[:, :w]
                mm.flush()
                del mm
                write_packed_meta(
                    prefix, np.asarray([f"s{i}" for i in range(n)],
                                       object),
                    np.arange(s), n, np.arange(s) * 10,
                    np.ones(s, np.int32))
                print(json.dumps({"phase": "store_build", "path": prefix,
                                  "bytes": s * nb,
                                  "wall_s": round(time.time() - t0, 1)}),
                      flush=True)
            try:  # drop the page cache so the run truly reads the disk
                with open("/proc/sys/vm/drop_caches", "w") as f:
                    f.write("3\n")
                results["page_cache_dropped"] = True
            except OSError:
                results["page_cache_dropped"] = False
            data = open_packed_store(prefix)
        else:  # "store": in-RAM packed store
            cols = []
            for j in range(gen.n_groups):
                sl = np.asarray(gen.slab(j)).reshape(s, group // 4)
                cols.append(sl)
            packed = np.concatenate(cols, axis=1)[:, :nb]
            data = SNPData(
                sample_id=np.asarray([f"s{i}" for i in range(n)], object),
                snp_id=np.arange(s), genotype_packed=packed,
                n_samp=n, snp_position=np.arange(s) * 10,
                snp_chromosome=np.ones(s, np.int32))
        ws, _ = init_workspace(data, autosome_only=False,
                               remove_monosnp=False,
                               missing_rate=np.nan)
        meter = TransferMeter()
        src = StoreSlabSource(ws, group, chunk, meter=meter)

    k = src.n_groups
    n_tiles = k * (k + 1) // 2

    rows = None
    if args.tile_rank:
        # multi-host partition: this process computes one rank's
        # weight-balanced tile-row share into the shared checkpoint
        # directory (grm(tile_rank=) semantics); run once per host, then
        # once without --tile-rank to assemble + run PCA
        from snprelate_tpu.ops.tiles import parse_tile_rank, rank_rows

        if not ck:
            raise SystemExit("--tile-rank needs --checkpoint")
        tr = parse_tile_rank(args.tile_rank)
        if tr is not None:
            rows = rank_rows(k, *tr)
            n_tiles = sum(k - i for i in rows)
            results["tile_rank"] = args.tile_rank

    # ---- phase: GRM (GCTA) over super tiles, per-tile checkpoints
    def grid_complete():
        if not ck:
            return False
        from snprelate_tpu.ops.tiles import probe_grid_meta

        got = probe_grid_meta(ck, 71, s, n)
        if got is None:
            return False
        kk = -(-n // got[0])
        return all(os.path.exists(f"{ck}.tile{i:05d}_{j:05d}.npz")
                   for i in range(kk) for j in range(i, kk))

    t0 = time.time()
    d2h = 0
    diag_sum = 0.0
    diag_cnt = 0
    off_sum = 0.0
    off_cnt = 0
    done_tiles = 0
    skip_grm_scan = bool(args.artifact) and grid_complete()
    if skip_grm_scan:
        # assembly run with --artifact: the ONLY read of the completed
        # tiles is the streamed GDS write below (no separate stats scan)
        done_tiles = n_tiles
    else:
        for r0, c0, nr, nc, tile in gcta_grm_tiles(
                src, n, method="GCTA", checkpoint=ck,
                out_dtype=np.float32, verbose=args.verbose, rows=rows):
            d2h += tile.nbytes
            done_tiles += 1
            if r0 == c0:
                d = np.diag(tile)
                diag_sum += np.nansum(d)
                diag_cnt += np.isfinite(d).sum()
                iu = np.triu_indices(nr, 1)
                off = tile[iu]
            else:
                off = tile.ravel()
            off_sum += np.nansum(off)
            off_cnt += np.isfinite(off).sum()
            if args.verbose:
                el = time.time() - t0
                print(f"  tile {done_tiles}/{n_tiles} at {el:.0f}s",
                      flush=True)
    grm_s = time.time() - t0
    # a rank run covers n_tiles of the k(k+1)/2 grid: credit its share
    pair_snp = 0.5 * float(n) * n * s \
        * (n_tiles / (k * (k + 1) // 2))
    results["grm"] = {
        "wall_s": round(grm_s, 1),
        "tera_pair_snp_per_s": round(pair_snp / grm_s / 1e12, 3),
        "tiles": done_tiles,
        "grm_diag_mean": round(diag_sum / max(diag_cnt, 1), 5),
        "grm_offdiag_mean": round(off_sum / max(off_cnt, 1), 6),
        "d2h_gb": round(d2h / 1e9, 2),
        "h2d_gb": round((meter.h2d_bytes if meter else 0) / 1e9, 2),
        "h2d_over_dataset": (round(meter.h2d_bytes
                                   / (s * (-(-n // 4))), 2)
                            if meter else 0.0),
    }
    print(json.dumps({"phase": "grm", **results["grm"]}), flush=True)

    # ---- phase: streamed GDS artifact from the completed tile grid
    # (O(group x n) memory, never densifies n x n — grm_save_to_gds
    # analog, genPCA.cpp:1571-1583)
    artifact_s = 0.0
    if args.artifact and rows is None:
        from snprelate_tpu.models.grm import (grm_tile_row_blocks,
                                              save_grm_rows)
        from snprelate_tpu.ops.tiles import probe_grid_meta

        got = probe_grid_meta(ck, 71, s, n)
        assert got is not None, "artifact needs a completed tile grid"
        t0 = time.time()
        stats = {"dsum": 0.0, "dcnt": 0, "osum": 0.0, "ocnt": 0}

        adt = (np.float32 if args.artifact_prec in ("single", "float32")
               else np.float64)

        def counted():
            for r0, rws in grm_tile_row_blocks(ck, "GCTA", n, got[0],
                                               dtype=adt):
                nr = rws.shape[0]
                blk = rws[:, r0: r0 + nr]
                d = np.diag(blk)
                stats["dsum"] += np.nansum(d)
                stats["dcnt"] += np.isfinite(d).sum()
                iu = np.triu_indices(nr, 1)
                off = np.concatenate([blk[iu].ravel(),
                                      rws[:, r0 + nr:].ravel()])
                stats["osum"] += np.nansum(off)
                stats["ocnt"] += np.isfinite(off).sum()
                if args.verbose:
                    print(f"  artifact rows {r0 + rws.shape[0]}/{n} at "
                          f"{time.time() - t0:.0f}s", flush=True)
                yield r0, rws
        sample_ids = np.asarray([f"s{i}" for i in range(n)], object)
        save_grm_rows(args.artifact, sample_ids, np.arange(s), "GCTA",
                      counted(), n, prec=args.artifact_prec,
                      compress=args.artifact_compress)
        artifact_s = time.time() - t0
        results["artifact"] = {
            "wall_s": round(artifact_s, 1),
            "file": args.artifact,
            "bytes": os.path.getsize(args.artifact),
            "prec": args.artifact_prec,
            "compress": args.artifact_compress,
            "grm_diag_mean": round(stats["dsum"] / max(stats["dcnt"], 1),
                                   5),
            "grm_offdiag_mean": round(
                stats["osum"] / max(stats["ocnt"], 1), 6),
        }
        print(json.dumps({"phase": "artifact", **results["artifact"]}),
              flush=True)

    if args.skip_pca or rows is not None:
        results["total_wall_s"] = round(grm_s + artifact_s, 1)
        out = args.out or "BIOBANK.json"
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps({"phase": "total", "wall_s": results
                          ["total_wall_s"], "artifact": out}), flush=True)
        return results

    # ---- phase: randomized PCA to top-32 PCs
    t0 = time.time()
    if args.pca_world > 1:
        # rank-distributed PCA (models/pca_rank.py): ranks measured
        # sequentially on the one chip (zero-communication phases, so
        # per-phase walls equal concurrent multi-host walls — the same
        # methodology as the tile_rank GRM demos); modeled 2-host wall =
        # sum over iterations of (max-rank power + reduce) + max-rank
        # project + assemble
        from snprelate_tpu.models.pca_rank import randomized_pca_ranked
        import tempfile

        wd = args.pca_workdir or tempfile.mkdtemp(prefix="pca_rank_")
        timings = {}
        W = args.pca_world

        def make_source(rank):
            if args.source == "gen":
                return GenSlabSource(7, n, s, group, chunk)
            return StoreSlabSource(ws, group, chunk, meter=meter)

        pca = randomized_pca_ranked(make_source, n, wd, world=W,
                                    eigen_cnt=args.pcs,
                                    aux_dim=2 * args.pcs,
                                    iter_num=args.iters, seed=11,
                                    verbose=args.verbose,
                                    timings=timings)
        crit = 0.0
        for it in range(args.iters):
            crit += max(timings[("power", it, r)] for r in range(W))
            crit += timings[("reduce", it, -1)]
        crit += max(timings[("project", 0, r)] for r in range(W))
        crit += timings[("assemble", 0, -1)]
        results["pca_rank"] = {
            "world": W,
            "workdir": wd,
            "wall_1proc_s": round(sum(timings.values()), 1),
            "wall_multihost_model_s": round(crit, 1),
            "per_phase": {f"{k[0]}{k[1]}.r{k[2]}": round(v, 2)
                          for k, v in timings.items()},
        }
        print(json.dumps({"phase": "pca_rank", **results["pca_rank"]}),
              flush=True)
    else:
        pca = randomized_pca_slabs(src, n, eigen_cnt=args.pcs,
                                   aux_dim=2 * args.pcs,
                                   iter_num=args.iters,
                                   seed=11, verbose=args.verbose)
    pca_s = time.time() - t0
    # correctness probe: PC1 separates the two planted populations.
    # Stores built by io/synth.py carry the truth as a sample
    # annotation; the device-PRNG source splits at the group midpoint.
    pc1 = pca.eigenvect[:, 0]
    if args.source != "gen" and "pop" in getattr(data, "sample_annot",
                                                 {}):
        lab = np.asarray(data.sample_annot["pop"], int)
    else:
        half = src.n_groups // 2
        lab = np.asarray([1 if (i // group) >= half else 0
                          for i in range(n)])
    sep = (np.median(pc1[lab == 1]) - np.median(pc1[lab == 0]))
    polarity = np.sign(sep) if sep != 0 else 1.0
    frac = float(((pc1 * polarity > 0) == (lab == 1)).mean())
    results["pca"] = {
        "wall_s": round(pca_s, 1),
        "pcs": args.pcs,
        "iters": args.iters,
        "varprop_top5": [round(float(v), 6) for v in pca.varprop[:5]],
        "pc1_pop_separation_frac": round(frac, 4),
    }
    print(json.dumps({"phase": "pca", **results["pca"]}), flush=True)

    results["total_wall_s"] = round(grm_s + artifact_s + pca_s, 1)
    out = args.out or "BIOBANK.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"phase": "total", "wall_s": results["total_wall_s"],
                      "artifact": out}), flush=True)
    assert frac > 0.95, "PC1 failed to separate the planted populations"
    return results


def selftest_resume(args):
    """Small-config kill/resume demonstration: run 3 tiles, 'crash',
    rerun and verify only the remaining tiles compute and the assembled
    matrix matches an uncheckpointed run."""
    import tempfile

    from snprelate_tpu.ops import tiles as T

    src = GenSlabSource(7, args.samples, args.snps, args.group, args.chunk)
    k = src.n_groups
    n_tiles = k * (k + 1) // 2
    with tempfile.TemporaryDirectory() as td:
        ck = os.path.join(td, "grm.ck")
        seen = []
        for out in T.gcta_grm_tiles(src, args.samples, checkpoint=ck,
                                    out_dtype=np.float32):
            seen.append(out)
            if len(seen) == 3:
                break  # simulated kill
        computed = {"n": 0}
        orig = T._gcta_tile_scan

        def count(*a, **kw):
            computed["n"] += 1
            return orig(*a, **kw)

        T._gcta_tile_scan = count
        try:
            tiles2 = list(T.gcta_grm_tiles(src, args.samples,
                                           checkpoint=ck,
                                           out_dtype=np.float32))
        finally:
            T._gcta_tile_scan = orig
        assert len(tiles2) == n_tiles
        assert computed["n"] == n_tiles - 3, \
            f"resume recomputed {computed['n']} != {n_tiles - 3}"
        print(json.dumps({"phase": "selftest-resume", "ok": True,
                          "tiles": n_tiles, "resumed_from": 3}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=100_000)
    ap.add_argument("--snps", type=int, default=1_048_576)
    ap.add_argument("--group", type=int, default=None)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--pcs", type=int, default=32)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--source", choices=("gen", "store", "disk"),
                    default="gen")
    ap.add_argument("--store-path", default=None,
                    help="--source disk: packed store file (created when "
                         "missing or of the wrong size; reused otherwise)")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tile-rank", metavar="RANK/WORLD", default=None,
                    help="compute only this rank's tile-row share into "
                         "--checkpoint (one independent process per "
                         "host); assemble with a final run without this "
                         "flag")
    ap.add_argument("--artifact", metavar="FILE.gds", default=None,
                    help="stream the completed tile grid into a "
                         "SNPRELATE_OUTPUT GDS (O(group x n) memory, no "
                         "densify); on an assembly run with a complete "
                         "--checkpoint this REPLACES the tile stats scan")
    ap.add_argument("--artifact-prec", default="single",
                    choices=["single", "double"])
    ap.add_argument("--artifact-compress", default="",
                    help="artifact coder: '' (raw), ZIP, ZIP_RA, LZMA")
    ap.add_argument("--pca-world", type=int, default=1,
                    help="rank-distributed PCA over this many ranks "
                         "(sequentially measured; phases + modeled "
                         "multi-host wall reported)")
    ap.add_argument("--pca-workdir", default=None,
                    help="shared artifact directory for --pca-world")
    ap.add_argument("--out", default=None)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--skip-pca", action="store_true")
    ap.add_argument("--selftest-resume", action="store_true")
    args = ap.parse_args()
    if args.group is None:
        from snprelate_tpu.ops.tiles import auto_tile_group

        args.group = auto_tile_group(args.snps)
    if args.selftest_resume:
        args.samples = min(args.samples, 2048)
        args.snps = min(args.snps, 16384)
        args.group = min(args.group, 512)
        args.chunk = min(args.chunk, 2048)
        selftest_resume(args)
    else:
        from snprelate_tpu.utils.profile import maybe_env_trace

        with maybe_env_trace():  # SNPRELATE_TPU_TRACE=<dir> -> XLA trace
            run(args)
