"""KING kinship moment estimators (reference: R/IBD.R:333-419 +
src/genKING.cpp).

Both estimators post-process the fused pairwise counters:
- KING-robust (genKING.cpp:634-638): kinship between families
  0.5 - SumSq/(4*min(N1_Aa, N2_Aa)); within a family
  0.5 - SumSq/(2*(N1_Aa + N2_Aa)); IBS0 fraction = IBS0/nLoci.
- KING-homo (genKING.cpp:529-531): theta = 0.5 - SumSq/(8*SumAFreq),
  k0 = IBS0/(2*SumAFreq2), k1 = 2 - 2*k0 - 4*theta, with
  SumAFreq(2) = AF-weighted validity grams accumulated per chunk.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..workspace import init_workspace
from ..ops.pairwise import host_read, king_homo_counts, pair_counts


# max elements of one flattened hit block compacted by jnp.nonzero —
# int32 index safety margin (tests shrink it to exercise sub-blocking)
_FLAT_BLOCK_LIMIT = 1 << 30


@dataclass
class KINGRobustResult:
    sample_id: np.ndarray
    snp_id: np.ndarray
    afreq: Optional[np.ndarray]
    IBS0: np.ndarray
    kinship: np.ndarray


@dataclass
class KINGHomoResult:
    sample_id: np.ndarray
    snp_id: np.ndarray
    afreq: Optional[np.ndarray]
    k0: np.ndarray
    k1: np.ndarray


def _resolve_family(family_id, sample_id, ws) -> np.ndarray:
    """family.id -> per-selected-sample integer codes; samples with
    empty/missing family are singletons (code -1). family_id aligns with
    the sample_id argument when given, else with the selection
    (R/IBD.R:349-375)."""
    n = ws.n_samp
    fam = np.full(n, -1, np.int64)
    if family_id is None:
        return fam
    family_id = np.asarray(family_id, dtype=object)
    if sample_id is not None:
        if len(family_id) != len(np.asarray(sample_id, dtype=object)):
            raise ValueError(
                "'length(family.id)' should be the number of samples.")
        pos = {s: i for i, s in
               enumerate(np.asarray(sample_id, dtype=object).tolist())}
        family_id = np.asarray(
            [family_id[pos[s]] for s in ws.sample_id.tolist()], object)
    elif len(family_id) != n:
        raise ValueError(
            "'length(family.id)' should be the number of samples.")
    levels: dict = {}
    for i, f in enumerate(family_id.tolist()):
        if f is None or (isinstance(f, str) and f == "") or \
                (isinstance(f, float) and math.isnan(f)):
            continue
        fam[i] = levels.setdefault(f, len(levels))
    return fam


def ibd_king(data, sample_id=None, snp_id=None, autosome_only=True,
             remove_monosnp=True, maf=math.nan, missing_rate=0.01,
             type="KING-robust", family_id=None, verbose=False, chunk=None,
             use_matrix=False, mesh=None, sample_block=None,
             tile_devices=None, tile_rank=None, checkpoint=None,
             num_thread=None):
    """snpgdsIBDKING (R/IBD.R:333). use_matrix packs the symmetric
    outputs (useMatrix=TRUE analog). sample_block forces the row-strip
    large-N engine (auto-enabled past the HBM carry ceiling anyway).
    tile_rank=(rank, world): rank run of the multi-host tile partition
    into checkpoint= (returns None); assemble with
    tile_rank=(0, 1) over the same checkpoint."""
    from ..utils.packed import maybe_packed
    ws, _ = init_workspace(data, sample_id, snp_id, autosome_only,
                           remove_monosnp, maf, missing_rate, verbose=verbose)
    n = ws.n_samp

    if type == "KING-homo":
        parts = king_homo_counts(ws, chunk=chunk, verbose=verbose,
                                 mesh=mesh, sample_block=sample_block,
                                 tile_devices=tile_devices,
                                 tile_rank=tile_rank, checkpoint=checkpoint)
        if parts is None:
            return None
        c, waf, waf2 = parts
        with np.errstate(divide="ignore", invalid="ignore"):
            theta = 0.5 - c.sum_sq / (8.0 * waf)
            k0 = c.ibs0 / (2.0 * waf2)
            k1 = 2.0 - 2.0 * k0 - 4.0 * theta
        k0[~np.isfinite(k0)] = np.nan
        k1[~np.isfinite(k1)] = np.nan
        np.fill_diagonal(k0, 0.0)
        np.fill_diagonal(k1, 0.0)
        return KINGHomoResult(ws.sample_id, ws.snp_id, None,
                              maybe_packed(k0, use_matrix),
                              maybe_packed(k1, use_matrix))

    if type != "KING-robust":
        raise ValueError("Invalid 'type'.")

    fam = _resolve_family(family_id, sample_id, ws)
    c = pair_counts(ws, chunk=chunk, verbose=verbose, mesh=mesh,
                    sample_block=sample_block, tile_devices=tile_devices,
                    tile_rank=tile_rank, checkpoint=checkpoint)
    if c is None:
        return None
    nloci = c.nvalid.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        ibs0 = np.where(nloci > 0, c.ibs0 / nloci, np.nan)
        n1, n2 = c.n1_het.astype(np.float64), c.n2_het.astype(np.float64)
        within = 0.5 - c.sum_sq / (2.0 * (n1 + n2))
        between = 0.5 - c.sum_sq / (4.0 * np.minimum(n1, n2))
    same_fam = (fam[:, None] == fam[None, :]) & (fam[:, None] >= 0)
    kinship = np.where(same_fam, within, between)
    kinship[~np.isfinite(kinship)] = np.nan
    np.fill_diagonal(ibs0, 0.0)
    np.fill_diagonal(kinship, 0.5)
    return KINGRobustResult(ws.sample_id, ws.snp_id, None,
                            maybe_packed(ibs0, use_matrix),
                            maybe_packed(kinship, use_matrix))


def _make_tile_hits():
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(5, 6))
    def tile_hits(counters, fam_rows, fam_cols, cutoff, row_off,
                  diag: bool, cap: int):
        """Device cutoff filter + compaction for ONE (G x G) counter tile:
        same admit-only f32 pre-tests as the strip kernel; returns
        (count, ii, jj, 5 gathered integer counters) with only ~cap
        entries crossing the host boundary. row_off = global row - col
        index offset (diagonal tiles keep the strict lower triangle)."""
        vv, hh, dd, hv, vh = counters
        homo = vv + hh - hv - vh
        ibs0_i = (homo - dd) // 2
        ibs2_i = (homo + dd) // 2 + hh
        ibs1_i = vv - ibs0_i - ibs2_i
        ss = ibs1_i + 4 * ibs0_i
        ss_f = ss.astype(jnp.float32)
        mn = jnp.minimum(hv, vh)
        thr = 2.0 - 4.0 * cutoff
        mn_f = mn.astype(jnp.float32)
        hit_btw = (mn > 0) & \
            (ss_f <= thr * mn_f + 4e-6 * abs(thr) * mn_f + 1.0)
        same = (fam_rows[:, None] == fam_cols[None, :]) & \
            (fam_rows[:, None] >= 0)
        tot = hv + vh
        thr2 = 1.0 - 2.0 * cutoff
        tot_f = tot.astype(jnp.float32)
        hit_win = (tot > 0) & \
            (ss_f <= thr2 * tot_f + 4e-6 * abs(thr2) * tot_f + 1.0)
        hit = jnp.where(same, hit_win, hit_btw)
        if diag:
            g = vv.shape[0]
            hit = hit & (row_off + jnp.arange(g)[:, None]
                         > jnp.arange(g)[None, :])
        cnt = hit.sum(dtype=jnp.int32)
        flat = hit.ravel()
        (idx,) = jnp.nonzero(flat, size=cap, fill_value=0)
        g2 = vv.shape[1]
        ii = (idx // g2).astype(jnp.int32)
        jj = (idx - (idx // g2) * g2).astype(jnp.int32)
        vals = tuple(c[ii, jj] for c in (ss, hv, vh, ibs0_i, vv))
        return cnt, ii, jj, vals

    return tile_hits


_TILE_HITS = None


def _king_screen_tiles(ws, fam, kinship_cutoff, hit_cap, group, chunk,
                       verbose, source=None, mesh=None, devices=None,
                       tile_rank=None):
    """Super-tile KING screen: the bounded-traffic route for selections
    past the HBM slab-staging budget (the strip engine re-streams the
    dataset once per strip). Per tile, ONLY compacted hits cross the
    host boundary; a tile with more candidates than the cap retries with
    a doubled cap (no dense fallback table). mesh= column-shards each
    tile scan over every mesh device (the hit compaction gathers the
    sharded counters on device). devices= schedules whole tiles
    round-robin over the given jax devices — each keeps ONE tile's
    counters pending for the cap retry, so the auto group size halves
    (bytes_per_cell doubled) to stay inside HBM. tile_rank=(rank, world):
    screen only this rank's tile-row share and return its PARTIAL hit
    table — tiles partition the pair set exactly, so the union of every
    rank's table is the full result (no checkpoint needed: hits are the
    whole output)."""
    import jax.numpy as jnp

    from ..ops.pairwise import auto_chunk
    from ..ops.tiles import (StoreSlabSource, _PlacedSource,
                             _basis_tile_scan_c, _keyed_tile_stream,
                             _mesh_tile_shardings, _row_replicator,
                             _tile_carry, auto_tile_group)

    global _TILE_HITS
    if _TILE_HITS is None:
        _TILE_HITS = _make_tile_hits()
    n = ws.n_samp
    sid = np.asarray(ws.sample_id, object)
    if source is None:
        if group is None:
            # tile_rank: conservative budget regardless of local device
            # flags so every rank derives the SAME grid (the partial hit
            # tables partition the pair set only if the grids agree)
            group = auto_tile_group(
                ws.n_snp, n_samp=n,
                bytes_per_cell=40 if (devices is not None
                                      or tile_rank is not None) else 20)
        if chunk is None:
            chunk = auto_chunk(group, ws.n_snp)
        source = StoreSlabSource(ws, group, chunk)
    group = source.group
    if mesh is not None and devices is not None:
        raise ValueError("pass mesh= (intra-tile column sharding) or "
                         "devices= (whole-tile scheduling), not both")
    if mesh is not None:
        source = _PlacedSource(source, _mesh_tile_shardings(mesh)[0])
    row_slab = _row_replicator(mesh)
    fam_pad = np.full(source.n_groups * group, -1, np.int32)
    fam_pad[:n] = fam
    fam_d = jnp.asarray(fam_pad)

    rows = None
    if tile_rank is not None:
        from ..ops.tiles import rank_rows

        rows = rank_rows(source.n_groups, *tile_rank)

    id1, id2, ibs0_v, kin_v = [], [], [], []
    stream, stats, shards = _keyed_tile_stream(
        source, n, None, mesh, devices, stats=(fam_d,), rows=rows)
    pend = {}

    def settle(p):
        i, j, r0, c0, nr, nc, counters, fr, fc, cap, hits = p
        while True:
            cnt, di, dj, dvals = hits
            cnt = int(host_read(cnt))
            if cnt <= cap:
                break
            cap = 1 << (cnt - 1).bit_length()  # retry, compacted again
            hits = _TILE_HITS(counters, fr, fc, float(kinship_cutoff),
                              r0 - c0, i == j, cap)
        counters = None
        if verbose:
            print(f"KING screen tile ({i},{j}): {cnt} candidates")
        if cnt == 0:
            return
        ii = host_read(di)[:cnt]
        jj = host_read(dj)[:cnt]
        ss, hv_, vh_, ib0, nv = (host_read(v).astype(np.float64)[:cnt]
                                 for v in dvals)
        # padding rows/cols decode all-missing and can never hit; the
        # bound check is belt-and-braces for the compaction fill values
        keep_valid = (ii < nr) & (jj < nc)
        ii, jj = ii[keep_valid], jj[keep_valid]
        ss, hv_, vh_, ib0, nv = (a[keep_valid]
                                 for a in (ss, hv_, vh_, ib0, nv))
        gi = ii + r0
        gj = jj + c0
        same = (fam[gi] == fam[gj]) & (fam[gj] >= 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            kin = np.where(same, 0.5 - ss / (2.0 * (hv_ + vh_)),
                           0.5 - ss / (4.0 * np.minimum(hv_, vh_)))
        keep = np.nan_to_num(kin, nan=-np.inf) >= kinship_cutoff
        with np.errstate(divide="ignore", invalid="ignore"):
            ibs0f = np.where(nv > 0, ib0 / nv, np.nan)
        # ID1 = smaller global index (tiles have gi > gj on the diagonal,
        # gi < gj off it — normalize to the selection convention)
        lo = np.minimum(gi, gj)[keep]
        hi = np.maximum(gi, gj)[keep]
        id1.append(sid[lo])
        id2.append(sid[hi])
        kin_v.append(kin[keep])
        ibs0_v.append(ibs0f[keep])

    for di, (i, j, r0, c0, nr, nc, payload) in stream:
        if di in pend:
            settle(pend.pop(di))
        slab_i, slab_j = payload
        if shards[di] is not None:
            carry = tuple(jnp.zeros((group, group), jnp.int32,
                                    device=shards[di]) for _ in range(5))
        else:
            carry = _tile_carry([((group, group), jnp.int32)] * 5, mesh)
        counters = _basis_tile_scan_c(carry, row_slab(i, slab_i), slab_j)
        slab_i = slab_j = payload = None
        fam_k = stats[di][0]
        fr = fam_k[i * group:(i + 1) * group]
        fc = fam_k[j * group:(j + 1) * group]
        cap = max(int(hit_cap), 1)
        hits = _TILE_HITS(counters, fr, fc, float(kinship_cutoff),
                          r0 - c0, i == j, cap)
        pend[di] = (i, j, r0, c0, nr, nc, counters, fr, fc, cap, hits)
        counters = hits = None
    for di in sorted(pend):
        settle(pend.pop(di))
    return {"ID1": np.concatenate(id1) if id1 else np.array([], object),
            "ID2": np.concatenate(id2) if id2 else np.array([], object),
            "IBS0": np.concatenate(ibs0_v) if ibs0_v else np.array([]),
            "kinship": np.concatenate(kin_v) if kin_v else np.array([])}


def king_ibd_selection(data, kinship_cutoff, sample_id=None, snp_id=None,
                       autosome_only=True, remove_monosnp=True,
                       maf=math.nan, missing_rate=0.01, family_id=None,
                       sample_block=None, chunk=None, verbose=False,
                       hit_cap: int = 65536, mesh=None, tiles=None,
                       tile_group=None, tile_devices=None,
                       tile_rank=None):
    """Streaming KING-robust relatedness screening for cohorts whose n x n
    kinship matrix does not fit anywhere: equivalent to
    ibd_selection(ibd_king(data, type="KING-robust", family_id=...),
    kinship_cutoff) but computed in sample-row strips with device memory
    O(block x n) and host memory proportional to the number of RELATED
    pairs only (the typical biobank pipeline: find relatives, never
    materialize the matrix). family_id selects the reference's
    within-family estimator 0.5 - SumSq/(2(N1+N2)) per same-family pair
    (genKING.cpp:634-638) — the family-code vector ships to the device and
    each pair picks its estimator in the strip kernel. Returns
    {ID1, ID2, IBS0, kinship} like snpgdsIBDSelection (R/IBD.R:463).

    hit_cap: per-strip bound for the device-compacted candidate list (the
    hot path ships ~1 MB of hit indices + counters per strip instead of a
    dense hit bitmask). Strips with more candidates than hit_cap fall back
    to the dense-bitmask path — any cutoff that admits that many pairs is
    screening, not a relatedness search.

    mesh: a jax.sharding.Mesh — the strip carries are column-sharded over
    ALL mesh devices (the n-sample axis splits across chips), so each
    device contracts its own sample shard against the replicated SNP
    chunk; no collectives run until the compacted hit indices are
    gathered. Results are identical to the single-device path.

    tile_devices: whole (group x group) tiles scheduled round-robin over
    these jax devices on the super-tile route (implies tiles=True;
    zero-collective multi-chip partition, results identical).

    tile_rank=(rank, world): multi-HOST screening — each rank is an
    independent process screening its weight-balanced tile-row share and
    returning a PARTIAL hit table; tiles partition the pair set exactly,
    so concatenating every rank's {ID1, ID2, IBS0, kinship} is the full
    result. Implies tiles=True; no checkpoint or coordination needed."""
    if not np.isfinite(kinship_cutoff):
        raise ValueError("kinship_cutoff must be finite")
    if tile_rank is not None:
        from ..ops.tiles import parse_tile_rank

        if tiles is False:
            # the strip engine has no rank partition: honoring tiles=False
            # here would silently return the FULL hit table labeled as a
            # rank share (concatenating ranks would then duplicate pairs)
            raise ValueError("tile_rank= runs on the super-tile route; "
                             "drop tiles=False (or the tile_rank=)")
        force_tiles = True  # '(0, 1)' still means: take the tile route
        tile_rank = parse_tile_rank(tile_rank)
    else:
        force_tiles = False
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..ops.pairwise import (_basis_rows_step, _mesh_row_tools,
                                _row_tile_setup)

    ws, _ = init_workspace(data, sample_id, snp_id, autosome_only,
                           remove_monosnp, maf, missing_rate, verbose=verbose)
    sid = np.asarray(ws.sample_id, object)
    n = ws.n_samp
    fam = _resolve_family(family_id, sample_id, ws)
    if tiles is not False and (tiles or tile_devices is not None
                               or force_tiles
                               or ws.n_snp * (-(-n // 4)) > 2e9):
        # bounded-traffic super-tile route (the strip engine re-streams
        # the dataset once per strip past the slab-staging budget)
        return _king_screen_tiles(ws, fam, kinship_cutoff, hit_cap,
                                  tile_group, chunk, verbose, mesh=mesh,
                                  devices=tile_devices,
                                  tile_rank=tile_rank)
    ndev, shard_carry, wrap = _mesh_row_tools(mesh)
    sample_block, n_pad, chunk, chunks = _row_tile_setup(
        ws, sample_block, chunk, 128 * ndev, bytes_per_cell=20)
    chunks = wrap(chunks)
    fam_pad = np.full(n_pad, -1, np.int32)
    fam_pad[:n] = fam
    fam_d = jnp.asarray(fam_pad)

    def _strip_counters(carry5, row0, cutoff):
        """Basis strips -> exact integer counters + the hit mask. The
        cutoff tests run on the integer counters in f32 with a one-sided
        relative slack so rounding can only ADMIT borderline pairs; the
        exact f64 filter runs on the gathered integers afterwards.
        Between-family pairs: kin >= c  <=>  sum_sq <= (2-4c) * min(N1,N2)
        (genKING.cpp:637); same-family pairs: kin >= c  <=>
        sum_sq <= (1-2c) * (N1+N2) (genKING.cpp:635)."""
        vv, hh, dd, hv, vh = carry5
        homo = vv + hh - hv - vh
        ibs0_i = (homo - dd) // 2
        ibs2_i = (homo + dd) // 2 + hh
        ibs1_i = vv - ibs0_i - ibs2_i
        sum_sq_i = ibs1_i + 4 * ibs0_i
        mn_i = jnp.minimum(hv, vh)
        gi = row0 + jnp.arange(mn_i.shape[0])[:, None]
        tri = gi > jnp.arange(mn_i.shape[1])[None, :]
        # one-sided slack for EVERY cutoff sign: the relative term scales
        # away from the bound (|thr| keeps it admitting when thr < 0, i.e.
        # cutoff > 0.5), plus +1.0 absolute for tiny |thr|*mn
        ss_f = sum_sq_i.astype(jnp.float32)
        thr = 2.0 - 4.0 * cutoff
        mn_f = mn_i.astype(jnp.float32)
        hit_btw = (mn_i > 0) & \
            (ss_f <= thr * mn_f + 4e-6 * abs(thr) * mn_f + 1.0)
        fam_rows = lax.dynamic_slice_in_dim(fam_d, row0,
                                            mn_i.shape[0], axis=0)
        same = (fam_rows[:, None] == fam_d[None, :]) & \
            (fam_rows[:, None] >= 0)
        tot_i = hv + vh
        thr2 = 1.0 - 2.0 * cutoff
        tot_f = tot_i.astype(jnp.float32)
        hit_win = (tot_i > 0) & \
            (ss_f <= thr2 * tot_f + 4e-6 * abs(thr2) * tot_f + 1.0)
        hit = tri & jnp.where(same, hit_win, hit_btw)
        return (sum_sq_i, hv, vh, ibs0_i, vv), hit

    # sub-divide the strip so each flattened block stays below 2^30
    # elements: jnp.nonzero flat indices are int32 without x64, and a
    # sample_block x n_pad strip can exceed 2^31 entries on wide meshes
    # (pad_to scales with the device count, overriding the HBM row cap)
    n_sub = max(1, -(-sample_block * n_pad // _FLAT_BLOCK_LIMIT))
    rows_sub = -(-sample_block // n_sub)
    n_sub = -(-sample_block // rows_sub)

    @jax.jit
    def strip_hits(carry5, row0, cutoff):
        """Device-compacted candidates per sub-block: (counts (n_sub,),
        ii, jj, gathered integer counters, each (n_sub, hit_cap)) — ~1 MB
        crosses the host boundary per strip. Entries past each sub-block's
        count are fill; the host slices to count (valid only when every
        count <= hit_cap, else the dense fallback runs)."""
        counters, hit = _strip_counters(carry5, row0, cutoff)
        size = max(int(hit_cap), 1)
        cnts, iis, jjs, vals = [], [], [], []
        for b in range(n_sub):
            r = b * rows_sub
            nr_b = min(rows_sub, sample_block - r)
            sub = lax.slice_in_dim(hit, r, r + nr_b, axis=0).ravel()
            cnts.append(sub.sum(dtype=jnp.int32))
            (idx,) = jnp.nonzero(sub, size=size, fill_value=0)
            ii = (idx // n_pad).astype(jnp.int32) + r
            jj = (idx - (idx // n_pad) * n_pad).astype(jnp.int32)
            iis.append(ii)
            jjs.append(jj)
            vals.append(tuple(c[ii, jj] for c in counters))
        return (jnp.stack(cnts), jnp.stack(iis), jnp.stack(jjs),
                tuple(jnp.stack([v[k] for v in vals]) for k in range(5)))

    @jax.jit
    def strip_mask(carry5, row0, cutoff):
        """Dense fallback: full counters + packed hit bitmask."""
        counters, hit = _strip_counters(carry5, row0, cutoff)
        return counters, jnp.packbits(hit, axis=1)

    @jax.jit
    def gather_hits(counters, idx):
        ii, jj = idx
        return tuple(c[ii, jj] for c in counters)

    id1, id2, ibs0_v, kin_v = [], [], [], []
    for r0 in range(0, n, sample_block):
        nr = min(sample_block, n - r0)
        # with mesh: carries column-sharded across every device; the
        # replicated chunk operand lets each device contract its own
        # sample shard locally (sharding propagates through the step)
        carry = shard_carry(tuple(jnp.zeros((sample_block, n_pad), jnp.int32)
                                  for _ in range(5)))
        for packed in chunks():
            carry = _basis_rows_step(carry, packed, r0, sample_block)
        cnts, di, dj, dvals = strip_hits(carry, r0, float(kinship_cutoff))
        cnts = host_read(cnts)
        cnt = int(cnts.sum())
        if cnt == 0:
            continue
        if cnts.max() <= hit_cap:
            di, dj = host_read(di), host_read(dj)
            dvals = [host_read(v).astype(np.float64) for v in dvals]
            keep_sub = [slice(0, int(c)) for c in cnts]
            ii = np.concatenate([di[b][s] for b, s in enumerate(keep_sub)])
            jj = np.concatenate([dj[b][s] for b, s in enumerate(keep_sub)])
            ss, hv_, vh_, ib0, nv = (
                np.concatenate([v[b][s] for b, s in enumerate(keep_sub)])
                for v in dvals)
        else:  # dense fallback (more candidates than the compact bound)
            counters, packed_hit = strip_mask(carry, r0,
                                              float(kinship_cutoff))
            mask = np.unpackbits(host_read(packed_hit), axis=1,
                                 count=n_pad)[:nr, :n].astype(bool)
            ii, jj = np.nonzero(mask)
            # pad hit indices to a power of two so the gather compiles
            # rarely
            m = 1 << (len(ii) - 1).bit_length()
            pi = np.zeros(m, np.int32)
            pj = np.zeros(m, np.int32)
            pi[: len(ii)] = ii
            pj[: len(jj)] = jj
            ss, hv_, vh_, ib0, nv = (
                host_read(c).astype(np.float64)[: len(ii)]
                for c in gather_hits(counters,
                                     (jnp.asarray(pi), jnp.asarray(pj))))
        if verbose:
            print(f"KING screening rows {r0 + nr}/{n}: "
                  f"{len(ii)} candidate pairs")
        # exact f64 from integer counters; same-family pairs use the
        # within-family estimator (genKING.cpp:634-638)
        same = (fam[ii + r0] == fam[jj]) & (fam[jj] >= 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            kin = np.where(same, 0.5 - ss / (2.0 * (hv_ + vh_)),
                           0.5 - ss / (4.0 * np.minimum(hv_, vh_)))
        keep = np.nan_to_num(kin, nan=-np.inf) >= kinship_cutoff
        with np.errstate(divide="ignore", invalid="ignore"):
            ibs0f = np.where(nv > 0, ib0 / nv, np.nan)
        id1.append(sid[jj[keep]])
        id2.append(sid[ii[keep] + r0])
        kin_v.append(kin[keep])
        ibs0_v.append(ibs0f[keep])
    return {"ID1": np.concatenate(id1) if id1 else np.array([], object),
            "ID2": np.concatenate(id2) if id2 else np.array([], object),
            "IBS0": np.concatenate(ibs0_v) if ibs0_v else np.array([]),
            "kinship": np.concatenate(kin_v) if kin_v else np.array([])}


def king_cross(data, query_geno, query_id=None, sample_id=None, snp_id=None,
               autosome_only=True, remove_monosnp=True, maf=math.nan,
               missing_rate=0.01, chunk=None, verbose=False):
    """KING-robust kinship of NEW (query) samples against every cohort
    sample — the serving path: one pass of rectangular (q x n) integer
    matmuls (ops.pairwise.cross_pair_counts), O(q x n) memory.

    query_geno: (q, n_selected_snp) dosages 0/1/2, 3=missing, in the
    cohort's post-filter SNP order (use the snp_id of a prior result, or
    align with snp_list/get_geno). Estimator: the between-family
    KING-robust moment formula (genKING.cpp:634-638) applied per
    rectangular pair; the reference has no cross-cohort form — this
    generalizes its full-matrix estimator to a query set.

    Returns KINGRobustResult with (q, n) kinship/IBS0; sample_id holds the
    COHORT ids, afreq the query ids."""
    from ..ops.pairwise import cross_pair_counts

    ws, _ = init_workspace(data, sample_id, snp_id, autosome_only,
                           remove_monosnp, maf, missing_rate,
                           verbose=verbose)
    c = cross_pair_counts(ws, query_geno, chunk=chunk, verbose=verbose)
    return king_cross_from_counts(c, ws.sample_id, ws.snp_id, query_id)


def king_cross_from_counts(c, cohort_id, snp_id, query_id=None):
    """Between-family KING-robust estimator (genKING.cpp:634-638) applied
    to rectangular (query x cohort) PairCounts — shared by king_cross and
    the serving path (serve.CohortService reuses staged device chunks)."""
    nloci = c.nvalid.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        ibs0 = np.where(nloci > 0, c.ibs0 / nloci, np.nan)
        n1 = c.n1_het.astype(np.float64)
        n2 = c.n2_het.astype(np.float64)
        kinship = 0.5 - c.sum_sq / (4.0 * np.minimum(n1, n2))
    kinship[~np.isfinite(kinship)] = np.nan
    qid = (np.asarray(query_id, dtype=object) if query_id is not None
           else np.arange(kinship.shape[0]))
    return KINGRobustResult(cohort_id, snp_id, qid, ibs0, kinship)
