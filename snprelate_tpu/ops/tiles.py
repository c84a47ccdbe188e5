"""Super-tile out-of-core engine: (sample-group x sample-group) GRM tiles
with HBM-resident packed slabs and bounded host->device traffic.

The row-strip engines (ops/pairwise.py) re-stream the whole dataset once
per strip when the packed selection exceeds the HBM staging budget —
O(data x n_strips) host traffic. This engine bounds it (VERDICT r1 #2):

- the sample axis splits into k groups sized so TWO packed slabs
  (group x all-SNPs, 2-bit) plus one (group x group) tile carry fit HBM;
- pass 1 loads each slab once and reduces per-SNP stats (sum/count) —
  the normalization constants must cover ALL samples, so they are
  computed before any tile (the analog of the reference's
  SummarizeGeno_SampxSNP pass, genPCA.cpp:84-141);
- pass 2 walks the upper tile triangle serpentine-fashion with a
  one-slab cache for the column group, so consecutive rows reuse the
  last column slab. Slab uploads total k (stats) + ~k^2/2 - (k-1)
  (tiles); host->device volume is (1 + (k+1)/2)x the dataset instead of
  the row-strip engine's (n/strip)x. The reference reads each block
  exactly once per pass (CGenoReadBySNP, dGenGWAS.cpp:1283-1397); this
  is the same discipline applied to a device whose memory is the cache.

Slabs come from a pluggable source: ``StoreSlabSource`` (reads the
workspace, H2D bytes counted by a TransferMeter) or any object with the
same ``slab(j)`` contract (e.g. the biobank bench's on-device PRNG
cohort generator, which moves zero host bytes).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .decode import decode2bit
from .pairwise import (MM_PRECISION, _default_float_dtype, guard_count_snps,
                       host_read, norm_precision)


@dataclass
class TransferMeter:
    """Counts host->device bytes moved by a slab source (the scarce
    resource on PCIe/tunnel hosts; host-side disk re-reads are not
    counted — disk bandwidth is orders of magnitude above the link)."""

    h2d_bytes: int = 0
    slab_loads: int = 0

    def add(self, nbytes: int):
        self.h2d_bytes += int(nbytes)
        self.slab_loads += 1


class StoreSlabSource:
    """Packed sample-group slabs from a Workspace selection.

    slab(j) -> (n_chunks, chunk, group//4) uint8 device array holding the
    2-bit genotypes of samples [j*group, (j+1)*group) over every selected
    SNP (padding chunks/samples are all-missing = 0xFF).

    Bandwidth discipline (the disk analog is CGenoReadBySNP reading each
    block once per pass, dGenGWAS.cpp:1283-1397):

    - the host side extracts ONLY the slab's packed byte columns —
      an aligned strided copy for identity sample selections, the native
      ``subset_repack`` codec restricted to the slab's sample indices
      otherwise (never a full-width repack per slab);
    - when every packed slab together fits the device cache budget
      (``SNPRELATE_TPU_SLAB_CACHE``, default 4 GB), uploaded slabs stay
      HBM-resident and every revisit is free — total H2D is exactly 1x
      the packed selection;
    - with an EXPLICIT budget (env var set, or cache_budget= passed)
      that holds only part of the selection, the first slabs to load
      stay pinned up to the budget and the rest stream — partial
      pinning. Under the serpentine tile walk the first-touched slabs
      are the low-index rows, which are exactly the most-revisited
      tiles' slabs; for the rank-distributed PCA a budget covering most
      of the rank's SNP share turns every power pass after the first
      into a ~free revisit. (Opt-in because pinned slabs add to the
      two-active-slab HBM peak the tile engines are sized for.)
    - past the budget, ``prefetch(j)`` (hinted by the tile walk) builds
      and uploads the next slab on a background thread so H2D overlaps
      the current tile's compute.
    """

    def __init__(self, ws, group: int, chunk: int, meter=None,
                 cache_budget=None, chunk_sel=None):
        assert group % 4 == 0
        self.ws = ws
        self.group = group
        self.chunk = chunk
        # chunk_sel: serve only these chunk indices (the SNP partition of
        # the rank-distributed PCA, models/pca_rank.py) — slabs and stats
        # then cover len(chunk_sel) chunks in that order
        self.chunk_sel = (None if chunk_sel is None
                          else np.asarray(chunk_sel, np.int64))
        self.n_chunks = (-(-ws.n_snp // chunk) if chunk_sel is None
                         else len(self.chunk_sel))
        self.n_groups = -(-ws.n_samp // group)
        self.n_samp = ws.n_samp
        self.n_snp = ws.n_snp
        self.meter = meter if meter is not None else TransferMeter()
        explicit = (cache_budget is not None
                    or "SNPRELATE_TPU_SLAB_CACHE" in os.environ)
        if cache_budget is None:
            cache_budget = int(float(os.environ.get(
                "SNPRELATE_TPU_SLAB_CACHE", 4e9)))
        slab_bytes = self.n_chunks * chunk * (group // 4)
        self._cache_all = slab_bytes * self.n_groups <= cache_budget
        # partial pinning only on an explicit budget (see class docstring)
        self._cache_limit = (self.n_groups if self._cache_all
                             else int(cache_budget // max(slab_bytes, 1))
                             if explicit else 0)
        self._cache = {}
        self._pending = (None, None)  # (j, Future) from prefetch()
        self._pool = None
        # identity fast path: full sample selection in file order means a
        # slab is a plain byte-column slice of the packed store
        self._identity = (ws.n_samp == ws.data.n_samp
                          and np.array_equal(ws.samp_idx,
                                             np.arange(ws.data.n_samp)))
        self._snp_identity = len(ws.snp_idx) == ws.data.n_snp

    def _host_slab(self, j: int) -> np.ndarray:
        """Extract slab j's packed bytes on the host (slab-local work
        only: O(slab), not O(dataset))."""
        from ..native import subset_repack

        ws = self.ws
        g4 = self.group // 4
        out = np.full((self.n_chunks, self.chunk, g4), 0xFF, np.uint8)
        src = ws.data.genotype_packed
        s0 = j * self.group
        idx = ws.samp_idx[s0: s0 + self.group]
        c0 = s0 // 4  # byte-aligned because group % 4 == 0
        c1 = min(c0 + g4, src.shape[1])
        for i, ci in enumerate(self._chunks()):
            r0 = ci * self.chunk
            r1 = min(r0 + self.chunk, ws.n_snp)
            rows = (src[r0:r1] if self._snp_identity
                    else src[ws.snp_idx[r0:r1]])
            if self._identity:
                out[i, : r1 - r0, : c1 - c0] = rows[:, c0:c1]
            else:
                out[i, : r1 - r0] = subset_repack(rows, idx, g4)
        return out

    def _chunks(self):
        return (range(self.n_chunks) if self.chunk_sel is None
                else self.chunk_sel)

    def with_chunk_sel(self, sel):
        """A sibling source serving only the given chunk indices (the
        rank-distributed PCA partition; host extraction reads only those
        chunks' packed rows)."""
        if self.chunk_sel is not None:
            sel = self.chunk_sel[np.asarray(sel)]
        return StoreSlabSource(self.ws, self.group, self.chunk,
                               meter=self.meter, chunk_sel=sel)

    def _load(self, j: int):
        out = self._host_slab(j)
        self.meter.add(out.nbytes)
        return jax.device_put(out)

    def prefetch(self, j: int):
        """Hint: slab j is needed next. Builds + uploads it on a
        background thread (one slot; no-op when cached or pending).

        Honored when the whole-dataset cache is active (budget already
        checked) or when SNPRELATE_TPU_SLAB_PREFETCH=1 — a prefetched
        slab makes a THIRD slab transiently resident, so the streaming
        path only overlaps H2D with compute when the caller opted in
        (pair it with a group size leaving 3-slab headroom)."""
        if not self._cache_all and os.environ.get(
                "SNPRELATE_TPU_SLAB_PREFETCH") != "1":
            return
        if j is None or not (0 <= j < self.n_groups) or j in self._cache \
                or self._pending[0] == j:
            return
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=1)
        self._pending = (j, self._pool.submit(self._load, j))

    def slab(self, j: int):
        if j in self._cache:
            return self._cache[j]
        pj, fut = self._pending
        if pj == j:
            self._pending = (None, None)
            arr = fut.result()
        else:
            arr = self._load(j)
        if len(self._cache) < self._cache_limit:
            self._cache[j] = arr
        return arr

    def stats_host(self):
        """Per-SNP (gsum, gnum) in ONE sweep of the packed selection via
        the native codec (no dense decode, zero device traffic) —
        Get_AF_MR_perSNP re-expressed on packed bytes
        (dGenGWAS.cpp:472-552)."""
        from ..native import snp_stats_packed

        ws = self.ws
        gsum = np.zeros((self.n_chunks, self.chunk), np.int64)
        gnum = np.zeros((self.n_chunks, self.chunk), np.int64)
        src = ws.data.genotype_packed
        for i, ci in enumerate(self._chunks()):
            r0 = ci * self.chunk
            r1 = min(r0 + self.chunk, ws.n_snp)
            rows = (src[r0:r1] if self._snp_identity
                    else src[ws.snp_idx[r0:r1]])
            s, c = snp_stats_packed(rows, ws.samp_idx)
            gsum[i, : r1 - r0] = s
            gnum[i, : r1 - r0] = c
        return gsum, gnum


@jax.jit
def _slab_stats(slab):
    """Per-SNP genotype sum / valid count over one slab:
    (n_chunks, chunk) int32 each."""
    def step(_, pk):
        geno = decode2bit(pk)
        valid = geno < 3
        gsum = jnp.where(valid, geno, 0).astype(jnp.int32).sum(1)
        gnum = valid.sum(1, dtype=jnp.int32)
        return None, (gsum, gnum)

    _, (gsum, gnum) = lax.scan(step, None, slab)
    return gsum, gnum


@functools.partial(jax.jit, donate_argnums=0, static_argnums=(8,))
def _gcta_tile_scan_c(carry, slab_i, slab_j, avg, scale, poly, r0_i,
                      r0_j, gcta: bool):
    """One (group x group) tile over every SNP chunk: normalized
    covariance (+ polymorphic-validity gram for GCTA). avg/scale/poly are
    (n_chunks, chunk) per-SNP normalization constants computed over ALL
    samples (pass 1). The carry is created by the caller so a mesh run
    can column-shard it (the slab_j columns carry the sharding through
    the matmuls with zero collectives). r0_* unused except to keep the
    signature future-proof for masked diagonals."""
    fdt = avg.dtype

    def step(carry, xs):
        pk_i, pk_j, av, sc, po = xs

        def norm(pk):
            geno = decode2bit(pk)
            valid = geno < 3
            x = (jnp.where(valid, geno.astype(fdt), av[:, None])
                 - av[:, None]) * sc[:, None]
            return x, valid

        xi, vi = norm(pk_i)
        xj, vj = norm(pk_j)
        if gcta:
            cov, vgr = carry
            vpi = (vi & po[:, None]).astype(jnp.int8)
            vpj = (vj & po[:, None]).astype(jnp.int8)
            cov = cov + jnp.matmul(xi.T, xj, preferred_element_type=fdt,
                                   precision=norm_precision())
            vgr = vgr + jnp.matmul(vpi.T, vpj,
                                   preferred_element_type=jnp.int32)
            return (cov, vgr), None
        cov = carry
        cov = cov + jnp.matmul(xi.T, xj, preferred_element_type=fdt,
                               precision=norm_precision())
        return cov, None

    carry, _ = lax.scan(step, carry, (slab_i, slab_j, avg, scale, poly))
    if gcta:
        # per-pair missing denominator applied ON DEVICE
        # (genPCA.cpp:1202-1236) — only the final GRM tile crosses the
        # host boundary (half the D2H of shipping cov + vgr)
        cov, vgr = carry
        return cov / (2.0 * vgr.astype(fdt))
    return carry


def _mesh_tile_shardings(mesh):
    """(slab columns, tile columns, replicated) NamedShardings for the
    column-sharded tile scan: slab_j's sample-byte axis and the tile's
    column axis split over EVERY mesh device; slab_i and the per-SNP
    stats replicate. Each device then contracts its own column shard
    locally — the tile analog of the row-strip column sharding — and
    group sizes scale with per-device HBM times the device count."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    ax = tuple(mesh.axis_names)
    return (NamedSharding(mesh, P(None, None, ax)),
            NamedSharding(mesh, P(None, ax)),
            NamedSharding(mesh, P()))


def _gcta_tile_scan(slab_i, slab_j, avg, scale, poly, r0_i, r0_j,
                    gcta: bool, mesh=None, carry_device=None):
    """Carry construction (mesh-placed when given; the caller is
    responsible for slab placement — see gcta_grm_tiles) around the
    jitted scan. carry_device: create the carry directly on that
    sharding (devices= scheduling — a default-device zeros would ship
    group^2 buffers chip-to-chip per tile)."""
    g = slab_i.shape[2] * 4
    fdt = avg.dtype
    if gcta:
        carry = (jnp.zeros((g, g), fdt, device=carry_device),
                 jnp.zeros((g, g), jnp.int32, device=carry_device))
    else:
        carry = jnp.zeros((g, g), fdt, device=carry_device)
    if mesh is not None:
        _c3, col2, rep = _mesh_tile_shardings(mesh)
        avg, scale, poly = (jax.device_put(a, rep)
                            for a in (avg, scale, poly))
        carry = jax.tree.map(lambda a: jax.device_put(a, col2), carry)
    import warnings

    with warnings.catch_warnings():
        # GCTA: the donated int32 vgr carry has no matching output (the
        # per-pair denominator is applied on device and only the f32 GRM
        # tile returns) — the donation miss is expected, not a leak
        warnings.filterwarnings(
            "ignore", message="Some donated buffers were not usable")
        return _gcta_tile_scan_c(carry, slab_i, slab_j, avg, scale, poly,
                                 r0_i, r0_j, gcta)


class TileGridCheckpointer:
    """Per-(I,J)-tile checkpoints for the super-tile engine: one .npz per
    completed tile plus a meta sidecar; resume skips tiles whose file
    exists (any order — the grid has no prefix structure).

    Concurrent tile_rank processes may share the directory (tile files
    are disjoint per rank; same-config meta writes are byte-identical
    atomic replaces). The one unsafe pattern is launching ranks
    SIMULTANEOUSLY against a directory holding a STALE (different-meta)
    grid: each rank wipes the stale tiles, and one rank's wipe glob can
    race another's fresh saves — point ranks at a fresh directory, or
    let the first rank start before the rest."""

    def __init__(self, path, meta: tuple = ()):
        import os as _o

        self.path = path
        self.meta = np.asarray(meta, np.int64)
        self._os = _o
        if path:
            mfn = path + ".meta.npy"
            if _o.path.exists(mfn) and not np.array_equal(
                    np.load(mfn), self.meta):
                import glob

                # escape the prefix: a path with glob metacharacters
                # ('[1]', '?') would otherwise skip the wipe and let
                # load() serve stale tiles under the new meta
                for fn in glob.glob(glob.escape(path) + ".tile*.npz"):
                    _o.remove(fn)
                _o.remove(mfn)
            if not _o.path.exists(mfn):
                # pid-suffixed tmp: concurrent rank processes racing to
                # create the (byte-identical) meta must not share one tmp
                # path — os.replace by the winner leaves the loser's
                # replace raising FileNotFoundError
                tmp = mfn + f".tmp{_o.getpid()}"
                with open(tmp, "wb") as f:
                    np.save(f, self.meta)
                _o.replace(tmp, mfn)

    def _fn(self, i: int, j: int) -> str:
        return f"{self.path}.tile{i:05d}_{j:05d}.npz"

    def load(self, i: int, j: int):
        if not self.path or not self._os.path.exists(self._fn(i, j)):
            return None
        from ..utils.fastnpz import fast_npz_load

        return fast_npz_load(self._fn(i, j))

    def save(self, i: int, j: int, **arrays):
        if not self.path:
            return
        fn = self._fn(i, j)
        tmp = fn + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        self._os.replace(tmp, fn)


def _stats_pass(source, fdt):
    """Pass 1: per-SNP sum/count over all sample groups -> normalization
    constants (avg, scale, poly) as (n_chunks, chunk) device arrays plus
    the polymorphic-locus count. Sources exposing ``stats_host`` (the
    host already holds the bytes) skip the device round entirely."""
    if hasattr(source, "stats_host"):
        gsum, gnum = source.stats_host()
    else:
        gsum = np.zeros((source.n_chunks, source.chunk), np.int64)
        gnum = np.zeros((source.n_chunks, source.chunk), np.int64)
        for j in range(source.n_groups):
            s, n = _slab_stats(source.slab(j))
            gsum += host_read(s).astype(np.int64)
            gnum += host_read(n).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        avg = np.where(gnum > 0, gsum / gnum, 0.0)
        p = avg * 0.5
        scale = np.where((p > 0) & (p < 1), 1.0 / np.sqrt(p * (1 - p)),
                         0.0)
    poly = (gsum > 0) & (gsum < 2 * gnum)
    # SNPs beyond the selection (padding rows of the final chunk) decode
    # as all-missing -> gnum == 0 -> scale 0, poly False: contribute 0.
    npdt = np.float64 if fdt == jnp.float64 else np.float32
    return (jnp.asarray(avg, npdt), jnp.asarray(scale, npdt),
            jnp.asarray(poly), int(poly.sum()))


def _tile_walk(source, n_samp: int, saved_fn=None, rows=None):
    """Upper-tile-triangle walk with the serpentine one-slab column cache
    and the two-slab memory discipline (peak HBM = exactly TWO slabs +
    workspace: every stale reference is dropped BEFORE a new slab loads —
    a transient third slab OOMs a 16 GB chip at the auto group size).

    Yields (i, j, r0, c0, nr, nc, payload) where payload is
    ``saved_fn(i, j)``'s non-None result (checkpoint hit, slabs NOT
    loaded) or the (slab_i, slab_j) device pair to compute from.

    ``rows``: tile-row subset this walk covers (default: all) — the
    per-device sub-walks of the tile-grid device scheduler each own a
    strided row set and keep the two-slab discipline independently."""
    group = source.group
    k = source.n_groups
    hint = getattr(source, "prefetch", lambda j: None)
    cache = {}  # at most one entry: column-slab cache {index: slab}
    for ri, i in enumerate(range(k) if rows is None else rows):
        slab_i = None  # loaded lazily: a fully-checkpointed row skips it
        # serpentine: odd rows walk J downward so the previous row's last
        # column slab is reused
        cols = (list(range(i, k)) if ri % 2 == 0
                else list(range(k - 1, i - 1, -1)))
        for ci, j in enumerate(cols):
            r0, c0 = i * group, j * group
            nr = min(group, n_samp - r0)
            nc = min(group, n_samp - c0)
            saved = saved_fn(i, j) if saved_fn else None
            if saved is not None:
                yield i, j, r0, c0, nr, nc, saved
                continue
            if slab_i is None:
                slab_i = cache.pop(i) if i in cache else source.slab(i)
            if j == i:
                slab_j = slab_i
            elif j in cache:
                slab_j = cache[j]
            else:
                cache.clear()  # drop the old column slab BEFORE loading
                slab_j = source.slab(j)
                cache[j] = slab_j
            # hint the next column load so a streaming source overlaps
            # its host extraction + H2D with this tile's compute
            if ci + 1 < len(cols) and cols[ci + 1] != i:
                hint(cols[ci + 1])
            yield i, j, r0, c0, nr, nc, (slab_i, slab_j)
            slab_j = None
        slab_i = None


def probe_grid_meta(checkpoint, tag: int, n_snp: int, n_samp: int):
    """Return (group, chunk) from an existing tile-GRID checkpoint meta
    matching (tag, n_snp, n_samp), else None. Plain (tile_rank=None)
    assembly/resume runs use this to adopt the RANK runs' grid instead
    of deriving a fresh auto grid whose meta mismatch would wipe the
    completed tiles."""
    if not checkpoint:
        return None
    mfn = str(checkpoint) + ".meta.npy"
    if not os.path.exists(mfn):
        return None
    try:
        m = np.load(mfn)
    except (OSError, ValueError):
        return None
    if m.size >= 5 and int(m[0]) == tag and int(m[1]) == int(n_snp) \
            and int(m[2]) == int(n_samp):
        return int(m[3]), int(m[4])
    return None


def _resolve_grid(ws, n_samp, group, chunk, checkpoint, tag,
                  devices, tile_rank, cell_sched: int, cell_plain: int):
    """Resolve the (group, chunk) tile grid for one engine family. An
    existing checkpoint meta for (tag, n_snp, n_samp) wins over the auto
    derivation — so an assembly/resume run (tile_rank=None, possibly
    with different devices= flags) adopts the grid the rank runs used
    instead of deriving a different one whose meta mismatch would WIPE
    every completed tile. Explicit group=/chunk= still override.
    cell_sched/cell_plain: bytes-per-cell budgets with and without
    whole-tile scheduling (devices=/tile_rank= keep one settled tile
    pending per device, doubling the carry footprint)."""
    from .pairwise import auto_chunk

    got = probe_grid_meta(checkpoint, tag, ws.n_snp, n_samp) \
        if (group is None or chunk is None) else None
    if group is None:
        if got is not None:
            group = got[0]
        else:
            group = auto_tile_group(
                ws.n_snp, n_samp=n_samp,
                bytes_per_cell=cell_sched if (devices is not None
                                              or tile_rank is not None)
                else cell_plain)
    group = -(-group // 128) * 128
    if chunk is None:
        chunk = got[1] if (got is not None and got[0] == group) \
            else auto_chunk(group, ws.n_snp)
    return group, chunk


def parse_tile_rank(spec):
    """'RANK/WORLD' (CLI) or (rank, world) -> validated tuple, or None
    for world == 1 (a full run: no partition)."""
    if spec is None:
        return None
    if isinstance(spec, str):
        parts = spec.split("/")
        if len(parts) != 2:
            raise ValueError(f"tile_rank should be RANK/WORLD, got {spec!r}")
        rank, world = (int(x) for x in parts)
    else:
        rank, world = spec
    if world < 1 or not (0 <= rank < world):
        raise ValueError(f"tile_rank rank {rank} outside world {world}")
    return None if world == 1 else (rank, world)


def rank_rows(k: int, rank: int, world: int):
    """Deterministic weight-balanced tile-ROW partition for multi-host
    runs (`tile_rank=(rank, world)`): row i of the upper tile triangle
    owns k - i tiles, so a plain stride over rows is ~25% unbalanced at
    world=2. Greedy longest-processing-time assignment (rows are already
    in descending weight order) balances to within one row's weight.
    Every row appears in exactly one rank's list; the per-rank engines
    stay zero-collective (ranks share only the checkpoint directory)."""
    if not (0 <= rank < world):
        raise ValueError(f"tile_rank {rank} outside world {world}")
    loads = [0] * world
    mine = []
    for i in range(k):
        r = loads.index(min(loads))
        loads[r] += k - i
        if r == rank:
            mine.append(i)
    return mine


def _row_replicator(mesh):
    """Row-slab replication memo for mesh tile runs: one all-gather per
    tile row (device-to-device, no host). Keyed by the ROW INDEX — an
    `id(slab)` key would break when CPython reuses a freed slab's id
    across rows and hand back a stale replicated slab."""
    if mesh is None:
        return lambda i, slab: slab
    rep = _mesh_tile_shardings(mesh)[2]
    memo = [None, None]  # (row index, replicated slab)

    def row_slab(i, slab):
        if memo[0] != i:
            memo[0] = i
            memo[1] = jax.device_put(slab, rep)
        return memo[1]

    return row_slab


class _PlacedSource:
    """Slab-source adapter that commits every slab to a sharding at load
    time (mesh runs: slabs are column-sharded once, not re-placed per
    tile visit)."""

    def __init__(self, source, sharding):
        self._source = source
        self._sharding = sharding
        for a in ("group", "chunk", "n_chunks", "n_groups", "n_samp",
                  "n_snp", "meter"):
            if hasattr(source, a):
                setattr(self, a, getattr(source, a))

    def slab(self, j: int):
        return jax.device_put(self._source.slab(j), self._sharding)

    def stats_host(self):
        return self._source.stats_host()

    def __getattr__(self, name):
        return getattr(self._source, name)


def _interleave_walks(walks):
    """Round-robin drain of per-device tile walks: yields (walk_idx,
    item). Keeps every device fed — while device d's tile computes, the
    host is already loading + dispatching the other devices' tiles."""
    live = list(enumerate(walks))
    while live:
        nxt = []
        for d, w in live:
            item = next(w, None)
            if item is not None:
                yield d, item
                nxt.append((d, w))
        live = nxt


def _device_walks(source, n_samp: int, devices, saved_fn, stats=(),
                  rows=None):
    """Per-device placed sources + strided-row sub-walks for the
    tile-grid device scheduler (whole tiles on whole chips, zero
    collectives — the multi-host partition of the super-tile engine;
    `mesh=` instead splits every tile's columns ACROSS chips). Returns
    (walks, per-device stats tuples)."""
    from jax.sharding import SingleDeviceSharding

    k = source.n_groups
    base = list(rows) if rows is not None else list(range(k))
    nd = max(1, min(len(devices), len(base) or 1))
    shards = [SingleDeviceSharding(d) for d in devices[:nd]]
    walks = [_tile_walk(_PlacedSource(source, s), n_samp,
                        saved_fn=saved_fn, rows=base[di::nd])
             for di, s in enumerate(shards)]
    placed = [tuple(jax.device_put(a, s) for a in stats) for s in shards]
    return walks, placed, shards


def gcta_grm_tiles(source, n_samp: int, method: str = "GCTA",
                   checkpoint=None, verbose: bool = False,
                   out_dtype=np.float64, mesh=None, devices=None,
                   rows=None):
    """Super-tile GRM: yields (r0, c0, nr, nc, grm_tile) over the upper
    tile triangle (r0 <= c0). method 'GCTA' applies the per-pair
    missing denominator (genPCA.cpp:1202-1236); 'Eigenstrat' yields the
    raw covariance tiles (caller applies the (n-1)/trace scale, which
    needs the full diagonal). Tiles are final (independent of each
    other), so the grid checkpointer resumes at any completed subset.
    mesh= column-shards each tile scan over every mesh device (slabs
    load column-sharded; the row slab replicates once per tile row).
    devices= instead schedules WHOLE tiles round-robin over the given
    jax devices (strided tile rows per device, zero collectives — the
    multi-host/chip partition; mutually exclusive with mesh)."""
    gcta = method == "GCTA"
    if gcta:  # the int32 validity gram accumulates one un-flushable scan
        guard_count_snps(source.n_snp, "super-tile GRM")
    fdt = _default_float_dtype()
    if mesh is not None and devices is not None:
        raise ValueError("pass mesh= (intra-tile column sharding) or "
                         "devices= (whole-tile scheduling), not both")
    if mesh is not None:
        col3, _col2, _rep = _mesh_tile_shardings(mesh)
        source = _PlacedSource(source, col3)
    avg, scale, poly, _nloc = _stats_pass(source, fdt)
    tck = TileGridCheckpointer(
        checkpoint, meta=(71 if gcta else 72, source.n_snp, n_samp,
                          source.group, source.chunk))
    row_slab = _row_replicator(mesh)

    def flush(pending):
        pi, pj, pr0, pc0, pnr, pnc, dev = pending
        tile = host_read(dev)[:pnr, :pnc].astype(out_dtype)
        tck.save(pi, pj, grm=tile)
        if verbose:
            print(f"GRM tile ({pi},{pj}) rows {pr0}..{pr0 + pnr} x "
                  f"cols {pc0}..{pc0 + pnc}")
        return pr0, pc0, pnr, pnc, tile

    if devices is not None:
        # tile-grid device scheduling: each device owns strided tile rows
        # and keeps its own two-slab + one-pending-tile discipline; the
        # round-robin interleave overlaps every device's compute with the
        # host-side loads/flushes of the others
        walks, stats, shards = _device_walks(
            source, n_samp, devices, tck.load, stats=(avg, scale, poly),
            rows=rows)
        pend = {}
        for di, (i, j, r0, c0, nr, nc, payload) in _interleave_walks(
                walks):
            if isinstance(payload, dict):
                if di in pend:
                    yield flush(pend.pop(di))
                yield r0, c0, nr, nc, payload["grm"]
                continue
            slab_i, slab_j = payload
            av, sc, po = stats[di]
            out = _gcta_tile_scan(slab_i, slab_j, av, sc, po, r0, c0,
                                  gcta, carry_device=shards[di])
            slab_i = slab_j = payload = None
            if di in pend:  # previous tile D2H overlaps this dispatch
                yield flush(pend.pop(di))
            pend[di] = (i, j, r0, c0, nr, nc, out)
            out = None
        for di in sorted(pend):
            yield flush(pend.pop(di))
        return

    # double-buffered D2H: the previous tile materializes while the next
    # tile's scan (and slab generation) is already queued on the device —
    # transfer and compute overlap (one extra device tile resident)
    pending = None
    for i, j, r0, c0, nr, nc, payload in _tile_walk(
            source, n_samp, saved_fn=tck.load, rows=rows):
        if isinstance(payload, dict):
            if pending is not None:
                yield flush(pending)
                pending = None
            yield r0, c0, nr, nc, payload["grm"]
            continue
        slab_i, slab_j = payload
        out = _gcta_tile_scan(row_slab(i, slab_i), slab_j, avg, scale,
                              poly, r0, c0, gcta, mesh=mesh)
        slab_i = slab_j = payload = None
        if pending is not None:
            yield flush(pending)
        pending = (i, j, r0, c0, nr, nc, out)
        out = None
    if pending is not None:
        yield flush(pending)


@functools.partial(jax.jit, donate_argnums=0)
def _basis_tile_scan_c(carry, slab_i, slab_j):
    """Integer reduced-basis grams for one (group x group) tile over every
    SNP chunk: (vv, hh, dd, hv, vh) int32. The transpose identity
    vh = hv^T only holds on the diagonal tile, so both het cross-grams
    are computed (same rule as the row-strip engine,
    ops/pairwise.py::_basis_strip_update). The carry is built by the
    caller so a mesh run can column-shard it."""
    from .decode import genotype_basis
    from .pairwise import _plane_mm_dtype

    mm_dt = _plane_mm_dtype()

    def step(carry, xs):
        pk_i, pk_j = xs
        bi = genotype_basis(decode2bit(pk_i)).astype(mm_dt)  # (3,S,G)
        bj = genotype_basis(decode2bit(pk_j)).astype(mm_dt)

        def mm(x, y):
            return lax.dot_general(x, y, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

        vv, hh, dd, hv, vh = carry
        return (vv + mm(bi[0], bj[0]), hh + mm(bi[1], bj[1]),
                dd + mm(bi[2], bj[2]), hv + mm(bi[1], bj[0]),
                vh + mm(bi[0], bj[1])), None

    return lax.scan(step, carry, (slab_i, slab_j))[0]


def _tile_carry(shapes_dtypes, mesh):
    """Tile-scan carry constructor: (g, g) matrices column-sharded over
    the mesh (vectors replicated) so the scan's matmul outputs inherit
    the slab_j column sharding with zero collectives."""
    arrs = tuple(jnp.zeros(s, d) for s, d in shapes_dtypes)
    if mesh is None:
        return arrs
    _c3, col2, rep = _mesh_tile_shardings(mesh)
    return tuple(jax.device_put(a, col2 if a.ndim == 2 else rep)
                 for a in arrs)


def basis_count_tiles(source, n_samp: int, checkpoint=None,
                      verbose: bool = False, mesh=None, devices=None,
                      rows=None):
    """Super-tile integer pairwise counts: yields (r0, c0, nr, nc,
    B (5, nr, nc) int64 PairCounts base blocks) over the upper tile
    triangle — the bounded-traffic analog of basis_gram_rows for count
    estimators (IBS/KING/MoM/Beta) past the slab-staging budget.
    mesh= column-shards each tile scan over every mesh device (bit-exact:
    integer accumulation is order-free). devices= schedules whole tiles
    round-robin over the given jax devices instead (strided tile rows
    per device; bit-exact either way)."""
    group = source.group
    k = source.n_groups
    guard_count_snps(source.n_snp, "super-tile counts")
    if mesh is not None and devices is not None:
        raise ValueError("pass mesh= (intra-tile column sharding) or "
                         "devices= (whole-tile scheduling), not both")
    if mesh is not None:
        source = _PlacedSource(source, _mesh_tile_shardings(mesh)[0])
    row_slab = _row_replicator(mesh)
    tck = TileGridCheckpointer(
        checkpoint, meta=(75, source.n_snp, n_samp, group, source.chunk))

    def finalize(i, j, nr, nc, out):
        b = np.stack([host_read(a)[:nr, :nc] for a in out]) \
            .astype(np.int64)
        tck.save(i, j, b=b)
        if verbose:
            print(f"count tile ({i},{j})")
        return b

    def drain(p):
        pi, pj, pr0, pc0, pnr, pnc, out = p
        return pr0, pc0, pnr, pnc, finalize(pi, pj, pnr, pnc, out)

    if devices is not None:
        walks, _, shards = _device_walks(source, n_samp, devices,
                                         tck.load, rows=rows)
        pend = {}
        for di, (i, j, r0, c0, nr, nc, payload) in _interleave_walks(
                walks):
            if isinstance(payload, dict):
                if di in pend:
                    yield drain(pend.pop(di))
                yield r0, c0, nr, nc, payload["b"]
                continue
            slab_i, slab_j = payload
            g = slab_i.shape[2] * 4
            carry = tuple(jnp.zeros((g, g), jnp.int32, device=shards[di])
                          for _ in range(5))
            out = _basis_tile_scan_c(carry, slab_i, slab_j)
            slab_i = slab_j = payload = None
            if di in pend:  # previous tile D2H overlaps this dispatch
                yield drain(pend.pop(di))
            pend[di] = (i, j, r0, c0, nr, nc, out)
            out = None
        for di in sorted(pend):
            yield drain(pend.pop(di))
        return

    for i, j, r0, c0, nr, nc, payload in _tile_walk(
            source, n_samp, saved_fn=tck.load, rows=rows):
        if isinstance(payload, dict):
            yield r0, c0, nr, nc, payload["b"]
            continue
        slab_i, slab_j = payload
        g = slab_i.shape[2] * 4
        carry = _tile_carry([((g, g), jnp.int32)] * 5, mesh)
        out = _basis_tile_scan_c(carry, row_slab(i, slab_i), slab_j)
        slab_i = slab_j = payload = None
        b = np.stack([host_read(a)[:nr, :nc] for a in out]) \
            .astype(np.int64)
        out = None
        tck.save(i, j, b=b)
        if verbose:
            print(f"count tile ({i},{j})")
        yield r0, c0, nr, nc, b


def pair_counts_tiled(ws, group=None, chunk=None, checkpoint=None,
                      verbose: bool = False, meter=None, source=None,
                      mesh=None, devices=None, tile_rank=None):
    """Assembled PairCounts from the super-tile engine (integer
    bit-exact; both triangles mirrored with the per-block transpose
    rules: vv/hh/dd symmetric, hv(j,i) = vh(i,j)^T). group=None derives
    the grid (or adopts an existing checkpoint's — see _resolve_grid).
    tile_rank=(rank, world): compute only this rank's tile rows into
    checkpoint= and return None (see grm_tiled)."""
    from .pairwise import PairCounts

    n = ws.n_samp if ws is not None else source.n_samp
    if source is None:
        group, chunk = _resolve_grid(ws, n, group, chunk, checkpoint,
                                     75, devices, tile_rank, 40, 20)
        source = StoreSlabSource(ws, group, chunk, meter=meter)
    rows, partial = _rank_rows_arg(source, tile_rank, checkpoint)
    B = None if partial else np.empty((5, n, n), np.int64)
    for r0, c0, nr, nc, b in basis_count_tiles(
            source, n, checkpoint=checkpoint, verbose=verbose, mesh=mesh,
            devices=devices, rows=rows):
        if partial:
            continue
        B[:, r0:r0 + nr, c0:c0 + nc] = b
        if r0 != c0:
            # mirror: vv/hh/dd symmetric; hv lower = vh upper transposed
            for sym in (0, 1, 2):
                B[sym, c0:c0 + nc, r0:r0 + nr] = b[sym].T
            B[3, c0:c0 + nc, r0:r0 + nr] = b[4].T
            B[4, c0:c0 + nc, r0:r0 + nr] = b[3].T
    return None if partial else PairCounts(*B)


@functools.partial(jax.jit, donate_argnums=0, static_argnums=(5,))
def _eigmix_tile_scan_c(carry, slab_i, slab_j, avg, d_w, diag: bool):
    """EIGMIX parts for one tile (genEIGMIX.cpp:43-157): centered
    (unscaled) covariance + d-weighted validity gram, with the per-sample
    het counts reduced on DIAGONAL tiles (every group has one, so the
    full het vector assembles with no extra slab loads). avg/d_w are
    (n_chunks, chunk) pass-1 stats over ALL samples (d = 4p(1-p)). The
    carry is built by the caller so a mesh run can column-shard it."""
    fdt = avg.dtype

    def step(carry, xs):
        pk_i, pk_j, av, dw = xs
        cov, wvg, het = carry

        def cent(pk):
            geno = decode2bit(pk)
            valid = geno < 3
            x = jnp.where(valid, geno.astype(fdt), av[:, None]) \
                - av[:, None]
            return x, valid, geno

        xi, vi, gi = cent(pk_i)
        xj, vj, _ = cent(pk_j)
        cov = cov + jnp.matmul(xi.T, xj, preferred_element_type=fdt,
                               precision=MM_PRECISION)
        wvi = vi.astype(fdt) * dw[:, None]
        wvg = wvg + jnp.matmul(wvi.T, vj.astype(fdt),
                               preferred_element_type=fdt,
                               precision=MM_PRECISION)
        if diag:
            het = het + (gi == 1).sum(axis=0, dtype=jnp.int32)
        return (cov, wvg, het), None

    return lax.scan(step, carry, (slab_i, slab_j, avg, d_w))[0]


def _keyed_tile_stream(source, n_samp, saved_fn, mesh, devices,
                       stats=(), rows=None):
    """Unified tile iteration for the three scheduling modes: yields
    (key, walk item). Returns (stream, per-key placed stats, per-key
    carry shardings) — single-device/mesh use key 0 (carry sharding
    None: mesh carries are built by _tile_carry instead). rows= limits
    the walk to a tile-row subset (the tile_rank multi-host partition)."""
    if devices is not None:
        walks, placed, shards = _device_walks(source, n_samp, devices,
                                              saved_fn, stats=stats,
                                              rows=rows)
        return _interleave_walks(walks), placed, shards
    walk = _tile_walk(source, n_samp, saved_fn=saved_fn, rows=rows)
    return ((0, item) for item in walk), [tuple(stats)], [None]


def eigmix_parts_tiled(ws, group=None, chunk=None, verbose=False,
                       meter=None, source=None, checkpoint=None,
                       mesh=None, devices=None, tile_rank=None):
    """Assembled EIGMIX parts (num, wvg, het) from super tiles — the
    bounded-traffic analog of ops.pairwise.eigmix_rows. checkpoint= saves
    one .npz per completed tile (resume skips them); mesh= column-shards
    each tile scan over every mesh device; devices= schedules whole
    tiles round-robin over the given jax devices. Tiles drain through a
    one-pending-per-device buffer so D2H overlaps the next dispatch."""
    n = ws.n_samp if ws is not None else source.n_samp
    if source is None:
        # devices= keeps one settled tile pending per device (doubled
        # budget); tile_rank always takes the conservative budget so
        # every rank derives the same grid; an existing checkpoint meta
        # wins over both (see _resolve_grid)
        group, chunk = _resolve_grid(ws, n, group, chunk, checkpoint,
                                     76, devices, tile_rank, 16, 8)
        source = StoreSlabSource(ws, group, chunk, meter=meter)
    group = source.group
    guard_count_snps(source.n_snp, "super-tile EIGMIX")
    if mesh is not None and devices is not None:
        raise ValueError("pass mesh= (intra-tile column sharding) or "
                         "devices= (whole-tile scheduling), not both")
    # validate tile_rank BEFORE the expensive stats pass: a missing
    # checkpoint= should fail instantly, not after a full dataset read
    rows, partial = _rank_rows_arg(source, tile_rank, checkpoint)
    if mesh is not None:
        source = _PlacedSource(source, _mesh_tile_shardings(mesh)[0])
    row_slab = _row_replicator(mesh)
    fdt = _default_float_dtype()
    avg, _scale, _poly, _nl = _stats_pass(source, fdt)
    af = 0.5 * np.asarray(avg, np.float64)
    d_w = jnp.asarray(4.0 * af * (1.0 - af),
                      np.float64 if fdt == jnp.float64 else np.float32)
    if mesh is not None:
        rep = _mesh_tile_shardings(mesh)[2]
        avg, d_w = (jax.device_put(a, rep) for a in (avg, d_w))
    tck = TileGridCheckpointer(
        checkpoint, meta=(76, source.n_snp, n, group, source.chunk))
    num = np.empty((n, n)) if not partial else None
    wvg = np.empty((n, n)) if not partial else None
    het = np.empty(n, np.int64) if not partial else None

    def write(i, j, r0, c0, nr, nc, num_c, wvg_c, het_c):
        if partial:
            return
        num[r0:r0 + nr, c0:c0 + nc] = num_c
        wvg[r0:r0 + nr, c0:c0 + nc] = wvg_c
        if i == j:
            het[r0:r0 + nr] = het_c
        else:
            num[c0:c0 + nc, r0:r0 + nr] = num_c.T
            wvg[c0:c0 + nc, r0:r0 + nr] = wvg_c.T
        if verbose:
            print(f"EIGMIX tile ({i},{j})")

    def settle(p):
        i, j, r0, c0, nr, nc, (cov_t, wvg_t, het_t) = p
        num_c = host_read(cov_t)[:nr, :nc]
        wvg_c = host_read(wvg_t)[:nr, :nc]
        if i == j:
            het_c = host_read(het_t)[:nr]
            tck.save(i, j, num=num_c, wvg=wvg_c, het=het_c)
        else:
            het_c = None
            tck.save(i, j, num=num_c, wvg=wvg_c)
        write(i, j, r0, c0, nr, nc, num_c, wvg_c, het_c)

    stream, stats, shards = _keyed_tile_stream(
        source, n, tck.load, mesh, devices, stats=(avg, d_w), rows=rows)
    pend = {}
    for di, (i, j, r0, c0, nr, nc, payload) in stream:
        if di in pend:
            settle(pend.pop(di))
        if isinstance(payload, dict):
            write(i, j, r0, c0, nr, nc, payload["num"], payload["wvg"],
                  payload.get("het"))
            continue
        slab_i, slab_j = payload
        av, dw = stats[di]
        if shards[di] is not None:
            carry = (jnp.zeros((group, group), fdt, device=shards[di]),
                     jnp.zeros((group, group), fdt, device=shards[di]),
                     jnp.zeros((group,), jnp.int32, device=shards[di]))
        else:
            carry = _tile_carry([((group, group), fdt)] * 2
                                + [((group,), jnp.int32)], mesh)
        outs = _eigmix_tile_scan_c(carry, row_slab(i, slab_i), slab_j,
                                   av, dw, i == j)
        slab_i = slab_j = payload = None
        pend[di] = (i, j, r0, c0, nr, nc, outs)
        outs = None
    for di in sorted(pend):
        settle(pend.pop(di))
    return None if partial else (num, wvg, het)


@functools.partial(jax.jit, donate_argnums=0)
def _king_homo_tile_scan_c(carry, slab_i, slab_j, w):
    """KING-homo parts for one tile (genKING.cpp:58-266): the 5 integer
    basis counters plus the p(1-p)- and (p(1-p))^2-weighted validity
    grams. w = (n_chunks, chunk) per-SNP p(1-p) from pass-1 stats. The
    carry is built by the caller so a mesh run can column-shard it."""
    from .decode import genotype_basis
    from .pairwise import _plane_mm_dtype

    fdt = w.dtype
    mm_dt = _plane_mm_dtype()

    def step(carry, xs):
        pk_i, pk_j, ww = xs
        grams, waf, waf2 = carry
        gi = decode2bit(pk_i)
        gj = decode2bit(pk_j)
        bi = genotype_basis(gi).astype(mm_dt)
        bj = genotype_basis(gj).astype(mm_dt)

        def mm(x, y):
            return lax.dot_general(x, y, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

        grams = (grams[0] + mm(bi[0], bj[0]), grams[1] + mm(bi[1], bj[1]),
                 grams[2] + mm(bi[2], bj[2]), grams[3] + mm(bi[1], bj[0]),
                 grams[4] + mm(bi[0], bj[1]))
        vi = (gi < 3).astype(fdt)
        vj = (gj < 3).astype(fdt)
        waf = waf + jnp.matmul((vi * ww[:, None]).T, vj,
                               preferred_element_type=fdt,
                               precision=MM_PRECISION)
        waf2 = waf2 + jnp.matmul((vi * (ww * ww)[:, None]).T, vj,
                                 preferred_element_type=fdt,
                                 precision=MM_PRECISION)
        return (grams, waf, waf2), None

    return lax.scan(step, carry, (slab_i, slab_j, w))[0]


def king_homo_parts_tiled(ws, group=None, chunk=None, verbose=False,
                          meter=None, source=None, checkpoint=None,
                          mesh=None, devices=None, tile_rank=None):
    """Assembled KING-homo parts (PairCounts, waf, waf2) from super
    tiles — the bounded-traffic analog of king_homo_rows. checkpoint=
    saves one .npz per completed tile; mesh= column-shards each tile
    scan over every mesh device; devices= schedules whole tiles
    round-robin over the given jax devices."""
    from .pairwise import PairCounts

    n = ws.n_samp if ws is not None else source.n_samp
    if source is None:
        # see _resolve_grid: checkpoint meta > devices/rank-aware auto
        group, chunk = _resolve_grid(ws, n, group, chunk, checkpoint,
                                     77, devices, tile_rank, 72, 36)
        source = StoreSlabSource(ws, group, chunk, meter=meter)
    group = source.group
    guard_count_snps(source.n_snp, "super-tile KING-homo")
    if mesh is not None and devices is not None:
        raise ValueError("pass mesh= (intra-tile column sharding) or "
                         "devices= (whole-tile scheduling), not both")
    # validate tile_rank before the expensive stats pass
    rows, partial = _rank_rows_arg(source, tile_rank, checkpoint)
    if mesh is not None:
        source = _PlacedSource(source, _mesh_tile_shardings(mesh)[0])
    row_slab = _row_replicator(mesh)
    fdt = _default_float_dtype()
    avg, _scale, _poly, _nl = _stats_pass(source, fdt)
    p = 0.5 * np.asarray(avg, np.float64)
    w = jnp.asarray(p * (1.0 - p),
                    np.float64 if fdt == jnp.float64 else np.float32)
    if mesh is not None:
        w = jax.device_put(w, _mesh_tile_shardings(mesh)[2])
    tck = TileGridCheckpointer(
        checkpoint, meta=(77, source.n_snp, n, group, source.chunk))
    B = np.empty((5, n, n), np.int64) if not partial else None
    waf = np.empty((n, n)) if not partial else None
    waf2 = np.empty((n, n)) if not partial else None

    def write(i, j, r0, c0, nr, nc, b, w1c, w2c):
        if partial:
            return
        B[:, r0:r0 + nr, c0:c0 + nc] = b
        waf[r0:r0 + nr, c0:c0 + nc] = w1c
        waf2[r0:r0 + nr, c0:c0 + nc] = w2c
        if i != j:
            for sym in (0, 1, 2):
                B[sym, c0:c0 + nc, r0:r0 + nr] = b[sym].T
            B[3, c0:c0 + nc, r0:r0 + nr] = b[4].T
            B[4, c0:c0 + nc, r0:r0 + nr] = b[3].T
            waf[c0:c0 + nc, r0:r0 + nr] = w1c.T
            waf2[c0:c0 + nc, r0:r0 + nr] = w2c.T
        if verbose:
            print(f"KING-homo tile ({i},{j})")

    def settle(pnd):
        i, j, r0, c0, nr, nc, (grams, w1, w2) = pnd
        b = np.stack([host_read(a)[:nr, :nc] for a in grams]) \
            .astype(np.int64)
        w1c = host_read(w1)[:nr, :nc]
        w2c = host_read(w2)[:nr, :nc]
        tck.save(i, j, b=b, waf=w1c, waf2=w2c)
        write(i, j, r0, c0, nr, nc, b, w1c, w2c)

    stream, stats, shards = _keyed_tile_stream(
        source, n, tck.load, mesh, devices, stats=(w,), rows=rows)
    pend = {}
    for di, (i, j, r0, c0, nr, nc, payload) in stream:
        if di in pend:
            settle(pend.pop(di))
        if isinstance(payload, dict):
            write(i, j, r0, c0, nr, nc, payload["b"], payload["waf"],
                  payload["waf2"])
            continue
        slab_i, slab_j = payload
        if shards[di] is not None:
            carry = (tuple(jnp.zeros((group, group), jnp.int32,
                                     device=shards[di])
                           for _ in range(5)),
                     jnp.zeros((group, group), fdt, device=shards[di]),
                     jnp.zeros((group, group), fdt, device=shards[di]))
        else:
            carry = (_tile_carry([((group, group), jnp.int32)] * 5, mesh),
                     *_tile_carry([((group, group), fdt)] * 2, mesh))
        outs = _king_homo_tile_scan_c(carry, row_slab(i, slab_i), slab_j,
                                      stats[di][0])
        slab_i = slab_j = payload = None
        pend[di] = (i, j, r0, c0, nr, nc, outs)
        outs = None
    for di in sorted(pend):
        settle(pend.pop(di))
    return None if partial else (PairCounts(*B), waf, waf2)


def auto_tile_group(n_snp: int, slab_budget: float = 6.5e9,
                    carry_budget: float = 1.3e9,
                    bytes_per_cell: int = 8, n_samp=None) -> int:
    """Sample-group size for the super-tile engine: two packed slabs
    (group x n_snp x 2bit) within slab_budget AND the (group x group)
    tile carries (bytes_per_cell: 8 for GRM f32+int32, 20 for the
    5-counter integer basis) within carry_budget, 128-aligned. Budgets
    leave ~4 GB headroom on a 16 GB chip for the scan workspace (f32
    chunk blocks, 3-pass bf16 copies, the shipped tile) plus allocator
    fragmentation — group 16384 at 1M SNPs OOMed in practice, 12288
    holds. n_samp clamps the group to the (128-padded) cohort so small
    selections never scan a mostly-padding tile (CLAUDE.md: clamp
    tile/block sizes to the actual data)."""
    g1 = slab_budget / 2.0 / max(n_snp / 4.0, 1.0)
    g2 = (carry_budget / bytes_per_cell) ** 0.5
    g = int(min(g1, g2))
    if n_samp is not None:
        g = min(g, -(-int(n_samp) // 128) * 128)
    return max(128, (g // 128) * 128)


def _rank_rows_arg(source, tile_rank, checkpoint):
    """Resolve tile_rank=(rank, world) to a rows= subset (validated —
    nonsense ranks raise instead of silently running the full grid). A
    proper partition (world > 1) requires checkpoint= — the completed
    tiles ARE the rank's output; the caller assembles by re-running with
    tile_rank=None/(0, 1) over the shared checkpoint directory (which
    then recomputes nothing)."""
    tile_rank = parse_tile_rank(tile_rank)
    if tile_rank is None:
        return None, False
    if not checkpoint:  # None AND '' (save() no-ops on a falsy path)
        raise ValueError("tile_rank=(rank, world) needs checkpoint=: the "
                         "per-tile artifacts are how ranks combine")
    return rank_rows(source.n_groups, *tile_rank), True


def grm_tiled(ws, group=None, method: str = "GCTA", chunk=None,
              checkpoint=None, verbose: bool = False, meter=None,
              source=None, mesh=None, devices=None, tile_rank=None):
    """Assembled (n x n) GRM from the super-tile engine (both triangles
    mirrored). Used by models.grm for selections past the slab-staging
    budget; also callable directly with a custom ``source``.
    tile_rank=(rank, world): compute only this rank's weight-balanced
    tile-row subset (the zero-collective multi-HOST partition — ranks
    are independent processes sharing only the checkpoint directory)
    and return None; after all ranks finish, a tile_rank=None run over
    the same checkpoint assembles the matrix without recomputation."""
    n = ws.n_samp if ws is not None else source.n_samp
    if source is None:
        # the GRM carry is f32+int32 (8 B/cell) regardless of
        # scheduling mode — the pending D2H tile is small vs the slabs;
        # an existing checkpoint meta still wins (see _resolve_grid)
        group, chunk = _resolve_grid(ws, n, group, chunk, checkpoint,
                                     71 if method == "GCTA" else 72,
                                     devices, tile_rank, 8, 8)
        source = StoreSlabSource(ws, group, chunk, meter=meter)
    rows, partial = _rank_rows_arg(source, tile_rank, checkpoint)
    mat = None if partial else np.empty((n, n))
    for r0, c0, nr, nc, tile in gcta_grm_tiles(
            source, n, method=method, checkpoint=checkpoint,
            verbose=verbose, mesh=mesh, devices=devices, rows=rows):
        if partial:
            continue
        mat[r0:r0 + nr, c0:c0 + nc] = tile
        if r0 != c0:
            mat[c0:c0 + nc, r0:r0 + nr] = tile.T
    if partial:
        return None
    if method == "Eigenstrat":
        mat *= (n - 1) / float(np.trace(mat))
    return mat
