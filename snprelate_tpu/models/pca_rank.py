"""Rank-distributed randomized PCA (VERDICT r2 #3): the multi-host
partition of CRandomPCA (genPCA.cpp:472-803) in the zero-collective
tile_rank philosophy — ranks are INDEPENDENT processes that exchange only
small .npy artifacts through a shared work directory. No jax.distributed,
no collectives; the driver (or a filesystem poll) sequences the phases.

Partition: SNP chunks stride across ranks (chunk c -> rank c % world), so
every per-rank sweep touches 1/world of the data and nothing larger than
(n x hsize) ever crosses a process boundary:

  power pass i (per rank):  H_r = Y_r G_i   (rank's SNP rows, device)
                            P_r = Y_r^T H_r -> workdir/p{i}.r{rank}.npy
  reduce i (any host):      G_{i+1} = orth(sum_r P_r) -> workdir/g{i+1}.npy
                            (per-pass orthonormalization keeps the Krylov
                            blocks at bounded scale — the span is
                            unchanged, the Gram conditioning below is not
                            cosmetically squared across power depths)
  project (per rank):       H_r = [Y_r G_0 .. Y_r G_q] (device-resident),
                            C_r = H_r^T H_r, W_r = Y_r^T H_r
                            -> workdir/{c,w}.r{rank}.npy
  assemble (any host):      C = sum C_r; column-scaled eigh of C gives an
                            orthonormal basis U of span(H) WITHOUT ever
                            materializing H across ranks; T = U^T Y =
                            L^+ W^T follows from W = Y^T H; then the same
                            (T T^T) eigensolve + eigval = (n-1) * 2
                            sigma^2 / TraceXTX semantics as the other
                            randomized paths (R/PCA.R:80-88).

Artifact sizes per rank: P (n_pad x aux), C (hsize^2), W (n_pad x hsize)
— at the 100k x 1M north star with aux 64 x 5 passes: 51 MB + 0.2 MB +
256 MB. The genotype data never moves between ranks.
"""

from __future__ import annotations

import os

import numpy as np


def _fdt():
    import jax
    import jax.numpy as jnp

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def rank_chunk_sel(n_chunks: int, rank: int, world: int) -> np.ndarray:
    """This rank's SNP-chunk subset (strided: balanced to within one
    chunk)."""
    if not (0 <= rank < world):
        raise ValueError(f"pca rank {rank} outside world {world}")
    return np.arange(rank, n_chunks, world)


def subset_chunks(source, rank: int, world: int):
    """A SlabSource serving only this rank's chunk subset. Sources with
    native chunk_sel support (StoreSlabSource, the bench's GenSlabSource)
    rebuild themselves; anything else is wrapped with an on-device
    gather (the slab is already device-resident, so the gather costs no
    host traffic).

    The sub-source is memoized on the parent: every power/project pass
    of a rank then reuses ONE source, so a pinned slab cache
    (StoreSlabSource with an explicit budget) survives across passes —
    without this, each pass rebuilt the sub-source and re-uploaded the
    whole rank share. Sequential in-process multi-rank runs share the
    chip, so size the budget for world x pins."""
    sel = rank_chunk_sel(source.n_chunks, rank, world)
    if world == 1:
        return source
    memo = getattr(source, "_rank_sub_memo", None)
    if memo is None:
        memo = {}
        try:
            source._rank_sub_memo = memo
        except AttributeError:
            memo = None
    key = (rank, world)
    if memo is not None and key in memo:
        return memo[key]
    sub = (source.with_chunk_sel(sel)
           if hasattr(source, "with_chunk_sel")
           else _GatherSubset(source, sel))
    if memo is not None:
        memo[key] = sub
    return sub


class _GatherSubset:
    def __init__(self, source, sel):
        self._source = source
        self._sel = np.asarray(sel)
        self._sel_dev = None
        for a in ("group", "chunk", "n_groups", "n_samp", "n_snp"):
            setattr(self, a, getattr(source, a))
        self.n_chunks = len(self._sel)

    def slab(self, j: int):
        import jax.numpy as jnp

        if self._sel_dev is None:
            self._sel_dev = jnp.asarray(self._sel)
        return self._source.slab(j)[self._sel_dev]


def _g_path(workdir, i):
    return os.path.join(workdir, f"g{i:03d}.npy")


def _g0(n_pad: int, n_samp: int, aux_dim: int, seed):
    """The shared initial subspace — regenerated from the seed by every
    rank (deterministic, so no g000 file needs to exist). A concrete seed
    is REQUIRED: seed=None would draw OS entropy, silently giving every
    rank a different G0 and making the summed partials garbage."""
    if seed is None:
        seed = 0
    rng = np.random.default_rng(seed)
    g = np.zeros((n_pad, aux_dim))
    g[:n_samp] = rng.standard_normal((n_samp, aux_dim))
    return g


def _load_g(workdir, i, n_pad, n_samp, aux_dim, seed):
    if i == 0:
        return _g0(n_pad, n_samp, aux_dim, seed)
    return np.load(_g_path(workdir, i))


def _rank_stats(source, workdir, rank):
    """Per-SNP (avg, scale) over this rank's chunks, cached in workdir so
    later phases skip the stats sweep. Randomized-PCA scaling
    1/sqrt(2p(1-p)) (thread_lookup_y, genPCA.cpp:501-528)."""
    import jax.numpy as jnp

    from ..ops.tiles import _stats_pass

    fn = os.path.join(workdir, f"stats.r{rank}.npz")
    fdt = _fdt()
    npdt = np.float64 if fdt.dtype == np.float64 else np.float32
    if os.path.exists(fn):
        with np.load(fn) as z:
            return (jnp.asarray(z["avg"], npdt),
                    jnp.asarray(z["scale"], npdt))
    avg, _s, _p, _n = _stats_pass(source, fdt)
    avg = np.asarray(avg, np.float64)
    p = avg * 0.5
    with np.errstate(divide="ignore", invalid="ignore"):
        scale = np.where((p > 0) & (p < 1),
                         1.0 / np.sqrt(2.0 * p * (1.0 - p)), 0.0)
    tmp = fn + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        np.savez(f, avg=avg, scale=scale)
    os.replace(tmp, fn)
    return jnp.asarray(avg, npdt), jnp.asarray(scale, npdt)


def pca_rank_power(source, n_samp: int, workdir: str, rank: int,
                   world: int, it: int, aux_dim: int, seed=None,
                   verbose: bool = False) -> str:
    """One distributed power pass for this rank: P_r = Y_r^T (Y_r G_it)
    over the rank's SNP chunks (two group sweeps, all factors device-
    resident). Writes workdir/p{it}.r{rank}.npy. Returns the artifact path."""
    import jax.numpy as jnp
    from jax import lax

    from .pca_randomized import _make_slab_pca_steps

    os.makedirs(workdir, exist_ok=True)
    sub = subset_chunks(source, rank, world)
    avg, scale = _rank_stats(sub, workdir, rank)
    k = sub.n_groups
    group = sub.group
    n_pad = k * group
    fdt = _fdt()
    G = jnp.asarray(_load_g(workdir, it, n_pad, n_samp, aux_dim, seed), fdt)

    h_accum, g_accum = _make_slab_pca_steps()
    h_all = jnp.zeros((sub.n_chunks, sub.chunk, aux_dim), fdt)
    for j in range(k):
        slab = sub.slab(j)
        h_all, tr = h_accum(h_all, slab, avg, scale,
                            lax.dynamic_slice_in_dim(G, j * group, group))
        float(tr)  # sync bounds slab residency
        slab = None
    p_parts = []
    for j in range(k):
        slab = sub.slab(j)
        gj = g_accum(slab, avg, scale, h_all)
        np.asarray(gj[:1, :1])
        p_parts.append(gj)
        slab = None
    P = np.concatenate([np.asarray(g, np.float64) for g in p_parts])
    fn = os.path.join(workdir, f"p{it:03d}.r{rank}.npy")
    tmp = fn + ".tmp"
    with open(tmp, "wb") as f:
        np.save(f, P)
    os.replace(tmp, fn)
    if verbose:
        print(f"pca rank {rank}/{world}: power pass {it} done")
    return fn


def pca_rank_reduce(workdir: str, world: int, it: int,
                    verbose: bool = False) -> str:
    """Merge the ranks' power partials: G_{it+1} = orth(sum_r P_r)
    (host f64 QR — per-pass orthonormalization; the Krylov span is
    unchanged). Tiny: one (n_pad x aux) sum + QR."""
    P = None
    for r in range(world):
        fn = os.path.join(workdir, f"p{it:03d}.r{r}.npy")
        if not os.path.exists(fn):
            raise FileNotFoundError(
                f"{fn} missing — rank {r} has not finished power pass "
                f"{it}")
        part = np.load(fn)
        P = part if P is None else P + part
    q, _r = np.linalg.qr(P)
    out = _g_path(workdir, it + 1)
    tmp = out + ".tmp"
    with open(tmp, "wb") as f:
        np.save(f, q)
    os.replace(tmp, out)
    if verbose:
        print(f"pca reduce: wrote G_{it + 1}")
    return out


def pca_rank_project(source, n_samp: int, workdir: str, rank: int,
                     world: int, n_iters: int, aux_dim: int, seed=None,
                     verbose: bool = False) -> tuple:
    """Final per-rank sweep: with every G_i known, build the rank's
    stacked Krylov block H_r = [Y_r G_0 .. Y_r G_q] once (device), then
    C_r = H_r^T H_r and W_r = Y_r^T H_r. Writes workdir/c.r{rank}.npy and
    w.r{rank}.npy."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from .pca_randomized import _make_slab_pca_steps
    from ..ops.pairwise import norm_precision

    sub = subset_chunks(source, rank, world)
    avg, scale = _rank_stats(sub, workdir, rank)
    k = sub.n_groups
    group = sub.group
    n_pad = k * group
    fdt = _fdt()
    hsize = aux_dim * (n_iters + 1)
    Gs = np.concatenate(
        [_load_g(workdir, i, n_pad, n_samp, aux_dim, seed)
         for i in range(n_iters + 1)], axis=1)
    Gs = jnp.asarray(Gs, fdt)

    h_accum, g_accum = _make_slab_pca_steps()
    h_all = jnp.zeros((sub.n_chunks, sub.chunk, hsize), fdt)
    tr_sum = 0.0  # the rank's TraceXTX share (sum of y^2 over its SNPs)
    for j in range(k):
        slab = sub.slab(j)
        h_all, tr = h_accum(h_all, slab, avg, scale,
                            lax.dynamic_slice_in_dim(Gs, j * group,
                                                     group))
        tr_sum += float(tr)  # sync bounds slab residency
        slab = None

    @jax.jit
    def gram(h):
        hm = h.reshape(-1, h.shape[2])
        return jnp.matmul(hm.T, hm, preferred_element_type=hm.dtype,
                          precision=norm_precision())

    C = np.asarray(gram(h_all), np.float64)
    w_parts = []
    for j in range(k):
        slab = sub.slab(j)
        wj = g_accum(slab, avg, scale, h_all)  # (group, hsize) = Y_j^T H
        np.asarray(wj[:1, :1])
        w_parts.append(wj)
        slab = None
    W = np.concatenate([np.asarray(w, np.float64) for w in w_parts])

    cfn = os.path.join(workdir, f"c.r{rank}.npy")
    wfn = os.path.join(workdir, f"w.r{rank}.npy")
    tfn = os.path.join(workdir, f"tr.r{rank}.npy")
    for fn, arr in ((cfn, C), (wfn, W), (tfn, np.float64(tr_sum))):
        with open(fn + ".tmp", "wb") as f:
            np.save(f, arr)
        os.replace(fn + ".tmp", fn)
    if verbose:
        print(f"pca rank {rank}/{world}: projection done")
    return cfn, wfn


def pca_rank_assemble(workdir: str, world: int, n_samp: int,
                      eigen_cnt: int, sample_id=None, snp_id=None,
                      rel_floor: float = 1e-12):
    """Merge C_r / W_r / tr_r and finish the factorization on host f64:
    column-scaled eigh of C = H^T H gives the orthonormal basis of
    span(H) (never materializing H), T = U^T Y follows from W, and the
    (T T^T) eigensolve + varprop semantics match the other randomized
    paths (R/PCA.R:80-88). Returns PCAResult."""
    from .pca import PCAResult

    C = W = None
    tr = 0.0
    for r in range(world):
        c = np.load(os.path.join(workdir, f"c.r{r}.npy"))
        w = np.load(os.path.join(workdir, f"w.r{r}.npy"))
        tfn = os.path.join(workdir, f"tr.r{r}.npy")
        tr += float(np.load(tfn))
        C = c if C is None else C + c
        W = w if W is None else W + w

    # column scaling: D C D with D = diag(C)^-1/2 bounds the Gram's
    # dynamic range to cosine structure (power blocks differ by orders of
    # magnitude in scale even after per-pass orthonormalization)
    d = np.sqrt(np.diag(C).clip(min=0.0))
    dinv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
    Cs = C * np.outer(dinv, dinv)
    lam, V = np.linalg.eigh(Cs)
    keep = lam > max(lam.max(), 0.0) * rel_floor
    lam = lam[keep][::-1]
    V = V[:, keep][:, ::-1]
    # U = H D V lam^-1/2 orthonormal; T = U^T Y = lam^-1/2 V^T D W^T
    T = (V / np.sqrt(lam)).T @ (W * dinv[None, :]).T  # (kkeep, n_pad)

    B = T @ T.T
    w_eig, U = np.linalg.eigh(B)
    order = np.argsort(w_eig)[::-1][:eigen_cnt]
    sigma = np.sqrt(np.maximum(w_eig[order], 0.0))
    u_sig = U[:, order] / np.where(sigma > 0, sigma, 1.0)
    eigenvect = (T.T @ u_sig)[:n_samp]

    trace2 = 2.0 * tr
    vp = np.full(n_samp, np.nan)
    kk = min(len(w_eig), n_samp)
    sig_all = np.sqrt(np.maximum(np.sort(w_eig)[::-1][:kk], 0.0))
    vp[:kk] = 2.0 * sig_all**2 / trace2
    eigenval = (n_samp - 1) * vp
    if sample_id is None:
        sample_id = np.asarray([f"s{i}" for i in range(n_samp)], object)
    if snp_id is None:
        snp_id = np.arange(0)
    return PCAResult(np.asarray(sample_id, object), np.asarray(snp_id),
                     eigenval, eigenvect, vp, trace2, False, None)


def _source_fingerprint(source) -> int:
    """Cheap cohort identity for the workdir guard. Shape parameters
    alone cannot distinguish two same-shape runs (e.g. a MAF-filter
    change that shifts the selected SNP count by under one chunk), so
    the guard also digests WHAT is being analyzed: the workspace's
    selection indices plus a strided sample of the packed genotype bytes
    (<= ~2 MB read, mmap-friendly) for store-backed sources, the PRNG
    seed for generated ones."""
    import zlib

    ws = getattr(source, "ws", None)
    if ws is not None:
        h = zlib.crc32(np.asarray([ws.n_samp, ws.n_snp], np.int64)
                       .tobytes())
        for a in (ws.samp_idx, ws.snp_idx):
            h = zlib.crc32(np.ascontiguousarray(a, np.int64).tobytes(), h)
        sel = getattr(source, "chunk_sel", None)
        if sel is not None:
            h = zlib.crc32(np.ascontiguousarray(sel, np.int64)
                           .tobytes(), h)
        src = ws.data.genotype_packed
        step = max(1, src.shape[0] // 64)
        h = zlib.crc32(np.ascontiguousarray(src[::step][:64]).tobytes(),
                       h)
        return int(h)
    seed = getattr(source, "seed", None)
    if seed is not None:
        return int(seed) & 0xFFFFFFFF
    return -1


def _guard_workdir(workdir, params: tuple):
    """Refuse a workdir holding another run's artifacts: stale g/p files
    from a different (cohort fingerprint, shapes, aux, iters, world,
    seed) would satisfy the barriers and silently poison the reduces.
    Same-params meta writes are byte-identical pid-tmp atomic replaces
    (concurrent ranks race-free)."""
    os.makedirs(workdir, exist_ok=True)
    meta = np.asarray(params, np.int64)
    mfn = os.path.join(workdir, "meta.npy")
    if os.path.exists(mfn):
        if not np.array_equal(np.load(mfn), meta):
            raise ValueError(
                f"pca workdir {workdir!r} holds artifacts of a different "
                f"run (meta mismatch) — point the ranks at a fresh "
                f"directory")
        return
    tmp = mfn + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        np.save(f, meta)
    os.replace(tmp, mfn)


def _wait_for(paths, poll: float, timeout: float, what: str):
    """Filesystem barrier: block until every path exists (multi-host
    ranks coordinate through the shared workdir only)."""
    import time

    deadline = time.time() + timeout
    missing = list(paths)
    while True:
        missing = [p for p in missing if not os.path.exists(p)]
        if not missing:
            return
        if time.time() >= deadline:
            raise TimeoutError(
                f"pca rank barrier timed out waiting for {what}: "
                f"{len(missing)} artifact(s) missing, e.g. {missing[0]}")
        time.sleep(poll)


def pca_rank_process(source, n_samp: int, workdir: str, rank: int,
                     world: int, eigen_cnt: int = 32, aux_dim=None,
                     iter_num: int = 4, seed=None, sample_id=None,
                     snp_id=None, poll: float = 2.0,
                     timeout: float = 3600.0, verbose: bool = False):
    """One rank's COMPLETE life cycle of the distributed randomized PCA —
    the entry point an actual multi-host deployment runs, one process
    per host against a shared filesystem (the same deployment contract
    as grm(tile_rank=)). Rank 0 additionally performs the tiny reduce /
    assemble steps; every other rank synchronizes on the files rank 0
    writes. Returns PCAResult on rank 0, None elsewhere.

    Phases (see module docstring): for it in 0..iter_num-1 every rank
    writes p{it}.r{rank}.npy, rank 0 merges them into g{it+1}.npy; then
    every rank writes its projection artifacts and rank 0 assembles."""
    if aux_dim is None:
        aux_dim = 2 * eigen_cnt
    if not (0 <= rank < world):
        raise ValueError(f"pca rank {rank} outside world {world}")
    _guard_workdir(workdir, (n_samp, source.n_chunks, source.group,
                             source.chunk, aux_dim, iter_num, world,
                             0 if seed is None else int(seed),
                             _source_fingerprint(source)))
    for it in range(iter_num):
        if it > 0 and rank != 0:
            _wait_for([_g_path(workdir, it)], poll, timeout,
                      f"G_{it} (rank 0's reduce of pass {it - 1})")
        pca_rank_power(source, n_samp, workdir, rank, world, it, aux_dim,
                       seed=seed, verbose=verbose)
        if rank == 0:
            _wait_for([os.path.join(workdir, f"p{it:03d}.r{r}.npy")
                       for r in range(world)], poll, timeout,
                      f"power-pass-{it} partials")
            pca_rank_reduce(workdir, world, it, verbose=verbose)
    if rank != 0 and iter_num > 0:
        _wait_for([_g_path(workdir, iter_num)], poll, timeout,
                  f"G_{iter_num} (rank 0's final reduce)")
    pca_rank_project(source, n_samp, workdir, rank, world, iter_num,
                     aux_dim, seed=seed, verbose=verbose)
    if rank != 0:
        return None
    _wait_for([os.path.join(workdir, f"{k}.r{r}.npy")
               for r in range(world) for k in ("c", "w", "tr")],
              poll, timeout, "projection artifacts")
    return pca_rank_assemble(workdir, world, n_samp, eigen_cnt,
                             sample_id=sample_id, snp_id=snp_id)


def randomized_pca_ranked(make_source, n_samp: int, workdir: str,
                          world: int = 1, eigen_cnt: int = 32,
                          aux_dim=None, iter_num: int = 4, seed=None,
                          sample_id=None, snp_id=None,
                          verbose: bool = False, timings=None):
    """In-process driver running every rank's phases sequentially (the
    same sequential-rank methodology as the tile_rank hardware demos:
    ranks are zero-communication, so per-phase walls measured one rank at
    a time equal concurrent multi-host walls). ``make_source(rank)``
    builds each rank's slab source; ``timings`` (optional dict) collects
    per-phase wall clocks keyed (phase, it, rank) for scaling reports."""
    import time

    if aux_dim is None:
        aux_dim = 2 * eigen_cnt
    os.makedirs(workdir, exist_ok=True)
    sources = [make_source(r) for r in range(world)]

    def clock(key, fn):
        t0 = time.time()
        out = fn()
        if timings is not None:
            timings[key] = time.time() - t0
        return out

    # power passes produce G_1..G_q; the project phase rebuilds every
    # H_i = Y G_i from the stored G's, so no trailing power pass runs
    for it in range(iter_num):
        for r in range(world):
            clock(("power", it, r),
                  lambda r=r, it=it: pca_rank_power(
                      sources[r], n_samp, workdir, r, world, it, aux_dim,
                      seed=seed, verbose=verbose))
        clock(("reduce", it, -1),
              lambda it=it: pca_rank_reduce(workdir, world, it,
                                            verbose=verbose))
    for r in range(world):
        clock(("project", 0, r),
              lambda r=r: pca_rank_project(
                  sources[r], n_samp, workdir, r, world, iter_num,
                  aux_dim, seed=seed, verbose=verbose))
    return clock(("assemble", 0, -1),
                 lambda: pca_rank_assemble(workdir, world, n_samp,
                                           eigen_cnt, sample_id=sample_id,
                                           snp_id=snp_id))
