"""Fused pairwise accumulation engines — the TPU-native replacement for every
popcount / outer-product kernel in the reference.

Two engines cover the whole analysis family:

1. ``pair_counts``: integer-exact pairwise counters from the reduced
   4-gram basis [V, H, D] (validity, het, signed homozygote difference;
   ``genotype_basis``): V^T V, H^T H, D^T D and H^T V recover IBS0/1/2
   (genIBS.cpp:231-243), KING counters (genKING.cpp:292-426), IndivBeta
   counts (genBeta.cpp:92-175) and PLINK MoM inputs in closed form — see
   ``PairCounts``. The reference's per-pair AND/XOR/POPCNT loops become
   int4 MXU matmuls (4 instead of the 6 independent one-hot plane grams:
   the estimators use fewer degrees of freedom than the full 9 joint
   counts, which remain available via ``plane_grams``); missingness falls
   out for free because missing genotypes contribute zero to every basis
   vector. Counts accumulate exactly in int32 and the streaming engines
   flush the carry into a host int64 accumulator before 2^31 accumulated
   SNPs (``count_flush_interval``) — no SNP-count ceiling at all, against
   the reference's hard u32/2^30 refusal (genKING.cpp:598-602). The
   single-scan super-tile engines guard loudly instead
   (``guard_count_snps``).

2. ``normalized_grams``: floating Gram accumulation over per-chunk
   transformed blocks — the CProdMat_AlgArith machinery (genPCA.cpp:77-312):
   mean-imputed, centered, variance-scaled dosage blocks for PCA/GCTA/
   EIGMIX, plus companion validity blocks for per-pair denominators.

Both stream SNP chunks through one jitted step with a donated carry, the
analog of CGenoReadBySNP + thread fan-out (dGenGWAS.cpp:1218-1397, 2000-2193)
re-designed as: host prefetch -> device decode -> MXU contraction.
"""

from __future__ import annotations

import functools
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .decode import decode2bit, genotype_basis, genotype_planes

# Float Gram matmuls run at HIGHEST precision by default: TPU default f32
# matmul uses bf16 passes (~1e-4 relative error single-pass), which would
# break parity with the reference's f64 accumulation. HIGHEST (6-pass)
# gives ~3e-7; HIGH (3-pass bf16_3x) gives ~1e-6 at 1.7x the speed and can
# be selected with SNPRELATE_TPU_MM_PRECISION=high. Tests on CPU/x64 are
# exact either way.
import os as _os

_PRECISIONS = {
    "default": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}

MM_PRECISION = _PRECISIONS[
    _os.environ.get("SNPRELATE_TPU_MM_PRECISION", "highest").lower()]


def norm_precision():
    """Precision for Eigenstrat-normalized covariance grams (PCA / GCTA).

    The variance-scaled blocks are O(1) and well-conditioned, so 3-pass
    bf16_3x (HIGH) lands at ~1e-6 relative error on the golden hapmap PCA —
    18x inside the 2e-5 TPU budget — at 1.7x the 6-pass speed (measured
    27 -> 45 TFLOPS on v5e). Unscaled paths (EIGMIX) stay at MM_PRECISION
    (HIGHEST) where bf16_3x measured 1.7e-5, too close to budget.
    Override with SNPRELATE_TPU_NORM_PRECISION=highest|high|default.
    """
    import jax as _jax

    env = _os.environ.get("SNPRELATE_TPU_NORM_PRECISION")
    if env:
        return _PRECISIONS[env.lower()]
    if _os.environ.get("SNPRELATE_TPU_MM_PRECISION"):
        return MM_PRECISION
    return (lax.Precision.HIGH if _jax.default_backend() == "tpu"
            else lax.Precision.HIGHEST)


def _plane_mm_dtype():
    # 0/1 indicator planes: int4 on TPU doubles MXU rate and halves HBM
    # traffic with exact int32 accumulation; CPU XLA prefers int8.
    return jnp.int4 if jax.default_backend() == "tpu" else jnp.int8

# Accumulation dtype policy:
#  - counts: int32 per-chunk and carry (exact)
#  - float: matmul in compute_dtype (f32 on TPU, f64 on CPU/x64), carry f64
#    when enabled, else f32.
#
# int32 ceiling: every pairwise counter grows by at most 1 per SNP, so an
# int32 carry is exact up to 2^31 - 1 accumulated SNPs. The streaming
# engines FLUSH the carry into a host int64 accumulator before that point
# (no ceiling at all — beats the reference's hard 2^30 refusal,
# genKING.cpp:598-602); the single-scan super-tile engines guard loudly.

INT32_COUNT_CEILING = 2**31 - 1


def _count_ceiling() -> int:
    """SNPs an int32 count carry can absorb before it could wrap.
    Env-overridable (SNPRELATE_TPU_COUNT_CEILING) so tests exercise the
    flush/guard machinery at toy sizes."""
    return int(_os.environ.get("SNPRELATE_TPU_COUNT_CEILING",
                               INT32_COUNT_CEILING))


def count_flush_interval(chunk: int) -> int:
    """Chunks between int32 -> int64 flushes in the streaming count
    engines: within one interval a counter grows by <= interval * chunk
    <= ceiling SNPs, so a wrap is impossible."""
    return max(1, _count_ceiling() // max(1, int(chunk)))


def guard_count_snps(n_snp: int, engine: str) -> None:
    """Refuse selections whose int32 count carries could silently wrap in
    engines that accumulate one un-flushable device scan (the super-tile
    engines — whose slabs could not fit HBM at that size anyway). The
    streaming chunk/row engines flush instead and have no ceiling."""
    if int(n_snp) > _count_ceiling():
        raise ValueError(
            f"{engine}: {n_snp} selected SNPs exceed the int32 count "
            f"ceiling ({_count_ceiling()}); the chunk-streaming engines "
            "(pair_counts / basis_gram_rows) flush into int64 and have "
            "no ceiling — use those, or subset the SNPs")


def _default_float_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def host_read(x) -> np.ndarray:
    """``np.asarray`` that also works on MULTI-PROCESS (global-mesh)
    device arrays: a mesh spanning several jax.distributed processes
    leaves each output shard addressable only by its owner, so the plain
    materialization raises — all-gather the shards to every process
    first (one collective per materialized result, the same cost class
    as the reference's per-analysis thread join). Single-process arrays
    (the common case, incl. every single-device run) pass straight
    through."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable \
            and not x.is_fully_replicated:
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def chunk_snp_stats(geno: jax.Array):
    """Per-SNP sum/num over a decoded chunk (S, N): the jitted analog of
    SummarizeGeno_SampxSNP + DivideGeno (genPCA.cpp:84-141)."""
    valid = geno < 3
    g = jnp.where(valid, geno, 0).astype(jnp.int32)
    gsum = g.sum(axis=1)
    gnum = valid.sum(axis=1, dtype=jnp.int32)
    return gsum, gnum, valid


# upper-triangle plane-pair order for the symmetric 6-block gram
_SYM_PAIRS = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))


def _sym_grams4(basis: jax.Array) -> tuple:
    """(3, S, N) [V, H, D] reduced basis (genotype_basis) -> 4-tuple of
    (N, N) int32 grams (V^T V, H^T H, D^T D, H^T V).

    The minimal gram set for the estimator family (see PairCounts): 4 MXU
    contractions per chunk instead of the 6 independent one-hot plane
    grams — the estimators consume fewer degrees of freedom than the full
    9 joint counts. Returned unstacked so carry adds fuse into the matmul
    epilogues."""
    b = basis.transpose(0, 2, 1).astype(_plane_mm_dtype())  # (3, N, S)
    v, h, d = b[0], b[1], b[2]

    def mm(x, y):
        return jnp.matmul(x, y.T, preferred_element_type=jnp.int32)

    return (mm(v, v), mm(h, h), mm(d, d), mm(h, v))


def _sym_grams(planes: jax.Array) -> tuple:
    """(3, S, N) planes -> 6-tuple of (N, N) cross-grams for plane pairs
    a <= b (order ``_SYM_PAIRS``). C[b,a] = C[a,b]^T by symmetry, so only 6
    of the 9 blocks are computed — measured faster than the single (3N, 3N)
    matmul at bench scale. Returned as a tuple (not stacked) so per-block
    carry adds fuse into each matmul's epilogue instead of materializing a
    stacked copy (measured +5% end-to-end)."""
    p = planes.transpose(0, 2, 1).astype(_plane_mm_dtype())  # (3, N, S)
    return tuple(
        jnp.matmul(p[a], p[b].T, preferred_element_type=jnp.int32)
        for a, b in _SYM_PAIRS)


def _mirror6(g6: np.ndarray) -> np.ndarray:
    """(6, N, N) symmetric blocks -> full (3, 3, N, N):
    N_ba(i,j) = N_ab(j,i)."""
    g6 = np.asarray(g6)
    n = g6.shape[1]
    c = np.empty((3, 3, n, n), g6.dtype)
    for k, (a, b) in enumerate(_SYM_PAIRS):
        c[a, b] = g6[k]
        if a != b:
            c[b, a] = g6[k].T
    return c


# ---------------------------------------------------------------------------
# Block-triangular symmetric grams: a symmetric product W^T X (with W = X or
# W = per-SNP-weighted X, so C = C^T) only needs the upper sample-block
# triangle — at 8 blocks that is 36/64 of the matmul work, measured ~35%
# faster than the full (N, N) f32 HIGH matmul at bench scale.


def _choose_nblk(n_pad: int) -> int:
    """Sample-block count for an already-padded sample axis: blocks stay
    >= 1024 wide (full MXU efficiency) and 128-aligned."""
    for b in (8, 4, 2):
        if n_pad >= 1024 * b and n_pad % (128 * b) == 0:
            return b
    return 1


def auto_chunk(n_pad: int, n_snp: int) -> int:
    """SNP-chunk auto-tuning: the HBM analog of the reference's cache-sized
    block policy (GetOptimzedCache / DetectOptimizedNumOfSNP,
    dGenGWAS.cpp:2290-2315). Sizes the chunk so the decoded f32 block plus
    plane/operand copies stay well inside HBM (~2.4 GB at 6 bytes/element),
    large enough to amortize the n x n carry update per chunk."""
    if jax.default_backend() != "tpu":
        # CPU (tests, small data): compute-bound, compiles are cheap —
        # a small fixed chunk wins and keeps one compiled shape
        return 2048
    c = int(4.0e8) // max(n_pad, 1)
    c = min(32768, 1 << max(c, 1024).bit_length() - 1)  # pow2 floor >= 1024
    # cap by the dataset, rounded UP to a power of two: chunk sizes stay
    # quantized so different SNP selections reuse the same compiled step
    # (padding waste is at most 2x and TPU steps at this scale are ~ms)
    need = 1 << max(n_snp - 1, 1023).bit_length()
    return max(1024, min(c, need))


def _pad_blocks(n: int, pad_to: int = 128):
    """(n_pad, nblk) for a raw sample count: pads up to a multiple of
    ``pad_to * nblk`` so the block-triangular layout always applies once
    n is large enough (the extra padding samples are all-missing). Picks
    the largest block count whose own padded size keeps blocks >= 1024."""
    for b in (8, 4, 2):
        step = pad_to * b
        n_pad = -(-n // step) * step
        if n_pad >= 1024 * b:
            return n_pad, b
    return -(-n // pad_to) * pad_to, 1


def _sym_blocks(w: jax.Array, x: jax.Array, nblk: int, *,
                preferred_element_type, precision=None) -> tuple:
    """Upper block triangle of ``w.T @ x`` for a symmetric product
    (w = x, or w = x weighted per SNP): tuple of nblk*(nblk+1)//2 (nb, nb)
    blocks (unstacked so carry adds fuse into the matmul epilogues)."""
    n = x.shape[1]
    nb = n // nblk
    outs = []
    for a in range(nblk):
        for b in range(a, nblk):
            outs.append(jnp.matmul(
                w[:, a * nb:(a + 1) * nb].T, x[:, b * nb:(b + 1) * nb],
                preferred_element_type=preferred_element_type,
                precision=precision))
    return tuple(outs)


def _assemble_sym(blocks: np.ndarray, nblk: int) -> np.ndarray:
    """Stacked upper blocks -> full symmetric (N, N) numpy."""
    blocks = np.asarray(blocks)
    nb = blocks.shape[1]
    n = nb * nblk
    c = np.empty((n, n), blocks.dtype)
    k = 0
    for a in range(nblk):
        for b in range(a, nblk):
            c[a * nb:(a + 1) * nb, b * nb:(b + 1) * nb] = blocks[k]
            if a != b:
                c[b * nb:(b + 1) * nb, a * nb:(a + 1) * nb] = blocks[k].T
            k += 1
    return c


def _flat_planes(packed: jax.Array) -> jax.Array:
    """packed chunk -> (3N, S) int8 plane matrix."""
    planes = genotype_planes(decode2bit(packed))  # (3, S, N)
    p3, s, n = planes.shape
    return planes.transpose(0, 2, 1).reshape(p3 * n, s)


def _tree_add(carry, delta):
    return tuple(c + d for c, d in zip(carry, delta))


@functools.partial(jax.jit, donate_argnums=0)
def _gram6_step(carry6, packed):
    """carry6: 6-tuple of (N, N) int32 += symmetric plane cross-grams."""
    geno = decode2bit(packed)  # (S, Npad)
    planes = genotype_planes(geno)  # (3, S, N)
    return _tree_add(carry6, _sym_grams(planes))


def _zeros6(n_pad):
    return tuple(jnp.zeros((n_pad, n_pad), jnp.int32) for _ in range(6))


@functools.partial(jax.jit, donate_argnums=0)
def _gram4_step(carry4, packed):
    """carry4: 4-tuple of (N, N) int32 += reduced-basis grams
    (V^T V, H^T H, D^T D, H^T V)."""
    basis = genotype_basis(decode2bit(packed))  # (3, S, N)
    return _tree_add(carry4, _sym_grams4(basis))


def _zeros4(n_pad):
    return tuple(jnp.zeros((n_pad, n_pad), jnp.int32) for _ in range(4))


def plane_grams(chunks: Iterable[np.ndarray], n_samp_padded: int) -> np.ndarray:
    """Accumulate (3,3,N,N) genotype-plane cross-counts over packed chunks.

    N = 4 * packed_bytes (padding samples are missing -> zero planes).
    Returns int64 numpy.
    """
    carry = _zeros6(n_samp_padded)
    for packed in chunks:
        carry = _gram6_step(carry, jnp.asarray(packed))
    return _mirror6(np.stack([np.asarray(c) for c in carry])).astype(np.int64)


class PairCounts:
    """Closed-form pairwise counters derived from the reduced 4-gram basis
    (``_sym_grams4`` / ``genotype_basis``).

    Base matrices (all (N, N) integer-exact over valid pairs):
    ``vv`` = nvalid, ``hh`` = N11 (both het), ``dd`` = D^T D with
    D = [g==2]-[g==0], ``hv``/``vh`` = per-pair het counts of the first /
    second sample. With homo := vv + hh - hv - vh = N00 + N22 + N02 + N20
    (both-homozygous pairs), IBS0 = (homo - dd)/2 and the equal-homozygote
    count = (homo + dd)/2 — every counter the reference's bit kernels
    produce (genIBS.cpp:231-243, genKING.cpp:292-426, genBeta.cpp:92-175)
    follows exactly. Full 9-dof joint counts, when actually needed, come
    from ``plane_grams`` instead.
    """

    def __init__(self, vv, hh, dd, hv, vh):
        self.vv, self.hh, self.dd = vv, hh, dd
        self.hv, self.vh = hv, vh

    @classmethod
    def from_grams4(cls, grams4, n: int):
        """Device 4-tuple (vv, hh, dd, hv) full-square grams -> PairCounts
        (vh = hv^T by the gram transpose identity)."""
        vv, hh, dd, hv = (np.asarray(a)[:n, :n].astype(np.int64)
                          for a in grams4)
        return cls(vv, hh, dd, hv, hv.T.copy())

    def base(self):
        """The 5 base matrices (for engine-equivalence tests)."""
        return (self.vv, self.hh, self.dd, self.hv, self.vh)

    @property
    def nvalid(self):  # both genotypes valid
        return self.vv

    @property
    def n11(self):  # both het
        return self.hh

    @property
    def _homo_pair(self):  # both homozygous (N00+N22+N02+N20)
        return self.vv + self.hh - self.hv - self.vh

    @property
    def ibs0(self):  # opposite homozygotes
        return (self._homo_pair - self.dd) // 2

    @property
    def both_hom_eq(self):  # equal homozygotes (N00+N22)
        return (self._homo_pair + self.dd) // 2

    @property
    def ibs2(self):  # equal genotypes (genIBS.cpp ibs2 plane logic)
        return self.both_hom_eq + self.hh

    @property
    def ibs1(self):
        return self.nvalid - self.ibs0 - self.ibs2

    @property
    def sum_sq(self):  # sum (g_i - g_j)^2 over valid pairs
        return self.ibs1 + 4 * self.ibs0

    @property
    def n1_het(self):  # loci where first sample is het (and pair valid)
        return self.hv

    @property
    def n2_het(self):
        return self.vh

    @property
    def either_het(self):
        return self.hv + self.vh - self.hh


def pair_counts(ws, chunk=None, pad_to: int = 128,
                checkpoint=None, checkpoint_every: int = 64,
                sample_block=None, verbose: bool = False,
                mesh=None, tile_devices=None,
                tile_rank=None) -> PairCounts:
    """Run the integer pairwise engine over a Workspace selection.

    Uses the reduced 4-gram basis (``_sym_grams4``). A triangular Pallas
    SYRK kernel was evaluated (git history) and measured slower end-to-end
    than XLA int4 matmuls at bench scale, so XLA runs the contraction.

    sample_block: compute counts in sample-row strips with device memory
    O(block x n) (``basis_gram_rows``) — auto-enabled once the 4-gram
    carries would exceed HBM (~19k samples). Checkpointing applies to
    both paths.

    mesh: multi-device. Without sample_block, routes to the
    chunk-data-parallel sharded engine (``sharded_pair_counts``); with
    sample_block (or past the HBM auto threshold), the row strips are
    column-sharded over every mesh device.

    tile_devices: force the super-tile engine with whole tiles scheduled
    round-robin over these jax devices (bit-exact; mutually exclusive
    with mesh=).

    tile_rank=(rank, world): compute only this rank's tile-row share of
    the super-tile grid into checkpoint= and return None (the
    zero-collective multi-host partition; see ops.tiles.grm_tiled).
    """
    n_pad = -(-ws.n_samp // pad_to) * pad_to
    if tile_devices is not None or tile_rank is not None:
        from .tiles import pair_counts_tiled

        # grid resolves inside pair_counts_tiled (devices/rank-aware
        # budget, sample-clamped group, chunk against the group; an
        # existing checkpoint grid meta is adopted so an assembly run
        # never wipes the ranks' tiles)
        return pair_counts_tiled(
            ws, chunk=chunk, checkpoint=checkpoint, verbose=verbose,
            mesh=mesh, devices=tile_devices, tile_rank=tile_rank)
    if checkpoint:
        # assembly/resume of an existing tile-GRID checkpoint (e.g.
        # after tile_rank rank runs): route to the tile engine, which
        # adopts the meta's grid — any other path here would see a
        # foreign meta and clobber the ranks' completed tiles
        from .tiles import pair_counts_tiled, probe_grid_meta

        if probe_grid_meta(checkpoint, 75, ws.n_snp,
                           ws.n_samp) is not None:
            return pair_counts_tiled(
                ws, chunk=chunk, checkpoint=checkpoint, verbose=verbose,
                mesh=mesh)
    if sample_block is None and 16.0 * n_pad * n_pad > 6e9:
        sample_block = 4096
    if mesh is not None and not sample_block:
        if checkpoint:
            # the sharded full-square engine has no resume protocol; honor
            # the checkpoint request via the (mesh-capable) row path
            sample_block = 4096
        else:
            from ..parallel.mesh import sharded_pair_counts

            return sharded_pair_counts(
                ws, mesh, chunk=chunk or auto_chunk(n_pad, ws.n_snp))
    if sample_block and ws.n_snp * (-(-ws.n_samp // 4)) > 2e9:
        # past the HBM slab-staging budget the row strips would re-stream
        # the dataset once per strip: use the bounded-traffic super-tile
        # engine instead (ops/tiles.py, bit-exact; mesh= column-shards
        # each tile scan). chunk stays None here so the tile engine can
        # resolve it against the GROUP (or adopt a rank run's meta) —
        # a cohort-resolved chunk would mismatch and wipe rank tiles
        from .tiles import pair_counts_tiled

        return pair_counts_tiled(
            ws, chunk=chunk, checkpoint=checkpoint, verbose=verbose,
            mesh=mesh)
    if chunk is None:
        chunk = auto_chunk(n_pad, ws.n_snp)
    if sample_block:
        n = ws.n_samp
        ndev = _mesh_row_tools(mesh)[0]
        sample_block = effective_sample_block(ws, sample_block,
                                              pad_to * ndev, 20)
        B = np.empty((5, n, n), np.int64)
        tck = TileCheckpointer(checkpoint, meta=(62, ws.n_snp, n,
                                                 int(sample_block)),
                               rows_axis=1)
        start_row = tck.load_rows(
            lambda r0, arr: B.__setitem__(
                (slice(None), slice(r0, r0 + arr.shape[1])), arr))
        for r0, nr, strip in basis_gram_rows(ws, sample_block=sample_block,
                                             chunk=chunk, pad_to=pad_to,
                                             start_row=start_row,
                                             verbose=verbose, mesh=mesh):
            B[:, r0:r0 + nr, :] = strip
            tck.save_tile(r0, strip)
        return PairCounts(*B)
    ck = Checkpointer(checkpoint, checkpoint_every,
                      meta=(62, ws.n_snp, ws.n_samp, chunk))
    step, saved = ck.load()
    # acc: host int64 accumulator the int32 carry flushes into every
    # count_flush_interval chunks — no SNP-count ceiling (the reference
    # refuses at 2^30, genKING.cpp:598-602). Checkpoints store 8 arrays
    # (acc + carry) once a flush has happened, 4 before.
    acc = None
    if saved and len(saved) == 8:
        acc = [np.asarray(a, np.int64) for a in saved[:4]]
        saved = saved[4:]
    carry = (tuple(jnp.asarray(a) for a in saved) if saved
             else _zeros4(n_pad))
    flush_every = count_flush_interval(chunk)
    for packed in _stream(ws, chunk, n_pad, start_chunk=step,
                          verbose=verbose, label="pair counts: "):
        carry = _gram4_step(carry, packed)
        step += 1
        if step % flush_every == 0:
            if acc is None:
                acc = [np.zeros((n_pad, n_pad), np.int64)
                       for _ in range(4)]
            for a, c in zip(acc, carry):
                a += np.asarray(c, np.int64)
            carry = _zeros4(n_pad)
        ck.maybe_save(step, lambda: ([*acc, *carry] if acc is not None
                                     else list(carry)))
    if acc is not None:
        carry = tuple(a + np.asarray(c, np.int64)
                      for a, c in zip(acc, carry))
    return PairCounts.from_grams4(carry, ws.n_samp)


@functools.partial(jax.jit, donate_argnums=0)
def _cross_gram_step(carry5, packed, qplanes):
    """(q x cohort) rectangular 5-gram update for one SNP chunk: the
    serving-path analog of _basis_strip_update, with the row operand a
    QUERY basis (3, q, Sc) instead of a strip of the same dataset."""
    b = genotype_basis(decode2bit(packed))  # (3, Sc, N)
    mmdt = _plane_mm_dtype()
    v, h, d = (x.astype(mmdt) for x in b)
    qv, qh, qd = (x.astype(mmdt) for x in qplanes)

    def mm(x, y):
        return jnp.matmul(x, y, preferred_element_type=jnp.int32)

    cvv, chh, cdd, chv, cvh = carry5
    return (cvv + mm(qv, v), chh + mm(qh, h), cdd + mm(qd, d),
            chv + mm(qh, v), cvh + mm(qv, h))


def cross_pair_counts(ws, query_geno, chunk=None, pad_to: int = 128,
                      verbose: bool = False, staged=None) -> PairCounts:
    """Integer pairwise counts for every (query sample x cohort sample)
    pair — the serving building block: relate NEW samples to a resident
    cohort in 5 rectangular int matmuls per chunk, O(q x n) memory and
    O(q x S) extra host->device traffic, never forming anything
    (n+q)-sized. query_geno: (q, ws.n_snp) dosages 0/1/2 with 3=missing,
    aligned to the workspace SNP selection (same snp.id order).

    Returns a PairCounts whose matrices are (q, n) rectangles; every
    counter property (ibs0/ibs2/sum_sq/n1_het/...) works elementwise, with
    the query sample as the FIRST index (the reference's pairwise counters
    are symmetric full-matrix only — this rectangular form has no
    counterpart there; estimator formulas follow genKING.cpp:634-638 /
    genIBS.cpp:231-243 unchanged).

    ``staged``: optional callable yielding DEVICE packed cohort chunks
    (from ``_stage_or_stream`` built with the same chunk/pad_to), letting a
    long-lived service pay the cohort host->device transfer once."""
    guard_count_snps(ws.n_snp, "cross pair counts")
    q_arr = np.asarray(query_geno)
    if q_arr.ndim != 2 or q_arr.shape[1] != ws.n_snp:
        raise ValueError(
            f"query_geno must be (q, {ws.n_snp}); got {q_arr.shape}")
    if q_arr.dtype.kind == "f":
        q_arr = np.where(np.isfinite(q_arr), q_arr, 3.0)
        if not np.array_equal(q_arr, np.round(q_arr)):
            raise ValueError(
                "query_geno has fractional dosages; hard-call to 0/1/2 "
                "(3/NaN = missing) first")
    q_arr = q_arr.astype(np.int64)
    # any code outside {0,1,2} (NaN, -1, 255, ...) is missing, the
    # create_geno convention (io/store.py)
    q_arr = np.where((q_arr < 0) | (q_arr > 2), 3, q_arr).astype(np.uint8)
    nq, S = q_arr.shape
    n_pad = -(-ws.n_samp // pad_to) * pad_to
    q_pad = -(-nq // 8) * 8
    if chunk is None:
        chunk = auto_chunk(n_pad, ws.n_snp)
    # query basis through the SAME [V,H,D] definition as the cohort side
    # (ops.decode.genotype_basis), transposed to (3, q, S); q is small
    qb = np.asarray(genotype_basis(jnp.asarray(q_arr.T, jnp.int8)))
    qbasis = np.zeros((3, q_pad, S), np.int8)
    qbasis[:, :nq, :] = qb.transpose(0, 2, 1)

    carry = tuple(jnp.zeros((q_pad, n_pad), jnp.int32) for _ in range(5))
    s0 = 0
    chunks = staged() if staged is not None else _stream(
        ws, chunk, n_pad, verbose=verbose, label="cross counts: ")
    for packed in chunks:
        sl = qbasis[:, :, s0:s0 + chunk]
        if sl.shape[2] < chunk:  # final chunk: pad with missing (all-zero)
            sl = np.concatenate(
                [sl, np.zeros((3, q_pad, chunk - sl.shape[2]), np.int8)],
                axis=2)
        carry = _cross_gram_step(carry, packed, jnp.asarray(sl))
        s0 += chunk
    base = [np.asarray(c)[:nq, :ws.n_samp].astype(np.int64) for c in carry]
    return PairCounts(*base)


# ---------------------------------------------------------------------------
# Floating (normalized dosage) engine


def make_pca_block(geno: jax.Array, bayesian: bool = False):
    """Eigenstrat-normalized block (genPCA.cpp:427-463): mean-impute,
    center by 2p, scale by 1/sqrt(p(1-p)); zero weight outside (0,1)."""
    fdt = _default_float_dtype()
    gsum, gnum, valid = chunk_snp_stats(geno)
    avg = jnp.where(gnum > 0, gsum.astype(fdt) / gnum.astype(fdt), 0.0)
    if bayesian:
        s = (gsum.astype(fdt) + 1.0) / (2.0 * gnum.astype(fdt) + 2.0)
        scale = 1.0 / jnp.sqrt(s * (1.0 - s))
    else:
        s = avg * 0.5
        scale = jnp.where((s > 0) & (s < 1),
                          1.0 / jnp.sqrt(s * (1.0 - s)), 0.0)
    x = (jnp.where(valid, geno.astype(fdt), avg[:, None]) - avg[:, None])
    x = x * scale[:, None]
    return x, (gsum, gnum, valid)


@functools.partial(jax.jit, donate_argnums=0, static_argnums=(2, 3))
def _pca_step(carry, packed, bayesian: bool, nblk: int):
    """carry: tuple of upper sample-block-triangle covariance blocks."""
    x, _ = make_pca_block(decode2bit(packed), bayesian)
    return _tree_add(carry, _sym_blocks(
        x, x, nblk, preferred_element_type=x.dtype,
        precision=norm_precision()))


@functools.partial(jax.jit, donate_argnums=0, static_argnums=2)
def _gcta_step(carry, packed, nblk: int):
    cov, vgram, nlocus = carry
    geno = decode2bit(packed)
    x, (gsum, gnum, valid) = make_pca_block(geno, False)
    poly = (gsum > 0) & (gsum < 2 * gnum)  # genPCA.cpp:1202-1224
    vp = (valid & poly[:, None]).astype(jnp.int8)
    cov = _tree_add(cov, _sym_blocks(
        x, x, nblk, preferred_element_type=x.dtype,
        precision=norm_precision()))
    vgram = _tree_add(vgram, _sym_blocks(
        vp, vp, nblk, preferred_element_type=jnp.int32))
    return cov, vgram, nlocus + poly.sum(dtype=jnp.int32)


def _stream(ws, chunk, n_pad, start_chunk: int = 0, verbose=False,
            label: str = ""):
    """Prefetched device chunks (host codec + transfer overlap compute),
    with optional percent/ETA progress lines (the CdProgression analog,
    dGenGWAS.cpp:1543-1640)."""
    from ..parallel.stream import device_chunks

    it = device_chunks(ws, chunk, n_pad, start_chunk=start_chunk)
    if not verbose:
        yield from it
        return
    from ..utils.progress import Progress

    total = max(1, -(-ws.n_snp // chunk) - start_chunk)
    pr = Progress(total, verbose=True, label=label)
    for x in it:
        yield x
        pr.forward()


class Checkpointer:
    """Per-chunk accumulator checkpoints for the streaming engines — the
    generalization of the reference's only resume mechanisms (LD-pruning
    autosave R/LD.R:225-230 and the GRM out-of-core protocol R/IBD.R:570-613)
    to every chunked accumulation: every ``every`` chunks the carry arrays
    are written atomically; on restart the stream resumes at the saved
    chunk index."""

    def __init__(self, path, every: int = 64, meta: tuple = ()):
        import os as _o

        self.path = path
        self.every = max(1, int(every))
        self.meta = np.asarray(meta, np.int64)
        self._os = _o

    def load(self):
        """Returns (start_chunk, carry arrays or None)."""
        if not self.path or not self._os.path.exists(self.path):
            return 0, None
        from ..utils.fastnpz import fast_npz_load

        z = fast_npz_load(self.path)
        if not np.array_equal(z["meta"], self.meta):
            return 0, None  # different selection/chunking: start over
        n = int(z["n"])
        return int(z["step"]), [z[f"a{i}"] for i in range(n)]

    def save(self, step: int, arrays):
        if not self.path:
            return
        tmp = self.path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, step=step, n=len(arrays), meta=self.meta,
                     **{f"a{i}": np.asarray(a) for i, a in enumerate(arrays)})
        self._os.replace(tmp, self.path)

    def maybe_save(self, step: int, arrays_fn):
        if self.path and step % self.every == 0:
            self.save(step, arrays_fn())


def _zeros_blocks(nblk, nb, dtype):
    return tuple(jnp.zeros((nb, nb), dtype)
                 for _ in range(nblk * (nblk + 1) // 2))


def pca_covariance(ws, bayesian: bool = False, chunk=None,
                   pad_to: int = 128, checkpoint=None,
                   checkpoint_every: int = 64,
                   verbose: bool = False) -> np.ndarray:
    """Exact-PCA genetic covariance (unscaled; CExactPCA::Run)."""
    n_pad, nblk = _pad_blocks(ws.n_samp, pad_to)
    if chunk is None:
        chunk = auto_chunk(n_pad, ws.n_snp)
    nb = n_pad // nblk
    fdt = _default_float_dtype()
    ck = Checkpointer(checkpoint, checkpoint_every,
                      meta=(21, ws.n_snp, ws.n_samp, chunk, int(bayesian),
                            nblk))
    step, saved = ck.load()
    cov = (tuple(jnp.asarray(a) for a in saved) if saved
           else _zeros_blocks(nblk, nb, fdt))
    for packed in _stream(ws, chunk, n_pad, start_chunk=step,
                          verbose=verbose, label="PCA covariance: "):
        cov = _pca_step(cov, packed, bayesian, nblk)
        step += 1
        ck.maybe_save(step, lambda: list(cov))
    full = _assemble_sym(np.stack([np.asarray(a) for a in cov]), nblk)
    return full[: ws.n_samp, : ws.n_samp].astype(np.float64)


def gcta_grm_parts(ws, chunk=None, pad_to: int = 128,
                   checkpoint=None, checkpoint_every: int = 64,
                   verbose: bool = False):
    """GCTA GRM numerator + per-pair denominators (CGCTA_AlgArith::Run):
    GRM = Cov / (2 * (nLocus - Denom)) with Denom = nLocus - VpVp^T."""
    guard_count_snps(ws.n_snp, "GCTA parts")
    n_pad, nblk = _pad_blocks(ws.n_samp, pad_to)
    if chunk is None:
        chunk = auto_chunk(n_pad, ws.n_snp)
    nb = n_pad // nblk
    nbl = nblk * (nblk + 1) // 2
    fdt = _default_float_dtype()
    ck = Checkpointer(checkpoint, checkpoint_every,
                      meta=(31, ws.n_snp, ws.n_samp, chunk, nblk))
    step, saved = ck.load()
    if saved:
        carry = (tuple(jnp.asarray(a) for a in saved[:nbl]),
                 tuple(jnp.asarray(a) for a in saved[nbl:2 * nbl]),
                 jnp.asarray(saved[2 * nbl]))
    else:
        carry = (_zeros_blocks(nblk, nb, fdt),
                 _zeros_blocks(nblk, nb, jnp.int32),
                 jnp.zeros((), jnp.int32))
    for packed in _stream(ws, chunk, n_pad, start_chunk=step,
                          verbose=verbose, label="GCTA GRM: "):
        carry = _gcta_step(carry, packed, nblk)
        step += 1
        ck.maybe_save(step, lambda: [*carry[0], *carry[1], carry[2]])
    cov, vgram, nlocus = carry
    n = ws.n_samp
    stk = lambda t: np.stack([np.asarray(a) for a in t])
    return (_assemble_sym(stk(cov), nblk)[:n, :n].astype(np.float64),
            _assemble_sym(stk(vgram), nblk)[:n, :n].astype(np.int64),
            int(nlocus))


# ---------------------------------------------------------------------------
# Row-tiled large-N engine: GRM rows [r0, r0+B) x all samples with device
# memory O(B * N) instead of O(N^2) — the accelerator analog of the
# reference's streamed GRM rows (grm_save_to_gds, genPCA.cpp:1571-1583).
# Lifts the single-chip sample ceiling from ~20k (HBM-resident n x n
# carries) to host-RAM scale; each row tile re-streams the SNP chunks
# (staged once in HBM when they fit).


@functools.partial(jax.jit, donate_argnums=0, static_argnums=3)
def _gcta_rows_step(carry, packed, row0, nrows: int):
    cov, vgr, nloc = carry
    geno = decode2bit(packed)
    x, (gsum, gnum, valid) = make_pca_block(geno, False)
    poly = (gsum > 0) & (gsum < 2 * gnum)
    vp = (valid & poly[:, None]).astype(jnp.int8)
    xa = lax.dynamic_slice_in_dim(x, row0, nrows, axis=1)
    vpa = lax.dynamic_slice_in_dim(vp, row0, nrows, axis=1)
    cov = cov + jnp.matmul(xa.T, x, preferred_element_type=x.dtype,
                           precision=norm_precision())
    vgr = vgr + jnp.matmul(vpa.T, vp, preferred_element_type=jnp.int32)
    return cov, vgr, nloc + poly.sum(dtype=jnp.int32)


@functools.partial(jax.jit, donate_argnums=0, static_argnums=(3, 4))
def _pca_rows_step(carry, packed, row0, nrows: int, bayesian: bool):
    x, _ = make_pca_block(decode2bit(packed), bayesian)
    xa = lax.dynamic_slice_in_dim(x, row0, nrows, axis=1)
    return carry + jnp.matmul(xa.T, x, preferred_element_type=x.dtype,
                              precision=norm_precision())


def _stage_or_stream(ws, chunk, n_pad, hbm_budget=2_000_000_000):
    """Returns a callable yielding device packed chunks; stages them all in
    HBM when they fit (so row tiles do not re-read + re-transfer)."""
    total = ws.n_snp * (n_pad // 4)
    if total <= hbm_budget:
        staged = [jnp.asarray(p) for p in _stream(ws, chunk, n_pad)]
        return lambda: staged
    return lambda: _stream(ws, chunk, n_pad)


class TileCheckpointer:
    """Per-tile checkpoints for the row-strip engines: one .npy per
    completed tile (O(tile) write each, O(n^2) total) plus a meta sidecar.
    Resume loads the contiguous completed prefix of tiles. The per-chunk
    ``Checkpointer`` covers the HBM-resident engines; this covers the
    row-tiled large-N paths."""

    def __init__(self, path, meta: tuple = (), rows_axis: int = 0):
        import os as _o

        self.path = path
        self.meta = np.asarray(meta, np.int64)
        self.rows_axis = rows_axis
        self._os = _o
        if path:
            mfn = path + ".meta.npy"
            if _o.path.exists(mfn) and not np.array_equal(
                    np.load(mfn), self.meta):
                # different run configuration: discard stale tiles
                for fn in self._tiles():
                    _o.remove(fn)
                _o.remove(mfn)
            if not _o.path.exists(mfn):
                self._atomic_save(mfn, self.meta)

    def _atomic_save(self, fn: str, arr) -> None:
        tmp = fn + ".tmp"
        with open(tmp, "wb") as f:
            np.save(f, np.asarray(arr))
        self._os.replace(tmp, fn)

    def _tile_fn(self, r0: int) -> str:
        return f"{self.path}.tile{r0:010d}.npy"

    def _tiles(self):
        import glob

        return sorted(glob.glob(glob.escape(self.path) + ".tile*.npy"))

    def load_rows(self, write_rows) -> int:
        """Load the contiguous completed prefix; ``write_rows(r0, arr)``
        stores each tile. Returns the resume start row."""
        if not self.path:
            return 0
        r0 = 0
        while self._os.path.exists(self._tile_fn(r0)):
            arr = np.load(self._tile_fn(r0))
            write_rows(r0, arr)
            r0 += arr.shape[self.rows_axis]
        return r0

    def save_tile(self, r0: int, arr) -> None:
        if self.path:
            self._atomic_save(self._tile_fn(r0), arr)


def effective_sample_block(ws, sample_block, pad_to: int,
                           bytes_per_cell: int) -> int:
    """The sample block a row-tiled engine will actually use: quantized to
    pad_to and capped by BOTH the padded cohort size and the HBM budget
    for the per-strip carries (bytes_per_cell bytes per block-row x padded
    sample). Checkpoint metas must record THIS value (not the requested
    one) — the effective block depends on pad_to, which scales with the
    mesh device count, so a resume under a different mesh/request must
    invalidate the tiles."""
    base = -(-ws.n_samp // pad_to) * pad_to
    if sample_block is None:
        sample_block = 4096
    hbm_rows = int(6e9) // max(1, bytes_per_cell * base)
    sample_block = min(int(sample_block), max(pad_to, hbm_rows), base)
    return -(-sample_block // pad_to) * pad_to


def resolve_row_chunk(ws, sample_block: int, chunk) -> int:
    """The SNP chunk a row-tiled engine will actually use for an
    already-effective sample_block. Float row-engine checkpoint metas must
    record this (the summation order depends on it, so a resume under a
    different chunk must invalidate the tiles)."""
    if chunk is not None:
        return int(chunk)
    n_pad = -(-ws.n_samp // sample_block) * sample_block
    return auto_chunk(max(n_pad, sample_block), ws.n_snp)


def _row_tile_setup(ws, sample_block, chunk, pad_to: int,
                    bytes_per_cell: int):
    """Shared preamble of the row-tiled engines: effective_sample_block,
    pad the sample axis to a block multiple (in-bounds dynamic_slice),
    resolve the chunk and build the chunk source."""
    sample_block = effective_sample_block(ws, sample_block, pad_to,
                                          bytes_per_cell)
    n_pad = -(-ws.n_samp // sample_block) * sample_block
    chunk = resolve_row_chunk(ws, sample_block, chunk)
    return sample_block, n_pad, chunk, _stage_or_stream(ws, chunk, n_pad)


def _mesh_row_tools(mesh):
    """Column-sharding helpers for the row-strip engines over a mesh:
    (device count, carry sharder, chunk-iterator wrapper). The (B, N)
    strip carries split their sample-column axis across EVERY mesh device
    (scalars stay replicated); chunk operands are replicated, so each
    device contracts its own sample shard locally with no collectives."""
    if mesh is None:
        return 1, (lambda c: c), (lambda chunks: chunks)
    from jax.sharding import NamedSharding, PartitionSpec as P

    ndev = 1
    for v in mesh.shape.values():
        ndev *= int(v)
    col = NamedSharding(mesh, P(None, tuple(mesh.axis_names)))
    rep = NamedSharding(mesh, P())

    def shard_carry(carry):
        return jax.tree.map(
            lambda a: jax.device_put(a, col) if a.ndim == 2 else a, carry)

    def wrap(chunks):
        src = chunks()
        if isinstance(src, list):
            # HBM-staged source: replicate once, not once per row tile
            staged = [jax.device_put(p, rep) for p in src]
            return lambda: staged

        def it():
            for p in chunks():
                yield jax.device_put(p, rep)
        return it

    return ndev, shard_carry, wrap


def gcta_parts_rows(ws, sample_block=None, chunk=None,
                    pad_to: int = 128, start_row: int = 0,
                    verbose: bool = False, mesh=None):
    """Row-tiled CGCTA_AlgArith: yields (row0, nrows, cov_rows, vgram_rows,
    nlocus) per sample tile. Use via models.grm for out-of-core GRMs beyond
    HBM-resident n x n. start_row resumes at a later tile (checkpointing).
    mesh= column-shards each strip over every mesh device."""
    guard_count_snps(ws.n_snp, "GCTA rows")
    ndev, shard_carry, wrap = _mesh_row_tools(mesh)
    sample_block, n_pad, chunk, chunks = _row_tile_setup(
        ws, sample_block, chunk, pad_to * ndev, bytes_per_cell=8)
    chunks = wrap(chunks)
    fdt = _default_float_dtype()
    n = ws.n_samp
    for r0 in range(start_row, n, sample_block):
        nr = min(sample_block, n - r0)
        carry = shard_carry((jnp.zeros((sample_block, n_pad), fdt),
                             jnp.zeros((sample_block, n_pad), jnp.int32),
                             jnp.zeros((), jnp.int32)))
        for packed in chunks():
            carry = _gcta_rows_step(carry, packed, r0, sample_block)
        cov, vgr, nloc = carry
        if verbose:
            print(f"GRM rows {r0 + nr}/{n}")
        yield (r0, nr, host_read(cov)[:nr, :n].astype(np.float64),
               host_read(vgr)[:nr, :n].astype(np.int64), int(nloc))


def _basis_row_operands(packed, row0, nrows: int):
    """Chunk -> ((3, B, S) row-strip basis, (3, N, S) full basis)."""
    b = genotype_basis(decode2bit(packed))  # (3, S, N)
    b = b.transpose(0, 2, 1).astype(_plane_mm_dtype())  # (3, N, S)
    br = lax.dynamic_slice_in_dim(b, row0, nrows, axis=1)
    return br, b


def _basis_strip_update(carry5, packed, row0, nrows: int):
    """5-tuple of (B, N) int32 reduced-basis gram row strips += one chunk:
    (vv, hh, dd, hv, vh) for rows i in [row0, row0+B). The transpose
    identity vh = hv^T is unavailable on a rectangular strip, so both het
    cross-grams are computed — 5 matmuls instead of the 9 a full joint
    count table would need. Shared by the pair-count and KING-homo row
    engines (call under jit)."""
    (vr, hr, dr), (v, h, d) = _basis_row_operands(packed, row0, nrows)

    def mm(x, y):
        return jnp.matmul(x, y.T, preferred_element_type=jnp.int32)

    cvv, chh, cdd, chv, cvh = carry5
    return (cvv + mm(vr, v), chh + mm(hr, h), cdd + mm(dr, d),
            chv + mm(hr, v), cvh + mm(vr, h))


@functools.partial(jax.jit, donate_argnums=0, static_argnums=3)
def _basis_rows_step(carry5, packed, row0, nrows: int):
    return _basis_strip_update(carry5, packed, row0, nrows)


def basis_gram_rows(ws, sample_block=None, chunk=None,
                    pad_to: int = 128, start_row: int = 0,
                    verbose: bool = False, mesh=None):
    """Row-tiled integer pairwise counts: yields (row0, nrows, B) with
    B (5, nrows, n) int64 — PairCounts base-matrix row strips with device
    memory O(block x n). The large-N analog of pair_counts (e.g. biobank
    KING screening). mesh= column-shards each strip over every mesh
    device."""
    ndev, shard_carry, wrap = _mesh_row_tools(mesh)
    sample_block, n_pad, chunk, chunks = _row_tile_setup(
        ws, sample_block, chunk, pad_to * ndev, bytes_per_cell=20)
    chunks = wrap(chunks)
    n = ws.n_samp
    flush_every = count_flush_interval(chunk)
    for r0 in range(start_row, n, sample_block):
        nr = min(sample_block, n - r0)
        zeros = lambda: shard_carry(
            tuple(jnp.zeros((sample_block, n_pad), jnp.int32)
                  for _ in range(5)))
        carry = zeros()
        acc = None  # int64 flush target (see pair_counts)
        for ci, packed in enumerate(chunks(), 1):
            carry = _basis_rows_step(carry, packed, r0, sample_block)
            if ci % flush_every == 0:
                if acc is None:
                    acc = [np.zeros((sample_block, n_pad), np.int64)
                           for _ in range(5)]
                for a, cb in zip(acc, carry):
                    a += host_read(cb).astype(np.int64)
                carry = zeros()
        if acc is not None:
            c = np.stack([(a + host_read(b).astype(np.int64))[:nr, :n]
                          for a, b in zip(acc, carry)])
        else:
            c = np.stack([host_read(b)[:nr, :n] for b in carry])
        if verbose:
            print(f"pairwise-count rows {r0 + nr}/{n}")
        yield r0, nr, c.astype(np.int64)


def pca_cov_rows(ws, sample_block=None, bayesian: bool = False,
                 chunk=None, pad_to: int = 128, start_row: int = 0,
                 verbose: bool = False, mesh=None):
    """Row-tiled exact-PCA covariance: yields (row0, nrows, cov_rows).
    mesh= column-shards each strip over every mesh device."""
    ndev, shard_carry, wrap = _mesh_row_tools(mesh)
    sample_block, n_pad, chunk, chunks = _row_tile_setup(
        ws, sample_block, chunk, pad_to * ndev, bytes_per_cell=4)
    chunks = wrap(chunks)
    fdt = _default_float_dtype()
    n = ws.n_samp
    for r0 in range(start_row, n, sample_block):
        nr = min(sample_block, n - r0)
        carry = shard_carry(jnp.zeros((sample_block, n_pad), fdt))
        for packed in chunks():
            carry = _pca_rows_step(carry, packed, r0, sample_block, bayesian)
        if verbose:
            print(f"covariance rows {r0 + nr}/{n}")
        yield r0, nr, host_read(carry)[:nr, :n].astype(np.float64)


@functools.partial(jax.jit, donate_argnums=0, static_argnums=3)
def _king_homo_rows_step(carry, packed, row0, nrows: int):
    """KING-homo row strips: 5 basis gram strips + AF-weighted validity
    strips."""
    grams, waf, waf2 = carry
    geno = decode2bit(packed)
    grams = _basis_strip_update(grams, packed, row0, nrows)
    fdt = waf.dtype
    gsum, gnum, valid = chunk_snp_stats(geno)
    pfreq = jnp.where(gnum > 0, 0.5 * gsum.astype(fdt) / gnum.astype(fdt),
                      0.0)
    w = pfreq * (1.0 - pfreq)
    v = valid.astype(fdt)
    vr = lax.dynamic_slice_in_dim(v, row0, nrows, axis=1)
    waf = waf + jnp.matmul((vr * w[:, None]).T, v,
                           preferred_element_type=fdt,
                           precision=MM_PRECISION)
    waf2 = waf2 + jnp.matmul((vr * (w * w)[:, None]).T, v,
                             preferred_element_type=fdt,
                             precision=MM_PRECISION)
    return grams, waf, waf2


def king_homo_rows(ws, sample_block=None, chunk=None, pad_to: int = 128,
                   mesh=None):
    """Row-tiled KING-homo parts: yields (row0, nrows, B(5,nr,n) basis
    strips, waf rows, waf2 rows) with device memory O(block x n).
    mesh= column-shards each strip over every mesh device."""
    guard_count_snps(ws.n_snp, "KING-homo rows")
    ndev, shard_carry, wrap = _mesh_row_tools(mesh)
    sample_block, n_pad, chunk, chunks = _row_tile_setup(
        ws, sample_block, chunk, pad_to * ndev, bytes_per_cell=28)
    chunks = wrap(chunks)
    fdt = _default_float_dtype()
    n = ws.n_samp
    for r0 in range(0, n, sample_block):
        nr = min(sample_block, n - r0)
        carry = shard_carry(
            (tuple(jnp.zeros((sample_block, n_pad), jnp.int32)
                   for _ in range(5)),
             jnp.zeros((sample_block, n_pad), fdt),
             jnp.zeros((sample_block, n_pad), fdt)))
        for packed in chunks():
            carry = _king_homo_rows_step(carry, packed, r0, sample_block)
        grams, waf, waf2 = carry
        c = np.stack([host_read(b)[:nr, :n] for b in grams])
        yield (r0, nr, c.astype(np.int64),
               host_read(waf)[:nr, :n].astype(np.float64),
               host_read(waf2)[:nr, :n].astype(np.float64))


@functools.partial(jax.jit, donate_argnums=0, static_argnums=3)
def _eigmix_rows_step(carry, packed, row0, nrows: int):
    """EIGMIX row strips: centered covariance + AF-weighted validity."""
    cov, wvg, hetcnt = carry
    fdt = cov.dtype
    geno = decode2bit(packed)
    gsum, gnum, valid = chunk_snp_stats(geno)
    avg = jnp.where(gnum > 0, gsum.astype(fdt) / gnum.astype(fdt), 0.0)
    x = jnp.where(valid, geno.astype(fdt), avg[:, None]) - avg[:, None]
    xr = lax.dynamic_slice_in_dim(x, row0, nrows, axis=1)
    cov = cov + jnp.matmul(xr.T, x, preferred_element_type=fdt,
                           precision=MM_PRECISION)
    af = 0.5 * avg
    d = 4.0 * af * (1.0 - af)
    v = valid.astype(fdt)
    vr = lax.dynamic_slice_in_dim(v, row0, nrows, axis=1)
    wvg = wvg + jnp.matmul((vr * d[:, None]).T, v,
                           preferred_element_type=fdt,
                           precision=MM_PRECISION)
    hetcnt = hetcnt + (geno == 1).sum(axis=0, dtype=jnp.int32)
    return cov, wvg, hetcnt


def eigmix_rows(ws, sample_block=None, chunk=None, pad_to: int = 128,
                mesh=None):
    """Row-tiled EIGMIX parts: yields (row0, nrows, cov rows, wvg rows,
    het counts). het is the full per-sample vector, identical on every
    yield (each tile streams all chunks). mesh= column-shards each strip
    over every mesh device."""
    guard_count_snps(ws.n_snp, "EIGMIX rows")
    ndev, shard_carry, wrap = _mesh_row_tools(mesh)
    sample_block, n_pad, chunk, chunks = _row_tile_setup(
        ws, sample_block, chunk, pad_to * ndev, bytes_per_cell=8)
    chunks = wrap(chunks)
    fdt = _default_float_dtype()
    n = ws.n_samp
    for r0 in range(0, n, sample_block):
        nr = min(sample_block, n - r0)
        carry = shard_carry((jnp.zeros((sample_block, n_pad), fdt),
                             jnp.zeros((sample_block, n_pad), fdt),
                             jnp.zeros((n_pad,), jnp.int32)))
        for packed in chunks():
            carry = _eigmix_rows_step(carry, packed, r0, sample_block)
        cov, wvg, het = carry
        yield (r0, nr, host_read(cov)[:nr, :n].astype(np.float64),
               host_read(wvg)[:nr, :n].astype(np.float64),
               host_read(het)[:n].astype(np.int64))


# ---------------------------------------------------------------------------
# KING-homo: plane grams + AF-weighted validity grams (genKING.cpp:58-266)


@functools.partial(jax.jit, donate_argnums=0, static_argnums=2)
def _king_homo_step(carry, packed, nblk: int):
    grams, waf, waf2 = carry
    fdt = waf[0].dtype
    geno = decode2bit(packed)
    grams = _tree_add(grams, _sym_grams4(genotype_basis(geno)))
    gsum, gnum, valid = chunk_snp_stats(geno)
    # p = 0.5*sum/num, 0 when num == 0 (genKING.cpp:246-251)
    p = jnp.where(gnum > 0, 0.5 * gsum.astype(fdt) / gnum.astype(fdt), 0.0)
    w = p * (1.0 - p)
    v = valid.astype(fdt)
    # Sum_s w_s v_i v_j is symmetric: block-triangular weighted grams
    waf = _tree_add(waf, _sym_blocks(v * w[:, None], v, nblk,
                                     preferred_element_type=fdt,
                                     precision=MM_PRECISION))
    waf2 = _tree_add(waf2, _sym_blocks(v * (w * w)[:, None], v, nblk,
                                       preferred_element_type=fdt,
                                       precision=MM_PRECISION))
    return grams, waf, waf2


def king_homo_counts(ws, chunk=None, pad_to: int = 128,
                     verbose: bool = False, sample_block=None, mesh=None,
                     tile_devices=None, tile_rank=None, checkpoint=None):
    """Returns (PairCounts, SumAFreq, SumAFreq2) for KING-homo. Past the
    HBM-resident carry ceiling (auto, ~16k samples) assembles from
    row strips (king_homo_rows). mesh= runs the row path with
    column-sharded strips. tile_devices= forces the super-tile engine
    with whole tiles scheduled over the given jax devices.
    tile_rank=(rank, world): this rank's tile rows into checkpoint=,
    returns None (multi-host partition, see ops.tiles.grm_tiled)."""
    guard_count_snps(ws.n_snp, "KING-homo counts")
    n_pad, nblk = _pad_blocks(ws.n_samp, pad_to)
    if tile_devices is not None or tile_rank is not None:
        from .tiles import king_homo_parts_tiled

        return king_homo_parts_tiled(ws, chunk=chunk, verbose=verbose,
                                     mesh=mesh, devices=tile_devices,
                                     tile_rank=tile_rank,
                                     checkpoint=checkpoint)
    if checkpoint:
        # existing tile-GRID checkpoint: assemble/resume on the tile
        # engine (adopts the meta's grid; see pair_counts)
        from .tiles import king_homo_parts_tiled, probe_grid_meta

        if probe_grid_meta(checkpoint, 77, ws.n_snp,
                           ws.n_samp) is not None:
            return king_homo_parts_tiled(ws, chunk=chunk,
                                         verbose=verbose, mesh=mesh,
                                         checkpoint=checkpoint)
    if sample_block is None and (mesh is not None
                                 or 24.0 * n_pad * n_pad > 6e9):
        sample_block = 4096
    if sample_block and ws.n_snp * (-(-ws.n_samp // 4)) > 2e9:
        # bounded-traffic super-tile route (see pair_counts)
        from .tiles import king_homo_parts_tiled

        return king_homo_parts_tiled(ws, chunk=chunk, verbose=verbose,
                                     mesh=mesh, checkpoint=checkpoint)
    if checkpoint is not None:
        import warnings

        warnings.warn("checkpoint= is honored on the super-tile routes "
                      "only; this KING-homo selection runs the "
                      "non-checkpointed in-HBM/row path", stacklevel=3)
    if sample_block:
        n = ws.n_samp
        B = np.empty((5, n, n), np.int64)
        waf = np.empty((n, n))
        waf2 = np.empty((n, n))
        for r0, nr, cs, w1, w2 in king_homo_rows(
                ws, sample_block=sample_block, chunk=chunk, pad_to=pad_to,
                mesh=mesh):
            B[:, r0:r0 + nr] = cs
            waf[r0:r0 + nr] = w1
            waf2[r0:r0 + nr] = w2
            if verbose:
                print(f"KING-homo rows {r0 + nr}/{n}")
        return PairCounts(*B), waf, waf2
    if chunk is None:
        chunk = auto_chunk(n_pad, ws.n_snp)
    nb = n_pad // nblk
    fdt = _default_float_dtype()
    carry = (_zeros4(n_pad),
             _zeros_blocks(nblk, nb, fdt),
             _zeros_blocks(nblk, nb, fdt))
    for packed in _stream(ws, chunk, n_pad, verbose=verbose,
                          label="KING-homo: "):
        carry = _king_homo_step(carry, packed, nblk)
    grams, waf, waf2 = carry
    n = ws.n_samp
    stk = lambda t: np.stack([np.asarray(a) for a in t])
    return (PairCounts.from_grams4(grams, n),
            _assemble_sym(stk(waf), nblk)[:n, :n].astype(np.float64),
            _assemble_sym(stk(waf2), nblk)[:n, :n].astype(np.float64))


# ---------------------------------------------------------------------------
# EIGMIX: centered (unscaled) covariance + AF-weighted validity gram +
# per-sample het counts (CEigMix_AlgArith::Run, genEIGMIX.cpp:43-157)


@functools.partial(jax.jit, donate_argnums=0, static_argnums=2)
def _eigmix_step(carry, packed, nblk: int):
    cov, wvg, hetcnt, afsum = carry
    fdt = cov[0].dtype
    geno = decode2bit(packed)
    gsum, gnum, valid = chunk_snp_stats(geno)
    avg = jnp.where(gnum > 0, gsum.astype(fdt) / gnum.astype(fdt), 0.0)
    x = jnp.where(valid, geno.astype(fdt), avg[:, None]) - avg[:, None]
    cov = _tree_add(cov, _sym_blocks(x, x, nblk,
                                     preferred_element_type=fdt,
                                     precision=MM_PRECISION))
    af = 0.5 * avg
    d = 4.0 * af * (1.0 - af)  # per-SNP denominator weight
    v = valid.astype(fdt)
    wvg = _tree_add(wvg, _sym_blocks(v * d[:, None], v, nblk,
                                     preferred_element_type=fdt,
                                     precision=MM_PRECISION))
    hetcnt = hetcnt + (geno == 1).sum(axis=0, dtype=jnp.int32)
    return cov, wvg, hetcnt, afsum + d.sum()


def eigmix_parts(ws, chunk=None, pad_to: int = 128,
                 verbose: bool = False, sample_block=None, mesh=None,
                 tile_devices=None, tile_rank=None, checkpoint=None):
    """Returns (num=XX^T, denom=(V.d)V^T weighted validity, het per
    sample). Past the HBM-resident carry ceiling (auto, or explicit
    sample_block=) assembles from row strips. mesh= runs the row path
    with column-sharded strips. tile_devices= forces the super-tile
    engine with whole tiles scheduled over the given jax devices.
    tile_rank=(rank, world): this rank's tile rows into checkpoint=,
    returns None (multi-host partition, see ops.tiles.grm_tiled)."""
    n_pad, nblk = _pad_blocks(ws.n_samp, pad_to)
    if tile_devices is not None or tile_rank is not None:
        from .tiles import eigmix_parts_tiled

        return eigmix_parts_tiled(ws, chunk=chunk, verbose=verbose,
                                  mesh=mesh, devices=tile_devices,
                                  tile_rank=tile_rank,
                                  checkpoint=checkpoint)
    if checkpoint:
        # existing tile-GRID checkpoint: assemble/resume on the tile
        # engine (adopts the meta's grid; see pair_counts)
        from .tiles import eigmix_parts_tiled, probe_grid_meta

        if probe_grid_meta(checkpoint, 76, ws.n_snp,
                           ws.n_samp) is not None:
            return eigmix_parts_tiled(ws, chunk=chunk, verbose=verbose,
                                      mesh=mesh, checkpoint=checkpoint)
    if sample_block is None and (mesh is not None
                                 or 5.0 * n_pad * n_pad > 6e9):
        sample_block = 4096
    if sample_block and ws.n_snp * (-(-ws.n_samp // 4)) > 2e9:
        # bounded-traffic super-tile route (see pair_counts)
        from .tiles import eigmix_parts_tiled

        return eigmix_parts_tiled(ws, chunk=chunk, verbose=verbose,
                                  mesh=mesh, checkpoint=checkpoint)
    if checkpoint is not None:
        import warnings

        warnings.warn("checkpoint= is honored on the super-tile routes "
                      "only; this EIGMIX selection runs the "
                      "non-checkpointed in-HBM/row path", stacklevel=3)
    if sample_block:
        n = ws.n_samp
        num = np.empty((n, n))
        wvg = np.empty((n, n))
        het = None
        for r0, nr, cs, wv, h in eigmix_rows(
                ws, sample_block=sample_block, chunk=chunk, pad_to=pad_to,
                mesh=mesh):
            num[r0:r0 + nr] = cs
            wvg[r0:r0 + nr] = wv
            het = h
            if verbose:
                print(f"EIGMIX rows {r0 + nr}/{n}")
        return num, wvg, het
    if chunk is None:
        chunk = auto_chunk(n_pad, ws.n_snp)
    nb = n_pad // nblk
    fdt = _default_float_dtype()
    carry = (_zeros_blocks(nblk, nb, fdt), _zeros_blocks(nblk, nb, fdt),
             jnp.zeros((n_pad,), jnp.int32), jnp.zeros((), fdt))
    for packed in _stream(ws, chunk, n_pad, verbose=verbose,
                          label="EIGMIX: "):
        carry = _eigmix_step(carry, packed, nblk)
    cov, wvg, hetcnt, _ = carry
    n = ws.n_samp
    stk = lambda t: np.stack([np.asarray(a) for a in t])
    return (_assemble_sym(stk(cov), nblk)[:n, :n].astype(np.float64),
            _assemble_sym(stk(wvg), nblk)[:n, :n].astype(np.float64),
            np.asarray(hetcnt)[:n].astype(np.int64))
