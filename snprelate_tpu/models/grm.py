"""Genetic relationship matrices (reference: R/IBD.R:543-615 snpgdsGRM +
src/genPCA.cpp:1614-1717 gnrGRM).

Methods:
  GCTA       — normalized covariance with per-pair missing denominators
               (CGCTA_AlgArith::Run, genPCA.cpp:1148-1237)
  Eigenstrat — exact-PCA covariance scaled by (n-1)/trace
               (genPCA.cpp:1636-1647)
  Corr       — GCTA rescaled to unit diagonal (genPCA.cpp:1658-1686)
  EIGMIX     — 2 x EigMix IBD matrix (genEIGMIX.cpp:645-652)
  IndivBeta  — Weir-Goudet beta transformed GRM (genBeta.cpp:263-357)
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import numpy as np

from ..workspace import init_workspace
from ..ops.pairwise import (gcta_grm_parts, gcta_parts_rows, pca_cov_rows,
                            pca_covariance)


@dataclass
class GRMResult:
    sample_id: np.ndarray
    snp_id: np.ndarray
    method: str
    grm: np.ndarray
    avg_val: float = None


def _gcta(ws, chunk, mesh=None, checkpoint=None, verbose=False):
    if mesh is not None:
        from ..parallel.mesh import sharded_gcta_parts

        cov, vgram, nlocus = sharded_gcta_parts(ws, mesh, chunk=chunk)
    else:
        cov, vgram, nlocus = gcta_grm_parts(ws, chunk=chunk,
                                            checkpoint=checkpoint,
                                            verbose=verbose)
    denom = 2.0 * vgram  # vgram = #both-valid at polymorphic loci
    with np.errstate(divide="ignore", invalid="ignore"):
        return cov / denom


def _auto_row_tiling(n: int, method: str, mesh) -> bool:
    """Large-N single-device GRMs switch to the row-tiled engine once the
    HBM-resident n x n carries (~2.5 n^2 words) would not fit on a 16 GB
    chip."""
    return (mesh is None and method in ("GCTA", "Eigenstrat")
            and 2.5 * 4 * float(n) * n > 6e9)


def grm(data, sample_id=None, snp_id=None, autosome_only=True,
        remove_monosnp=True, maf=math.nan, missing_rate=0.01,
        method="GCTA", out_fn=None, out_prec="double",
        out_compress="LZMA_RA", mesh=None, verbose=False,
        chunk=None, checkpoint=None, sample_block=None,
        use_matrix=False, tiles=None, tile_group=None,
        tile_devices=None, tile_rank=None, with_id=True,
        num_thread=None) -> GRMResult:
    """snpgdsGRM (R/IBD.R:543). With out_fn, also writes the
    SNPRELATE_OUTPUT GDS artifact for snpgdsMergeGRM. With checkpoint=path,
    the accumulators are saved every 64 chunks and a rerun resumes
    (generalized snpgdsLDpruning autosave / GRM out-of-core protocol).
    sample_block: compute the GRM in row tiles of this many samples (device
    memory O(block x n) — the large-cohort path, auto-enabled for GCTA/
    Eigenstrat when the n x n accumulators would exceed HBM).
    tiles/tile_group: the super-tile engine (ops/tiles.py) with bounded
    host->device traffic — auto-selected when the packed selection
    exceeds the HBM slab-staging budget; tiles=True/False forces.
    tile_devices: schedule WHOLE tiles round-robin over these jax
    devices (inter-chip tile-grid parallelism, zero collectives — the
    multi-host partition; mesh= instead column-shards each tile across
    every device). Implies tiles=True.
    tile_rank=(rank, world): multi-PROCESS/host partition — compute only
    this rank's weight-balanced tile-row subset into checkpoint=
    (required) and return None; ranks are fully independent processes
    (no jax.distributed, no collectives) sharing the checkpoint
    directory, and a final tile_rank=None run with the same arguments
    assembles the GRM from the completed tiles without recomputing.
    Composes with tile_devices=/mesh= within each rank. GCTA/Eigenstrat
    only (implies tiles=True)."""
    ws, _ = init_workspace(data, sample_id, snp_id, autosome_only,
                           remove_monosnp, maf, missing_rate, verbose=verbose)
    n = ws.n_samp
    if method == "Weighted":
        # "Weighted GCTA" is the EIGMIX-based GRM (R/IBD.R:552-556)
        method = "EIGMIX"
    if sample_block is None and _auto_row_tiling(n, method, mesh):
        sample_block = 4096
    if tile_devices is not None or tile_rank is not None:
        tiles = True
        if sample_block is None:
            sample_block = 4096  # any value: tile_group drives the size
    if tile_rank is not None and method not in ("GCTA", "Eigenstrat"):
        raise ValueError("tile_rank= needs the super-tile engine "
                         "(method GCTA or Eigenstrat)")
    if tiles is None and checkpoint is not None \
            and method in ("GCTA", "Eigenstrat"):
        # assembly/resume of a TILE-GRID checkpoint (e.g. after tile_rank
        # rank runs): detect the grid meta and route to the tile engine —
        # otherwise a small-cohort assembly run would take the row-strip
        # path, whose checkpointer sees a foreign meta and recomputes
        # everything (discarding the ranks' work). grm_tiled itself
        # adopts the meta's (group, chunk) via ops.tiles._resolve_grid.
        from ..ops.tiles import probe_grid_meta

        if probe_grid_meta(checkpoint, 71 if method == "GCTA" else 72,
                           ws.n_snp, n) is not None:
            tiles = True
            if sample_block is None:
                sample_block = 4096
    tile_capable = (sample_block is not None
                    and method in ("GCTA", "Eigenstrat"))
    auto_tiles = (tiles is not False
                  and ws.n_snp * (-(-n // 4)) > 2e9)
    if tile_capable and (tiles or auto_tiles):
        # super-tile path (ops/tiles.py): bounded host->device traffic
        # when the packed selection exceeds the 2 GB HBM staging budget
        # (the row-strip engine would re-stream the dataset per strip).
        # mesh= column-shards each tile scan over every device.
        from ..ops.tiles import grm_tiled

        mat = grm_tiled(ws, tile_group, method=method, chunk=chunk,
                        checkpoint=checkpoint, verbose=verbose,
                        mesh=mesh, devices=tile_devices,
                        tile_rank=tile_rank)
        if mat is None:  # rank run: tiles are in checkpoint=
            return None
    elif sample_block is not None and method in ("GCTA", "Eigenstrat"):
        # row-tiled large-N path; checkpoint= saves the completed GRM rows
        # after every tile and a rerun resumes at the first missing tile
        from ..ops.pairwise import (TileCheckpointer, _mesh_row_tools,
                                    effective_sample_block,
                                    resolve_row_chunk)

        mat = np.empty((n, n))
        tag = 41 if method == "GCTA" else 42
        ndev = _mesh_row_tools(mesh)[0]
        sample_block = effective_sample_block(
            ws, sample_block, 128 * ndev,
            8 if method == "GCTA" else 4)
        # meta records the RESOLVED chunk: float tiles accumulated under a
        # different chunk have a different summation order, so a resume
        # with a new chunk= must invalidate them
        chunk = resolve_row_chunk(ws, sample_block, chunk)
        tck = TileCheckpointer(checkpoint,
                               meta=(tag, ws.n_snp, n, int(sample_block),
                                     int(chunk)))
        start_row = tck.load_rows(
            lambda r0, arr: mat.__setitem__(
                slice(r0, r0 + arr.shape[0]), arr))
        if method == "GCTA":
            for r0, nr, cov, vgr, _nl in gcta_parts_rows(
                    ws, sample_block=sample_block, chunk=chunk,
                    start_row=start_row, verbose=verbose, mesh=mesh):
                with np.errstate(divide="ignore", invalid="ignore"):
                    mat[r0:r0 + nr] = cov / (2.0 * vgr)
                tck.save_tile(r0, mat[r0:r0 + nr])
        else:
            for r0, nr, cov in pca_cov_rows(ws, sample_block=sample_block,
                                            chunk=chunk,
                                            start_row=start_row,
                                            verbose=verbose, mesh=mesh):
                mat[r0:r0 + nr] = cov
                tck.save_tile(r0, mat[r0:r0 + nr])
            mat *= (n - 1) / float(np.trace(mat))
    elif method == "GCTA":
        mat = _gcta(ws, chunk, mesh, checkpoint, verbose)
    elif method == "Eigenstrat":
        if mesh is not None:
            from ..parallel.mesh import sharded_pca_covariance

            mat = sharded_pca_covariance(ws, mesh, chunk=chunk)
        else:
            mat = pca_covariance(ws, chunk=chunk, checkpoint=checkpoint,
                                 verbose=verbose)
        mat *= (n - 1) / float(np.trace(mat))
    elif method == "Corr":
        if sample_block is not None:
            # large-N: reuse whichever GCTA path applies (row strips or
            # super tiles), then rescale (genPCA.cpp:1658-1686)
            base = grm(data, sample_id=sample_id, snp_id=snp_id,
                       autosome_only=autosome_only,
                       remove_monosnp=remove_monosnp, maf=maf,
                       missing_rate=missing_rate, method="GCTA",
                       mesh=mesh, verbose=verbose, chunk=chunk,
                       checkpoint=checkpoint, sample_block=sample_block,
                       tiles=tiles, tile_group=tile_group)
            mat = base.grm
        else:
            mat = _gcta(ws, chunk, mesh, checkpoint, verbose)
        d = np.sqrt(np.diag(mat).copy())
        mat = mat / np.outer(d, d)
        np.fill_diagonal(mat, 1.0)
    elif method == "EIGMIX":
        from .eigmix import eigmix_ibd_matrix
        mat = 2.0 * eigmix_ibd_matrix(ws, chunk=chunk, verbose=verbose,
                                      sample_block=sample_block, mesh=mesh)
    elif method == "IndivBeta":
        from .beta import beta_grm_matrix
        mat, beta_avg = beta_grm_matrix(ws, chunk=chunk, verbose=verbose,
                                        sample_block=sample_block, mesh=mesh)
    else:
        raise ValueError("Invalid 'method'!")
    res = GRMResult(ws.sample_id, ws.snp_id, method, mat)
    if method == "IndivBeta":
        res.avg_val = beta_avg
    if out_fn is not None:
        save_grm(res, out_fn, avg_val=getattr(res, "avg_val", None),
                 prec=out_prec, compress=out_compress)
    if use_matrix:  # useMatrix=TRUE analog (R/IBD.R:546)
        from ..utils.packed import PackedSymmetric

        res.grm = PackedSymmetric.from_full(res.grm)
    if not with_id:  # with.id=FALSE (R/IBD.R:543): drop the id vectors
        res.sample_id = res.snp_id = None
    return res


def _stream_coder_name(compress: str) -> str:
    """out.compress argument -> streaming coder (the reference default is
    LZMA_RA, R/IBD.R:543; we emit single-stream LZMA for both LZMA
    variants — same reader surface, streaming-friendly)."""
    comp = (compress or "").upper()
    if comp.startswith("LZMA"):
        return "LZMA"
    if comp.startswith("ZIP_RA"):
        return "ZIP_RA"
    if comp.startswith("ZIP"):
        return "ZIP"
    if comp == "":
        return ""
    raise ValueError(f"unsupported out_compress {compress!r}")


def save_grm_rows(out_fn: str, sample_id, snp_id, method: str, row_blocks,
                  n: int, avg_val=None, prec="double", compress="LZMA_RA"):
    """Streamed snpgdsGRM(out.fn=) protocol (R/IBD.R:570-591): write the
    SNPRELATE_OUTPUT GDS file with command/sample.id/snp.id/grm(/avg_val)
    from an in-order (r0, rows) block iterator — output memory is
    O(row block), never O(n^2) (grm_save_to_gds streams rows the same
    way, genPCA.cpp:1571-1583)."""
    from ..io.gds import GDSStreamWriter, _folder_node, _vstr_data
    import struct as _struct

    coder = _stream_coder_name(compress)
    f4 = prec in ("single", "float32")
    dt = "<f4" if f4 else "<f8"

    sample_id = np.asarray(sample_id, object)
    snp_id = np.asarray(snp_id)
    children = [("command", 2, 0), ("sample.id", 4, 0), ("snp.id", 6, 0),
                ("grm", 8, 0)]
    if avg_val is not None:
        children.append(("avg_val", 10, 0))
    w = GDSStreamWriter(out_fn, entry_id=1)
    w.emit(1, _folder_node(children, {"FileFormat": "SNPRELATE_OUTPUT"}))
    w.emit_leaf(2, 3, "command", "dVStr8",
                _vstr_data(["snpgdsGRM", f":method = {method}"]), (2,),
                coder)
    w.emit_leaf(4, 5, "sample.id", "dVStr8", _vstr_data(sample_id),
                (len(sample_id),), coder)
    if np.issubdtype(snp_id.dtype, np.integer):
        w.emit_leaf(6, 7, "snp.id", "dInt32",
                    snp_id.astype("<i4").tobytes(), (len(snp_id),), coder)
    else:
        w.emit_leaf(6, 7, "snp.id", "dVStr8", _vstr_data(snp_id),
                    (len(snp_id),), coder)
    if avg_val is not None:
        w.emit_leaf(10, 11, "avg_val", "dFloat64",
                    _struct.pack("<d", avg_val), (1,), coder)

    expect = [0]

    def chunks():
        for r0, rows in row_blocks:
            if r0 != expect[0]:
                raise ValueError(f"row blocks out of order: got {r0}, "
                                 f"expected {expect[0]}")
            rows = np.asarray(rows)
            expect[0] += rows.shape[0]
            yield np.ascontiguousarray(rows, dt).tobytes()
        if expect[0] != n:
            raise ValueError(f"row blocks covered {expect[0]} of {n} rows")

    w.stream_leaf(8, 9, "dFloat32" if f4 else "dFloat64", (n, n), chunks(),
                  coder)
    w.close()


def save_grm(res: GRMResult, out_fn: str, avg_val=None, prec="double",
             compress="LZMA_RA"):
    """snpgdsGRM(out.fn=) protocol for an in-memory GRMResult — streams
    the matrix row-block-wise through ``save_grm_rows`` (the raw byte
    buffer and its single-shot compression are never materialized)."""
    n = res.grm.shape[0]
    blocks = ((r0, res.grm[r0: r0 + 4096]) for r0 in range(0, n, 4096))
    save_grm_rows(out_fn, res.sample_id, res.snp_id, res.method, blocks, n,
                  avg_val=avg_val, prec=prec, compress=compress)


def _load_tile(checkpoint: str, i: int, j: int):
    """Read one completed tile WITHOUT constructing a TileGridCheckpointer
    (whose meta-mismatch handling wipes grids — assembly must be
    read-only)."""
    import os as _o

    fn = f"{checkpoint}.tile{i:05d}_{j:05d}.npz"
    if not _o.path.exists(fn):
        return None
    from ..utils.fastnpz import fast_npz_load

    return fast_npz_load(fn)


def grm_tile_row_blocks(checkpoint: str, method: str, n: int, group: int,
                        dtype=np.float64):
    """In-order (r0, rows) GRM row blocks assembled from a completed
    super-tile grid checkpoint (ops.tiles.gcta_grm_tiles artifacts) in
    O(group x n) memory: row block i = [tile(j,i)^T for j < i] +
    [tile(i,j) for j >= i]. Eigenstrat tiles are raw covariance; the
    caller applies the (n-1)/trace scale (see grm_tiles_to_gds).
    dtype=np.float32 assembles in the tiles' native precision (half the
    block RAM/bandwidth — the right choice for a single-precision
    artifact)."""
    from ..native import transpose_into

    k = -(-n // group)
    for i in range(k):
        nr = min(group, n - i * group)
        rows = np.empty((nr, n), dtype)
        for j in range(k):
            saved = _load_tile(checkpoint, min(i, j), max(i, j))
            if saved is None:
                raise FileNotFoundError(
                    f"tile ({min(i, j)},{max(i, j)}) missing from "
                    f"{checkpoint} — run the rank/tile computation first")
            t = saved["grm"]
            c0 = j * group
            nc = min(group, n - c0)
            if j >= i:
                rows[:, c0: c0 + nc] = t[:nr, :nc]
            else:
                # t^T into the strided column view: cache-blocked native
                # transpose (numpy's strided copy is the assembly hot
                # spot at ~60 MB/s for 12k-wide tiles)
                src = t[:nc, :nr]
                if src.dtype != dtype:
                    src = np.ascontiguousarray(src, dtype)
                transpose_into(rows[:, c0: c0 + nc], src)
        yield i * group, rows


def grm_tiles_to_gds(checkpoint: str, out_fn: str, sample_id, snp_id,
                     method: str = "GCTA", prec="double",
                     compress="LZMA_RA", verbose: bool = False):
    """Assemble a completed super-tile GRM checkpoint straight into the
    SNPRELATE_OUTPUT GDS artifact WITHOUT densifying n x n (VERDICT r2
    #2): tiles stream through ``save_grm_rows`` in O(group x n) memory.
    This is the artifact step after ``grm(tile_rank=...)`` rank runs.
    Returns (n, k) for bookkeeping."""
    from ..ops.tiles import probe_grid_meta

    n = len(np.asarray(sample_id, object))
    n_snp = len(np.asarray(snp_id))
    tag = 71 if method == "GCTA" else 72
    got = probe_grid_meta(checkpoint, tag, n_snp, n)
    if got is None:
        raise ValueError(f"{checkpoint} holds no completed "
                         f"{method} tile grid for ({n_snp} SNPs, {n} "
                         "samples)")
    group, _chunk = got
    k = -(-n // group)

    scale = 1.0
    if method == "Eigenstrat":
        # (n-1)/trace needs the diagonal first: one cheap pass over the
        # k diagonal tiles
        tr = 0.0
        for i in range(k):
            saved = _load_tile(checkpoint, i, i)
            if saved is None:
                raise FileNotFoundError(f"diagonal tile ({i},{i}) missing")
            nr = min(group, n - i * group)
            tr += float(np.trace(saved["grm"][:nr, :nr]))
        scale = (n - 1) / tr

    dt = np.float32 if prec in ("single", "float32") else np.float64

    def blocks():
        for r0, rows in grm_tile_row_blocks(checkpoint, method, n, group,
                                            dtype=dt):
            if verbose:
                print(f"GRM artifact rows {r0 + rows.shape[0]}/{n}")
            yield r0, rows * dt(scale) if scale != 1.0 else rows

    save_grm_rows(out_fn, sample_id, snp_id, method, blocks(), n,
                  prec=prec, compress=compress)
    return n, k


def load_grm_rows(fn: str, block_rows: int = 4096):
    """Stream a SNPRELATE_OUTPUT GRM back as (r0, rows) blocks in bounded
    memory (the scale-viable read-back; ``load_grm`` densifies)."""
    from ..io.gds import read_leaf_rows

    yield from read_leaf_rows(fn, "grm", block_rows=block_rows)


def load_grm(fn: str):
    """Read a SNPRELATE_OUTPUT GRM file back into a GRMResult (+ avg_val)."""
    from ..io.gds import open_gds

    f = open_gds(fn)
    if f.root.attributes.get("FileFormat") != "SNPRELATE_OUTPUT":
        raise ValueError(f"'{fn}' is not valid.")
    cmd = f.index("command").read()
    if cmd[0] != "snpgdsGRM":
        raise ValueError("The file should be created by snpgdsGRM()")
    method = cmd[1].split("=", 1)[1].strip()
    res = GRMResult(
        sample_id=np.asarray(f.index("sample.id").read(), object),
        snp_id=np.asarray(f.index("snp.id").read()),
        method=method, grm=np.asarray(f.index("grm").read(), np.float64))
    avg_val = None
    if "avg_val" in f.root.children:
        avg_val = float(np.asarray(f.index("avg_val").read())[0])
    return res, avg_val


def merge_grm(filelist, out_fn=None, out_prec="double",
              out_compress="LZMA_RA", weight=None, verbose=False):
    """snpgdsMergeGRM (R/IBD.R:624-748): weighted merge of per-SNP-subset
    GRMs; IndivBeta uses the baseline re-centering of gnrGRMMerge
    (genPCA.cpp:1744-1832). out_prec/out_compress mirror the reference's
    out.prec ("double"/"single") and out.compress arguments.

    File inputs merging into a file stream row-block-wise in
    O(P x block x n) memory (the reference holds one full n x n target
    buffer, genPCA.cpp:1736-1742 — at biobank n neither that nor P
    densified parts fit; see ``_merge_grm_stream``)."""
    filelist = list(filelist)
    if out_fn is not None and all(
            isinstance(fn, (str, bytes, os.PathLike)) for fn in filelist):
        return _merge_grm_stream(filelist, out_fn, out_prec, out_compress,
                                 weight, verbose)
    parts = []
    avg_vals = []
    for fn in filelist:
        if isinstance(fn, str):
            r, av = load_grm(fn)
        else:
            r, av = fn, getattr(fn, "avg_val", None)
        parts.append(r)
        avg_vals.append(av)
    method = parts[0].method
    sampid = parts[0].sample_id
    n = len(sampid)
    for r in parts:
        if r.method != method or r.grm.shape != (n, n):
            raise ValueError("GRM files are not compatible.")

    weight = _merge_weights([len(r.snp_id) for r in parts], weight)
    snp_id = _merge_snp_ids([r.snp_id for r in parts], weight)

    if method == "IndivBeta":
        off = ~np.eye(n, dtype=bool)
        out = np.zeros((n, n))
        for r, av, wt in zip(parts, avg_vals, weight):
            m_b = r.grm[off].mean() * 0.5
            inv = 1.0 / (1.0 - m_b)
            m = (r.grm * 0.5 - m_b) * inv * (1 - av) + av
            diag = (np.diag(r.grm) - 1 - m_b) * inv * (1 - av) + av
            np.fill_diagonal(m, diag)
            out += m * wt
        avg = out[off].mean()
        mn = out.min()
        scale = 2.0 / (1.0 - mn)
        out = (out - mn) * scale
        np.fill_diagonal(out, np.diag(out) * 0.5 + 1.0)
        res = GRMResult(sampid, snp_id, method, out, avg_val=avg)
        if out_fn is not None:
            save_grm(res, out_fn, avg_val=avg, prec=out_prec,
                     compress=out_compress)
            return None
        return res

    out = np.zeros((n, n))
    for r, wt in zip(parts, weight):
        out += r.grm * wt
    res = GRMResult(sampid, snp_id, method, out)
    if out_fn is not None:
        save_grm(res, out_fn, prec=out_prec, compress=out_compress)
        return None
    return res


def _merge_weights(snp_counts, weight) -> np.ndarray:
    nums = np.asarray(snp_counts, float)
    if weight is None:
        return nums / nums.sum()
    if np.asarray(weight).dtype == bool:
        nums[~np.asarray(weight)] *= -1
        return nums / nums.sum()
    return np.asarray(weight, float)


def _merge_snp_ids(snp_id_lists, weight) -> np.ndarray:
    snp_id: list = []
    for sid, wt in zip(snp_id_lists, weight):
        if wt >= 0:
            snp_id.extend(np.asarray(sid).tolist())
        else:
            drop = set(np.asarray(sid).tolist())
            snp_id = [s for s in snp_id if s not in drop]
    return np.asarray(snp_id)


def _merge_grm_stream(filelist, out_fn, out_prec, out_compress, weight,
                      verbose, block_rows: int = 4096):
    """File->file snpgdsMergeGRM in O(P x block x n) memory: the parts
    stream through ``load_grm_rows`` in lockstep row blocks and the
    merged rows stream straight into ``save_grm_rows`` — no n x n buffer
    anywhere (the reference fills one full target matrix,
    genPCA.cpp:1736-1742, which cannot exist at biobank n). IndivBeta's
    baseline re-centering needs global statistics, so that method makes
    two extra metadata passes (per-part off-diagonal means; merged
    min/mean) before the writing pass — each still row-blocked."""
    from ..io.gds import open_gds

    paths = [os.fspath(fn) for fn in filelist]
    metas = []
    for fn in paths:
        f = open_gds(fn)
        if f.root.attributes.get("FileFormat") != "SNPRELATE_OUTPUT":
            raise ValueError(f"'{fn}' is not valid.")
        cmd = f.index("command").read()
        if cmd[0] != "snpgdsGRM":
            raise ValueError("The file should be created by snpgdsGRM()")
        method = cmd[1].split("=", 1)[1].strip()
        sampid = np.asarray(f.index("sample.id").read(), object)
        sid = np.asarray(f.index("snp.id").read())
        av = (float(np.asarray(f.index("avg_val").read())[0])
              if "avg_val" in f.root.children else None)
        metas.append((method, sampid, sid, av))
    method, sampid = metas[0][0], metas[0][1]
    n = len(sampid)
    for m, s, _, _ in metas:
        if m != method or len(s) != n:
            raise ValueError("GRM files are not compatible.")
    weight = _merge_weights([len(m[2]) for m in metas], weight)
    snp_id = _merge_snp_ids([m[2] for m in metas], weight)

    def lockstep():
        for pieces in zip(*(load_grm_rows(fn, block_rows)
                            for fn in paths)):
            r0 = pieces[0][0]
            assert all(p[0] == r0 for p in pieces)
            yield r0, [np.asarray(p[1], np.float64) for p in pieces]

    if method != "IndivBeta":
        def blocks():
            for r0, rows_list in lockstep():
                acc = np.zeros_like(rows_list[0])
                for rows, wt in zip(rows_list, weight):
                    acc += rows * wt
                if verbose:
                    print(f"merge rows {r0 + acc.shape[0]}/{n}")
                yield r0, acc
        save_grm_rows(out_fn, sampid, snp_id, method, blocks(), n,
                      prec=out_prec, compress=out_compress)
        return None

    # IndivBeta (gnrGRMMerge, genPCA.cpp:1744-1832): per-part baseline
    # m_b = mean of off-diagonal * 0.5, merged = sum wt * re-centered
    # part; then a global min-rescale
    tot = np.zeros(len(paths))
    dia = np.zeros(len(paths))
    for r0, rows_list in lockstep():
        for p, rows in enumerate(rows_list):
            tot[p] += rows.sum()
            dia[p] += np.trace(rows[:, r0: r0 + rows.shape[0]])
    m_bs = (tot - dia) / (n * n - n) * 0.5
    avs = np.asarray([m[3] for m in metas], float)

    def merged_blocks():
        for r0, rows_list in lockstep():
            acc = np.zeros_like(rows_list[0])
            nr = acc.shape[0]
            for rows, m_b, av, wt in zip(rows_list, m_bs, avs, weight):
                inv = 1.0 / (1.0 - m_b)
                m = (rows * 0.5 - m_b) * inv * (1 - av) + av
                d = np.arange(nr)
                dv = (rows[d, r0 + d] - 1 - m_b) * inv * (1 - av) + av
                m[d, r0 + d] = dv
                acc += m * wt
            yield r0, acc

    osum = 0.0
    mn = np.inf
    for r0, acc in merged_blocks():
        nr = acc.shape[0]
        mn = min(mn, float(acc.min()))
        osum += acc.sum() - np.trace(acc[:, r0: r0 + nr])
    avg = osum / (n * n - n)
    scale = 2.0 / (1.0 - mn)

    def final_blocks():
        for r0, acc in merged_blocks():
            nr = acc.shape[0]
            out = (acc - mn) * scale
            d = np.arange(nr)
            out[d, r0 + d] = out[d, r0 + d] * 0.5 + 1.0
            if verbose:
                print(f"merge rows {r0 + nr}/{n}")
            yield r0, out

    save_grm_rows(out_fn, sampid, snp_id, method, final_blocks(), n,
                  avg_val=avg, prec=out_prec, compress=out_compress)
    return None
