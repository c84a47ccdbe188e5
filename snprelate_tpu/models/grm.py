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


def save_grm(res: GRMResult, out_fn: str, avg_val=None, prec="double",
             compress="LZMA_RA"):
    """snpgdsGRM(out.fn=) protocol (R/IBD.R:570-591): write a
    SNPRELATE_OUTPUT GDS file with command/sample.id/snp.id/grm(/avg_val).
    compress: "LZMA_RA"/"LZMA" (xz), "ZIP"/"ZIP_RA" (deflate) or "" — the
    reference's out.compress default is LZMA_RA (R/IBD.R:543)."""
    from ..io.gds import (GDSWriter, _folder_node, _leaf_node, _vstr_data,
                          _zip, _zip_ra)
    import lzma as _lzma
    import struct as _struct

    comp = (compress or "").upper()
    if comp.startswith("LZMA"):
        coder, packer = "LZMA", _lzma.compress
    elif comp.startswith("ZIP_RA"):
        coder, packer = "ZIP_RA", _zip_ra
    elif comp.startswith("ZIP"):
        coder, packer = "ZIP", _zip
    elif comp == "":
        coder, packer = "", bytes
    else:
        raise ValueError(f"unsupported out_compress {compress!r}")

    w = GDSWriter()
    root_id = w.reserve()
    children = []

    def leaf(name, classname, raw, dims):
        node_id = w.reserve()
        stored = packer(raw)
        data_id = w.add_block(stored)
        w.set_block(node_id, _leaf_node(classname, dims, data_id, {}, coder,
                                        len(raw), len(stored)))
        children.append((name, node_id, 0))

    cmd = ["snpgdsGRM", f":method = {res.method}"]
    leaf("command", "dVStr8", _vstr_data(cmd), (2,))
    leaf("sample.id", "dVStr8", _vstr_data(res.sample_id),
         (len(res.sample_id),))
    snp_id = np.asarray(res.snp_id)
    if np.issubdtype(snp_id.dtype, np.integer):
        leaf("snp.id", "dInt32", snp_id.astype("<i4").tobytes(),
             (len(snp_id),))
    else:
        leaf("snp.id", "dVStr8", _vstr_data(snp_id), (len(snp_id),))
    n = res.grm.shape[0]
    if prec in ("single", "float32"):
        leaf("grm", "dFloat32", np.asarray(res.grm, "<f4").tobytes(), (n, n))
    else:
        leaf("grm", "dFloat64", np.asarray(res.grm, "<f8").tobytes(), (n, n))
    if avg_val is not None:
        leaf("avg_val", "dFloat64", _struct.pack("<d", avg_val), (1,))
    w.set_block(root_id, _folder_node(children,
                                      {"FileFormat": "SNPRELATE_OUTPUT"}))
    w.write(out_fn, entry_id=root_id)


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
    out.prec ("double"/"single") and out.compress arguments."""
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

    nums = np.array([len(r.snp_id) for r in parts], float)
    if weight is None:
        weight = nums / nums.sum()
    elif np.asarray(weight).dtype == bool:
        nums[~np.asarray(weight)] *= -1
        weight = nums / nums.sum()
    weight = np.asarray(weight, float)

    snp_id = []
    for r, wt in zip(parts, weight):
        if wt >= 0:
            snp_id.extend(np.asarray(r.snp_id).tolist())
        else:
            drop = set(np.asarray(r.snp_id).tolist())
            snp_id = [s for s in snp_id if s not in drop]
    snp_id = np.asarray(snp_id)

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
