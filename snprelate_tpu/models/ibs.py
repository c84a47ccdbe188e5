"""Identity-by-state analyses (reference: R/IBS.R + src/genIBS.cpp).

IBS0/1/2 derive in closed form from the plane cross-grams:
  ibs2 = #equal genotypes, ibs0 = #opposite homozygotes,
  ibs1 = #valid - ibs0 - ibs2   (genIBS.cpp:231-243).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..workspace import init_workspace
from ..ops.pairwise import pair_counts


@dataclass
class IBSResult:
    sample_id: np.ndarray
    snp_id: np.ndarray
    ibs: np.ndarray


@dataclass
class IBSNumResult:
    sample_id: np.ndarray
    snp_id: np.ndarray
    ibs0: np.ndarray
    ibs1: np.ndarray
    ibs2: np.ndarray


def ibs(data, sample_id=None, snp_id=None, autosome_only=True,
        remove_monosnp=True, maf=math.nan, missing_rate=0.01,
        verbose=False, chunk=None, checkpoint=None,
        use_matrix=False, mesh=None, sample_block=None,
        tile_devices=None, tile_rank=None, num_thread=None) -> IBSResult:
    """snpgdsIBS (R/IBS.R:22): average IBS
    (0.5*IBS1 + IBS2) / (IBS0+IBS1+IBS2) per pair (genIBS.cpp:470-475).
    use_matrix packs the symmetric output (useMatrix=TRUE analog).
    tile_rank=(rank, world): rank run of the multi-host tile partition —
    writes this rank's tiles into checkpoint= and returns None;
    assemble with tile_rank=(0, 1) over the same checkpoint."""
    ws, _ = init_workspace(data, sample_id, snp_id, autosome_only,
                           remove_monosnp, maf, missing_rate, verbose=verbose)
    c = pair_counts(ws, chunk=chunk, checkpoint=checkpoint,
                    verbose=verbose, mesh=mesh, sample_block=sample_block,
                    tile_devices=tile_devices, tile_rank=tile_rank)
    if c is None:
        return None
    total = c.nvalid.astype(np.float64)
    with np.errstate(invalid="ignore"):
        avg = (0.5 * c.ibs1 + c.ibs2) / total
    from ..utils.packed import maybe_packed

    return IBSResult(ws.sample_id, ws.snp_id, maybe_packed(avg, use_matrix))


def ibs_num(data, sample_id=None, snp_id=None, autosome_only=True,
            remove_monosnp=True, maf=math.nan, missing_rate=0.01,
            verbose=False, chunk=None, checkpoint=None,
            mesh=None, sample_block=None,
            tile_devices=None, tile_rank=None,
            num_thread=None) -> IBSNumResult:
    """snpgdsIBSNum (R/IBS.R:50): raw IBS0/1/2 counts."""
    ws, _ = init_workspace(data, sample_id, snp_id, autosome_only,
                           remove_monosnp, maf, missing_rate, verbose=verbose)
    c = pair_counts(ws, chunk=chunk, checkpoint=checkpoint,
                    verbose=verbose, mesh=mesh, sample_block=sample_block,
                    tile_devices=tile_devices, tile_rank=tile_rank)
    if c is None:
        return None
    return IBSNumResult(ws.sample_id, ws.snp_id, c.ibs0, c.ibs1, c.ibs2)
