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
from ..ops.pairwise import gcta_grm_parts, pca_covariance


@dataclass
class GRMResult:
    sample_id: np.ndarray
    snp_id: np.ndarray
    method: str
    grm: np.ndarray


def _gcta(ws, chunk):
    cov, vgram, nlocus = gcta_grm_parts(ws, chunk=chunk)
    denom = 2.0 * vgram  # vgram = #both-valid at polymorphic loci
    with np.errstate(divide="ignore", invalid="ignore"):
        return cov / denom


def grm(data, sample_id=None, snp_id=None, autosome_only=True,
        remove_monosnp=True, maf=math.nan, missing_rate=math.nan,
        method="GCTA", verbose=False, chunk=2048) -> GRMResult:
    """snpgdsGRM (R/IBD.R:543)."""
    ws, _ = init_workspace(data, sample_id, snp_id, autosome_only,
                           remove_monosnp, maf, missing_rate, verbose=verbose)
    n = ws.n_samp
    if method == "GCTA":
        mat = _gcta(ws, chunk)
    elif method == "Eigenstrat":
        mat = pca_covariance(ws, chunk=chunk)
        mat *= (n - 1) / float(np.trace(mat))
    elif method == "Corr":
        mat = _gcta(ws, chunk)
        d = np.sqrt(np.diag(mat).copy())
        mat = mat / np.outer(d, d)
        np.fill_diagonal(mat, 1.0)
    elif method == "EIGMIX":
        from .eigmix import eigmix_ibd_matrix
        mat = 2.0 * eigmix_ibd_matrix(ws, chunk=chunk)
    elif method == "IndivBeta":
        from .beta import beta_grm_matrix
        mat = beta_grm_matrix(ws, chunk=chunk)
    else:
        raise ValueError("Invalid 'method'!")
    return GRMResult(ws.sample_id, ws.snp_id, method, mat)
