"""PCA extensions: SNP correlations, SNP loadings, sample-loading projection
(reference: R/PCA.R:100-303 + src/genPCA.cpp:809-1123), for both PCA and
EIGMIX objects (src/genEIGMIX.cpp:445-620).
"""

from __future__ import annotations

from dataclasses import dataclass
import numpy as np

from ..workspace import init_workspace
from ..ops.loadings import samp_loadings, snp_loadings, snp_pc_corr
from .pca import PCAResult
from .eigmix import EigMixResult


@dataclass
class PCACorrResult:
    sample_id: np.ndarray
    snp_id: np.ndarray
    snpcorr: np.ndarray  # (K, n_snp)


@dataclass
class PCASNPLoadingResult:
    sample_id: np.ndarray
    snp_id: np.ndarray
    eigenval: np.ndarray
    snploading: np.ndarray  # (K, n_snp)
    TraceXTX: float
    Bayesian: bool
    avgfreq: np.ndarray
    scale: np.ndarray


@dataclass
class EigMixSNPLoadingResult:
    sample_id: np.ndarray
    snp_id: np.ndarray
    eigenval: np.ndarray
    snploading: np.ndarray
    afreq: np.ndarray


def pca_corr(pcaobj, data, snp_id=None, eig_which=None, verbose=False,
             chunk=4096) -> PCACorrResult:
    """snpgdsPCACorr (R/PCA.R:100): correlation between eigenvectors and
    genotypes over ALL selected SNPs (no freq/chromosome filtering —
    uses .InitFile, not .InitFile2)."""
    if isinstance(pcaobj, (PCAResult, EigMixResult)):
        sampid, eigenvect = pcaobj.sample_id, pcaobj.eigenvect
    else:
        raise TypeError("pcaobj should be a PCAResult or EigMixResult")
    ws, _ = init_workspace(data, sample_id=sampid, snp_id=snp_id,
                           autosome_only=False, remove_monosnp=False)
    if eig_which is None:
        e = eigenvect
    else:
        e = eigenvect[:, np.asarray(eig_which) - 1]  # 1-based like R
    corr = snp_pc_corr(ws, np.asarray(e), chunk=chunk)
    return PCACorrResult(sampid, ws.snp_id, corr)


def pca_snp_loading(pcaobj, data, verbose=False, chunk=4096):
    """snpgdsPCASNPLoading (R/PCA.R:185)."""
    ws, _ = init_workspace(data, sample_id=pcaobj.sample_id,
                           snp_id=pcaobj.snp_id, autosome_only=False,
                           remove_monosnp=False)
    assert np.array_equal(ws.snp_id, pcaobj.snp_id)
    if isinstance(pcaobj, PCAResult):
        k = pcaobj.eigenvect.shape[1]
        n = ws.n_samp
        scale_f = (n - 1) / pcaobj.TraceXTX
        col_scale = np.sqrt(scale_f / pcaobj.eigenval[:k])
        eig_scaled = pcaobj.eigenvect * col_scale[None, :]
        load, avgfreq, scale = snp_loadings(ws, eig_scaled,
                                            bayesian=pcaobj.Bayesian,
                                            chunk=chunk)
        return PCASNPLoadingResult(pcaobj.sample_id, pcaobj.snp_id,
                                   pcaobj.eigenval, load, pcaobj.TraceXTX,
                                   pcaobj.Bayesian, avgfreq, scale)
    if isinstance(pcaobj, EigMixResult):
        if pcaobj.diagadj:
            raise ValueError("Please run snpgdsEIGMIX(, diagadj=FALSE) "
                             "for projecting new samples.")
        from ..ops.loadings import eigmix_snp_loadings
        k = pcaobj.eigenvect.shape[1]
        load = eigmix_snp_loadings(ws, pcaobj.eigenvect, pcaobj.afreq,
                                   chunk=chunk)
        return EigMixSNPLoadingResult(pcaobj.sample_id, pcaobj.snp_id,
                                      pcaobj.eigenval, load, pcaobj.afreq)
    raise TypeError("pcaobj should be a PCAResult or EigMixResult")


def pca_samp_loading(loadobj, data, sample_id=None, verbose=False,
                     chunk=4096):
    """snpgdsPCASampLoading (R/PCA.R:243): project (new) samples onto the
    SNP loadings."""
    ws, _ = init_workspace(data, sample_id=sample_id, snp_id=loadobj.snp_id,
                           autosome_only=False, remove_monosnp=False)
    eigcnt = loadobj.snploading.shape[0]
    if isinstance(loadobj, PCASNPLoadingResult):
        ss = (len(loadobj.sample_id) - 1) / loadobj.TraceXTX
        sqrt_eigval = np.sqrt(ss / loadobj.eigenval[:eigcnt])
        sload = loadobj.snploading * sqrt_eigval[:, None]
        mm = samp_loadings(ws, sload, loadobj.avgfreq, loadobj.scale,
                           chunk=chunk)
        n_new = ws.n_samp
        return PCAResult(ws.sample_id, loadobj.snp_id,
                         np.full(n_new, np.nan), mm, np.full(n_new, np.nan),
                         loadobj.TraceXTX, loadobj.Bayesian, None)
    if isinstance(loadobj, EigMixSNPLoadingResult):
        from ..ops.loadings import eigmix_samp_loadings
        sqrt_eigval = np.sqrt(1.0 / loadobj.eigenval[:eigcnt])
        sload = loadobj.snploading * sqrt_eigval[:, None]
        mm = eigmix_samp_loadings(ws, sload, loadobj.afreq, chunk=chunk)
        return EigMixResult(ws.sample_id, loadobj.snp_id,
                            np.full(ws.n_samp, np.nan), mm, loadobj.afreq,
                            None, False)
    raise TypeError("loadobj type not recognized")
