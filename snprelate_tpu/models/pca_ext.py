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
             chunk=None, outgds=None, mesh=None,
             with_id=True, num_thread=None) -> PCACorrResult:
    """snpgdsPCACorr (R/PCA.R:100): correlation between eigenvectors and
    genotypes over ALL selected SNPs (no freq/chromosome filtering —
    uses .InitFile, not .InitFile2). With outgds=path, writes the
    sample.id/snp.id/correlation (packedreal16) GDS artifact
    (R/PCA.R:151-163) instead of holding the matrix in the result."""
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
    corr = snp_pc_corr(ws, np.asarray(e), chunk=chunk, mesh=mesh)
    if outgds is not None:
        _write_corr_gds(outgds, sampid, ws.snp_id, corr)
    return PCACorrResult(sampid if with_id else None,
                         ws.snp_id if with_id else None, corr)


def _write_corr_gds(path, sample_id, snp_id, corr):
    """snpgdsPCACorr(outgds=): correlation as dPackedReal16, R dims
    (n_eig, n_snp) -> C-order (n_snp, n_eig), scale 0.0001, NaN -> -32768."""
    from ..io.gds import GDSWriter, _folder_node, _leaf_node, _vstr_data, _zip

    w = GDSWriter()
    root_id = w.reserve()
    children = []

    def leaf(name, classname, raw, dims, attrs=None):
        node_id = w.reserve()
        stored = _zip(raw)
        data_id = w.add_block(stored)
        w.set_block(node_id, _leaf_node(classname, dims, data_id,
                                        attrs or {}, "ZIP", len(raw),
                                        len(stored)))
        children.append((name, node_id, 0))

    leaf("sample.id", "dVStr8", _vstr_data(sample_id), (len(sample_id),))
    sid = np.asarray(snp_id)
    if np.issubdtype(sid.dtype, np.integer):
        leaf("snp.id", "dInt32", sid.astype("<i4").tobytes(), (len(sid),))
    else:
        leaf("snp.id", "dVStr8", _vstr_data(sid), (len(sid),))
    # stream per-SNP like the reference's appending writer (R dims
    # (n_eig, n_snp) = C-order (n_snp, n_eig)); corr is (n_eig, n_snp)
    c = np.ascontiguousarray(np.asarray(corr, np.float64).T)
    q = np.where(np.isnan(c), -32768,
                 np.clip(np.round(c / 0.0001), -32767, 32767)).astype("<i2")
    leaf("correlation", "dPackedReal16", q.tobytes(), c.shape,
         {"scale": 0.0001, "offset": 0.0})
    w.set_block(root_id, _folder_node(children, {}))
    w.write(path, entry_id=root_id)


def pca_snp_loading(pcaobj, data, verbose=False, chunk=None, mesh=None, num_thread=None):
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
                                            chunk=chunk, mesh=mesh)
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
                                   chunk=chunk, mesh=mesh)
        return EigMixSNPLoadingResult(pcaobj.sample_id, pcaobj.snp_id,
                                      pcaobj.eigenval, load, pcaobj.afreq)
    raise TypeError("pcaobj should be a PCAResult or EigMixResult")


def pca_samp_loading(loadobj, data, sample_id=None, verbose=False,
                     chunk=None, mesh=None, num_thread=None):
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
                           chunk=chunk, mesh=mesh)
        n_new = ws.n_samp
        return PCAResult(ws.sample_id, loadobj.snp_id,
                         np.full(n_new, np.nan), mm, np.full(n_new, np.nan),
                         loadobj.TraceXTX, loadobj.Bayesian, None)
    if isinstance(loadobj, EigMixSNPLoadingResult):
        from ..ops.loadings import eigmix_samp_loadings
        sqrt_eigval = np.sqrt(1.0 / loadobj.eigenval[:eigcnt])
        sload = loadobj.snploading * sqrt_eigval[:, None]
        mm = eigmix_samp_loadings(ws, sload, loadobj.afreq, chunk=chunk,
                                  mesh=mesh)
        return EigMixResult(ws.sample_id, loadobj.snp_id,
                            np.full(ws.n_samp, np.nan), mm, loadobj.afreq,
                            None, False)
    raise TypeError("loadobj type not recognized")
