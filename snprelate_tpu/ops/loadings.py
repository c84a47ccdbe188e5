"""Chunked matmul kernels for PCA/EIGMIX correlations, SNP loadings and
sample-loading projection (reference: src/genPCA.cpp:809-1123,
src/genEIGMIX.cpp:445-620).

Each reference per-SNP scalar loop becomes one (S,N)x(N,K) MXU matmul per
chunk; per-SNP outputs are assembled on the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .decode import decode2bit
from .pairwise import (norm_precision, _default_float_dtype, _stream,
                       chunk_snp_stats)


@jax.jit
def _corr_step(packed, eig):
    """Pairwise-complete Pearson correlation of each SNP against each
    eigenvector (SNP_PC_Corr, genPCA.cpp:820-842). eig: (N, K)."""
    fdt = eig.dtype
    geno = decode2bit(packed)
    gsum, gnum, valid = chunk_snp_stats(geno)
    gz = jnp.where(valid, geno, 0).astype(fdt)
    v = valid.astype(fdt)
    m = gnum.astype(fdt)[:, None]
    xy = jnp.matmul(gz, eig, preferred_element_type=fdt,
                      precision=norm_precision())
    x = jnp.matmul(v, eig, preferred_element_type=fdt,
                      precision=norm_precision())
    xx = jnp.matmul(v, eig * eig, preferred_element_type=fdt,
                      precision=norm_precision())
    y = gsum.astype(fdt)[:, None]
    yy = (gz * gz).sum(axis=1, keepdims=True)
    c1 = xx - x * x / m
    c2 = yy - y * y / m
    val = c1 * c2
    corr = jnp.where((m > 1) & (val > 0),
                     (xy - x * y / m) / jnp.sqrt(jnp.where(val > 0, val, 1.0)),
                     jnp.nan)
    return corr  # (S, K)


def snp_pc_corr(ws, eigenvect: np.ndarray, chunk: int = 4096) -> np.ndarray:
    """(K, n_snp) correlations, NaN where undefined."""
    fdt = _default_float_dtype()
    n_pad = -(-ws.n_samp // 128) * 128
    e = np.zeros((n_pad, eigenvect.shape[1]), np.float64)
    e[: ws.n_samp] = eigenvect
    e = jnp.asarray(e, fdt)
    out = np.empty((ws.n_snp, eigenvect.shape[1]))
    start = 0
    for packed in _stream(ws, chunk, n_pad):
        c = np.asarray(_corr_step(packed, e))
        take = min(chunk, ws.n_snp - start)
        out[start : start + take] = c[:take]
        start += take
    return out.T


@functools.partial(jax.jit, static_argnums=2)
def _snp_loading_step(packed, eig_scaled, bayesian: bool):
    """SNP loadings: normalized genotype block times scaled eigenvectors
    (CPCA_SNPLoad::thread_loading, genPCA.cpp:952-997)."""
    fdt = eig_scaled.dtype
    geno = decode2bit(packed)
    gsum, gnum, valid = chunk_snp_stats(geno)
    avg = jnp.where(gnum > 0, gsum.astype(fdt) / gnum.astype(fdt), 0.0)
    if bayesian:
        s = (gsum.astype(fdt) + 1.0) / (2.0 * gnum.astype(fdt) + 2.0)
        scale = jnp.where(gnum > 0, 1.0 / jnp.sqrt(s * (1.0 - s)), 0.0)
    else:
        s = avg * 0.5
        scale = jnp.where((s > 0) & (s < 1), 1.0 / jnp.sqrt(s * (1 - s)), 0.0)
    x = jnp.where(valid, (geno.astype(fdt) - avg[:, None]) * scale[:, None],
                  0.0)
    load = jnp.matmul(x, eig_scaled, preferred_element_type=fdt,
                      precision=norm_precision())
    return load, avg, scale


def snp_loadings(ws, eig_scaled: np.ndarray, bayesian: bool = False,
                 chunk: int = 4096):
    """Returns (snploading (K, n_snp), avgfreq, scale)."""
    fdt = _default_float_dtype()
    n_pad = -(-ws.n_samp // 128) * 128
    e = np.zeros((n_pad, eig_scaled.shape[1]), np.float64)
    e[: ws.n_samp] = eig_scaled
    e = jnp.asarray(e, fdt)
    k = eig_scaled.shape[1]
    load = np.empty((ws.n_snp, k))
    avgfreq = np.empty(ws.n_snp)
    scale = np.empty(ws.n_snp)
    start = 0
    for packed in _stream(ws, chunk, n_pad):
        lo, av, sc = _snp_loading_step(packed, e, bayesian)
        take = min(chunk, ws.n_snp - start)
        load[start : start + take] = np.asarray(lo)[:take]
        avgfreq[start : start + take] = np.asarray(av)[:take]
        scale[start : start + take] = np.asarray(sc)[:take]
        start += take
    return load.T, avgfreq, scale


@functools.partial(jax.jit, donate_argnums=0)
def _samp_loading_step(carry, packed, sload, avgfreq, scale):
    """Project new samples onto scaled SNP loadings
    (CPCA_SampleLoad::thread_loading, genPCA.cpp:1060-1080).
    sload: (S, K); avgfreq/scale: (S,)."""
    fdt = carry.dtype
    geno = decode2bit(packed)
    valid = geno < 3
    x = jnp.where(valid, (geno.astype(fdt) - avgfreq[:, None]) * scale[:, None],
                  0.0)  # (S, N)
    return carry + jnp.matmul(x.T, sload, preferred_element_type=fdt,
                      precision=norm_precision())


def samp_loadings(ws, sload_scaled: np.ndarray, avgfreq: np.ndarray,
                  scale: np.ndarray, chunk: int = 4096) -> np.ndarray:
    """(n_samp, K) projected eigenvectors. sload_scaled: (K, n_snp)."""
    fdt = _default_float_dtype()
    n_pad = -(-ws.n_samp // 128) * 128
    k = sload_scaled.shape[0]
    carry = jnp.zeros((n_pad, k), fdt)
    start = 0
    for packed in _stream(ws, chunk, n_pad):
        s = slice(start, start + chunk)
        sl = np.zeros((chunk, k))
        af = np.zeros(chunk)
        sc = np.zeros(chunk)
        take = min(chunk, ws.n_snp - start)
        sl[:take] = sload_scaled.T[s]
        af[:take] = avgfreq[s]
        sc[:take] = scale[s]
        carry = _samp_loading_step(carry, packed, jnp.asarray(sl, fdt),
                                   jnp.asarray(af, fdt), jnp.asarray(sc, fdt))
        start += chunk
    return np.asarray(carry)[: ws.n_samp].astype(np.float64)


@jax.jit
def _snp_loading_provided_step(packed, eig, avg2p, scale):
    """SNP loadings with externally provided center/scale per SNP
    (CEigMix_SNPLoad::thread_loading, genEIGMIX.cpp:456-479)."""
    fdt = eig.dtype
    geno = decode2bit(packed)
    valid = geno < 3
    x = jnp.where(valid, (geno.astype(fdt) - avg2p[:, None]) * scale[:, None],
                  0.0)
    return jnp.matmul(x, eig, preferred_element_type=fdt,
                      precision=norm_precision())


def eigmix_snp_loadings(ws, eigenvect: np.ndarray, afreq: np.ndarray,
                        chunk: int = 4096) -> np.ndarray:
    """(K, n_snp) EIGMIX SNP loadings: centered by 2p, uniform scale
    1/sqrt(sum 4p(1-p)) (genEIGMIX.cpp:502-509)."""
    fdt = _default_float_dtype()
    n_pad = -(-ws.n_samp // 128) * 128
    e = np.zeros((n_pad, eigenvect.shape[1]), np.float64)
    e[: ws.n_samp] = eigenvect
    e = jnp.asarray(e, fdt)
    afscale = 1.0 / np.sqrt(np.sum(4.0 * afreq * (1.0 - afreq)))
    out = np.empty((ws.n_snp, eigenvect.shape[1]))
    start = 0
    for packed in _stream(ws, chunk, n_pad):
        take = min(chunk, ws.n_snp - start)
        a2p = np.zeros(chunk)
        a2p[:take] = 2.0 * afreq[start : start + take]
        sc = np.full(chunk, afscale)
        lo = _snp_loading_provided_step(packed, e, jnp.asarray(a2p, fdt),
                                        jnp.asarray(sc, fdt))
        out[start : start + take] = np.asarray(lo)[:take]
        start += chunk
    return out.T


def eigmix_samp_loadings(ws, sload_scaled: np.ndarray, afreq: np.ndarray,
                         chunk: int = 4096) -> np.ndarray:
    """Project samples with EIGMIX normalization (genEIGMIX.cpp:535-620)."""
    afscale = 1.0 / np.sqrt(np.sum(4.0 * afreq * (1.0 - afreq)))
    return samp_loadings(ws, sload_scaled, 2.0 * afreq,
                         np.full(len(afreq), afscale), chunk=chunk)
