"""Randomized PCA (reference: CRandomPCA, src/genPCA.cpp:472-803 — the
FastPCA/Galinsky randomized subspace iteration), re-designed as chunked MXU
matmuls:

  Y: (nSNP x nSamp) normalized genotypes, scale 1/sqrt(2p(1-p)), missing->0
  H_i = Y @ G_i;  G_{i+1} = Y^T @ H_i / nSNP        (power iterations)
  H = [H_0 .. H_I];  U_H = orth basis of span(H)    (SVD)
  T = U_H^T @ Y;  eigenvectors = right singular vectors of T

This is also the scalable path for 100k+ samples where the dense n x n
covariance eigendecomposition is infeasible (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.decode import decode2bit
from ..ops.pairwise import (norm_precision, _default_float_dtype, _stream,
                            chunk_snp_stats)


@jax.jit
def _rand_block(packed):
    """Normalized block Y (S, N) with randomized-PCA scaling
    (thread_lookup_y, genPCA.cpp:501-528) + per-chunk trace contribution."""
    fdt = _default_float_dtype()
    geno = decode2bit(packed)
    gsum, gnum, valid = chunk_snp_stats(geno)
    avg = jnp.where(gnum > 0, gsum.astype(fdt) / gnum.astype(fdt), 0.0)
    p = avg * 0.5
    s = jnp.where((p > 0) & (p < 1),
                  1.0 / jnp.sqrt(2.0 * p * (1.0 - p)), 0.0)
    y = jnp.where(valid, (geno.astype(fdt) - avg[:, None]) * s[:, None], 0.0)
    trace = (y * y).sum()
    return y, trace


@jax.jit
def _h_step(packed, g_mat):
    y, trace = _rand_block(packed)
    return jnp.matmul(y, g_mat, preferred_element_type=y.dtype,
                      precision=norm_precision()), trace


@functools.partial(jax.jit, donate_argnums=0)
def _g_step(g_next, packed, h_block):
    y, _ = _rand_block(packed)
    return g_next + jnp.matmul(y.T, h_block, preferred_element_type=y.dtype,
                      precision=norm_precision())


@functools.partial(jax.jit, donate_argnums=0)
def _t_step(t_acc, packed, uh_block):
    y, _ = _rand_block(packed)
    return t_acc + jnp.matmul(uh_block.T, y, preferred_element_type=y.dtype,
                      precision=norm_precision())


def randomized_pca(ws, eigen_cnt=16, aux_dim=None, iter_num=10, seed=None,
                   chunk=4096):
    from .pca import PCAResult

    n, m = ws.n_samp, ws.n_snp
    if aux_dim is None:
        aux_dim = 2 * eigen_cnt
    hsize = aux_dim * (iter_num + 1)
    fdt = _default_float_dtype()
    n_pad = -(-n // 128) * 128

    rng = np.random.default_rng(seed)
    g_mat = np.zeros((n_pad, aux_dim))
    g_mat[:n] = rng.standard_normal((n, aux_dim))
    g_mat = jnp.asarray(g_mat, fdt)

    H = np.empty((m, hsize))
    trace_xtx = 0.0
    for it in range(iter_num + 1):
        start = 0
        for packed in _stream(ws, chunk, n_pad):
            hb, tr = _h_step(packed, g_mat)
            take = min(chunk, m - start)
            H[start : start + take, it * aux_dim : (it + 1) * aux_dim] = \
                np.asarray(hb)[:take]
            if it == 0:
                trace_xtx += float(tr)
            start += chunk
        if it < iter_num:
            g_next = jnp.zeros((n_pad, aux_dim), fdt)
            start = 0
            for packed in _stream(ws, chunk, n_pad):
                hb = np.zeros((chunk, aux_dim))
                take = min(chunk, m - start)
                hb[:take] = H[start : start + take,
                              it * aux_dim : (it + 1) * aux_dim]
                g_next = _g_step(g_next, packed, jnp.asarray(hb, fdt))
                start += chunk
            g_mat = g_next / m

    # U_H: orthonormal basis of span(H) via SVD of H^T (svd_vt, "O" mode)
    _u, _s, vt = np.linalg.svd(H.T, full_matrices=False)
    uh = vt.T  # (m, hsize) right singular vectors = basis in SNP space

    t_acc = jnp.zeros((hsize, n_pad), fdt)
    start = 0
    for packed in _stream(ws, chunk, n_pad):
        ub = np.zeros((chunk, hsize))
        take = min(chunk, m - start)
        ub[:take] = uh[start : start + take]
        t_acc = _t_step(t_acc, packed, jnp.asarray(ub, fdt))
        start += chunk
    T = np.asarray(t_acc)[:, :n].astype(np.float64)

    _ut, sigma, vt2 = np.linalg.svd(T, full_matrices=False)
    eigenvect = vt2.T[:, :eigen_cnt]  # (n, eigen_cnt)

    # R/PCA.R:80-88: vp = 2*sigma^2/TraceXTX with TraceXTX = 2*trace(Y.Y)
    trace2 = 2.0 * trace_xtx
    k = min(len(sigma), n)
    vp = np.full(n, np.nan)
    vp[:k] = 2.0 * sigma[:k] ** 2 / trace2
    eigenval = (n - 1) * vp
    return PCAResult(ws.sample_id, ws.snp_id, eigenval, eigenvect, vp,
                     trace2, False, None)
