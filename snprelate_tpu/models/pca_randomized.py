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
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

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


# --- device-resident fast path: packed chunks staged in HBM once, each
# power iteration is ONE jitted scan (no host decode/transfer per pass).
# Critical when host<->device bandwidth is the bottleneck (tunnel/DCN).


@jax.jit
def _power_pass(p_all, g_mat):
    """One subspace iteration over device-resident packed chunks:
    returns (G_next = Y^T Y G, H = Y G stacked per chunk, trace(Y Y))."""
    def step(g_next, pk):
        y, tr = _rand_block(pk)
        h = jnp.matmul(y, g_mat, preferred_element_type=y.dtype,
                       precision=norm_precision())
        g_next = g_next + jnp.matmul(y.T, h, preferred_element_type=y.dtype,
                                     precision=norm_precision())
        return g_next, (h, tr)

    g_next, (h_all, trs) = lax.scan(step, jnp.zeros_like(g_mat), p_all)
    return g_next, h_all, trs.sum()


@jax.jit
def _t_pass(p_all, uh_all):
    """T = U_H^T Y accumulated over device-resident chunks."""
    def step(t_acc, xs):
        pk, ub = xs
        y, _ = _rand_block(pk)
        return t_acc + jnp.matmul(ub.T, y, preferred_element_type=y.dtype,
                                  precision=norm_precision()), None

    t0 = jnp.zeros((uh_all.shape[2], p_all.shape[2] * 4), uh_all.dtype)
    t_acc, _ = lax.scan(step, t0, (p_all, uh_all))
    return t_acc


def _hbm_cache_budget() -> int:
    return int(float(os.environ.get("SNPRELATE_TPU_HBM_CACHE", 6e9)))


# --- sharded (multi-chip) power passes: SNP chunks data-parallel over the
# mesh 'data' axis; per-device partial G updates merge with one all-reduce
# per pass (the SNP-axis DP scheme of SURVEY §2.3 applied to CRandomPCA).


@functools.partial(jax.jit, static_argnums=(2,))
def _power_pass_sharded(p_sh, g_mat, mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    def dev_scan(p_dev):
        def step(g_next, pk):
            y, tr = _rand_block(pk)
            h = jnp.matmul(y, g_mat, preferred_element_type=y.dtype,
                           precision=norm_precision())
            g_next = g_next + jnp.matmul(y.T, h,
                                         preferred_element_type=y.dtype,
                                         precision=norm_precision())
            return g_next, (h, tr)

        return lax.scan(step, jnp.zeros_like(g_mat), p_dev)

    g_parts, (h_all, trs) = jax.vmap(dev_scan)(p_sh)
    h_all = lax.with_sharding_constraint(
        h_all, NamedSharding(mesh, P("data", None, None, None)))
    return g_parts.sum(0), h_all, trs.sum()


@functools.partial(jax.jit, static_argnums=(2,))
def _t_pass_sharded(p_sh, uh_sh, mesh):
    def dev_scan(p_dev, uh_dev):
        def step(t_acc, xs):
            pk, ub = xs
            y, _ = _rand_block(pk)
            return t_acc + jnp.matmul(ub.T, y, preferred_element_type=y.dtype,
                                      precision=norm_precision()), None

        t0 = jnp.zeros((uh_dev.shape[2], p_dev.shape[2] * 4), uh_dev.dtype)
        return lax.scan(step, t0, (p_dev, uh_dev))[0]

    return jax.vmap(dev_scan)(p_sh, uh_sh).sum(0)


def _randomized_pca_sharded(ws, eigen_cnt, aux_dim, iter_num, seed, chunk,
                            n_pad, mesh):
    """Multi-device randomized PCA over a mesh with a 'data' axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .pca import PCAResult

    n, m = ws.n_samp, ws.n_snp
    fdt = _default_float_dtype()
    nbytes = n_pad // 4
    d = mesh.shape["data"]
    n_chunks = -(-m // chunk)
    n_chunks = -(-n_chunks // d) * d  # pad chunk count to a multiple of d

    host = np.full((n_chunks, chunk, nbytes), 0xFF, np.uint8)
    for i, (_s, packed) in enumerate(ws.packed_chunks(chunk,
                                                      pad_bytes=nbytes)):
        host[i] = packed
    sh = NamedSharding(mesh, P("data", None, None, None))
    p_sh = jax.device_put(host.reshape(d, n_chunks // d, chunk, nbytes), sh)
    del host

    rng = np.random.default_rng(seed)
    g_mat = np.zeros((n_pad, aux_dim))
    g_mat[:n] = rng.standard_normal((n, aux_dim))
    g_mat = jnp.asarray(g_mat, fdt)

    h_parts = []
    trace_xtx = 0.0
    for it in range(iter_num + 1):
        g_next, h_all, tr = _power_pass_sharded(p_sh, g_mat, mesh)
        h_parts.append(h_all.reshape(n_chunks * chunk, aux_dim))
        if it == 0:
            trace_xtx = float(tr)
        if it < iter_num:
            g_mat = g_next / m

    hsize = aux_dim * (iter_num + 1)
    h = jnp.concatenate(h_parts, axis=1)
    q, _r = jnp.linalg.qr(h)  # replicated (m_pad x hsize is small)
    uh_sh = lax.with_sharding_constraint(
        q.reshape(d, n_chunks // d, chunk, hsize), sh)
    T = _t_pass_sharded(p_sh, uh_sh, mesh)

    B = np.asarray(jnp.matmul(T, T.T, preferred_element_type=T.dtype,
                              precision=jax.lax.Precision.HIGHEST)
                   ).astype(np.float64)
    w, U = np.linalg.eigh(B)
    order = np.argsort(w)[::-1][:eigen_cnt]
    sigma = np.sqrt(np.maximum(w[order], 0.0))
    u_sig = U[:, order] / np.where(sigma > 0, sigma, 1.0)
    eigenvect = np.asarray(
        jnp.matmul(T.T, jnp.asarray(u_sig, T.dtype),
                   preferred_element_type=T.dtype,
                   precision=jax.lax.Precision.HIGHEST))[:n].astype(np.float64)

    trace2 = 2.0 * trace_xtx
    vp = np.full(n, np.nan)
    k = min(len(w), n)
    sig_all = np.sqrt(np.maximum(np.sort(w)[::-1][:k], 0.0))
    vp[:k] = 2.0 * sig_all**2 / trace2
    eigenval = (n - 1) * vp
    return PCAResult(ws.sample_id, ws.snp_id, eigenval, eigenvect, vp,
                     trace2, False, None)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _span_basis(h_parts, n_chunks, chunk):
    """Orthonormal basis of span(H) on device: QR in place of the streamed
    path's SVD — any orthonormal basis of the same span yields the same
    projector U U^T, hence the same final factorization."""
    h = jnp.concatenate(h_parts, axis=1)  # (m_pad, hsize)
    q, _r = jnp.linalg.qr(h)
    return q.reshape(n_chunks, chunk, h.shape[1])


def _randomized_pca_cached(ws, eigen_cnt, aux_dim, iter_num, seed, chunk,
                           n_pad, p_all=None):
    """Device-resident randomized PCA: packed chunks staged in HBM once,
    every pass a single jitted scan, basis + projection on device, only a
    (hsize x hsize) eigensolve and the final eigenvectors on host.

    ``p_all``: optional pre-staged (n_chunks, chunk, n_pad//4) uint8 device
    array of packed chunks (skips host gather + transfer)."""
    from .pca import PCAResult

    n, m = ws.n_samp, ws.n_snp
    fdt = _default_float_dtype()
    nbytes = n_pad // 4
    n_chunks = -(-m // chunk)

    if p_all is None:
        host = np.empty((n_chunks, chunk, nbytes), np.uint8)
        for i, (_s, packed) in enumerate(ws.packed_chunks(chunk,
                                                          pad_bytes=nbytes)):
            host[i] = packed
        p_all = jax.device_put(host)
        del host
    else:
        assert p_all.shape == (n_chunks, chunk, nbytes), \
            (p_all.shape, (n_chunks, chunk, nbytes))

    rng = np.random.default_rng(seed)
    g_mat = np.zeros((n_pad, aux_dim))
    g_mat[:n] = rng.standard_normal((n, aux_dim))
    g_mat = jnp.asarray(g_mat, fdt)

    h_parts = []
    trace_xtx = 0.0
    for it in range(iter_num + 1):
        g_next, h_all, tr = _power_pass(p_all, g_mat)
        # padded SNP rows are exactly zero (missing-coded pads -> y == 0),
        # so keeping them changes neither the span nor T
        h_parts.append(h_all.reshape(n_chunks * chunk, aux_dim))
        if it == 0:
            trace_xtx = float(tr)
        if it < iter_num:
            g_mat = g_next / m

    uh_all = _span_basis(tuple(h_parts), n_chunks, chunk)
    T = _t_pass(p_all, uh_all)  # (hsize, n_pad), stays on device

    # SVD of T via the (hsize x hsize) Gram: σ² = eig(T Tᵀ), right singular
    # vectors v_k = Tᵀ u_k / σ_k (top components are well-separated from
    # the Gram's squared-conditioning floor). Only the tiny Gram and the
    # final (n x eigen_cnt) eigenvectors cross the host boundary.
    B = np.asarray(jnp.matmul(T, T.T, preferred_element_type=T.dtype,
                              precision=jax.lax.Precision.HIGHEST)
                   ).astype(np.float64)
    w, U = np.linalg.eigh(B)
    order = np.argsort(w)[::-1][:eigen_cnt]
    sigma = np.sqrt(np.maximum(w[order], 0.0))
    u_sig = U[:, order] / np.where(sigma > 0, sigma, 1.0)
    eigenvect = np.asarray(
        jnp.matmul(T.T, jnp.asarray(u_sig, T.dtype),
                   preferred_element_type=T.dtype,
                   precision=jax.lax.Precision.HIGHEST))[:n].astype(np.float64)

    trace2 = 2.0 * trace_xtx
    vp = np.full(n, np.nan)
    k = min(len(w), n)
    sig_all = np.sqrt(np.maximum(np.sort(w)[::-1][:k], 0.0))
    vp[:k] = 2.0 * sig_all**2 / trace2
    eigenval = (n - 1) * vp
    return PCAResult(ws.sample_id, ws.snp_id, eigenval, eigenvect, vp,
                     trace2, False, None)


# --- slab-wise randomized PCA: for cohorts whose full-sample packed
# chunks exceed HBM (the 100k x 1M regime), the power iteration runs over
# sample-group slabs from a tiles.py SlabSource: H = Y G accumulates one
# group at a time, then G_next = Y^T H in a second group sweep. Data
# crosses the host boundary only as slab uploads (zero for a device-
# generated cohort); all factors (H, G, T) stay device-resident.


def _make_slab_pca_steps():
    from snprelate_tpu.ops.decode import decode2bit

    @jax.jit
    def h_accum(h_all, slab, avg, scale, g_j):
        """h_all (n_chunks, chunk, aux) += Y_slab @ G_j; also the trace
        contribution of this slab."""
        def step(tr, xs):
            pk, av, sc, h = xs
            geno = decode2bit(pk)
            valid = geno < 3
            y = jnp.where(valid, (geno.astype(av.dtype) - av[:, None])
                          * sc[:, None], 0.0)
            h = h + jnp.matmul(y, g_j, preferred_element_type=y.dtype,
                               precision=norm_precision())
            return tr + (y * y).sum(), h

        tr, h_new = lax.scan(step, jnp.zeros((), h_all.dtype),
                             (slab, avg, scale, h_all))
        return h_new, tr

    @jax.jit
    def g_accum(slab, avg, scale, h_all):
        """G_j = Y_slab^T @ H summed over chunks."""
        def step(gj, xs):
            pk, av, sc, h = xs
            geno = decode2bit(pk)
            valid = geno < 3
            y = jnp.where(valid, (geno.astype(av.dtype) - av[:, None])
                          * sc[:, None], 0.0)
            return gj + jnp.matmul(y.T, h, preferred_element_type=y.dtype,
                                   precision=norm_precision()), None

        g0 = jnp.zeros((slab.shape[2] * 4, h_all.shape[2]), h_all.dtype)
        return lax.scan(step, g0, (slab, avg, scale, h_all))[0]

    return h_accum, g_accum


def randomized_pca_slabs(source, n_samp, eigen_cnt=32, aux_dim=None,
                         iter_num=4, seed=None, verbose=False):
    """Randomized PCA (CRandomPCA, genPCA.cpp:472-803) over a SlabSource:
    the biobank-scale path where neither the n x n covariance nor the
    full-sample packed chunks fit HBM. Normalization is the randomized-
    PCA scaling 1/sqrt(2p(1-p)) with per-SNP stats from a first pass over
    all groups (thread_lookup_y, genPCA.cpp:501-528). Returns PCAResult
    with the reference's eigval = (n-1) * 2 sigma^2 / TraceXTX semantics
    (R/PCA.R:80-88)."""
    from snprelate_tpu.ops.tiles import _stats_pass
    from .pca import PCAResult

    if aux_dim is None:
        aux_dim = 2 * eigen_cnt
    fdt = _default_float_dtype()
    k = source.n_groups
    group = source.group
    n_pad = k * group
    m = source.n_chunks * source.chunk

    # per-SNP stats over ALL samples; randomized scaling from avg
    avg, _scale_pca, _poly, _nl = _stats_pass(source, fdt)
    p = avg * 0.5
    scale = jnp.where((p > 0) & (p < 1),
                      1.0 / jnp.sqrt(2.0 * p * (1.0 - p)), 0.0)

    h_accum, g_accum = _make_slab_pca_steps()
    rng = np.random.default_rng(seed)
    g_host = np.zeros((n_pad, aux_dim))
    g_host[:n_samp] = rng.standard_normal((n_samp, aux_dim))
    G = jnp.asarray(g_host, fdt)

    # NOTE on memory: async dispatch would otherwise let the Python loop
    # queue every group's slab at once (k slabs of HBM). A tiny dependent
    # materialization after each group bounds residency to ~2 slabs
    # (block_until_ready does not wait on the axon tunnel backend).
    h_parts = []
    trace_xtx = 0.0
    slab = None
    for it in range(iter_num + 1):
        h_all = jnp.zeros((source.n_chunks, source.chunk, aux_dim), fdt)
        tr_sum = 0.0
        for j in range(k):
            slab = None
            slab = source.slab(j)
            h_all, tr = h_accum(h_all, slab, avg, scale,
                                lax.dynamic_slice_in_dim(G, j * group,
                                                         group))
            tr_sum += float(tr)  # also syncs this group's work
        slab = None
        if it == 0:
            trace_xtx = tr_sum
        h_parts.append(h_all.reshape(m, aux_dim))
        if verbose:
            print(f"randomized PCA: power pass {it + 1}/{iter_num + 1}")
        if it < iter_num:
            g_next = []
            for j in range(k):
                slab = None
                slab = source.slab(j)
                gj = g_accum(slab, avg, scale, h_all)
                np.asarray(gj[:1, :1])  # sync: bound slab residency
                g_next.append(gj)
            slab = None
            G = jnp.concatenate(g_next, axis=0) / m

    h = jnp.concatenate(h_parts, axis=1)  # (m, hsize)
    q, _r = jnp.linalg.qr(h)
    uh_all = q.reshape(source.n_chunks, source.chunk, q.shape[1])
    hsize = q.shape[1]

    # T = U_H^T Y, assembled group by group (hsize x n_pad)
    @jax.jit
    def t_accum(slab, avg, scale, uh):
        from snprelate_tpu.ops.decode import decode2bit

        def step(tj, xs):
            pk, av, sc, ub = xs
            geno = decode2bit(pk)
            valid = geno < 3
            y = jnp.where(valid, (geno.astype(av.dtype) - av[:, None])
                          * sc[:, None], 0.0)
            return tj + jnp.matmul(ub.T, y, preferred_element_type=y.dtype,
                                   precision=norm_precision()), None

        t0 = jnp.zeros((uh.shape[2], slab.shape[2] * 4), uh.dtype)
        return lax.scan(step, t0, (slab, avg, scale, uh))[0]

    t_parts = []
    for j in range(k):
        slab = None
        slab = source.slab(j)
        tj = t_accum(slab, avg, scale, uh_all)
        np.asarray(tj[:1, :1])  # sync: bound slab residency
        t_parts.append(tj)
    slab = None
    T = jnp.concatenate(t_parts, axis=1)  # (hsize, n_pad)

    B = np.asarray(jnp.matmul(T, T.T, preferred_element_type=T.dtype,
                              precision=jax.lax.Precision.HIGHEST)
                   ).astype(np.float64)
    w, U = np.linalg.eigh(B)
    order = np.argsort(w)[::-1][:eigen_cnt]
    sigma = np.sqrt(np.maximum(w[order], 0.0))
    u_sig = U[:, order] / np.where(sigma > 0, sigma, 1.0)
    eigenvect = np.asarray(
        jnp.matmul(T.T, jnp.asarray(u_sig, T.dtype),
                   preferred_element_type=T.dtype,
                   precision=jax.lax.Precision.HIGHEST))[:n_samp] \
        .astype(np.float64)

    trace2 = 2.0 * trace_xtx
    vp = np.full(n_samp, np.nan)
    kk = min(len(w), n_samp)
    sig_all = np.sqrt(np.maximum(np.sort(w)[::-1][:kk], 0.0))
    vp[:kk] = 2.0 * sig_all**2 / trace2
    eigenval = (n_samp - 1) * vp
    sample_id = getattr(source, "sample_id",
                        np.asarray([f"s{i}" for i in range(n_samp)],
                                   object))
    snp_id = getattr(source, "snp_id", np.arange(source.n_snp))
    return PCAResult(sample_id, snp_id, eigenval, eigenvect, vp,
                     trace2, False, None)


def randomized_pca(ws, eigen_cnt=16, aux_dim=None, iter_num=10, seed=None,
                   chunk=None, p_all=None, mesh=None):
    from .pca import PCAResult

    n, m = ws.n_samp, ws.n_snp
    if chunk is None:
        chunk = 4096 if p_all is None else p_all.shape[1]
    if aux_dim is None:
        aux_dim = 2 * eigen_cnt
    hsize = aux_dim * (iter_num + 1)
    fdt = _default_float_dtype()
    n_pad = -(-n // 128) * 128

    # the span basis cannot have more vectors than (padded) SNPs: QR on the
    # (m_pad x hsize) H block would return min(m_pad, hsize) columns and
    # fail the downstream reshape with an opaque shape error
    if hsize > -(-m // chunk) * chunk:
        raise ValueError(
            f"aux_dim*(iter_num+1) = {hsize} exceeds the padded SNP count "
            f"{-(-m // chunk) * chunk}; reduce aux_dim/iter_num or use "
            "algorithm='exact' (the subspace cannot be wider than the "
            "SNP dimension)")

    if mesh is not None:
        return _randomized_pca_sharded(ws, eigen_cnt, aux_dim, iter_num,
                                       seed, chunk, n_pad, mesh)

    # device-resident fast path when the packed selection + working set
    # fit the HBM cache budget (the multi-pass subspace iteration would
    # otherwise re-stream every chunk from host 2*iter_num+2 times)
    n_chunks = -(-m // chunk)
    p_bytes = n_chunks * chunk * (n_pad // 4)
    fbytes = 8 if fdt == jnp.float64 else 4
    work_bytes = (2 * chunk * n_pad + n_chunks * chunk * hsize) * fbytes
    if p_all is not None or p_bytes + work_bytes <= _hbm_cache_budget():
        return _randomized_pca_cached(ws, eigen_cnt, aux_dim, iter_num,
                                      seed, chunk, n_pad, p_all=p_all)

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
