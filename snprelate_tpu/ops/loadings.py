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
                       auto_chunk, chunk_snp_stats, host_read)


def _mesh_tools(mesh):
    """(ndev, batch sharding, replicated sharding) for the loadings
    family: per-SNP kernels are data-parallel over the SNP-chunk axis, so
    a batch of ndev chunks shards its leading axis over EVERY mesh device
    (both mesh axes flattened — the num.thread analog of the reference's
    threaded loadings machinery, genPCA.cpp:809-1123)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    ndev = 1
    for v in mesh.shape.values():
        ndev *= int(v)
    ax = tuple(mesh.axis_names)
    return ndev, NamedSharding(mesh, P(ax)), NamedSharding(mesh, P())


def _resolve_chunk(ws, chunk, n_pad):
    """HBM-tuned SNP chunk (the reference sizes loadings blocks with the
    same cache policy as the pairwise kernels, genPCA.cpp:947-951)."""
    return auto_chunk(n_pad, ws.n_snp) if chunk is None else int(chunk)


def _per_snp_run(ws, chunk, n_pad, mesh, step_one, consts, n_out):
    """Drive a per-SNP chunk kernel over the selection; yields host
    numpy per-output lists truncated to n_snp rows.

    step_one(packed, *consts) -> tuple of n_out arrays with leading dim
    ``chunk``. With mesh, ndev chunks run per dispatch, the batch axis
    sharded over every device (results bitwise identical to the
    single-device loop: the same kernel runs per chunk either way)."""
    results = [[] for _ in range(n_out)]
    if mesh is None:
        for packed in _stream(ws, chunk, n_pad):
            res = step_one(packed, *consts)
            res = res if isinstance(res, tuple) else (res,)
            for i in range(n_out):
                results[i].append(np.asarray(res[i]))
    else:
        from ..parallel.mesh import _batched_chunks

        ndev, b_sh, rep = _mesh_tools(mesh)
        consts_d = tuple(jax.device_put(c, rep) for c in consts)
        batched = jax.jit(jax.vmap(
            step_one, in_axes=(0,) + (None,) * len(consts)))
        for pb in _batched_chunks(ws, chunk, n_pad, ndev):
            res = batched(jax.device_put(pb, b_sh), *consts_d)
            res = res if isinstance(res, tuple) else (res,)
            for i in range(n_out):
                a = host_read(res[i])
                results[i].append(a.reshape((-1,) + a.shape[2:]))
    return [np.concatenate(r)[: ws.n_snp] for r in results]


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


def snp_pc_corr(ws, eigenvect: np.ndarray, chunk=None,
                mesh=None) -> np.ndarray:
    """(K, n_snp) correlations, NaN where undefined. mesh= runs ndev
    chunks per dispatch, batch axis sharded over every mesh device."""
    fdt = _default_float_dtype()
    n_pad = -(-ws.n_samp // 128) * 128
    chunk = _resolve_chunk(ws, chunk, n_pad)
    e = np.zeros((n_pad, eigenvect.shape[1]), np.float64)
    e[: ws.n_samp] = eigenvect
    e = jnp.asarray(e, fdt)
    (out,) = _per_snp_run(ws, chunk, n_pad, mesh, _corr_step, (e,), 1)
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
                 chunk=None, mesh=None):
    """Returns (snploading (K, n_snp), avgfreq, scale)."""
    fdt = _default_float_dtype()
    n_pad = -(-ws.n_samp // 128) * 128
    chunk = _resolve_chunk(ws, chunk, n_pad)
    e = np.zeros((n_pad, eig_scaled.shape[1]), np.float64)
    e[: ws.n_samp] = eig_scaled
    e = jnp.asarray(e, fdt)
    load, avgfreq, scale = _per_snp_run(
        ws, chunk, n_pad, mesh,
        lambda pk, ee: _snp_loading_step(pk, ee, bayesian), (e,), 3)
    return load.T, avgfreq, scale


def _samp_loading_body(carry, packed, sload, avgfreq, scale):
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


_samp_loading_step = functools.partial(jax.jit, donate_argnums=0)(
    _samp_loading_body)


def _chunk_slices(vals, chunk, start, k):
    """Zero-padded per-chunk host slices of (sload.T, avgfreq, scale);
    all-zero past the end of the selection (padding chunks contribute
    nothing to the projection)."""
    sload_scaled, avgfreq, scale = vals
    n_snp = len(avgfreq)
    sl = np.zeros((chunk, k))
    af = np.zeros(chunk)
    sc = np.zeros(chunk)
    take = max(0, min(chunk, n_snp - start))
    if take:
        s = slice(start, start + take)
        sl[:take] = sload_scaled.T[s]
        af[:take] = avgfreq[s]
        sc[:take] = scale[s]
    return sl, af, sc


def samp_loadings(ws, sload_scaled: np.ndarray, avgfreq: np.ndarray,
                  scale: np.ndarray, chunk=None, mesh=None) -> np.ndarray:
    """(n_samp, K) projected eigenvectors. sload_scaled: (K, n_snp).
    mesh= accumulates ndev chunk partials per dispatch (batch axis over
    every device), merged with one final all-reduce."""
    fdt = _default_float_dtype()
    n_pad = -(-ws.n_samp // 128) * 128
    chunk = _resolve_chunk(ws, chunk, n_pad)
    k = sload_scaled.shape[0]
    vals = (sload_scaled, avgfreq, scale)
    if mesh is None:
        carry = jnp.zeros((n_pad, k), fdt)
        start = 0
        for packed in _stream(ws, chunk, n_pad):
            sl, af, sc = _chunk_slices(vals, chunk, start, k)
            carry = _samp_loading_step(carry, packed, jnp.asarray(sl, fdt),
                                       jnp.asarray(af, fdt),
                                       jnp.asarray(sc, fdt))
            start += chunk
        return np.asarray(carry)[: ws.n_samp].astype(np.float64)

    from ..parallel.mesh import _batched_chunks, _reduce_replicated

    ndev, b_sh, _rep = _mesh_tools(mesh)
    step_b = jax.jit(jax.vmap(_samp_loading_body), donate_argnums=0)
    carry = jax.device_put(jnp.zeros((ndev, n_pad, k), fdt), b_sh)
    npdt = np.dtype(np.float64 if fdt == jnp.float64 else np.float32)
    start = 0
    for pb in _batched_chunks(ws, chunk, n_pad, ndev):
        sls, afs, scs = [], [], []
        for _ in range(ndev):
            sl, af, sc = _chunk_slices(vals, chunk, start, k)
            sls.append(sl)
            afs.append(af)
            scs.append(sc)
            start += chunk
        carry = step_b(carry, jax.device_put(pb, b_sh),
                       jax.device_put(np.asarray(sls, npdt), b_sh),
                       jax.device_put(np.asarray(afs, npdt), b_sh),
                       jax.device_put(np.asarray(scs, npdt), b_sh))
    total = _reduce_replicated(carry, mesh)
    return np.asarray(total)[: ws.n_samp].astype(np.float64)


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
                        chunk=None, mesh=None) -> np.ndarray:
    """(K, n_snp) EIGMIX SNP loadings: centered by 2p, uniform scale
    1/sqrt(sum 4p(1-p)) (genEIGMIX.cpp:502-509)."""
    fdt = _default_float_dtype()
    n_pad = -(-ws.n_samp // 128) * 128
    chunk = _resolve_chunk(ws, chunk, n_pad)
    e = np.zeros((n_pad, eigenvect.shape[1]), np.float64)
    e[: ws.n_samp] = eigenvect
    e = jnp.asarray(e, fdt)
    afscale = 1.0 / np.sqrt(np.sum(4.0 * afreq * (1.0 - afreq)))
    if mesh is None:
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

    from ..parallel.mesh import _batched_chunks

    ndev, b_sh, rep = _mesh_tools(mesh)
    e_d = jax.device_put(e, rep)
    batched = jax.jit(jax.vmap(_snp_loading_provided_step,
                               in_axes=(0, None, 0, 0)))
    npdt = np.dtype(np.float64 if fdt == jnp.float64 else np.float32)
    out = np.empty((ws.n_snp, eigenvect.shape[1]))
    start = 0
    for pb in _batched_chunks(ws, chunk, n_pad, ndev):
        a2ps = []
        for d in range(ndev):
            a2p = np.zeros(chunk)
            s0 = start + d * chunk
            take = max(0, min(chunk, ws.n_snp - s0))
            if take:
                a2p[:take] = 2.0 * afreq[s0 : s0 + take]
            a2ps.append(a2p)
        scb = np.full((ndev, chunk), afscale, npdt)
        lo = host_read(batched(jax.device_put(pb, b_sh), e_d,
                               jax.device_put(np.asarray(a2ps, npdt), b_sh),
                               jax.device_put(scb, b_sh)))
        lo = lo.reshape(-1, lo.shape[-1])
        take = min(ndev * chunk, ws.n_snp - start)
        out[start : start + take] = lo[:take]
        start += ndev * chunk
    return out.T


def eigmix_samp_loadings(ws, sload_scaled: np.ndarray, afreq: np.ndarray,
                         chunk=None, mesh=None) -> np.ndarray:
    """Project samples with EIGMIX normalization (genEIGMIX.cpp:535-620)."""
    afscale = 1.0 / np.sqrt(np.sum(4.0 * afreq * (1.0 - afreq)))
    return samp_loadings(ws, sload_scaled, 2.0 * afreq,
                         np.full(len(afreq), afscale), chunk=chunk,
                         mesh=mesh)
