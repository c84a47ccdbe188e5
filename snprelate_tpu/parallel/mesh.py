"""Device-mesh sharding for the pairwise engines.

The reference is single-node pthreads (SURVEY.md §2.3); here parallelism is
expressed over a JAX mesh with two axes:

- ``data``: SNP-chunk data parallelism — each device accumulates partial
  n x n matrices from its own SNP chunks (the analog of the reference's
  offline GRM merge, R/IBD.R:624-748, done on-line via an all-reduce).
- ``samp``: sample-row model parallelism — the n x n accumulators are
  sharded by rows of the (padded) sample axis, the analog of the
  triangular job split Array_SplitJobs (dGenGWAS.cpp:2202-2247) re-designed
  as tile sharding. XLA inserts the all-gather of the (S, N) operand.

Collectives ride the mesh: partial accumulators merge with a sum over the
``data`` axis at the end (one psum-sized transfer per analysis, not per
chunk).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.decode import decode2bit, genotype_basis
from ..ops.pairwise import (PairCounts, _sym_grams4, auto_chunk,
                            make_pca_block, norm_precision)


def _reduce_replicated(carry, mesh: Mesh):
    """Sum partials over the data axis and replicate the result on every
    device, so the host read works on multi-process (multi-host) runtimes
    where per-device shards are not all addressable."""
    return jax.jit(lambda c: jnp.sum(c, axis=0),
                   out_shardings=NamedSharding(mesh, P()))(carry)


def make_mesh(n_data: Optional[int] = None, n_samp: int = 1,
              devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_samp
    devices = devices[: n_data * n_samp].reshape(n_data, n_samp)
    return Mesh(devices, ("data", "samp"))


@functools.partial(jax.jit, donate_argnums=0, static_argnums=(2,))
def _sharded_gram_step(carry, packed_batch, mesh: Mesh):
    """carry: (D, 4, N, N) reduced-basis gram partials (vv, hh, dd, hv)
    sharded (data, -, samp, -); packed_batch: (D, S, B) sharded over data.
    Each device computes its own chunk's cross-grams locally; rows of the
    n x n output are sharded over 'samp' (XLA all-gathers the right-hand
    operand over 'samp' only)."""
    def one(packed):
        return jnp.stack(_sym_grams4(genotype_basis(decode2bit(packed))))

    out = carry + jax.vmap(one)(packed_batch)
    return jax.lax.with_sharding_constraint(
        out, NamedSharding(mesh, P("data", None, "samp", None)))


def sharded_pair_counts(ws, mesh: Mesh, chunk=None) -> PairCounts:
    """Multi-device reduced-basis grams -> PairCounts.

    SNP chunks round-robin across the 'data' axis; per-device partials are
    summed at the end (all-reduce over 'data')."""
    from ..ops.pairwise import guard_count_snps

    guard_count_snps(ws.n_snp, "sharded pair counts")
    d = mesh.shape["data"]
    n_samp_dev = mesh.shape["samp"]
    n_pad = -(-ws.n_samp // (128 * n_samp_dev)) * (128 * n_samp_dev)
    if chunk is None:
        chunk = auto_chunk(n_pad, ws.n_snp)
    nbytes = n_pad // 4
    carry_sh = NamedSharding(mesh, P("data", None, "samp", None))
    batch_sh = NamedSharding(mesh, P("data", None, None))
    carry = jax.device_put(
        jnp.zeros((d, 4, n_pad, n_pad), jnp.int32), carry_sh)

    batch = []
    for _start, packed in ws.packed_chunks(chunk):
        if packed.shape[1] < nbytes:
            packed = np.pad(packed, ((0, 0), (0, nbytes - packed.shape[1])),
                            constant_values=0xFF)
        batch.append(packed)
        if len(batch) == d:
            pb = jax.device_put(np.stack(batch), batch_sh)
            carry = _sharded_gram_step(carry, pb, mesh)
            batch = []
    if batch:
        # pad the final batch with all-missing chunks
        pad = [np.full_like(batch[0], 0xFF)] * (d - len(batch))
        pb = jax.device_put(np.stack(batch + pad), batch_sh)
        carry = _sharded_gram_step(carry, pb, mesh)
    total = _reduce_replicated(carry, mesh)  # all-reduce over 'data'
    return PairCounts.from_grams4(total, ws.n_samp)


@functools.partial(jax.jit, donate_argnums=0, static_argnums=(2,))
def _sharded_cov_step(carry, packed_batch, mesh: Mesh):
    """Sharded Eigenstrat-normalized covariance accumulation (the exact-PCA
    / GCTA hot loop, genPCA.cpp:427-463) over (data, samp) shardings."""
    def one(packed):
        x, _ = make_pca_block(decode2bit(packed), False)
        return jnp.matmul(x.T, x, preferred_element_type=x.dtype,
                          precision=norm_precision())

    out = carry + jax.vmap(one)(packed_batch)
    return jax.lax.with_sharding_constraint(
        out, NamedSharding(mesh, P("data", "samp", None)))


def sharded_pca_covariance(ws, mesh: Mesh, chunk=None) -> np.ndarray:
    d = mesh.shape["data"]
    n_samp_dev = mesh.shape["samp"]
    n_pad = -(-ws.n_samp // (128 * n_samp_dev)) * (128 * n_samp_dev)
    if chunk is None:
        chunk = auto_chunk(n_pad, ws.n_snp)
    nbytes = n_pad // 4
    fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    carry_sh = NamedSharding(mesh, P("data", "samp", None))
    batch_sh = NamedSharding(mesh, P("data", None, None))
    carry = jax.device_put(jnp.zeros((d, n_pad, n_pad), fdt), carry_sh)
    batch = []
    for _start, packed in ws.packed_chunks(chunk):
        if packed.shape[1] < nbytes:
            packed = np.pad(packed, ((0, 0), (0, nbytes - packed.shape[1])),
                            constant_values=0xFF)
        batch.append(packed)
        if len(batch) == d:
            carry = _sharded_cov_step(
                carry, jax.device_put(np.stack(batch), batch_sh), mesh)
            batch = []
    if batch:
        pad = [np.full_like(batch[0], 0xFF)] * (d - len(batch))
        carry = _sharded_cov_step(
            carry, jax.device_put(np.stack(batch + pad), batch_sh), mesh)
    total = _reduce_replicated(carry, mesh)
    n = ws.n_samp
    return np.asarray(total)[:n, :n].astype(np.float64)


@functools.partial(jax.jit, donate_argnums=0, static_argnums=(2,))
def _sharded_gcta_step(carry, packed_batch, mesh: Mesh):
    """Sharded GCTA accumulation: covariance + polymorphic-validity gram +
    locus count (CGCTA_AlgArith::Run, genPCA.cpp:1148-1237)."""
    cov, vgram, nlocus = carry

    def one(packed):
        geno = decode2bit(packed)
        x, (gsum, gnum, valid) = make_pca_block(geno, False)
        poly = (gsum > 0) & (gsum < 2 * gnum)
        vp = (valid & poly[:, None]).astype(jnp.int8)
        c = jnp.matmul(x.T, x, preferred_element_type=x.dtype,
                       precision=norm_precision())
        v = jnp.matmul(vp.T, vp, preferred_element_type=jnp.int32)
        return c, v, poly.sum(dtype=jnp.int32)

    dc, dv, dn = jax.vmap(one)(packed_batch)
    cov = jax.lax.with_sharding_constraint(
        cov + dc, NamedSharding(mesh, P("data", "samp", None)))
    vgram = jax.lax.with_sharding_constraint(
        vgram + dv, NamedSharding(mesh, P("data", "samp", None)))
    return cov, vgram, nlocus + dn


def _batched_chunks(ws, chunk, n_pad, d):
    nbytes = n_pad // 4
    batch = []
    for _start, packed in ws.packed_chunks(chunk, pad_bytes=nbytes):
        batch.append(packed)
        if len(batch) == d:
            yield np.stack(batch)
            batch = []
    if batch:
        pad = [np.full_like(batch[0], 0xFF)] * (d - len(batch))
        yield np.stack(batch + pad)


def sharded_gcta_parts(ws, mesh: Mesh, chunk=None):
    """Multi-device GCTA GRM parts (cov, validity gram, nlocus)."""
    d = mesh.shape["data"]
    n_samp_dev = mesh.shape["samp"]
    n_pad = -(-ws.n_samp // (128 * n_samp_dev)) * (128 * n_samp_dev)
    if chunk is None:
        chunk = auto_chunk(n_pad, ws.n_snp)
    fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    c_sh = NamedSharding(mesh, P("data", "samp", None))
    b_sh = NamedSharding(mesh, P("data", None, None))
    carry = (jax.device_put(jnp.zeros((d, n_pad, n_pad), fdt), c_sh),
             jax.device_put(jnp.zeros((d, n_pad, n_pad), jnp.int32), c_sh),
             jnp.zeros((d,), jnp.int32))
    for pb in _batched_chunks(ws, chunk, n_pad, d):
        carry = _sharded_gcta_step(carry, jax.device_put(pb, b_sh), mesh)
    cov, vgram, nlocus = carry
    n = ws.n_samp
    return (np.asarray(_reduce_replicated(cov, mesh))[:n, :n]
            .astype(np.float64),
            np.asarray(_reduce_replicated(vgram, mesh))[:n, :n]
            .astype(np.int64),
            int(np.asarray(_reduce_replicated(nlocus, mesh))))
