"""Pallas TPU kernels for the pairwise engines.

``syrk_int`` — symmetric rank-K update C = A @ A^T computing only the upper
block-triangle (the reference computes strictly triangular pair sets,
Array_SplitJobs dGenGWAS.cpp:2202-2247; XLA's full matmul does 2x the MACs).
The upper-tile list is driven through a PrefetchScalarGridSpec so lower
tiles are never scheduled, DMA'd, or computed.

Falls back to jnp.matmul on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _syrk_kernel(i_arr, j_arr, a_ref, b_ref, o_ref):
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # int8 operands; contraction over the second dim of both tiles (the
    # transpose stays implicit in the MXU pass)
    o_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)


@functools.partial(jax.jit, static_argnames=("tm", "tk"))
def _syrk_tpu(a, tm: int, tk: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = a.shape
    nt = m // tm
    pairs = [(i, j) for i in range(nt) for j in range(i, nt)]
    i_arr = jnp.asarray([p[0] for p in pairs], jnp.int32)
    j_arr = jnp.asarray([p[1] for p in pairs], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(pairs), k // tk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda t, s, i_arr, j_arr: (i_arr[t], s)),
            pl.BlockSpec((tm, tk), lambda t, s, i_arr, j_arr: (j_arr[t], s)),
        ],
        out_specs=pl.BlockSpec((tm, tm),
                               lambda t, s, i_arr, j_arr: (i_arr[t], j_arr[t])),
    )
    return pl.pallas_call(
        _syrk_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, m), jnp.int32),
    )(i_arr, j_arr, a, a)


def mirror_upper(c: jax.Array, tm: int) -> jax.Array:
    """Fill the lower block-triangle from the upper (diagonal tiles are
    complete; strictly-lower tiles are zero)."""
    m = c.shape[0]
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0) // tm
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1) // tm
    strict_lower = row_blk > col_blk
    return c + jnp.where(strict_lower, c.T, 0)


def syrk_supported(m: int, k: int, tm: int = 512, tk: int = 2048) -> bool:
    return jax.default_backend() == "tpu" and m % tm == 0 and k % tk == 0


def syrk_int_raw(a: jax.Array, tm: int = 512, tk: int = 2048) -> jax.Array:
    """Upper-block-triangle of a @ a.T (int32); strictly-lower tiles are 0.
    Caller accumulates raw and calls mirror_upper ONCE at the end."""
    return _syrk_tpu(a, tm, tk)


def syrk_int(a: jax.Array, tm: int = 512, tk: int = 2048) -> jax.Array:
    """C = a @ a.T (int32) using the triangular Pallas kernel on TPU; the
    result is the FULL symmetric matrix."""
    m, k = a.shape
    if not syrk_supported(m, k, tm, tk):
        return jnp.matmul(a, a.T, preferred_element_type=jnp.int32)
    return mirror_upper(_syrk_tpu(a, tm, tk), tm)
