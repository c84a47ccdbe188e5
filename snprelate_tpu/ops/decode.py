"""Device-side decode of packed 2-bit genotypes.

The packed layout is (n_snp, ceil(n_samp/4)) uint8 with the first sample in
the low bits (io/store.py:pack2bit). Decode runs inside jit so XLA fuses it
into the downstream normalization/plane construction.

Reference analog: the bit unpack tables / PackSNPGeno codecs in
dGenGWAS.cpp:1402-1535 — re-designed here as vectorized shifts instead of
byte lookup tables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def decode2bit(packed: jax.Array) -> jax.Array:
    """(S, B) uint8 packed -> (S, 4*B) int8 genotypes in {0,1,2,3}."""
    s, b = packed.shape
    parts = jnp.stack(
        [packed & 3, (packed >> 2) & 3, (packed >> 4) & 3, (packed >> 6) & 3],
        axis=-1)
    return parts.reshape(s, 4 * b).astype(jnp.int8)


def genotype_planes(geno: jax.Array) -> jax.Array:
    """(S, N) int8 genotypes -> (3, S, N) int8 one-hot indicator planes
    I_a[s, i] = [g_si == a] for a in 0,1,2. Missing (3) has all-zero planes,
    so validity = I0+I1+I2 and every masked pairwise count in the reference's
    bit kernels (genIBS.cpp:231-243, genKING.cpp:292-426, genBeta.cpp:92-175)
    becomes a plane cross-product."""
    return jnp.stack([(geno == 0), (geno == 1), (geno == 2)]).astype(jnp.int8)


def genotype_basis(geno: jax.Array) -> jax.Array:
    """(S, N) int8 genotypes -> (3, S, N) int8 reduced count basis
    [V, H, D] with V = [g != 3] (validity), H = [g == 1] (het) and
    D = [g == 2] - [g == 0] (signed homozygote difference).

    Four cross-grams over this basis recover every pairwise counter the
    estimator family consumes (see ops.pairwise.PairCounts): with
    S := (V-H)^T(V-H) = N00 + N22 + N02 + N20 and D^T D = N00 + N22 -
    N02 - N20, the opposite-homozygote count IBS0 = (S - D^T D)/2 and the
    equal-homozygote count (S + D^T D)/2 follow exactly; V^T V is nvalid,
    H^T H is N11 and H^T V the per-pair het counts. This is 4 MXU
    contractions per chunk instead of the 6 independent one-hot plane
    grams (the 9 joint counts N_ab have more degrees of freedom than any
    estimator uses)."""
    v = (geno != 3).astype(jnp.int8)
    h = (geno == 1).astype(jnp.int8)
    d = (geno == 2).astype(jnp.int8) - (geno == 0).astype(jnp.int8)
    return jnp.stack([v, h, d])
