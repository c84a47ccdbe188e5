"""LD measure computations (reference: src/genLD.cpp).

Every LD measure is a closed-form function of the per-pair 3x3 joint
genotype table J[a,b][i,j] = #samples with (g_i=a, g_j=b), both valid.
The reference computes these with 256x256 byte lookup tables
(genLD.cpp:57-172); here a SNP-plane cross matmul produces whole J tiles
on the MXU, and the measures are evaluated vectorized:

- composite (genLD.cpp:215-250), corr (:477-503), cov (:509-526): direct.
- r / dprime (:268-444): haplotype counts + vectorized EM with convergence
  masks (fixed-point of the reference's per-pair EM, genLD.cpp:268-331).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DBL_EPSILON = np.finfo(np.float64).eps


@jax.jit
def _joint_tile(pi, pj):
    """pi: (3, Si, N) int8 planes; pj: (3, Sj, N) -> (3,3,Si,Sj) int32."""
    _3, si, n = pi.shape
    sj = pj.shape[1]
    a = pi.reshape(3 * si, n)
    b = pj.reshape(3 * sj, n)
    c = jnp.matmul(a, b.T, preferred_element_type=jnp.int32)
    return c.reshape(3, si, 3, sj).transpose(0, 2, 1, 3)


def snp_planes_np(geno: np.ndarray) -> np.ndarray:
    """(S, N) uint8 -> (3, S, N) int8 one-hot planes (numpy)."""
    return np.stack([geno == 0, geno == 1, geno == 2]).astype(np.int8)


def joint_table(geno_i: np.ndarray, geno_j: np.ndarray,
                use_device: bool = True) -> np.ndarray:
    """J (3,3,Si,Sj) int64 between two genotype blocks (S, N)."""
    pi = snp_planes_np(geno_i)
    pj = snp_planes_np(geno_j)
    if use_device and (geno_i.shape[0] * geno_j.shape[0] > 4096):
        c = _joint_tile(jnp.asarray(pi), jnp.asarray(pj))
        return np.asarray(c).astype(np.int64)
    # upcast BEFORE contracting: einsum's optimize=True routes through
    # tensordot/BLAS in the operand dtype and silently ignores dtype=,
    # wrapping int8 once a joint cell exceeds 127 (i.e. >127 samples)
    return np.einsum("ain,bjn->abij", pi.astype(np.int64),
                     pj.astype(np.int64), optimize=True)


def em_haplo(nA_A, nA_B, nB_A, nB_B, nDH2):
    """Vectorized EM for haplotype proportions (ProportionHaplo,
    genLD.cpp:268-331). All args float64 arrays of the same shape."""
    nA_A = np.asarray(nA_A, np.float64)
    nA_B = np.asarray(nA_B, np.float64)
    nB_A = np.asarray(nB_A, np.float64)
    nB_B = np.asarray(nB_B, np.float64)
    nDH2 = np.asarray(nDH2, np.float64)
    n_total = nA_A + nA_B + nB_A + nB_B + nDH2

    def plog(x):
        return np.log(x + DBL_EPSILON)

    with np.errstate(divide="ignore", invalid="ignore"):
        # direct solution when no double-hets
        pA_A = nA_A / n_total
        pA_B = nA_B / n_total
        pB_A = nB_A / n_total
        pB_B = nB_B / n_total

        em = (n_total > 0) & (nDH2 > 0)
        if np.any(em):
            init_f = 0.01
            div = nA_A + nA_B + nB_A + nB_B + 4.0 * init_f
            a = (nA_A + init_f) / div
            b = (nA_B + init_f) / div
            c = (nB_A + init_f) / div
            d = (nB_B + init_f) / div
            nDH = np.floor(nDH2 / 2)

            def loglik(a, b, c, d):
                return (nA_A * plog(a) + nA_B * plog(b) + nB_A * plog(c)
                        + nB_B * plog(d) + nDH * plog(a * d + b * c))

            old = loglik(a, b, c, d)
            contol = np.maximum(np.abs(np.sqrt(DBL_EPSILON) * old),
                                DBL_EPSILON)
            active = em.copy()
            for _ in range(1000):
                if not np.any(active):
                    break
                p_ad = a * d
                p_bc = b * c
                ndh_ad = np.where(p_ad + p_bc > 0,
                                  p_ad / (p_ad + p_bc) * nDH, 0.0)
                ndh_bc = nDH - ndh_ad
                na = (nA_A + ndh_ad) / n_total
                nb = (nA_B + ndh_bc) / n_total
                nc = (nB_A + ndh_bc) / n_total
                nd = (nB_B + ndh_ad) / n_total
                a = np.where(active, na, a)
                b = np.where(active, nb, b)
                c = np.where(active, nc, c)
                d = np.where(active, nd, d)
                ll = loglik(a, b, c, d)
                conv = np.abs(ll - old) <= contol
                old = np.where(active, ll, old)
                active = active & ~conv
            pA_A = np.where(em, a, pA_A)
            pA_B = np.where(em, b, pA_B)
            pB_A = np.where(em, c, pB_A)
            pB_B = np.where(em, d, pB_B)
    return pA_A, pA_B, pB_A, pB_B


# --- device-side LD evaluation (jax port of ld_from_joint/em_haplo) ---
# Used by the LD-pruning band path: the |LD| > threshold decision is made
# on device so only a boolean band crosses the host boundary (the joint
# tables are 36x larger). On CPU/x64 this is bit-identical to the numpy
# path (same IEEE f64 elementwise ops); on TPU it runs in f32.


def _em_haplo_jnp(nA_A, nA_B, nB_A, nB_B, nDH2):
    fdt = nA_A.dtype
    eps = jnp.asarray(np.finfo(np.dtype(fdt)).eps, fdt)
    n_total = nA_A + nA_B + nB_A + nB_B + nDH2

    def plog(x):
        return jnp.log(x + eps)

    pA_A = nA_A / n_total
    pA_B = nA_B / n_total
    pB_A = nB_A / n_total
    pB_B = nB_B / n_total

    em = (n_total > 0) & (nDH2 > 0)
    init_f = jnp.asarray(0.01, fdt)
    div = nA_A + nA_B + nB_A + nB_B + 4.0 * init_f
    a = (nA_A + init_f) / div
    b = (nA_B + init_f) / div
    c = (nB_A + init_f) / div
    d = (nB_B + init_f) / div
    nDH = jnp.floor(nDH2 / 2)

    def loglik(a, b, c, d):
        return (nA_A * plog(a) + nA_B * plog(b) + nB_A * plog(c)
                + nB_B * plog(d) + nDH * plog(a * d + b * c))

    old = loglik(a, b, c, d)
    contol = jnp.maximum(jnp.abs(jnp.sqrt(eps) * old), eps)

    def cond(state):
        it, active, *_ = state
        return (it < 1000) & jnp.any(active)

    def body(state):
        it, active, a, b, c, d, old = state
        p_ad = a * d
        p_bc = b * c
        ndh_ad = jnp.where(p_ad + p_bc > 0, p_ad / (p_ad + p_bc) * nDH, 0.0)
        ndh_bc = nDH - ndh_ad
        a = jnp.where(active, (nA_A + ndh_ad) / n_total, a)
        b = jnp.where(active, (nA_B + ndh_bc) / n_total, b)
        c = jnp.where(active, (nB_A + ndh_bc) / n_total, c)
        d = jnp.where(active, (nB_B + ndh_ad) / n_total, d)
        ll = loglik(a, b, c, d)
        conv = jnp.abs(ll - old) <= contol
        old = jnp.where(active, ll, old)
        return it + 1, active & ~conv, a, b, c, d, old

    _, _, a, b, c, d, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), em, a, b, c, d, old))
    return (jnp.where(em, a, pA_A), jnp.where(em, b, pA_B),
            jnp.where(em, c, pB_A), jnp.where(em, d, pB_B))


def _ld_from_joint_jnp(J, method: str):
    """J: 3x3 nested list of same-shaped float arrays (J[a][b] = joint
    count tiles) -> LD values. A grid of 2D tiles instead of a stacked
    (3,3,Si,Sj) array: the 4D transpose form compiled 15x slower."""
    n = sum(J[a][b] for a in range(3) for b in range(3))
    nan = jnp.asarray(jnp.nan, J[0][0].dtype)
    if method == "composite":
        naa = J[0][0] + J[0][1] + J[0][2]
        naA = J[1][0] + J[1][1] + J[1][2]
        nAA = J[2][0] + J[2][1] + J[2][2]
        nbb = J[0][0] + J[1][0] + J[2][0]
        nbB = J[0][1] + J[1][1] + J[2][1]
        nBB = J[0][2] + J[1][2] + J[2][2]
        delta = ((J[2][2] + J[0][0] - J[0][2] - J[2][0]) / (2 * n)
                 - (naa - nAA) * (nbb - nBB) / (2.0 * n * n))
        pa = (2 * naa + naA) / (2 * n)
        pA = 1 - pa
        pAA = nAA / n
        pb = (2 * nbb + nbB) / (2 * n)
        pB = 1 - pb
        pBB = nBB / n
        DA = pAA - pA * pA
        DB = pBB - pB * pB
        t = (pA * pa + DA) * (pB * pb + DB)
        return jnp.where((n > 0) & (t > 0),
                         delta / jnp.sqrt(jnp.where(t > 0, t, 1.0)), nan)
    if method in ("corr", "cov"):
        X = sum(a * J[a][b] for a in range(3) for b in range(3))
        Y = sum(b * J[a][b] for a in range(3) for b in range(3))
        XY = sum(a * b * J[a][b] for a in range(3) for b in range(3))
        if method == "cov":
            return jnp.where(n > 1, (XY - X * Y / n)
                             / jnp.maximum(n - 1, 1), nan)
        XX = sum(a * a * J[a][b] for a in range(3) for b in range(3))
        YY = sum(b * b * J[a][b] for a in range(3) for b in range(3))
        c1 = XX - X * X / n
        c2 = YY - Y * Y / n
        val = c1 * c2
        return jnp.where((n > 0) & (val > 0),
                         (XY - X * Y / n)
                         / jnp.sqrt(jnp.where(val > 0, val, 1.0)), nan)
    if method in ("r", "dprime"):
        nA_A = 2 * J[2][2] + J[2][1] + J[1][2]
        nA_B = 2 * J[2][0] + J[2][1] + J[1][0]
        nB_A = 2 * J[0][2] + J[0][1] + J[1][2]
        nB_B = 2 * J[0][0] + J[0][1] + J[1][0]
        nDH2 = 2 * J[1][1]
        pA_A, pA_B, pB_A, pB_B = _em_haplo_jnp(nA_A, nA_B, nB_A, nB_B, nDH2)
        pA = pA_A + pA_B
        p_A = pA_A + pB_A
        pB = pB_A + pB_B
        p_B = pA_B + pB_B
        D = pA_A - pA * p_A
        if method == "r":
            return D / jnp.sqrt(pA * p_A * pB * p_B)
        return D / jnp.where(D >= 0, jnp.minimum(pA * p_B, pB * p_A),
                             jnp.maximum(-pA * p_A, -pB * p_B))
    raise ValueError(f"unknown LD method {method!r}")


@functools.partial(jax.jit, static_argnames=("method",))
def ld_values_tile(gi, gj, method: str):
    """LD(gi_s, gj_t) value tile on device: genotype blocks (S, N) uint8 in,
    (Si, Sj) float out — transfers the measure instead of the 36x-larger
    joint tables."""
    fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    pi = [(gi == k).astype(jnp.int8) for k in range(3)]
    pj = [(gj == k).astype(jnp.int8) for k in range(3)]
    J = [[jnp.matmul(pi[a], pj[b].T,
                     preferred_element_type=jnp.int32).astype(fdt)
          for b in range(3)] for a in range(3)]
    return _ld_from_joint_jnp(J, method)


@functools.partial(jax.jit, static_argnames=("method",))
def band_exceeds_tile(gi, gj, threshold, method: str):
    """|LD(gi_s, gj_t)| > threshold boolean tile, fully on device: genotype
    blocks (S, N) uint8 in, (Si, Sj) bool out — only the band of decisions
    crosses the host boundary (NaN LD compares False = keep, matching the
    host scan). Padding rows of genotype 3 give all-zero counts -> NaN ->
    False."""
    fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    pi = [(gi == k).astype(jnp.int8) for k in range(3)]
    pj = [(gj == k).astype(jnp.int8) for k in range(3)]
    J = [[jnp.matmul(pi[a], pj[b].T,
                     preferred_element_type=jnp.int32).astype(fdt)
          for b in range(3)] for a in range(3)]
    ld = _ld_from_joint_jnp(J, method)
    return jnp.abs(ld) > threshold


@functools.partial(jax.jit,
                   static_argnames=("block", "cols", "method", "band"))
def _ld_packed_tile(packed, i0, c0, threshold, block: int, cols: int,
                    method: str, band: bool):
    """LD tile between row slices of a DEVICE-RESIDENT packed 2-bit
    matrix: rows [i0, i0+block) x [c0, c0+cols), decoded on device.
    band=True returns the |LD| > threshold boolean tile, else the values.
    Padding rows (0xFF) decode to all-missing -> NaN -> False."""
    from .decode import decode2bit

    gi = decode2bit(jax.lax.dynamic_slice_in_dim(packed, i0, block, 0))
    gj = decode2bit(jax.lax.dynamic_slice_in_dim(packed, c0, cols, 0))
    fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    pi = [(gi == k).astype(jnp.int8) for k in range(3)]
    pj = [(gj == k).astype(jnp.int8) for k in range(3)]
    J = [[jnp.matmul(pi[a], pj[b].T,
                     preferred_element_type=jnp.int32).astype(fdt)
          for b in range(3)] for a in range(3)]
    ld = _ld_from_joint_jnp(J, method)
    return jnp.abs(ld) > threshold if band else ld


class PackedLD:
    """Device-resident 2-bit genotypes for repeated LD tile evaluation
    at biobank sample counts.

    The dense band/tile kernels ship one (block x n_samp) uint8 genotype
    pair per window — at 65k samples that is ~0.3 GB of H2D per window
    and the scan becomes link-bound. Here the packed rows upload ONCE
    (2 bits/genotype; a 229k x 65k chromosome set is 3.8 GB total) and
    every tile decodes on device, so the host boundary carries only
    decision bits/values. Same counts as the dense path: padding samples
    and padding rows decode to missing and drop out of the joint tables.
    """

    def __init__(self, geno: np.ndarray, pad_rows: int):
        from ..io.store import pack2bit

        self.n = geno.shape[0]
        packed = pack2bit(np.ascontiguousarray(geno))
        if pad_rows:
            packed = np.pad(packed, ((0, pad_rows), (0, 0)),
                            constant_values=0xFF)
        self.dev = jnp.asarray(packed)
        self.h2d_bytes = packed.nbytes

    def band(self, i0: int, c0: int, threshold: float, block: int,
             cols: int, method: str):
        return _ld_packed_tile(self.dev, i0, c0, threshold, block, cols,
                               method, True)

    def vals(self, i0: int, c0: int, block: int, cols: int, method: str):
        return _ld_packed_tile(self.dev, i0, c0, 0.0, block, cols,
                               method, False)


def haplo_counts(J: np.ndarray):
    """Known haplotype counts from the joint table (IncArray,
    genLD.cpp:155-172)."""
    nA_A = 2 * J[2, 2] + J[2, 1] + J[1, 2]
    nA_B = 2 * J[2, 0] + J[2, 1] + J[1, 0]
    nB_A = 2 * J[0, 2] + J[0, 1] + J[1, 2]
    nB_B = 2 * J[0, 0] + J[0, 1] + J[1, 0]
    nDH2 = 2 * J[1, 1]
    return nA_A, nA_B, nB_A, nB_B, nDH2


def ld_from_joint(J: np.ndarray, method: str, return_haplo: bool = False):
    """Evaluate an LD measure from the joint table J (3,3,...)."""
    J = np.asarray(J, np.float64)
    n = J.sum((0, 1))
    with np.errstate(divide="ignore", invalid="ignore"):
        if method == "composite":
            naa = J[0].sum(0); naA = J[1].sum(0); nAA = J[2].sum(0)
            nbb = J[:, 0].sum(0); nbB = J[:, 1].sum(0); nBB = J[:, 2].sum(0)
            nAABB = J[2, 2]; naabb = J[0, 0]; naaBB = J[0, 2]; nAAbb = J[2, 0]
            delta = ((nAABB + naabb - naaBB - nAAbb) / (2 * n)
                     - (naa - nAA) * (nbb - nBB) / (2.0 * n * n))
            pa = (2 * naa + naA) / (2 * n)
            pA = 1 - pa
            pAA = nAA / n
            pb = (2 * nbb + nbB) / (2 * n)
            pB = 1 - pb
            pBB = nBB / n
            DA = pAA - pA * pA
            DB = pBB - pB * pB
            t = (pA * pa + DA) * (pB * pb + DB)
            out = np.where((n > 0) & (t > 0),
                           delta / np.sqrt(np.where(t > 0, t, 1.0)), np.nan)
        elif method == "corr":
            av = np.arange(3.0)
            X = np.einsum("a,ab...->...", av, J)
            Y = np.einsum("b,ab...->...", av, J)
            XX = np.einsum("a,ab...->...", av * av, J)
            YY = np.einsum("b,ab...->...", av * av, J)
            XY = np.einsum("a,b,ab...->...", av, av, J)
            c1 = XX - X * X / n
            c2 = YY - Y * Y / n
            val = c1 * c2
            out = np.where((n > 0) & (val > 0),
                           (XY - X * Y / n) /
                           np.sqrt(np.where(val > 0, val, 1.0)), np.nan)
        elif method == "cov":
            av = np.arange(3.0)
            X = np.einsum("a,ab...->...", av, J)
            Y = np.einsum("b,ab...->...", av, J)
            XY = np.einsum("a,b,ab...->...", av, av, J)
            out = np.where(n > 1, (XY - X * Y / n) / np.maximum(n - 1, 1),
                           np.nan)
        elif method in ("r", "dprime"):
            hc = haplo_counts(J)
            pA_A, pA_B, pB_A, pB_B = em_haplo(*hc)
            pA = pA_A + pA_B
            p_A = pA_A + pB_A
            pB = pB_A + pB_B
            p_B = pA_B + pB_B
            D = pA_A - pA * p_A
            if method == "r":
                out = D / np.sqrt(pA * p_A * pB * p_B)
            else:
                out = D / np.where(D >= 0, np.minimum(pA * p_B, pB * p_A),
                                   np.maximum(-pA * p_A, -pB * p_B))
            if return_haplo:
                return out, (pA_A, pA_B, pB_A, pB_B)
        else:
            raise ValueError(f"unknown LD method {method!r}")
    if return_haplo:
        return out, None
    return out
