"""Randomized differential soak: every count/covariance engine vs a
direct O(n^2 m) NumPy transcription of the reference's per-pair math,
over a grid of shapes (crossing the 128 padding boundary), missingness
levels (0 .. 0.95) and seeds. Not part of the pytest suite (minutes of
CPU); run ad hoc:  python tools/soak.py [--quick]

Checks (per dataset):
- ibs_num counts bit-exact vs brute force
- KING-robust kinship (between-family) vs brute force formula
- GRM GCTA vs dense mean-impute covariance with per-pair denominators
- EIGMIX IBD matrix vs the genEIGMIX.cpp:43-157 dense transcription
- Diss vs genIBS.cpp:353-418+647-683 (SumGeno/SumAFreq, diag doubled)
- KING-homo k0/k1 vs genKING.cpp:115-155,529-531
- IndivBeta (inbreeding=False) vs genBeta.cpp:92-234 ratios + baseline
- exact-PCA genmat vs the genPCA.cpp:98-181 Eigenstrat normalization
  (avg-impute, 1/sqrt(s(1-s)) scale, (n-1)/trace)
- PLINK MoM k0/k1/kinship vs a scalar Init_EPrIBD_IBS + sequential
  Est_PLINK_Kinship bounding transcription (genIBD.cpp:253-383)
- Corr GRM vs GCTA rescaled to unit diagonal (genPCA.cpp:1658-1686)
"""

import argparse
import itertools
import math
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# scalar oracles shared with the golden test suite
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def brute(g):
    """Dense per-pair references (f64)."""
    n = g.shape[1]
    v = g < 3
    gi = g.astype(np.float64)
    out = {}
    ibs0 = np.zeros((n, n), np.int64)
    ibs1 = np.zeros((n, n), np.int64)
    ibs2 = np.zeros((n, n), np.int64)
    kin = np.full((n, n), np.nan)
    for i in range(n):
        for j in range(n):
            m = v[:, i] & v[:, j]
            d = np.abs(gi[m, i] - gi[m, j])
            ibs0[i, j] = (d == 2).sum()
            ibs1[i, j] = (d == 1).sum()
            ibs2[i, j] = (d == 0).sum()
            if i != j:
                n1 = (g[m, i] == 1).sum()
                n2 = (g[m, j] == 1).sum()
                ss = ((gi[m, i] - gi[m, j]) ** 2).sum()
                if min(n1, n2) > 0:
                    kin[i, j] = 0.5 - ss / (4.0 * min(n1, n2))
    out["ibs"] = (ibs0, ibs1, ibs2)
    out["kin"] = kin

    # GCTA (genPCA.cpp:1148-1237): mean-impute, scale by p(1-p), per-pair
    # denominator = 2 * #both-valid at polymorphic loci
    with np.errstate(invalid="ignore", divide="ignore"):
        af = np.where(v, gi, np.nan)
        p = np.nanmean(af, 1) / 2.0
        poly = (p > 0) & (p < 1) & np.isfinite(p)
        x = np.where(v, gi, 2 * p[:, None]) - 2 * p[:, None]
        w = np.zeros_like(p)
        w[poly] = 1.0 / (2 * p[poly] * (1 - p[poly]))
        cov = (x * w[:, None]).T @ x
        # classic GCTA: mean over both-valid polymorphic loci of
        # (x-2p)(x-2p)/(2p(1-p)) — the factor 2 lives in the per-SNP
        # scale, NOT also in the denominator (golden-validated engine
        # convention, genPCA.cpp:1202-1236)
        denom = (v[poly].astype(np.int64).T @ v[poly]).astype(np.float64)
        out["gcta"] = np.where(denom > 0, cov / denom, np.inf * cov)

    # EIGMIX (genEIGMIX.cpp:43-157): centered outer product over
    # sum 4p(1-p) with per-pair missing correction + diag het adjustment
    with np.errstate(invalid="ignore", divide="ignore"):
        xc = np.where(v, gi - 2 * p[:, None], 0.0)
        num = xc.T @ xc
        d = 4 * p * (1 - p)
        wv = (v * d[:, None]).astype(np.float64)
        den = wv.T @ v
        het = ((g == 1) & v).sum(0)
        numd = num.copy()
        np.fill_diagonal(numd, numd.diagonal() - het)
        out["eigmix"] = numd / den

    # Diss (genIBS.cpp:353-418, gnrDiss :647-683): per valid pair-locus
    # SumGeno += g1(2-g2)+(2-g1)g2, SumAFreq += 8 p(1-p); diag doubled
    with np.errstate(invalid="ignore", divide="ignore"):
        w8 = 8.0 * p * (1 - p)
        w8 = np.where(np.isfinite(w8), w8, 0.0)
        sg = np.zeros((n, n))
        sa = np.zeros((n, n))
        for i in range(n):
            for j in range(n):
                m = v[:, i] & v[:, j]
                a, b = gi[m, i], gi[m, j]
                sg[i, j] = (a * (2 - b) + (2 - a) * b).sum()
                sa[i, j] = w8[m].sum()
        d = sg / sa
        d[np.diag_indices(n)] *= 2.0
        out["diss"] = d

    # KING-homo (genKING.cpp:115-155, 529-531): theta/k0 from the
    # p(1-p)- and (p(1-p))^2-weighted both-valid sums
    with np.errstate(invalid="ignore", divide="ignore"):
        w1 = np.where(np.isfinite(p), p * (1 - p), 0.0)
        k0 = np.full((n, n), np.nan)
        k1 = np.full((n, n), np.nan)
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                m = v[:, i] & v[:, j]
                ss = ((gi[m, i] - gi[m, j]) ** 2).sum()
                ib0 = (np.abs(gi[m, i] - gi[m, j]) == 2).sum()
                saf = w1[m].sum()
                saf2 = (w1[m] ** 2).sum()
                if saf > 0 and saf2 > 0:
                    th = 0.5 - ss / (8.0 * saf)
                    k0[i, j] = ib0 / (2.0 * saf2)
                    k1[i, j] = 2.0 - 2.0 * k0[i, j] - 4.0 * th
        out["king_homo"] = (k0, k1)

    # IndivBeta inbreeding=False (genBeta.cpp:92-234): off-diag ratio
    # 0.5*(#either-het + 2*#equal-homo)/num, diag 0.5*(2-#het)/num,
    # then beta = (r - ravg)/(1 - ravg) over the off-diagonal mean
    r = np.full((n, n), np.nan)
    for i in range(n):
        for j in range(n):
            m = v[:, i] & v[:, j]
            if not m.any():
                continue
            a, b = g[m, i], g[m, j]
            if i == j:
                r[i, i] = 0.5 * (2 - (a == 1)).sum() / m.sum()
            else:
                het_or = (a == 1) | (b == 1)
                ibs2 = (~het_or) & (a == b)
                r[i, j] = 0.5 * (het_or.sum() + 2 * ibs2.sum()) / m.sum()
    ravg = np.nanmean(r[~np.eye(n, dtype=bool)]) if n > 1 else 0.0
    out["beta"] = (r - ravg) / (1.0 - ravg)

    # exact PCA genmat (genPCA.cpp:98-181 DivideGeno/rsqrt_prod + the
    # (n-1)/trace scale at genPCA.cpp:1387-1390): avg = sum/num per SNP,
    # scale = 1/sqrt(s(1-s)) with s = avg/2 when 0 < s < 1 else 0,
    # missing -> avg (so 0 after centering)
    with np.errstate(invalid="ignore", divide="ignore"):
        num = v.sum(1)
        avg = np.where(num > 0, np.where(v, gi, 0.0).sum(1) / num, 0.0)
        s = avg * 0.5
        sc = np.where((s > 0) & (s < 1), 1.0 / np.sqrt(s * (1 - s)), 0.0)
        x = np.where(v, gi - avg[:, None], 0.0) * sc[:, None]
        cov = x.T @ x
        tr = np.trace(cov)
        out["pca_genmat"] = cov * ((n - 1) / tr) if (np.isfinite(tr)
                                                     and tr > 0) else None

    # PLINK MoM (genIBD.cpp:253-383): scalar per-SNP EPrIBS_IBD table
    # with the finite-sample correction factors, then the scalar
    # SEQUENTIAL bounding (four ifs, not elifs) per pair
    e = np.zeros((3, 3))
    nvalid = 0
    for i in range(g.shape[0]):
        AA = int(((g[i] == 2)).sum())
        AB = int(((g[i] == 1)).sum())
        BB = int(((g[i] == 0)).sum())
        # np.float64 scalars: x/0 -> inf/nan (C semantics), not a
        # python ZeroDivisionError
        Na = np.float64(2.0 * (AA + AB + BB))
        x_ = np.float64(2.0 * AA + AB)
        y_ = np.float64(2.0 * BB + AB)
        with np.errstate(invalid="ignore", divide="ignore"):
            p_ = x_ / Na if Na > 0 else np.nan
            q_ = 1.0 - p_
            c3 = (Na / (Na - 1)) * (Na / (Na - 2)) * (Na / (Na - 3)) \
                if Na > 3 else np.nan
            c2 = (Na / (Na - 1)) * (Na / (Na - 2)) if Na > 2 else np.nan
            a00 = 2 * p_**2 * q_**2 * ((x_ - 1) / x_ * (y_ - 1) / y_ * c3)
            a01 = (4 * p_**3 * q_ * ((x_ - 1) / x_ * (x_ - 2) / x_ * c3)
                   + 4 * p_ * q_**3 * ((y_ - 1) / y_ * (y_ - 2) / y_ * c3))
            a02 = (q_**4 * ((y_ - 1) / y_ * (y_ - 2) / y_ * (y_ - 3) / y_ * c3)
                   + p_**4 * ((x_ - 1) / x_ * (x_ - 2) / x_ * (x_ - 3) / x_ * c3)
                   + 4 * p_**2 * q_**2 * ((x_ - 1) / x_ * (y_ - 1) / y_ * c3))
            a11 = (2 * p_**2 * q_ * ((x_ - 1) / x_ * c2)
                   + 2 * p_ * q_**2 * ((y_ - 1) / y_ * c2))
            a12 = (p_**3 * ((x_ - 1) / x_ * (x_ - 2) / x_ * c2)
                   + q_**3 * ((y_ - 1) / y_ * (y_ - 2) / y_ * c2)
                   + p_**2 * q_ * ((x_ - 1) / x_ * c2)
                   + p_ * q_**2 * ((y_ - 1) / y_ * c2))
        vals = (a00, a01, a02, a11, a12)
        if all(np.isfinite(a) for a in vals):
            e[0, 0] += a00
            e[0, 1] += a01
            e[0, 2] += a02
            e[1, 1] += a11
            e[1, 2] += a12
            nvalid += 1
    if nvalid > 0:
        e[0, 0] /= nvalid
        e[0, 1] /= nvalid
        e[0, 2] /= nvalid
        e[1, 1] /= nvalid
        e[1, 2] /= nvalid
        e[2, 2] = 1.0
        k0m = np.zeros((n, n))
        k1m = np.zeros((n, n))
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                i0 = float(out["ibs"][0][i, j])
                i1 = float(out["ibs"][1][i, j])
                i2 = float(out["ibs"][2][i, j])
                nt = i0 + i1 + i2
                with np.errstate(invalid="ignore", divide="ignore"):
                    k0 = i0 / (e[0, 0] * nt)
                    k1 = (i1 - k0 * e[0, 1] * nt) / (e[1, 1] * nt)
                    k2 = (i2 - k0 * e[0, 2] * nt
                          - k1 * e[1, 2] * nt) / (e[2, 2] * nt)
                    if k0 > 1:
                        k0, k1, k2 = 1.0, 0.0, 0.0
                    if k1 > 1:
                        k1, k0, k2 = 1.0, 0.0, 0.0
                    if k2 > 1:
                        k2, k0, k1 = 1.0, 0.0, 0.0
                    if k0 < 0:
                        S = k1 + k2
                        k1, k2, k0 = k1 / S, k2 / S, 0.0
                    if k1 < 0:
                        S = k0 + k2
                        k0, k2, k1 = k0 / S, k2 / S, 0.0
                    if k2 < 0:
                        S = k0 + k1
                        k0, k1, k2 = k0 / S, k1 / S, 0.0
                k0m[i, j] = k0
                k1m[i, j] = k1
        out["mom"] = (k0m, k1m,
                      0.5 * (1 - k0m - k1m) + 0.25 * k1m)
    else:
        out["mom"] = None

    # Corr GRM (genPCA.cpp:1658-1686): GCTA rescaled, diag forced to 1
    with np.errstate(invalid="ignore", divide="ignore"):
        gc = out["gcta"]
        dg = np.sqrt(np.diagonal(gc))
        corr = gc / (dg[:, None] * dg[None, :])
        np.fill_diagonal(corr, 1.0)
        out["corr_grm"] = corr

    # MoM with kinship constraint (genIBD.cpp:367-377): after the
    # sequential bounding, pairs with pihat^2 < k2 are projected onto the
    # HWE line k0=(1-pihat)^2, k1=2 pihat (1-pihat)
    if out["mom"] is not None:
        k0m, k1m, _ = out["mom"]
        k0c = k0m.copy()
        k1c = k1m.copy()
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                k2 = 1.0 - k0c[i, j] - k1c[i, j]
                pihat = k1c[i, j] / 2 + k2
                if pihat * pihat < k2:
                    k0c[i, j] = (1 - pihat) ** 2
                    k1c[i, j] = 2 * pihat * (1 - pihat)
        out["mom_constrained"] = (k0c, k1c,
                                  0.5 * (1 - k0c - k1c) + 0.25 * k1c)
    else:
        out["mom_constrained"] = None
    return out


def _em_haplo_scalar(nA_A, nA_B, nB_A, nB_B, nDH2):
    """Scalar EM for one SNP pair's haplotype proportions — a fresh
    per-pair transcription of ProportionHaplo (genLD.cpp:268-331):
    same 0.01 pseudo-count init, same eps-padded log-likelihood, same
    sqrt(eps)-relative convergence tolerance, <= 1000 iterations."""
    import math as m

    eps = np.finfo(np.float64).eps
    ntot = nA_A + nA_B + nB_A + nB_B + nDH2
    if ntot <= 0:
        return (np.nan,) * 4
    if nDH2 <= 0:
        return (nA_A / ntot, nA_B / ntot, nB_A / ntot, nB_B / ntot)
    init = 0.01
    div = nA_A + nA_B + nB_A + nB_B + 4.0 * init
    a, b, c, d = ((nA_A + init) / div, (nA_B + init) / div,
                  (nB_A + init) / div, (nB_B + init) / div)
    nDH = m.floor(nDH2 / 2)

    def ll(a, b, c, d):
        return (nA_A * m.log(a + eps) + nA_B * m.log(b + eps)
                + nB_A * m.log(c + eps) + nB_B * m.log(d + eps)
                + nDH * m.log(a * d + b * c + eps))

    old = ll(a, b, c, d)
    contol = max(abs(m.sqrt(eps) * old), eps)
    for _ in range(1000):
        p_ad, p_bc = a * d, b * c
        ndh_ad = p_ad / (p_ad + p_bc) * nDH if p_ad + p_bc > 0 else 0.0
        ndh_bc = nDH - ndh_ad
        a = (nA_A + ndh_ad) / ntot
        b = (nA_B + ndh_bc) / ntot
        c = (nB_A + ndh_bc) / ntot
        d = (nB_B + ndh_ad) / ntot
        new = ll(a, b, c, d)
        if abs(new - old) <= contol:
            break
        old = new
    return a, b, c, d


def brute_ld_pair(g1, g2, method):
    """One SNP pair's LD by direct scalar counting — fresh transcriptions
    of genLD.cpp: composite (:215-250), corr/cov (:477-526), r/dprime via
    the scalar EM haplotype proportions (:268-444). g1/g2: (n,) uint8."""
    import math as m

    v = (g1 < 3) & (g2 < 3)
    a, b = g1[v].astype(np.int64), g2[v].astype(np.int64)
    n = int(v.sum())
    J = np.zeros((3, 3), np.int64)
    for x, y in zip(a, b):
        J[x, y] += 1
    if method == "composite":
        if n == 0:
            return np.nan
        naa, naA, nAA = J[0].sum(), J[1].sum(), J[2].sum()
        nbb, nbB, nBB = J[:, 0].sum(), J[:, 1].sum(), J[:, 2].sum()
        delta = ((J[2, 2] + J[0, 0] - J[0, 2] - J[2, 0]) / (2.0 * n)
                 - (naa - nAA) * (nbb - nBB) / (2.0 * n * n))
        pa = (2 * naa + naA) / (2.0 * n)
        pb = (2 * nbb + nbB) / (2.0 * n)
        DA = nAA / n - (1 - pa) ** 2
        DB = nBB / n - (1 - pb) ** 2
        t = ((1 - pa) * pa + DA) * ((1 - pb) * pb + DB)
        return delta / m.sqrt(t) if t > 0 else np.nan
    if method in ("corr", "cov"):
        X, Y = a.sum(), b.sum()
        XX, YY, XY = (a * a).sum(), (b * b).sum(), (a * b).sum()
        if method == "cov":
            return (XY - X * Y / n) / (n - 1) if n > 1 else np.nan
        c1 = XX - X * X / n if n > 0 else np.nan
        c2 = YY - Y * Y / n if n > 0 else np.nan
        val = c1 * c2
        return (XY - X * Y / n) / m.sqrt(val) \
            if (n > 0 and val > 0) else np.nan
    # r / dprime: known haplotypes from the off-double-het cells
    # (IncArray, genLD.cpp:155-172)
    nA_A = 2 * J[2, 2] + J[2, 1] + J[1, 2]
    nA_B = 2 * J[2, 0] + J[2, 1] + J[1, 0]
    nB_A = 2 * J[0, 2] + J[0, 1] + J[1, 2]
    nB_B = 2 * J[0, 0] + J[0, 1] + J[1, 0]
    pA_A, pA_B, pB_A, pB_B = _em_haplo_scalar(
        float(nA_A), float(nA_B), float(nB_A), float(nB_B),
        float(2 * J[1, 1]))
    pA, p_A = pA_A + pA_B, pA_A + pB_A
    pB, p_B = pB_A + pB_B, pA_B + pB_B
    D = np.float64(pA_A - pA * p_A)
    with np.errstate(divide="ignore", invalid="ignore"):
        if method == "r":
            return D / np.sqrt(np.float64(pA * p_A * pB * p_B))
        lim = np.float64(min(pA * p_B, pB * p_A) if D >= 0
                         else max(-pA * p_A, -pB * p_B))
        return D / lim


def one(seed, n_snp, n_samp, miss):
    from snprelate_tpu import eigmix, grm, ibd_king, ibs_num
    from snprelate_tpu.io.store import create_geno

    rng = np.random.default_rng(seed)
    p = rng.uniform(0.02, 0.98, n_snp)
    g = (rng.random((n_snp, n_samp)) < p[:, None]).astype(np.uint8)
    g += (rng.random((n_snp, n_samp)) < p[:, None]).astype(np.uint8)
    g[rng.random((n_snp, n_samp)) < miss] = 3
    data = create_geno(
        g, sample_id=[f"s{i}" for i in range(n_samp)],
        snp_id=np.arange(n_snp), snp_position=np.arange(n_snp) * 10 + 1,
        snp_chromosome=np.ones(n_snp, np.int32))
    kw = dict(autosome_only=False, remove_monosnp=False,
              missing_rate=np.nan)
    b = brute(g)

    r = ibs_num(data, **kw)
    for got, want in zip((r.ibs0, r.ibs1, r.ibs2), b["ibs"]):
        np.testing.assert_array_equal(got, want)

    k = ibd_king(data, type="KING-robust", **kw)
    kin = np.asarray(k.kinship, float).copy()
    np.fill_diagonal(kin, np.nan)
    want = b["kin"].copy()
    np.fill_diagonal(want, np.nan)
    np.testing.assert_allclose(kin, want, rtol=1e-12, equal_nan=True)

    gg = grm(data, method="GCTA", **kw)
    got = np.asarray(gg.grm, float)
    want = b["gcta"]
    fin = np.isfinite(want) & np.isfinite(got)
    np.testing.assert_allclose(got[fin], want[fin], rtol=1e-9, atol=1e-12)

    em = eigmix(data, ibdmat=True, eigen_cnt=0, **kw)
    got = np.asarray(em.ibd, float)
    want = b["eigmix"]
    fin = np.isfinite(want) & np.isfinite(got)
    np.testing.assert_allclose(got[fin], want[fin], rtol=1e-9, atol=1e-12)

    from snprelate_tpu import diss as diss_fn
    from snprelate_tpu import indiv_beta

    dd = np.asarray(diss_fn(data, **kw).diss, float)
    want = b["diss"]
    fin = np.isfinite(want) & np.isfinite(dd)
    np.testing.assert_allclose(dd[fin], want[fin], rtol=1e-9, atol=1e-12)

    kh = ibd_king(data, type="KING-homo", **kw)
    for got, want in zip((kh.k0, kh.k1), b["king_homo"]):
        got = np.asarray(got, float).copy()
        np.fill_diagonal(got, np.nan)
        fin = np.isfinite(want) & np.isfinite(got)
        np.testing.assert_allclose(got[fin], want[fin], rtol=1e-9,
                                   atol=1e-12)

    if np.isfinite(b["beta"]).all() and n_samp > 1:
        bt = indiv_beta(data, inbreeding=False, **kw)
        np.testing.assert_allclose(np.asarray(bt.beta, float), b["beta"],
                                   rtol=1e-9, atol=1e-12)

    from snprelate_tpu import ibd_mom, pca

    if b["pca_genmat"] is not None and n_samp > 1:
        pr = pca(data, genmat_only=True, need_genmat=True, **kw)
        np.testing.assert_allclose(np.asarray(pr.genmat, float),
                                   b["pca_genmat"], rtol=1e-9, atol=1e-12)

    if b["mom"] is not None:
        mm = ibd_mom(data, kinship=True, **kw)
        for got, want in zip((mm.k0, mm.k1, mm.kinship), b["mom"]):
            got = np.asarray(got, float)
            fin = np.isfinite(want) & np.isfinite(got)
            np.testing.assert_array_equal(np.isfinite(want),
                                          np.isfinite(got))
            np.testing.assert_allclose(got[fin], want[fin], rtol=1e-9,
                                       atol=1e-12)

    cg = grm(data, method="Corr", **kw)
    got = np.asarray(cg.grm, float)
    want = b["corr_grm"]
    fin = np.isfinite(want) & np.isfinite(got)
    np.testing.assert_allclose(got[fin], want[fin], rtol=1e-9, atol=1e-12)

    if b["mom_constrained"] is not None:
        mc = ibd_mom(data, kinship=True, kinship_constraint=True, **kw)
        for got, want in zip((mc.k0, mc.k1, mc.kinship),
                             b["mom_constrained"]):
            got = np.asarray(got, float)
            fin = np.isfinite(want) & np.isfinite(got)
            np.testing.assert_array_equal(np.isfinite(want),
                                          np.isfinite(got))
            np.testing.assert_allclose(got[fin], want[fin], rtol=1e-9,
                                       atol=1e-12)

    # LD: full matrix (all 5 measures) + banded vs the dense values, on
    # the first <= 40 SNPs (the brute side is O(pairs x n) scalar EMs)
    from snprelate_tpu import ld_mat

    ns = min(n_snp, 40)
    sub = np.arange(ns)
    for method in ("composite", "corr", "cov", "r", "dprime"):
        lm = ld_mat(data, snp_id=sub, slide=-1, method=method)
        want = np.empty((ns, ns))
        for i in range(ns):
            for j in range(i, ns):
                want[i, j] = want[j, i] = brute_ld_pair(g[i], g[j],
                                                        method)
        got = np.asarray(lm.LD, float)
        offd = ~np.eye(ns, dtype=bool)  # the diagonal is never consumed
        fin = np.isfinite(want) & np.isfinite(got) & offd
        np.testing.assert_array_equal(np.isfinite(want) & offd, fin)
        np.testing.assert_allclose(got[fin], want[fin], rtol=1e-9,
                                   atol=1e-12)
        if method == "composite" and ns > 8:
            bd = np.asarray(ld_mat(data, snp_id=sub, slide=7,
                                   method=method).LD, float)
            for k in range(7):
                for i in range(ns - k - 1):
                    w, got_v = want[i, i + k + 1], bd[k, i]
                    if np.isfinite(w) or np.isfinite(got_v):
                        np.testing.assert_allclose(got_v, w, rtol=1e-9,
                                                   atol=1e-12)

    # cross (serving) engine: last q samples as queries vs the rest as
    # the cohort — rectangular counters bit-exact vs brute per-pair
    # counting, KING-robust kinship vs the genKING.cpp:634-638 formula
    if n_samp >= 4:
        from snprelate_tpu.models.king import king_cross
        from snprelate_tpu.ops.pairwise import cross_pair_counts
        from snprelate_tpu.workspace import init_workspace

        q = max(1, n_samp // 8)
        nc = n_samp - q
        cohort_ids = [f"s{i}" for i in range(nc)]
        qg = np.ascontiguousarray(g[:, nc:].T)  # (q, n_snp)
        ws_c, _ = init_workspace(data, sample_id=cohort_ids,
                                 autosome_only=False,
                                 remove_monosnp=False,
                                 missing_rate=np.nan)
        cc = cross_pair_counts(ws_c, qg)
        vv_ = g < 3
        gf = g.astype(np.float64)
        ib0 = np.zeros((q, nc), np.int64)
        ib1 = np.zeros((q, nc), np.int64)
        ib2 = np.zeros((q, nc), np.int64)
        kin = np.full((q, nc), np.nan)
        for qi in range(q):
            for j in range(nc):
                m = vv_[:, nc + qi] & vv_[:, j]
                d = np.abs(gf[m, nc + qi] - gf[m, j])
                ib0[qi, j] = (d == 2).sum()
                ib1[qi, j] = (d == 1).sum()
                ib2[qi, j] = (d == 0).sum()
                n1 = (g[m, nc + qi] == 1).sum()
                n2 = (g[m, j] == 1).sum()
                if min(n1, n2) > 0:
                    kin[qi, j] = 0.5 - (d ** 2).sum() / (4.0 * min(n1, n2))
        np.testing.assert_array_equal(np.asarray(cc.ibs0), ib0)
        np.testing.assert_array_equal(np.asarray(cc.ibs1), ib1)
        np.testing.assert_array_equal(np.asarray(cc.ibs2), ib2)
        kc = king_cross(data, qg, sample_id=cohort_ids,
                        autosome_only=False, remove_monosnp=False,
                        missing_rate=np.nan)
        got = np.asarray(kc.kinship, float)
        fin = np.isfinite(kin) & np.isfinite(got)
        np.testing.assert_array_equal(np.isfinite(kin), np.isfinite(got))
        np.testing.assert_allclose(got[fin], kin[fin], rtol=1e-12)

    # --- Fst, both methods, vs the scalar genFst.cpp transcriptions
    # (oracles shared with tests/test_golden_tail.py). Random 2-3
    # population assignment; empty-pop SNPs nan on both sides.
    if n_samp >= 6:
        from snprelate_tpu.models.fst import fst as fst_fn
        from test_golden_tail import _wc84_snp, _wh02_beta, _wh02_snp

        n_pop = 2 + (seed % 2)
        codes = np.asarray([i % n_pop for i in range(n_samp)])
        rng.shuffle(codes)
        pops = np.asarray([f"p{c}" for c in codes], object)

        res = fst_fn(data, population=pops, method="W&C84", **kw)
        num = den = 0.0
        snp_ref = np.full(n_snp, np.nan)
        for i in range(n_snp):
            r = _wc84_snp(g[i], codes, n_pop)
            if r is not None:
                num += r[0]
                den += r[1]
                snp_ref[i] = r[0] / r[1] if r[1] != 0 else np.nan
        with np.errstate(invalid="ignore", divide="ignore"):
            np.testing.assert_allclose(res.FstSNP, snp_ref, rtol=1e-9,
                                       atol=1e-12, equal_nan=True)
            if den != 0:
                np.testing.assert_allclose(res.Fst, num / den, rtol=1e-9)

        res = fst_fn(data, population=pops, method="W&H02", **kw)
        sum_h = np.zeros((n_pop, n_pop))
        snp_ref = np.full(n_snp, np.nan)
        any_ok = False
        for i in range(n_snp):
            H = _wh02_snp(g[i], codes, n_pop)
            if H is not None:
                with np.errstate(invalid="ignore", divide="ignore"):
                    snp_ref[i] = _wh02_beta(H, n_pop)[0]
                sum_h += H
                any_ok = True
        np.testing.assert_allclose(res.FstSNP, snp_ref, rtol=1e-9,
                                   atol=1e-12, equal_nan=True)
        if any_ok:
            total, beta = _wh02_beta(sum_h, n_pop)
            np.testing.assert_allclose(res.Fst, total, rtol=1e-9)
            np.testing.assert_allclose(res.Beta, beta, rtol=1e-9,
                                       atol=1e-12)

    # --- HWE exact test vs the independent log-gamma enumeration.
    # Ties: two het classes can have EXACTLY equal probability (symmetric
    # counts); the recurrence and the lgamma arithmetic then disagree by
    # roundoff on `<= p_obs`, flipping a whole class in/out of the tail.
    # Accept any value inside the [exclusive, inclusive] tie band.
    from snprelate_tpu.models.hwe import hwe as hwe_fn

    def _hwe_band(n_ab, n_aa, n_bb):
        n = n_ab + n_aa + n_bb
        if n <= 0:
            return np.nan, np.nan
        rare = 2 * min(n_aa, n_bb) + n_ab
        lg = math.lgamma

        def logp(h):
            r_hom = (rare - h) // 2
            c_hom = n - h - r_hom
            return (lg(n + 1) - lg(r_hom + 1) - lg(h + 1) - lg(c_hom + 1)
                    + h * math.log(2) + lg(rare + 1)
                    + lg(2 * n - rare + 1) - lg(2 * n + 1))

        hs = list(range(rare % 2, rare + 1, 2))
        ps = np.asarray([math.exp(logp(h)) for h in hs])
        ps /= ps.sum()
        obs = ps[hs.index(n_ab)]
        lo = min(ps[ps <= obs * (1 - 1e-9)].sum() + obs, 1.0)
        hi = min(ps[ps <= obs * (1 + 1e-9)].sum(), 1.0)
        return lo, hi

    pv = np.asarray(hwe_fn(data, sample_id=None, snp_id=None), float)
    for i in range(n_snp):
        lo, hi = _hwe_band(int((g[i] == 1).sum()), int((g[i] == 0).sum()),
                           int((g[i] == 2).sum()))
        if not np.isfinite(lo):
            assert not np.isfinite(pv[i]), (i, pv[i])
        else:
            assert lo - 1e-9 <= pv[i] <= hi + 1e-9, (i, pv[i], lo, hi)

    # --- inbreeding estimators vs the scalar gnrIndInb transcriptions
    if n_samp >= 2:
        from snprelate_tpu.models.inbreeding import ind_inb
        from snprelate_tpu.workspace import init_workspace, snp_stats
        from test_golden_tail import _inb_loop, _inb_mle_scalar

        ws_i, _ = init_workspace(data, autosome_only=False,
                                 remove_monosnp=False,
                                 missing_rate=np.nan)
        af, _, _, _ = snp_stats(ws_i)  # allele frequency (not dosage mean)
        af = np.asarray(af, float)
        geno_i = ws_i.geno()
        with np.errstate(invalid="ignore", divide="ignore"):
            def _inb_or_nan(col, method):
                try:
                    return _inb_loop(geno_i[:, col], af, method)
                except ZeroDivisionError:  # no usable locus: 0.0/0.0
                    return np.nan

            for method in ("mom.weir", "mom.visscher", "gcta1", "gcta2",
                           "gcta3"):
                res = ind_inb(data, method=method, **kw)
                ref = np.asarray([_inb_or_nan(j, method)
                                  for j in range(n_samp)])
                got = np.asarray(res.inbreeding, float)
                fin = np.isfinite(ref) & np.isfinite(got)
                np.testing.assert_array_equal(np.isfinite(ref), fin,
                                              err_msg=method)
                np.testing.assert_allclose(got[fin], ref[fin], rtol=1e-9,
                                           atol=1e-12, err_msg=method)
            if miss <= 0.5:
                reltol = np.finfo(float).eps ** 0.75
                res = ind_inb(data, method="mle", reltol=reltol, **kw)
                ref = np.asarray([
                    _inb_mle_scalar(geno_i[:, j], af, reltol)
                    for j in range(n_samp)])
                got = np.asarray(res.inbreeding, float)
                fin = np.isfinite(ref) & np.isfinite(got)
                # the EM stops on loglik movement, so near-zero F
                # estimates agree only to the convergence resolution
                # (vectorized and scalar loops take different final
                # steps); atol covers that floor
                np.testing.assert_allclose(got[fin], ref[fin], rtol=1e-4,
                                           atol=1e-6, err_msg="mle")

    # --- IBD MLE: EM vs the literal scalar EMAlg port; the numpy batch
    # NM vs the device while_loop NM (two independent implementations),
    # both at small iteration budgets
    if n_samp >= 4:
        from snprelate_tpu.models.ibd_mle import (
            _gather_pr, em_3state, mle_allele_freq, pr_ibd_table,
            simplex_3state_batch, simplex_3state_dev)
        from test_ibd_mle import _scalar_em

        af_m = mle_allele_freq(g, None)
        table = pr_ibd_table(af_m)
        gT = np.where(g < 3, g, 3).T.astype(np.intp)
        npair = min(4, n_samp * (n_samp - 1) // 2)
        ii = rng.integers(0, n_samp, 4 * npair)
        jj = rng.integers(0, n_samp, 4 * npair)
        keep = ii != jj
        ii, jj = ii[keep][:npair], jj[keep][:npair]
        if len(ii):
            both = ((g[:, ii] < 3) & (g[:, jj] < 3)).sum(0)
            ok_pairs = both >= 2
            ii, jj = ii[ok_pairs], jj[ok_pairs]
        if len(ii):
            # at extreme missingness a pair can have zero loci with a
            # positive mixture row (the scalar EM divides by that count)
            pr_all = _gather_pr(table, gT[ii], gT[jj])
            live = (pr_all.sum(-1) > 0).sum(-1) >= 2
            ii, jj = ii[live], jj[live]
        if len(ii):
            pr = _gather_pr(table, gT[ii], gT[jj])
            reltol = math.sqrt(np.finfo(float).eps)
            k0 = rng.uniform(0.1, 0.8, len(ii))
            k1 = rng.uniform(0.05, 1 - k0)
            k0o, k1o, ll, _ = em_3state(pr, k0.copy(), k1.copy(), 25,
                                        reltol, loglik_adjust=False)
            for b in range(len(ii)):
                sk0, sk1, sll = _scalar_em(pr[b], k0[b], k1[b], 25,
                                           reltol)
                np.testing.assert_allclose(k0o[b], sk0, rtol=1e-10,
                                           atol=1e-12)
                np.testing.assert_allclose(k1o[b], sk1, rtol=1e-10,
                                           atol=1e-12)
                np.testing.assert_allclose(ll[b], sll, rtol=1e-10)
            if seed % 3 == 0:  # device-NM compile cost: subsample
                import jax.numpy as jnp

                prn = pr.copy()
                prn[:, :, 0] -= pr[:, :, 2]
                prn[:, :, 1] -= pr[:, :, 2]
                ref = simplex_3state_batch(prn, k0.copy(), k1.copy(),
                                           40, reltol, False)
                dev = simplex_3state_dev(
                    jnp.asarray(table), jnp.asarray(g[:, ii].T),
                    jnp.asarray(g[:, jj].T), k0.copy(), k1.copy(), 40,
                    reltol, False)
                # f64 CPU: converged loglik agrees tightly; k within the
                # simplex-collapse resolution; trajectories mostly exact
                # (XLA reduction-order near-ties flip rarely, STATUS.md)
                np.testing.assert_allclose(np.asarray(dev[2]), ref[2],
                                           rtol=1e-8, atol=1e-10)
                np.testing.assert_allclose(np.asarray(dev[0]), ref[0],
                                           atol=1e-3)
                exact = (np.abs(np.asarray(dev[0]) - ref[0]) < 1e-9)
                assert exact.mean() >= 0.5, f"device NM: {exact.mean()}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    a = ap.parse_args()
    shapes = [(64, 2), (63, 3), (130, 5), (257, 127), (96, 128),
              (1025, 129), (300, 37), (64, 257)]
    misses = [0.0, 0.05, 0.5, 0.95]
    seeds = [1] if a.quick else [1, 2, 3]
    cases = list(itertools.product(seeds, shapes, misses))
    for idx, (seed, (n_snp, n_samp), miss) in enumerate(cases):
        one(seed * 1000 + idx, n_snp, n_samp, miss)
        print(f"ok {idx + 1}/{len(cases)}: snp={n_snp} samp={n_samp} "
              f"miss={miss}", flush=True)
    print(f"SOAK PASS: {len(cases)} datasets x 19 engine families "
          f"(counts/KING-robust/KING-homo/GCTA/EIGMIX/Diss/IndivBeta/"
          f"PCA-genmat/MoM/MoM-constrained/Corr-GRM/LD 5 measures+banded/"
          f"cross counts/KING-cross/Fst WC84+WH02/HWE/inbreeding x6/"
          f"IBD-MLE EM/NM batch-vs-device)")


if __name__ == "__main__":
    main()
