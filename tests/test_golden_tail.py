"""Golden-grade long-tail tests (VERDICT r1 #4): independent dense-numpy
scalar transcriptions of the reference algorithms — Fst WC84/WH02+Beta
(genFst.cpp:56-166), all 10 pair-score tables (genIBS.cpp:711-891), the 6
inbreeding estimators (genIBD.cpp:1330-1439, 1898-2001), and the exact HWE
test re-derived through log-gamma enumeration (vs the genHWE.cpp recurrence
port). Each asserts numeric equality, not ranges — the reference's own
cross-validation style (test_Func.R:15-31)."""

import math

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# Fst


def _wc84_snp(g, pop_codes, n_pop):
    """Literal WC84 per-SNP transcription (genFst.cpp:56-99).
    Returns (num, den) or None when a population has no data."""
    acnt = np.zeros(n_pop)
    cnt = np.zeros(n_pop)
    for j, gg in enumerate(g):
        if gg <= 2:
            acnt[pop_codes[j]] += gg
            cnt[pop_codes[j]] += 2
    if (cnt == 0).any():
        return None
    p = acnt / cnt
    cnt_tol = cnt.sum()
    p_all = acnt.sum() / cnt_tol
    msb = (cnt * (p - p_all) ** 2).sum() / (n_pop - 1)
    msw = (cnt * p * (1 - p)).sum() / (cnt_tol - n_pop)
    n_c = (cnt_tol - (cnt**2).sum() / cnt_tol) / (n_pop - 1)
    return msb - msw, msb + (n_c - 1) * msw


def _wh02_snp(g, pop_codes, n_pop):
    """Literal WH02 per-SNP H matrix (genFst.cpp:103-141)."""
    acnt = np.zeros(n_pop)
    cnt = np.zeros(n_pop)
    for j, gg in enumerate(g):
        if gg <= 2:
            acnt[pop_codes[j]] += gg
            cnt[pop_codes[j]] += 2
    if (cnt == 0).any():
        return None
    p = acnt / cnt
    H = np.zeros((n_pop, n_pop))
    for k1 in range(n_pop):
        H[k1, k1] = 2.0 * cnt[k1] / (cnt[k1] - 1) * p[k1] * (1 - p[k1])
        for k2 in range(k1 + 1, n_pop):
            H[k1, k2] = p[k1] + p[k2] - 2 * p[k1] * p[k2]
    return H


def _wh02_beta(H, n_pop):
    """WH02_beta (genFst.cpp:144-166). Returns (fst, beta matrix)."""
    h_w = sum(H[k, k] for k in range(n_pop)) / n_pop
    h_b = sum(H[k1, k2] for k1 in range(n_pop)
              for k2 in range(k1 + 1, n_pop)) / (n_pop * (n_pop - 1) / 2)
    beta = np.zeros((n_pop, n_pop))
    for k1 in range(n_pop):
        for k2 in range(k1, n_pop):
            beta[k1, k2] = beta[k2, k1] = 1 - H[k1, k2] / h_b
    return 1 - h_w / h_b, beta


@pytest.fixture(scope="module")
def fst_setup(hapmap):
    from snprelate_tpu.workspace import init_workspace

    pops = np.asarray(hapmap.sample_annot["pop.group"], object)
    sid = hapmap.sample_id
    ws, _ = init_workspace(hapmap, sample_id=sid, autosome_only=True,
                           remove_monosnp=True, missing_rate=0.01)
    pos = {s: i for i, s in enumerate(np.asarray(sid, object).tolist())}
    pop_sel = np.asarray([pops[pos[s]] for s in ws.sample_id.tolist()],
                         object)
    levels = sorted(set(pop_sel.tolist()), key=str)
    codes = np.asarray([levels.index(p) for p in pop_sel.tolist()])
    return ws.geno(), pops, codes, len(levels)


def test_fst_wc84_golden(hapmap, fst_setup):
    from snprelate_tpu.models.fst import fst

    geno, pops, codes, n_pop = fst_setup
    res = fst(hapmap, population=pops, method="W&C84",
              sample_id=hapmap.sample_id)
    num_sum = den_sum = 0.0
    snp_ref = np.full(geno.shape[0], np.nan)
    for i in range(geno.shape[0]):
        r = _wc84_snp(geno[i], codes, n_pop)
        if r is not None:
            num_sum += r[0]
            den_sum += r[1]
            snp_ref[i] = r[0] / r[1]
    np.testing.assert_allclose(res.FstSNP, snp_ref, rtol=1e-12)
    np.testing.assert_allclose(res.Fst, num_sum / den_sum, rtol=1e-12)
    np.testing.assert_allclose(res.MeanFst, np.nanmean(snp_ref), rtol=1e-12)
    assert np.isfinite(res.Fst)


def test_fst_wh02_golden(hapmap, fst_setup):
    from snprelate_tpu.models.fst import fst

    geno, pops, codes, n_pop = fst_setup
    res = fst(hapmap, population=pops, method="W&H02",
              sample_id=hapmap.sample_id)
    sum_h = np.zeros((n_pop, n_pop))
    snp_ref = np.full(geno.shape[0], np.nan)
    for i in range(geno.shape[0]):
        H = _wh02_snp(geno[i], codes, n_pop)
        if H is not None:
            snp_ref[i] = _wh02_beta(H, n_pop)[0]
            sum_h += H
    total, beta = _wh02_beta(sum_h, n_pop)
    np.testing.assert_allclose(res.FstSNP, snp_ref, rtol=1e-12)
    np.testing.assert_allclose(res.Fst, total, rtol=1e-12)
    np.testing.assert_allclose(res.Beta, beta, rtol=1e-12)
    np.testing.assert_allclose(res.MeanFst, np.nanmean(snp_ref), rtol=1e-12)


# ---------------------------------------------------------------------------
# Pair score — the 10 scoring matrices (gnrPairScore, genIBS.cpp:711-891)

_M = math.nan
_REF_TABLES = {
    # transcribed from genIBS.cpp:716-737 (rows g1, cols g2)
    ("IBS", True): [[2, 1, 0], [1, 2, 1], [0, 1, 2]],
    ("IBS", False): [[1, 1, 0], [1, 1, 1], [0, 1, 1]],
    ("GVH", True): [[0, 0, 2], [1, 0, 1], [2, 0, 0]],
    ("GVH", False): [[0, 0, 1], [1, 0, 1], [1, 0, 0]],
    ("HVG", True): [[0, 1, 2], [0, 0, 0], [2, 1, 0]],
    ("HVG", False): [[0, 1, 1], [0, 0, 0], [1, 1, 0]],
    ("GVH.major", None): [[0, 0, 0], [1, 0, 0], [1, 0, 0]],
    ("GVH.minor", None): [[0, 0, 1], [0, 0, 1], [0, 0, 0]],
    ("GVH.major.only", None): [[0, 0, _M], [1, 0, _M], [1, 0, 0]],
    ("GVH.minor.only", None): [[0, 0, 1], [_M, 0, 1], [_M, 0, 0]],
}


def _pair_score_loop(geno, c1, c2, method, dosage):
    """Literal per-SNP scalar transcription incl. the flap_allele major
    flip (genIBS.cpp:690-708): per SNP, over the PAIR samples only, flip
    so A is the major allele; then table-lookup per pair."""
    need_major = method.startswith("GVH.")
    table = _REF_TABLES[(method, None if need_major else dosage)]
    n_snp = geno.shape[0]
    out = np.full((n_snp, len(c1)), np.nan)
    for i in range(n_snp):
        g = geno[i].astype(int).copy()
        if need_major:
            gsum = n = 0
            for j in range(len(c1)):
                for gg in (g[c1[j]], g[c2[j]]):
                    if gg < 3:
                        n += 1
                        gsum += gg
            if gsum < n:
                g = np.where(g < 3, 2 - g, g)
        for j in range(len(c1)):
            g1, g2 = g[c1[j]], g[c2[j]]
            if g1 < 3 and g2 < 3:
                out[i, j] = table[g1][g2]
    return out


def test_pair_score_all_tables_golden(hapmap):
    from snprelate_tpu.models.misc import pair_score
    from snprelate_tpu.workspace import init_workspace

    s1 = hapmap.sample_id[:6]
    s2 = hapmap.sample_id[6:12]
    snp_sel = hapmap.snp_id[:400]
    ws, _ = init_workspace(hapmap, sample_id=list(s1) + list(s2),
                           snp_id=snp_sel, autosome_only=False,
                           remove_monosnp=False)
    geno = ws.geno()
    pos = {s: i for i, s in enumerate(ws.sample_id.tolist())}
    c1 = np.asarray([pos[s] for s in s1])
    c2 = np.asarray([pos[s] for s in s2])

    for method in ("IBS", "GVH", "HVG", "GVH.major", "GVH.minor",
                   "GVH.major.only", "GVH.minor.only"):
        for dosage in ((True, False) if not method.startswith("GVH.")
                       else (True,)):
            import warnings as _w

            ref = _pair_score_loop(geno, c1, c2, method, dosage)
            got = pair_score(hapmap, s1, s2, snp_id=snp_sel, method=method,
                             dosage=dosage, type="matrix")["score"]
            np.testing.assert_array_equal(got, ref.T, err_msg=method)
            with _w.catch_warnings():
                # all-NaN slices in the *.only tables legitimately give
                # NaN reference stats
                _w.simplefilter("ignore", RuntimeWarning)
                # per.pair stats vs dense nan-stats on the same scores
                pp = pair_score(hapmap, s1, s2, snp_id=snp_sel,
                                method=method, dosage=dosage,
                                type="per.pair")["score"]
                np.testing.assert_allclose(
                    pp["Avg"], np.nanmean(ref, axis=0), rtol=1e-12)
                np.testing.assert_allclose(
                    pp["SD"], np.nanstd(ref, axis=0, ddof=1), rtol=1e-12)
                np.testing.assert_array_equal(
                    pp["Num"], np.isfinite(ref).sum(0))
                # per.snp stats
                ps = pair_score(hapmap, s1, s2, snp_id=snp_sel,
                                method=method, dosage=dosage,
                                type="per.snp")["score"]
                np.testing.assert_allclose(
                    ps[0], np.nanmean(ref, axis=1), rtol=1e-12)
                np.testing.assert_allclose(
                    ps[1], np.nanstd(ref, axis=1, ddof=1), rtol=1e-12)


# ---------------------------------------------------------------------------
# Inbreeding — the 6 estimators


def _inb_loop(geno_s, af, method):
    """Literal per-sample scalar transcription (gnrIndInb loops,
    genIBD.cpp:1898-2001)."""
    acc = cnt = 0.0
    for i, g in enumerate(geno_s):
        p = af[i]
        h = 2 * p * (1 - p)
        if g > 2:
            continue
        if method == "gcta1":
            with np.errstate(divide="ignore", invalid="ignore"):
                v = (g - 2 * p) ** 2 / h - 1 if h != 0 else np.nan
        elif method == "gcta2":
            # h == 0: the reference computes 1 - g(2-g)/0.0 in IEEE
            # (0/0 -> NaN for g in {0,2}, -inf for g == 1), so the SNP
            # is always skipped by its R_FINITE guard
            # (genIBD.cpp:1936-1955)
            v = 1 - g * (2 - g) / h if h != 0 else np.nan
        elif method in ("mom.visscher", "gcta3"):
            v = (g * g - g * (1 + 2 * p) + 2 * p * p) / h if h != 0 \
                else np.nan
        elif method == "mom.weir":
            acc += g * g - g * (1 + 2 * p) + 2 * p * p
            cnt += h
            continue
        else:
            raise ValueError(method)
        if np.isfinite(v):
            acc += v
            cnt += 1
    return acc / cnt


def _inb_mle_scalar(geno_s, af, reltol):
    """Literal _inb_mle scalar port (genIBD.cpp:1393-1436)."""
    num = den = 0.0
    for i, g in enumerate(geno_s):
        if g <= 2:
            p = af[i]
            num += g * g - (1 + 2 * p) * g + 2 * p * p
            den += 2 * p * (1 - p)
    F = num / den
    if not np.isfinite(F):
        return F

    def loglik(F):
        rv = 0.0
        for i, g in enumerate(geno_s):
            p = af[i]
            if g == 0:
                val = math.log((1 - F) * (1 - p) ** 2 + F * (1 - p)) \
                    if (1 - F) * (1 - p) ** 2 + F * (1 - p) > 0 else np.nan
            elif g == 1:
                val = math.log((1 - F) * 2 * p * (1 - p)) \
                    if (1 - F) * 2 * p * (1 - p) > 0 else np.nan
            elif g == 2:
                val = math.log((1 - F) * p * p + F * p) \
                    if (1 - F) * p * p + F * p > 0 else np.nan
            else:
                continue
            if np.isfinite(val):
                rv += val
        return rv

    F = min(max(F, 0.001), 1 - 0.001)
    ll = loglik(F)
    contol = abs(ll) * reltol
    for _ in range(10000):
        old = ll
        s = 0.0
        m = 0
        for i, g in enumerate(geno_s):
            p = af[i]
            if g == 0:
                t = F / (F + (1 - p) * (1 - F))
                if np.isfinite(t):
                    s += t
                    m += 1
            elif g == 1:
                m += 1
            elif g == 2:
                t = F / (F + p * (1 - F))
                if np.isfinite(t):
                    s += t
                    m += 1
        F = s / m
        ll = loglik(F)
        if abs(ll - old) <= contol:
            break
    return F


def test_inbreeding_estimators_golden(hapmap):
    from snprelate_tpu.models.inbreeding import ind_inb
    from snprelate_tpu.workspace import init_workspace, snp_stats

    sid = hapmap.sample_id[:20]
    snp_sel = hapmap.snp_id[:1200]
    ws, _ = init_workspace(hapmap, sample_id=sid, snp_id=snp_sel,
                           autosome_only=True, remove_monosnp=True,
                           missing_rate=math.nan)
    geno = ws.geno()  # (S, N)
    af, _, _, _ = snp_stats(ws)

    for method in ("mom.weir", "mom.visscher", "gcta1", "gcta2", "gcta3"):
        res = ind_inb(hapmap, sample_id=sid, snp_id=snp_sel, method=method,
                      missing_rate=math.nan)
        assert np.array_equal(res.snp_id, ws.snp_id)
        ref = np.asarray([_inb_loop(geno[:, j], af, method)
                          for j in range(len(sid))])
        np.testing.assert_allclose(res.inbreeding, ref, rtol=1e-10,
                                   err_msg=method)

    reltol = np.finfo(float).eps ** 0.75
    res = ind_inb(hapmap, sample_id=sid, snp_id=snp_sel, method="mle",
                  missing_rate=math.nan, reltol=reltol)
    ref = np.asarray([_inb_mle_scalar(geno[:, j], af, reltol)
                      for j in range(len(sid))])
    np.testing.assert_allclose(res.inbreeding, ref, rtol=1e-8,
                               err_msg="mle")


# ---------------------------------------------------------------------------
# HWE exact test — independent log-gamma formulation


def _hwe_lgamma(n_ab, n_aa, n_bb):
    """Exact HWE p-value via direct enumeration with log-gamma factorials:
    P(het = h | n, n_rare) = n! / (n_AA! n_AB! n_BB!) * 2^h *
    n_rare! n_common! / (2n)!  — an independent formulation of the
    Wigginton test (no recurrence shared with the implementation)."""
    n = n_ab + n_aa + n_bb
    if n <= 0:
        return np.nan
    rare = 2 * min(n_aa, n_bb) + n_ab
    lg = math.lgamma

    def logp(h):
        r_hom = (rare - h) // 2
        c_hom = n - h - r_hom
        return (lg(n + 1) - lg(r_hom + 1) - lg(h + 1) - lg(c_hom + 1)
                + h * math.log(2) + lg(rare + 1) + lg(2 * n - rare + 1)
                - lg(2 * n + 1))

    hs = [h for h in range(rare % 2, rare + 1, 2)]
    ps = np.asarray([math.exp(logp(h)) for h in hs])
    ps /= ps.sum()
    obs = ps[hs.index(n_ab)]
    return min(ps[ps <= obs].sum(), 1.0)


def test_hwe_exact_golden(hapmap):
    from snprelate_tpu.models.hwe import hwe, hwe_pvalue

    # grid of triples incl. the Wigginton 2005 worked example (57,14,50)
    triples = [(57, 14, 50), (0, 10, 10), (10, 0, 0), (13, 7, 30),
               (1, 1, 1), (100, 20, 5), (3, 0, 97), (2, 49, 49),
               (0, 0, 5), (21, 9, 70)]
    for t in triples:
        got = hwe_pvalue(*t)
        ref = _hwe_lgamma(*t)
        np.testing.assert_allclose(got, ref, rtol=1e-10, err_msg=str(t))

    # and across real data: every SNP's p-value matches the lgamma form
    pv = hwe(hapmap, sample_id=hapmap.sample_id[:40],
             snp_id=hapmap.snp_id[:500])
    from snprelate_tpu.workspace import init_workspace

    ws, _ = init_workspace(hapmap, sample_id=hapmap.sample_id[:40],
                           snp_id=hapmap.snp_id[:500], autosome_only=False,
                           remove_monosnp=False)
    g = ws.geno()
    ref = np.asarray([_hwe_lgamma(int((g[i] == 1).sum()),
                                  int((g[i] == 2).sum()),
                                  int((g[i] == 0).sum()))
                      for i in range(g.shape[0])])
    np.testing.assert_allclose(pv, ref, rtol=1e-10)


# ---------------------------------------------------------------------------
# LD composite / D' / r — literal scalar transcriptions
# (PairComposite genLD.cpp:215-250, PairDPrime :418-444, PairR :361-385)


def _ld_scalar(g1, g2, method):
    v = (g1 <= 2) & (g2 <= 2)
    a, b = g1[v].astype(int), g2[v].astype(int)
    n = len(a)
    if method == "composite":
        if n == 0:
            return np.nan
        naa = int((a == 0).sum()); naA = int((a == 1).sum())
        nAA = int((a == 2).sum())
        nbb = int((b == 0).sum()); nbB = int((b == 1).sum())
        nBB = int((b == 2).sum())
        nAABB = int(((a == 2) & (b == 2)).sum())
        naabb = int(((a == 0) & (b == 0)).sum())
        naaBB = int(((a == 0) & (b == 2)).sum())
        nAAbb = int(((a == 2) & (b == 0)).sum())
        delta = (nAABB + naabb - naaBB - nAAbb) / (2 * n) \
            - (naa - nAA) * (nbb - nBB) / (2.0 * n * n)
        pa = (2 * naa + naA) / (2 * n)
        pA, pAA = 1 - pa, nAA / n
        pb = (2 * nbb + nbB) / (2 * n)
        pB, pBB = 1 - pb, nBB / n
        DA = pAA - pA * pA
        DB = pBB - pB * pB
        t = (pA * pa + DA) * (pB * pb + DB)
        return delta / math.sqrt(t) if t > 0 else np.nan
    # haplotype-based measures: counts feeding ProportionHaplo
    # (A = dosage-2 allele of snp1, B = snp2; genLD.cpp:57-172 tables)
    nA_A = nA_B = nB_A = nB_B = nDH2 = 0
    for x, y in zip(a, b):
        if x == 1 and y == 1:
            nDH2 += 2
            continue
        # each sample contributes 2 haplotypes; hets contribute one of
        # each allele
        hx = [1, 1] if x == 2 else ([0, 0] if x == 0 else [1, 0])
        hy = [1, 1] if y == 2 else ([0, 0] if y == 0 else [1, 0])
        for ha, hb in zip(hx, hy):
            if ha and hb:
                nA_A += 1
            elif ha:
                nA_B += 1
            elif hb:
                nB_A += 1
            else:
                nB_B += 1
    from snprelate_tpu.ops.ld import em_haplo

    pA_A, pA_B, pB_A, pB_B = (float(np.asarray(x).ravel()[0])
                              for x in em_haplo([nA_A], [nA_B], [nB_A],
                                                [nB_B], [nDH2]))
    pA = pA_A + pA_B
    pB = pB_A + pB_B
    p_A = pA_A + pB_A
    p_B = pA_B + pB_B
    D = pA_A - pA * p_A
    if method == "dprime":
        den = min(pA * p_B, pB * p_A) if D >= 0 \
            else max(-pA * p_A, -pB * p_B)
        return D / den
    if method == "r":
        t = pA * p_A * pB * p_B
        return D / math.sqrt(t) if t > 0 else np.nan
    raise ValueError(method)


def test_ld_pair_measures_golden(hapmap):
    from snprelate_tpu.models.ld import ld_pair
    from snprelate_tpu.workspace import init_workspace

    ws, _ = init_workspace(hapmap, sample_id=hapmap.sample_id[:90],
                           snp_id=hapmap.snp_id[:80],
                           autosome_only=False, remove_monosnp=False)
    g = ws.geno().astype(float)
    g[g == 3] = np.nan
    pairs = [(0, 1), (2, 3), (10, 40), (5, 77), (33, 34), (60, 61)]
    for method in ("composite", "dprime", "r"):
        for i, j in pairs:
            got = ld_pair(g[i], g[j], method=method)
            if isinstance(got, dict):
                got = got["ld"]
            want = _ld_scalar(ws.geno()[i], ws.geno()[j], method)
            if np.isnan(want):
                assert np.isnan(got), (method, i, j)
            else:
                np.testing.assert_allclose(got, want, rtol=1e-10,
                                           err_msg=f"{method} {i},{j}")


# ---------------------------------------------------------------------------
# Sliding windows — literal transcription of the gnrSlidingWindow loop
# (genSlideWin.cpp:77-84 SlidingNumWin, :224-266 window masks)


def _slide_ref(pos, winsize, shift, unit, winstart=None):
    """Per-chromosome window enumeration exactly as the C driver: fixed
    window count incl. empty windows, [x, x+winsize) membership
    (basepair) or index ranges (locus), per-window pos means."""
    pos = np.sort(np.asarray(pos, np.int64))

    def num_win(start, end):
        cnt = 0
        end -= winsize
        while start <= end:
            cnt += 1
            start += shift
        return cnt + 1

    if unit == "basepair":
        x = int(pos.min()) if winstart is None else int(winstart)
        n = num_win(x, int(pos.max()))
    else:
        x = 0 if winstart is None else int(winstart) - 1
        n = num_win(x, len(pos) - 1)
    wins = []
    for _ in range(n):
        if unit == "basepair":
            k = (pos >= x) & (pos < x + winsize)
            ppos = pos[k]
        else:
            ppos = pos[max(x, 0): x + winsize]
        wins.append((x, len(ppos),
                     float(ppos.mean()) if len(ppos) else np.nan))
        x += shift
    return wins


def test_sliding_window_golden(hapmap):
    from snprelate_tpu import sliding_window
    from snprelate_tpu.workspace import init_workspace

    sid = hapmap.sample_id[:25]
    snp_sel = hapmap.snp_id[:3000]
    for unit, winsize, shift in (("basepair", 2_000_000, 1_000_000),
                                 ("locus", 400, 150),
                                 ("basepair", 10**9, 10**8)):  # > span
        res = sliding_window(hapmap, "snpgdsSNPRateFreq", winsize=winsize,
                             shift=shift, unit=unit, sample_id=sid,
                             snp_id=snp_sel)
        ws, _ = init_workspace(hapmap, sample_id=sid, snp_id=snp_sel,
                               autosome_only=False, remove_monosnp=True,
                               missing_rate=math.nan)
        chrom = np.asarray(hapmap.snp_chromosome)
        posall = np.asarray(hapmap.snp_position)
        in_ws = np.zeros(hapmap.n_snp, bool)
        in_ws[ws.snp_idx] = True
        for key, r in res.items():
            ch = int(key[3:])
            pos = posall[in_ws & (chrom == ch)]
            ref = _slide_ref(pos, winsize, shift, unit)
            assert len(r["start"]) == len(ref), (key, unit)
            for w, (x, cnt, pm) in enumerate(ref):
                assert r["start"][w] == x
                assert r["n"][w] == cnt, (key, w)
                if cnt:
                    np.testing.assert_allclose(r["pos.mean"][w], pm,
                                               rtol=1e-12)
                else:
                    assert np.isnan(r["pos.mean"][w])
                    assert isinstance(r["val"][w], float) \
                        and np.isnan(r["val"][w])


# ---------------------------------------------------------------------------
# AdmixProp — independent affine-coordinates derivation (R/PCA.R:347-425)


def test_admix_prop_golden(hapmap):
    """admix_prop solves E_i = sum_g p_ig * m_g with sum_g p_ig = 1 where
    m_g are the group-mean eigenvector points. Check against an
    independent per-sample least-squares solve of that affine system,
    plus the vertex identity (a group's mean point maps to the unit
    vector of its own group)."""
    import snprelate_tpu as sr

    p = sr.pca(hapmap, eigen_cnt=8)
    pops = np.asarray(hapmap.sample_annot["pop.group"], object)
    sid = np.asarray(hapmap.sample_id, object)
    groups = {g: sid[pops == g][:40].tolist()
              for g in ("CEU", "YRI", "HCB")}
    prop = sr.admix_prop(p, groups)
    assert prop.shape == (len(sid), 3)
    np.testing.assert_allclose(prop.sum(1), 1.0, rtol=1e-10)

    # independent solve: affine coordinates via lstsq per sample
    E = p.eigenvect[:, :2]
    pos = {s: i for i, s in enumerate(sid.tolist())}
    verts = np.stack([E[[pos[s] for s in ids]].mean(0)
                      for ids in groups.values()])  # (3, 2)
    A = np.vstack([verts.T, np.ones(3)])  # (3, 3): affine system
    for i in range(0, len(sid), 17):
        b = np.concatenate([E[i], [1.0]])
        ref = np.linalg.solve(A, b)
        np.testing.assert_allclose(prop[i], ref, rtol=1e-8, atol=1e-10)

    # vertex identity: the mean point of each group -> its unit vector
    for gi, ids in enumerate(groups.values()):
        mean_prop = prop[[pos[s] for s in ids]].mean(0)
        unit = np.zeros(3)
        unit[gi] = 1.0
        np.testing.assert_allclose(mean_prop, unit, atol=1e-8)

    # bound=True clips and renormalizes
    pb = sr.admix_prop(p, groups, bound=True)
    assert (pb >= 0).all() and (pb <= 1).all()
    np.testing.assert_allclose(pb.sum(1), 1.0, rtol=1e-10)
