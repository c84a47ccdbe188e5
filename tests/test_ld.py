"""LD toolchain tests, mirroring the reference's test_LD.R cross-validation
style: LDMat cov/corr vs pairwise-complete numpy, plus invariants."""

import numpy as np


def _dense(hapmap, n_snp=300, n_samp=60):
    from snprelate_tpu.workspace import init_workspace

    ws, _ = init_workspace(hapmap, sample_id=hapmap.sample_id[:n_samp],
                           snp_id=hapmap.snp_id[:n_snp], autosome_only=False,
                           remove_monosnp=False)
    return ws, ws.geno().astype(np.float64)


def test_ldmat_cov_corr_vs_numpy(hapmap):
    """test_LD.R:14-35 analog: cov/corr with pairwise-complete obs."""
    from snprelate_tpu.models.ld import ld_mat

    ws, g = _dense(hapmap)
    gm = np.where(g < 3, g, np.nan)
    n_snp = g.shape[0]

    res_cov = ld_mat(hapmap, sample_id=ws.sample_id, snp_id=ws.snp_id,
                     slide=-1, method="cov")
    res_corr = ld_mat(hapmap, sample_id=ws.sample_id, snp_id=ws.snp_id,
                      slide=-1, method="corr")

    # numpy pairwise-complete covariance / correlation
    for i in range(0, n_snp, 37):
        for j in range(0, n_snp, 41):
            a, b = gm[i], gm[j]
            ok = np.isfinite(a) & np.isfinite(b)
            m = ok.sum()
            aa, bb = a[ok], b[ok]
            cov = ((aa - aa.mean()) * (bb - bb.mean())).sum() / (m - 1)
            np.testing.assert_allclose(res_cov.LD[i, j], cov, rtol=1e-10, atol=1e-12)
            denom = aa.std(ddof=1) * bb.std(ddof=1)
            if denom > 0:
                np.testing.assert_allclose(res_corr.LD[i, j],
                                           cov / denom, rtol=1e-8, atol=1e-10)


def test_ldmat_slide_matches_full(hapmap):
    from snprelate_tpu.models.ld import ld_mat

    ws, _ = _dense(hapmap, n_snp=120)
    full = ld_mat(hapmap, sample_id=ws.sample_id, snp_id=ws.snp_id,
                  slide=-1, method="composite")
    band = ld_mat(hapmap, sample_id=ws.sample_id, snp_id=ws.snp_id,
                  slide=25, method="composite")
    n = full.LD.shape[0]
    for i in range(n):
        for k in range(min(25, n - i - 1)):
            np.testing.assert_allclose(band.LD[k, i], full.LD[i, i + k + 1],
                                       rtol=1e-12, equal_nan=True)
    assert np.isnan(band.LD[5, n - 3])  # beyond the edge -> NaN


def test_ld_pair_methods(hapmap):
    from snprelate_tpu.models.ld import ld_pair

    ws, g = _dense(hapmap, n_snp=50)
    s1, s2 = g[0], g[1]
    for m in ("composite", "corr", "r", "dprime"):
        v = ld_pair(s1, s2, method=m)
        assert np.isfinite(v["ld"]) or np.isnan(v["ld"])
    # perfect LD with itself
    assert abs(ld_pair(s1, s1, method="r")["ld"] - 1.0) < 1e-9
    assert abs(ld_pair(s1, s1, method="dprime")["ld"] - 1.0) < 1e-9
    assert abs(ld_pair(s1, s1, method="corr")["ld"] - 1.0) < 1e-12


def test_ld_pair_em_vs_scalar_reference():
    """EM haplotype estimation against a literal scalar port of
    ProportionHaplo (genLD.cpp:268-331)."""
    import math
    from snprelate_tpu.ops.ld import em_haplo

    def scalar_em(nA_A, nA_B, nB_A, nB_B, nDH2):
        eps = np.finfo(float).eps
        plog = lambda v: math.log(v + eps)
        nTotal = nA_A + nA_B + nB_A + nB_B + nDH2
        if nTotal > 0 and nDH2 > 0:
            f = 0.01
            div = nA_A + nA_B + nB_A + nB_B + 4 * f
            a, b, c, d = ((nA_A + f) / div, (nA_B + f) / div,
                          (nB_A + f) / div, (nB_B + f) / div)
            nDH = nDH2 // 2
            ll = (nA_A * plog(a) + nA_B * plog(b) + nB_A * plog(c)
                  + nB_B * plog(d) + nDH * plog(a * d + b * c))
            tol = max(abs(math.sqrt(eps) * ll), eps)
            for _ in range(1000):
                pad, pbc = a * d, b * c
                nad = pad / (pad + pbc) * nDH
                nbc = nDH - nad
                a, b = (nA_A + nad) / nTotal, (nA_B + nbc) / nTotal
                c, d = (nB_A + nbc) / nTotal, (nB_B + nad) / nTotal
                ll2 = (nA_A * plog(a) + nA_B * plog(b) + nB_A * plog(c)
                       + nB_B * plog(d) + nDH * plog(a * d + b * c))
                if abs(ll2 - ll) <= tol:
                    break
                ll = ll2
            return a, b, c, d
        return (nA_A / nTotal, nA_B / nTotal, nB_A / nTotal, nB_B / nTotal)

    rng = np.random.default_rng(3)
    cases = rng.integers(0, 50, size=(200, 5))
    cases[:, 4] = 2 * (cases[:, 4] // 2)  # nDH2 even
    got = em_haplo(*[cases[:, k].astype(float) for k in range(5)])
    for i in range(len(cases)):
        if cases[i].sum() == 0:
            continue
        want = scalar_em(*cases[i].tolist())
        for k in range(4):
            np.testing.assert_allclose(got[k][i], want[k], rtol=1e-10,
                                       err_msg=str(cases[i]))


def test_ld_pruning_runs_and_deterministic(hapmap):
    from snprelate_tpu.models.ld import ld_pruning

    r1 = ld_pruning(hapmap, sample_id=hapmap.sample_id[:90],
                    snp_id=hapmap.snp_id[:2000], start_pos="first")
    r2 = ld_pruning(hapmap, sample_id=hapmap.sample_id[:90],
                    snp_id=hapmap.snp_id[:2000], start_pos="first")
    assert list(r1) == list(r2)
    total = 0
    for k in r1:
        assert np.array_equal(r1[k], r2[k])
        total += len(r1[k])
    assert 0 < total < 2000


def test_apart_selection():
    from snprelate_tpu.models.ld import apart_selection

    chrom = np.repeat([1, 2], 500)
    pos = np.concatenate([np.arange(500) * 1000, np.arange(500) * 1000])
    sel = apart_selection(chrom, pos, min_dist=100000, seed=1)
    for ch in (1, 2):
        p = np.sort(pos[(chrom == ch) & sel])
        assert (np.diff(p) >= 100000).all()
        assert len(p) >= 1


def test_prune_banded_equals_scalar():
    """The banded fast path must reproduce the literal window scan exactly
    (sorted positions; several window limits, methods, start points)."""
    from snprelate_tpu.models.ld import (_prune_chromosome_banded,
                                         _prune_chromosome_scalar)

    rng = np.random.default_rng(11)
    n_snp, n_samp = 400, 64
    base = rng.choice([0, 1, 2], size=(n_snp // 4, n_samp)).astype(np.uint8)
    g = np.repeat(base, 4, axis=0)
    flip = rng.random(g.shape) < 0.25
    g = np.where(flip, rng.integers(0, 4, g.shape), g).astype(np.uint8)
    pos = np.sort(rng.integers(0, 200_000, n_snp))

    for method in ("composite", "corr", "r"):
        for start in (0, 150, n_snp - 1):
            for bp, mn in ((50_000, 2**31 - 1), (500_000, 25),
                           (30_000, 60)):
                fast = _prune_chromosome_banded(
                    g, pos, start, bp, mn, 0.2, method, block=64,
                    col_tile=128)
                slow = _prune_chromosome_scalar(g, pos, start, bp, mn,
                                                0.2, method)
                assert fast is not None
                np.testing.assert_array_equal(fast, slow,
                                              err_msg=f"{method}/{start}/"
                                                      f"{bp}/{mn}")

    # unsorted positions must fall back (banded returns None)
    pos2 = pos.copy()
    pos2[10], pos2[11] = pos2[11] + 1000, pos2[10]
    assert _prune_chromosome_banded(g, pos2, 0, 50_000, 100, 0.2,
                                    "composite") is None


def test_joint_table_host_path_above_127_samples():
    """Regression: the host einsum path of joint_table wrapped int8 once a
    joint cell exceeded 127 (einsum's optimize=True contracts in the
    operand dtype, silently ignoring dtype=int64). 257 samples with
    common genotype pairs push cells past 127; the host path must match
    the device matmul path and direct counting exactly."""
    from snprelate_tpu.ops.ld import joint_table, ld_from_joint

    rng = np.random.default_rng(1028)
    n_snp, n_samp = 12, 257
    p = rng.uniform(0.02, 0.98, n_snp)
    g = (rng.random((n_snp, n_samp)) < p[:, None]).astype(np.uint8)
    g += (rng.random((n_snp, n_samp)) < p[:, None]).astype(np.uint8)
    g[rng.random((n_snp, n_samp)) < 0.1] = 3

    J_host = joint_table(g, g, use_device=False)
    J_dev = joint_table(g, g, use_device=True)
    np.testing.assert_array_equal(J_host, J_dev)
    # direct counting for one high-count pair
    direct = np.zeros((3, 3), np.int64)
    a, b = g[0], g[1]
    m = (a < 3) & (b < 3)
    for x, y in zip(a[m], b[m]):
        direct[x, y] += 1
    np.testing.assert_array_equal(J_host[:, :, 0, 1], direct)
    assert J_host.max() > 127  # the regression's trigger condition

    # corr from the host joint table == numpy pairwise-complete corr
    got = ld_from_joint(J_host[:, :, 0, 1], "corr")
    af = a[m].astype(float)
    bf = b[m].astype(float)
    want = np.corrcoef(af, bf)[0, 1]
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_packed_ld_route_equals_dense():
    """The device-resident packed route (ops/ld.PackedLD, auto-enabled
    past PACKED_LD_MIN_SAMPLES) must reproduce the dense-tile kernels
    exactly: same band decisions in the pruning scan, same ld_mat
    values. 4100 samples crosses the switch threshold."""
    import snprelate_tpu.models.ld as mld
    from snprelate_tpu.io.store import create_geno
    from snprelate_tpu.models.ld import ld_mat, ld_pruning

    rng = np.random.default_rng(11)
    n_snp, n_samp = 220, 4100
    p = rng.uniform(0.05, 0.95, n_snp)
    g = (rng.random((n_snp, n_samp)) < p[:, None]).astype(np.uint8)
    g += (rng.random((n_snp, n_samp)) < p[:, None]).astype(np.uint8)
    g[rng.random((n_snp, n_samp)) < 0.02] = 3
    # plant perfect-LD twins: even rows duplicated into the next row
    for j in range(0, 40, 2):
        g[j + 1] = g[j]
    data = create_geno(g, [f"s{i}" for i in range(n_samp)],
                       np.arange(n_snp), np.arange(n_snp) * 100,
                       np.ones(n_snp, np.int32))

    assert n_samp >= mld.PACKED_LD_MIN_SAMPLES  # packed route active
    kw = dict(autosome_only=False, remove_monosnp=False,
              maf=float("nan"), missing_rate=float("nan"))
    kept_packed = ld_pruning(data, seed=5, start_pos="first", **kw)
    band_packed = ld_mat(data, slide=16, method="composite",
                         with_id=False).LD
    full_packed = ld_mat(data, slide=-1, method="r", with_id=False).LD

    old = mld.PACKED_LD_MIN_SAMPLES
    mld.PACKED_LD_MIN_SAMPLES = 10**9  # force the dense route
    try:
        kept_dense = ld_pruning(data, seed=5, start_pos="first", **kw)
        band_dense = ld_mat(data, slide=16, method="composite",
                            with_id=False).LD
        full_dense = ld_mat(data, slide=-1, method="r", with_id=False).LD
    finally:
        mld.PACKED_LD_MIN_SAMPLES = old

    assert list(kept_packed) == list(kept_dense)
    for ch in kept_packed:
        np.testing.assert_array_equal(kept_packed[ch], kept_dense[ch])
    np.testing.assert_allclose(band_packed, band_dense, rtol=1e-12,
                               equal_nan=True)
    np.testing.assert_allclose(full_packed, full_dense, rtol=1e-12,
                               equal_nan=True)
    # the planted twins must be dropped (exactly one of each pair kept)
    kept_ids = set(np.concatenate(list(kept_packed.values())).tolist())
    for j in range(0, 40, 2):
        assert (j in kept_ids) != (j + 1 in kept_ids)
