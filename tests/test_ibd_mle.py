"""IBD MLE tests: scalar-port cross-checks and invariants."""

import math

import numpy as np


def _scalar_em(pr, k0, k1, max_iter, reltol):
    """Literal scalar port of EMAlg (genIBD.cpp:582-656), no loglik adjust."""
    k = [k0, k1, 1 - k0 - k1]

    def loglik(k0, k1):
        kk = [k0, k1, 1 - k0 - k1]
        ll = 0.0
        for row in pr:
            s = row[0] * kk[0] + row[1] * kk[1] + row[2] * kk[2]
            if s > 0:
                ll += math.log(s)
            elif row[0] > 0:
                return -math.inf
        return ll

    old = 0.0
    ll = loglik(k[0], k[1])
    if math.isfinite(ll):
        convtol = max(reltol * (abs(ll) + abs(reltol)), 0.0)
    else:
        ll, convtol = 1e8, reltol
    for _ in range(0, max_iter + 1):
        oldk = list(k)
        s0 = s1 = 0.0
        nsnp = 0
        ll = 0.0
        for row in pr:
            m = [row[0] * k[0], row[1] * k[1], row[2] * k[2]]
            ms = sum(m)
            if ms > 0:
                s0 += m[0] / ms
                s1 += m[1] / ms
                nsnp += 1
                ll += math.log(ms)
        k = [s0 / nsnp, s1 / nsnp, 1 - s0 / nsnp - s1 / nsnp]
        if abs(ll - old) <= convtol:
            k = oldk
            break
        old = ll
    return k[0], k[1], ll


def test_em_vs_scalar(hapmap):
    from snprelate_tpu.workspace import init_workspace
    from snprelate_tpu.models.ibd_mle import (pr_ibd_table, _gather_pr,
                                              em_3state, mle_allele_freq)

    ws, _ = init_workspace(hapmap, sample_id=hapmap.sample_id[:10],
                           snp_id=hapmap.snp_id[:800])
    geno = ws.geno()
    af = mle_allele_freq(geno, None)
    table = pr_ibd_table(af)
    gT = np.where(geno < 3, geno, 3).T.astype(np.intp)
    reltol = math.sqrt(np.finfo(float).eps)

    pairs = [(0, 1), (2, 7), (3, 9)]
    pr = _gather_pr(table, gT[[i for i, _ in pairs]],
                    gT[[j for _, j in pairs]])
    k0 = np.array([0.4, 0.7, 0.2])
    k1 = np.array([0.3, 0.2, 0.5])
    k0o, k1o, ll, ni = em_3state(pr, k0.copy(), k1.copy(), 1000, reltol,
                                 loglik_adjust=False)
    for b in range(3):
        sk0, sk1, sll = _scalar_em(pr[b], k0[b], k1[b], 1000, reltol)
        np.testing.assert_allclose(k0o[b], sk0, rtol=1e-10)
        np.testing.assert_allclose(k1o[b], sk1, rtol=1e-10)
        np.testing.assert_allclose(ll[b], sll, rtol=1e-10)


def test_ibd_mle_em_small(hapmap):
    from snprelate_tpu.models.ibd_mle import ibd_mle

    res = ibd_mle(hapmap, sample_id=hapmap.sample_id[:12],
                  snp_id=hapmap.snp_id[:1500], kinship=True)
    n = 12
    assert res.k0.shape == (n, n)
    iu = np.triu_indices(n, 1)
    assert np.isfinite(res.k0[iu]).all()
    assert ((res.k0[iu] >= -1e-9) & (res.k0[iu] <= 1 + 1e-9)).all()
    assert ((res.k1[iu] >= -1e-9) & (res.k1[iu] <= 1 + 1e-9)).all()
    assert (res.niter[iu] > 0).all()
    # kinship formula (R/IBD.R:67)
    np.testing.assert_allclose(
        res.kinship, 0.5 * (1 - res.k0 - res.k1) + 0.25 * res.k1)


def test_ibd_mle_simplex_and_jacquard(hapmap):
    from snprelate_tpu.models.ibd_mle import ibd_mle

    res = ibd_mle(hapmap, sample_id=hapmap.sample_id[:6],
                  snp_id=hapmap.snp_id[:800], method="downhill.simplex")
    iu = np.triu_indices(6, 1)
    assert np.isfinite(res.k0[iu]).all()
    assert ((res.k0[iu] + res.k1[iu]) <= 1 + 1e-9).all()

    rj = ibd_mle(hapmap, sample_id=hapmap.sample_id[:6],
                 snp_id=hapmap.snp_id[:800], method="Jacquard", kinship=True)
    s = sum(rj.D[f"D{i}"][iu] for i in range(1, 9))
    assert ((s >= -1e-9) & (s <= 1 + 1e-6)).all()


def test_pair_ibd_matches_matrix_em(hapmap):
    from snprelate_tpu.models.ibd_mle import ibd_mle, pair_ibd
    from snprelate_tpu.workspace import init_workspace

    res = ibd_mle(hapmap, sample_id=hapmap.sample_id[:8],
                  snp_id=hapmap.snp_id[:1000])
    ws, _ = init_workspace(hapmap, sample_id=hapmap.sample_id[:8],
                           snp_id=res.snp_id, autosome_only=False,
                           remove_monosnp=False)
    geno = ws.geno().astype(float)
    geno[geno == 3] = np.nan
    af = np.where(np.isfinite(res.afreq), res.afreq, -1)
    pv = pair_ibd(geno[:, 0], geno[:, 3], af, method="EM")
    np.testing.assert_allclose(pv["k0"], res.k0[0, 3], atol=5e-4)
    np.testing.assert_allclose(pv["k1"], res.k1[0, 3], atol=5e-4)


def test_loglik_consistency(hapmap):
    from snprelate_tpu.models.ibd_mle import ibd_mle, ibd_mle_loglik

    res = ibd_mle(hapmap, sample_id=hapmap.sample_id[:6],
                  snp_id=hapmap.snp_id[:600])
    ll_est = ibd_mle_loglik(hapmap, res)
    ll_unrel = ibd_mle_loglik(hapmap, res, relatedness="unrelated")
    iu = np.triu_indices(6, 1)
    # the MLE (with loglik adjustment) cannot be worse than 'unrelated'
    assert (ll_est[iu] >= ll_unrel[iu] - 1e-6).all()


def test_simplex_batch_equals_scalar(hapmap):
    """The batched-masked NM (simplex_3state_batch) must reproduce the
    scalar literal-port trajectory per pair: same k estimates, loglik and
    evaluation counts (the only arithmetic difference is the reduction
    order inside the log-likelihood sum)."""
    from snprelate_tpu.models.ibd_mle import (_gather_pr, mle_allele_freq,
                                              pr_ibd_table, simplex_3state,
                                              simplex_3state_batch)
    from snprelate_tpu.workspace import init_workspace

    ws, _ = init_workspace(hapmap, sample_id=hapmap.sample_id[:14],
                           snp_id=hapmap.snp_id[:800])
    geno = ws.geno()
    af = mle_allele_freq(geno, None)
    table = pr_ibd_table(af)
    gT = np.where(geno < 3, geno, 3).T.astype(np.intp)
    n = ws.n_samp
    iu = np.triu_indices(n, 1)
    rng = np.random.default_rng(11)
    k0 = rng.uniform(0.1, 0.8, len(iu[0]))
    k1 = rng.uniform(0.05, np.minimum(0.9, 1 - k0) - 0.02, len(iu[0]))
    reltol = math.sqrt(np.finfo(float).eps)

    pr = _gather_pr(table, gT[iu[0]], gT[iu[1]])
    prn = pr.copy()
    prn[:, :, 0] -= pr[:, :, 2]
    prn[:, :, 1] -= pr[:, :, 2]
    for adjust in (False, True):
        bk0, bk1, bll, bni = simplex_3state_batch(prn, k0, k1, 1000,
                                                  reltol, adjust)
        for b in range(len(iu[0])):
            sk0, sk1, sll, sni = simplex_3state(prn[b], k0[b], k1[b],
                                                1000, reltol, adjust)
            np.testing.assert_allclose(bk0[b], sk0, rtol=1e-7, atol=1e-9)
            np.testing.assert_allclose(bk1[b], sk1, rtol=1e-7, atol=1e-9)
            np.testing.assert_allclose(bll[b], sll, rtol=1e-9)
            assert bni[b] == sni, (b, bni[b], sni)


def test_ibd_mle_simplex_env_paths_agree(hapmap):
    """ibd_mle(method='downhill.simplex') default (batched) equals the
    SNPRELATE_TPU_SIMPLEX=scalar per-pair path."""
    import os

    from snprelate_tpu.models.ibd_mle import ibd_mle

    kw = dict(sample_id=hapmap.sample_id[:8], snp_id=hapmap.snp_id[:600],
              method="downhill.simplex")
    res_b = ibd_mle(hapmap, **kw)
    os.environ["SNPRELATE_TPU_SIMPLEX"] = "scalar"
    try:
        res_s = ibd_mle(hapmap, **kw)
    finally:
        del os.environ["SNPRELATE_TPU_SIMPLEX"]
    np.testing.assert_allclose(res_b.k0, res_s.k0, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(res_b.k1, res_s.k1, rtol=1e-7, atol=1e-9)
    np.testing.assert_array_equal(res_b.niter, res_s.niter)


def test_device_em_equals_numpy():
    """The jax while_loop EM (device path, f64 on CPU) must match the
    compacted numpy EM: same fixed point, revert-on-converge, niter and
    loglik-adjust semantics."""
    import jax.numpy as jnp

    from snprelate_tpu.models.ibd_mle import (_gather_pr, em_3state,
                                              em_3state_dev, em_jacquard,
                                              em_jacquard_dev, pr_ibd_table,
                                              pr_jacq_table)

    rng = np.random.default_rng(3)
    B, S = 64, 300
    af = rng.uniform(0.05, 0.95, S)
    g1 = rng.integers(0, 4, (B, S)).astype(np.uint8)
    g2 = rng.integers(0, 4, (B, S)).astype(np.uint8)
    k0 = rng.uniform(0.1, 0.8, B)
    k1 = rng.uniform(0.05, np.minimum(0.9, 1 - k0) - 0.02, B)
    reltol = float(np.sqrt(np.finfo(np.float64).eps))

    t3 = pr_ibd_table(af)
    for adjust in (False, True):
        ref = em_3state(_gather_pr(t3, g1, g2), k0.copy(), k1.copy(),
                        1000, reltol, adjust)
        dev = em_3state_dev(jnp.asarray(t3), jnp.asarray(g1),
                            jnp.asarray(g2), k0.copy(), k1.copy(),
                            1000, reltol, adjust)
        np.testing.assert_allclose(dev[0], ref[0], rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(dev[1], ref[1], rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(dev[2], ref[2], rtol=1e-8)
        np.testing.assert_array_equal(dev[3], ref[3])

    t9 = pr_jacq_table(af)
    refD, refll, refni = em_jacquard(_gather_pr(t9, g1, g2), 1000, reltol)
    devD, devll, devni = em_jacquard_dev(jnp.asarray(t9), jnp.asarray(g1),
                                         jnp.asarray(g2), 1000, reltol)
    np.testing.assert_allclose(devD, refD, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(devll, refll, rtol=1e-8)
    np.testing.assert_array_equal(devni, refni)


def test_device_nm_equals_batch():
    """The jax masked NM (simplex_3state_dev, f64 on CPU) must find the
    same optimum as the numpy batched trajectory. XLA's reduction order
    differs from numpy's pairwise sum, so near-tie NM branches can flip:
    most pairs must match the trajectory exactly (same niter), and every
    pair must agree on the converged log-likelihood (the NM convergence
    contract) with k inside the simplex-collapse resolution."""
    import jax.numpy as jnp

    from snprelate_tpu.models.ibd_mle import (pr_ibd_table, _gather_pr,
                                              simplex_3state_batch,
                                              simplex_3state_dev)

    rng = np.random.default_rng(7)
    B, S = 48, 400
    af = rng.uniform(0.05, 0.95, S)
    g1 = rng.integers(0, 4, (B, S)).astype(np.uint8)
    g2 = rng.integers(0, 4, (B, S)).astype(np.uint8)
    k0 = rng.uniform(0.1, 0.8, B)
    k1 = rng.uniform(0.05, np.minimum(0.9, 1 - k0) - 0.02, B)
    reltol = float(np.sqrt(np.finfo(np.float64).eps))

    table = pr_ibd_table(af)
    pr = _gather_pr(table, g1.astype(np.intp), g2.astype(np.intp))
    prn = pr.copy()
    prn[:, :, 0] -= pr[:, :, 2]
    prn[:, :, 1] -= pr[:, :, 2]
    for adjust in (False, True):
        ref = simplex_3state_batch(prn, k0, k1, 1000, reltol, adjust)
        dev = simplex_3state_dev(jnp.asarray(table), jnp.asarray(g1),
                                 jnp.asarray(g2), k0, k1, 1000, reltol,
                                 adjust)
        # converged objective: tight agreement for every pair
        np.testing.assert_allclose(dev[2], ref[2], rtol=1e-8)
        # k estimates: within the NM convergence resolution
        np.testing.assert_allclose(dev[0], ref[0], atol=1e-3)
        np.testing.assert_allclose(dev[1], ref[1], atol=1e-3)
        # trajectory-exact for the vast majority (reduction-order ties
        # are rare)
        exact = (np.abs(dev[0] - ref[0]) < 1e-9) & (dev[3] == ref[3])
        assert exact.mean() >= 0.75, exact.mean()
