"""True multi-process jax.distributed test: 2 OS processes x 2 virtual CPU
devices form one global (data, samp) mesh; the sharded engines must produce
the same results as the single-process reference computation. This is the
CPU stand-in for a multi-host TPU pod slice (SURVEY.md §4: the reference
has no distributed tests because it has nothing distributed)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    out = str(tmp_path / "mp_result.npz")
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    z = np.load(out)

    # single-process reference on the same data
    from snprelate_tpu.io.store import create_geno
    from snprelate_tpu.ops.pairwise import gcta_grm_parts, pair_counts
    from snprelate_tpu.workspace import init_workspace

    rng = np.random.default_rng(5)
    n_snp, n_samp = 700, 96
    g = rng.choice([0, 1, 2, 3], size=(n_snp, n_samp),
                   p=[0.3, 0.3, 0.3, 0.1]).astype(np.uint8)
    data = create_geno(g, sample_id=[f"s{i}" for i in range(n_samp)],
                       snp_id=np.arange(n_snp),
                       snp_position=np.arange(n_snp) * 50,
                       snp_chromosome=np.ones(n_snp, np.int32))
    ws, _ = init_workspace(data, autosome_only=False, remove_monosnp=False,
                           missing_rate=np.nan, verbose=False)
    c = pair_counts(ws, chunk=128)
    cov, vgram, nlocus = gcta_grm_parts(ws, chunk=128)

    np.testing.assert_array_equal(z["counts"], np.stack(c.base()))
    np.testing.assert_allclose(z["cov"], cov, rtol=1e-10, atol=1e-12)
    np.testing.assert_array_equal(z["vgram"], vgram)
    assert int(z["nlocus"]) == nlocus

    # sharded randomized PCA across the 2-process mesh vs single-process
    from snprelate_tpu.models.pca_randomized import randomized_pca
    rp = randomized_pca(ws, eigen_cnt=4, aux_dim=8, iter_num=4, seed=3,
                        chunk=128)
    np.testing.assert_allclose(z["eigenval"], rp.eigenval[:4], rtol=1e-6)
    # eigenvector signs are arbitrary; compare |dot| of each component
    for k in range(4):
        d = abs(float(np.dot(z["eigenvect"][:, k], rp.eigenvect[:, k])))
        nn = (np.linalg.norm(z["eigenvect"][:, k])
              * np.linalg.norm(rp.eigenvect[:, k]))
        assert d / nn > 0.999, (k, d / nn)


def test_four_process_tile_engines(tmp_path):
    """4 OS processes x 2 devices = one 8-device global mesh running the
    SUPER-TILE engines (GRM / integer counts / EIGMIX) and BOTH KING
    screen routes with mesh= — every per-tile output is column-sharded
    across the process boundary (VERDICT r2 #7)."""
    worker = os.path.join(os.path.dirname(__file__),
                          "_mp_worker_tiles.py")
    out = str(tmp_path / "mp_tiles.npz")
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "4", str(port), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(4)]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process tile workers timed out")
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    z = np.load(out)

    # single-process reference on the same data (same planted twins)
    from snprelate_tpu.io.store import create_geno
    from snprelate_tpu.models.king import king_ibd_selection
    from snprelate_tpu.ops.tiles import (eigmix_parts_tiled, grm_tiled,
                                         pair_counts_tiled)
    from snprelate_tpu.workspace import init_workspace

    rng = np.random.default_rng(11)
    n_snp, n_samp = 600, 320
    g = rng.choice([0, 1, 2, 3], size=(n_snp, n_samp),
                   p=[0.35, 0.3, 0.3, 0.05]).astype(np.uint8)
    g[:, 200] = g[:, 5]
    g[:, 11] = g[:, 10]
    data = create_geno(g, sample_id=[f"s{i}" for i in range(n_samp)],
                       snp_id=np.arange(n_snp),
                       snp_position=np.arange(n_snp) * 50,
                       snp_chromosome=np.ones(n_snp, np.int32))
    ws, _ = init_workspace(data, autosome_only=False, remove_monosnp=False,
                           missing_rate=np.nan, verbose=False)

    grm = grm_tiled(ws, group=128, chunk=128)
    counts = pair_counts_tiled(ws, group=128, chunk=128)
    num, wvg, het = eigmix_parts_tiled(ws, group=128, chunk=128)
    np.testing.assert_allclose(z["grm"], grm, rtol=1e-10, atol=1e-12)
    np.testing.assert_array_equal(z["counts"], np.stack(counts.base()))
    np.testing.assert_allclose(z["num"], num, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(z["wvg"], wvg, rtol=1e-10, atol=1e-12)
    np.testing.assert_array_equal(z["het"], het)

    from snprelate_tpu.ops.tiles import king_homo_parts_tiled
    khc, kwaf, kwaf2 = king_homo_parts_tiled(ws, group=128, chunk=128)
    np.testing.assert_array_equal(z["khc"], np.stack(khc.base()))
    np.testing.assert_allclose(z["kwaf"], kwaf, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(z["kwaf2"], kwaf2, rtol=1e-10, atol=1e-12)

    # row-strip engines across the process boundary
    from snprelate_tpu.ops.pairwise import (basis_gram_rows,
                                            gcta_parts_rows, pca_cov_rows)

    want = np.empty((5, n_samp, n_samp), np.int64)
    for r0, nr, blk in basis_gram_rows(ws, sample_block=128, chunk=128):
        want[:, r0:r0 + nr] = blk
    np.testing.assert_array_equal(z["rows_counts"], want)
    wc = np.empty((n_samp, n_samp))
    wv = np.empty((n_samp, n_samp), np.int64)
    for r0, nr, cov_b, vgr_b, _nl in gcta_parts_rows(ws, sample_block=128,
                                                     chunk=128):
        wc[r0:r0 + nr] = cov_b
        wv[r0:r0 + nr] = vgr_b
    np.testing.assert_allclose(z["rows_cov"], wc, rtol=1e-10, atol=1e-12)
    np.testing.assert_array_equal(z["rows_vgr"], wv)
    wp = np.empty((n_samp, n_samp))
    for r0, nr, cov_b in pca_cov_rows(ws, sample_block=128, chunk=128):
        wp[r0:r0 + nr] = cov_b
    np.testing.assert_allclose(z["rows_pca"], wp, rtol=1e-10, atol=1e-12)

    # loadings family
    from snprelate_tpu.models.pca import pca as pca_fn
    from snprelate_tpu.models.pca_ext import pca_corr, pca_snp_loading

    pr = pca_fn(data, eigen_cnt=4, autosome_only=False,
                remove_monosnp=False, missing_rate=float("nan"))
    np.testing.assert_allclose(
        z["corr"], pca_corr(pr, data, snp_id=np.arange(200)).snpcorr,
        rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(
        z["snpload"], pca_snp_loading(pr, data).snploading,
        rtol=1e-10, atol=1e-12)

    ref = king_ibd_selection(data, 0.2, autosome_only=False,
                             remove_monosnp=False,
                             missing_rate=float("nan"), tiles=False,
                             sample_block=128, chunk=128)
    o = np.lexsort((np.asarray(ref["ID2"], object),
                    np.asarray(ref["ID1"], object)))
    assert len(o) >= 2  # the planted twins must be found
    for route in ("strip", "tile"):
        np.testing.assert_array_equal(
            z[f"{route}_id1"], np.asarray(ref["ID1"], object)[o]
            .astype(str))
        np.testing.assert_array_equal(
            z[f"{route}_id2"], np.asarray(ref["ID2"], object)[o]
            .astype(str))
        np.testing.assert_allclose(z[f"{route}_ibs0"],
                                   np.asarray(ref["IBS0"])[o], rtol=1e-12)
        np.testing.assert_allclose(z[f"{route}_kin"],
                                   np.asarray(ref["kinship"])[o],
                                   rtol=1e-12)
