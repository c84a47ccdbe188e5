"""Rank-distributed randomized PCA (VERDICT r2 #3): independent rank
processes exchanging only small npy artifacts. world=2 must match world=1
(same Krylov span; only float reduction order differs), and the ranked
path must agree with the established single-process randomized PCA on
the dominant components."""

import numpy as np
import pytest

from snprelate_tpu.io.store import create_geno
from snprelate_tpu.workspace import init_workspace


def _structured(n_snp=1024, n_samp=200, seed=9):
    """Two-population cohort so PC1 carries real structure."""
    rng = np.random.default_rng(seed)
    p = rng.uniform(0.1, 0.9, n_snp)
    shift = np.where(np.arange(n_samp) < n_samp // 2, -0.08, 0.08)
    pm = np.clip(p[:, None] + shift[None, :], 0.01, 0.99)
    g = (rng.random((n_snp, n_samp)) < pm).astype(np.uint8) \
        + (rng.random((n_snp, n_samp)) < pm).astype(np.uint8)
    g[rng.random(g.shape) < 0.01] = 3
    data = create_geno(g, [f"s{i}" for i in range(n_samp)],
                       np.arange(n_snp), np.arange(n_snp) * 5,
                       np.ones(n_snp, np.int32))
    ws, _ = init_workspace(data, autosome_only=False, remove_monosnp=False,
                           missing_rate=np.nan)
    return ws


def _make_source_factory(ws, group, chunk):
    from snprelate_tpu.ops.tiles import StoreSlabSource

    def make(_rank):
        return StoreSlabSource(ws, group, chunk)

    return make


def test_world2_equals_world1(tmp_path):
    from snprelate_tpu.models.pca_rank import randomized_pca_ranked

    ws = _structured()
    mk = _make_source_factory(ws, group=128, chunk=128)
    r1 = randomized_pca_ranked(mk, ws.n_samp, str(tmp_path / "w1"),
                               world=1, eigen_cnt=8, iter_num=3, seed=7)
    r2 = randomized_pca_ranked(mk, ws.n_samp, str(tmp_path / "w2"),
                               world=2, eigen_cnt=8, iter_num=3, seed=7)
    # identical subspace construction; only float summation order differs
    np.testing.assert_allclose(r2.eigenval[:8], r1.eigenval[:8],
                               rtol=1e-8)
    for k in range(8):
        c = abs(np.dot(r1.eigenvect[:, k], r2.eigenvect[:, k])
                / (np.linalg.norm(r1.eigenvect[:, k])
                   * np.linalg.norm(r2.eigenvect[:, k])))
        assert c > 1 - 1e-8, (k, c)


def test_ranked_matches_single_process_pca(tmp_path):
    """Same seed -> same Krylov span as randomized_pca_slabs: dominant
    eigenvalues and eigenvectors agree to numerical tolerance."""
    from snprelate_tpu.models.pca_rank import randomized_pca_ranked
    from snprelate_tpu.models.pca_randomized import randomized_pca_slabs
    from snprelate_tpu.ops.tiles import StoreSlabSource

    ws = _structured()
    src = StoreSlabSource(ws, group=128, chunk=128)
    ref = randomized_pca_slabs(src, ws.n_samp, eigen_cnt=6, aux_dim=16,
                               iter_num=3, seed=7)
    mk = _make_source_factory(ws, group=128, chunk=128)
    got = randomized_pca_ranked(mk, ws.n_samp, str(tmp_path / "w"),
                                world=2, eigen_cnt=6, aux_dim=16,
                                iter_num=3, seed=7)
    # TraceXTX is an exact sum over SNPs -> identical
    np.testing.assert_allclose(got.TraceXTX, ref.TraceXTX, rtol=1e-10)
    # dominant components (well above the subspace-approximation floor)
    np.testing.assert_allclose(got.eigenval[:4], ref.eigenval[:4],
                               rtol=1e-6)
    for k in range(4):
        c = abs(np.dot(ref.eigenvect[:, k], got.eigenvect[:, k])
                / (np.linalg.norm(ref.eigenvect[:, k])
                   * np.linalg.norm(got.eigenvect[:, k])))
        assert c > 0.9999, (k, c)
    # PC1 separates the planted populations
    pc1 = got.eigenvect[:, 0]
    half = ws.n_samp // 2
    s = np.sign(np.median(pc1[half:]) - np.median(pc1[:half])) or 1.0
    frac = ((pc1 * s > 0) == (np.arange(ws.n_samp) >= half)).mean()
    assert frac > 0.95


def test_phasewise_cli_style_run(tmp_path):
    """Drive the phases exactly as independent process invocations would
    (fresh source per call, no shared Python state): power -> reduce per
    iteration, then project per rank, then assemble."""
    from snprelate_tpu.models import pca_rank as PR
    from snprelate_tpu.ops.tiles import StoreSlabSource

    ws = _structured(n_snp=512, n_samp=120)
    wd = str(tmp_path / "phases")
    world, iters, aux = 2, 2, 12
    for it in range(iters):
        for r in range(world):
            src = StoreSlabSource(ws, group=128, chunk=64)
            PR.pca_rank_power(src, ws.n_samp, wd, r, world, it, aux,
                              seed=3)
        PR.pca_rank_reduce(wd, world, it)
    for r in range(world):
        src = StoreSlabSource(ws, group=128, chunk=64)
        PR.pca_rank_project(src, ws.n_samp, wd, r, world, iters, aux,
                            seed=3)
    res = PR.pca_rank_assemble(wd, world, ws.n_samp, eigen_cnt=4)
    mk = _make_source_factory(ws, group=128, chunk=64)
    ref = PR.randomized_pca_ranked(mk, ws.n_samp, str(tmp_path / "ref"),
                                   world=1, eigen_cnt=4, aux_dim=aux,
                                   iter_num=iters, seed=3)
    np.testing.assert_allclose(res.eigenval[:4], ref.eigenval[:4],
                               rtol=1e-8)


def test_reduce_missing_rank_raises(tmp_path):
    from snprelate_tpu.models import pca_rank as PR
    from snprelate_tpu.ops.tiles import StoreSlabSource

    ws = _structured(n_snp=256, n_samp=60)
    wd = str(tmp_path / "w")
    src = StoreSlabSource(ws, group=64, chunk=64)
    PR.pca_rank_power(src, ws.n_samp, wd, 0, 2, 0, 8, seed=1)
    with pytest.raises(FileNotFoundError, match="rank 1"):
        PR.pca_rank_reduce(wd, 2, 0)


def test_cli_rank_two_os_processes(tmp_path):
    """`python -m snprelate_tpu pca --rank R/2 --workdir D` as two
    concurrent OS processes — the deployable multi-host surface: the
    filesystem barriers in pca_rank_process sequence the phases, rank 0
    writes the output files. Must match a --rank 0/1 (world=1) run of
    the same CLI to the world-invariance tolerance."""
    import os
    import subprocess
    import sys

    from snprelate_tpu.io.store import example_filename

    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    def args(rank_spec, wd, out):
        return [sys.executable, "-c",
                "import jax, sys\n"
                "jax.config.update('jax_platforms', 'cpu')\n"
                "jax.config.update('jax_enable_x64', True)\n"
                "from snprelate_tpu.cli import main\n"
                "sys.exit(main(sys.argv[1:]))",
                "pca", example_filename(), "--rank", rank_spec,
                "--workdir", wd, "--out", out, "--eigen-cnt", "4",
                "--iters", "2", "--aux-dim", "12", "--seed", "5",
                "--barrier-timeout", "540", "--quiet"]

    base_out = str(tmp_path / "base")
    p = subprocess.run(args("0/1", str(tmp_path / "w1"), base_out),
                       env=env, capture_output=True, timeout=600)
    assert p.returncode == 0, p.stdout.decode() + p.stderr.decode()

    out2 = str(tmp_path / "ranked")
    procs = [subprocess.Popen(args(f"{r}/2", str(tmp_path / "w2"), out2),
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for r in range(2)]
    for p in procs:
        try:
            log, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("pca rank workers timed out")
        assert p.returncode == 0, log.decode(errors="replace")[-3000:]

    ev1 = np.loadtxt(base_out + ".eigenval.txt")
    ev2 = np.loadtxt(out2 + ".eigenval.txt")
    np.testing.assert_allclose(ev2, ev1, rtol=1e-8)
    v1 = np.loadtxt(base_out + ".eigenvec.csv", delimiter=",",
                    skiprows=1, usecols=range(1, 5))
    v2 = np.loadtxt(out2 + ".eigenvec.csv", delimiter=",",
                    skiprows=1, usecols=range(1, 5))
    for k in range(4):
        c = abs(np.dot(v1[:, k], v2[:, k])
                / (np.linalg.norm(v1[:, k]) * np.linalg.norm(v2[:, k])))
        assert c > 1 - 1e-8, (k, c)


def test_workdir_guard_rejects_stale_artifacts(tmp_path):
    """A workdir holding another run's artifacts must be refused, not
    silently merged (stale g/p files would satisfy the barriers)."""
    from snprelate_tpu.models.pca_rank import pca_rank_process
    from snprelate_tpu.ops.tiles import StoreSlabSource

    ws = _structured(n_snp=256, n_samp=60)
    wd = str(tmp_path / "w")
    src = StoreSlabSource(ws, group=64, chunk=64)
    pca_rank_process(src, ws.n_samp, wd, 0, 1, eigen_cnt=4, aux_dim=8,
                     iter_num=1, seed=3)
    # same params: reuse is fine (idempotent)
    pca_rank_process(src, ws.n_samp, wd, 0, 1, eigen_cnt=4, aux_dim=8,
                     iter_num=1, seed=3)
    with pytest.raises(ValueError, match="different"):
        pca_rank_process(src, ws.n_samp, wd, 0, 1, eigen_cnt=4,
                         aux_dim=8, iter_num=1, seed=4)


def test_workdir_guard_rejects_same_shape_different_cohort(tmp_path):
    """Shapes alone cannot identify a run: a different cohort with
    identical (n, chunks, group, chunk, aux, iters, world, seed) must
    still be refused — the guard digests the selection + packed bytes."""
    from snprelate_tpu.models.pca_rank import pca_rank_process
    from snprelate_tpu.ops.tiles import StoreSlabSource

    ws1 = _structured(n_snp=256, n_samp=60, seed=9)
    ws2 = _structured(n_snp=256, n_samp=60, seed=10)
    wd = str(tmp_path / "w")
    pca_rank_process(StoreSlabSource(ws1, group=64, chunk=64), ws1.n_samp,
                     wd, 0, 1, eigen_cnt=4, aux_dim=8, iter_num=1, seed=3)
    with pytest.raises(ValueError, match="different"):
        pca_rank_process(StoreSlabSource(ws2, group=64, chunk=64),
                         ws2.n_samp, wd, 0, 1, eigen_cnt=4, aux_dim=8,
                         iter_num=1, seed=3)
