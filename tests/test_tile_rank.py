"""tile_rank=(rank, world): the multi-HOST partition of the super-tile
engines. Ranks are fully independent processes (zero collectives, no
jax.distributed — the tile grid is embarrassingly parallel) that share
only the per-tile checkpoint directory; a final tile_rank=None run over
the same directory assembles the full result without recomputation.
This is the software side of "tile-grid-across-chips scheduling" that
real multi-host hardware would drive (STATUS.md); the reference's only
multi-part analog is the offline snpgdsGRM(out.fn=)/snpgdsMergeGRM file
protocol (R/IBD.R:624-748), which splits SNPs, not samples."""

import os
import subprocess
import sys

import numpy as np
import pytest


def test_rank_rows_exact_partition():
    from snprelate_tpu.ops.tiles import rank_rows

    for k in (1, 2, 3, 5, 8, 13):
        for world in (1, 2, 3, 4):
            rows = [rank_rows(k, r, world) for r in range(world)]
            flat = sorted(sum(rows, []))
            assert flat == list(range(k))  # exact cover, no overlap
            loads = [sum(k - i for i in rr) for rr in rows]
            total = k * (k + 1) // 2
            assert sum(loads) == total
            # greedy LPT: no rank exceeds the ideal share by more than
            # the largest row weight
            assert max(loads) - min(loads) <= k
    with pytest.raises(ValueError):
        rank_rows(4, 2, 2)


def test_grm_tile_rank_ranks_then_assemble(hapmap, tmp_path):
    from snprelate_tpu import grm

    ck = str(tmp_path / "grid")
    snps = hapmap.snp_id[:2000]
    base = grm(hapmap, snp_id=snps, method="GCTA",
               tiles=True, tile_group=128)
    # two independent rank runs (any order) -> None, tiles on disk
    for rank in (1, 0):
        out = grm(hapmap, snp_id=snps, method="GCTA", tiles=True,
                  tile_group=128, checkpoint=ck, tile_rank=(rank, 2))
        assert out is None
    # assembly run: loads every tile, recomputes nothing
    res = grm(hapmap, snp_id=snps, method="GCTA", tiles=True,
              tile_group=128, checkpoint=ck)
    np.testing.assert_array_equal(res.grm, base.grm)

    with pytest.raises(ValueError):  # rank runs need checkpoint=
        grm(hapmap, snp_id=snps, method="GCTA", tiles=True,
            tile_group=128, tile_rank=(0, 2))
    with pytest.raises(ValueError):  # super-tile methods only
        grm(hapmap, snp_id=snps, method="EIGMIX", checkpoint=ck,
            tile_rank=(0, 2))


def test_count_and_eigmix_tile_rank(hapmap, tmp_path):
    from snprelate_tpu.ops.tiles import (eigmix_parts_tiled,
                                         pair_counts_tiled)
    from snprelate_tpu.workspace import init_workspace

    ws, _ = init_workspace(hapmap, snp_id=hapmap.snp_id[:1500],
                           autosome_only=False, remove_monosnp=False)
    ck = str(tmp_path / "counts")
    base = pair_counts_tiled(ws, 128)
    for rank in range(3):
        assert pair_counts_tiled(ws, 128, checkpoint=ck,
                                 tile_rank=(rank, 3)) is None
    got = pair_counts_tiled(ws, 128, checkpoint=ck)
    for f in ("vv", "hh", "dd", "hv", "vh"):  # bit-exact
        np.testing.assert_array_equal(np.asarray(getattr(base, f)),
                                      np.asarray(getattr(got, f)))

    ck2 = str(tmp_path / "eig")
    eb = eigmix_parts_tiled(ws, group=128)
    for rank in range(2):
        assert eigmix_parts_tiled(ws, group=128, checkpoint=ck2,
                                  tile_rank=(rank, 2)) is None
    eg = eigmix_parts_tiled(ws, group=128, checkpoint=ck2)
    for a, b in zip(eb, eg):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_king_homo_tile_rank(hapmap, tmp_path):
    from snprelate_tpu.ops.tiles import king_homo_parts_tiled
    from snprelate_tpu.workspace import init_workspace

    ws, _ = init_workspace(hapmap, snp_id=hapmap.snp_id[:1500],
                           autosome_only=False, remove_monosnp=False)
    ck = str(tmp_path / "kh")
    base = king_homo_parts_tiled(ws, group=128)
    for rank in range(2):
        assert king_homo_parts_tiled(ws, group=128, checkpoint=ck,
                                     tile_rank=(rank, 2)) is None
    got = king_homo_parts_tiled(ws, group=128, checkpoint=ck)
    for f in ("vv", "hh", "dd", "hv", "vh"):
        np.testing.assert_array_equal(np.asarray(getattr(base[0], f)),
                                      np.asarray(getattr(got[0], f)))
    np.testing.assert_array_equal(base[1], got[1])
    np.testing.assert_array_equal(base[2], got[2])


def test_grm_tile_rank_two_os_processes(hapmap, tmp_path):
    """Two OS processes = two 'hosts', each computing its rank of the
    tile grid against the same GDS file and checkpoint directory; the
    parent assembles. No coordination beyond the shared directory."""
    from snprelate_tpu import grm
    from snprelate_tpu.io.store import example_filename

    ck = str(tmp_path / "grid")
    code = (
        "import sys, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_enable_x64', True)\n"
        "import snprelate_tpu as sr\n"
        "d = sr.open_snp_gds(sr.example_filename())\n"
        "out = sr.grm(d, snp_id=d.snp_id[:1200], method='GCTA',\n"
        "             tiles=True, tile_group=128, checkpoint=sys.argv[1],\n"
        "             tile_rank=(int(sys.argv[2]), 2))\n"
        "assert out is None\n"
    )
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, "-c", code, ck, str(r)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for r in range(2)]
    for p in procs:
        try:
            # generous: two cold JAX processes can share ONE busy core
            # when the suite runs in parallel with other work
            log, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("tile_rank workers timed out")
        assert p.returncode == 0, log.decode(errors="replace")[-3000:]

    res = grm(hapmap, snp_id=hapmap.snp_id[:1200], method="GCTA",
              tiles=True, tile_group=128, checkpoint=ck)
    base = grm(hapmap, snp_id=hapmap.snp_id[:1200], method="GCTA",
               tiles=True, tile_group=128)
    np.testing.assert_array_equal(res.grm, base.grm)


def test_model_level_tile_rank(hapmap, tmp_path):
    """tile_rank= is uniform across the estimator families: rank runs
    return None and write tiles; the assembly run (tile_rank=(0, 1),
    which routes through the tile engine and loads every saved tile)
    equals the plain result. Models sharing an engine share the rank
    runs' checkpoint — the tile artifacts carry counts, not estimates,
    so e.g. ibs rank tiles assemble ibd_mom too."""
    import snprelate_tpu as sr

    snps = hapmap.snp_id[:1000]
    # one pair of rank runs per ENGINE (counts / KING-homo / EIGMIX)
    engines = {
        "counts": lambda **kw: sr.ibs(hapmap, snp_id=snps, **kw),
        "kh": lambda **kw: sr.diss(hapmap, snp_id=snps, **kw),
        "eig": lambda **kw: sr.eigmix(hapmap, snp_id=snps, ibdmat=True,
                                      eigen_cnt=0, **kw),
    }
    for name, fn in engines.items():
        for rank in (1, 0):
            assert fn(tile_rank=(rank, 2),
                      checkpoint=str(tmp_path / name)) is None

    cases = [
        (sr.ibs, "ibs", "counts", {}),
        (sr.ibs_num, "ibs2", "counts", {}),
        (sr.ibd_king, "kinship", "counts", {"type": "KING-robust"}),
        (sr.ibd_mom, "k0", "counts", {}),
        (sr.indiv_beta, "beta", "counts", {}),
        (sr.ibd_king, "k0", "kh", {"type": "KING-homo"}),
        (sr.diss, "diss", "kh", {}),
        (sr.eigmix, "ibd", "eig", {"ibdmat": True, "eigen_cnt": 0}),
    ]
    for fn, field, ck, kw in cases:
        base = fn(hapmap, snp_id=snps, **kw)
        got = fn(hapmap, snp_id=snps, tile_rank=(0, 1),
                 checkpoint=str(tmp_path / ck), **kw)
        np.testing.assert_allclose(
            np.asarray(getattr(base, field), float),
            np.asarray(getattr(got, field), float),
            rtol=1e-12, atol=1e-14, equal_nan=True)


def test_king_screen_tile_rank(hapmap):
    """Rank runs of the streaming KING screen return partial hit
    tables whose union equals the full screen (tiles partition the
    pair set exactly)."""
    import snprelate_tpu as sr

    full = sr.king_ibd_selection(hapmap, kinship_cutoff=0.10,
                                 tiles=True, tile_group=128)

    def key(d):
        return sorted(zip(d["ID1"].tolist(), d["ID2"].tolist(),
                          np.round(np.asarray(d["kinship"], float),
                                   12).tolist()))

    parts = []
    for rank in range(3):
        parts.append(sr.king_ibd_selection(hapmap, kinship_cutoff=0.10,
                                           tile_group=128,
                                           tile_rank=(rank, 3)))
    merged = sorted(sum((key(p) for p in parts), []))
    assert len(full["ID1"]) > 0  # hapmap has duplicate-sample relatives
    assert merged == key(full)


def test_assembly_auto_grid_adopts_rank_meta(hapmap, tmp_path):
    """Rank runs with an AUTO grid followed by a plain assembly run
    (no tile flags at all, just checkpoint=) must detect the grid meta,
    adopt the ranks' (group, chunk) and recompute NOTHING — not derive
    a different grid whose meta mismatch would wipe the tiles."""
    import snprelate_tpu as sr
    from snprelate_tpu.ops import tiles as T

    snps = hapmap.snp_id[:1000]
    base_c = sr.ibs(hapmap, snp_id=snps)
    base_e = sr.eigmix(hapmap, snp_id=snps, ibdmat=True, eigen_cnt=0)
    base_k = sr.ibd_king(hapmap, snp_id=snps, type="KING-homo")
    cks = {k: str(tmp_path / k) for k in ("c", "e", "k")}
    for rank in (0, 1):
        assert sr.ibs(hapmap, snp_id=snps, tile_rank=(rank, 2),
                      checkpoint=cks["c"]) is None
        assert sr.eigmix(hapmap, snp_id=snps, ibdmat=True, eigen_cnt=0,
                         tile_rank=(rank, 2), checkpoint=cks["e"]) is None
        assert sr.ibd_king(hapmap, snp_id=snps, type="KING-homo",
                           tile_rank=(rank, 2),
                           checkpoint=cks["k"]) is None
    calls = []
    orig = T.StoreSlabSource.slab

    def counted(self, j):
        calls.append(j)
        return orig(self, j)

    T.StoreSlabSource.slab = counted
    try:
        got_c = sr.ibs(hapmap, snp_id=snps, checkpoint=cks["c"])
        got_e = sr.eigmix(hapmap, snp_id=snps, ibdmat=True, eigen_cnt=0,
                          checkpoint=cks["e"])
        got_k = sr.ibd_king(hapmap, snp_id=snps, type="KING-homo",
                            checkpoint=cks["k"])
    finally:
        T.StoreSlabSource.slab = orig
    assert calls == []  # every tile came from the ranks' checkpoints
    np.testing.assert_array_equal(base_c.ibs, got_c.ibs)
    np.testing.assert_allclose(base_e.ibd, got_e.ibd,
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(base_k.k0, float), np.asarray(got_k.k0, float),
        rtol=1e-12, atol=1e-14, equal_nan=True)


def test_screen_tiles_false_with_tile_rank_raises(hapmap):
    """tiles=False + tile_rank= on the KING screen must raise: the strip
    engine cannot partition, and silently returning the FULL hit table
    as a 'rank share' would duplicate every pair at the merge."""
    import snprelate_tpu as sr

    with pytest.raises(ValueError, match="tile_rank"):
        sr.king_ibd_selection(hapmap, kinship_cutoff=0.10, tiles=False,
                              tile_rank=(0, 2))


def test_parse_tile_rank():
    from snprelate_tpu.ops.tiles import parse_tile_rank

    assert parse_tile_rank(None) is None
    assert parse_tile_rank("0/1") is None      # world=1: full run
    assert parse_tile_rank((0, 1)) is None
    assert parse_tile_rank("1/3") == (1, 3)
    assert parse_tile_rank((2, 4)) == (2, 4)
    for bad in ("3/1", "2/2", "-1/2", "0/0", "0/2/3"):
        with pytest.raises(ValueError):
            parse_tile_rank(bad)


def test_heterogeneous_rank_flags_share_one_grid(hapmap, tmp_path):
    """A rank with tile_devices= and a rank without must partition the
    SAME grid (conservative auto group under tile_rank): otherwise the
    union of partial results silently duplicates/drops pairs."""
    import jax
    import snprelate_tpu as sr

    snps = hapmap.snp_id[:1000]
    full = sr.king_ibd_selection(hapmap, kinship_cutoff=0.10, tiles=True,
                                 snp_id=snps, tile_group=128)

    def key(d):
        return sorted(zip(d["ID1"].tolist(), d["ID2"].tolist()))

    a = sr.king_ibd_selection(hapmap, kinship_cutoff=0.10, snp_id=snps,
                              tile_group=128, tile_rank=(0, 2),
                              tile_devices=jax.devices()[:2])
    b = sr.king_ibd_selection(hapmap, kinship_cutoff=0.10, snp_id=snps,
                              tile_group=128, tile_rank=(1, 2))
    assert sorted(key(a) + key(b)) == key(full)
