"""CLI smoke + correctness tests (`python -m snprelate_tpu ...`).

Runs main() in-process (conftest already pins the CPU backend); each
command's artifact is checked against the library API result.
"""

import numpy as np
import pytest

from snprelate_tpu.cli import main
from snprelate_tpu.io.store import example_filename

GDS = example_filename()


def test_cli_summary(capsys):
    assert main(["summary", GDS]) == 0
    out = capsys.readouterr().out
    assert "n.samp" in out and "n.snp" in out


def test_cli_freq_matches_api(tmp_path):
    from snprelate_tpu import snp_rate_freq, open_snp_gds

    out = tmp_path / "freq.csv"
    main(["freq", GDS, "--out", str(out)])
    lines = out.read_text().strip().splitlines()
    data = open_snp_gds(GDS)
    rv = snp_rate_freq(data, with_id=True)
    assert len(lines) - 1 == len(rv["snp.id"])
    first = lines[1].split(",")
    assert first[0] == str(rv["snp.id"][0])
    np.testing.assert_allclose(float(first[1]), rv["AlleleFreq"][0],
                               rtol=1e-9)


def test_cli_pca(tmp_path):
    from snprelate_tpu import pca, open_snp_gds

    ids = tmp_path / "samples.txt"
    data = open_snp_gds(GDS)
    keep = [str(s) for s in data.sample_id[:40]]
    ids.write_text("\n".join(keep) + "\n")
    prefix = str(tmp_path / "p")
    main(["pca", GDS, "--out", prefix, "--eigen-cnt", "4",
          "--sample-id-file", str(ids), "--quiet"])
    vec = np.loadtxt(prefix + ".eigenvec.csv", delimiter=",", skiprows=1,
                     usecols=range(1, 5))
    val = np.loadtxt(prefix + ".eigenval.txt")
    r = pca(data, sample_id=keep, eigen_cnt=4)
    np.testing.assert_allclose(val, r.eigenval[:4], rtol=1e-8)
    # eigenvector sign is arbitrary per component
    np.testing.assert_allclose(np.abs(vec), np.abs(r.eigenvect), atol=1e-8)


def test_cli_grm_merge_king_prune(tmp_path):
    from snprelate_tpu.models.grm import load_grm
    from snprelate_tpu import grm, open_snp_gds

    data = open_snp_gds(GDS)
    keep = [str(s) for s in data.sample_id[:25]]
    ids = tmp_path / "s.txt"
    ids.write_text("\n".join(keep) + "\n")

    gfn = str(tmp_path / "g.gds")
    main(["grm", GDS, "--out", gfn, "--sample-id-file", str(ids),
          "--prec", "single", "--quiet"])
    back, _ = load_grm(gfn)
    ref = grm(data, sample_id=keep)
    np.testing.assert_allclose(back.grm, ref.grm, rtol=1e-6, atol=1e-6)

    merged = str(tmp_path / "m.gds")
    main(["merge-grm", gfn, "--out", merged])
    mm, _ = load_grm(merged)
    np.testing.assert_allclose(mm.grm, back.grm, rtol=1e-6, atol=1e-6)

    kfn = str(tmp_path / "king.npz")
    main(["king", GDS, "--out", kfn, "--cutoff", "0.2",
          "--sample-id-file", str(ids), "--quiet"])
    z = np.load(kfn)
    assert z["kinship"].shape == (25, 25)
    pairs = (tmp_path / "king.npz.pairs.csv").read_text().splitlines()
    assert pairs[0].startswith("ID1,ID2")

    hfn = str(tmp_path / "homo.npz")
    main(["king", GDS, "--out", hfn, "--type", "KING-homo",
          "--cutoff", "0.2", "--sample-id-file", str(ids), "--quiet"])
    hz = np.load(hfn)
    assert "k0" in hz and "k1" in hz and hz["k0"].shape == (25, 25)
    assert (tmp_path / "homo.npz.pairs.csv").exists()

    sfn = str(tmp_path / "screen.csv")
    main(["king-screen", GDS, "--out", sfn, "--cutoff", "0.2",
          "--sample-id-file", str(ids), "--quiet"])
    screen = (tmp_path / "screen.csv").read_text().splitlines()
    # same pair set as the full-matrix route (order may differ)
    assert len(screen) == len(pairs)

    pfn = str(tmp_path / "kept.txt")
    main(["prune", GDS, "--out", pfn, "--seed", "7",
          "--sample-id-file", str(ids), "--quiet"])
    kept = pfn and open(pfn).read().split()
    assert 100 < len(kept) < data.n_snp


def test_cli_estimator_family(tmp_path, capsys):
    """eigmix/diss/ibd-mom/indiv-beta/fst/ld-mat artifacts == API results."""
    from snprelate_tpu import (open_snp_gds, eigmix, diss, ibd_mom,
                               indiv_beta, fst, ld_mat)

    data = open_snp_gds(GDS)
    keep = [str(s) for s in data.sample_id[:30]]
    ids = tmp_path / "s.txt"
    ids.write_text("\n".join(keep) + "\n")
    common = ["--sample-id-file", str(ids), "--quiet"]

    prefix = str(tmp_path / "em")
    ibd_npz = str(tmp_path / "em_ibd.npz")
    main(["eigmix", GDS, "--out", prefix, "--eigen-cnt", "4",
          "--ibdmat", ibd_npz] + common)
    r = eigmix(data, sample_id=keep, eigen_cnt=4, ibdmat=True)
    val = np.loadtxt(prefix + ".eigenval.txt")
    np.testing.assert_allclose(val, r.eigenval[:4], rtol=1e-8)
    np.testing.assert_allclose(np.load(ibd_npz)["ibd"], r.ibd, rtol=1e-10)

    dfn = str(tmp_path / "d.npz")
    main(["diss", GDS, "--out", dfn] + common)
    np.testing.assert_allclose(np.load(dfn)["diss"],
                               diss(data, sample_id=keep).diss, rtol=1e-12)

    mfn = str(tmp_path / "mom.npz")
    main(["ibd-mom", GDS, "--out", mfn, "--cutoff", "0.25"] + common)
    z = np.load(mfn)
    rm = ibd_mom(data, sample_id=keep, kinship=True)
    np.testing.assert_allclose(z["k0"], rm.k0, rtol=1e-12, equal_nan=True)
    np.testing.assert_allclose(z["kinship"], rm.kinship, rtol=1e-12,
                               equal_nan=True)
    assert (tmp_path / "mom.npz.pairs.csv").exists()

    bfn = str(tmp_path / "b.npz")
    main(["indiv-beta", GDS, "--out", bfn] + common)
    rb = indiv_beta(data, sample_id=keep)
    np.testing.assert_allclose(np.load(bfn)["beta"], rb.beta, rtol=1e-12)

    pops = tmp_path / "pops.txt"
    pops.write_text("\n".join(["A" if i % 2 else "B"
                               for i in range(len(keep))]) + "\n")
    ffn = str(tmp_path / "fst.csv")
    capsys.readouterr()
    assert main(["fst", GDS, "--pop-file", str(pops), "--out", ffn]
                + common) == 0
    printed = capsys.readouterr().out
    rf = fst(data, sample_id=keep,
             population=["A" if i % 2 else "B" for i in range(len(keep))],
             with_id=True)
    assert f"Fst={rf.Fst:.10g}" in printed
    per_snp = np.loadtxt(ffn, delimiter=",", skiprows=1, usecols=1)
    np.testing.assert_allclose(per_snp, rf.FstSNP, rtol=1e-9,
                               equal_nan=True)

    lfn = str(tmp_path / "ld.npz")
    sids = tmp_path / "snps.txt"
    sids.write_text("\n".join(str(s) for s in data.snp_id[:300]) + "\n")
    main(["ld-mat", GDS, "--out", lfn, "--slide", "25",
          "--sample-id-file", str(ids), "--snp-id-file", str(sids),
          "--quiet"])
    rl = ld_mat(data, sample_id=keep, snp_id=list(data.snp_id[:300]),
                slide=25)
    np.testing.assert_allclose(np.load(lfn)["ld"], rl.LD, rtol=1e-10,
                               equal_nan=True)


def test_cli_ibd_mle_and_inbreeding(tmp_path, capsys):
    from snprelate_tpu import open_snp_gds, ibd_mle, ind_inb

    data = open_snp_gds(GDS)
    keep = [str(s) for s in data.sample_id[:10]]
    ids = tmp_path / "s.txt"
    ids.write_text("\n".join(keep) + "\n")
    sids = tmp_path / "snps.txt"
    sids.write_text("\n".join(str(s) for s in data.snp_id[:400]) + "\n")
    common = ["--sample-id-file", str(ids), "--snp-id-file", str(sids),
              "--quiet"]

    mfn = str(tmp_path / "mle.npz")
    main(["ibd-mle", GDS, "--out", mfn, "--cutoff", "0.25"] + common)
    z = np.load(mfn)
    r = ibd_mle(data, sample_id=keep, snp_id=list(data.snp_id[:400]),
                kinship=True)
    np.testing.assert_allclose(z["k0"], r.k0, rtol=1e-10, equal_nan=True)
    np.testing.assert_allclose(z["kinship"], r.kinship, rtol=1e-10,
                               equal_nan=True)
    assert (tmp_path / "mle.npz.pairs.csv").exists()

    ifn = str(tmp_path / "inb.csv")
    main(["inbreeding", GDS, "--out", ifn, "--method", "mom.visscher"]
         + common)
    ri = ind_inb(data, sample_id=keep, snp_id=list(data.snp_id[:400]),
                 method="mom.visscher")
    got = np.loadtxt(ifn, delimiter=",", skiprows=1, usecols=1)
    np.testing.assert_allclose(got, ri.inbreeding, rtol=1e-9)


def test_cli_cluster(tmp_path):
    from snprelate_tpu import open_snp_gds
    from snprelate_tpu.models.cluster import hcluster, cut_tree
    from snprelate_tpu.models.ibs import ibs

    data = open_snp_gds(GDS)
    keep = [str(s) for s in data.sample_id[:30]]
    ids = tmp_path / "s.txt"
    ids.write_text("\n".join(keep) + "\n")
    out = str(tmp_path / "groups.csv")
    main(["cluster", GDS, "--out", out, "--n-perm", "100", "--seed", "1",
          "--sample-id-file", str(ids), "--quiet"])
    rows = open(out).read().strip().splitlines()
    assert rows[0] == "sample.id,group"
    assert len(rows) == 31
    cut = cut_tree(hcluster(ibs(data, sample_id=keep)), n_perm=100, seed=1)
    got = {r.split(",")[0]: r.split(",")[1] for r in rows[1:]}
    for i, s in enumerate(cut.sample_id):
        assert got[str(s)] == str(cut.samp_group[i])


def test_cli_converters(tmp_path):
    from snprelate_tpu import open_snp_gds

    bed = str(tmp_path / "x")
    main(["gds2bed", GDS, bed, "--quiet"])
    out = str(tmp_path / "x.gds")
    main(["bed2gds", bed + ".bed", out, "--quiet"])
    data = open_snp_gds(out)
    orig = open_snp_gds(GDS)
    assert data.n_samp == orig.n_samp and data.n_snp == orig.n_snp

    # --store streams into the packed container; downstream commands
    # accept the prefix wherever a GDS path goes
    prefix = str(tmp_path / "xstore")
    main(["bed2gds", bed + ".bed", prefix, "--quiet", "--store"])
    from snprelate_tpu.io.store import open_packed_store

    ds = open_packed_store(prefix)
    assert ds.n_samp == orig.n_samp and ds.n_snp == orig.n_snp
    assert main(["summary", prefix]) == 0


def test_cli_grm_tile_rank(tmp_path):
    import os

    from snprelate_tpu.io.store import open_snp_gds
    from snprelate_tpu.models.grm import load_grm

    gds = example_filename()
    data = open_snp_gds(gds)
    sids = tmp_path / "snps.txt"
    snps = list(data.snp_id[:1500])
    sids.write_text("\n".join(str(s) for s in snps) + "\n")
    common = ["--snp-id-file", str(sids), "--sample-block", "128"]
    ck = str(tmp_path / "grid")
    out = str(tmp_path / "g.gds")
    for rank in range(2):
        main(["grm", gds, "--out", out, "--checkpoint", ck,
              "--tile-rank", f"{rank}/2"] + common)
    assert not os.path.exists(out)  # rank runs write only tiles
    # assembly (no --tile-rank) must auto-detect the tile-grid meta and
    # LOAD the ranks' tiles — recomputing would silently discard the
    # distributed work (it would still pass an equality check)
    from snprelate_tpu.ops import tiles as T
    calls = {"n": 0}
    orig = T._gcta_tile_scan

    def count(*args, **kw):
        calls["n"] += 1
        return orig(*args, **kw)

    T._gcta_tile_scan = count
    try:
        main(["grm", gds, "--out", out, "--checkpoint", ck] + common)
    finally:
        T._gcta_tile_scan = orig
    assert calls["n"] == 0, f"assembly recomputed {calls['n']} tiles"
    back, _ = load_grm(out)
    from snprelate_tpu import grm as grm_api
    ref = grm_api(data, snp_id=snps)
    np.testing.assert_allclose(back.grm, ref.grm, rtol=1e-12, atol=1e-14)


def test_cli_king_screen_tile_rank(tmp_path):
    import csv

    gds = example_filename()
    outs = []
    for rank in range(2):
        out = str(tmp_path / f"hits{rank}.csv")
        main(["king-screen", gds, "--out", out, "--cutoff", "0.10",
              "--tile-rank", f"{rank}/2"])
        outs.append(out)
    full = str(tmp_path / "full.csv")
    main(["king-screen", gds, "--out", full, "--cutoff", "0.10"])

    def rows(fn):
        with open(fn) as f:
            return sorted(tuple(r[:2]) for r in list(csv.reader(f))[1:])

    merged = sorted(rows(outs[0]) + rows(outs[1]))
    assert merged == rows(full) and len(merged) > 0
