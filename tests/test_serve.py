"""Serving-path tests: CohortService + the HTTP layer + king_cross.

The cross (query x cohort) counters are validated against the symmetric
full-matrix engine, and projection against the cohort's own eigenvectors
(the snpgdsPCASampLoading self-projection contract, R/PCA.R:243).
"""

import json
import math
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def svc(hapmap):
    from snprelate_tpu.serve import CohortService

    return CohortService(hapmap, eigen_cnt=4,
                         sample_id=hapmap.sample_id[:40].tolist())


def _query_geno(svc, rows):
    from snprelate_tpu import get_geno

    g = get_geno(svc.cohort, sample_id=svc.cohort.sample_id[rows],
                 snpfirstdim=False)  # (q, snp) in the served order
    return np.where(np.isnan(g), 3, g).astype(np.uint8)


def test_cross_counts_match_full_engine(svc):
    from snprelate_tpu.ops.pairwise import cross_pair_counts, pair_counts
    from snprelate_tpu.workspace import init_workspace

    ws, _ = init_workspace(svc.cohort, autosome_only=False,
                           remove_monosnp=False, missing_rate=math.nan)
    q = _query_geno(svc, slice(0, 7))
    cross = cross_pair_counts(ws, q)
    full = pair_counts(ws)
    for name in ("nvalid", "ibs0", "ibs1", "ibs2", "sum_sq", "n1_het",
                 "n2_het"):
        np.testing.assert_array_equal(
            getattr(cross, name), getattr(full, name)[:7], err_msg=name)


def test_cross_counts_input_sanitation(svc):
    """NaN / -1 missing codes map to 3 (create_geno convention); fractional
    dosages are rejected (silent truncation would skew kinship)."""
    from snprelate_tpu.ops.pairwise import cross_pair_counts
    from snprelate_tpu.workspace import init_workspace

    ws, _ = init_workspace(svc.cohort, autosome_only=False,
                           remove_monosnp=False, missing_rate=math.nan)
    q = _query_geno(svc, slice(0, 3)).astype(np.float64)
    qnan = q.copy()
    qnan[q == 3] = np.nan
    qneg = q.astype(np.int64)
    qneg[q == 3] = -1
    base = cross_pair_counts(ws, q)
    for variant in (qnan, qneg):
        c = cross_pair_counts(ws, variant)
        np.testing.assert_array_equal(c.nvalid, base.nvalid)
        np.testing.assert_array_equal(c.ibs0, base.ibs0)
    with pytest.raises(ValueError, match="fractional"):
        cross_pair_counts(ws, q + np.where(q == 1, 0.5, 0.0))
    with pytest.raises(ValueError, match="fractional"):
        svc.kinship(np.where(q == 1, 0.9, q))


def test_project_self_consistency(svc):
    coords = svc.project(_query_geno(svc, slice(0, 5)))
    np.testing.assert_allclose(coords, svc.pca.eigenvect[:5], atol=1e-8)


def test_kinship_identifies_duplicate(svc):
    out = svc.kinship(_query_geno(svc, slice(2, 3)), cutoff=0.45)
    assert out[0], "the exact-duplicate query must match itself"
    top = out[0][0]
    assert top["sample_id"] == str(svc.cohort.sample_id[2])
    assert abs(top["kinship"] - 0.5) < 1e-12
    assert top["ibs0"] == 0.0


def test_kinship_matches_full_matrix(svc, hapmap):
    from snprelate_tpu import ibd_king

    q = _query_geno(svc, slice(0, 6))
    out = svc.kinship(q, cutoff=0.2)
    king = ibd_king(svc.cohort, autosome_only=False, remove_monosnp=False,
                    missing_rate=math.nan)
    for qi in range(6):
        row = king.kinship[qi].copy()
        row[qi] = 0.5  # self-pair: the full matrix pins the diagonal too
        expect = {str(king.sample_id[j]): row[j] for j in
                  np.where(np.nan_to_num(row, nan=-np.inf) >= 0.2)[0]}
        got = {m["sample_id"]: m["kinship"] for m in out[qi]}
        assert got.keys() == expect.keys()
        for k in got:
            assert abs(got[k] - expect[k]) < 1e-12


def test_ibs_matches_full_matrix(svc):
    from snprelate_tpu import ibs

    q = _query_geno(svc, slice(3, 5))
    out = svc.ibs(q, top=5)
    full = ibs(svc.cohort, autosome_only=False, remove_monosnp=False,
               missing_rate=math.nan)
    for qi, row in enumerate(full.ibs[3:5]):
        got = {m["sample_id"]: m["ibs"] for m in out[qi]}
        # the self-duplicate tops the list at IBS 1.0
        assert out[qi][0]["sample_id"] == str(svc.cohort.sample_id[3 + qi])
        assert abs(out[qi][0]["ibs"] - 1.0) < 1e-12
        for sid, v in got.items():
            j = svc.cohort.sample_id.tolist().index(sid)
            assert abs(v - row[j]) < 1e-12


def test_http_endpoints(svc):
    from snprelate_tpu.serve import make_server

    httpd = make_server(svc, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        h = json.load(urllib.request.urlopen(f"{base}/health"))
        assert h["status"] == "ok" and h["n_samp"] == 40

        snps = json.load(urllib.request.urlopen(f"{base}/snps"))
        assert len(snps["snp_id"]) == svc.cohort.n_snp

        q = _query_geno(svc, slice(0, 2)).tolist()
        req = urllib.request.Request(
            f"{base}/project", data=json.dumps({"genotypes": q}).encode(),
            headers={"Content-Type": "application/json"})
        coords = np.asarray(json.load(urllib.request.urlopen(req))["coords"])
        np.testing.assert_allclose(coords, svc.pca.eigenvect[:2], atol=1e-8)

        req = urllib.request.Request(
            f"{base}/kinship",
            data=json.dumps({"genotypes": q[:1], "cutoff": 0.45}).encode())
        matches = json.load(urllib.request.urlopen(req))["matches"]
        assert matches[0][0]["sample_id"] == str(svc.cohort.sample_id[0])

        # malformed request -> 400 with an error body, server stays up
        bad = urllib.request.Request(
            f"{base}/project",
            data=json.dumps({"genotypes": [[1, 2, 3]]}).encode())
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad)
        assert ei.value.code == 400
        assert json.load(urllib.request.urlopen(f"{base}/health"))[
            "status"] == "ok"
    finally:
        httpd.shutdown()
