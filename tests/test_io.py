import numpy as np
import pytest

from tests.conftest import HAPMAP_GDS, REF


def test_gds_nodes(hapmap):
    assert hapmap.n_samp == 279
    assert hapmap.n_snp == 9088
    assert hapmap.sample_id[0] == "NA19152"
    assert hapmap.snp_allele[0] == "G/T"
    assert list(np.unique(hapmap.numeric_chromosome)) == list(range(1, 24))
    assert hapmap.sample_annot["pop.group"][0] == "YRI"


def test_pack_roundtrip():
    from snprelate_tpu.io.store import pack2bit, unpack2bit

    rng = np.random.default_rng(0)
    g = rng.integers(0, 4, size=(37, 101)).astype(np.uint8)
    assert np.array_equal(unpack2bit(pack2bit(g), 101), g)


def test_rdata_hapmap_list(hapmap):
    """The bundled RData list parses with the expected structure."""
    from snprelate_tpu.io.rdata import parse_rdata

    d = parse_rdata(f"{REF}/data/hapmap_geno.RData")["hapmap_geno"]
    v = d.value if hasattr(d, "value") else d
    assert list(v["sample.id"]) == list(hapmap.sample_id)
    g = np.asarray(v["genotype"])
    assert g.shape == (1000, 279)
    assert set(np.unique(g)).issubset({0, 1, 2, 3})
    assert len(v["snp.id"]) == len(v["snp.allele"]) == 1000


def test_workspace_filter_matches_golden(hapmap, golden):
    """init_workspace must reproduce the reference's SNP filtering exactly:
    golden MoM ran on samples[:90], autosome-only, remove.monosnp=TRUE,
    missing.rate=NaN (test_rel.R:46-53)."""
    from snprelate_tpu.workspace import init_workspace, snp_stats

    ws, _ = init_workspace(hapmap, sample_id=hapmap.sample_id[:90])
    assert np.array_equal(ws.snp_id, golden["MoM"]["snp.id"])
    af, maf, mr, num = snp_stats(ws)
    np.testing.assert_allclose(af, golden["MoM"]["afreq"], rtol=0, atol=1e-12)

    ws60, _ = init_workspace(hapmap, sample_id=hapmap.sample_id[:60])
    assert np.array_equal(ws60.snp_id, golden["KING"][0]["snp.id"])


def test_workspace_id_selection(hapmap):
    from snprelate_tpu.workspace import init_workspace

    ws, _ = init_workspace(hapmap, sample_id=hapmap.sample_id[[5, 3, 9]],
                           snp_id=hapmap.snp_id[:100], autosome_only=False,
                           remove_monosnp=False)
    # file order preserved regardless of the order given
    assert list(ws.sample_id) == list(hapmap.sample_id[[3, 5, 9]])
    assert ws.n_snp == 100
    with pytest.raises(ValueError):
        init_workspace(hapmap, sample_id=["nope"])


def test_chromosome_selection(hapmap):
    from snprelate_tpu.workspace import init_workspace

    ws, _ = init_workspace(hapmap, autosome_only=1, remove_monosnp=False)
    assert set(hapmap.numeric_chromosome[ws.snp_idx]) == {1}
