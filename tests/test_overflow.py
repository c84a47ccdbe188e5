"""Counter-overflow safety (VERDICT r2 #4): the streaming count engines
flush int32 carries into host int64 accumulators before they could wrap
(SURVEY §7 hard parts: int32-per-chunk + int64 global), and the
single-scan super-tile engines refuse loudly at the ceiling — the analog
of the reference's hard nSNP < 2^30 guard (genKING.cpp:598-602), except
the streaming engines have NO ceiling at all.

The ceiling is env-overridable (SNPRELATE_TPU_COUNT_CEILING) so the
flush and guard paths run at toy sizes; the flush decomposition
acc + carry is invariant to when flushes happen, so equality against an
unflushed run certifies it.
"""

import os

import numpy as np
import pytest

from snprelate_tpu.io.store import create_geno
from snprelate_tpu.workspace import init_workspace


def _toy(n_snp=700, n_samp=37, seed=5):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 4, size=(n_snp, n_samp)).astype(np.uint8)
    data = create_geno(g, [f"s{i}" for i in range(n_samp)],
                       np.arange(n_snp), np.arange(n_snp) * 7,
                       np.ones(n_snp, np.int32))
    ws, _ = init_workspace(data, autosome_only=False, remove_monosnp=False)
    return ws


@pytest.fixture
def ceiling_env():
    def set_ceiling(v):
        os.environ["SNPRELATE_TPU_COUNT_CEILING"] = str(v)

    yield set_ceiling
    os.environ.pop("SNPRELATE_TPU_COUNT_CEILING", None)


def test_flush_interval_math():
    from snprelate_tpu.ops.pairwise import count_flush_interval

    os.environ["SNPRELATE_TPU_COUNT_CEILING"] = str(2**31 - 1)
    try:
        assert count_flush_interval(4096) == (2**31 - 1) // 4096
        assert count_flush_interval(2**40) == 1  # never below one chunk
    finally:
        os.environ.pop("SNPRELATE_TPU_COUNT_CEILING", None)


def test_pair_counts_flush_equality(ceiling_env):
    """pair_counts with aggressive flushing (several int64 flushes within
    the stream) is bit-identical to the unflushed engine."""
    from snprelate_tpu.ops.pairwise import count_flush_interval, pair_counts

    ws = _toy()
    ref = pair_counts(ws, chunk=64)
    ceiling_env(128)  # flush every 2 chunks of 64 SNPs
    assert count_flush_interval(64) == 2
    got = pair_counts(ws, chunk=64)
    for a, b in zip(ref.base(), got.base()):
        np.testing.assert_array_equal(a, b)


def test_pair_counts_flush_checkpoint_resume(tmp_path, ceiling_env):
    """A checkpoint taken AFTER a flush stores acc + carry (8 arrays) and
    resumes exactly."""
    from snprelate_tpu.ops import pairwise as P

    ws = _toy()
    ref = P.pair_counts(ws, chunk=64)
    ceiling_env(128)
    ck = str(tmp_path / "pc.ck")

    # simulate a crash: run only the first 6 chunks (3 flushes), saving
    # every 2 chunks
    class Boom(RuntimeError):
        pass

    orig = P._gram4_step
    calls = {"n": 0}

    def bomb(carry, packed):
        if calls["n"] == 6:
            raise Boom()
        calls["n"] += 1
        return orig(carry, packed)

    P._gram4_step = bomb
    try:
        with pytest.raises(Boom):
            P.pair_counts(ws, chunk=64, checkpoint=ck, checkpoint_every=2)
    finally:
        P._gram4_step = orig

    # the saved state at chunk 6 holds 8 arrays (int64 acc + int32 carry)
    with open(ck, "rb") as f:
        z = np.load(f)
        assert int(z["n"]) == 8
        assert int(z["step"]) == 6

    got = P.pair_counts(ws, chunk=64, checkpoint=ck, checkpoint_every=2)
    for a, b in zip(ref.base(), got.base()):
        np.testing.assert_array_equal(a, b)


def test_basis_gram_rows_flush_equality(ceiling_env):
    from snprelate_tpu.ops.pairwise import basis_gram_rows

    ws = _toy(n_snp=900, n_samp=300)
    ref = [s for _r0, _nr, s in
           basis_gram_rows(ws, sample_block=128, chunk=128)]
    ceiling_env(256)  # flush every 2 chunks of 128
    got = [s for _r0, _nr, s in
           basis_gram_rows(ws, sample_block=128, chunk=128)]
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_tile_engines_guard(ceiling_env, tmp_path):
    """The super-tile engines (single un-flushable scan) refuse at the
    ceiling instead of wrapping silently."""
    from snprelate_tpu.ops.tiles import (StoreSlabSource, basis_count_tiles,
                                         gcta_grm_tiles)

    ws = _toy(n_snp=300, n_samp=40)
    ceiling_env(200)  # below the 300-SNP selection
    src = StoreSlabSource(ws, group=128, chunk=64)
    with pytest.raises(ValueError, match="int32 count ceiling"):
        list(basis_count_tiles(src, ws.n_samp))
    with pytest.raises(ValueError, match="int32 count ceiling"):
        list(gcta_grm_tiles(src, ws.n_samp, method="GCTA"))


def test_streaming_engines_have_no_ceiling(ceiling_env):
    """Selections past the (toy) ceiling still run exactly on the
    streaming engines — the flush removes the reference's 2^30 refusal."""
    from snprelate_tpu.ops.pairwise import pair_counts

    ws = _toy(n_snp=600, n_samp=33)
    ref = pair_counts(ws, chunk=64)
    ceiling_env(100)  # far below the 600-SNP selection: flush every chunk
    got = pair_counts(ws, chunk=64)
    for a, b in zip(ref.base(), got.base()):
        np.testing.assert_array_equal(a, b)
