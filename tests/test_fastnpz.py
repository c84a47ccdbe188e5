"""fast_npz_load == np.load on every archive shape the checkpoints
write (and the compressed fallback)."""

import numpy as np
import pytest

from snprelate_tpu.utils.fastnpz import fast_npz_load


def _check(fn):
    got = fast_npz_load(fn)
    with np.load(fn) as z:
        assert sorted(got) == sorted(z.files)
        for k in z.files:
            ref = z[k]
            assert got[k].dtype == ref.dtype
            assert got[k].shape == ref.shape
            np.testing.assert_array_equal(got[k], ref)


def test_fast_npz_matches_np_load(tmp_path):
    fn = str(tmp_path / "t.npz")
    arrays = {
        "grm": np.random.default_rng(0).random((37, 53)).astype("<f4"),
        "counts": np.arange(24, dtype="<i8").reshape(4, 6),
        "step": np.int64(7),                    # 0-d scalar
        "flag": np.asarray(True),
        "fort": np.asfortranarray(np.arange(12.0).reshape(3, 4)),
        "empty": np.zeros((0, 5), "<f8"),
    }
    with open(fn, "wb") as f:
        np.savez(f, **arrays)
    _check(fn)


def test_fast_npz_compressed_fallback(tmp_path):
    fn = str(tmp_path / "c.npz")
    np.savez_compressed(fn, a=np.arange(1000, dtype="<i4"),
                        b=np.ones((10, 10), "<f8"))
    _check(fn)


def test_fast_npz_refuses_pickles(tmp_path):
    fn = str(tmp_path / "p.npz")
    np.savez(fn, obj=np.asarray([{"a": 1}], object))
    with pytest.raises(ValueError):
        fast_npz_load(fn)


def test_transpose_into_matches_numpy():
    from snprelate_tpu.native import transpose_into

    rng = np.random.default_rng(3)
    for dt in (np.float32, np.float64):
        for n, m in ((257, 123), (64, 64), (1, 7), (130, 1)):
            a = rng.random((n, m)).astype(dt)
            # strided destination view (the assembly writes column slices
            # of a wider row block)
            dst = np.empty((m + 3, n + 5), dt)[1: m + 1, 2: n + 2]
            transpose_into(dst, a)
            np.testing.assert_array_equal(dst, a.T)
            # element-strided-row SOURCE view (tile[:nc, :nr] slices)
            src = a[: n - 1, : m - 1] if n > 1 and m > 1 else a
            d2 = np.empty(src.shape[::-1], dt)
            transpose_into(d2, src)
            np.testing.assert_array_equal(d2, src.T)


def test_transpose_into_numpy_fallback(monkeypatch):
    import snprelate_tpu.native as native

    monkeypatch.setattr(native, "get_lib", lambda: None)
    a = np.random.default_rng(4).random((600, 700)).astype(np.float32)
    dst = np.empty((700, 600), np.float32)
    native.transpose_into(dst, a)
    np.testing.assert_array_equal(dst, a.T)


def test_checkpoint_loaders_roundtrip(tmp_path):
    """The three switched call sites still roundtrip their own saves."""
    from snprelate_tpu.ops.tiles import TileGridCheckpointer

    ck = TileGridCheckpointer(str(tmp_path / "g"), meta=(71, 10, 20, 4, 2))
    a = np.random.default_rng(1).random((8, 8)).astype(np.float32)
    ck.save(0, 1, grm=a, num=np.ones((8, 8), np.int32))
    got = ck.load(0, 1)
    np.testing.assert_array_equal(got["grm"], a)
    assert got["num"].dtype == np.int32

    from snprelate_tpu.ops.pairwise import Checkpointer

    cc = Checkpointer(str(tmp_path / "c.npz"), meta=(1, 2, 3))
    arrs = [np.arange(6).reshape(2, 3), np.ones(4, np.int64)]
    cc.save(5, arrs)
    step, back = cc.load()
    assert step == 5
    for x, y in zip(arrs, back):
        np.testing.assert_array_equal(x, y)
