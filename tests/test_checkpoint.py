# Checkpoint/resume for the streaming engines: the generalization of the
# reference's autosave/out-of-core protocols (SURVEY.md §5) to per-chunk
# accumulator checkpoints.
import os

import numpy as np
import pytest


def _patch_every1(monkeypatch):
    """Checkpoint after every chunk so short test runs hit the save path."""
    import snprelate_tpu.ops.pairwise as pairwise

    orig_ck = pairwise.Checkpointer

    def every1(path, every=64, meta=()):
        return orig_ck(path, every=1, meta=meta)

    monkeypatch.setattr(pairwise, "Checkpointer", every1)


def _patch_crash_after(monkeypatch, n_chunks):
    """Make the chunk stream raise after n chunks (simulated crash)."""
    import snprelate_tpu.parallel.stream as stream

    orig = stream.device_chunks

    def wrapper(ws_, chunk, n_pad, depth=2, start_chunk=0):
        def gen():
            for i, pk in enumerate(orig(ws_, chunk, n_pad, depth=depth,
                                        start_chunk=start_chunk)):
                if i >= n_chunks:
                    raise RuntimeError("simulated crash")
                yield pk

        return gen()

    monkeypatch.setattr(stream, "device_chunks", wrapper)
    return orig


def test_grm_checkpoint_resume(hapmap, tmp_path, monkeypatch):
    from snprelate_tpu import grm

    kw = dict(sample_id=hapmap.sample_id[:60], chunk=512,
              missing_rate=np.nan)
    base = grm(hapmap, **kw).grm

    ckpt = str(tmp_path / "grm.ckpt")
    _patch_every1(monkeypatch)
    orig_chunks = _patch_crash_after(monkeypatch, 3)
    with pytest.raises(RuntimeError, match="simulated crash"):
        grm(hapmap, checkpoint=ckpt, **kw)
    assert os.path.exists(ckpt)

    # restart without the crash: the stream must resume at chunk 3
    consumed = []

    def counting(ws_, chunk, n_pad, depth=2, start_chunk=0):
        consumed.append(start_chunk)
        return orig_chunks(ws_, chunk, n_pad, depth=depth,
                           start_chunk=start_chunk)

    import snprelate_tpu.parallel.stream as stream
    monkeypatch.setattr(stream, "device_chunks", counting)
    resumed = grm(hapmap, checkpoint=ckpt, **kw).grm
    assert consumed == [3], consumed
    np.testing.assert_allclose(resumed, base, rtol=0, atol=1e-12)


def test_checkpoint_meta_mismatch(tmp_path):
    """A checkpoint from a different selection/chunking is ignored."""
    from snprelate_tpu.ops.pairwise import Checkpointer

    p = str(tmp_path / "x.ckpt")
    ck = Checkpointer(p, every=1, meta=(1, 100, 60, 512))
    ck.save(5, [np.arange(4)])
    step, arrs = ck.load()
    assert step == 5 and np.array_equal(arrs[0], np.arange(4))
    ck2 = Checkpointer(p, every=1, meta=(1, 999, 60, 512))
    step2, arrs2 = ck2.load()
    assert step2 == 0 and arrs2 is None


def test_pca_checkpoint_equivalence(hapmap, tmp_path, monkeypatch):
    """A checkpointed run (no interruption) produces identical output and
    leaves a resumable artifact."""
    from snprelate_tpu import pca

    kw = dict(sample_id=hapmap.sample_id[:60], eigen_cnt=4, chunk=1024,
              missing_rate=np.nan)
    base = pca(hapmap, **kw)
    p = str(tmp_path / "pca.ckpt")
    _patch_every1(monkeypatch)
    ck = pca(hapmap, checkpoint=p, **kw)
    np.testing.assert_allclose(ck.eigenval[:4], base.eigenval[:4],
                               rtol=0, atol=0)
    assert os.path.exists(p)
