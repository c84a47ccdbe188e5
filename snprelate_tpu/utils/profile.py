"""Profiling hooks (the reference's only tracing is timestamped verbose
phase lines, dGenGWAS.cpp:1642-1650; on TPU the right tool is an XLA
trace you can open in Perfetto/TensorBoard).

Two entry points:

- ``trace(logdir)``: context manager around any library call; writes a
  jax.profiler trace (device timelines, HLO op breakdown, HBM usage).

    with snprelate_tpu.utils.profile.trace("/tmp/trace"):
        sr.grm(data)

- ``SNPRELATE_TPU_TRACE=<dir>`` environment variable: every
  ``init_workspace``-driven analysis in the process is traced into one
  directory without code changes (useful under the CLI:
  ``SNPRELATE_TPU_TRACE=/tmp/t python -m snprelate_tpu grm ...``).
  The first trace call activates it; nested/overlapping calls are
  no-ops (jax.profiler allows one active trace).
"""

from __future__ import annotations

import contextlib
import os

_active = [False]


@contextlib.contextmanager
def trace(logdir: str):
    """Profile the enclosed block with jax.profiler (no-op if a trace is
    already running)."""
    import jax

    if _active[0]:
        yield
        return
    _active[0] = True
    try:
        with jax.profiler.trace(str(logdir)):
            yield
    finally:
        _active[0] = False


@contextlib.contextmanager
def maybe_env_trace():
    """trace(...) into $SNPRELATE_TPU_TRACE when set, else a no-op."""
    logdir = os.environ.get("SNPRELATE_TPU_TRACE", "")
    if not logdir:
        yield
        return
    with trace(logdir):
        yield
