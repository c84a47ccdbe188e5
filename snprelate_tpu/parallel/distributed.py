"""Multi-host bootstrap: the distributed story the reference lacks
(SURVEY.md §2.3 — its only "distributed" mechanism is offline file-based
GRM merging, R/IBD.R:624-748).

On a TPU pod slice each host runs the same program; ``init_distributed``
wires them into one JAX runtime, and ``global_mesh`` builds the
(data, samp) mesh over every chip in the slice so the sharded engines
(`parallel.mesh`, sharded randomized PCA) span hosts transparently —
SNP chunks data-parallel across hosts (ICI/DCN all-reduce of n x n tile
accumulators), sample-row sharding intra-host.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (no-op on a single-process run).

    On TPU pods the arguments are discovered from the environment; pass
    them explicitly for CPU/GPU clusters or manual setups."""
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)


def global_mesh(n_samp_axis: int = 1):
    """A (data, samp) mesh over every device in the (possibly multi-host)
    runtime. SNP-chunk data parallelism rides the outer axis — on a pod
    slice that axis spans hosts, so per-host partial accumulators merge
    with one all-reduce per analysis (the on-line analog of
    snpgdsMergeGRM)."""
    import jax

    from .mesh import make_mesh

    devices = np.asarray(jax.devices())
    if len(devices) % n_samp_axis:
        raise ValueError(f"{len(devices)} devices not divisible by "
                         f"samp axis {n_samp_axis}")
    return make_mesh(len(devices) // n_samp_axis, n_samp_axis,
                     devices=devices)
