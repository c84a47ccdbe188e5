"""Synthetic-cohort store factory: builds real ON-DISK packed stores at
biobank scale with known ground truth (two populations + planted
relatives), at host-memory speed through the native row generator
(``codec_gen_cohort``, ~350 M genotypes/s on one core — a 100k x 1M
cohort materializes in ~5 min, vs shipping 26 GB over the accelerator
link from a device PRNG).

The reference has no analog (its tests use the bundled HapMap subset,
inst/extdata/hapmap_geno.gds); at north-star scale a generator with
planted structure is the only way to get a correctness-checkable
dataset: PC1 must separate the populations, relatedness screens must
recover exactly the planted duplicate/parent-child pairs
(tools/bench_biobank.py consumes the ``.truth.json`` sidecar).
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..native import gen_cohort_rows
from .store import write_packed_meta


def default_planted_pairs(n_samp: int, pop_boundary: int,
                          n_dup: int = 64, n_pc: int = 64):
    """Deterministic planted-relative index pairs, half per population,
    all indices distinct across the two sets (a dst reused as another
    pair's src would break the expected kinship)."""
    def spread(lo, w, count, region):
        # `count` spaced indices from the region'th fifth of [lo, lo+w)
        r0 = lo + (w * region) // 5
        step = max(1, (w // 5 - 1) // max(count, 1))
        return [r0 + step * i for i in range(count)]

    dup, pc = [], []
    for pop, (lo, hi) in enumerate(((0, pop_boundary),
                                    (pop_boundary, n_samp))):
        w = hi - lo
        nd = n_dup - n_dup // 2 if pop == 0 else n_dup // 2
        npc = n_pc - n_pc // 2 if pop == 0 else n_pc // 2
        nd, npc = min(nd, w // 5), min(npc, w // 5)
        dup += list(zip(spread(lo, w, nd, 1), spread(lo, w, nd, 2)))
        pc += list(zip(spread(lo, w, npc, 3), spread(lo, w, npc, 4)))
    flat = [i for pr in dup + pc for i in pr]
    if len(set(flat)) != len(flat):
        raise ValueError("planted pair indices collide")
    return dup, pc


def generate_synthetic_store(path: str, n_samp: int, n_snp: int,
                             seed: int = 7, structure: float = 0.05,
                             pop_boundary: int | None = None,
                             miss_u8: int = 3, dup_pairs=None,
                             pc_pairs=None, n_chrom: int = 22,
                             snp_block: int = 8192,
                             verbose: bool = False) -> dict:
    """Write ``<path>.packed`` + ``<path>.meta.npz`` + the ground-truth
    sidecar ``<path>.truth.json``; returns the truth dict.

    pop_boundary: first sample index of population B (default n_samp//2;
    the north-star runs align it to the tile group so group-index
    population labels agree with the annotation). dup_pairs/pc_pairs
    default to :func:`default_planted_pairs`; pass ``[]`` to plant
    nothing.
    """
    if pop_boundary is None:
        pop_boundary = n_samp // 2
    if dup_pairs is None or pc_pairs is None:
        d0, p0 = default_planted_pairs(n_samp, pop_boundary)
        dup_pairs = d0 if dup_pairs is None else dup_pairs
        pc_pairs = p0 if pc_pairs is None else pc_pairs
    nb = -(-n_samp // 4)
    import time
    t0 = time.time()
    with open(path + ".packed", "wb") as f:
        for s0 in range(0, n_snp, snp_block):
            nr = min(snp_block, n_snp - s0)
            f.write(gen_cohort_rows(seed, s0, nr, n_samp, pop_boundary,
                                    structure, miss_u8, dup_pairs,
                                    pc_pairs, dst_bytes=nb).tobytes())
            if verbose and (s0 // snp_block) % 16 == 0:
                done = s0 + nr
                print(f"  synth {done}/{n_snp} SNPs at "
                      f"{time.time() - t0:.0f}s", flush=True)
    pop = (np.arange(n_samp) >= pop_boundary).astype(np.int32)
    chrom = 1 + (np.arange(n_snp, dtype=np.int64) * n_chrom // n_snp)
    write_packed_meta(
        path, np.asarray([f"s{i}" for i in range(n_samp)], object),
        np.arange(n_snp), n_samp, np.arange(n_snp, dtype=np.int64) * 100,
        chrom.astype(np.int32), sample_annot={"pop": pop})
    truth = {
        "seed": seed, "n_samp": n_samp, "n_snp": n_snp,
        "structure": structure, "pop_boundary": int(pop_boundary),
        "miss_u8": miss_u8,
        "dup_pairs": [[int(a), int(b)] for a, b in dup_pairs],
        "pc_pairs": [[int(a), int(b)] for a, b in pc_pairs],
        "wall_s": round(time.time() - t0, 1),
        "bytes": n_snp * nb,
    }
    tmp = path + f".truth.json.tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(truth, f, indent=1)
    os.replace(tmp, path + ".truth.json")
    return truth
