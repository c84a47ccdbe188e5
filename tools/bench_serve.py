"""Serving-latency benchmark: CohortService /project + /kinship + /ibs
against a resident synthetic cohort on the default backend.

Measures what a deployment sees: startup (load + PCA fit + HBM staging),
then per-request latency for small query batches — each request is a
rectangular (q x n) pass over cohort chunks already staged in device
memory (ops.pairwise.cross_pair_counts(staged=)), so steady-state latency
is MXU + host post-processing, not cohort re-streaming.

Prints one JSON object. Run on the TPU; ~2 min including compiles.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _synth_cohort(n_samp: int, n_snp: int, seed: int = 0):
    from snprelate_tpu.io.store import create_geno

    rng = np.random.default_rng(seed)
    p = rng.uniform(0.05, 0.95, n_snp)
    g = (rng.random((n_snp, n_samp)) < p[:, None]).astype(np.uint8)
    g += (rng.random((n_snp, n_samp)) < p[:, None]).astype(np.uint8)
    g[rng.random((n_snp, n_samp)) < 0.002] = 3
    return create_geno(
        g, sample_id=[f"s{i}" for i in range(n_samp)],
        snp_id=np.arange(n_snp), snp_position=np.arange(n_snp) * 100,
        snp_chromosome=np.ones(n_snp, np.int32))


def _lat(fn, reps: int):
    """Median / p95 wall latency; the service returns host numpy, so each
    call is end-to-end materialized (no async-dispatch illusion)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], ts[max(0, int(len(ts) * 0.95) - 1)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsamp", type=int, default=8192)
    ap.add_argument("--nsnp", type=int, default=32768)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (this JAX build ignores "
                         "JAX_PLATFORMS env vars)")
    a = ap.parse_args()
    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from snprelate_tpu.serve import CohortService

    data = _synth_cohort(a.nsamp, a.nsnp)
    t0 = time.perf_counter()
    svc = CohortService(data, eigen_cnt=16, autosome_only=False,
                        remove_monosnp=False, missing_rate=float("nan"))
    startup_s = time.perf_counter() - t0

    rng = np.random.default_rng(1)
    queries = {}
    for q in (1, 16):
        idx = rng.choice(a.nsamp, q, replace=False)
        from snprelate_tpu import get_geno

        g = get_geno(svc.cohort, sample_id=svc.cohort.sample_id[idx],
                     snpfirstdim=False)
        queries[q] = np.where(np.isnan(g), 3, g).astype(np.uint8)

    out = {"n_samp": a.nsamp, "n_snp": a.nsnp, "startup_s": round(
        startup_s, 3), "backend": __import__("jax").default_backend()}
    for name, call in (
            ("project", lambda g: svc.project(g)),
            ("kinship", lambda g: svc.kinship(g, cutoff=0.1)),
            ("ibs", lambda g: svc.ibs(g, top=5))):
        for q, g in queries.items():
            call(g)  # warm (compile)
            p50, p95 = _lat(lambda: call(g), a.reps)
            out[f"{name}_q{q}_p50_ms"] = round(p50 * 1e3, 1)
            out[f"{name}_q{q}_p95_ms"] = round(p95 * 1e3, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
