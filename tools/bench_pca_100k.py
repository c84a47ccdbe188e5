"""Single-chip wall-clock demo: randomized PCA top-32 PCs on a synthetic
100k-sample cohort (BASELINE.md target metric). Prints one JSON line.

The synthetic packed cohort is generated directly in HBM (jax.random), so
``pca_s`` measures the device compute path: decode + subspace iteration +
basis + projection. On this dev box host->device runs over a ~20 MB/s
tunnel; real TPU hosts stage over PCIe/DMA at GB/s, so staging is reported
separately (set PCA_STAGE=1 to include a host-staged run).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n_samp = int(os.environ.get("PCA_NSAMP", 100_000))
    n_snp = int(os.environ.get("PCA_NSNP", 65_536))
    iters = int(os.environ.get("PCA_ITERS", 6))
    chunk = int(os.environ.get("PCA_CHUNK", 4096))

    import jax
    import jax.numpy as jnp

    from snprelate_tpu.io.store import SNPData
    from snprelate_tpu.models.pca_randomized import randomized_pca
    from snprelate_tpu.workspace import Workspace

    n_pad = -(-n_samp // 128) * 128
    n_chunks = -(-n_snp // chunk)

    t0 = time.perf_counter()
    p_all = jax.random.randint(jax.random.key(0),
                               (n_chunks, chunk, n_pad // 4), 0, 256,
                               dtype=jnp.uint8)
    np.asarray(p_all[0, :1, :1])
    gen_t = time.perf_counter() - t0

    # metadata-only store; genotypes live in p_all on device
    data = SNPData(
        sample_id=np.arange(n_samp).astype(object), snp_id=np.arange(n_snp),
        genotype_packed=np.zeros((n_snp, 1), np.uint8), n_samp=n_samp,
        snp_position=np.arange(n_snp) * 100,
        snp_chromosome=np.ones(n_snp, np.int32))
    ws = Workspace(data, np.arange(n_samp), np.arange(n_snp))

    t0 = time.perf_counter()
    res = randomized_pca(ws, eigen_cnt=32, aux_dim=64, iter_num=iters,
                         seed=1, chunk=chunk, p_all=p_all)
    dt = time.perf_counter() - t0
    # warm run: jits cached (in-memory + persistent XLA cache), the
    # steady-state number for repeated analyses
    t0 = time.perf_counter()
    res = randomized_pca(ws, eigen_cnt=32, aux_dim=64, iter_num=iters,
                         seed=1, chunk=chunk, p_all=p_all)
    warm = time.perf_counter() - t0
    out = {
        "metric": "randomized PCA top-32 PCs wall-clock (1 chip)",
        "n_samp": n_samp, "n_snp": n_snp, "iters": iters,
        "gen_s": round(gen_t, 1), "pca_s": round(dt, 1),
        "pca_warm_s": round(warm, 1),
        "eigenvect_shape": list(res.eigenvect.shape),
        "top_eigenval": [round(float(x), 3) for x in res.eigenval[:4]],
    }

    if os.environ.get("PCA_STAGE") == "1":
        rng = np.random.default_rng(0)
        host = rng.integers(0, 256, (n_chunks, chunk, n_pad // 4), np.uint8)
        t0 = time.perf_counter()
        staged = jax.device_put(host)
        np.asarray(staged[0, :1, :1])
        out["stage_s"] = round(time.perf_counter() - t0, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
