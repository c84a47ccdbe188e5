"""Single-chip wall-clock demo: randomized PCA top-32 PCs on a synthetic
100k-sample cohort (BASELINE.md target metric). Prints one JSON line."""

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

    from snprelate_tpu.io.store import SNPData
    from snprelate_tpu.workspace import Workspace
    from snprelate_tpu.models.pca_randomized import randomized_pca

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    # synthetic packed genotypes straight in 2-bit form (uniform byte values
    # decode to genotype distribution {0,1,2,3} per 2-bit field)
    packed = rng.integers(0, 256, (n_snp, n_samp // 4), np.uint8)
    data = SNPData(
        sample_id=np.arange(n_samp).astype(object), snp_id=np.arange(n_snp),
        genotype_packed=packed, n_samp=n_samp,
        snp_position=np.arange(n_snp) * 100,
        snp_chromosome=np.ones(n_snp, np.int32))
    gen_t = time.perf_counter() - t0

    ws = Workspace(data, np.arange(n_samp), np.arange(n_snp))
    t0 = time.perf_counter()
    res = randomized_pca(ws, eigen_cnt=32, aux_dim=64, iter_num=iters,
                         seed=1, chunk=4096)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "randomized PCA top-32 PCs wall-clock (1 chip)",
        "n_samp": n_samp, "n_snp": n_snp, "iters": iters,
        "gen_s": round(gen_t, 1), "pca_s": round(dt, 1),
        "eigenvect_shape": list(res.eigenvect.shape),
        "top_eigenval": [round(float(x), 3) for x in res.eigenval[:4]],
    }))


if __name__ == "__main__":
    main()
