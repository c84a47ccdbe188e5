import time
import numpy as np
from snprelate_tpu.io.store import create_geno
import snprelate_tpu as sr

rng = np.random.default_rng(3)
n_snp, n_samp = 50_000, 1024
# correlated blocks to give pruning something to drop
base = rng.choice([0, 1, 2], size=(n_snp // 10, n_samp)).astype(np.uint8)
g = np.repeat(base, 10, axis=0)
flip = rng.random(g.shape) < 0.2
g = np.where(flip, rng.integers(0, 3, g.shape), g).astype(np.uint8)
data = create_geno(g, sample_id=[f"s{i}" for i in range(n_samp)],
                   snp_id=np.arange(n_snp),
                   snp_position=np.arange(n_snp) * 500,
                   snp_chromosome=np.ones(n_snp, np.int32))
t0 = time.perf_counter()
res = sr.ld_pruning(data, seed=7, autosome_only=False)
dt = time.perf_counter() - t0
kept = sum(len(v) for v in res.values())
print(f"ld_pruning 50k SNPs x 1024 samp: {dt:.1f}s, kept {kept}")
