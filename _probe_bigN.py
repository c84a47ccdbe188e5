import time
import numpy as np
from snprelate_tpu.io.store import SNPData
from snprelate_tpu.workspace import Workspace
from snprelate_tpu.models.grm import grm

n_samp, n_snp = 32768, 65536
rng = np.random.default_rng(0)
packed = rng.integers(0, 256, (n_snp, n_samp // 4), np.uint8)
data = SNPData(sample_id=np.arange(n_samp).astype(object),
               snp_id=np.arange(n_snp), genotype_packed=packed,
               n_samp=n_samp, snp_position=np.arange(n_snp) * 100,
               snp_chromosome=np.ones(n_snp, np.int32))
t0 = time.perf_counter()
res = grm(data, method="GCTA", autosome_only=False, remove_monosnp=False,
          missing_rate=np.nan)
dt = time.perf_counter() - t0
print(f"GCTA GRM {n_samp} samples x {n_snp} SNPs (row-tiled): {dt:.1f}s, "
      f"diag mean {np.nanmean(np.diag(res.grm)):.4f}, "
      f"finite {np.isfinite(res.grm).all()}")
