"""Benchmark: fused GRM+IBS pairwise-kernel throughput on one chip.

Runs the flagship fused step (reduced 4-gram int4 count basis
[V, H, D] -> IBS/KING/Beta counters, plus Eigenstrat-normalized covariance
-> GRM/PCA) over a synthetic cohort staged in HBM, and reports
genotype-pair-SNP comparisons per second per chip.

vs_baseline = fraction of MXU speed-of-light for the same contraction
volume (the driver's north-star metric; the reference publishes no numbers,
BASELINE.md). Peak used: TPU v5e 394.5 int8 TOPS (789 int4) / 197 bf16
TFLOPS.

Output: one JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def _wait_for_backend(max_wait=1500, probe_timeout=240):
    """Device discovery on the axon tunnel can hang indefinitely after a
    killed TPU process. Probe it in a child process (killable on exact
    PID) until it answers or `max_wait` passes, so the driver's bench run
    fails fast with a message instead of hanging forever."""
    import subprocess

    deadline = time.time() + max_wait
    attempt = 0
    while True:
        attempt += 1
        try:
            p = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True)
            if p.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        print(f"bench: backend probe {attempt} failed; retrying "
              f"({int(deadline - time.time())}s left)", file=sys.stderr)
        time.sleep(30)


def main():
    if os.environ.get("BENCH_SKIP_PROBE", "0") != "1" and \
            not _wait_for_backend():
        print("bench: JAX backend unreachable (axon tunnel wedged); "
              "no result", file=sys.stderr)
        return 1

    import jax
    import jax.numpy as jnp
    from snprelate_tpu.ops.decode import decode2bit, genotype_basis
    from snprelate_tpu.ops.pairwise import (_choose_nblk, _sym_blocks,
                                            _sym_grams4, make_pca_block,
                                            norm_precision)

    # 16384 samples: fits HBM with the 4-gram int32 carries (4.3 GB) and
    # the wider matmuls run ~24% faster than 8192 (13.6 vs 11.0 T). 131k
    # SNPs keeps the staged-input volume at 537 MB (the dev tunnel's
    # host->device bandwidth is variable; same pair-SNP/s at 262k).
    n_samp = int(os.environ.get("BENCH_NSAMP", 16384))
    n_snp = int(os.environ.get("BENCH_NSNP", 131072))
    chunk = int(os.environ.get("BENCH_CHUNK", 32768))
    n_chunks = max(1, n_snp // chunk)
    n_snp = n_chunks * chunk  # credit only the SNPs actually processed
    nblk = _choose_nblk(n_samp)
    nbl = nblk * (nblk + 1) // 2

    rng = np.random.default_rng(1)
    packed = rng.integers(0, 256, (n_chunks, chunk, n_samp // 4), np.uint8)
    packed_d = jax.device_put(jnp.asarray(packed))

    def tree_add(c, d):
        return tuple(a + b for a, b in zip(c, d))

    def fused_step(carry, pk):
        grams, cov = carry
        geno = decode2bit(pk)
        grams = tree_add(grams, _sym_grams4(genotype_basis(geno)))
        x, _ = make_pca_block(geno, False)
        cov = tree_add(cov, _sym_blocks(x, x, nblk,
                                        preferred_element_type=jnp.float32,
                                        precision=norm_precision()))
        return (grams, cov), ()

    @jax.jit
    def run(pk_all):
        nb = n_samp // nblk
        init = (tuple(jnp.zeros((n_samp, n_samp), jnp.int32)
                      for _ in range(4)),
                tuple(jnp.zeros((nb, nb), jnp.float32) for _ in range(nbl)))
        (grams, cov), _ = jax.lax.scan(fused_step, init, pk_all)
        return grams, cov

    def materialize(g, c):
        # block_until_ready does not wait for execution on the axon tunnel
        # backend; a device->host copy of a small dependent slice does.
        # g and c are full jit outputs, so nothing is DCE'd.
        return np.asarray(g[0][:2, :2]), np.asarray(c[0][:2, :2])

    # warmup/compile
    g, c = run(packed_d)
    materialize(g, c)
    reps = int(os.environ.get("BENCH_REPS", 3))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        g, c = run(packed_d)
        materialize(g, c)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    pair_snp = 0.5 * n_samp * (n_samp + 1) * n_snp  # pair-SNP comparisons
    value = pair_snp / dt

    # speed-of-light model: 4 reduced-basis int4 grams (2*4*N^2*M ops at
    # the v5e int4 rate, 2x int8 = 789 TOPS) + the block-triangular f32
    # cov (nbl blocks of (N/nblk)^2) at norm_precision() (bf16 multi-pass:
    # HIGHEST=6 passes, HIGH=3, DEFAULT=1 at 197 TFLOPS)
    from jax import lax as _lax
    passes = {_lax.Precision.HIGHEST: 6, _lax.Precision.HIGH: 3,
              _lax.Precision.DEFAULT: 1}[norm_precision()]
    int4_ops = 2.0 * 4 * n_samp * n_samp * n_snp
    f32_ops = 2.0 * nbl * (n_samp // nblk) ** 2 * n_snp
    sol_t = int4_ops / 789e12 + f32_ops / (197e12 / passes)
    vs_baseline = sol_t / dt

    print(json.dumps({
        "metric": "fused GRM+IBS pairwise throughput (1 chip)",
        "value": round(value / 1e12, 4),
        "unit": "Tera pair-SNP comparisons/s/chip",
        "vs_baseline": round(vs_baseline, 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
