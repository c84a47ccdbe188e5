"""Per-component timing probe for the fused pairwise step on the real TPU.

Times each constituent of bench.py's fused step in isolation:
  - the reduced 4-gram int4 basis contraction (with and without the
    decode+basis+transpose elementwise chain)
  - f32 covariance (N, S) @ (S, N) at HIGHEST / HIGH / DEFAULT precision
  - legacy shapes (full 3N gram, 6-block one-hot) for comparison
so optimization effort goes where the time is. The axon tunnel backend's
block_until_ready does not wait; a dependent tiny slice materialization
does. Measured 2026-08-17 at N=16384, S=32768: 4-gram+decode 61% of the
789 int4 TOPS peak, raw 4-gram 67% (decode ~10% of gram time), HIGH cov
77% of its 3-pass-bf16 peak -> bench vs_baseline ~0.73 is matmul-bound,
not elementwise-bound.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(out.ravel()[:2])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out.ravel()[:2])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from snprelate_tpu.ops.decode import (decode2bit, genotype_basis,
                                          genotype_planes)
    from snprelate_tpu.ops.pairwise import (make_pca_block, _flat_planes,
                                            _sym_grams4)

    n = int(os.environ.get("PROBE_NSAMP", 4096))
    s = int(os.environ.get("PROBE_CHUNK", 16384))
    nch = int(os.environ.get("PROBE_NCHUNKS", 8))

    rng = np.random.default_rng(0)
    packed = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (nch, s, n // 4), np.uint8)))
    flat8 = jax.device_put(jnp.asarray(
        rng.integers(0, 2, (nch, 3 * n, s), np.int8)))
    xf = jax.device_put(jnp.asarray(
        rng.standard_normal((nch, s, n), np.float32)))

    def scan_over(fn, init):
        @jax.jit
        def run(data):
            def step(c, d):
                return c + fn(d), ()
            out, _ = lax.scan(step, init, data)
            return out
        return run

    # 1. int4 gram
    g_int4 = scan_over(
        lambda f: jnp.matmul(f.astype(jnp.int4), f.astype(jnp.int4).T,
                             preferred_element_type=jnp.int32),
        jnp.zeros((3 * n, 3 * n), jnp.int32))
    t = timeit(g_int4, flat8)
    ops = 2.0 * nch * (3 * n) ** 2 * s
    print(f"int4 gram    : {t*1e3:8.1f} ms  {ops/t/1e12:7.1f} TOPS "
          f"({ops/t/789e12*100:.0f}% of 789)")

    # 2. f32 cov at each precision
    for prec in ["HIGHEST", "HIGH", "DEFAULT"]:
        p = getattr(lax.Precision, prec)
        cov = scan_over(
            lambda x, p=p: jnp.matmul(x.T, x, preferred_element_type=jnp.float32,
                                      precision=p),
            jnp.zeros((n, n), jnp.float32))
        t = timeit(cov, xf)
        ops = 2.0 * nch * n * n * s
        print(f"f32 cov {prec:8s}: {t*1e3:8.1f} ms  {ops/t/1e12:7.1f} TFLOPS")

    # 2b. six-block symmetric gram: only a<=b plane pairs (6/9 of the work)
    planes8 = jax.device_put(jnp.asarray(
        rng.integers(0, 2, (nch, 3, n, s), np.int8)))

    def six_block(pl3):
        p = pl3.astype(jnp.int4)
        outs = []
        for a in range(3):
            for b in range(a, 3):
                outs.append(jnp.matmul(p[a], p[b].T,
                                       preferred_element_type=jnp.int32))
        return jnp.stack(outs)

    g6 = scan_over(six_block, jnp.zeros((6, n, n), jnp.int32))
    t = timeit(g6, planes8)
    ops = 2.0 * nch * 6 * n * n * s
    print(f"int4 6-block : {t*1e3:8.1f} ms  {ops/t/1e12:7.1f} TOPS "
          f"(full-gram-equivalent {ops*1.5/t/1e12:.1f})")

    # 2c. int8 full gram for comparison
    g_int8 = scan_over(
        lambda f: jnp.matmul(f, f.T, preferred_element_type=jnp.int32),
        jnp.zeros((3 * n, 3 * n), jnp.int32))
    t = timeit(g_int8, flat8)
    ops = 2.0 * nch * (3 * n) ** 2 * s
    print(f"int8 gram    : {t*1e3:8.1f} ms  {ops/t/1e12:7.1f} TOPS")

    # 3. elementwise chain (decode -> planes -> pca block), tiny matmul to
    # keep a data dependency
    def elemwise(pk):
        geno = decode2bit(pk)
        fl = _flat_planes(pk)
        x, _ = make_pca_block(geno, False)
        return (fl.astype(jnp.int32).sum(1, keepdims=True)[:8, :1]
                + x.sum(0)[:8, None])
    ew = scan_over(elemwise, jnp.zeros((8, 1), jnp.float32))
    t = timeit(ew, packed)
    print(f"decode+planes+pcablock: {t*1e3:8.1f} ms")

    # 2d. the production contraction: reduced 4-gram basis + decode
    def basis_gram(pk):
        vv, hh, dd, hv = _sym_grams4(genotype_basis(decode2bit(pk)))
        return vv + hh + dd + hv

    g4 = scan_over(basis_gram, jnp.zeros((n, n), jnp.int32))
    t = timeit(g4, packed)
    ops = 2.0 * nch * 4 * n * n * s
    print(f"4-gram+decode: {t*1e3:8.1f} ms  {ops/t/1e12:7.1f} TOPS "
          f"({ops/t/789e12*100:.0f}% of 789)")

    # 4. full fused step (reference point = bench.py composition)
    def fused(pk):
        geno = decode2bit(pk)
        vv, hh, dd, hv = _sym_grams4(genotype_basis(geno))
        x, _ = make_pca_block(geno, False)
        c = jnp.matmul(x.T, x, preferred_element_type=jnp.float32,
                       precision=lax.Precision.HIGH)
        return (vv + hh + dd + hv)[:2, :2].astype(jnp.float32) + c[:2, :2]

    fz = scan_over(fused, jnp.zeros((2, 2), jnp.float32))
    t = timeit(fz, packed)
    print(f"fused step total       : {t*1e3:8.1f} ms "
          f"({nch} chunks of {s} x {n})")


if __name__ == "__main__":
    main()
