"""Round-2 perf experiments (VERDICT r1 #9): alternatives for the two
bench-dominant contractions at the bench shape (N=16384, S=32768).

Int4 gram variants:
  A. production: transpose-then-matmul (b.T layout, 4 separate matmuls)
  B. dot_general contracting the SNP axis directly from (S, N) operands
     (no explicit transpose in the graph)
  C. one batched (4, N, S) x (4, N, S) dot_general
  D. triangular-blocked symmetric grams for vv/hh/dd (hv stays full),
     nblk 4 and 8
Covariance variants (f32 HIGH):
  E. production: block-triangular nblk=8
  F. nblk=4 (62.5% of full work in bigger matmuls)
  G. dot_general over the S axis, full square, from (S, N) layout
  H. full-square plain matmul(x.T, x)
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

    from snprelate_tpu.ops.decode import decode2bit, genotype_basis
    from snprelate_tpu.ops.pairwise import _sym_blocks, _sym_grams4

    n = int(os.environ.get("PROBE_NSAMP", 16384))
    s = int(os.environ.get("PROBE_CHUNK", 32768))
    nch = int(os.environ.get("PROBE_NCHUNKS", 4))
    # operands generated ON DEVICE: staging them over the dev tunnel
    # (~3 MB/s) would dwarf the measurement
    key = jax.random.key(0)
    packed = jax.jit(lambda k: jax.random.bits(
        k, (nch, s, n // 4), jnp.uint8))(key)
    nchf = 2  # f32 operand is 16x the packed bytes: halve the chunks
    xf = jax.jit(lambda k: jax.random.normal(
        k, (nchf, s, n), jnp.float32))(key)
    np.asarray(packed.ravel()[:1]); np.asarray(xf.ravel()[:1])

    def scan_over(fn, init):
        @jax.jit
        def run(data):
            def step(c, d):
                delta = fn(d)
                return jax.tree.map(lambda a, b: a + b, c, delta), ()
            out, _ = lax.scan(step, init, data)
            # DCE guard: consume EVERY carry leaf (a full reduction per
            # leaf, once per run — returning just leaves[0] lets the
            # compiler delete the other grams' matmuls entirely, which
            # the current toolchain now does)
            return sum(jnp.sum(v, dtype=jnp.float32)
                       for v in jax.tree.leaves(out))
        return run

    gram_ops = 2.0 * nch * 4 * n * n * s

    # A. production path
    def prod(pk):
        vv, hh, dd, hv = _sym_grams4(genotype_basis(decode2bit(pk)))
        return (vv + hh + dd + hv,)

    t = timeit(scan_over(prod, (jnp.zeros((n, n), jnp.int32),)), packed)
    print(f"A 4-gram transpose+mm : {t*1e3:8.1f} ms "
          f"{gram_ops/t/1e12:6.1f} TOPS ({gram_ops/t/789e12*100:.0f}%)")

    # B. dot_general over the S axis, (S, N) layout
    dn = (((0,), (0,)), ((), ()))

    def dg(pk):
        basis = genotype_basis(decode2bit(pk)).astype(jnp.int4)  # (3,S,N)
        v, h, d = basis[0], basis[1], basis[2]

        def mm(x, y):
            return lax.dot_general(x, y, dn,
                                   preferred_element_type=jnp.int32)

        return (mm(v, v) + mm(h, h) + mm(d, d) + mm(h, v),)

    t = timeit(scan_over(dg, (jnp.zeros((n, n), jnp.int32),)), packed)
    print(f"B 4-gram dot_general S: {t*1e3:8.1f} ms "
          f"{gram_ops/t/1e12:6.1f} TOPS ({gram_ops/t/789e12*100:.0f}%)")

    # C. batched 4-gram
    def batched(pk):
        b = genotype_basis(decode2bit(pk)).transpose(0, 2, 1) \
            .astype(jnp.int4)  # (3,N,S)
        lhs = jnp.stack([b[0], b[1], b[2], b[1]])
        rhs = jnp.stack([b[0], b[1], b[2], b[0]])
        out = lax.dot_general(lhs, rhs, (((2,), (2,)), ((0,), (0,))),
                              preferred_element_type=jnp.int32)
        return (out.sum(0),)

    t = timeit(scan_over(batched, (jnp.zeros((n, n), jnp.int32),)), packed)
    print(f"C 4-gram batched      : {t*1e3:8.1f} ms "
          f"{gram_ops/t/1e12:6.1f} TOPS ({gram_ops/t/789e12*100:.0f}%)")

    # D. triangular-blocked symmetric grams for vv/hh/dd + full hv
    for nblk in (4, 8):
        nb = n // nblk
        nbl = nblk * (nblk + 1) // 2

        def tri(pk, nblk=nblk, nb=nb):
            b = genotype_basis(decode2bit(pk)).transpose(0, 2, 1) \
                .astype(jnp.int4)
            v, h, d = b[0], b[1], b[2]
            outs = []
            for m in (v, h, d):
                for a in range(nblk):
                    for bb in range(a, nblk):
                        outs.append(jnp.matmul(
                            m[a * nb:(a + 1) * nb],
                            m[bb * nb:(bb + 1) * nb].T,
                            preferred_element_type=jnp.int32))
            hv = jnp.matmul(h, v.T, preferred_element_type=jnp.int32)
            return (hv, tuple(outs))

        eff_ops = 2.0 * nch * (3 * (nbl / (nblk * nblk)) + 1) * n * n * s
        init = (jnp.zeros((n, n), jnp.int32),
                tuple(jnp.zeros((nb, nb), jnp.int32) for _ in range(3 * nbl)))
        t = timeit(scan_over(tri, init), packed)
        print(f"D tri-blocked nblk={nblk}  : {t*1e3:8.1f} ms "
              f"computed-ops {eff_ops/t/1e12:6.1f} TOPS; "
              f"full-equiv {gram_ops/t/1e12:6.1f}")

    # E/F: block-triangular covariance
    cov_full_ops = 2.0 * nchf * n * n * s
    for nblk in (8, 4):
        nbl = nblk * (nblk + 1) // 2

        def covb(x, nblk=nblk):
            return _sym_blocks(x, x, nblk,
                               preferred_element_type=jnp.float32,
                               precision=lax.Precision.HIGH)

        nb = n // nblk
        init = tuple(jnp.zeros((nb, nb), jnp.float32) for _ in range(nbl))

        @jax.jit
        def run(data, covb=covb, init=init):
            def step(c, d):
                return tuple(a + b for a, b in zip(c, covb(d))), ()
            out, _ = lax.scan(step, init, data)
            return sum(jnp.sum(v) for v in out)  # DCE guard: all blocks

        t = timeit(run, xf)
        frac = nbl / (nblk * nblk)
        print(f"EF cov HIGH nblk={nblk}   : {t*1e3:8.1f} ms "
              f"computed {cov_full_ops*frac/t/1e12:6.1f} TFLOPS "
              f"({cov_full_ops*frac/t/65.7e12*100:.0f}% of 3-pass peak)")

    # G. dot_general full square from (S, N)
    def covg(x):
        return lax.dot_general(x, x, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=lax.Precision.HIGH)

    t = timeit(scan_over(covg, jnp.zeros((n, n), jnp.float32)), xf)
    print(f"G cov HIGH dot_general: {t*1e3:8.1f} ms "
          f"{cov_full_ops/t/1e12:6.1f} TFLOPS "
          f"({cov_full_ops/t/65.7e12*100:.0f}%)")

    # H. full-square x.T @ x
    def covh(x):
        return jnp.matmul(x.T, x, preferred_element_type=jnp.float32,
                          precision=lax.Precision.HIGH)

    t = timeit(scan_over(covh, jnp.zeros((n, n), jnp.float32)), xf)
    print(f"H cov HIGH full mm    : {t*1e3:8.1f} ms "
          f"{cov_full_ops/t/1e12:6.1f} TFLOPS "
          f"({cov_full_ops/t/65.7e12*100:.0f}%)")


if __name__ == "__main__":
    main()
