"""Multi-device scaling benchmark (BASELINE.md config 5 analog): sharded
GRM/plane-gram throughput on a synthetic cohort over a (data, samp) mesh.

Run on a pod slice: python tools/bench_scaling.py --nsamp 8192 --nsnp 262144
On a dev box: JAX_PLATFORMS=cpu with --cpu-devices 8 exercises the same
sharded program on a virtual mesh.

Prints one JSON line per mesh configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsamp", type=int, default=4096)
    ap.add_argument("--nsnp", type=int, default=131072)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--cpu-devices", type=int, default=0)
    ap.add_argument("--samp-axis", type=int, default=1)
    args = ap.parse_args()

    if args.cpu_devices:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from snprelate_tpu.parallel.mesh import make_mesh, _sharded_gram_step

    ndev = len(jax.devices())
    rng = np.random.default_rng(0)
    n_chunks = args.nsnp // args.chunk

    configs = []
    d = 1
    while d <= ndev:
        configs.append(d)
        d *= 2

    for nd in configs:
        n_samp_axis = min(args.samp_axis, nd)
        n_data = nd // n_samp_axis
        mesh = make_mesh(n_data, n_samp_axis)
        n_pad = -(-args.nsamp // (128 * n_samp_axis)) * (128 * n_samp_axis)
        carry_sh = NamedSharding(mesh, P("data", None, "samp", None))
        batch_sh = NamedSharding(mesh, P("data", None, None))
        carry = jax.device_put(
            jnp.zeros((n_data, 4, n_pad, n_pad), jnp.int32), carry_sh)
        batches = [
            jax.device_put(
                rng.integers(0, 256, (n_data, args.chunk, n_pad // 4),
                             np.uint8), batch_sh)
            for _ in range(max(1, n_chunks // n_data))
        ]
        # warmup
        carry = _sharded_gram_step(carry, batches[0], mesh)
        _ = np.asarray(carry[0, 0, :2, :2])
        t0 = time.perf_counter()
        for pb in batches:
            carry = _sharded_gram_step(carry, pb, mesh)
        _ = np.asarray(jnp.sum(carry, axis=0)[0, :2, :2])
        dt = time.perf_counter() - t0
        n_snp_done = len(batches) * n_data * args.chunk
        pairs = 0.5 * args.nsamp * (args.nsamp + 1) * n_snp_done
        print(json.dumps({
            "devices": nd, "mesh": [n_data, n_samp_axis],
            "pair_snp_per_s": round(pairs / dt / 1e12, 4),
            "unit": "Tera pair-SNP/s",
            "wall_s": round(dt, 3),
        }))


if __name__ == "__main__":
    main()
