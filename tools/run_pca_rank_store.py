"""Rank-distributed PCA over an on-disk packed store, one PHASE per
subprocess.

Why subprocesses: this box's accelerator-tunnel runtime leaks the host
staging buffer of every device transfer for the life of the process
(measured: device_put of a 512 MB array grows RSS by exactly 512 MB,
unrecoverable by gc/clear_caches). A 100k x 1M power pass uploads
~20-30 GB of slabs, so an in-process multi-pass run is OOM-killed at
~130 GB host RSS; per-pass processes bound the leak to one pass. On
hosts without the tunnel runtime the in-process driver
(models/pca_rank.randomized_pca_ranked) is the normal path.

The phases communicate only through the shared workdir (the same
file-barrier protocol as pca_rank_process), so per-phase walls measured
sequentially here equal concurrent multi-host walls — each subprocess
is exactly what one host would run.

Usage (driver):  python tools/run_pca_rank_store.py --store /tmp/ns100k
    --workdir /tmp/ns_pca --world 2 [--iters 4] [--pcs 32]
    [--grm-json SCAN.json] [-o ASSEMBLY.json]
Phase mode (internal): --phase power --it N --rank R ...
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _mk_source(store, group, chunk):
    from snprelate_tpu.io.store import open_packed_store
    from snprelate_tpu.ops.tiles import StoreSlabSource
    from snprelate_tpu.workspace import init_workspace

    data = open_packed_store(store)
    ws, _ = init_workspace(data, autosome_only=False,
                           remove_monosnp=False, missing_rate=np.nan)
    return StoreSlabSource(ws, group, chunk), data


def run_phase(a):
    from snprelate_tpu.models import pca_rank as pr

    if a.phase == "reduce":
        pr.pca_rank_reduce(a.workdir, a.world, a.it, verbose=True)
        return
    if a.phase == "assemble":
        res = pr.pca_rank_assemble(a.workdir, a.world, a.samples, a.pcs)
        np.savez(os.path.join(a.workdir, "eigen.npz"),
                 eigenval=res.eigenval, eigenvect=res.eigenvect,
                 varprop=res.varprop)
        return
    src, _ = _mk_source(a.store, a.group, a.chunk)
    if a.phase == "power":
        pr.pca_rank_power(src, a.samples, a.workdir, a.rank, a.world,
                          a.it, a.aux, seed=11, verbose=True)
    elif a.phase == "project":
        pr.pca_rank_project(src, a.samples, a.workdir, a.rank, a.world,
                            a.iters, a.aux, seed=11, verbose=True)
    else:
        raise SystemExit(f"unknown phase {a.phase}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--world", type=int, default=2)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--pcs", type=int, default=32)
    ap.add_argument("--aux", type=int, default=None)
    ap.add_argument("--samples", type=int, default=None)
    ap.add_argument("--group", type=int, default=12288)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--grm-json", default=None,
                    help="measured GRM/scan phase record to embed")
    ap.add_argument("-o", "--out", default=None)
    # phase mode
    ap.add_argument("--phase", default=None)
    ap.add_argument("--it", type=int, default=0)
    ap.add_argument("--rank", type=int, default=0)
    a = ap.parse_args()
    if a.aux is None:
        a.aux = 2 * a.pcs
    if a.samples is None:
        with np.load(a.store + ".meta.npz", allow_pickle=True) as z:
            a.samples = int(z["n_samp"])
    if a.phase:
        run_phase(a)
        return

    os.makedirs(a.workdir, exist_ok=True)
    timings = {}

    def sub(phase, it=0, rank=0):
        t0 = time.time()
        cmd = [sys.executable, os.path.abspath(__file__),
               "--store", a.store, "--workdir", a.workdir,
               "--world", str(a.world), "--iters", str(a.iters),
               "--pcs", str(a.pcs), "--aux", str(a.aux),
               "--samples", str(a.samples), "--group", str(a.group),
               "--chunk", str(a.chunk), "--phase", phase,
               "--it", str(it), "--rank", str(rank)]
        subprocess.run(cmd, check=True)
        dt = time.time() - t0
        timings[(phase, it, rank)] = dt
        print(json.dumps({"phase": phase, "it": it, "rank": rank,
                          "wall_s": round(dt, 1)}), flush=True)

    t_all = time.time()
    for it in range(a.iters):
        for r in range(a.world):
            sub("power", it, r)
        sub("reduce", it, -1)
    for r in range(a.world):
        sub("project", 0, r)
    sub("assemble", 0, -1)
    wall_1proc = time.time() - t_all

    crit = 0.0
    for it in range(a.iters):
        crit += max(timings[("power", it, r)] for r in range(a.world))
        crit += timings[("reduce", it, -1)]
    crit += max(timings[("project", 0, r)] for r in range(a.world))
    crit += timings[("assemble", 0, -1)]

    with np.load(os.path.join(a.workdir, "eigen.npz")) as z:
        eigenvect = z["eigenvect"]
        varprop = z["varprop"]
    # PC1 population separation vs the store's planted annotation
    with np.load(a.store + ".meta.npz", allow_pickle=True) as z:
        lab = np.asarray(z["sannot.pop"], int)
        n_snp = len(z["snp_id"])
    pc1 = eigenvect[:, 0]
    sep = np.median(pc1[lab == 1]) - np.median(pc1[lab == 0])
    pol = np.sign(sep) if sep != 0 else 1.0
    frac = float(((pc1 * pol > 0) == (lab == 1)).mean())

    import jax

    res = {
        "n_samples": a.samples, "n_snps": int(n_snp), "group": a.group,
        "chunk": a.chunk, "backend": jax.default_backend(),
        "source": "disk",
        "pca_rank": {
            "world": a.world, "workdir": a.workdir,
            "wall_1proc_s": round(wall_1proc, 1),
            "wall_multihost_model_s": round(crit, 1),
            "per_phase": {f"{k[0]}{k[1]}.r{k[2]}": round(v, 1)
                          for k, v in timings.items()},
            "note": "one subprocess per phase (see module docstring: "
                    "the dev tunnel runtime leaks host staging buffers "
                    "in-process); walls include ~1 min process startup "
                    "+ jit-cache load each",
        },
        "pca": {
            "wall_s": round(wall_1proc, 1),
            "pcs": a.pcs, "iters": a.iters,
            "varprop_top5": [round(float(v), 6) for v in varprop[:5]],
            "pc1_pop_separation_frac": round(frac, 4),
        },
    }
    if a.grm_json:
        with open(a.grm_json) as f:
            res["grm"] = json.load(f)
    if a.out:
        with open(a.out, "w") as f:
            json.dump(res, f, indent=1)
    print(json.dumps({"phase": "pca_rank_total",
                      "wall_1proc_s": res["pca_rank"]["wall_1proc_s"],
                      "wall_multihost_model_s":
                          res["pca_rank"]["wall_multihost_model_s"],
                      "pc1_pop_separation_frac": frac}), flush=True)
    assert frac > 0.95, "PC1 failed to separate the planted populations"


if __name__ == "__main__":
    main()
