"""Worker for the true multi-process jax.distributed test: one of N
processes, each owning 2 virtual CPU devices, runs the sharded pairwise
engine over the global (data, samp) mesh and process 0 writes the result."""

import sys


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_enable_x64", True)

    from snprelate_tpu.parallel.distributed import (global_mesh,
                                                    init_distributed)

    init_distributed(coordinator_address=f"localhost:{port}",
                     num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc

    import numpy as np

    from snprelate_tpu.io.store import create_geno
    from snprelate_tpu.parallel.mesh import (sharded_gcta_parts,
                                             sharded_pair_counts)
    from snprelate_tpu.workspace import init_workspace

    # identical synthetic data on every process (same seed)
    rng = np.random.default_rng(5)
    n_snp, n_samp = 700, 96
    g = rng.choice([0, 1, 2, 3], size=(n_snp, n_samp),
                   p=[0.3, 0.3, 0.3, 0.1]).astype(np.uint8)
    data = create_geno(g, sample_id=[f"s{i}" for i in range(n_samp)],
                       snp_id=np.arange(n_snp),
                       snp_position=np.arange(n_snp) * 50,
                       snp_chromosome=np.ones(n_snp, np.int32))
    ws, _ = init_workspace(data, autosome_only=False, remove_monosnp=False,
                           missing_rate=np.nan, verbose=False)

    mesh = global_mesh(n_samp_axis=2)
    counts = sharded_pair_counts(ws, mesh, chunk=128)
    cov, vgram, nlocus = sharded_gcta_parts(ws, mesh, chunk=128)

    from snprelate_tpu.models.pca_randomized import randomized_pca

    rp = randomized_pca(ws, eigen_cnt=4, aux_dim=8, iter_num=4, seed=3,
                        chunk=128, mesh=mesh)

    if pid == 0:
        np.savez(out, counts=np.stack(counts.base()), cov=cov, vgram=vgram,
                 nlocus=nlocus, eigenval=rp.eigenval[:4],
                 eigenvect=rp.eigenvect[:, :4])
    # all processes must stay alive until the collectives finish
    import jax.experimental.multihost_utils as mh

    mh.sync_global_devices("done")


if __name__ == "__main__":
    main()
