"""Subprocess worker for the real multi-process distributed test.

Invoked as ``python tests/mp_worker_distributed.py <pid> <nproc> <port>
<outdir> <devices_per_proc>``.  Each process owns ``devices_per_proc``
virtual CPU devices; together they form the global columns mesh — the
actual multi-host code path of ``ocean_bgc_tpu.parallel.distributed``
(SURVEY.md §4/§5), not the single-process virtual mesh.

Each process:
1. ``distributed.initialize`` against the shared coordinator,
2. builds the full deterministic synthetic world, keeps only its
   host-local column block, and assembles the global sharded pytrees via
   ``host_local_to_global``,
3. runs the shard_map'd coupled step (``make_sharded_step``) with the
   psum'd global diagnostics — a REAL cross-process collective,
4. writes its addressable output shards + the replicated global sums to
   ``<outdir>/proc<pid>.npz`` for the parent test to reassemble.
"""

import os
import sys


def main():
    pid, nproc, port, outdir, dpp = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
        int(sys.argv[5]))
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={dpp}")

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    import numpy as np

    import ocean_bgc_tpu  # noqa: F401  (enables x64)
    from ocean_bgc_tpu.parallel import distributed as dist
    from ocean_bgc_tpu.parallel import make_sharded_step
    from ocean_bgc_tpu.parallel.sharding import GLOBAL_SUM_DIAGS
    from ocean_bgc_tpu.params import ModelParams
    from ocean_bgc_tpu.utils.synthetic import synthetic_world

    dist.initialize(coordinator_address=f"127.0.0.1:{port}",
                    num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()

    mesh = dist.global_mesh()
    total_cols = 32
    state, grid, forcing = synthetic_world(nlev=6, ncol=total_cols,
                                           seed=29, ragged=True)

    lo, hi = dist.host_local_columns(total_cols, mesh)

    def local_block(tree):
        return jax.tree.map(lambda x: np.asarray(x)[..., lo:hi], tree)

    gstate = dist.host_local_to_global(local_block(state), mesh,
                                       total_cols)
    ggrid = dist.host_local_to_global(local_block(grid), mesh, total_cols)
    gforcing = dist.host_local_to_global(local_block(forcing), mesh,
                                         total_cols)

    fn = make_sharded_step(mesh, ModelParams(), 3600.0,
                           compute_diags=True, nsteps=2)
    final, gdiags = fn(gstate, ggrid, gforcing)

    # collect this process's addressable output shards
    out = {}
    tracers = final.bgc.tracers
    for shard in tracers.addressable_shards:
        col0 = shard.index[-1].start or 0
        out[f"tracers_{col0}"] = np.asarray(shard.data)
    for name in GLOBAL_SUM_DIAGS:
        out[f"gsum_{name}"] = np.asarray(gdiags[name])
    np.savez(os.path.join(outdir, f"proc{pid}.npz"), **out)
    print(f"proc {pid}: ok devices={len(jax.devices())} "
          f"local=[{lo},{hi})", flush=True)


if __name__ == "__main__":
    main()
