"""Standalone model runner (`python -m ocean_bgc_tpu.run_model`).

The reference is a library with no driver; this is the production driver a
deployment would use: config from TOML, synthetic or checkpointed initial
state, jitted stepping (optionally sharded over every visible device),
periodic checkpoints and time-averaged history output, and an end-of-run
summary with throughput and conservation residuals.

Examples::

    python -m ocean_bgc_tpu.run_model --steps 240 --ncol 4096
    python -m ocean_bgc_tpu.run_model --config run.toml --steps 480 \
        --restore ck_0240 --checkpoint-every 240 --out /tmp/run1
    python -m ocean_bgc_tpu.run_model --steps 96 --sharded \
        --history-every 24 --integrator rk2
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ocean_bgc_tpu.run_model",
        description="Run the coupled BGC+DMS+MACROS column model.")
    p.add_argument("--config", help="TOML parameter overrides")
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--dt", type=float, default=3600.0,
                   help="timestep (s), default 1 h")
    p.add_argument("--nlev", type=int, default=60)
    p.add_argument("--ncol", type=int, default=1024)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--integrator", choices=("euler", "rk2", "rk4"),
                   default="euler")
    p.add_argument("--sharded", action="store_true",
                   help="shard columns over all visible devices")
    p.add_argument("--restore", help="checkpoint path to resume from")
    p.add_argument("--out", default=".",
                   help="output directory for checkpoints/history")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="steps between checkpoints (0 = only final)")
    p.add_argument("--history-every", type=int, default=0,
                   help="steps between history writes (0 = none)")
    p.add_argument("--fp32", action="store_true",
                   help="opt-in single-precision fast path")
    p.add_argument("--world",
                   help="NetCDF world file (io.model_io.save_world "
                        "layout) supplying grid/forcing/initial state "
                        "instead of the synthetic generator")
    p.add_argument("--save-world",
                   help="write the final grid/forcing/state as a "
                        "NetCDF world file")
    p.add_argument("--netcdf-history", action="store_true",
                   help="write history as NetCDF instead of npz")
    p.add_argument("--quiet", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    import ocean_bgc_tpu  # noqa: F401
    from ocean_bgc_tpu.models import integrators
    from ocean_bgc_tpu.models.coupled import step
    from ocean_bgc_tpu.params import ModelParams
    from ocean_bgc_tpu.utils import checkpoint as ckpt
    from ocean_bgc_tpu.utils.history import TavgState, write_history
    from ocean_bgc_tpu.utils.synthetic import synthetic_world

    params = ModelParams()
    if args.config:
        from ocean_bgc_tpu.utils.config import params_from_toml
        params = params_from_toml(args.config)

    dtype = jnp.float32 if args.fp32 else None
    if args.world:
        from ocean_bgc_tpu.io.model_io import load_world
        state, grid, forcing = load_world(args.world, dtype=dtype)
        if not args.quiet:
            print(f"world <- {args.world} "
                  f"({state.bgc.nlev} levels x {state.bgc.ncol} columns)")
    else:
        state, grid, forcing = synthetic_world(
            nlev=args.nlev, ncol=args.ncol, seed=args.seed, dtype=dtype)

    start_step = 0
    if args.restore:
        state, n = ckpt.restore(args.restore)
        start_step = n or 0
        if not args.quiet:
            print(f"resumed from {args.restore} at step {start_step}")

    step_impl = {"euler": step, "rk2": integrators.step_rk2,
                 "rk4": integrators.step_rk4}[args.integrator]

    if args.sharded:
        from ocean_bgc_tpu.parallel import make_mesh, shard_world
        mesh = make_mesh()
        state, grid, forcing = shard_world(state, grid, forcing, mesh)
        if not args.quiet:
            print(f"sharded over {mesh.devices.size} device(s)")

    want_diags = args.history_every > 0

    @jax.jit
    def advance(s):
        return step_impl(s, grid, forcing, params, args.dt,
                         compute_diags=want_diags)

    os.makedirs(args.out, exist_ok=True)
    tavg = None
    t0 = time.perf_counter()
    for i in range(start_step, start_step + args.steps):
        state, diags = advance(state)
        if want_diags:
            if tavg is None:
                tavg = TavgState.create(diags)
            tavg = tavg.accumulate(diags)
            if (i + 1) % args.history_every == 0:
                if args.netcdf_history:
                    from ocean_bgc_tpu.io.model_io import (
                        save_history_netcdf)
                    path = save_history_netcdf(
                        os.path.join(args.out, f"hist_{i + 1:06d}.nc"),
                        {k: np.asarray(v)
                         for k, v in tavg.means().items()},
                        nlev=state.bgc.nlev, ncol=state.bgc.ncol,
                        count=int(tavg.count),
                        attrs={"dt": args.dt, "step": np.int32(i + 1)})
                else:
                    path = write_history(
                        os.path.join(args.out, f"hist_{i + 1:06d}"), tavg,
                        attrs={"dt": str(args.dt), "step": str(i + 1)})
                tavg = tavg.reset()
                if not args.quiet:
                    print(f"history -> {path}")
        if args.checkpoint_every and (i + 1) % args.checkpoint_every == 0:
            path = ckpt.save(os.path.join(args.out, f"ck_{i + 1:06d}"),
                             state, step=i + 1)
            if not args.quiet:
                print(f"checkpoint -> {path}")
    jax.block_until_ready(state.bgc.tracers)
    elapsed = time.perf_counter() - t0

    final_ck = ckpt.save(os.path.join(args.out, "ck_final"), state,
                         step=start_step + args.steps)
    if args.save_world:
        from ocean_bgc_tpu.io.model_io import save_world
        save_world(args.save_world, jax.device_get(state),
                   jax.device_get(grid), jax.device_get(forcing),
                   attrs={"step": np.int32(start_step + args.steps)})
        if not args.quiet:
            print(f"world -> {args.save_world}")
    _, final_diags = step(state, grid, forcing, params, args.dt,
                          compute_diags=True)
    jint = float(np.abs(np.asarray(final_diags["Jint_Ctot"])).max())
    summary = {
        "steps": args.steps,
        "columns": args.ncol,
        "columns_per_s": round(args.ncol * args.steps / elapsed, 1),
        "elapsed_s": round(elapsed, 2),
        "final_checkpoint": final_ck,
        "max_abs_Jint_Ctot": jint,
        "finite": bool(np.isfinite(np.asarray(state.bgc.tracers)).all()),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
