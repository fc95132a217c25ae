"""Bisect the TPU-only NaN in the f64 adjoint (scripts/tpu_adjoint_check.py).

On CPU (true IEEE f64) every parameter sensitivity is finite; on TPU the
gradients that flow backward through the BGC interior come out NaN.  This
probes each differentiable layer separately, innermost first, printing
finiteness per layer so the guilty VJP can be localized.  Run on TPU in
the background (each jit is a fresh relay compile).
"""

import os
import time

import jax

if os.environ.get("OBGC_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["OBGC_PLATFORM"])

import numpy as np  # noqa: E402

import jax.numpy as jnp  # noqa: E402

import ocean_bgc_tpu  # noqa: E402,F401
from ocean_bgc_tpu.ops import carbonate as carb  # noqa: E402
from ocean_bgc_tpu.ops.bgc import bgc_source_sink, precompute_env  # noqa: E402
from ocean_bgc_tpu.models.coupled import step  # noqa: E402
from ocean_bgc_tpu.params import ModelParams  # noqa: E402
from ocean_bgc_tpu.state import BGCTracers as BT  # noqa: E402
from ocean_bgc_tpu.utils.synthetic import synthetic_world  # noqa: E402


def report(name, fn, *args):
    t0 = time.time()
    try:
        g = jax.jit(jax.grad(fn))(*args)
        g = np.asarray(jax.tree_util.tree_leaves(g)[0])
        print(f"{name}: finite={np.isfinite(g).all()} "
              f"max|g|={np.abs(g[np.isfinite(g)]).max():.3e} "
              f"nans={np.isnan(g).sum()}/{g.size} "
              f"({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: EXC {type(e).__name__}: {e}", flush=True)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    state, grid, forcing = synthetic_world(nlev=6, ncol=128, seed=7,
                                           ragged=False)
    params = ModelParams()

    # A) interior carbonate solve (IFT custom VJP), batch of cells
    def a(dic):
        ph, *_ = carb.co3_terms(
            jnp.zeros(128), jnp.full(128, 15.0), jnp.full(128, 35.0),
            dic, jnp.full(128, 2300.0), jnp.full(128, 1.0),
            jnp.full(128, 30.0), jnp.full(128, 6.0), jnp.full(128, 9.0),
            False)
        return jnp.mean(ph ** 2)

    report("A co3_terms", a, jnp.full(128, 2100.0))

    # B) surface dual solve
    def b(dic):
        _, _, _, pco2, _ = carb.co2calc_surface(
            jnp.zeros(128), jnp.full(128, 18.0), jnp.full(128, 35.0),
            dic, jnp.full(128, 2300.0), jnp.full(128, 0.5),
            jnp.full(128, 5.0), jnp.full(128, 7.0), jnp.full(128, 9.0),
            jnp.full(128, 415.0), jnp.ones(128))
        return jnp.mean(pco2)

    report("B co2calc_surface", b, jnp.full(128, 2050.0))

    # C) BGC interior, env off
    def c(tr):
        out = bgc_source_sink(tr, grid, forcing, state.bgc.ph_prev_3d,
                              state.bgc.ph_prev_alt_3d, params.bgc,
                              compute_diags=False)
        return jnp.mean(out.tendencies ** 2)

    report("C bgc_source_sink env=off", c, state.bgc.tracers)

    # D) BGC interior, env on
    env = precompute_env(grid, forcing, params.bgc)

    def d(tr):
        out = bgc_source_sink(tr, grid, forcing, state.bgc.ph_prev_3d,
                              state.bgc.ph_prev_alt_3d, params.bgc,
                              compute_diags=False, env=env)
        return jnp.mean(out.tendencies ** 2)

    report("D bgc_source_sink env=on", d, state.bgc.tracers)

    # E) full coupled step
    def e(tr):
        import dataclasses
        s = dataclasses.replace(
            state, bgc=dataclasses.replace(state.bgc, tracers=tr))
        new, _ = step(s, grid, forcing, params, 3600.0,
                      compute_diags=False)
        return jnp.mean(new.bgc.tracers[:, BT.NO3] ** 2)

    report("E full step", e, state.bgc.tracers)


if __name__ == "__main__":
    main()
