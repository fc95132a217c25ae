"""Round 2 of the TPU adjoint-NaN bisection: depth / raggedness / steps.

probe_adjoint_nan.py cleared the carbonate VJP and the nlev=6 interior
on TPU; the failing configuration (scripts/tpu_adjoint_check.py) was
nlev=20, ragged, 3 steps, parameter gradient.  This varies one axis at a
time.
"""

import os
import time

import jax

if os.environ.get("OBGC_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["OBGC_PLATFORM"])

import numpy as np  # noqa: E402

import jax.numpy as jnp  # noqa: E402

import ocean_bgc_tpu  # noqa: E402,F401
from ocean_bgc_tpu.ops.bgc import bgc_source_sink  # noqa: E402
from ocean_bgc_tpu.models.adjoint import (  # noqa: E402
    override_params, run_diff)
from ocean_bgc_tpu.params import ModelParams  # noqa: E402
from ocean_bgc_tpu.state import BGCTracers as BT  # noqa: E402
from ocean_bgc_tpu.utils.synthetic import synthetic_world  # noqa: E402


def report(name, fn, *args):
    t0 = time.time()
    try:
        g = jax.jit(jax.grad(fn))(*args)
        g = np.asarray(jax.tree_util.tree_leaves(g)[0])
        fin = g[np.isfinite(g)]
        print(f"{name}: finite={np.isfinite(g).all()} "
              f"max|g|={np.abs(fin).max() if fin.size else float('nan'):.3e} "
              f"nans={np.isnan(g).sum()}/{g.size} "
              f"({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: EXC {type(e).__name__}: {e}", flush=True)


def interior_loss(world, params):
    state, grid, forcing = world

    def f(tr):
        out = bgc_source_sink(tr, grid, forcing, state.bgc.ph_prev_3d,
                              state.bgc.ph_prev_alt_3d, params.bgc,
                              compute_diags=False)
        return jnp.mean(out.tendencies ** 2)

    return f, state.bgc.tracers


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    params = ModelParams()

    w_deep = synthetic_world(nlev=20, ncol=128, seed=7, ragged=False)
    w_rag = synthetic_world(nlev=20, ncol=128, seed=7, ragged=True)

    # F) interior only, deep flat world
    f, x = interior_loss(w_deep, params)
    report("F interior nlev=20 flat", f, x)

    # G) interior only, deep ragged world
    g, xg = interior_loss(w_rag, params)
    report("G interior nlev=20 ragged", g, xg)

    # H) one full step, deep flat world, grad wrt tracers
    state, grid, forcing = w_deep

    def h(tr):
        import dataclasses
        s = dataclasses.replace(
            state, bgc=dataclasses.replace(state.bgc, tracers=tr))
        final = run_diff(s, grid, forcing, params, 3600.0, 1)
        return jnp.mean(final.bgc.tracers[:, BT.NO3] ** 2)

    report("H 1-step nlev=20 flat", h, state.bgc.tracers)

    # I) 3 steps, deep flat world, parameter gradient (the original shape)
    def i(theta):
        p = override_params(
            params, {"bgc.parm_kappa_nitrif":
                     params.bgc.parm_kappa_nitrif * theta})
        final = run_diff(state, grid, forcing, p, 3600.0, 3)
        return jnp.mean(final.bgc.tracers[:, BT.NO3] ** 2)

    report("I 3-step param-grad flat", i, jnp.asarray(1.0))

    # J) same on the ragged world (the exact original failure)
    state_r, grid_r, forcing_r = w_rag

    def j(theta):
        p = override_params(
            params, {"bgc.parm_kappa_nitrif":
                     params.bgc.parm_kappa_nitrif * theta})
        final = run_diff(state_r, grid_r, forcing_r, p, 3600.0, 3)
        return jnp.mean(final.bgc.tracers[:, BT.NO3] ** 2)

    report("J 3-step param-grad ragged", j, jnp.asarray(1.0))


if __name__ == "__main__":
    main()
