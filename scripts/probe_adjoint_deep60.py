"""On-hardware adjoint check for the FLAGSHIP depth (60 ragged levels).

The nlev=20 fix (safe_div's den**2-free derivative) was verified on
chip; this probes the 60-level world, where particulate fluxes decay
into the TPU f64-emulation flush range (the qa_ratio / fe_remin
denominators) and the DMS phytoN ratio goes tiny — the three sites
routed through safe_div in the same round.  Run on TPU (background;
relay compile) and on CPU (OBGC_PLATFORM=cpu) and compare.
"""

import os
import time

import jax

if os.environ.get("OBGC_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["OBGC_PLATFORM"])

import numpy as np  # noqa: E402

import jax.numpy as jnp  # noqa: E402

import ocean_bgc_tpu  # noqa: E402,F401
from ocean_bgc_tpu.models.adjoint import run_diff  # noqa: E402
from ocean_bgc_tpu.params import ModelParams  # noqa: E402
from ocean_bgc_tpu.state import BGCTracers as BT  # noqa: E402
from ocean_bgc_tpu.utils.synthetic import synthetic_world  # noqa: E402


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    state, grid, forcing = synthetic_world(nlev=60, ncol=64, seed=11,
                                           ragged=True)
    params = ModelParams()

    def loss(tr):
        import dataclasses
        s = dataclasses.replace(
            state, bgc=dataclasses.replace(state.bgc, tracers=tr))
        final = run_diff(s, grid, forcing, params, 3600.0, 1)
        return (jnp.mean(final.bgc.tracers[:, BT.FE] ** 2) * 1e6
                + jnp.mean(final.bgc.tracers[:, BT.NO3] ** 2)
                + jnp.mean(final.dms ** 2) * 1e2)

    t0 = time.time()
    g = np.asarray(jax.jit(jax.grad(loss))(state.bgc.tracers))
    fin = g[np.isfinite(g)]
    print(f"deep60 grad ({time.time()-t0:.0f}s): "
          f"finite={np.isfinite(g).all()} nans={np.isnan(g).sum()}/{g.size} "
          f"max|g|={np.abs(fin).max():.6e} sum|g|={np.abs(fin).sum():.6e}",
          flush=True)


if __name__ == "__main__":
    main()
