"""Per-tracer TPU diff between the fused kernel and the XLA f32 path."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ocean_bgc_tpu.ops.bgc import bgc_source_sink
from ocean_bgc_tpu.ops.pallas_step import fused_interior_step
from ocean_bgc_tpu.params import BGCParams
from ocean_bgc_tpu.state import BGC_TRACER_NAMES
from ocean_bgc_tpu.utils.synthetic import synthetic_world


def main():
    ncol = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nlev = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    state, grid, forcing = synthetic_world(nlev=nlev, ncol=ncol, seed=1,
                                           ragged=True, dtype=jnp.float32)
    params = BGCParams()
    tr = state.bgc.tracers
    ph = state.bgc.ph_prev_3d
    pha = state.bgc.ph_prev_alt_3d

    a = jax.jit(lambda t, p, q: fused_interior_step(
        t, grid, forcing, p, q, params))(tr, ph, pha)
    b = jax.jit(lambda t, p, q: bgc_source_sink(
        t, grid, forcing, p, q, params, compute_diags=False,
        carbonate_impl="xla"))(tr, ph, pha)

    g = np.asarray(a.tendencies)
    w = np.asarray(b.tendencies)
    print("pH maxdiff:", float(np.max(np.abs(np.asarray(a.ph_prev_3d)
                                             - np.asarray(b.ph_prev_3d)))))
    rows = []
    for i, name in enumerate(BGC_TRACER_NAMES):
        scale = max(np.abs(w[:, i]).max(), 1e-30)
        d = np.abs(g[:, i] - w[:, i]) / scale
        rows.append((d.max(), name, scale, i))
    rows.sort(reverse=True)
    for d, name, scale, i in rows[:8]:
        print(f"{name:12s} scaled_maxdiff={d:.3e} scale={scale:.3e}")
    # worst cell detail
    d0, name, scale, i = rows[0]
    dd = np.abs(g[:, i] - w[:, i]) / scale
    k, c = np.unravel_index(np.argmax(dd), dd.shape)
    print(f"worst: {name} at level {k} col {c} kmax={int(grid.kmax[c])} "
          f"fused={g[k, i, c]:.6e} xla={w[k, i, c]:.6e}")


if __name__ == "__main__":
    main()
