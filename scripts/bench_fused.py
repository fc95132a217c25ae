"""TPU benchmark: fused whole-column step kernel vs the XLA/pallas-carb
f32 interior (bgc_source_sink, diags off).

Usage: python scripts/bench_fused.py [ncol] [nlev] [steps]
Env: OBGC_FUSED_BLOCK_COLS (default 128)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ocean_bgc_tpu.ops.bgc import bgc_source_sink
from ocean_bgc_tpu.ops.pallas_step import fused_interior_step
from ocean_bgc_tpu.params import BGCParams
from ocean_bgc_tpu.utils.synthetic import synthetic_world


def timeit(fn, args, steps, label):
    """Warm-regime timing: thread the pH warm-start outputs back in, so
    the solver runs its production 2-3 Newton iterations, not the cold
    ~12-iteration bracket growth."""
    tr, ph, pha = args
    t0 = time.time()
    out = fn(tr, ph, pha)
    s = float(jnp.sum(out[0])) + float(jnp.sum(out[1]))
    t_compile = time.time() - t0
    for _ in range(3):                      # warm the pH state
        out = fn(tr, out[1], out[2])
    float(jnp.sum(out[1]))
    best = 1e30
    for _ in range(3):
        t0 = time.time()
        for _ in range(steps):
            out = fn(tr, out[1], out[2])
        s = float(jnp.sum(out[0])) + float(jnp.sum(out[1]))
        best = min(best, (time.time() - t0) / steps)
    print(f"{label}: {best*1e3:.2f} ms/step warm (compile "
          f"{t_compile:.0f}s, checksum {s:.6g})", flush=True)
    return best


def main():
    ncol = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    nlev = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    print(f"backend={jax.default_backend()} ncol={ncol} nlev={nlev}",
          flush=True)
    state, grid, forcing = synthetic_world(nlev=nlev, ncol=ncol, seed=1,
                                           ragged=True,
                                           dtype=jnp.float32)
    params = BGCParams()
    tr = state.bgc.tracers
    ph = state.bgc.ph_prev_3d
    pha = state.bgc.ph_prev_alt_3d

    @jax.jit
    def fused(tr, ph, pha):
        o = fused_interior_step(tr, grid, forcing, ph, pha, params)
        return o.tendencies, o.ph_prev_3d, o.ph_prev_alt_3d

    @jax.jit
    def xla(tr, ph, pha):
        o = bgc_source_sink(tr, grid, forcing, ph, pha, params,
                            compute_diags=False, carbonate_impl="auto")
        return o.tendencies, o.ph_prev_3d, o.ph_prev_alt_3d

    t_f = timeit(fused, (tr, ph, pha), steps, "fused ")
    t_x = timeit(xla, (tr, ph, pha), steps, "xla+pc")
    print(f"speedup: {t_x/t_f:.2f}x  "
          f"({ncol/t_f:,.0f} vs {ncol/t_x:,.0f} interior columns/s)",
          flush=True)

    # correctness spot-check on TPU (compiled Mosaic vs compiled XLA)
    a = fused(tr, ph, pha)
    b = xla(tr, ph, pha)
    dph = float(jnp.max(jnp.abs(a[1] - b[1])))
    w = np.asarray(b[0])
    g = np.asarray(a[0])
    scale = np.maximum(np.abs(w).max(axis=(0, 2), keepdims=True), 1e-30)
    dt = float(np.max(np.abs(g - w) / scale))
    print(f"max |dpH| = {dph:.3g}, max scaled |dtend| = {dt:.3g}",
          flush=True)


if __name__ == "__main__":
    main()
