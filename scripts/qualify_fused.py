"""TPU qualification of the fused step kernel: 96-step trajectory
envelope vs the XLA f32 path (same methodology as
tests/test_pallas_step.py::test_fused_trajectory_within_perturbation_envelope
but with the compiled Mosaic kernel on real hardware and a deep ragged
world).

Also reports warm-regime per-step timings for both paths (the production
measure: pH warm-starts carried across steps).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ocean_bgc_tpu.models.coupled import step
from ocean_bgc_tpu.params import ModelParams
from ocean_bgc_tpu.state import BGC_TRACER_NAMES, BGCTracers as T
from ocean_bgc_tpu.utils.synthetic import synthetic_world


def run_loop(fn, state, nsteps):
    for _ in range(nsteps):
        state, _ = fn(state)
    float(jnp.sum(state.bgc.surface_ph))
    return state


def main():
    nsteps = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    ncol = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    nlev = 60
    dt = 3600.0
    state, grid, forcing = synthetic_world(nlev=nlev, ncol=ncol, seed=5,
                                           ragged=True, dtype=jnp.float32)
    params = ModelParams()

    fns = {}
    for impl in ("xla", "fused"):
        fns[impl] = jax.jit(lambda s, impl=impl: step(
            s, grid, forcing, params, dt, compute_diags=False,
            interior_impl=impl))

    t0 = time.time()
    ref = run_loop(fns["xla"], state, nsteps)
    print(f"xla   {nsteps} steps in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    fused = run_loop(fns["fused"], state, nsteps)
    print(f"fused {nsteps} steps in {time.time()-t0:.1f}s", flush=True)

    pert = dataclasses.replace(
        state, bgc=dataclasses.replace(
            state.bgc,
            tracers=state.bgc.tracers * np.float32(1.0 + 1.2e-7)))
    yard = run_loop(fns["xla"], pert, nsteps)

    got = np.asarray(fused.bgc.tracers, np.float64)
    want = np.asarray(ref.bgc.tracers, np.float64)
    env = np.abs(np.asarray(yard.bgc.tracers, np.float64) - want)
    assert np.isfinite(got).all()
    worst = 0.0
    fails = []
    for idx in range(T.CNT):
        mismatch = np.abs(got[:, idx] - want[:, idx]).max()
        scale = np.abs(want[:, idx]).max() + 1e-30
        bound = 30.0 * env[:, idx].max() + 1e-2 * scale + 1e-12
        ratio = mismatch / bound
        worst = max(worst, ratio)
        if mismatch > bound:
            fails.append((BGC_TRACER_NAMES[idx], mismatch, bound))
    print(f"worst mismatch/bound ratio: {worst:.3f}")
    if fails:
        for name, m, b in fails:
            print(f"FAIL {name}: {m:.3e} > {b:.3e}")
        sys.exit(1)
    print("QUALIFICATION PASS")


if __name__ == "__main__":
    main()
