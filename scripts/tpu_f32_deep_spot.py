"""TPU spot run of the f32 deep world (VERDICT r4 item 2's on-hardware
leg): integrate the 60-level branch-firing deep world (shelf + land
columns) in float32 on the attached chip, then assert

  1. all tracers finite (no flush-induced NaN/Inf),
  2. the particulate flux range audit holds on hardware: every flux the
     CPU f32 run keeps materially nonzero is nonzero on TPU too, and
     TPU/CPU f32 trajectories agree to f32-arithmetic reassociation
     levels (the backends fuse differently),
  3. the bottom-cell branch signatures (lysocline zero, burial > 0,
     NO3-gate zero, anoxic remin > 0) hold on-chip.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_f32_deep_spot.py
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import ocean_bgc_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from ocean_bgc_tpu.models.coupled import run, step
from ocean_bgc_tpu.params import ModelParams
from tests.test_fp32_deep import FLUX_DIAGS, _deep_worlds

NSTEPS = 24


def main():
    (_, _, _), (s32, g32, f32c) = _deep_worlds()
    params = ModelParams()
    platform = jax.devices()[0].platform
    assert platform == "tpu", platform

    final, _ = jax.jit(
        lambda s: run(s, g32, f32c, params, 3600.0, NSTEPS - 1))(s32)
    _, diags = step(final, g32, f32c, params, 3600.0,
                    compute_diags=True)
    got = np.asarray(final.bgc.tracers, np.float64)
    assert np.isfinite(got).all(), "non-finite tracers on TPU"

    # CPU reference of the identical f32 program
    # the CPU leg forces the XLA carbonate path (Mosaic cannot run
    # compiled on CPU; pallas-vs-xla equivalence is separately pinned
    # at <=1e-4 by tests/test_pallas_carbonate.py)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        s32c = jax.device_put(s32, cpu)
        fin_c, _ = jax.jit(
            lambda s: run(s, g32, f32c, params, 3600.0, NSTEPS - 1,
                          carbonate_impl="xla"))(s32c)
        _, diags_c = step(fin_c, g32, f32c, params, 3600.0,
                          compute_diags=True, carbonate_impl="xla")
    want = np.asarray(fin_c.bgc.tracers, np.float64)

    kmax = np.asarray(g32.kmax)
    kb = kmax - 1
    gd = {k: np.asarray(diags[k]) for k in
          ("calcToSed", "SedDenitrif", "OtherRemin")}
    checks = {
        "lysocline_zero": float(gd["calcToSed"][kb[0], 0]),
        "burial_pos": float(gd["calcToSed"][kb[1], 1]),
        "no3_gate_zero": float(gd["SedDenitrif"][kb[3], 3]),
        "anoxic_pos": float(gd["OtherRemin"][kb[2], 2]),
    }
    assert checks["lysocline_zero"] == 0.0
    assert checks["burial_pos"] > 0.0
    assert checks["no3_gate_zero"] == 0.0
    assert checks["anoxic_pos"] > 0.0

    active = np.asarray(g32.active_mask())
    flush_report = {}
    for name in FLUX_DIAGS:
        a_t = np.asarray(diags[name], np.float64)[active]
        a_c = np.asarray(diags_c[name], np.float64)[active]
        assert np.isfinite(a_t).all(), name
        material = a_c > 1e-12 * (a_c.max() + 1e-300)
        flushed = int((material & (a_t == 0.0)).sum())
        flush_report[name] = flushed
        assert flushed == 0, f"{name}: {flushed} flushed on TPU"

    # trajectory agreement TPU vs CPU: cross-backend f32 rounding
    # (different fusion; pallas vs xla solver) acts like an f32-eps
    # perturbation that the deep world chaos-amplifies, so a fixed
    # tolerance is wrong — use the same perturbation-envelope
    # methodology as the gates (tests/test_fp32_deep.py): the CPU f32
    # model's own response to an f32-eps initial kick bounds it
    import dataclasses as _dc

    with jax.default_device(cpu):
        pert = _dc.replace(
            s32c, bgc=_dc.replace(
                s32c.bgc,
                tracers=s32c.bgc.tracers
                * np.float32(1.0 + 1.1920929e-07)))
        fin_p, _ = jax.jit(
            lambda s: run(s, g32, f32c, params, 3600.0, NSTEPS - 1,
                          carbonate_impl="xla"))(pert)
    yard = np.abs(np.asarray(fin_p.bgc.tracers, np.float64) - want)
    worst = 0.0
    for idx in range(got.shape[1]):
        scale = np.abs(want[:, idx]).max() + 1e-30
        mismatch = np.abs(got[:, idx] - want[:, idx]).max()
        bound = 30.0 * yard[:, idx].max() + 1e-2 * scale + 1e-12
        worst = max(worst, float(mismatch / bound))
        assert mismatch <= bound, (
            f"tracer {idx}: TPU-vs-CPU f32 mismatch {mismatch:.3e} "
            f"exceeds the perturbation envelope {bound:.3e}")
    print(json.dumps({
        "platform": platform, "nsteps": NSTEPS,
        "branch_checks": checks, "flushed_cells": flush_report,
        "worst_mismatch_over_envelope": round(worst, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
