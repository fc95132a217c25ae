"""Smoke test for the EXPERIMENTAL-FROZEN fused whole-column kernel.

``interior_impl="fused"`` (ops/pallas_step.py) is frozen as an opt-in
experiment (docs/BENCHMARKS.md "fused-kernel decision", round 4): it
measured 0.86x the shipped default at the flagship f32 config, and the
round-2/3 roofline analysis shows the f32 step is COMPUTE-bound, so
removing HBM traffic cannot win.  The full qualification suite
(flat/ragged parametrization, shard_map composition, 48-step
perturbation-envelope trajectory) ran green through round 3 (git
history of this file); what remains here is one composed smoke config
plus the fast unit pins of the kernel's three scheduling substitutions
— enough to catch rot without paying multiple interpreter-mode compiles
per suite run.

This module is run in a FRESH interpreter by
tests/test_pallas_step_isolated.py (the kernel's interpret-mode compile
can segfault LLVM late in a long-lived suite process on this image).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ocean_bgc_tpu.ops.bgc import _par_field, bgc_source_sink
from ocean_bgc_tpu.ops.particulates import (
    _scalelength,
    scalelength_explicit,
)
from ocean_bgc_tpu.ops.pallas_step import (
    fused_interior_step,
    par_field_mxu,
)
from ocean_bgc_tpu.params import BGCParams
from ocean_bgc_tpu.utils.synthetic import synthetic_world


def test_scalelength_explicit_matches_interp():
    params = BGCParams()
    z = jnp.asarray(np.linspace(0.0, 7000e2, 4001))   # cm, spans knots
    a = np.asarray(_scalelength(z, params))
    b = np.asarray(scalelength_explicit(z, params))
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=0.0)


def test_par_field_mxu_matches_cumprod():
    rng = np.random.default_rng(3)
    nlev, ncol = 60, 256
    dz = jnp.asarray(np.geomspace(1000.0, 25000.0, nlev)[:, None]
                     * np.ones((1, ncol)))
    chl = jnp.asarray(rng.uniform(0.0, 2.5, (nlev, ncol)))
    kmax = rng.integers(0, nlev + 1, ncol)
    active = jnp.asarray(np.arange(nlev)[:, None] < kmax[None, :])
    par_surf = jnp.asarray(rng.uniform(0.0, 120.0, (1, ncol)))

    want = _par_field(par_surf, chl, dz, active)
    got = par_field_mxu(par_surf, chl, dz, active)
    for w, g, name in zip(want, got,
                          ("par_in", "par_out", "par_avg", "kpar_dz")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-10, atol=1e-300,
                                   err_msg=name)


def test_fused_step_smoke_matches_xla_f32():
    """One composed config (ragged, 128-lane padding path): the frozen
    kernel still produces the XLA path's physics at f32 tolerance."""
    nlev, ncol = 20, 192
    state, grid, forcing = synthetic_world(nlev=nlev, ncol=ncol, seed=7,
                                           ragged=True,
                                           dtype=jnp.float32)
    params = BGCParams()

    ref = bgc_source_sink(
        state.bgc.tracers, grid, forcing,
        state.bgc.ph_prev_3d, state.bgc.ph_prev_alt_3d, params,
        compute_diags=False, carbonate_impl="xla")
    got = fused_interior_step(
        state.bgc.tracers, grid, forcing,
        state.bgc.ph_prev_3d, state.bgc.ph_prev_alt_3d, params)

    np.testing.assert_allclose(np.asarray(got.ph_prev_3d),
                               np.asarray(ref.ph_prev_3d),
                               rtol=0.0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(got.ph_prev_alt_3d),
                               np.asarray(ref.ph_prev_alt_3d),
                               rtol=0.0, atol=5e-5)
    w = np.asarray(ref.tendencies)
    g = np.asarray(got.tendencies)
    scale = np.maximum(np.abs(w).max(axis=(0, 2), keepdims=True), 1e-30)
    np.testing.assert_allclose(g / scale, w / scale, rtol=0.0, atol=3e-5)


def test_fused_step_rejects_f64():
    state, grid, forcing = synthetic_world(nlev=4, ncol=8, seed=0,
                                           ragged=False)
    with pytest.raises(ValueError, match="float32"):
        fused_interior_step(state.bgc.tracers, grid, forcing,
                            state.bgc.ph_prev_3d,
                            state.bgc.ph_prev_alt_3d, BGCParams())
