"""Fused whole-column Pallas step kernel vs the XLA f32 path.

The fused kernel (ops/pallas_step.py) reuses the SAME kinetics/assembly/
particulate code the XLA path traces (ops/bgc.py), so any disagreement
comes from the three deliberate scheduling substitutions:

  * PAR: MXU triangular-matmul cumsum instead of ``cumprod``,
  * scale-length: explicit piecewise selects instead of ``jnp.interp``,
  * carbonate: in-kernel stacked dual solve (pH only).

Each substitution is pinned individually at f64 tightness; the composed
step is compared at f32 tolerance on a ragged world (on CPU the kernel
runs in interpreter mode — the TPU compiled path is exercised by
bench/BENCH_MODE and the fp32 trajectory gates).
"""

import numpy as np
import jax
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


@pytest.mark.parametrize("ragged", [True, False])
def test_fused_step_matches_xla_f32(ragged):
    nlev, ncol = 20, 192      # 192: exercises the 128-lane padding path
    state, grid, forcing = synthetic_world(nlev=nlev, ncol=ncol, seed=7,
                                           ragged=ragged,
                                           dtype=jnp.float32)
    params = BGCParams()

    ref = bgc_source_sink(
        state.bgc.tracers, grid, forcing,
        state.bgc.ph_prev_3d, state.bgc.ph_prev_alt_3d, params,
        compute_diags=False, carbonate_impl="xla")
    got = fused_interior_step(
        state.bgc.tracers, grid, forcing,
        state.bgc.ph_prev_3d, state.bgc.ph_prev_alt_3d, params)

    # pH warm-start state: agrees to the f32 solver tolerance
    np.testing.assert_allclose(np.asarray(got.ph_prev_3d),
                               np.asarray(ref.ph_prev_3d),
                               rtol=0.0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(got.ph_prev_alt_3d),
                               np.asarray(ref.ph_prev_alt_3d),
                               rtol=0.0, atol=5e-5)

    # tendencies: identical physics, f32 re-association noise only.
    # scale per-tracer (tendency magnitudes span ~15 decades)
    w = np.asarray(ref.tendencies)
    g = np.asarray(got.tendencies)
    scale = np.maximum(np.abs(w).max(axis=(0, 2), keepdims=True), 1e-30)
    np.testing.assert_allclose(g / scale, w / scale, rtol=0.0, atol=3e-5)


def test_fused_step_under_shard_map():
    """The fused kernel composes with the columns-mesh shard_map (vma
    propagation on the pallas_call out_shapes): sharded fused step ==
    single-device fused step.  Interpreter mode on the CPU mesh; the
    compiled TPU path is exercised by the flagship bench."""
    from ocean_bgc_tpu.parallel.sharding import (
        make_mesh,
        make_sharded_step,
        shard_world,
    )
    from ocean_bgc_tpu.params import ModelParams

    ndev = len(jax.devices())
    nlev, ncol = 6, 16 * ndev
    state, grid, forcing = synthetic_world(nlev=nlev, ncol=ncol, seed=3,
                                           ragged=True,
                                           dtype=jnp.float32)
    params = ModelParams()

    from ocean_bgc_tpu.models.coupled import step
    want, _ = step(state, grid, forcing, params, 3600.0,
                   compute_diags=False, interior_impl="fused")

    mesh = make_mesh()
    s_state, s_grid, s_forcing = shard_world(state, grid, forcing, mesh)
    # check_vma=False: interpreter-mode-only workaround (see
    # parallel/sharding.py) — the compiled Mosaic path keeps the check
    fn = make_sharded_step(mesh, params, 3600.0, interior_impl="fused",
                           check_vma=False)
    got, _ = fn(s_state, s_grid, s_forcing)

    # ulp-level only: the PAR matmul's contraction order varies with the
    # batch width the backend sees (16 local + pad vs 128), so exact
    # bitwise equality across shardings is not guaranteed
    w = np.asarray(want.bgc.tracers)
    g = np.asarray(got.bgc.tracers)
    scale = np.maximum(np.abs(w).max(axis=(0, 2), keepdims=True), 1e-30)
    np.testing.assert_allclose(g / scale, w / scale, rtol=0.0, atol=1e-5)


def test_fused_trajectory_within_perturbation_envelope():
    """Multi-step qualification of the fused kernel against the XLA f32
    path, by the same chaos-yardstick methodology as the fp32-vs-f64
    gate (tests/test_fp32_trajectory.py): per-step disagreement is
    ulp-level except at cells sitting exactly on a discrete physics
    threshold (e.g. the PAR>1 dark-remineralization switch), where a
    one-ulp input difference flips the branch.  Those flips act like a
    tiny initial-condition perturbation, so the fused trajectory must
    stay inside the XLA path's own response envelope to an f32-epsilon
    kick."""
    import dataclasses
    from ocean_bgc_tpu.models.coupled import run
    from ocean_bgc_tpu.params import ModelParams

    nsteps, dt = 48, 3600.0
    nlev, ncol = 8, 64
    state, grid, forcing = synthetic_world(nlev=nlev, ncol=ncol, seed=11,
                                           ragged=True,
                                           dtype=jnp.float32)
    params = ModelParams()

    ref, _ = jax.jit(lambda s: run(s, grid, forcing, params, dt, nsteps,
                                   interior_impl="xla"))(state)
    fused, _ = jax.jit(lambda s: run(s, grid, forcing, params, dt,
                                     nsteps,
                                     interior_impl="fused"))(state)
    pert = dataclasses.replace(
        state, bgc=dataclasses.replace(
            state.bgc,
            tracers=state.bgc.tracers * np.float32(1.0 + 1.2e-7)))
    yard, _ = jax.jit(lambda s: run(s, grid, forcing, params, dt, nsteps,
                                    interior_impl="xla"))(pert)

    got = np.asarray(fused.bgc.tracers, np.float64)
    want = np.asarray(ref.bgc.tracers, np.float64)
    env = np.abs(np.asarray(yard.bgc.tracers, np.float64) - want)
    assert np.isfinite(got).all()
    from ocean_bgc_tpu.state import BGCTracers as T
    for idx in range(T.CNT):
        mismatch = np.abs(got[:, idx] - want[:, idx]).max()
        scale = np.abs(want[:, idx]).max() + 1e-30
        bound = 30.0 * env[:, idx].max() + 1e-2 * scale + 1e-12
        assert mismatch <= bound, (
            f"tracer {idx}: fused mismatch {mismatch:.3e} exceeds "
            f"envelope {bound:.3e} (scale {scale:.3e})")


def test_fused_step_rejects_f64():
    state, grid, forcing = synthetic_world(nlev=4, ncol=8, seed=0,
                                           ragged=False)
    with pytest.raises(ValueError, match="float32"):
        fused_interior_step(state.bgc.tracers, grid, forcing,
                            state.bgc.ph_prev_3d,
                            state.bgc.ph_prev_alt_3d, BGCParams())
