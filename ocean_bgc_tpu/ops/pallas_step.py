"""Fused whole-column Pallas TPU kernel for the f32 production step.

The round-2 roofline (docs/BENCHMARKS.md) showed the float32 flagship
step HBM-leaning: ~5,800 bytes/cell accessed against a ~350 bytes/cell
state footprint — the gap is intermediate materialization at XLA fusion
boundaries (the ecosystem kinetics block, the carbonate kernel's 22-field
round trip, the level-scan xs/ys).  This module removes those boundaries
for the *production* configuration (``compute_diags=False``): ONE Pallas
kernel per block of columns computes the entire BGC interior —

  * the dual (ambient + ALT_CO2) carbonate pH solve
    (BGC_mod.F90:952-978) — in production the interior carbonate feeds
    ONLY the pH warm-start carry, so the kernel solves for H+ and skips
    speciation, saturation values, and the zsat search entirely (all
    diagnostic-only),
  * the batched ecosystem kinetics (BGC_mod.F90:826-1529), traced from
    the same :func:`ocean_bgc_tpu.ops.bgc.ecosystem_kinetics` the XLA
    path uses — single source of truth; only the PAR closed form swaps
    ``cumprod`` for an MXU triangular matmul (Mosaic has no sublane
    cumprod),
  * the Armstrong ballast sinking recurrence (BGC_mod.F90:2242-2255) as
    an in-kernel ``fori_loop`` over levels with the 11-field carry in
    VMEM — reusing :func:`ocean_bgc_tpu.ops.particulates.
    particulate_level_update` verbatim (with the Mosaic-safe explicit
    knot interpolation),
  * the tendency assembly (BGC_mod.F90:1545-1790), via the shared
    :func:`ocean_bgc_tpu.ops.bgc.assemble_tendencies`.

HBM sees one read of the tracer block + forcing and one write of the
tendencies + pH state per cell; every intermediate lives in VMEM.

float32 only (Mosaic has no f64 story; the f64 contract path keeps the
XLA implementation).  On non-TPU backends the kernel runs in interpreter
mode (slow; used by the equivalence tests).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ocean_bgc_tpu import constants as c
from ocean_bgc_tpu.ops import bgc as bgc_mod
from ocean_bgc_tpu.ops.carbonate import (
    CarbCoeffs,
    _solve_htotal_impl,
    _to_mass_units,
    carbonate_coeffs,
)
from ocean_bgc_tpu.ops.particulates import (
    ParticleCarry,
    ParticleProdOut,
    init_particle_carry,
    particulate_level_update,
    scalelength_explicit,
)
from ocean_bgc_tpu.params import BGCParams
from ocean_bgc_tpu.state import BGCForcing, BGCTracers as T, ColumnGrid

_LN10 = 2.302585092994045684
_LANES = 128

# number of per-level scratch slots for the sinking recurrence:
# inputs  {poc_prod, caco3_prod, sio2_prod, fe_prod_base}
# outputs {poc_remin, caco3_remin, sio2_remin, fe_remin, sed_denitrif,
#          other_remin, fe_scavenge}
_N_SCR_IN = 4
_N_SCR_OUT = 7


def par_field_mxu(par_surf_row, total_chl, dz, active):
    """PAR field via an MXU triangular-matmul cumulative sum.

    Same closed form as :func:`ocean_bgc_tpu.ops.bgc._par_field`
    (BGC_mod.F90:907-924) with the exclusive product expressed as
    ``exp(-cumsum(kpar_dz))`` and the cumsum as a strictly-lower-
    triangular (nlev, nlev) matmul — Mosaic cannot lower a sublane
    ``cumprod``, and a 60x60 matmul is free on the MXU.  Run at
    HIGHEST precision so the f32 sum matches the sequential product
    to rounding (tests/test_pallas_step.py pins the agreement)."""
    chl = jnp.maximum(total_chl, 0.02)
    kpar = jnp.where(chl < 0.13224,
                     0.000919 * chl ** 0.3536,
                     0.001131 * chl ** 0.4562)
    kpar_dz = kpar * dz
    att = jnp.exp(-kpar_dz)
    nlev = total_chl.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (nlev, nlev), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (nlev, nlev), 1)
    tril_excl = (col < row).astype(total_chl.dtype)
    # inactive cells pass PAR through unchanged (0 contribution)
    kpar_dz_eff = jnp.where(active, kpar_dz, 0.0)
    cum_excl = jax.lax.dot_general(
        tril_excl, kpar_dz_eff, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=total_chl.dtype)
    par_in = par_surf_row * jnp.exp(-cum_excl)
    par_out = par_in * att
    par_avg = par_in * (1.0 - att) / kpar_dz
    return par_in, par_out, par_avg, kpar_dz


def _dual_ph_solve(depth_m, temp_s, salt_s, dic_s, alk_s, po4, sio3,
                   ph_prev, ph_prev_alt, subsurface):
    """The interior ambient+ALT_CO2 pH solve, warm-start bracket included
    (BGC_mod.F90:945-978): returns (ph, ph_alt) only — in production the
    speciation/saturation products are diagnostic-only and skipped.
    Both scenarios stack on the sublane axis so the bracketed-Newton
    while_loop runs max(iters) instead of the sum."""
    nlev = depth_m.shape[0]
    phlo = jnp.where(ph_prev != 0.0, ph_prev - c.DEL_PH, c.PHLO_3D_INIT)
    phhi = jnp.where(ph_prev != 0.0, ph_prev + c.DEL_PH, c.PHHI_3D_INIT)
    phlo_b = jnp.where(ph_prev_alt != 0.0, ph_prev_alt - c.DEL_PH,
                       c.PHLO_3D_INIT)
    phhi_b = jnp.where(ph_prev_alt != 0.0, ph_prev_alt + c.DEL_PH,
                       c.PHHI_3D_INIT)

    coeffs = carbonate_coeffs(depth_m, temp_s, salt_s, subsurface,
                              k1_k2_ph_tot=True)
    dic_m, ta_m, pt_m, sit_m = _to_mass_units(dic_s, alk_s, po4, sio3)

    coeffs2 = CarbCoeffs(*(jnp.concatenate([v, v], axis=0)
                           for v in coeffs))
    x1 = jnp.concatenate([jnp.exp(-_LN10 * phhi),
                          jnp.exp(-_LN10 * phhi_b)], axis=0)
    x2 = jnp.concatenate([jnp.exp(-_LN10 * phlo),
                          jnp.exp(-_LN10 * phlo_b)], axis=0)
    h = _solve_htotal_impl(
        coeffs2,
        jnp.concatenate([dic_m, dic_m], axis=0),
        jnp.concatenate([ta_m, ta_m], axis=0),
        jnp.concatenate([pt_m, pt_m], axis=0),
        jnp.concatenate([sit_m, sit_m], axis=0),
        x1, x2)
    ph = -jnp.log10(h)
    return ph[:nlev], ph[nlev:]


def _step_kernel(tr_ref, temp_ref, salt_ref, dz_ref, center_ref,
                 bottom_ref, fesed_ref, ph_ref, ph_alt_ref,
                 kmax_ref, lat_ref, dust_ref, par_surf_ref,
                 *rest, params: BGCParams, nlev: int):
    # the restoring-climatology refs exist only when a static lrest_*
    # flag is on (no HBM reads for disabled subsystems)
    any_rest = (params.lrest_no3 or params.lrest_sio3
                or params.lrest_po4)
    idx = 0
    if any_rest:
        rtau_ref = rest[idx]; idx += 1
    no3_clim_ref = po4_clim_ref = sio3_clim_ref = None
    if params.lrest_no3:
        no3_clim_ref = rest[idx]; idx += 1
    if params.lrest_po4:
        po4_clim_ref = rest[idx]; idx += 1
    if params.lrest_sio3:
        sio3_clim_ref = rest[idx]; idx += 1
    tend_ref, ph_out_ref, ph_alt_out_ref, scr_in, scr_out = rest[idx:]
    C = tr_ref.shape[-1]

    # ---- masks from the per-column active-level count ----
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (nlev, C), 0)
    kmax = kmax_ref[:]                          # (1, C) i32
    active = k_idx < kmax                       # (nlev, C) bool
    subsurface = k_idx > 0

    # ---- setup: clip negative tracers (BGC_mod.F90:747-785) ----
    tr = jnp.maximum(tr_ref[:], 0.0)            # (nlev, 30, C)
    temp = temp_ref[:]
    salt = salt_ref[:]
    dz = dz_ref[:]
    center = center_ref[:]
    bottom = bottom_ref[:]
    lat = lat_ref[:]                            # (1, C)
    ph_prev = ph_ref[:]
    ph_prev_alt = ph_alt_ref[:]

    dic = tr[:, T.DIC]
    alk = tr[:, T.ALK]
    po4 = tr[:, T.PO4]
    sio3 = tr[:, T.SIO3]

    # ---- carbonate: dual pH solve only (warm-start carry) ----
    depth_m = center * 0.01
    dic_s = jnp.where(active, dic, 2000.0)
    alk_s = jnp.where(active, alk, 2300.0)
    temp_s = jnp.where(active, temp, 10.0)
    salt_s = jnp.where(active, salt, 35.0)
    ph_3d, ph_3d_alt = _dual_ph_solve(
        depth_m, temp_s, salt_s, dic_s, alk_s, po4, sio3,
        ph_prev, ph_prev_alt, subsurface)
    ph_out_ref[:] = jnp.where(active, ph_3d, ph_prev)
    ph_alt_out_ref[:] = jnp.where(active, ph_3d_alt, ph_prev_alt)

    # ---- the batched ecosystem kinetics (shared code) ----
    kin = bgc_mod.ecosystem_kinetics(
        tr, temp, dz, center, active, lat, par_surf_ref[:], params,
        par_field_fn=par_field_mxu)

    # stage the level-scan inputs in VMEM scratch so the fori_loop can
    # slice per-level rows
    scr_in[:, 0, :] = kin.poc_prod
    scr_in[:, 1, :] = kin.caco3_prod
    scr_in[:, 2, :] = kin.sio2_prod
    scr_in[:, 3, :] = kin.fe_prod_base

    # ---- sinking-particle recurrence (BGC_mod.F90:2242-2631) ----
    dust_row = jnp.maximum(dust_ref[:], 0.0)    # (1, C)
    carry0 = init_particle_carry(dust_row)

    def level_body(k, carry):
        act_k = k < kmax                         # (1, C) bool
        is_bot_k = (k + 1) == kmax
        poc_prod_k = scr_in[pl.ds(k, 1), 0, :]
        caco3_prod_k = scr_in[pl.ds(k, 1), 1, :]
        sio2_prod_k = scr_in[pl.ds(k, 1), 2, :]
        fe_prod_base_k = scr_in[pl.ds(k, 1), 3, :]
        fe_k = jnp.maximum(tr_ref[pl.ds(k, 1), T.FE, :], 0.0)
        o2_k = jnp.maximum(tr_ref[pl.ds(k, 1), T.O2, :], 0.0)
        no3_k = jnp.maximum(tr_ref[pl.ds(k, 1), T.NO3, :], 0.0)
        temp_k = temp_ref[pl.ds(k, 1), :]
        dz_k = dz_ref[pl.ds(k, 1), :]
        bottom_k = bottom_ref[pl.ds(k, 1), :]
        fesed_k = fesed_ref[pl.ds(k, 1), :]

        # iron scavenging scales with the flux entering the level
        # (BGC_mod.F90:1510-1522) — same expressions as the XLA scan body
        fe_scavenge_rate = params.parm_fe_scavenge_rate0 * (
            (carry.poc_s + carry.poc_h) * 120.1
            + (carry.caco3_s + carry.caco3_h) * c.P_CACO3_MASS
            + (carry.sio2_s + carry.sio2_h) * c.P_SIO2_MASS
            + (carry.dust_s + carry.dust_h) * c.DUST_FESCAV_SCALE)
        fe_scavenge_rate = jnp.where(
            fe_k > c.FE_SCAVENGE_THRES1,
            fe_scavenge_rate
            + (fe_k - c.FE_SCAVENGE_THRES1) * c.FE_MAX_SCALE2,
            fe_scavenge_rate)
        fe_scavenge = c.YPS * fe_k * fe_scavenge_rate
        fe_prod = fe_prod_base_k + fe_scavenge

        new_carry, pt = particulate_level_update(
            carry, poc_prod_k, caco3_prod_k, sio2_prod_k, fe_prod,
            temp_k, o2_k, no3_k, dz_k, bottom_k, fesed_k,
            is_bot_k, act_k, params,
            scalelength_fn=scalelength_explicit)

        scr_out[pl.ds(k, 1), 0, :] = pt.poc_remin
        scr_out[pl.ds(k, 1), 1, :] = pt.caco3_remin
        scr_out[pl.ds(k, 1), 2, :] = pt.sio2_remin
        scr_out[pl.ds(k, 1), 3, :] = pt.fe_remin
        scr_out[pl.ds(k, 1), 4, :] = pt.sed_denitrif
        scr_out[pl.ds(k, 1), 5, :] = pt.other_remin
        scr_out[pl.ds(k, 1), 6, :] = fe_scavenge
        return new_carry

    # python-int bounds are safe ONLY because the kernel is traced under
    # jax.enable_x64(False) (see _fused_padded): with x64 on they
    # canonicalize the induction variable to i64, which Mosaic's
    # convert-element-type helper cannot legalize (it recurses).
    # Mosaic's in-kernel for-loop lowering supports unroll=1 or FULL
    # unroll only; OBGC_FUSED_LEVEL_UNROLL=full unrolls all nlev bodies
    # (bigger Mosaic program, more scheduling freedom).
    # full unroll measured fastest on v5e (1.42M vs 1.39M columns/s at
    # the flagship config; block_cols=256 regresses both ways)
    unroll = os.environ.get("OBGC_FUSED_LEVEL_UNROLL", "full")
    unroll = nlev if unroll == "full" else int(unroll)
    jax.lax.fori_loop(0, nlev, level_body, carry0, unroll=unroll)

    pt = ParticleProdOut(
        poc_remin=scr_out[:, 0, :], caco3_remin=scr_out[:, 1, :],
        sio2_remin=scr_out[:, 2, :], fe_remin=scr_out[:, 3, :],
        sed_denitrif=scr_out[:, 4, :], other_remin=scr_out[:, 5, :])
    fe_scavenge = scr_out[:, 6, :]

    # ---- nutrient restoring (static lrest_* gates) ----
    zero = jnp.zeros_like(temp)
    if params.lrest_no3:
        restore_no3 = rtau_ref[:] * (no3_clim_ref[:] - tr[:, T.NO3])
    else:
        restore_no3 = zero
    if params.lrest_sio3:
        restore_sio3 = rtau_ref[:] * (sio3_clim_ref[:] - tr[:, T.SIO3])
    else:
        restore_sio3 = zero
    if params.lrest_po4:
        restore_po4 = rtau_ref[:] * (po4_clim_ref[:] - tr[:, T.PO4])
    else:
        restore_po4 = zero

    # ---- tendency assembly (shared code) ----
    tend, _ = bgc_mod.assemble_tendencies(
        kin, pt, fe_scavenge, tr, restore_no3, restore_sio3,
        restore_po4, params)
    for i in range(T.CNT):
        tend_ref[:, i, :] = jnp.where(active, tend[i], 0.0)


class FusedInteriorOut(NamedTuple):
    tendencies: jax.Array       # (nlev, 30, ncol)
    ph_prev_3d: jax.Array       # (nlev, ncol)
    ph_prev_alt_3d: jax.Array   # (nlev, ncol)


@functools.partial(jax.jit, static_argnames=("params", "block_cols",
                                             "interpret", "nlev"))
def _fused_padded(args, params, block_cols, interpret, nlev):
    ncolp = args[0].shape[-1]
    i0 = np.int32(0)   # np.int32, not 0: x64 index-map literal trap

    spec_tr = pl.BlockSpec((nlev, T.CNT, block_cols),
                           lambda i: (i0, i0, i),
                           memory_space=pltpu.VMEM)
    spec_lev = pl.BlockSpec((nlev, block_cols), lambda i: (i0, i),
                            memory_space=pltpu.VMEM)
    spec_row = pl.BlockSpec((1, block_cols), lambda i: (i0, i),
                            memory_space=pltpu.VMEM)

    n_rest = len(args) - 13        # restoring inputs actually present
    in_specs = [spec_tr] + [spec_lev] * 8 + [spec_row] * 4 \
        + [spec_lev] * n_rest

    try:
        vma = jax.typeof(args[0]).vma
    except Exception:
        vma = None

    def sds(shape):
        if vma:
            return jax.ShapeDtypeStruct(shape, jnp.float32, vma=vma)
        return jax.ShapeDtypeStruct(shape, jnp.float32)

    call = pl.pallas_call(
        functools.partial(_step_kernel, params=params, nlev=nlev),
        grid=(ncolp // block_cols,),
        in_specs=in_specs,
        out_specs=(spec_tr, spec_lev, spec_lev),
        out_shape=(sds((nlev, T.CNT, ncolp)), sds((nlev, ncolp)),
                   sds((nlev, ncolp))),
        scratch_shapes=[
            pltpu.VMEM((nlev, _N_SCR_IN, block_cols), jnp.float32),
            pltpu.VMEM((nlev, _N_SCR_OUT, block_cols), jnp.float32),
        ],
        # the live set of the whole-column kinetics (~50 (nlev, C) f32
        # intermediates) plus the double-buffered block I/O needs ~25 MB
        # at C=128 — above the 16 MB default scoped-vmem limit but well
        # inside v5e's 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(os.environ.get(
                "OBGC_FUSED_VMEM_MB", "64")) * 1024 * 1024),
        interpret=interpret,
    )
    # trace the kernel with x64 semantics OFF: under x64, every weak
    # python-float literal in the shared physics (the ~70 `where(c, x,
    # 0.0)` guards) canonicalizes to an f64 scalar; Mosaic lowers the
    # deduplicated jnp.where sub-jits as functions, where those literals
    # become real f64 block arguments and the scalar f64->f32 truncf
    # cannot be legalized.  With x64 off, the literals are born f32.
    # All kernel inputs are explicitly f32/i32, so nothing else changes.
    with jax.enable_x64(False):
        return call(*args)


def fused_interior_step(
    tracers: jax.Array,        # (nlev, 30, ncol) float32
    grid: ColumnGrid,
    forcing: BGCForcing,
    ph_prev_3d: jax.Array,
    ph_prev_alt_3d: jax.Array,
    params: BGCParams,
    *,
    block_cols: int | None = None,
    interpret: bool | None = None,
) -> FusedInteriorOut:
    """The production (diags-off) BGC interior as ONE fused Pallas call.

    Drop-in for ``bgc_source_sink(..., compute_diags=False)``: returns
    the same tendencies and updated pH warm-start fields (`diags` is
    structurally empty in production).  float32 only.
    """
    if tracers.dtype != jnp.float32:
        raise ValueError("fused_interior_step is float32-only "
                         f"(got {tracers.dtype})")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_cols is None:
        block_cols = int(os.environ.get("OBGC_FUSED_BLOCK_COLS", "128"))
    if block_cols % _LANES:
        raise ValueError(f"block_cols must be a multiple of {_LANES}")

    nlev, ntr, ncol = tracers.shape
    par_surf = (jnp.maximum(forcing.shortwave_surface, 0.0)
                * c.F_QSW_PAR)

    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)

    def row(x):
        return jnp.reshape(x, (1, ncol))

    # pad the column axis by edge replication (padded copies compute a
    # clone of the last real column and are dropped on unpad — no
    # divisions by zero-width land cells)
    pad = (-ncol) % block_cols

    def padc(x):
        if pad == 0:
            return x
        width = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
        return jnp.pad(x, width, mode="edge")

    args = [
        f32(tracers),
        f32(forcing.potential_temperature), f32(forcing.salinity),
        f32(grid.cell_thickness), f32(grid.cell_center_depth),
        f32(grid.cell_bottom_depth), f32(forcing.fesedflux),
        f32(ph_prev_3d), f32(ph_prev_alt_3d),
        row(grid.kmax.astype(jnp.int32)),
        row(f32(grid.latitude)), row(f32(forcing.dust_flux_in)),
        row(f32(par_surf)),
    ]
    if params.lrest_no3 or params.lrest_sio3 or params.lrest_po4:
        args.append(f32(forcing.nutr_restore_rtau))
    if params.lrest_no3:
        args.append(f32(forcing.no3_clim))
    if params.lrest_po4:
        args.append(f32(forcing.po4_clim))
    if params.lrest_sio3:
        args.append(f32(forcing.sio3_clim))
    args = tuple(padc(a) for a in args)

    tend, ph_new, ph_alt_new = _fused_padded(
        args, params, block_cols, interpret, nlev)
    if pad:
        tend = tend[..., :ncol]
        ph_new = ph_new[..., :ncol]
        ph_alt_new = ph_alt_new[..., :ncol]
    return FusedInteriorOut(tendencies=tend, ph_prev_3d=ph_new,
                            ph_prev_alt_3d=ph_alt_new)
