"""Armstrong-ballast sinking-particle scheme.

Re-design of ``init_particulate_terms`` / ``compute_particulate_terms``
(BGC_mod.F90:2006-2699).  Five particle classes (POC, CaCO3, SiO2, dust,
Fe) each carry soft/hard sinking fluxes downward; remineralization comes
from flux conservation across each cell; the bottom cell computes sediment
burial, sedimentary denitrification (Bohlen et al. 2012) and non-oxic
remineralization (Soetaert et al. 1996), with the 3300 m lysocline rule
for CaCO3.

The downward coupling (flux_in <- flux_out of the level above,
BGC_mod.F90:2242-2255) is the only sequential dependency of the whole BGC
kernel; it lives in the ``ParticleCarry`` pytree threaded through the
level ``lax.scan``.  Every field is a ``(ncol,)`` lane vector; the
reference's per-column bottom-cell branch (``k == kmax``) becomes a
per-lane ``is_bottom`` mask, so ragged column depths cost nothing.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ocean_bgc_tpu.constants import (
    DECAY_HARD_DUST_SCALE,
    DECAY_HARD_SCALE,
    DENITRIF_C_N,
    DUST_DISS,
    DUST_GAMMA,
    DUST_MASS,
    DUST_TO_FE,
    FE_SFLUX_REMIN_RATE,
    LYSOCLINE_DEPTH,
    MPERCM,
    P_CACO3_GAMMA,
    P_CACO3_MASS,
    P_SIO2_GAMMA,
    P_SIO2_MASS,
    PARM_RED_FE_C,
    POC_MASS,
    Q,
    QP_ZOO_POM,
    SPD,
    TFUNCS_Q10,
    TREF,
)
from ocean_bgc_tpu.ops.numerics import safe_div
from ocean_bgc_tpu.params import BGCParams

# QA mass ratios (rho = 0.05 * mass / POC mass, BGC_mod.F90:2054-2064)
RHO_CACO3 = 0.05 * P_CACO3_MASS / POC_MASS
RHO_SIO2 = 0.05 * P_SIO2_MASS / POC_MASS
RHO_DUST = 0.05 * DUST_MASS / POC_MASS


class ParticleCarry(NamedTuple):
    """Downward-sinking state entering a level: the outgoing fluxes of the
    level above (base units/cm^2/s) plus the QA dust deficit."""

    poc_s: jax.Array
    poc_h: jax.Array
    caco3_s: jax.Array
    caco3_h: jax.Array
    sio2_s: jax.Array
    sio2_h: jax.Array
    dust_s: jax.Array
    dust_h: jax.Array
    fe_s: jax.Array
    fe_h: jax.Array
    qa_dust_def: jax.Array


class ParticleProdOut(NamedTuple):
    """The subset of per-level particulate results the *production*
    (diags-off) tendency assembly consumes.  Stacking only these as the
    level-scan outputs keeps the sed-loss/dust fields — which only
    diagnostics read — out of HBM entirely (they are still computed
    inside the scan body where the bottom-cell re-injection needs them,
    but XLA dead-code-eliminates their per-level stacking)."""

    poc_remin: jax.Array
    caco3_remin: jax.Array
    sio2_remin: jax.Array
    fe_remin: jax.Array
    sed_denitrif: jax.Array
    other_remin: jax.Array


class ParticleLevelOut(NamedTuple):
    """Per-level results consumed by the tendency assembly."""

    poc_remin: jax.Array
    caco3_remin: jax.Array
    sio2_remin: jax.Array
    dust_remin: jax.Array
    fe_remin: jax.Array
    poc_sed_loss: jax.Array
    caco3_sed_loss: jax.Array
    sio2_sed_loss: jax.Array
    dust_sed_loss: jax.Array
    fe_sed_loss: jax.Array
    sed_denitrif: jax.Array
    other_remin: jax.Array


def init_particle_carry(dust_flux_in: jax.Array) -> ParticleCarry:
    """Surface initialization (init_particulate_terms,
    BGC_mod.F90:2072-2104): all fluxes zero except the dust flux split
    into soft/hard by gamma, and the initial QA dust deficit."""
    zero = jnp.zeros_like(dust_flux_in)
    dust_s = jnp.where(dust_flux_in != 0.0,
                       (1.0 - DUST_GAMMA) * dust_flux_in, 0.0)
    dust_h = jnp.where(dust_flux_in != 0.0, DUST_GAMMA * dust_flux_in, 0.0)
    return ParticleCarry(
        poc_s=zero, poc_h=zero, caco3_s=zero, caco3_h=zero,
        sio2_s=zero, sio2_h=zero, dust_s=dust_s, dust_h=dust_h,
        fe_s=zero, fe_h=zero,
        qa_dust_def=RHO_DUST * (dust_s + dust_h))


def _scalelength(cell_bottom_depth, params: BGCParams):
    """Piecewise-linear dissolution scale-length profile
    (BGC_mod.F90:2273-2286): clamped linear interpolation on the
    4-knot (parm_scalelen_z, parm_scalelen_vals) table."""
    z = jnp.asarray(params.parm_scalelen_z,
                    dtype=cell_bottom_depth.dtype)
    v = jnp.asarray(params.parm_scalelen_vals,
                    dtype=cell_bottom_depth.dtype)
    return jnp.interp(cell_bottom_depth, z, v)


def scalelength_explicit(cell_bottom_depth, params: BGCParams):
    """The same 4-knot clamped interpolation as :func:`_scalelength`,
    written as explicit per-segment selects — no ``searchsorted``/gather,
    so it lowers through Mosaic inside the fused Pallas step kernel.
    Agrees with ``jnp.interp`` to rounding (tests/test_pallas_step.py);
    the knot table is static (python floats), so the segment bounds are
    compile-time constants."""
    z = params.parm_scalelen_z
    v = params.parm_scalelen_vals
    out = jnp.full_like(cell_bottom_depth, v[0])
    for i in range(len(z) - 1):
        t = (cell_bottom_depth - z[i]) / (z[i + 1] - z[i])
        seg = v[i] + t * (v[i + 1] - v[i])
        out = jnp.where((cell_bottom_depth > z[i])
                        & (cell_bottom_depth <= z[i + 1]), seg, out)
    return jnp.where(cell_bottom_depth > z[-1], v[-1], out)


class DissolutionCache(NamedTuple):
    """The (T, grid)-dependent dissolution factors of the sinking scheme
    (BGC_mod.F90:2288-2338) — invariant across timesteps while the
    forcing snapshot is held, so callers integrating with constant
    forcing precompute them once (:func:`precompute_dissolution`) and
    skip their exponentials every step.  Same expressions, same
    values; downstream results shift by XLA scan-body refusion ulps
    only (~1e-14 relative at f64 — the same class as the pinned
    unroll=4 refusion, tests/test_env_cache.py).  The POC dissolution
    length is NOT here: it depends on the evolving O2 tracer."""

    scalelength: jax.Array
    decay_hard: jax.Array
    decay_hard_dust: jax.Array
    decay_caco3: jax.Array
    caco3_diss: jax.Array
    decay_sio2: jax.Array
    sio2_diss: jax.Array
    decay_dust: jax.Array


def precompute_dissolution(temp, cell_thickness, cell_bottom_depth,
                           params: BGCParams,
                           scalelength_fn=None) -> DissolutionCache:
    """Evaluate the forcing-invariant dissolution factors, with exactly
    the expressions :func:`particulate_level_update` uses in-step."""
    if scalelength_fn is None:
        scalelength_fn = _scalelength
    dz = cell_thickness
    scalelength = scalelength_fn(cell_bottom_depth, params)
    tfuncs = TFUNCS_Q10 ** ((temp - TREF) / 10.0)
    sio2_diss = scalelength * params.parm_SiO2_diss / tfuncs
    caco3_diss = scalelength * params.parm_CaCO3_diss
    dust_diss = scalelength * DUST_DISS
    return DissolutionCache(
        scalelength=scalelength,
        decay_hard=jnp.exp(-dz / DECAY_HARD_SCALE),
        decay_hard_dust=jnp.exp(-dz / DECAY_HARD_DUST_SCALE),
        decay_caco3=jnp.exp(-dz / caco3_diss), caco3_diss=caco3_diss,
        decay_sio2=jnp.exp(-dz / sio2_diss), sio2_diss=sio2_diss,
        decay_dust=jnp.exp(-dz / dust_diss))


def particulate_level_update(
    carry: ParticleCarry,
    poc_prod, caco3_prod, sio2_prod, fe_prod,   # (ncol,) production terms
    temp, o2_loc, no3_loc,                      # (ncol,) environment
    cell_thickness, cell_bottom_depth,          # (ncol,) cm
    fesedflux,                                  # (ncol,)
    is_bottom,                                  # (ncol,) bool: k == kmax-1
    active,                                     # (ncol,) bool: k < kmax
    params: BGCParams,
    *,
    scalelength_fn=None,
    diss: DissolutionCache = None,
) -> Tuple[ParticleCarry, ParticleLevelOut]:
    """One level of the sinking recurrence (compute_particulate_terms,
    BGC_mod.F90:2116-2699).  Returns the carry for the next level and the
    per-level remineralization/burial terms.

    ``scalelength_fn`` swaps the knot-table interpolation implementation
    (the fused Pallas kernel passes :func:`scalelength_explicit`);
    ``diss`` supplies this level's precomputed forcing-invariant
    dissolution factors (ulp-identical fast path)."""
    if scalelength_fn is None:
        scalelength_fn = _scalelength

    dz = cell_thickness
    dzr = 1.0 / dz

    # incoming fluxes are the outgoing fluxes of the level above
    poc_s_in, poc_h_in = carry.poc_s, carry.poc_h
    caco3_s_in, caco3_h_in = carry.caco3_s, carry.caco3_h
    sio2_s_in, sio2_h_in = carry.sio2_s, carry.sio2_h
    dust_s_in, dust_h_in = carry.dust_s, carry.dust_h
    fe_s_in, fe_h_in = carry.fe_s, carry.fe_h

    # dissolution length scales (BGC_mod.F90:2288-2338)
    if diss is None:
        scalelength = scalelength_fn(cell_bottom_depth, params)
        decay_hard = jnp.exp(-dz / DECAY_HARD_SCALE)
        decay_hard_dust = jnp.exp(-dz / DECAY_HARD_DUST_SCALE)
        tfuncs = TFUNCS_Q10 ** ((temp - TREF) / 10.0)
        sio2_diss = scalelength * params.parm_SiO2_diss / tfuncs
        caco3_diss = scalelength * params.parm_CaCO3_diss
        dust_diss = scalelength * DUST_DISS
        decay_sio2 = jnp.exp(-dz / sio2_diss)
        decay_caco3 = jnp.exp(-dz / caco3_diss)
        decay_dust = jnp.exp(-dz / dust_diss)
    else:
        scalelength = diss.scalelength
        decay_hard = diss.decay_hard
        decay_hard_dust = diss.decay_hard_dust
        decay_caco3, caco3_diss = diss.decay_caco3, diss.caco3_diss
        decay_sio2, sio2_diss = diss.decay_sio2, diss.sio2_diss
        decay_dust = diss.decay_dust

    # O2-dependent POC dissolution lengthening (BGC_mod.F90:2311-2315);
    # dtype-pinned scalar branches (see the _lit_fac note in ops/bgc.py)
    dt = o2_loc.dtype
    poc_diss = jnp.asarray(params.parm_POC_diss, dt)
    poc_diss = jnp.where(
        (o2_loc >= 5.0) & (o2_loc < 40.0),
        params.parm_POC_diss * (1.0 + (3.3 - 1.0) * (40.0 - o2_loc) / 35.0),
        jnp.where(o2_loc < 5.0,
                  jnp.asarray(params.parm_POC_diss * 3.3, dt), poc_diss))

    poc_diss = scalelength * poc_diss
    decay_poc_e = jnp.exp(-dz / poc_diss)

    # ballast out-fluxes: analytic solution of constant-source linear-decay
    # ODE across the cell (BGC_mod.F90:2349-2365)
    caco3_s_out = (caco3_s_in * decay_caco3
                   + caco3_prod * ((1.0 - P_CACO3_GAMMA)
                                   * (1.0 - decay_caco3) * caco3_diss))
    caco3_h_out = caco3_h_in * decay_hard + caco3_prod * (P_CACO3_GAMMA * dz)
    sio2_s_out = (sio2_s_in * decay_sio2
                  + sio2_prod * ((1.0 - P_SIO2_GAMMA)
                                 * (1.0 - decay_sio2) * sio2_diss))
    sio2_h_out = sio2_h_in * decay_hard + sio2_prod * (P_SIO2_GAMMA * dz)
    dust_s_out = dust_s_in * decay_dust
    dust_h_out = dust_h_in * decay_hard_dust

    # QA(dust) deficit bookkeeping (BGC_mod.F90:2373-2412)
    poc_prod_avail = (poc_prod - RHO_CACO3 * caco3_prod
                      - RHO_SIO2 * sio2_prod)

    dust_in_tot = dust_s_in + dust_h_in
    # safe_div for its den**2-free derivative: deep-cell fluxes decay
    # into TPU f64 emulation's flush range, where the standard division
    # VJP's den**2 is inf (ops/numerics.py); den==0 value 0 vs the old
    # X/1 is identical here (outs are ins*decay = 0)
    qa_ratio = safe_div(dust_s_out + dust_h_out, dust_in_tot)
    new_qa = jnp.where(carry.qa_dust_def > 0.0,
                       carry.qa_dust_def * qa_ratio, 0.0)
    reduce_mask = new_qa > 0.0
    qa_reduced = new_qa - poc_prod_avail * dz
    poc_prod_avail = jnp.where(reduce_mask,
                               jnp.where(qa_reduced < 0.0,
                                         -qa_reduced * dzr, 0.0),
                               poc_prod_avail)
    new_qa = jnp.where(reduce_mask, jnp.maximum(qa_reduced, 0.0), new_qa)

    # POC out-fluxes: hard = QA (ballast-associated), soft = excess
    # (BGC_mod.F90:2423-2438)
    poc_h_out = (RHO_CACO3 * (caco3_s_out + caco3_h_out)
                 + RHO_SIO2 * (sio2_s_out + sio2_h_out)
                 + RHO_DUST * (dust_s_out + dust_h_out)
                 - new_qa)
    poc_h_out = jnp.where((poc_h_in == 0.0) & (poc_prod == 0.0),
                          0.0, jnp.maximum(poc_h_out, 0.0))
    poc_s_out = (poc_s_in * decay_poc_e
                 + poc_prod_avail * ((1.0 - decay_poc_e) * poc_diss))

    # remineralization by conservation (BGC_mod.F90:2445-2463)
    caco3_remin = caco3_prod + ((caco3_s_in - caco3_s_out)
                                + (caco3_h_in - caco3_h_out)) * dzr
    sio2_remin = sio2_prod + ((sio2_s_in - sio2_s_out)
                              + (sio2_h_in - sio2_h_out)) * dzr
    poc_remin = poc_prod + ((poc_s_in - poc_s_out)
                            + (poc_h_in - poc_h_out)) * dzr
    dust_remin = ((dust_s_in - dust_s_out)
                  + (dust_h_in - dust_h_out)) * dzr

    # iron: remin proportional to POC remin (BGC_mod.F90:2469-2501)
    poc_in_tot = poc_s_in + poc_h_in
    # safe_div: same den**2-free-derivative rationale as qa_ratio; the
    # poc_in_tot==0 branch is selected by the outer where either way
    fe_remin = jnp.where(
        poc_in_tot == 0.0,
        poc_remin * PARM_RED_FE_C,
        safe_div(poc_remin * (fe_s_in + fe_h_in), poc_in_tot))
    fe_remin = fe_remin + fe_s_in * FE_SFLUX_REMIN_RATE
    fe_s_out = fe_s_in + dz * (fe_prod - fe_remin)
    fe_remin = jnp.where(fe_s_out < 0.0,
                         fe_s_in * dzr + fe_prod, fe_remin)
    fe_s_out = jnp.maximum(fe_s_out, 0.0)
    fe_remin = fe_remin + dust_remin * DUST_TO_FE + fesedflux * dzr
    fe_h_out = fe_h_in

    # ----- bottom cell: burial, sedimentary denitrification, anoxic remin
    # (BGC_mod.F90:2522-2631) -----
    bot = is_bottom & active

    poc_flux = poc_s_out + poc_h_out
    flux_alt_day = poc_flux * MPERCM * SPD            # mmol/m^2/day
    poc_sed_loss = jnp.where(
        bot & (poc_flux > 0.0),
        poc_flux * jnp.minimum(
            0.8, params.parm_POMbury
            * (0.013 + 0.53 * flux_alt_day * flux_alt_day
               / (7.0 + flux_alt_day) ** 2)),
        0.0)
    sed_denitrif = jnp.where(
        bot & (poc_flux > 0.0),
        dzr * poc_flux * (0.06 + 0.19 * 0.99 ** (o2_loc - no3_loc)),
        0.0)
    sed_denitrif = jnp.where(no3_loc < 5.0, 0.0, sed_denitrif)

    flux_alt_yr = poc_flux * 1.0e-6 * SPD * 365.0     # mmol/cm^2/year
    other_remin = jnp.where(
        bot & (poc_flux > 0.0),
        dzr * jnp.minimum(
            jnp.minimum(0.1 + flux_alt_yr, 0.5) * (poc_flux - poc_sed_loss),
            poc_flux - poc_sed_loss - sed_denitrif * dz * DENITRIF_C_N),
        0.0)
    # anoxic bottom water: all remaining remin is denitrif + other
    other_remin = jnp.where(
        bot & (poc_flux > 0.0) & (o2_loc < 1.0),
        dzr * (poc_flux - poc_sed_loss - sed_denitrif * dz * DENITRIF_C_N),
        other_remin)

    sio2_flux = sio2_s_out + sio2_h_out
    # dtype-pinned branches (see the _lit_fac note in ops/bgc.py)
    sio2_bury_eff = jnp.where(sio2_flux * MPERCM * SPD > 2.0,
                              jnp.asarray(0.2, sio2_flux.dtype),
                              jnp.asarray(0.04, sio2_flux.dtype))
    sio2_sed_loss = jnp.where(bot, sio2_flux * params.parm_BSIbury
                              * sio2_bury_eff, 0.0)

    caco3_flux = caco3_s_out + caco3_h_out
    caco3_sed_loss = jnp.where(bot & (cell_bottom_depth < LYSOCLINE_DEPTH),
                               caco3_flux, 0.0)

    # re-inject the unburied bottom flux as remin (BGC_mod.F90:2574-2590)
    caco3_remin = jnp.where(bot & (caco3_flux > 0.0),
                            caco3_remin + (caco3_flux - caco3_sed_loss) * dzr,
                            caco3_remin)
    sio2_remin = jnp.where(bot & (sio2_flux > 0.0),
                           sio2_remin + (sio2_flux - sio2_sed_loss) * dzr,
                           sio2_remin)
    poc_remin = jnp.where(bot & (poc_flux > 0.0),
                          poc_remin + (poc_flux - poc_sed_loss) * dzr,
                          poc_remin)

    fe_flux = fe_s_out + fe_h_out
    fe_sed_loss = jnp.where(bot & (fe_flux > 0.0), fe_flux, 0.0)
    dust_sed_loss = jnp.where(bot, dust_s_out + dust_h_out, 0.0)

    # bottom cell zeroes all outgoing fluxes (BGC_mod.F90:2615-2628)
    def _zero_at_bottom(x):
        return jnp.where(bot, 0.0, x)

    poc_s_out = _zero_at_bottom(poc_s_out)
    poc_h_out = _zero_at_bottom(poc_h_out)
    caco3_s_out = _zero_at_bottom(caco3_s_out)
    caco3_h_out = _zero_at_bottom(caco3_h_out)
    sio2_s_out = _zero_at_bottom(sio2_s_out)
    sio2_h_out = _zero_at_bottom(sio2_h_out)
    dust_s_out = _zero_at_bottom(dust_s_out)
    dust_h_out = _zero_at_bottom(dust_h_out)
    fe_s_out = _zero_at_bottom(fe_s_out)
    fe_h_out = _zero_at_bottom(fe_h_out)

    # freeze the carry below the bottom of ragged columns
    def _keep(new, old):
        return jnp.where(active, new, old)

    new_carry = ParticleCarry(
        poc_s=_keep(poc_s_out, carry.poc_s),
        poc_h=_keep(poc_h_out, carry.poc_h),
        caco3_s=_keep(caco3_s_out, carry.caco3_s),
        caco3_h=_keep(caco3_h_out, carry.caco3_h),
        sio2_s=_keep(sio2_s_out, carry.sio2_s),
        sio2_h=_keep(sio2_h_out, carry.sio2_h),
        dust_s=_keep(dust_s_out, carry.dust_s),
        dust_h=_keep(dust_h_out, carry.dust_h),
        fe_s=_keep(fe_s_out, carry.fe_s),
        fe_h=_keep(fe_h_out, carry.fe_h),
        qa_dust_def=_keep(new_qa, carry.qa_dust_def),
    )

    def _m(x):
        return jnp.where(active, x, 0.0)

    out = ParticleLevelOut(
        poc_remin=_m(poc_remin), caco3_remin=_m(caco3_remin),
        sio2_remin=_m(sio2_remin), dust_remin=_m(dust_remin),
        fe_remin=_m(fe_remin),
        poc_sed_loss=_m(poc_sed_loss), caco3_sed_loss=_m(caco3_sed_loss),
        sio2_sed_loss=_m(sio2_sed_loss), dust_sed_loss=_m(dust_sed_loss),
        fe_sed_loss=_m(fe_sed_loss),
        sed_denitrif=_m(sed_denitrif), other_remin=_m(other_remin),
    )
    return new_carry, out


def particulate_diags(carry_in: ParticleCarry, out: ParticleLevelOut,
                      poc_prod, caco3_prod, sio2_prod, fe_prod,
                      cell_thickness, active) -> Dict[str, jax.Array]:
    """The per-level particulate diagnostics (BGC_mod.F90:2637-2694).
    FLUX_IN diagnostics report the *incoming* fluxes, i.e. the carry."""
    def _m(x):
        return jnp.where(active, x, 0.0)

    return {
        "POC_FLUX_IN": _m(carry_in.poc_s + carry_in.poc_h),
        "POC_PROD": _m(poc_prod),
        "POC_REMIN": out.poc_remin,
        # declared but never assigned in the reference (BGC_parms.F90:206;
        # no store anywhere in BGC_mod.F90), so the host always reads the
        # zeros it was initialized with — emitted as zeros for name parity
        "POC_ACCUM": jnp.zeros_like(out.poc_remin),
        "CaCO3_FLUX_IN": _m(carry_in.caco3_s + carry_in.caco3_h),
        "CaCO3_PROD": _m(caco3_prod),
        "CaCO3_REMIN": out.caco3_remin,
        "SiO2_FLUX_IN": _m(carry_in.sio2_s + carry_in.sio2_h),
        "SiO2_PROD": _m(sio2_prod),
        "SiO2_REMIN": out.sio2_remin,
        "dust_FLUX_IN": _m(carry_in.dust_s + carry_in.dust_h),
        "dust_REMIN": out.dust_remin,
        "P_iron_FLUX_IN": _m(carry_in.fe_s + carry_in.fe_h),
        "P_iron_PROD": _m(fe_prod),
        "P_iron_REMIN": out.fe_remin,
        "calcToSed": out.caco3_sed_loss,
        "bsiToSed": out.sio2_sed_loss,
        "pocToSed": out.poc_sed_loss,
        "SedDenitrif": out.sed_denitrif * cell_thickness,
        "OtherRemin": out.other_remin * cell_thickness,
        "ponToSed": out.poc_sed_loss * Q,
        "popToSed": out.poc_sed_loss * QP_ZOO_POM,
        "dustToSed": out.dust_sed_loss,
        "pfeToSed": out.fe_sed_loss,
    }
