"""DMS / DMSP sulfur-cycle source-sink kernel.

Re-design of DMS_SourceSink (DMS_mod.F90:156-770): fuzzy partition of the
small-phytoplankton pool into coccolithophore / cyanobacteria / eukaryote
fractions, nitrogen- and sulfur-currency conversions, diagnosed bacteria,
and first/second-order DMS & DMSP kinetics.

Only the PAR (and UV) attenuation is vertically sequential
(DMS_mod.F90:531-551); everything else is per-cell algebra.  The kernel is
a single ``lax.scan`` over levels whose carry is (PAR_out, UV_out), with
each scan step operating on (ncol,) lane vectors.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ocean_bgc_tpu.constants import EPSC, F_QSW_PAR_DMS, UV_FRAC_OF_PAR
from ocean_bgc_tpu.ops.par import par_through_cell, uv_through_cell
from ocean_bgc_tpu.params import DMSParams
from ocean_bgc_tpu.state import DMSTracers as DT

DMS_DIAG_NAMES = (
    "DMS_S_DMSP", "DMS_S_TOTAL",
    "DMS_R_B", "DMS_R_PHOT", "DMS_R_BKGND", "DMS_R_TOTAL",
    "DMSP_S_PHAEO", "DMSP_S_NONPHAEO", "DMSP_S_ZOO", "DMSP_S_TOTAL",
    "DMSP_R_B", "DMSP_R_BKGND", "DMSP_R_TOTAL",
    "Cyano_frac", "Cocco_frac", "Eukar_frac",
    "diatS", "diatN", "phytoN", "coccoS", "cyanoS", "eukarS", "diazS",
    "phaeoS", "zooS", "zooCC", "RSNzoo",
)


def dms_source_sink(
    tracers: jax.Array,         # (nlev, DT.CNT, ncol)
    cell_thickness: jax.Array,  # (nlev, ncol) cm
    active_mask: jax.Array,     # (nlev, ncol) bool
    sst: jax.Array,             # (ncol,)
    shortwave_surface: jax.Array,  # (ncol,) W/m^2
    params: DMSParams,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Tendencies (nlev, DT.CNT, ncol) and the 27 column diagnostics
    (DMS_parms.F90:125-154)."""

    p = params
    nlev, _, ncol = tracers.shape

    clip = jnp.maximum(tracers, 0.0)   # (DMS_mod.F90:471-485)

    # surface initialization (DMS_mod.F90:504-510)
    par_surf = jnp.maximum(shortwave_surface, 0.0) * F_QSW_PAR_DMS
    uv_surf = par_surf * UV_FRAC_OF_PAR

    def level_step(carry, per_level):
        par_out_prev, uv_out_prev = carry
        trc, dz, active = per_level

        dms = trc[DT.DMS]
        dmsp = trc[DT.DMSP]
        doc = trc[DT.DOC]
        zooC = trc[DT.ZOOC]
        spC = trc[DT.SPC]
        spCaCO3 = trc[DT.SPCACO3]
        diatC = trc[DT.DIATC]
        diazC = trc[DT.DIAZC]
        phaeoC = trc[DT.PHAEOC]
        spChl = trc[DT.SPCHL]
        diatChl = trc[DT.DIATCHL]
        diazChl = trc[DT.DIAZCHL]
        phaeoChl = trc[DT.PHAEOCHL]

        # zoo-modulated phyto S release constant (DMS_mod.F90:529);
        # the reference hard-codes the 0.3 zooC normalization here
        k_S_p = p.k_S_p_base * (p.mort + zooC / 0.3)

        # UV attenuation (computed by the reference but, pending the CODiM
        # update, not yet consumed; DMS_mod.F90:531-536)
        uv_out, uv_avg, _ = uv_through_cell(uv_out_prev, doc, dz)

        total_chl = spChl + diatChl + diazChl + phaeoChl
        par_out, par_avg, _ = par_through_cell(par_out_prev, total_chl, dz)

        # photolysis scales with PAR (DMS_mod.F90:562)
        j_dms = p.j_dms_perI * par_avg

        # coccolithophore fraction from CaCO3 quota (DMS_mod.F90:570-573)
        fcocco = jnp.minimum(spCaCO3 / (spC + EPSC), 0.4)
        cocco_frac = fcocco

        # SST-interpolated cyanobacteria fraction (DMS_mod.F90:584-592)
        t_ind = jnp.clip((sst - p.T_lo) / (p.T_hi - p.T_lo), 0.0, 1.0)
        cyano_frac = (t_ind * (p.Max_cyano_frac - p.Min_cyano_frac)
                      + p.Min_cyano_frac)
        cyano_frac = (1.0 - cocco_frac) * cyano_frac
        eukar_frac = 1.0 - cocco_frac - cyano_frac

        # nitrogen currency (DMS_mod.F90:598-604)
        diatN = p.R * diatC
        phaeoN = p.R * phaeoC
        coccoN = cocco_frac * p.R * spC
        cyanoN = cyano_frac * p.R * spC
        eukarN = eukar_frac * p.R * spC
        diazN = p.R * diazC
        zooN = p.R * zooC
        phytoN = diatN + coccoN + cyanoN + eukarN + diazN + phaeoN

        # oxidant-stress upregulation via chlorophyll decrement
        # (DMS_mod.F90:621-628)
        sp_dec = jnp.clip((p.Sp_ref - spChl) / p.Sp_ref, 0.0, 1.0)
        stress_fac = jnp.minimum(1.0 + p.Stress_mult * sp_dec * sp_dec, 10.0)

        # temperature-dependent bacterial yield with cryoprotection
        # overrides (DMS_mod.F90:637-640)
        yield_ = t_ind * (p.Max_yld - p.Min_yld) + p.Min_yld
        yield_ = jnp.where((sst < p.T_cryo_hi) & (sst > p.T_cryo_lo),
                           0.5, yield_)
        yield_ = jnp.where(sst < -1.0, 0.25, yield_)

        # per-class sulfur content (DMS_mod.F90:647-660)
        diatS = p.Rs2n_diat * diatN
        phaeoS = p.Rs2n_phaeo * phaeoN
        coccoS = p.Rs2n_cocco * coccoN
        cyanoS = p.Rs2n_cyano * cyanoN
        eukarS = p.Rs2n_eukar * eukarN * stress_fac
        diazS = p.Rs2n_diaz * diazN
        phytoS = (diatS + coccoS + cyanoS + eukarS + diazS
                  + p.G_phaeo_S * phaeoS)

        # food-weighted zooplankton sulfur (DMS_mod.F90:671-684)
        rs2n_zoo_weighted = (
            p.Rs2n_diat * diatN
            + p.G_phaeo_S * p.Rs2n_phaeo * phaeoN
            + p.Rs2n_cocco * coccoN
            + p.Rs2n_cyano * cyanoN
            + p.Rs2n_eukar * eukarN * stress_fac
            + p.Rs2n_diaz * diazN) / jnp.where(phytoN > 0.0, phytoN, 1.0)
        rs2n_zoo_fallback = (p.Rs2n_diat + p.Rs2n_cocco + p.Rs2n_cyano
                             + p.Rs2n_eukar + p.Rs2n_diaz
                             + p.Rs2n_phaeo) / 6.0
        rs2n_zoo = jnp.where(phytoN > 0.0, rs2n_zoo_weighted,
                             rs2n_zoo_fallback)
        zooS = rs2n_zoo * zooN

        # diagnosed bacteria (DMS_mod.F90:695)
        b_diagnosed = p.B_preexp * phytoN ** p.B_exp

        # kinetic terms (DMS_mod.F90:701-716)
        dms_s_dmsp = yield_ * p.k_conv * dmsp
        dms_s = dms_s_dmsp
        dms_r_B = p.k_S_B * b_diagnosed * dms
        dms_r_phot = j_dms * dms
        dms_r_bkgnd = p.k_bkgnd * dms
        dms_r = dms_r_B + dms_r_phot + dms_r_bkgnd

        dmsp_s_phaeo = p.inject_scale * p.k_S_p_base * phaeoS
        dmsp_s_nonphaeo = p.inject_scale * k_S_p * phytoS
        dmsp_s_zoo = p.inject_scale * p.k_S_z * zooS
        dmsp_s = dmsp_s_phaeo + dmsp_s_nonphaeo + dmsp_s_zoo
        dmsp_r_B = p.k_conv * dmsp
        dmsp_r_bkgnd = p.k_bkgnd * dmsp
        dmsp_r = dmsp_r_B + dmsp_r_bkgnd

        def masked(x):
            return jnp.where(active, x, 0.0)

        tend_dms = masked(dms_s - dms_r)
        tend_dmsp = masked(dmsp_s - dmsp_r)

        diags = {
            "DMS_S_DMSP": dms_s_dmsp, "DMS_S_TOTAL": dms_s,
            "DMS_R_B": dms_r_B, "DMS_R_PHOT": dms_r_phot,
            "DMS_R_BKGND": dms_r_bkgnd, "DMS_R_TOTAL": dms_r,
            "DMSP_S_PHAEO": dmsp_s_phaeo,
            "DMSP_S_NONPHAEO": dmsp_s_nonphaeo,
            "DMSP_S_ZOO": dmsp_s_zoo, "DMSP_S_TOTAL": dmsp_s,
            "DMSP_R_B": dmsp_r_B, "DMSP_R_BKGND": dmsp_r_bkgnd,
            "DMSP_R_TOTAL": dmsp_r,
            "Cyano_frac": cyano_frac, "Cocco_frac": cocco_frac,
            "Eukar_frac": eukar_frac,
            "diatS": diatS, "diatN": diatN, "phytoN": phytoN,
            "coccoS": coccoS, "cyanoS": cyanoS, "eukarS": eukarS,
            "diazS": diazS, "phaeoS": phaeoS, "zooS": zooS,
            "zooCC": zooC, "RSNzoo": rs2n_zoo,
        }
        diags = {k: masked(v) for k, v in diags.items()}

        return (par_out, uv_out), (tend_dms, tend_dmsp, diags)

    (_, _), (tend_dms, tend_dmsp, diags) = jax.lax.scan(
        level_step, (par_surf, uv_surf),
        (clip, cell_thickness, active_mask))

    zero = jnp.zeros_like(tend_dms)
    tend = [zero] * DT.CNT
    tend[DT.DMS] = tend_dms
    tend[DT.DMSP] = tend_dmsp
    tendencies = jnp.stack(tend, axis=1)
    return tendencies, diags
