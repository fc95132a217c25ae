"""Photosynthetically-available-radiation attenuation through one cell.

Two-band chlorophyll attenuation law of Morel & Maritorena 2001 as used
identically by the BGC kernel (BGC_mod.F90:907-924) and the DMS kernel
(DMS_mod.F90:538-551): a chlorophyll-dependent absorption coefficient with
a regime split at 0.13224 mg/m^3, integrated analytically across the cell.
"""

from __future__ import annotations

import jax.numpy as jnp


def par_through_cell(par_in, total_chl, cell_thickness_cm):
    """Attenuate PAR across one cell.

    Returns (par_out, par_avg, kpar_dz): PAR leaving the cell bottom, the
    thickness-averaged PAR in the cell, and the dimensionless absorption
    KPARdz (needed by the nitrification taper, BGC_mod.F90:1557).
    """
    chl = jnp.maximum(total_chl, 0.02)
    kpar = jnp.where(chl < 0.13224,
                     0.000919 * chl ** 0.3536,
                     0.001131 * chl ** 0.4562)
    kpar_dz = kpar * cell_thickness_cm
    att = jnp.exp(-kpar_dz)
    par_out = par_in * att
    par_avg = par_in * (1.0 - att) / kpar_dz
    return par_out, par_avg, kpar_dz


def uv_through_cell(uv_in, doc, cell_thickness_cm):
    """DOC-dependent UV attenuation across one cell (DMS_mod.F90:531-536)."""
    kuv_dz = (0.01e-2 * doc + 0.04e-4) * cell_thickness_cm
    att = jnp.exp(-kuv_dz)
    uv_out = uv_in * att
    uv_avg = uv_in * (1.0 - att) / kuv_dz
    return uv_out, uv_avg, kuv_dz
