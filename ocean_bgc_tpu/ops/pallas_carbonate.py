"""Pallas TPU kernel for the carbonate-chemistry solve (fp32 fast path).

The hottest op in the model is the dual pH root-find over every (level,
column) cell (two bracketed-Newton solves per cell, BGC_mod.F90:952-978 →
co2calc.F90:872-997).  The XLA path in :mod:`ocean_bgc_tpu.ops.bgc` already
hoists and batches it; this module goes one step further for the opt-in
single-precision path: one Pallas kernel per block of cells that keeps the
entire solve — the 11 equilibrium-constant polynomials, the bracket growth,
the Newton/bisection iteration, the speciation, and the calcite/aragonite
saturation values — resident in VMEM, with cells laid out on the VPU lanes
(blocks of ``block_rows`` sublanes x 128 lanes).  HBM sees exactly one read
of the 12 input fields and one write of the 10 outputs per cell; every
Newton iterate lives on-chip.

With the forcing-invariant coefficient cache (ops/bgc.py::EnvCache) the
kernel instead READS the 15 precomputed equilibrium constants and skips
their 11 exponentials — the winning trade for the compute-bound f32 step
(docs/BENCHMARKS.md round 3) — and the saturation values (cached too)
drop out of the kernel entirely (``with_sat=False``).

float32 only: Mosaic has no f64 story, and the f64 contract path keeps the
XLA implementation (bit-identical to the oracle).  The math is shared —
the kernel body calls the same :mod:`ocean_bgc_tpu.ops.carbonate` routines
the XLA path uses, so there is a single source of truth for the formulas;
only the scheduling differs.

On non-TPU backends the kernel runs in interpreter mode (slow, for tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ocean_bgc_tpu.ops.carbonate import (
    CarbCoeffs,
    _solve_htotal_impl,
    _to_mass_units,
    carbonate_coeffs,
    co3_sat_vals,
)
from ocean_bgc_tpu.constants import MASS_TO_VOL

_LANES = 128

# benign stand-ins for the pad cells (same trick the XLA path uses for
# below-floor cells): a typical open-ocean cell on which the solver
# converges in a few iterations, so padding never slows the block down
_PAD_VALUES = {
    "depth": 0.0, "temp": 10.0, "salt": 35.0, "dic": 2000.0, "ta": 2300.0,
    "pt": 0.5, "sit": 30.0, "phlo_a": 6.0, "phhi_a": 9.0,
    "phlo_b": 6.0, "phhi_b": 9.0, "press": 0.0,
}
_ARG_ORDER = ("depth", "temp", "salt", "dic", "ta", "pt", "sit",
              "phlo_a", "phhi_a", "phlo_b", "phhi_b", "press")
_N_COEFFS = len(CarbCoeffs._fields)


def _carbonate_kernel(*refs, stack_dual, coeffs_in, with_sat,
                      x0_seed=False):
    n_in = 12 + (_N_COEFFS if coeffs_in else 0)
    ins, outs = refs[:n_in], refs[n_in:]
    (depth_ref, temp_ref, salt_ref, dic_ref, ta_ref, pt_ref, sit_ref,
     phlo_a_ref, phhi_a_ref, phlo_b_ref, phhi_b_ref, press_ref) = ins[:12]
    (ph_a_ref, h2co3_a_ref, hco3_a_ref, co3_a_ref,
     ph_b_ref, h2co3_b_ref, hco3_b_ref, co3_b_ref) = outs[:8]

    depth = depth_ref[:]
    temp = temp_ref[:]
    salt = salt_ref[:]
    apply_pressure = press_ref[:] > 0.5

    if coeffs_in:
        coeffs = CarbCoeffs(*(r[:] for r in ins[12:]))
    else:
        coeffs = carbonate_coeffs(depth, temp, salt, apply_pressure,
                                  k1_k2_ph_tot=True)
    dic, ta, pt, sit = _to_mass_units(dic_ref[:], ta_ref[:], pt_ref[:],
                                      sit_ref[:])

    ln10 = 2.302585092994045684

    def x0_of(phlo, phhi):
        """Previous-root iteration seed, recovered in-kernel: warm
        lanes' brackets are ph_prev +/- DEL_PH, so their pH-space
        midpoint IS ph_prev; cold lanes (the wide init bracket, width
        3) are detected by bracket width and keep the 0 sentinel
        (= start at the H-space bracket midpoint, the reference
        sequence).  See carbonate.py::x0_seed_enabled — opt-in, same
        flag as the XLA path; all-float select/compare, Mosaic-safe."""
        mid = 0.5 * (phlo + phhi)
        warm = (phhi - phlo) < 1.0
        return jnp.where(warm, jnp.exp(-ln10 * mid), 0.0)

    def speciate(h, out_refs):
        ph_ref, h2co3_ref, hco3_ref, co3_ref = out_refs
        h2 = h * h
        k12 = coeffs.k1 * coeffs.k2
        denom = 1.0 / (h2 + coeffs.k1 * h + k12)
        ph_ref[:] = -jnp.log10(h)
        h2co3_ref[:] = dic * h2 * denom * MASS_TO_VOL
        hco3_ref[:] = dic * coeffs.k1 * h * denom * MASS_TO_VOL
        co3_ref[:] = dic * k12 * denom * MASS_TO_VOL

    if stack_dual:
        # both scenarios in ONE stacked solve (sublane-concatenated):
        # the while_loop runs max(iters_a, iters_b) instead of their sum
        x1 = jnp.concatenate([jnp.exp(-ln10 * phhi_a_ref[:]),
                              jnp.exp(-ln10 * phhi_b_ref[:])], axis=0)
        x2 = jnp.concatenate([jnp.exp(-ln10 * phlo_a_ref[:]),
                              jnp.exp(-ln10 * phlo_b_ref[:])], axis=0)
        coeffs2 = type(coeffs)(*(jnp.concatenate([c, c], axis=0)
                                 for c in coeffs))
        dic2 = jnp.concatenate([dic, dic], axis=0)
        ta2 = jnp.concatenate([ta, ta], axis=0)
        pt2 = jnp.concatenate([pt, pt], axis=0)
        sit2 = jnp.concatenate([sit, sit], axis=0)
        x0 = (jnp.concatenate(
            [x0_of(phlo_a_ref[:], phhi_a_ref[:]),
             x0_of(phlo_b_ref[:], phhi_b_ref[:])], axis=0)
            if x0_seed else None)
        h = _solve_htotal_impl(coeffs2, dic2, ta2, pt2, sit2, x1, x2,
                               x0=x0)
        nr = dic.shape[0]
        h2 = h * h
        k12_2 = coeffs2.k1 * coeffs2.k2
        denom = 1.0 / (h2 + coeffs2.k1 * h + k12_2)
        ph = -jnp.log10(h)
        h2co3 = dic2 * h2 * denom * MASS_TO_VOL
        hco3 = dic2 * coeffs2.k1 * h * denom * MASS_TO_VOL
        co3 = dic2 * k12_2 * denom * MASS_TO_VOL
        ph_a_ref[:], h2co3_a_ref[:] = ph[:nr], h2co3[:nr]
        hco3_a_ref[:], co3_a_ref[:] = hco3[:nr], co3[:nr]
        ph_b_ref[:], h2co3_b_ref[:] = ph[nr:], h2co3[nr:]
        hco3_b_ref[:], co3_b_ref[:] = hco3[nr:], co3[nr:]
    else:
        # sequential dual: two half-size solves with the smaller working
        # set (the strategy the cold microbenchmark favors; shared
        # coefficients either way)
        h_a = _solve_htotal_impl(
            coeffs, dic, ta, pt, sit,
            jnp.exp(-ln10 * phhi_a_ref[:]), jnp.exp(-ln10 * phlo_a_ref[:]),
            x0=(x0_of(phlo_a_ref[:], phhi_a_ref[:]) if x0_seed
                else None))
        speciate(h_a, (ph_a_ref, h2co3_a_ref, hco3_a_ref, co3_a_ref))
        h_b = _solve_htotal_impl(
            coeffs, dic, ta, pt, sit,
            jnp.exp(-ln10 * phhi_b_ref[:]), jnp.exp(-ln10 * phlo_b_ref[:]),
            x0=(x0_of(phlo_b_ref[:], phhi_b_ref[:]) if x0_seed
                else None))
        speciate(h_b, (ph_b_ref, h2co3_b_ref, hco3_b_ref, co3_b_ref))
    if with_sat:
        sat_calc_ref, sat_arag_ref = outs[8:]
        sat_calc_ref[:], sat_arag_ref[:] = co3_sat_vals(
            depth, temp, salt, apply_pressure)


@functools.partial(jax.jit,
                   static_argnames=("block_rows", "interpret",
                                    "stack_dual", "coeffs_in",
                                    "with_sat", "x0_seed"))
def _dual_sat_padded(args_2d, block_rows, interpret, stack_dual,
                     coeffs_in, with_sat, x0_seed=False):
    rows = args_2d[0].shape[0]
    # np.int32(0), not 0: with jax_enable_x64 the literal becomes an i64
    # scalar in the index-map mini-function, which Mosaic cannot return
    import numpy as _np
    spec = pl.BlockSpec((block_rows, _LANES),
                        lambda i: (i, _np.int32(0)),
                        memory_space=pltpu.VMEM)
    # under shard_map the outputs vary over the same mesh axes as the
    # inputs; without an explicit vma the shard_map vma check rejects
    # the pallas_call (ShapeDtypeStruct defaults to vma=None)
    try:
        vma = jax.typeof(args_2d[0]).vma
    except Exception:
        vma = None
    if vma:
        shape = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32,
                                     vma=vma)
    else:
        shape = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    n_out = 10 if with_sat else 8
    return pl.pallas_call(
        functools.partial(_carbonate_kernel, stack_dual=stack_dual,
                          coeffs_in=coeffs_in, with_sat=with_sat,
                          x0_seed=x0_seed),
        grid=(rows // block_rows,),
        in_specs=[spec] * len(args_2d),
        out_specs=(spec,) * n_out,
        out_shape=(shape,) * n_out,
        interpret=interpret,
    )(*args_2d)


def co3_terms_dual_sat_pallas(depth_m, temp, salt, dic, ta, pt, sit,
                              phlo_a, phhi_a, phlo_b, phhi_b,
                              apply_pressure, *, block_rows=None,
                              stack_dual=False, interpret=None,
                              coeffs: CarbCoeffs = None,
                              with_sat: bool = True):
    """Fused fp32 dual carbonate solve (+ saturation values), one Pallas
    kernel over all cells.

    Drop-in for the hoisted block in ``bgc_source_sink``: semantically
    ``co3_terms_dual(...) + co3_sat_vals(...)`` (comp_CO3terms,
    co2calc.F90:214-316 twice + comp_co3_sat_vals, co2calc.F90:1096-1238),
    evaluated in float32.

    Inputs may be any (broadcastable-to-common) shape; outputs match the
    broadcast shape.  ``apply_pressure`` is the per-cell subsurface gate.

    ``coeffs``: precomputed equilibrium constants (the forcing-invariant
    cache) — the kernel reads them instead of evaluating their 11
    exponentials per cell.  ``with_sat=False`` skips the saturation
    values (they are forcing-invariant too; cached callers already have
    them) and returns ``None`` in their slot.

    Returns ``((ph_a, h2co3_a, hco3_a, co3_a),
               (ph_b, h2co3_b, hco3_b, co3_b),
               (co3_sat_calc, co3_sat_arag) | None)``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_rows is None:
        import os
        block_rows = int(os.environ.get("OBGC_PALLAS_BLOCK_ROWS", "32"))

    named = dict(depth=depth_m, temp=temp, salt=salt, dic=dic, ta=ta,
                 pt=pt, sit=sit, phlo_a=phlo_a, phhi_a=phhi_a,
                 phlo_b=phlo_b, phhi_b=phhi_b,
                 press=jnp.asarray(apply_pressure))
    named["press"] = named["press"].astype(jnp.float32)
    shape = jnp.broadcast_shapes(*(jnp.shape(v) for v in named.values()))
    n = 1
    for s in shape:
        n *= s
    tile = block_rows * _LANES
    n_pad = -(-max(n, 1) // tile) * tile

    def flatten(v, pad_value=None):
        v = jnp.broadcast_to(jnp.asarray(v, jnp.float32),
                             shape).reshape(-1)
        if pad_value is None:
            # edge padding: pad lanes replicate the last real cell, so
            # the solver converges on them like any other
            v = jnp.pad(v, (0, n_pad - n), mode="edge")
        else:
            v = jnp.pad(v, (0, n_pad - n), constant_values=pad_value)
        return v.reshape(n_pad // _LANES, _LANES)

    flat = [flatten(named[name], _PAD_VALUES[name])
            for name in _ARG_ORDER]
    if coeffs is not None:
        flat.extend(flatten(v) for v in coeffs)

    from ocean_bgc_tpu.ops.carbonate import x0_seed_enabled
    outs = _dual_sat_padded(tuple(flat), block_rows, interpret,
                            stack_dual, coeffs is not None, with_sat,
                            x0_seed=x0_seed_enabled())
    outs = [o.reshape(-1)[:n].reshape(shape) for o in outs]
    sat = tuple(outs[8:10]) if with_sat else None
    return tuple(outs[0:4]), tuple(outs[4:8]), sat
