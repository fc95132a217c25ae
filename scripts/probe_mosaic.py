"""Mosaic capability probe for the fused whole-column step kernel.

Compiles ONE small Pallas kernel on the real TPU exercising every pattern
the fused f32 step kernel (ops/pallas_step.py) needs:

  1. batched (nlev, C) elementwise algebra with bool-cond selects,
  2. an in-kernel triangular-matmul cumulative sum (the MXU PAR path),
  3. a fori_loop over levels carrying a tuple of (1, C) rows, reading
     input refs and scratch with pl.ds, writing scratch rows,
  4. an inner masked while_loop with an i32 active-mask carry
     (the pH solver core pattern, already proven in pallas_carbonate),
  5. i32 per-column kmax comparisons (active / is_bottom masks),
  6. mixed dynamic+static indexing on a 3D (nlev, ntr, C) ref.

Run:  python scripts/probe_mosaic.py            (TPU)
      OBGC_PROBE_INTERPRET=1 python ...          (CPU interpreter check)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NLEV, NTR, C = 12, 5, 128


def kernel(tr_ref, temp_ref, kmax_ref, out_ref, tend_ref, scr_in, scr_out):
    nlev = temp_ref.shape[0]

    # (5) i32 masks from kmax
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (nlev, C), 0)
    kmax = kmax_ref[:]                       # (1, C) i32
    active = k_idx < kmax                    # (nlev, C) bool
    temp = temp_ref[:]

    # (1) batched algebra + bool-cond select
    tf = jnp.where(active, 2.0 ** ((temp - 10.0) / 10.0), 1.0)

    # (2) triangular matmul cumsum along levels (exclusive)
    row = jax.lax.broadcasted_iota(jnp.int32, (nlev, nlev), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (nlev, nlev), 1)
    tril_excl = (col < row).astype(jnp.float32)      # strictly lower
    kpar = jnp.where(active, 0.01 * temp, 0.0)
    cum = jax.lax.dot_general(tril_excl, kpar,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    par_in = jnp.exp(-cum)

    # (4) masked while_loop (solver pattern)
    def cond(carry):
        x, act, it = carry
        return (jnp.max(act.astype(jnp.float32)) > 0.5) & (it < 20)

    def body(carry):
        x, act, it = carry
        xn = 0.5 * (x + temp / jnp.maximum(x, 1e-6))
        conv = jnp.abs(xn - x) < 1e-4
        actb = act > 0
        x = jnp.where(actb, xn, x)
        act = (actb & (~conv)).astype(jnp.int32)
        return x, act, it + 1

    x0 = jnp.ones_like(temp)
    sqrt_t, _, _ = jax.lax.while_loop(
        cond, body, (x0, jnp.ones((nlev, C), jnp.int32),
                     jnp.asarray(0, jnp.int32)))

    # stage a computed field into scratch for the level loop
    scr_in[:] = par_in * tf

    # (3) fori_loop over levels, (1, C) carry tuple, pl.ds rows,
    # (6) mixed dynamic+static 3D ref read
    def lbody(k, carry):
        flux_s, flux_h = carry
        act_k = (k < kmax)                    # (1, C) bool
        is_bot = ((k + 1) == kmax)
        src = scr_in[pl.ds(k, 1), :]
        o2row = jnp.maximum(tr_ref[pl.ds(k, 1), 3, :], 0.0)  # dyn+static
        dec = jnp.exp(-0.1 * (1.0 + 0.01 * o2row))
        f_s = flux_s * dec + src
        f_h = flux_h * 0.99
        remin = (flux_s - f_s) + (flux_h - f_h)
        f_s = jnp.where(is_bot, 0.0, f_s)
        f_h = jnp.where(is_bot, 0.0, f_h)
        f_s = jnp.where(act_k, f_s, flux_s)
        f_h = jnp.where(act_k, f_h, flux_h)
        scr_out[pl.ds(k, 1), :] = jnp.where(act_k, remin, 0.0)
        return f_s, f_h

    z = jnp.zeros((1, C), jnp.float32)
    jax.lax.fori_loop(0, nlev, lbody, (z, z))

    remin_all = scr_out[:]                   # full scratch readback
    out_ref[:] = par_in + sqrt_t + remin_all

    # static 3D stores
    for t in range(NTR):
        tend_ref[:, t, :] = remin_all * float(t + 1)


def main():
    interpret = os.environ.get("OBGC_PROBE_INTERPRET", "0") == "1"
    if interpret:
        jax.config.update("jax_platforms", "cpu")

    tr = jnp.asarray(np.random.RandomState(0).rand(NLEV, NTR, C),
                     jnp.float32)
    temp = jnp.asarray(np.random.RandomState(1).rand(NLEV, C) * 20,
                       jnp.float32)
    kmax = jnp.asarray(
        np.random.RandomState(2).randint(1, NLEV + 1, (1, C)), jnp.int32)

    spec3 = pl.BlockSpec(memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((NLEV, C), jnp.float32),
                   jax.ShapeDtypeStruct((NLEV, NTR, C), jnp.float32)),
        in_specs=[spec3, spec3, spec3],
        out_specs=(spec3, spec3),
        scratch_shapes=[pltpu.VMEM((NLEV, C), jnp.float32),
                        pltpu.VMEM((NLEV, C), jnp.float32)],
        interpret=interpret,
    )
    t0 = time.time()
    out, tend = jax.jit(f)(tr, temp, kmax)
    s = float(jnp.sum(out)) + float(jnp.sum(tend))
    print(f"OK compile+run in {time.time()-t0:.1f}s, checksum={s:.6g}")


if __name__ == "__main__":
    main()
