"""Carbonate chemistry: JAX kernels vs the independent scipy/brentq oracle."""

import numpy as np
import pytest

import ocean_bgc_tpu  # noqa: F401  (enables x64)
import jax
import jax.numpy as jnp

from ocean_bgc_tpu.ops import carbonate as carb
from tests.oracle import carbonate_ref as ref


def _random_cells(rng, n):
    return dict(
        depth_m=rng.uniform(0.0, 5000.0, n),
        temp=rng.uniform(-1.8, 32.0, n),
        salt=rng.uniform(30.0, 40.0, n),
        dic=rng.uniform(1700.0, 2400.0, n),
        alk=rng.uniform(2000.0, 2500.0, n),
        po4=rng.uniform(0.0, 3.5, n),
        sio3=rng.uniform(0.0, 180.0, n),
    )


def test_equilibrium_constants_match_oracle(rng):
    cells = _random_cells(rng, 64)
    for subsurface in (False, True):
        got = carb.carbonate_coeffs(
            jnp.asarray(cells["depth_m"]), jnp.asarray(cells["temp"]),
            jnp.asarray(cells["salt"]), subsurface)
        for i in range(0, 64, 7):
            want = ref.equilibrium_constants(
                cells["depth_m"][i], cells["temp"][i], cells["salt"][i],
                subsurface)
            for field in ("k0", "k1", "k2", "ff", "kb", "k1p", "k2p", "k3p",
                          "ksi", "kw", "ks", "kf", "bt", "st", "ft"):
                np.testing.assert_allclose(
                    np.asarray(getattr(got, field))[i], getattr(want, field),
                    rtol=1e-12, err_msg=f"{field} subsurface={subsurface}")


def test_ph_solver_matches_brentq(rng):
    n = 256
    cells = _random_cells(rng, n)
    phlo = np.full(n, 6.0)
    phhi = np.full(n, 9.0)
    ph, h2co3, hco3, co3 = carb.co3_terms(
        jnp.asarray(cells["depth_m"]), jnp.asarray(cells["temp"]),
        jnp.asarray(cells["salt"]), jnp.asarray(cells["dic"]),
        jnp.asarray(cells["alk"]), jnp.asarray(cells["po4"]),
        jnp.asarray(cells["sio3"]), jnp.asarray(phlo), jnp.asarray(phhi),
        True)
    ph, h2co3, hco3, co3 = map(np.asarray, (ph, h2co3, hco3, co3))
    for i in range(n):
        want = ref.co3_terms(
            cells["depth_m"][i], cells["temp"][i], cells["salt"][i],
            cells["dic"][i], cells["alk"][i], cells["po4"][i],
            cells["sio3"][i], phlo[i], phhi[i], True)
        # the solver tolerance xacc=1e-10 is absolute in H (mol/kg), so
        # assert in H-space and propagate dH into the speciation terms
        h_got = 10.0 ** (-ph[i])
        h_want = 10.0 ** (-want[0])
        np.testing.assert_allclose(h_got, h_want, rtol=1e-5, atol=1.5e-10)
        dh_rel = (abs(h_got - h_want) + 1e-13) / h_want
        np.testing.assert_allclose(h2co3[i], want[1], rtol=3 * dh_rel + 1e-9)
        np.testing.assert_allclose(hco3[i], want[2], rtol=2 * dh_rel + 1e-9)
        np.testing.assert_allclose(co3[i], want[3], rtol=3 * dh_rel + 1e-9)


def test_ph_solver_warm_start_consistency(rng):
    """Warm-started (narrow bracket) and cold solves agree to solver tol."""
    n = 128
    cells = _random_cells(rng, n)
    args = (jnp.asarray(cells["depth_m"]), jnp.asarray(cells["temp"]),
            jnp.asarray(cells["salt"]), jnp.asarray(cells["dic"]),
            jnp.asarray(cells["alk"]), jnp.asarray(cells["po4"]),
            jnp.asarray(cells["sio3"]))
    ph_cold, *_ = carb.co3_terms(*args, jnp.full(n, 6.0), jnp.full(n, 9.0),
                                 True)
    ph_warm, *_ = carb.co3_terms(*args, ph_cold - 0.2, ph_cold + 0.2, True)
    h_cold = 10.0 ** (-np.asarray(ph_cold))
    h_warm = 10.0 ** (-np.asarray(ph_warm))
    np.testing.assert_allclose(h_warm, h_cold, rtol=1e-5, atol=3e-10)


def test_solver_residual_is_zero(rng):
    """The returned htotal satisfies the TA equation to ~machine level."""
    n = 128
    cells = _random_cells(rng, n)
    coeffs = carb.carbonate_coeffs(
        jnp.asarray(cells["depth_m"]), jnp.asarray(cells["temp"]),
        jnp.asarray(cells["salt"]), True)
    htotal, dic = carb.comp_htotal(
        coeffs, jnp.asarray(cells["dic"]), jnp.asarray(cells["alk"]),
        jnp.asarray(cells["po4"]), jnp.asarray(cells["sio3"]),
        jnp.full(n, 6.0), jnp.full(n, 9.0))
    ta = jnp.maximum(jnp.asarray(cells["alk"]), carb.ALK_MIN) * carb.VOL_TO_MASS
    pt = jnp.asarray(cells["po4"]) * carb.VOL_TO_MASS
    sit = jnp.asarray(cells["sio3"]) * carb.VOL_TO_MASS
    fn, df = carb.talk(coeffs, dic, ta, pt, sit, htotal)
    # |fn/df| is the Newton step at the solution: below xacc by construction
    np.testing.assert_array_less(np.abs(np.asarray(fn / df)), 1.5e-10)


def test_co2calc_surface_matches_oracle(rng):
    n = 128
    cells = _random_cells(rng, n)
    xco2 = rng.uniform(280.0, 1200.0, n)
    atm = rng.uniform(0.95, 1.05, n)
    got = carb.co2calc_surface(
        jnp.zeros(n), jnp.asarray(cells["temp"]), jnp.asarray(cells["salt"]),
        jnp.asarray(cells["dic"]), jnp.asarray(cells["alk"]),
        jnp.asarray(cells["po4"]), jnp.asarray(cells["sio3"]),
        jnp.full(n, 7.0), jnp.full(n, 9.0),
        jnp.asarray(xco2), jnp.asarray(atm))
    got = [np.asarray(g) for g in got]
    for i in range(n):
        want = ref.co2calc_surface(
            0.0, cells["temp"][i], cells["salt"][i], cells["dic"][i],
            cells["alk"][i], cells["po4"][i], cells["sio3"][i],
            7.0, 9.0, xco2[i], atm[i])
        h_got = 10.0 ** (-got[0][i])
        h_want = 10.0 ** (-want[0])
        np.testing.assert_allclose(h_got, h_want, rtol=1e-5, atol=1.5e-10)
        dh_rel = (abs(h_got - h_want) + 1e-13) / h_want
        tol = 3 * dh_rel + 1e-9
        np.testing.assert_allclose(got[1][i], want[1], rtol=tol)    # co2*
        np.testing.assert_allclose(got[2][i], want[2], rtol=tol,
                                   atol=tol * abs(want[1]))         # dco2*
        np.testing.assert_allclose(got[3][i], want[3], rtol=tol)    # pCO2
        np.testing.assert_allclose(got[4][i], want[4], rtol=tol,
                                   atol=tol * abs(want[3]))         # dpCO2


def test_co3_sat_matches_oracle(rng):
    n = 64
    cells = _random_cells(rng, n)
    for subsurface in (False, True):
        calc, arag = carb.co3_sat_vals(
            jnp.asarray(cells["depth_m"]), jnp.asarray(cells["temp"]),
            jnp.asarray(cells["salt"]), subsurface)
        calc, arag = np.asarray(calc), np.asarray(arag)
        for i in range(0, n, 5):
            want_c, want_a = ref.co3_sat(
                cells["depth_m"][i], cells["temp"][i], cells["salt"][i],
                subsurface)
            np.testing.assert_allclose(calc[i], want_c, rtol=1e-12)
            np.testing.assert_allclose(arag[i], want_a, rtol=1e-12)


def test_tracer_floors():
    """Near-zero DIC/ALK engage the documented floors instead of diverging."""
    ph, h2co3, hco3, co3 = carb.co3_terms(
        jnp.zeros(1), jnp.asarray([10.0]), jnp.asarray([35.0]),
        jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([0.0]),
        jnp.asarray([0.0]), jnp.asarray([6.0]), jnp.asarray([9.0]), False)
    assert np.isfinite(np.asarray(ph)).all()
    assert np.asarray(hco3)[0] > 0.0


def test_talk_golden_bitwise():
    """Bitwise pin of the total-alkalinity residual fn(H) and d(fn)/dH.

    The 12-term TA expression (co2calc.F90:1060) keeps the reference's
    association/factorization order because it is load-bearing for f64
    trajectory parity; these golden values (captured from the validated
    round-1 implementation, itself verified term-by-term against
    talk_row) must match to the last bit — any re-association of the
    arithmetic shows up here before it shows up as trajectory drift.
    """
    rng = np.random.default_rng(42)
    n = 4096
    depth = jnp.asarray(rng.uniform(0, 5000, n))
    temp = jnp.asarray(rng.uniform(-1.8, 31, n))
    salt = jnp.asarray(rng.uniform(28, 40, n))
    coeffs = carb.carbonate_coeffs(depth, temp, salt,
                                   jnp.asarray(rng.random(n) > 0.3))
    dic, ta, pt, sit = carb._to_mass_units(
        jnp.asarray(rng.uniform(1800, 2400, n)),
        jnp.asarray(rng.uniform(2000, 2500, n)),
        jnp.asarray(rng.uniform(0, 3.5, n)),
        jnp.asarray(rng.uniform(0, 150, n)))
    x = 10.0 ** (-jnp.asarray(rng.uniform(6.0, 9.0, n)))
    # jitted, as on every production path (eager op-by-op evaluation
    # rounds a handful of fused multiply chains differently)
    fn, df = jax.jit(carb.talk)(coeffs, dic, ta, pt, sit, x)
    golden = {
        0: ("0x1.ffafb91c434f4p-11", "-0x1.b189515a37daep+18"),
        1: ("-0x1.7cc75975bfd78p-12", "-0x1.04602843d2843p+10"),
        2: ("-0x1.9e03f88bda110p-14", "-0x1.fe925d110e29fp+10"),
        3: ("-0x1.f2191999ca914p-12", "-0x1.614b25e9c45e4p+9"),
    }
    for i, (fn_hex, df_hex) in golden.items():
        assert float(np.asarray(fn)[i]) == float.fromhex(fn_hex), i
        assert float(np.asarray(df)[i]) == float.fromhex(df_hex), i


def test_warm_brackets_h_contract(rng):
    """The one-pow bracket formation (warm_brackets_h): cold lanes
    (ph==0 sentinel) get the constant wide bracket BITWISE; warm lanes
    match the direct 10**-(ph +/- del) form to ~1 ulp; and the solver
    root from either bracket agrees to solver tolerance."""
    import jax.numpy as jnp

    from ocean_bgc_tpu.constants import (DEL_PH, PHHI_3D_INIT,
                                         PHLO_3D_INIT)
    from ocean_bgc_tpu.ops.carbonate import co3_terms, warm_brackets_h

    ph = jnp.asarray(np.concatenate([
        np.zeros(4),                       # cold sentinel lanes
        rng.uniform(6.5, 9.0, 60),         # warm lanes
    ]))
    x1, x2 = warm_brackets_h(ph, PHLO_3D_INIT, PHHI_3D_INIT, DEL_PH)

    # cold lanes: bitwise the constant wide bracket
    np.testing.assert_array_equal(np.asarray(x1)[:4], 10.0 ** -9.0)
    np.testing.assert_array_equal(np.asarray(x2)[:4], 10.0 ** -6.0)
    # warm lanes: a few ulp of the direct two-pow form
    direct_x1 = 10.0 ** -(np.asarray(ph)[4:] + DEL_PH)
    direct_x2 = 10.0 ** -(np.asarray(ph)[4:] - DEL_PH)
    np.testing.assert_allclose(np.asarray(x1)[4:], direct_x1, rtol=4e-15)
    np.testing.assert_allclose(np.asarray(x2)[4:], direct_x2, rtol=4e-15)
    # brackets still bracket: x1 < x2 and both positive
    assert (np.asarray(x1) < np.asarray(x2)).all()
    assert (np.asarray(x1) > 0).all()

    # end-to-end: a solve seeded by either bracket form lands on the
    # same root to solver tolerance
    n = 32
    depth = jnp.zeros(n)
    temp = jnp.asarray(rng.uniform(-1, 30, n))
    salt = jnp.asarray(rng.uniform(31, 38, n))
    dic = jnp.asarray(rng.uniform(1850, 2350, n))
    alk = jnp.asarray(rng.uniform(2100, 2500, n))
    po4 = jnp.asarray(rng.uniform(0, 3, n))
    sio3 = jnp.asarray(rng.uniform(0, 120, n))
    ph_prev = jnp.asarray(rng.uniform(7.4, 8.6, n))
    ph_a, *_ = co3_terms(depth, temp, salt, dic, alk, po4, sio3,
                         ph_prev - DEL_PH, ph_prev + DEL_PH, False)
    # reproduce via the one-pow path: feed the H-space bracket through
    # co3_terms_dual's brackets kwarg
    from ocean_bgc_tpu.ops.carbonate import co3_terms_dual
    br = warm_brackets_h(ph_prev, PHLO_3D_INIT, PHHI_3D_INIT, DEL_PH)
    (ph_b, *_), _ = co3_terms_dual(depth, temp, salt, dic, alk, po4,
                                   sio3, None, None, None, None, False,
                                   brackets_a=br, brackets_b=br)
    np.testing.assert_allclose(np.asarray(ph_b), np.asarray(ph_a),
                               rtol=0, atol=5e-10)


def test_trusted_fast_path_bitwise(rng):
    """solve_htotal_warm with an all-warm trusted mask skips the bracket
    phase (endpoint evaluations + growth loop) and must return BITWISE
    the roots of the reference-shaped solve — the static orientation
    (the TA residual is strictly decreasing in H) reproduces exactly
    what the evaluated orientation computes whenever growth would not
    have fired.  A mixed mask (any untrusted lane) must take the full
    bracket phase, also bitwise."""
    import jax.numpy as jnp

    from ocean_bgc_tpu.constants import (DEL_PH, PHHI_3D_INIT,
                                         PHLO_3D_INIT)
    from ocean_bgc_tpu.ops.carbonate import (
        _to_mass_units, carbonate_coeffs, solve_htotal,
        solve_htotal_warm, warm_brackets_h)

    n = 256
    temp = jnp.asarray(rng.uniform(-1, 30, n))
    salt = jnp.asarray(rng.uniform(31, 38, n))
    coeffs = carbonate_coeffs(jnp.zeros(n), temp, salt, False)
    dic, ta, pt, sit = _to_mass_units(
        jnp.asarray(rng.uniform(1850, 2350, n)),
        jnp.asarray(rng.uniform(2100, 2500, n)),
        jnp.asarray(rng.uniform(0, 3, n)),
        jnp.asarray(rng.uniform(0, 120, n)))
    # a genuinely warm bracket: +/-DEL_PH around the actual root
    # (perturbed by less than the window, as one timestep's drift
    # would) — a "trusted" lane PROMISES its bracket straddles the
    # root; random unrelated ph_prev would not
    h_true = solve_htotal(coeffs, dic, ta, pt, sit,
                          jnp.full((n,), 10.0 ** -PHHI_3D_INIT),
                          jnp.full((n,), 10.0 ** -PHLO_3D_INIT))
    ph_prev = (-jnp.log10(h_true)
               + jnp.asarray(rng.uniform(-0.15, 0.15, n)))
    x1, x2 = warm_brackets_h(ph_prev, PHLO_3D_INIT, PHHI_3D_INIT, DEL_PH)
    zeros = jnp.zeros_like(x1)

    h_ref = solve_htotal(coeffs, dic, ta, pt, sit, x1, x2)
    h_fast = solve_htotal_warm(coeffs, dic, ta, pt, sit, x1, x2, zeros,
                               jnp.ones_like(x1))
    np.testing.assert_array_equal(np.asarray(h_fast), np.asarray(h_ref))

    mixed = jnp.ones_like(x1).at[7].set(0.0)
    h_mixed = solve_htotal_warm(coeffs, dic, ta, pt, sit, x1, x2, zeros,
                                mixed)
    np.testing.assert_array_equal(np.asarray(h_mixed), np.asarray(h_ref))


def test_x0_seed_same_root_fewer_iterations(rng):
    """The opt-in previous-root seed (OBGC_X0_SEED / solve_htotal_warm
    x0): same root to solver tolerance, measurably fewer iterations.
    The seeded root is NOT bitwise the midpoint-seeded root — both live
    inside the xacc ball (the reference documents xacc -> 3 significant
    figures of co2star, co2calc.F90:47-53); pin the agreement at the
    tolerance level and the iteration reduction."""
    import jax.numpy as jnp

    from ocean_bgc_tpu.constants import (DEL_PH, PHHI_3D_INIT,
                                         PHLO_3D_INIT)
    from ocean_bgc_tpu.ops.carbonate import (
        _to_mass_units, carbonate_coeffs, solve_htotal_stats,
        warm_brackets_h)

    n = 512
    temp = jnp.asarray(rng.uniform(-1, 30, n))
    salt = jnp.asarray(rng.uniform(31, 38, n))
    coeffs = carbonate_coeffs(jnp.zeros(n), temp, salt, False)
    dic, ta, pt, sit = _to_mass_units(
        jnp.asarray(rng.uniform(1850, 2350, n)),
        jnp.asarray(rng.uniform(2100, 2500, n)),
        jnp.asarray(rng.uniform(0, 3, n)),
        jnp.asarray(rng.uniform(0, 120, n)))
    # converge once from a wide bracket to get a "previous root"
    x1w = jnp.full((n,), 10.0 ** -PHHI_3D_INIT)
    x2w = jnp.full((n,), 10.0 ** -PHLO_3D_INIT)
    h_prev, _, conv = solve_htotal_stats(coeffs, dic, ta, pt, sit,
                                         x1w, x2w)
    assert bool(np.asarray(conv).all())
    ph_prev = -jnp.log10(h_prev)
    x1, x2, x0 = warm_brackets_h(ph_prev, PHLO_3D_INIT, PHHI_3D_INIT,
                                 DEL_PH, with_seed=True)
    h_mid, it_mid, cv1 = solve_htotal_stats(coeffs, dic, ta, pt, sit,
                                            x1, x2)
    h_x0, it_x0, cv2 = solve_htotal_stats(coeffs, dic, ta, pt, sit,
                                          x1, x2, x0=x0)
    assert bool(np.asarray(cv1).all()) and bool(np.asarray(cv2).all())
    # same root to solver tolerance (xacc = 1e-10 in H)
    np.testing.assert_allclose(np.asarray(h_x0), np.asarray(h_mid),
                               rtol=0, atol=3e-10)
    # and strictly cheaper in the warm regime
    assert float(np.asarray(it_x0).mean()) < float(
        np.asarray(it_mid).mean()) - 0.5
    assert int(np.asarray(it_x0).max()) <= int(np.asarray(it_mid).max())
