"""Flagship benchmark: columns/s/chip for the full coupled step (float64).

Measures the complete BGC+DMS+MACROS+co2calc forward step — two carbonate
pH solves per cell, the ballast sinking recurrence, all 30+2+3 tracer
tendencies, forward-Euler update, and surface gas exchange — on the
default backend (TPU under the driver; CPU otherwise).

``vs_baseline`` reports the speedup over the same float64 physics executed
on one host-CPU device — the stand-in for the reference's serial Fortran
per-rank execution model (the reference publishes no numbers and this
image has no Fortran compiler; BASELINE.md).

Env knobs: BENCH_NCOL, BENCH_NLEV, BENCH_STEPS, BENCH_REPEATS,
BENCH_DIAGS=1 (include the ~95-field diagnostic outputs in the step).

Prints exactly one JSON line.

The default invocation (``python bench.py``, no env) is the driver
contract and MUST land inside the driver's timeout on this image, where
every distinct XLA program costs 4-10 min of remote-relay compile that
the persistent cache cannot reuse (docs/BENCHMARKS.md "Operational
notes").  It therefore runs exactly TWO programs — the primary TPU step
and the small host-CPU baseline — under a wall-clock budget
(``BENCH_BUDGET_S``, default 1500 s, measured from process start so the
first compile is inside it).  If the budget is gone after the primary
measurement, the CPU baseline is skipped and ``vs_baseline`` falls back
to the round-2 pinned CPU measurement (flagged in the ``baseline``
field).  The 4-config quad is opt-in (``BENCH_QUAD=1``) — round 3's
quad-by-default chained enough compiles to blow the driver budget and
the round recorded no number at all (VERDICT round 3, weak #1).
"""

from __future__ import annotations

import json
import os
import time

import jax

# wall-clock origin for the whole-process budget: set at import so the
# first XLA compile (the dominant cost on this image) counts against it
_T0 = time.monotonic()


def _budget_left():
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    return budget_s - (time.monotonic() - _T0)


def _throughput(device, ncol, nlev, nsteps, repeats, compute_diags,
                dtype=None, carbonate_impl="xla", diag_dtype=None,
                interior_impl="auto", use_env=True, diag_filter=None):
    from ocean_bgc_tpu.models.coupled import step
    from ocean_bgc_tpu.params import ModelParams
    from ocean_bgc_tpu.utils.synthetic import synthetic_world

    params = ModelParams()
    state, grid, forcing = synthetic_world(nlev=nlev, ncol=ncol, seed=17,
                                           ragged=False, dtype=dtype)
    state, grid, forcing = jax.device_put((state, grid, forcing), device)

    # forcing-invariant coefficient tables, evaluated once per forcing
    # snapshot (the production regime: tracer dt << forcing dt) —
    # equal to in-step evaluation to refusion ulps
    # (tests/test_env_cache.py); use_env=False measures the
    # recompute-everything step (the reference's own semantics:
    # constants re-evaluated every call, co2calc.F90:285-320)
    env = None
    if use_env:
        from ocean_bgc_tpu.ops.bgc import precompute_env
        env = jax.jit(lambda g, f: precompute_env(g, f, params.bgc))(
            grid, forcing)

    # jit ONE step (the smallest program — TPU compile time on this image
    # is service-bound and highly variable) and loop in Python; dispatch
    # overhead is negligible against the f64 step cost.  The diagnostics
    # dict is RETURNED (not dropped) so the diags-on configuration truly
    # materializes all ~155 fields — dropping it lets XLA dead-code-
    # eliminate the entire diagnostic computation and fakes the number.
    fn = jax.jit(
        lambda s: step(s, grid, forcing, params, 3600.0,
                       compute_diags=compute_diags,
                       carbonate_impl=carbonate_impl,
                       interior_impl=interior_impl,
                       diag_dtype=diag_dtype, env=env,
                       diag_filter=diag_filter),
        donate_argnums=0)
    out, diags = fn(state)               # compile + warm up
    jax.block_until_ready(out)

    import jax.numpy as jnp
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(nsteps):
            out, diags = fn(out)
        # scalar readback: airtight sync on every backend (verified
        # equal to block_until_ready on this stack for the step fn)
        float(jnp.sum(out.bgc.surface_ph))
        if compute_diags:
            float(jnp.sum(next(iter(diags.values()))))
        best = min(best, (time.perf_counter() - t0) / nsteps)
    return ncol / best


def _scaling_mode(ncol, nlev, nsteps):
    """Weak-scaling efficiency 1 -> N devices over the columns mesh
    (constant columns per device), as one JSON line.

    Only meaningful on real multi-chip hardware: on the virtual CPU mesh
    the N 'devices' share one socket's cores, so the 1-device run already
    saturates them and the ratio reads as poor scaling."""
    import time as _time

    from ocean_bgc_tpu.parallel import (make_mesh, make_sharded_step,
                                        shard_world)
    from ocean_bgc_tpu.params import ModelParams
    from ocean_bgc_tpu.utils.synthetic import synthetic_world

    params = ModelParams()
    devs = jax.devices()
    per_dev = max(ncol // len(devs), 16)

    def tput(n):
        mesh = make_mesh(devs[:n])
        state, grid, forcing = synthetic_world(
            nlev=nlev, ncol=per_dev * n, seed=17, ragged=False)
        state, grid, forcing = shard_world(state, grid, forcing, mesh)
        fn = make_sharded_step(mesh, params, 3600.0, compute_diags=True,
                               nsteps=nsteps)
        out = fn(state, grid, forcing)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = _time.perf_counter()
            jax.block_until_ready(fn(state, grid, forcing))
            best = min(best, _time.perf_counter() - t0)
        return per_dev * n * nsteps / best

    t1 = tput(1)
    tn = tput(len(devs))
    eff = tn / (t1 * len(devs))
    out = {
        "metric": f"weak_scaling_efficiency_1_to_{len(devs)}_devices",
        "value": round(eff, 4),
        "unit": f"fraction (columns/s: {t1:.0f} -> {tn:.0f})",
        "vs_baseline": round(eff / 0.9, 3),   # target: >90% efficiency
    }
    if devs[0].platform == "cpu":
        out["caveat"] = (
            "virtual CPU mesh: all 'devices' share one socket's cores, "
            "so the 1-device run already saturates them and this ratio "
            "UNDERSTATES real scaling.  It validates the sharded "
            "program end-to-end (shard_map + psum), not pod "
            "efficiency; the >90% BASELINE gate needs real multi-chip "
            "hardware, which this image does not have.")
    print(json.dumps(out))


def _forced_mode(ncol, nlev, nsteps, repeats):
    """Production-shaped forced run (time-varying forcing, hold
    interpolation): per-record env cache vs recompute-every-step.
    value = columns/s with the cache; vs_baseline = speedup over the
    uncached forced run (the round-2 production path)."""
    import jax.numpy as jnp
    from ocean_bgc_tpu.models.forcing_series import (run_forced,
                                                     stack_forcings)
    from ocean_bgc_tpu.params import ModelParams
    from ocean_bgc_tpu.utils.synthetic import synthetic_world

    params = ModelParams()
    nrec = int(os.environ.get("BENCH_FORCED_NREC", "4"))
    worlds = [synthetic_world(nlev=nlev, ncol=ncol, seed=40 + r,
                              ragged=False) for r in range(nrec)]
    state, grid, _ = worlds[0]
    series = stack_forcings([w[2] for w in worlds])
    # several steps per record so the cache has something to amortize
    record_dt = 3600.0 * max(2, nsteps // nrec)

    def tput(env_mode):
        fn = jax.jit(lambda s: run_forced(
            s, grid, series, params, 3600.0, nsteps, record_dt,
            interp="hold", env_mode=env_mode)[0])
        out = fn(state)
        float(jnp.sum(out.bgc.surface_ph))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fn(state)
            float(jnp.sum(out.bgc.surface_ph))
            best = min(best, (time.perf_counter() - t0) / nsteps)
        return ncol / best

    cached = tput("hold")
    uncached = tput("off")
    print(json.dumps({
        "metric": "forced_run_columns_per_s_per_chip_f64_env_hold",
        "value": round(cached, 2),
        "unit": (f"columns/s/chip ({nlev}-level forced run, {nrec} "
                 f"records, hold interp; uncached: {uncached:.0f})"),
        "vs_baseline": round(cached / uncached, 3),
        "baseline": "same forced run with env_mode='off' "
                    "(recompute-every-step, the round-2 production "
                    "path)",
    }))


def _co2calc_mode(repeats):
    """BASELINE.md measured config 2: the carbonate solve batched over
    10k columns (cold wide bracket, the reference's worst case)."""
    import numpy as np

    import jax.numpy as jnp
    from ocean_bgc_tpu.ops.carbonate import co3_terms

    n = int(os.environ.get("BENCH_CO2_N", "10000"))
    rng = np.random.default_rng(7)
    args = (jnp.asarray(rng.uniform(0, 5000, n)),
            jnp.asarray(rng.uniform(-1.8, 31, n)),
            jnp.asarray(rng.uniform(30, 40, n)),
            jnp.asarray(rng.uniform(1800, 2400, n)),
            jnp.asarray(rng.uniform(2000, 2500, n)),
            jnp.asarray(rng.uniform(0, 3.5, n)),
            jnp.asarray(rng.uniform(0, 150, n)),
            jnp.full(n, 6.0), jnp.full(n, 9.0))
    # a scalar readback, not block_until_ready: the only airtight
    # synchronization on every backend (incl. the axon relay)
    fn = jax.jit(lambda *a: sum(jnp.sum(x) for x in co3_terms(*a, True)))
    float(fn(*args))
    best = float("inf")
    for _ in range(max(repeats, 3)):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "metric": "co2calc_cells_per_s_cold_bracket_f64",
        "value": round(n / best, 1),
        "unit": f"pH solves/s ({n}-cell batch, wide bracket)",
        "vs_baseline": 1.0,
    }))


def _pallas_co2_mode(repeats):
    """fp32 carbonate dual-solve: fused Pallas kernel vs the XLA path,
    on the default backend.  vs_baseline = XLA time / Pallas time."""
    import numpy as np

    import jax.numpy as jnp
    from ocean_bgc_tpu.ops.carbonate import co3_sat_vals, co3_terms_dual
    from ocean_bgc_tpu.ops.pallas_carbonate import co3_terms_dual_sat_pallas

    n = int(os.environ.get("BENCH_CO2_N", "491520"))
    rng = np.random.default_rng(7)
    f32 = jnp.float32
    args = (jnp.asarray(rng.uniform(0, 5000, n), f32),
            jnp.asarray(rng.uniform(-1.8, 31, n), f32),
            jnp.asarray(rng.uniform(30, 40, n), f32),
            jnp.asarray(rng.uniform(1800, 2400, n), f32),
            jnp.asarray(rng.uniform(2000, 2500, n), f32),
            jnp.asarray(rng.uniform(0, 3.5, n), f32),
            jnp.asarray(rng.uniform(0, 150, n), f32),
            jnp.full(n, 6.0, f32), jnp.full(n, 9.0, f32),
            jnp.full(n, 6.1, f32), jnp.full(n, 8.9, f32),
            jnp.asarray(rng.uniform(0, 5000, n) > 10.0))

    # jit the WHOLE wrapper (padding/reshape included): leaving it eager
    # cost round 1 a third of the kernel's true throughput
    @jax.jit
    def pallas_fn(*a):
        pa, pb, sc = co3_terms_dual_sat_pallas(*a)
        return sum(jnp.sum(x) for x in pa + pb + sc)

    xla_fn = jax.jit(lambda *a: sum(
        jnp.sum(x) for x in
        (lambda d: d[0] + d[1])(co3_terms_dual(*a[:11], a[11]))
        + co3_sat_vals(a[0], a[1], a[2], a[11])))

    def best_of(fn):
        float(fn(*args))
        best = float("inf")
        for _ in range(max(repeats, 3)):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    tp = best_of(pallas_fn)
    tx = best_of(xla_fn)
    print(json.dumps({
        "metric": "pallas_carbonate_dual_solves_per_s_f32",
        "value": round(2 * n / tp, 1),
        "unit": f"pH solves/s ({n}-cell batch; XLA path: {2*n/tx:.0f})",
        "vs_baseline": round(tx / tp, 3),
    }))


def main():
    # BENCH_PLATFORM=cpu forces the host backend (the axon TPU plugin
    # overrides the JAX_PLATFORMS env var, so this must go through
    # jax.config before first device use)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    # persistent compilation cache: first-ever compile of the 60-level f64
    # program costs minutes on the TPU; subsequent bench runs hit the cache
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/obgc_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import ocean_bgc_tpu  # noqa: F401  (enables x64)

    ncol = int(os.environ.get("BENCH_NCOL", "8192"))
    nlev = int(os.environ.get("BENCH_NLEV", "60"))
    nsteps = int(os.environ.get("BENCH_STEPS", "10"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    diags = os.environ.get("BENCH_DIAGS", "0") == "1"

    if os.environ.get("BENCH_MODE") == "scaling":
        _scaling_mode(ncol, nlev, nsteps)
        return
    if os.environ.get("BENCH_MODE") == "co2calc":
        _co2calc_mode(repeats)
        return
    if os.environ.get("BENCH_MODE") == "forced":
        _forced_mode(ncol, nlev, nsteps, repeats)
        return
    if os.environ.get("BENCH_MODE") == "pallas_co2":
        _pallas_co2_mode(repeats)
        return

    import jax.numpy as jnp
    dtype = jnp.float32 if os.environ.get("BENCH_DTYPE") == "f32" else None
    device = jax.devices()[0]
    carb = os.environ.get("BENCH_CARB_IMPL", "auto")
    ddt = (jnp.float32 if os.environ.get("BENCH_DIAG_DTYPE") == "f32"
           else None)
    use_env = os.environ.get("BENCH_ENV", "1") == "1"
    # BENCH_DIAG_FILTER="pco2surf,NITRIF,..." measures the selective-
    # diagnostics production configuration (unlisted diagnostics are
    # dead-code-eliminated; models/coupled.py::evaluate_tendencies).
    # Requires BENCH_DIAGS=1 — a filter on a diags-off run would
    # silently measure the wrong configuration under a selective label.
    dfilter = (tuple(x for x in
                     os.environ["BENCH_DIAG_FILTER"].split(",") if x)
               if os.environ.get("BENCH_DIAG_FILTER") else None)
    if dfilter and not diags:
        raise SystemExit("BENCH_DIAG_FILTER requires BENCH_DIAGS=1")
    value = _throughput(device, ncol, nlev, nsteps, repeats, diags,
                        dtype=dtype, carbonate_impl=carb, diag_dtype=ddt,
                        use_env=use_env, diag_filter=dfilter)

    # the flagship quad: every (env, diags) combination from the SAME
    # run, so the artifact carries its own semantics — env=on assumes
    # the host holds forcing between steps (amortized coefficient
    # tables); env=off is the reference's recompute-every-call
    # semantics; diags=on materializes all ~155 diagnostic fields (the
    # reference always computes its diagnostics, SURVEY.md par.5).
    # OPT-IN (BENCH_QUAD=1): each extra config is a separate XLA program
    # costing minutes of uncacheable remote-relay compile — quad-on by
    # default blew the round-3 driver budget (VERDICT round 3, weak #1).
    configs = {}
    if os.environ.get("BENCH_QUAD", "0") == "1" and dtype is None:
        # seed the quad with the primary measurement ONLY when it is a
        # plain (env, diags) configuration — a diag-filtered primary
        # under the plain key would mislabel it relative to the other
        # (unfiltered) quad entries
        if dfilter is None and ddt is None:
            configs[f"env_{'on' if use_env else 'off'}"
                    f"_diags_{'on' if diags else 'off'}"] = round(value, 2)
        for e, d in ((True, False), (False, False), (True, True),
                     (False, True)):
            key = (f"env_{'on' if e else 'off'}"
                   f"_diags_{'on' if d else 'off'}"
                   # the loop inherits diag_dtype: label it so an
                   # f32-diag quad is never mistaken for the plain one
                   + ("_f32diags" if ddt is not None else ""))
            if key in configs:
                continue
            if _budget_left() <= 0:
                configs[key] = "skipped_budget"
                continue
            configs[key] = round(
                _throughput(device, ncol, nlev, max(2, nsteps // 2), 2,
                            d, dtype=dtype, carbonate_impl=carb,
                            diag_dtype=ddt, use_env=e), 2)

    # host-CPU baseline (serial-Fortran stand-in): same physics, one CPU
    # device, smaller column count for wall-clock sanity.  Behind the
    # budget: if the primary compile consumed it, fall back to the
    # pinned round-2 CPU measurement (9,336 columns/s at 512 columns,
    # BENCH_r02.json: 257,957 / 27.629) rather than risk the whole
    # artifact on another compile.
    baseline_note = ("same program, one host-CPU device "
                     f"({min(ncol, 512)} columns) — a jax-cpu stand-in "
                     "for the reference's serial per-rank execution "
                     "(no Fortran compiler on this image)")
    cpu_pin = float(os.environ.get("BENCH_CPU_PIN", "9336.0"))
    try:
        if _budget_left() <= 0:
            raise TimeoutError("bench budget exhausted")
        cpu = jax.devices("cpu")[0]
        cpu_ncol = min(ncol, 512)
        cpu_value = _throughput(cpu, cpu_ncol, nlev, max(2, nsteps // 5),
                                1, diags, dtype=dtype, use_env=use_env,
                                diag_filter=dfilter)
        vs_baseline = value / cpu_value
    except Exception:
        # the pin is an f64, env-on, diags-off, unfiltered measurement —
        # only a matching primary may be ratioed against it; any other
        # configuration records vs_baseline=null rather than a ratio of
        # incompatible configurations
        if (dtype is None and dfilter is None and ddt is None
                and use_env and not diags):
            vs_baseline = value / cpu_pin
            baseline_note = ("pinned round-2 host-CPU measurement "
                             "(9,336 columns/s, 512 columns; live CPU "
                             "baseline skipped: budget exhausted or CPU "
                             "backend unavailable)")
        else:
            vs_baseline = None
            baseline_note = ("no baseline: live CPU run skipped (budget "
                             "exhausted or CPU backend unavailable) and "
                             "the pinned round-2 CPU measurement is an "
                             "f64 env-on diags-off unfiltered config, "
                             "which this run is not")

    prec = "f32" if dtype is not None else "f64"
    out = {
        "metric": f"columns_per_s_per_chip_full_coupled_step_{prec}"
                  + ("_with_diags" if diags else "")
                  + (f"_diagfilter{len(dfilter)}" if dfilter else "")
                  + (f"_carb_{carb}" if carb != "auto" else "")
                  + ("_f32diags" if ddt is not None else ""),
        "value": round(value, 2),
        "unit": f"columns/s/chip ({nlev}-level, 35-tracer step)",
        "vs_baseline": (round(vs_baseline, 3)
                        if vs_baseline is not None else None),
        # explicit semantics (VERDICT round 2): what the number means
        "env": use_env,
        "diags": diags,
        "baseline": baseline_note,
    }
    if configs:
        out["configs"] = configs
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
