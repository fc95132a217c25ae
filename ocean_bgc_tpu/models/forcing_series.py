"""Time-varying forcing: climatology interpolation inside the compiled run.

The reference library receives a fresh ``BGC_forcing_type`` every call —
the host model (MPAS-Ocean/POP) owns the time axis and interpolates its
monthly/daily forcing climatologies onto each coupling step
(SURVEY.md §0: "the host owns ... time stepping").  A standalone
framework needs that host capability: this module integrates the coupled
model under a *forcing series* — a :class:`~ocean_bgc_tpu.state.BGCForcing`
pytree whose leaves carry a leading time-record axis — with per-step
linear interpolation (or nearest-record hold) done *inside* the
``lax.scan``, so the whole forced integration is still one XLA program
with zero host round-trips.

Series files: :func:`ocean_bgc_tpu.io.model_io.save_world` stores a single
snapshot; a series is just the same variables with a leading ``time``
record dimension (netcdf3 supports the UNLIMITED dim natively).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ocean_bgc_tpu.models.coupled import CoupledState, step
from ocean_bgc_tpu.params import ModelParams
from ocean_bgc_tpu.state import BGCForcing, ColumnGrid


def forcing_at(series: BGCForcing, t_frac) -> BGCForcing:
    """Linearly interpolate a forcing series at fractional record index
    ``t_frac`` (clamped to [0, T-1]).  Every leaf of ``series`` must have
    the time-record axis leading."""
    leaves = jax.tree.leaves(series)
    nrec = leaves[0].shape[0]
    t = jnp.clip(t_frac, 0.0, nrec - 1.0)
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, nrec - 1)
    i1 = jnp.clip(i0 + 1, 0, nrec - 1)
    w = t - i0

    def blend(leaf):
        a = jax.lax.dynamic_index_in_dim(leaf, i0, 0, keepdims=False)
        b = jax.lax.dynamic_index_in_dim(leaf, i1, 0, keepdims=False)
        return a + (b - a) * w.astype(a.dtype)

    return jax.tree.map(blend, series)


def forcing_record(series: BGCForcing, index) -> BGCForcing:
    """Select record ``index`` (no interpolation — 'hold' mode)."""
    return jax.tree.map(
        lambda leaf: jax.lax.dynamic_index_in_dim(
            leaf, jnp.asarray(index, jnp.int32), 0, keepdims=False),
        series)


def stack_forcings(records) -> BGCForcing:
    """Build a series from a sequence of per-record BGCForcing pytrees."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *records)


def run_forced(
    state: CoupledState,
    grid: ColumnGrid,
    series: BGCForcing,
    params: ModelParams,
    dt: float,
    nsteps: int,
    record_dt: float,
    *,
    interp: str = "linear",
    t0: float = 0.0,
    compute_diags: bool = False,
    tavg_fields=None,
    carbonate_impl: str = "auto",
):
    """Integrate ``nsteps`` under a time-varying forcing series.

    ``record_dt`` is the spacing (s) between consecutive forcing records;
    step ``i`` uses the forcing at model time ``t0 + (i + 1/2) * dt``
    (midpoint sampling, the standard host-coupling convention).
    ``interp``: "linear" blends the bracketing records, "hold" uses the
    nearest earlier record.

    Returns ``(final state, diags)`` where ``diags`` belong to the final
    step taken (its update is used — no extra evaluation).  With
    ``tavg_fields`` (see :func:`ocean_bgc_tpu.models.coupled.run`)
    returns ``(final state, diags, TavgState)`` with the selected
    diagnostics time-averaged inside the compiled scan.
    """
    from ocean_bgc_tpu.models.coupled import _tavg_sums0
    from ocean_bgc_tpu.utils.history import TavgState

    if interp not in ("linear", "hold"):
        raise ValueError(f"unknown interp mode {interp!r}")

    track = tuple(tavg_fields) if tavg_fields is not None else ()

    def forcing_for(i):
        t = (t0 + (i + 0.5) * dt) / record_dt
        if interp == "linear":
            return forcing_at(series, t)
        return forcing_record(
            series, jnp.floor(jnp.clip(
                t, 0, jax.tree.leaves(series)[0].shape[0] - 1)
            ).astype(jnp.int32))

    def one_step(s, i, want_diags):
        return step(s, grid, forcing_for(i), params, dt,
                    compute_diags=want_diags,
                    carbonate_impl=carbonate_impl)

    sums0 = (_tavg_sums0(track, state, lambda s: one_step(s, 0, True))
             if track else {})

    emit_final = compute_diags and nsteps >= 1
    nscan = nsteps - 1 if emit_final else nsteps

    def body(carry, i):
        s, sums = carry
        s2, d = one_step(s, i, bool(track))
        return (s2, {n: sums[n] + d[n] for n in track}), None

    (final, sums), _ = jax.lax.scan(body, (state, sums0),
                                    jnp.arange(nscan))
    diags: Dict[str, jax.Array] = {}
    if emit_final:
        final, diags = one_step(final, nsteps - 1, True)
        sums = {n: sums[n] + diags[n] for n in track}

    if track:
        tavg = TavgState(sums=sums, count=jnp.asarray(nsteps, jnp.int32))
        return final, diags, tavg
    return final, diags


def save_forcing_series(path: str, series: BGCForcing, *,
                        record_dt: float) -> str:
    """Write a forcing series as NetCDF with ``time`` as the UNLIMITED
    record dimension (readable by any netCDF tool and by
    :func:`load_forcing_series`)."""
    import numpy as np

    from ocean_bgc_tpu.io import netcdf3 as nc

    leaves = {f.name: np.asarray(getattr(series, f.name))
              for f in dataclasses.fields(BGCForcing)}
    t, rest = next(iter(leaves.values())).shape[0], None
    sample = leaves["potential_temperature"]    # (T, nlev, ncol)
    nlev, ncol = sample.shape[1], sample.shape[2]
    ntrc = leaves["deposition_flux"].shape[1]

    ds = nc.Dataset()
    ds.dims = {"time": 0, "nlev": nlev, "ncol": ncol, "bgc_tracer": ntrc}
    ds.record_dim = "time"
    ds.attrs = {"title": "ocean_bgc_tpu forcing series",
                "record_dt_seconds": float(record_dt)}
    for name, a in leaves.items():
        if a.shape[1:] == (nlev, ncol):
            dims = ("time", "nlev", "ncol")
        elif a.shape[1:] == (ncol,):
            dims = ("time", "ncol")
        elif a.shape[1:] == (ntrc, ncol):
            dims = ("time", "bgc_tracer", "ncol")
        else:
            raise ValueError(f"{name}: unexpected shape {a.shape}")
        ds.variables[f"forcing_{name}"] = nc.Variable(dims, a)
    nc.write(path, ds)
    return path


def load_forcing_series(path: str, *, dtype=None):
    """Read a series written by :func:`save_forcing_series`.
    Returns (series, record_dt_seconds)."""
    from ocean_bgc_tpu.io import netcdf3 as nc

    ds = nc.read(path)
    kw = {}
    for f in dataclasses.fields(BGCForcing):
        v = ds.variables[f"forcing_{f.name}"].data
        if dtype is not None and v.dtype.kind == "f":
            v = v.astype(dtype)
        kw[f.name] = jnp.asarray(v)
    return BGCForcing(**kw), float(ds.attrs["record_dt_seconds"])
