"""The drop-in host-coupling API (reference entry-point surface)."""

import numpy as np

import ocean_bgc_tpu  # noqa: F401
from ocean_bgc_tpu import host_api
from ocean_bgc_tpu.state import BGCTracers as BT


def _host_world(rng, ncol=6, nlev=8):
    dz = rng.uniform(500.0, 4000.0, (ncol, nlev))
    zbot = np.cumsum(dz, axis=1)
    zcen = zbot - 0.5 * dz
    trc = rng.uniform(0.0, 3.0, (ncol, nlev, 30))
    trc[..., BT.DIC] = rng.uniform(1800, 2400, (ncol, nlev))
    trc[..., BT.ALK] = rng.uniform(2000, 2500, (ncol, nlev))
    trc[..., BT.O2] = rng.uniform(0, 350, (ncol, nlev))
    kmax = rng.integers(1, nlev + 1, ncol).astype(np.int32)
    return dict(dz=dz, zbot=zbot, zcen=zcen, trc=trc, kmax=kmax)


def test_metadata_entry_points():
    meta = host_api.bgc_init()
    assert len(meta.short_name) == host_api.BGC_tracer_cnt == 30
    assert meta.units[8] == "meq/m^3"          # ALK
    assert host_api.DMS_tracer_cnt == 14
    assert host_api.MACROS_tracer_cnt == 8
    params = host_api.bgc_parms_init(parm_Fe_bioavail=0.5)
    assert params.parm_Fe_bioavail == 0.5


def test_bgc_source_sink_host_layout(rng):
    w = _host_world(rng)
    ncol, nlev = w["dz"].shape
    out = host_api.BGC_SourceSink(
        BGC_tracers=w["trc"],
        PotentialTemperature=rng.uniform(-1, 30, (ncol, nlev)),
        Salinity=rng.uniform(32, 36, (ncol, nlev)),
        cell_center_depth=w["zcen"], cell_thickness=w["dz"],
        cell_bottom_depth=w["zbot"],
        cell_latitude=rng.uniform(-70, 70, ncol),
        number_of_active_levels=w["kmax"],
        dust_FLUX_IN=rng.uniform(0, 1e-9, ncol),
        ShortWaveFlux_surface=rng.uniform(0, 300, ncol),
    )
    tend = out["BGC_tendencies"]
    assert tend.shape == (ncol, nlev, 30)
    assert np.isfinite(tend).all()
    # host layout honored: padded levels are zero per column
    for c in range(ncol):
        assert (tend[c, w["kmax"][c]:, :] == 0.0).all()
    assert out["PH_PREV_3D"].shape == (ncol, nlev)
    assert np.isfinite(out["PH_PREV_3D"]).all()


def test_surface_and_trace_gas_entry_points(rng):
    w = _host_world(rng)
    ncol, nlev = w["dz"].shape
    sst = rng.uniform(-1, 29, ncol)
    sss = rng.uniform(32, 37, ncol)
    out = host_api.BGC_SurfaceFluxes(
        BGC_tracers=w["trc"], SST=sst, SSS=sss,
        surfacePressure=np.ones(ncol), iceFraction=np.zeros(ncol),
        windSpeedSquared10m=rng.uniform(0, 2e6, ncol),
        atmCO2=np.full(ncol, 415.0), atmCO2_ALT_CO2=np.full(ncol, 284.0),
        surfaceDepth=np.zeros(ncol),
    )
    assert out["netFlux"].shape == (ncol, 30)
    assert (np.abs(out["netFlux"][:, BT.O2]) > 0).any()
    assert (out["surface_pH"] > 6).all() and (out["surface_pH"] < 10).all()

    dms_trc = rng.uniform(0, 1, (ncol, nlev, 14))
    out2 = host_api.DMS_SourceSink(
        DMS_tracers=dms_trc, cell_thickness=w["dz"],
        number_of_active_levels=w["kmax"], SST=sst,
        ShortWaveFlux_surface=rng.uniform(0, 300, ncol))
    assert out2["DMS_tendencies"].shape == (ncol, nlev, 14)

    out3 = host_api.DMS_SurfaceFluxes(
        DMS_tracers=dms_trc, SST=sst, SSS=sss,
        iceFraction=np.zeros(ncol),
        windSpeedSquared10m=rng.uniform(0, 2e6, ncol),
        surfacePressure=np.ones(ncol))
    assert (out3["netFlux_dms"] <= 0).all()   # outgassing only (sat = 0)
    assert (out3["netFlux_dmsp"] == 0).all()

    out4 = host_api.MACROS_SourceSink(
        MACROS_tracers=rng.uniform(0, 2, (ncol, nlev, 8)),
        number_of_active_levels=w["kmax"])
    assert out4["MACROS_tendencies"].shape == (ncol, nlev, 8)
    assert np.isfinite(out4["MACROS_tendencies"]).all()
