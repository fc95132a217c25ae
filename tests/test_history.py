"""Time-averaged history accumulation and IO; distributed helpers."""

import numpy as np

import ocean_bgc_tpu  # noqa: F401
import jax

from ocean_bgc_tpu.models.coupled import step
from ocean_bgc_tpu.params import ModelParams
from ocean_bgc_tpu.parallel import distributed as dist
from ocean_bgc_tpu.parallel import make_mesh, shard_world
from ocean_bgc_tpu.utils.history import (TavgState, read_history,
                                         write_history)
from ocean_bgc_tpu.utils.synthetic import synthetic_world


def test_tavg_accumulates_means(tmp_path):
    state, grid, forcing = synthetic_world(nlev=5, ncol=6, seed=81)
    params = ModelParams()
    fields = ("photoC_TOT", "pH_3D", "Jint_Ctot", "pco2surf")

    s, diags = step(state, grid, forcing, params, 3600.0)
    tavg = TavgState.create(diags, fields)

    @jax.jit
    def advance(s, tavg):
        s2, d = step(s, grid, forcing, params, 3600.0)
        return s2, tavg.accumulate(d)

    collected = []
    for _ in range(4):
        s, tavg = advance(s, tavg)
        collected.append(None)
    assert int(tavg.count) == 4

    # means equal the arithmetic mean of the per-step diags
    s_chk, d1 = step(state, grid, forcing, params, 3600.0)
    manual = {n: np.zeros_like(np.asarray(d1[n])) for n in fields}
    sc = s_chk
    for _ in range(4):
        sc, d = step(sc, grid, forcing, params, 3600.0)
        for n in fields:
            manual[n] += np.asarray(d[n])
    means = {n: np.asarray(v) for n, v in tavg.means().items()}
    for n in fields:
        # atol floor: Jint_* are ~1e-18 conservation-residual zeros
        np.testing.assert_allclose(means[n], manual[n] / 4, rtol=1e-12,
                                   atol=1e-15)

    path = write_history(str(tmp_path / "hist"), tavg,
                         attrs={"run": "test"})
    means2, count, meta = read_history(path)
    assert count == 4
    np.testing.assert_allclose(means2["photoC_TOT"], means["photoC_TOT"])
    assert meta["__units__pH_3D"] == "pH"
    assert meta["__attr__run"] == "test"

    reset = tavg.reset()
    assert int(reset.count) == 0
    assert float(np.abs(np.asarray(reset.sums["pH_3D"])).max()) == 0.0


def test_tavg_rejects_unknown_fields():
    state, grid, forcing = synthetic_world(nlev=4, ncol=4, seed=82)
    _, diags = step(state, grid, forcing, ModelParams(), 3600.0)
    import pytest
    with pytest.raises(KeyError):
        TavgState.create(diags, ["nope"])


def test_host_local_columns_single_process():
    mesh = make_mesh()
    lo, hi = dist.host_local_columns(64, mesh)
    assert (lo, hi) == (0, 64)   # single process owns everything


def test_host_local_to_global_roundtrip():
    state, grid, forcing = synthetic_world(nlev=4, ncol=32, seed=83)
    mesh = make_mesh()
    g = dist.host_local_to_global(
        {"x": np.asarray(state.bgc.tracers)}, mesh, 32)
    np.testing.assert_array_equal(np.asarray(g["x"]),
                                  np.asarray(state.bgc.tracers))
