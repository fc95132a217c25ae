"""Checkpoint / resume for the coupled model state.

The reference delegates restart to its host model; the restart payload is
exactly the tracer fields plus the pH warm-start fields (SURVEY.md par.5:
PH_PREV_3D / PH_PREV_ALT_CO2_3D / surface_pH / surface_pH_alt_co2, with
pH == 0 meaning "no previous solution").  Here that payload is one pytree
(:class:`~ocean_bgc_tpu.models.coupled.CoupledState`) written with orbax
when available, with a portable NumPy ``.npz`` fallback.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ocean_bgc_tpu.models.coupled import CoupledState
from ocean_bgc_tpu.state import BGCState

try:  # orbax is baked into the image but keep the fallback honest
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

_FIELDS = (
    "tracers", "ph_prev_3d", "ph_prev_alt_3d", "surface_ph",
    "surface_ph_alt", "dms", "macros",
)


def _flatten(state: CoupledState):
    return {
        "tracers": state.bgc.tracers,
        "ph_prev_3d": state.bgc.ph_prev_3d,
        "ph_prev_alt_3d": state.bgc.ph_prev_alt_3d,
        "surface_ph": state.bgc.surface_ph,
        "surface_ph_alt": state.bgc.surface_ph_alt,
        "dms": state.dms,
        "macros": state.macros,
    }


def _unflatten(d) -> CoupledState:
    return CoupledState(
        bgc=BGCState(
            tracers=jnp.asarray(d["tracers"]),
            ph_prev_3d=jnp.asarray(d["ph_prev_3d"]),
            ph_prev_alt_3d=jnp.asarray(d["ph_prev_alt_3d"]),
            surface_ph=jnp.asarray(d["surface_ph"]),
            surface_ph_alt=jnp.asarray(d["surface_ph_alt"]),
        ),
        dms=jnp.asarray(d["dms"]),
        macros=jnp.asarray(d["macros"]),
    )


def save(path: str, state: CoupledState, *, step: Optional[int] = None,
         use_orbax: Optional[bool] = None) -> str:
    """Write a checkpoint; returns the path written."""
    if use_orbax is None:
        use_orbax = _HAS_ORBAX
    flat = jax.tree.map(np.asarray, _flatten(state))
    if step is not None:
        flat["__step__"] = np.asarray(step)
    if use_orbax:
        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, flat, force=True)
        return path
    path = path if path.endswith(".npz") else path + ".npz"
    np.savez(path, **flat)
    return path


def restore(path: str, *, use_orbax: Optional[bool] = None):
    """Read a checkpoint; returns (state, step-or-None)."""
    if use_orbax is None:
        use_orbax = _HAS_ORBAX and os.path.isdir(path)
    if use_orbax:
        ckptr = ocp.PyTreeCheckpointer()
        flat = ckptr.restore(os.path.abspath(path))
    else:
        if not os.path.exists(path) and os.path.exists(path + ".npz"):
            path = path + ".npz"
        with np.load(path) as f:
            flat = {k: f[k] for k in f.files}
    step = flat.pop("__step__", None)
    state = _unflatten(flat)
    return state, (int(step) if step is not None else None)
