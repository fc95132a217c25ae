"""Time-averaged history output — the host model's "tavg" layer.

The reference registers its diagnostics for the host's time-averaged
history files (the tavg comments in BGC_mod.F90:1794 "various tavg/history
variables"); the host does the averaging and IO.  This module supplies
that layer: a jit-compatible running accumulator over selected diagnostics
plus a portable .npz writer with the registry metadata attached.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ocean_bgc_tpu.utils.diag import coupled_registry


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TavgState:
    """Running sums of selected diagnostics + the sample count."""

    sums: Dict[str, jax.Array]
    count: jax.Array     # scalar int32

    @staticmethod
    def create(template: Dict[str, jax.Array],
               fields: Optional[Sequence[str]] = None) -> "TavgState":
        names = list(fields) if fields is not None else list(template)
        missing = set(names) - set(template)
        if missing:
            raise KeyError(f"unknown diagnostics: {sorted(missing)}")
        return TavgState(
            sums={n: jnp.zeros_like(template[n]) for n in names},
            count=jnp.zeros((), jnp.int32))

    def accumulate(self, diags: Dict[str, jax.Array]) -> "TavgState":
        return TavgState(
            sums={n: s + diags[n] for n, s in self.sums.items()},
            count=self.count + 1)

    def means(self) -> Dict[str, jax.Array]:
        c = jnp.maximum(self.count, 1).astype(
            next(iter(self.sums.values())).dtype if self.sums else
            jnp.float64)
        return {n: s / c for n, s in self.sums.items()}

    def reset(self) -> "TavgState":
        return TavgState(
            sums={n: jnp.zeros_like(s) for n, s in self.sums.items()},
            count=jnp.zeros((), jnp.int32))


def write_history(path: str, tavg: TavgState, *,
                  attrs: Optional[Dict[str, str]] = None) -> str:
    """Write the current means to ``path`` (.npz) with units/long-name
    metadata from the diagnostics registry."""
    registry = coupled_registry()
    means = {n: np.asarray(v) for n, v in tavg.means().items()}
    meta = {}
    for n in means:
        spec = registry.get(n)
        if spec is not None:
            meta[f"__units__{n}"] = np.str_(spec.units)
            meta[f"__desc__{n}"] = np.str_(spec.description)
    if attrs:
        meta.update({f"__attr__{k}": np.str_(v) for k, v in attrs.items()})
    path = path if path.endswith(".npz") else path + ".npz"
    np.savez(path, __count__=np.asarray(tavg.count), **means, **meta)
    return path


def read_history(path: str):
    """Returns (means dict, count, metadata dict)."""
    with np.load(path) as f:
        count = int(f["__count__"])
        means, meta = {}, {}
        for k in f.files:
            if k == "__count__":
                continue
            if k.startswith("__"):
                meta[k] = str(f[k])
            else:
                means[k] = f[k]
    return means, count, meta
