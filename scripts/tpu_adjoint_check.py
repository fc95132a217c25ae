"""Cross-platform hardware check of the trajectory adjoint.

TPU "float64" is double-float emulation with only float32's exponent
range (CLAUDE.md; measured round 3: an in-range-on-CPU 1e-65 product
flushed to zero on chip).  The backward pass introduces intermediates
(cotangents, VJP residuals) that the CPU suite cannot range-check, so
the adjoint needs its own on-hardware measurement: this script computes
a multi-parameter trajectory gradient (models/adjoint.py::
parameter_sensitivities, remat on) and the calibration objective's
value/grad on whatever platform JAX selects, and prints them at full
precision for cross-platform comparison.

Usage (results recorded in docs/BENCHMARKS.md round 3):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_adjoint_check.py          # axon TPU
  OBGC_PLATFORM=cpu PYTHONPATH=... python scripts/tpu_adjoint_check.py                # host CPU
"""

import os
import time

import jax

if os.environ.get("OBGC_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["OBGC_PLATFORM"])

import jax.numpy as jnp  # noqa: E402

import ocean_bgc_tpu  # noqa: E402,F401  (enables x64)
from ocean_bgc_tpu.models.adjoint import (  # noqa: E402
    parameter_sensitivities,
)
from ocean_bgc_tpu.params import ModelParams  # noqa: E402
from ocean_bgc_tpu.state import BGCTracers as BT  # noqa: E402
from ocean_bgc_tpu.utils.synthetic import synthetic_world  # noqa: E402


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    state, grid, forcing = synthetic_world(nlev=20, ncol=512, seed=7)
    template = ModelParams()
    paths = (
        "bgc.parm_kappa_nitrif",
        "bgc.autotrophs[0].PCref",
        "bgc.parm_POC_diss",
        "dms.k_conv",
    )

    def functional(final):
        t = final.bgc.tracers
        return (jnp.mean(t[0, BT.DIC] ** 2) / 1e6
                + jnp.mean(t[:, BT.NO3] ** 2)
                + jnp.mean(final.dms ** 2) * 1e2)

    t0 = time.time()
    sens = parameter_sensitivities(
        template, paths, state, grid, forcing, 3600.0, 3, functional)
    # scalar readback is the airtight sync on the axon relay
    print(f"sensitivities ({time.time() - t0:.1f}s incl. compile):",
          flush=True)
    for p, v in sens.items():
        print(f"  {p}: {v!r}", flush=True)
    import numpy as np
    assert all(np.isfinite(v) for v in sens.values()), sens
    print("all finite: True", flush=True)


if __name__ == "__main__":
    main()
