from ocean_bgc_tpu.models import (  # noqa: F401
    adjoint,
    chunked,
    coupled,
    forcing_series,
    integrators,
)
