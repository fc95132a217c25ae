from ocean_bgc_tpu.models import coupled, forcing_series, integrators  # noqa: F401
