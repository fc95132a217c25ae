from ocean_bgc_tpu.models import coupled  # noqa: F401
