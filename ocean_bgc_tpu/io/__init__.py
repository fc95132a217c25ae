from ocean_bgc_tpu.io import host_layout  # noqa: F401
