from ocean_bgc_tpu.ops import carbonate, schmidt  # noqa: F401
