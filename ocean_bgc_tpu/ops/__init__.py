from ocean_bgc_tpu.ops import carbonate, par, schmidt  # noqa: F401
