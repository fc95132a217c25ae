from ocean_bgc_tpu.utils import synthetic  # noqa: F401
