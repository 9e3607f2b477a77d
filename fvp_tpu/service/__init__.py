from fvp_tpu.service.pipeline import ServiceConfig, run_service  # noqa: F401
