from icek_tpu.serve.engine import ServeStats, ServingEngine  # noqa: F401
