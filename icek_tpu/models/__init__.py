"""icek_tpu.models — see the module docstrings within."""
