"""icek_tpu.train — see the module docstrings within."""
