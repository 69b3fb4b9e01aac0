"""icek_tpu.decode — see the module docstrings within."""
