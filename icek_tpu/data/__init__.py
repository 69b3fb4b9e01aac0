"""icek_tpu.data — see the module docstrings within."""
