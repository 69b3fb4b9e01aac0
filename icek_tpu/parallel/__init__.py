"""icek_tpu.parallel — see the module docstrings within."""
