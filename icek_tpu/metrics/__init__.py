"""icek_tpu.metrics — see the module docstrings within."""
