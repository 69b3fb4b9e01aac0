"""icek_tpu.core — see the module docstrings within."""
