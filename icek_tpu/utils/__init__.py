"""icek_tpu.utils — see the module docstrings within."""
