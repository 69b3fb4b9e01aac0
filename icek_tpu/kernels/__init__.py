"""icek_tpu.kernels — see the module docstrings within."""
