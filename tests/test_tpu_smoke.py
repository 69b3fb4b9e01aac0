"""Production-shape decode smoke tests — run only on a real accelerator
(ICEK_TPU_TESTS=1); skipped in the CPU suite."""

import os

import numpy as np
import pytest

if not os.environ.get("ICEK_TPU_TESTS"):
    pytest.skip("TPU-only smoke tests (set ICEK_TPU_TESTS=1)",
                allow_module_level=True)

import jax
import jax.numpy as jnp

from icek_tpu.core import config as config_lib
from icek_tpu.decode import beam as beam_lib
from icek_tpu.decode import greedy as greedy_lib
from icek_tpu.models import captioner


def test_production_shape_beam_decode_deterministic():
    cfg = config_lib.georic()
    V, E, B, L = 10000, 301, 64, 30
    dt = jnp.bfloat16
    params = captioner.init_captioner_params(jax.random.PRNGKey(0), cfg.model, V)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.standard_normal((B, 196, 300)).astype(np.float32))
    ents = np.zeros((B, E, 5), np.float32)
    ents[:, :, 0] = np.arange(E)
    ents[:, :, 4] = rng.integers(0, 900, (B, E))
    ctx = greedy_lib.prepare_decode_context(
        params, cfg.model, tokens, jnp.asarray(ents), compute_dtype=dt
    )
    out1, _ = beam_lib.beam_decode(
        params, cfg.model, V, E, V - 2, V - 1, 0, ctx, L, beam_size=5,
        compute_dtype=dt,
    )
    out2, _ = beam_lib.beam_decode(
        params, cfg.model, V, E, V - 2, V - 1, 0, ctx, L, beam_size=5,
        compute_dtype=dt,
    )
    out1, out2 = np.asarray(out1), np.asarray(out2)
    np.testing.assert_array_equal(out1, out2)  # decode is deterministic
    assert out1.min() >= 0 and out1.max() < V + E  # ids in range
    greedy_out = np.asarray(
        greedy_lib.greedy_decode(
            params, cfg.model, V, E, V - 2, V - 1, 0, ctx, L, compute_dtype=dt
        )
    )
    assert greedy_out.shape == (B, L)
    assert greedy_out.max() < V + E
