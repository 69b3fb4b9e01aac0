"""Pallas kernel correctness (interpret mode on CPU, compiled on TPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp


def _run_fused(h, wv, bv, tail, k):
    from jax.experimental.pallas import tpu as pltpu

    from icek_tpu.kernels import copy_scores as cs

    if jax.default_backend() == "cpu":
        with pltpu.force_tpu_interpret_mode():
            return cs.fused_score_topk(h, wv, bv, tail, k=k)
    return cs.fused_score_topk(h, wv, bv, tail, k=k)


@pytest.mark.parametrize("k", [2, 5])
@pytest.mark.parametrize("v", [1000, 1537])
def test_fused_score_topk_matches_oracle(rng, k, v):
    from icek_tpu.kernels import copy_scores as cs

    n, d, t = 16, 32, 37
    h = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    wv = jnp.asarray(rng.standard_normal((d, v)).astype(np.float32) * 0.1)
    bv = jnp.asarray(rng.standard_normal((v,)).astype(np.float32) * 0.01)
    tail = jnp.asarray(rng.standard_normal((n, t)).astype(np.float32))
    want_v, want_i, want_lse = cs.reference_score_topk(h, wv, bv, tail, k=k)
    got_v, got_i, got_lse = _run_fused(h, wv, bv, tail, k)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_lse), np.asarray(want_lse), atol=1e-4)


def test_fused_score_topk_tail_winner(rng):
    """Top entry living in the tail (entity/fact pointer) is found."""
    from icek_tpu.kernels import copy_scores as cs

    n, d, v, t = 8, 16, 600, 21
    h = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32) * 0.01)
    wv = jnp.zeros((d, v), jnp.float32)
    bv = jnp.zeros((v,), jnp.float32)
    tail = jnp.full((n, t), -1.0, jnp.float32)
    tail = tail.at[:, 7].set(5.0)
    got_v, got_i, _ = _run_fused(h, wv, bv, tail, 2)
    assert np.all(np.asarray(got_i)[:, 0] == v + 7)
    np.testing.assert_allclose(np.asarray(got_v)[:, 0], 5.0, atol=1e-5)


def test_fused_score_topk_tie_breaking(rng):
    """Exact ties resolve to the lowest flat index, like lax.top_k."""
    from icek_tpu.kernels import copy_scores as cs

    n, d, v, t = 4, 8, 520, 16
    h = jnp.zeros((n, d), jnp.float32)
    wv = jnp.zeros((d, v), jnp.float32)
    bv = jnp.zeros((v,), jnp.float32).at[3].set(2.0).at[400].set(2.0)
    tail = jnp.zeros((n, t), jnp.float32).at[:, 2].set(2.0)
    want_v, want_i, _ = cs.reference_score_topk(h, wv, bv, tail, k=3)
    got_v, got_i, _ = _run_fused(h, wv, bv, tail, 3)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
