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


def test_flash_dropout_statistics():
    """In-kernel PRNG attention-weight dropout: drop rate matches, survivors
    are scaled by 1/(1-rate), output is deterministic for a fixed seed.

    v is a (Tk x Hd) basis so the output reads the dropped weight matrix
    directly: O[b,q,h,t] = dropout(P)[b,h,q,t] for t < Tk <= Hd.
    """
    from icek_tpu.kernels import flash_attention as fa

    rng = np.random.default_rng(0)
    B, Tq, Tk, H, Hd, rate = 4, 64, 24, 10, 30, 0.2
    q = jnp.asarray(rng.standard_normal((B, Tq, H, Hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Tk, H, Hd)).astype(np.float32))
    v = jnp.broadcast_to(
        jnp.eye(Tk, Hd, dtype=jnp.float32)[None, :, None, :], (B, Tk, H, Hd)
    )
    seed = jnp.array([1234], jnp.int32)
    p = np.asarray(fa.flash_mha(q, k, v))[..., :Tk]          # rate 0: raw P
    pd = np.asarray(fa.flash_mha(q, k, v, dropout_rate=rate, seed=seed))[..., :Tk]
    pd2 = np.asarray(fa.flash_mha(q, k, v, dropout_rate=rate, seed=seed))[..., :Tk]
    np.testing.assert_array_equal(pd, pd2)                    # deterministic
    assert (p > 0).all()                                      # softmax is positive
    drop_frac = (pd == 0).mean()
    assert abs(drop_frac - rate) < 0.01, drop_frac
    survivors = pd != 0
    np.testing.assert_allclose(
        pd[survivors], (p / (1.0 - rate))[survivors], rtol=1e-5
    )
    # a different seed gives a different mask
    pd3 = np.asarray(
        fa.flash_mha(q, k, v, dropout_rate=rate, seed=jnp.array([99], jnp.int32))
    )[..., :Tk]
    assert (pd3 == 0).mean() > 0.1 and ((pd3 == 0) != (pd == 0)).mean() > 0.1


def test_flash_dropout_fwd_bwd_mask_consistency():
    """The backward kernel regenerates the forward's exact dropout mask.

    The output is linear in v for a fixed mask, so <f(v), g> == <v, df/dv(g)>
    holds exactly iff fwd and bwd saw the same mask.
    """
    from icek_tpu.kernels import flash_attention as fa

    rng = np.random.default_rng(1)
    B, Tq, Tk, H, Hd, rate = 2, 32, 301, 10, 30, 0.3
    q = jnp.asarray(rng.standard_normal((B, Tq, H, Hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Tk, H, Hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Tk, H, Hd)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((B, Tq, H, Hd)).astype(np.float32))
    seed = jnp.array([7], jnp.int32)

    f = lambda vv: fa.flash_mha(q, k, vv, dropout_rate=rate, seed=seed)
    out, vjp = jax.vjp(f, v)
    (dv,) = vjp(g)
    lhs = float(jnp.sum(out * g))
    rhs = float(jnp.sum(v * dv))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)
