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


# ---------------------------------------------------------------------------
# Fused training attention (kernels/flash_attention.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("tq,tk", [(17, 17), (13, 37), (30, 301)])
def test_flash_mha_matches_oracle(rng, causal, tq, tk):
    """Deterministic fwd + bwd vs the pure-XLA oracle (interpret on CPU)."""
    from icek_tpu.kernels import flash_attention as fa

    B, H, Hd = 2, 3, 30
    q = jnp.asarray(rng.standard_normal((B, tq, H, Hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, tk, H, Hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, tk, H, Hd)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((B, tq, H, Hd)).astype(np.float32))
    out = fa.flash_mha(q, k, v, causal=causal)
    want = fa.reference_mha(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)

    grads = jax.grad(
        lambda *a: jnp.sum(fa.flash_mha(*a, causal=causal) * g), argnums=(0, 1, 2)
    )(q, k, v)
    wants = jax.grad(
        lambda *a: jnp.sum(fa.reference_mha(*a, causal=causal) * g),
        argnums=(0, 1, 2),
    )(q, k, v)
    for got_g, want_g in zip(grads, wants):
        np.testing.assert_allclose(
            np.asarray(got_g), np.asarray(want_g), atol=5e-5
        )


def test_flash_mha_bf16(rng):
    from icek_tpu.kernels import flash_attention as fa

    B, T, H, Hd = 2, 21, 2, 30
    mk = lambda: jnp.asarray(
        rng.standard_normal((B, T, H, Hd)).astype(np.float32)
    ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    out = fa.flash_mha(q, k, v)
    want = fa.reference_mha(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32), atol=0.05
    )


@pytest.mark.parametrize("slot", [32, 64, 128])
def test_flash_mha_grouped_slots_match_oracle(rng, slot):
    """Explicit slot widths (ICEK_FLASH_SLOT values) at the production head
    geometry (H=10, Hd=30: slot=32 packs 4 heads per 128-lane block with 2
    dummy heads of lane padding) — fwd and all grads vs the oracle."""
    from icek_tpu.kernels import flash_attention as fa

    B, tq, tk, H, Hd = 2, 19, 31, 10, 30
    q = jnp.asarray(rng.standard_normal((B, tq, H, Hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, tk, H, Hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, tk, H, Hd)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((B, tq, H, Hd)).astype(np.float32))
    out = fa.flash_mha(q, k, v, slot=slot)
    want = fa.reference_mha(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)
    grads = jax.grad(
        lambda *a: jnp.sum(fa.flash_mha(*a, slot=slot) * g), argnums=(0, 1, 2)
    )(q, k, v)
    wants = jax.grad(
        lambda *a: jnp.sum(fa.reference_mha(*a) * g), argnums=(0, 1, 2)
    )(q, k, v)
    for got_g, want_g in zip(grads, wants):
        np.testing.assert_allclose(
            np.asarray(got_g), np.asarray(want_g), atol=5e-5
        )


@pytest.mark.parametrize("variant", ["geo", "knowledge"])
def test_flash_captioner_forward_matches_stock(rng, variant):
    """captioner_forward with the flash path on (deterministic) equals the
    stock attention path on the full model, both context-encoder variants."""
    import dataclasses

    from icek_tpu.core import config as config_lib
    from icek_tpu.models import captioner as cap

    cfg = (config_lib.georic() if variant == "geo" else config_lib.k_georic()).model
    cfg_small = dataclasses.replace(cfg, emb_dim=40, num_heads=4,
                                    decoder_ffn_dim=64, encoder_ffn_dim=64,
                                    num_layers=2, type_vocab=50,
                                    num_predicates=20 if cfg.has_facts else 0)
    V, E, F, B, T = 60, 9, 5, 2, 7
    params = cap.init_captioner_params(jax.random.PRNGKey(0), cfg_small, V)
    tokens = jnp.asarray(rng.standard_normal((B, 12, 40)).astype(np.float32))
    ents = np.zeros((B, E, 5), np.float32)
    ents[:, :, 0] = np.arange(E)
    ents[:, :, 4] = rng.integers(0, 50, (B, E))
    facts = None
    if cfg_small.has_facts:
        facts = np.zeros((B, F, 3), np.float32)
        facts[:, :, 0] = np.arange(F)
        facts[:, :, 1] = rng.integers(0, E, (B, F))
        facts[:, :, 2] = rng.integers(0, 20, (B, F))
        facts = jnp.asarray(facts)
    caps = jnp.asarray(rng.integers(1, V, (B, T)).astype(np.int32))
    mask = jnp.zeros((B, T), jnp.int32)

    def fwd(flash):
        c = dataclasses.replace(cfg_small, use_flash_attention=flash)
        return cap.captioner_forward(
            params, c, V, 0, caps, mask, tokens, jnp.asarray(ents), facts,
            deterministic=True,
        )

    np.testing.assert_allclose(
        np.asarray(fwd(True)), np.asarray(fwd(False)), atol=3e-5
    )


def test_resolve_flash_rules():
    """Config flag forces either way; auto (None) keys on the backend only —
    flash serves both training and the deterministic context-encode/
    validation passes (the decode loop bypasses it via its KV-cache paths)."""
    import dataclasses

    from icek_tpu.core import config as config_lib
    from icek_tpu.models import captioner as cap

    cfg = config_lib.georic().model
    for det in (True, False):
        assert cap.resolve_flash(
            dataclasses.replace(cfg, use_flash_attention=True), det)
        assert not cap.resolve_flash(
            dataclasses.replace(cfg, use_flash_attention=False), det)
        auto = cap.resolve_flash(
            dataclasses.replace(cfg, use_flash_attention=None), det)
        assert auto == (jax.default_backend() == "tpu")


# ---------------------------------------------------------------------------
# Fused decoder-step megakernel (kernels/decoder_step.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("variant,beam", [("geo", 3), ("knowledge", 5)])
def test_megakernel_beam_decode_matches_stock(rng, variant, beam):
    """Full beam_decode with the fused decoder-step Pallas kernel (interpret
    mode on CPU) vs the stock XLA step: token-exact, scores to 1e-4."""
    import dataclasses

    from icek_tpu.core import config as config_lib
    from icek_tpu.decode import beam as beam_lib
    from icek_tpu.decode import greedy as greedy_lib
    from icek_tpu.models import captioner as cap

    base = config_lib.georic() if variant == "geo" else config_lib.k_georic()
    cfg = dataclasses.replace(
        base.model, emb_dim=16, num_heads=2, decoder_ffn_dim=24,
        encoder_ffn_dim=24, num_layers=2, type_vocab=20,
        num_predicates=8 if base.model.has_facts else 0,
        dropout_dec=0.0, dropout_enc=0.0, dropout_pos=0.0,
    )
    V, E, F, B = 30, 5, 4, 2
    params = cap.init_captioner_params(jax.random.PRNGKey(1), cfg, V)
    ents = np.zeros((B, E, 5), np.float32)
    ents[:, :, 0] = np.arange(E)
    ents[:, :, 1:4] = rng.uniform(0, 1, (B, E, 3))
    ents[:, :, 4] = rng.integers(0, 20, (B, E))
    facts = None
    if cfg.has_facts:
        facts = np.zeros((B, F, 3), np.float32)
        facts[:, :, 1] = rng.integers(0, E, (B, F))
        facts[:, :, 2] = rng.integers(0, 8, (B, F))
        facts = jnp.asarray(facts)
    tokens = jnp.asarray(rng.standard_normal((B, 8, 16)).astype(np.float32))
    ctx = greedy_lib.prepare_decode_context(
        params, cfg, tokens, jnp.asarray(ents), facts
    )
    args = (params, cfg, V, E, V - 2, V - 1, 0, ctx, 7)
    want_t, want_s = beam_lib.beam_decode(
        *args, beam_size=beam, use_megakernel=False
    )
    got_t, got_s = beam_lib.beam_decode(
        *args, beam_size=beam, use_megakernel=True
    )
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(want_s), atol=1e-4
    )


# ---------------------------------------------------------------------------
# int8 KV decode (decode/beam.py kv_dtype="int8")
# ---------------------------------------------------------------------------

def test_quantize_rows_error_bound(rng):
    from icek_tpu.decode import beam as beam_lib

    x = jnp.asarray(rng.standard_normal((4, 7, 40)).astype(np.float32)) * 3.0
    q, scale = beam_lib._quantize_rows(x)
    assert q.dtype == jnp.int8
    deq = q.astype(np.float32) * np.asarray(scale)
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    # symmetric per-row quantization: error <= half a quantization step
    # (+ f32 division rounding slack)
    bound = np.broadcast_to(amax / 127.0 * 0.505 + 1e-6, deq.shape)
    np.testing.assert_array_less(np.abs(deq - np.asarray(x)), bound)


def test_int8_kv_beam_close_to_float(rng):
    """kv_dtype='int8' (serving mode): hypothesis scores stay within
    quantization noise of the float path and tokens mostly agree."""
    import dataclasses

    from icek_tpu.core import config as config_lib
    from icek_tpu.decode import beam as beam_lib
    from icek_tpu.decode import greedy as greedy_lib
    from icek_tpu.models import captioner as cap

    base = config_lib.k_georic()
    cfg = dataclasses.replace(
        base.model, emb_dim=16, num_heads=2, decoder_ffn_dim=24,
        encoder_ffn_dim=24, num_layers=2, type_vocab=20, num_predicates=8,
        dropout_dec=0.0, dropout_enc=0.0, dropout_pos=0.0,
    )
    V, E, F, B = 30, 5, 4, 4
    params = cap.init_captioner_params(jax.random.PRNGKey(1), cfg, V)
    ents = np.zeros((B, E, 5), np.float32)
    ents[:, :, 0] = np.arange(E)
    ents[:, :, 1:4] = rng.uniform(0, 1, (B, E, 3))
    ents[:, :, 4] = rng.integers(0, 20, (B, E))
    facts = np.zeros((B, F, 3), np.float32)
    facts[:, :, 1] = rng.integers(0, E, (B, F))
    facts[:, :, 2] = rng.integers(0, 8, (B, F))
    tokens = jnp.asarray(rng.standard_normal((B, 8, 16)).astype(np.float32))
    ctx = greedy_lib.prepare_decode_context(
        params, cfg, tokens, jnp.asarray(ents), jnp.asarray(facts)
    )
    args = (params, cfg, V, E, V - 2, V - 1, 0, ctx, 7)
    ft, fs = beam_lib.beam_decode(*args, beam_size=5)
    qt, qs = beam_lib.beam_decode(*args, beam_size=5, kv_dtype="int8")
    np.testing.assert_allclose(np.asarray(qs), np.asarray(fs), atol=0.05)
    agree = (np.asarray(qt) == np.asarray(ft)).mean()
    assert agree >= 0.8, agree
    # cross-KV-only quantization (self caches stay float): strictly fewer
    # quantized tensors than full int8, so at least as close to the float
    # path
    ct, cs = beam_lib.beam_decode(*args, beam_size=5, kv_dtype="int8_cross")
    np.testing.assert_allclose(np.asarray(cs), np.asarray(fs), atol=0.05)
    agree_cross = (np.asarray(ct) == np.asarray(ft)).mean()
    assert agree_cross >= agree - 1e-9, (agree_cross, agree)
    with pytest.raises(ValueError):
        beam_lib.beam_decode(*args, beam_size=5, kv_dtype="fp8")


def test_flash_train_step_grads_finite(rng):
    """Flash path: the train step produces finite loss and gradients.
    Dropout rates are zeroed here — interpret-mode (CPU) flash with
    dropout > 0 is rejected (see test_flash_dropout_rejected_on_interpret);
    dropout statistics are TPU-gated (tests/test_tpu_smoke.py)."""
    import dataclasses

    from icek_tpu.core import config as config_lib
    from icek_tpu.models import captioner as cap
    from icek_tpu.train import step as step_lib

    cfg = config_lib.georic()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, emb_dim=40, num_heads=4, decoder_ffn_dim=64,
        encoder_ffn_dim=64, num_layers=1, type_vocab=50,
        use_flash_attention=True,
        dropout_dec=0.0, dropout_enc=0.0, dropout_pos=0.0,
    ))
    V, E, B, T = 60, 9, 2, 7
    params = cap.init_captioner_params(jax.random.PRNGKey(0), cfg.model, V)
    ents = np.zeros((B, E, 5), np.float32)
    ents[:, :, 0] = np.arange(E)
    batch = {
        "caption_ids": jnp.asarray(rng.integers(1, V, (B, T)).astype(np.int32)),
        "caption_mask": jnp.zeros((B, T), jnp.int32),
        "lengths": jnp.full((B,), T, jnp.int32),
        "entity_features": jnp.asarray(ents),
        "image_tokens": jnp.asarray(
            rng.standard_normal((B, 12, 40)).astype(np.float32)
        ),
    }
    optimizer = step_lib.make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    train_step, _ = step_lib.make_train_step(
        cfg, V, 0, optimizer, encode_images=False
    )
    params, opt_state, loss, count = train_step(
        params, opt_state, None, batch, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(loss))
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(params)
    )


def test_flash_dropout_rejected_on_interpret():
    """Interpret-mode (CPU) flash with dropout_rate > 0 must raise: the
    interpreter's prng_random_bits returns zeros, which would keep every
    weight yet still scale by 1/(1-rate) — silently inflated attention."""
    from icek_tpu.kernels import flash_attention as fa

    q = jnp.zeros((1, 4, fa.LANE), jnp.float32)
    with pytest.raises(ValueError, match="Mosaic interpreter"):
        fa.flash_mha_packed(
            q, q, q, head_dim=8, dropout_rate=0.2,
            seed=jnp.zeros((1,), jnp.int32), interpret=True,
        )


def test_fused_norm_matches_stock_layer_norm(rng):
    """kernels/fused_norm.dropout_add_ln at rate 0 (interpret mode) equals
    layer_norm(x + h) in values and in all four gradients, including the
    tail grid block (row count not a multiple of fused_norm.ROWS)."""
    from icek_tpu.kernels import fused_norm
    from icek_tpu.models import transformer as tr

    N, D = 530, 36
    x = jnp.asarray(rng.standard_normal((2, N // 2, D)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((2, N // 2, D)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(D).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(D).astype(np.float32))
    p = {"scale": scale, "bias": bias}

    out = fused_norm.dropout_add_ln(x, h, scale, bias, rate=0.0)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(tr.layer_norm(p, x + h)), atol=2e-5
    )

    def loss_ref(x_, h_, s_, b_):
        return jnp.sum(jnp.sin(tr.layer_norm({"scale": s_, "bias": b_}, x_ + h_)))

    def loss_ker(x_, h_, s_, b_):
        return jnp.sum(jnp.sin(fused_norm.dropout_add_ln(x_, h_, s_, b_, rate=0.0)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, h, scale, bias)
    gk = jax.grad(loss_ker, argnums=(0, 1, 2, 3))(x, h, scale, bias)
    for a, b in zip(gr, gk):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=1e-4)


def test_fused_norm_dropout_rejected_on_interpret():
    """rate > 0 under the Mosaic interpreter must raise (interpreted
    prng_random_bits returns zeros -> silently mis-scaled outputs)."""
    from icek_tpu.kernels import fused_norm

    x = jnp.zeros((4, 8), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)
    with pytest.raises(ValueError, match="Mosaic interpreter"):
        fused_norm.dropout_add_ln(
            x, x, jnp.ones((8,)), jnp.zeros((8,)), rate=0.2, seed=seed,
            interpret=True,
        )
    with pytest.raises(ValueError, match="Mosaic interpreter"):
        fused_norm.hw_dropout(x, rate=0.2, seed=seed, interpret=True)


def test_score_dtype_cast_is_lossless(rng):
    """score_dtype=compute_dtype (the r3 training declaration) must give
    scores whose f32 widening equals the score_dtype=f32 default: the
    pieces are computed in compute_dtype either way, so the final cast is
    the only difference and widening bf16 -> f32 is exact."""
    import dataclasses

    from icek_tpu.core import config as config_lib
    from icek_tpu.models import captioner as cap

    cfg = config_lib.k_georic().model
    cfg_small = dataclasses.replace(cfg, emb_dim=40, num_heads=4,
                                    decoder_ffn_dim=64, encoder_ffn_dim=64,
                                    num_layers=2, type_vocab=50,
                                    num_predicates=20)
    V, E, F, B, T = 60, 9, 5, 2, 7
    params = cap.init_captioner_params(jax.random.PRNGKey(0), cfg_small, V)
    tokens = jnp.asarray(rng.standard_normal((B, 12, 40)).astype(np.float32))
    ents = np.zeros((B, E, 5), np.float32)
    ents[:, :, 0] = np.arange(E)
    ents[:, :, 4] = rng.integers(0, 50, (B, E))
    facts = np.zeros((B, F, 3), np.float32)
    facts[:, :, 0] = np.arange(F)
    facts[:, :, 1] = rng.integers(0, E, (B, F))
    facts[:, :, 2] = rng.integers(0, 20, (B, F))
    facts = jnp.asarray(facts)
    caps = jnp.asarray(rng.integers(1, V, (B, T)).astype(np.int32))
    mask = jnp.zeros((B, T), jnp.int32)

    def fwd(score_dtype):
        return cap.captioner_forward(
            params, cfg_small, V, 0, caps, mask, tokens, jnp.asarray(ents),
            facts, deterministic=True, compute_dtype=jnp.bfloat16,
            score_dtype=score_dtype,
        )

    low = fwd(jnp.bfloat16)
    high = fwd(jnp.float32)
    assert low.dtype == jnp.bfloat16
    assert high.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(low.astype(jnp.float32)), np.asarray(high)
    )
