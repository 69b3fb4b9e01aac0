"""Greedy-decode parity vs the reference `DecoderTransformer.predict` loop,
including <end> stopping and the n-gram repetition cleanup."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp
from torch import nn

from icek_tpu.decode import greedy
from icek_tpu.train import port

from conftest import reference_subproject
from test_model_parity import (
    D, FFN, HEADS, LAYERS, _facts, _geo_entities, _toy_wordmap, small_cfg,
    torch_seed,
)


@pytest.mark.parametrize("variant", ["geo", "knowledge"])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_greedy_matches_reference_predict(rng, variant, seed):
    subproject = {"geo": "geo-aware", "knowledge": "knowledge-aware"}[variant]
    ref_models, _ = reference_subproject(subproject)
    torch_seed(10 + seed)
    wm = _toy_wordmap()
    V = len(wm)
    cfg = small_cfg(variant)
    E, F, P = 7, 6, cfg.num_predicates
    max_len = 12
    local_rng = np.random.default_rng(seed)

    ref = ref_models.DecoderTransformer(
        word_map=wm, emb_dim=D, decoder_dim=FFN, encoder_dim=FFN,
        num_heads=HEADS, num_layers=LAYERS,
        dropout_dec=0.0, dropout_enc=0.0, dropout_pos=0.0,
    ).eval()
    ref.entity_encoder.type_embedding = nn.Embedding(cfg.type_vocab, cfg.type_emb_dim)
    if variant != "geo":
        ref.num_predicates = P
        ref.predicate_embedding = nn.Embedding(P, D)
        ref.fact_encoder.predicate_embedding = ref.predicate_embedding
        ref.fc_predicate = nn.Linear(P, D)
    ref.eval()
    params = port.import_captioner_state(ref.state_dict(), cfg)

    img = local_rng.standard_normal((1, 4, D)).astype(np.float32)
    ents = _geo_entities(local_rng, 1, E)
    facts = _facts(local_rng, 1, F, E, P) if variant != "geo" else None

    with torch.no_grad():
        if variant == "geo":
            want = ref.predict(
                torch.tensor(img).permute(0, 2, 1), max_len, torch.tensor(ents)
            )
        else:
            want = ref.predict(
                torch.tensor(img).permute(0, 2, 1), max_len,
                torch.tensor(ents), torch.tensor(facts.astype(np.int64)),
            )
    want = want.numpy()[:, 0]  # (max_len,) — reference returns (L, B)

    ctx = greedy.prepare_decode_context(
        params, cfg, jnp.asarray(img), jnp.asarray(ents),
        jnp.asarray(facts) if facts is not None else None,
    )
    got = greedy.greedy_decode(
        params, cfg, V, E, wm["<start>"], wm["<end>"], wm["<pad>"],
        ctx, max_len,
    )
    np.testing.assert_array_equal(np.asarray(got)[0], want)


def test_greedy_batched_matches_single(rng):
    """Batched decode must equal per-image decode (padding independence)."""
    ref_models, _ = reference_subproject("geo-aware")
    torch_seed(42)
    wm = _toy_wordmap()
    V = len(wm)
    cfg = small_cfg("geo")
    E, max_len, B = 7, 10, 4

    ref = ref_models.DecoderTransformer(
        word_map=wm, emb_dim=D, decoder_dim=FFN, encoder_dim=FFN,
        num_heads=HEADS, num_layers=LAYERS,
        dropout_dec=0.0, dropout_enc=0.0, dropout_pos=0.0,
    ).eval()
    ref.entity_encoder.type_embedding = nn.Embedding(cfg.type_vocab, cfg.type_emb_dim)
    params = port.import_captioner_state(ref.state_dict(), cfg)

    img = rng.standard_normal((B, 4, D)).astype(np.float32)
    ents = _geo_entities(rng, B, E)

    ctx_all = greedy.prepare_decode_context(
        params, cfg, jnp.asarray(img), jnp.asarray(ents)
    )
    batched = np.asarray(
        greedy.greedy_decode(
            params, cfg, V, E, wm["<start>"], wm["<end>"], wm["<pad>"],
            ctx_all, max_len,
        )
    )
    for b in range(B):
        ctx_b = greedy.prepare_decode_context(
            params, cfg, jnp.asarray(img[b : b + 1]), jnp.asarray(ents[b : b + 1])
        )
        single = np.asarray(
            greedy.greedy_decode(
                params, cfg, V, E, wm["<start>"], wm["<end>"], wm["<pad>"],
                ctx_b, max_len,
            )
        )
        np.testing.assert_array_equal(batched[b], single[0])


def _small_ref_model(ref_models, wm, cfg, variant):
    ref = ref_models.DecoderTransformer(
        word_map=wm, emb_dim=D, decoder_dim=FFN, encoder_dim=FFN,
        num_heads=HEADS, num_layers=LAYERS,
        dropout_dec=0.0, dropout_enc=0.0, dropout_pos=0.0,
    ).eval()
    ref.entity_encoder.type_embedding = nn.Embedding(cfg.type_vocab, cfg.type_emb_dim)
    if variant != "geo":
        ref.num_predicates = cfg.num_predicates
        ref.predicate_embedding = nn.Embedding(cfg.num_predicates, D)
        ref.fact_encoder.predicate_embedding = ref.predicate_embedding
        ref.fc_predicate = nn.Linear(cfg.num_predicates, D)
    return ref.eval()


@pytest.mark.parametrize("variant", ["geo", "knowledge"])
def test_beam_search_improves_on_beam1(rng, variant):
    from icek_tpu.decode import beam

    subproject = {"geo": "geo-aware", "knowledge": "knowledge-aware"}[variant]
    ref_models, _ = reference_subproject(subproject)
    torch_seed(7)
    wm = _toy_wordmap()
    V = len(wm)
    cfg = small_cfg(variant)
    E, F, max_len, B = 7, 6, 10, 2
    ref = _small_ref_model(ref_models, wm, cfg, variant)
    params = port.import_captioner_state(ref.state_dict(), cfg)

    img = rng.standard_normal((B, 4, D)).astype(np.float32)
    ents = _geo_entities(rng, B, E)
    facts = _facts(rng, B, F, E, cfg.num_predicates) if variant != "geo" else None

    ctx = greedy.prepare_decode_context(
        params, cfg, jnp.asarray(img), jnp.asarray(ents),
        jnp.asarray(facts) if facts is not None else None,
    )
    args = (params, cfg, V, E, wm["<start>"], wm["<end>"], wm["<pad>"], ctx, max_len)
    tokens1, score1 = beam.beam_decode(*args, beam_size=1, length_normalize=False)
    tokens5, score5 = beam.beam_decode(*args, beam_size=5, length_normalize=False)
    assert tokens5.shape == (B, max_len)
    # beam-5 explores a superset of beam-1 prefixes
    assert np.all(np.asarray(score5) >= np.asarray(score1) - 1e-4)


def test_kv_dtype_auto_resolution(rng, monkeypatch):
    """kv_dtype="auto" applies the measured per-preset table (BASELINE.md
    round-4 int8-KV A/B): int8 only for the news variant on a TPU backend,
    the bit-parity float path everywhere else — and on CPU, beam_decode
    under "auto" is bit-identical to the default pipeline."""
    from icek_tpu.core import config as config_lib
    from icek_tpu.decode import beam
    from icek_tpu.models import captioner

    geo_m = config_lib.georic().model
    knowledge_m = config_lib.k_georic().model
    news_m = config_lib.nytimes800k().model
    # explicit values pass through untouched
    assert beam.resolve_kv_dtype(None, news_m) is None
    assert beam.resolve_kv_dtype("int8", geo_m) == "int8"
    assert beam.resolve_kv_dtype("int8_cross", news_m) == "int8_cross"
    # this suite runs on CPU: auto stays on the bit-parity float path
    assert beam.resolve_kv_dtype("auto", news_m) is None
    monkeypatch.setattr(beam.jax, "default_backend", lambda: "tpu")
    assert beam.resolve_kv_dtype("auto", news_m) == "int8"
    assert beam.resolve_kv_dtype("auto", geo_m) is None
    assert beam.resolve_kv_dtype("auto", knowledge_m) is None
    monkeypatch.undo()

    wm = _toy_wordmap()
    V = len(wm)
    cfg = small_cfg("geo")
    E, max_len, B = 7, 8, 2
    params = captioner.init_captioner_params(jax.random.PRNGKey(0), cfg, V)
    img = rng.standard_normal((B, 4, D)).astype(np.float32)
    ents = _geo_entities(rng, B, E)
    ctx = greedy.prepare_decode_context(
        params, cfg, jnp.asarray(img), jnp.asarray(ents), None
    )
    args = (params, cfg, V, E, wm["<start>"], wm["<end>"], wm["<pad>"],
            ctx, max_len)
    t_def, s_def = beam.beam_decode(*args, beam_size=3)
    t_auto, s_auto = beam.beam_decode(*args, beam_size=3, kv_dtype="auto")
    assert np.array_equal(np.asarray(t_def), np.asarray(t_auto))
    assert np.allclose(np.asarray(s_def), np.asarray(s_auto))


@pytest.mark.parametrize("seed", [0, 1])
def test_greedy_matches_reference_predict_news(rng, seed):
    """News variant: article features + name-embedding entity encoder."""
    ref_models, _ = reference_subproject("news-knowledge-aware")
    torch_seed(20 + seed)
    wm = _toy_wordmap()
    V = len(wm)
    cfg = small_cfg("news")
    E, F, P, max_len = 7, 6, cfg.num_predicates, 10
    local_rng = np.random.default_rng(seed)

    ref = _small_ref_model(ref_models, wm, cfg, "news")
    params = port.import_captioner_state(ref.state_dict(), cfg)

    img = local_rng.standard_normal((1, 4, D)).astype(np.float32)
    ents = _geo_entities(local_rng, 1, E)
    ents[:, :, 4] = local_rng.integers(0, cfg.type_vocab, (1, E))
    name_ids = local_rng.integers(0, V, (1, E, 5)).astype(np.float32)
    ents = np.concatenate([ents, name_ids], axis=-1)
    facts = _facts(local_rng, 1, F, E, P)

    with torch.no_grad():
        want = ref.predict(
            torch.tensor(img).permute(0, 2, 1), max_len,
            torch.tensor(ents), torch.tensor(facts.astype(np.int64)),
        ).numpy()[:, 0]
    ctx = greedy.prepare_decode_context(
        params, cfg, jnp.asarray(img), jnp.asarray(ents), jnp.asarray(facts)
    )
    got = greedy.greedy_decode(
        params, cfg, V, E, wm["<start>"], wm["<end>"], wm["<pad>"],
        ctx, max_len,
    )
    np.testing.assert_array_equal(np.asarray(got)[0], want)


def _oracle_beam(params, cfg, wm, img, ents, facts, K, max_len):
    """Exhaustive full-redecode beam search in numpy (no caches, no
    ancestry) — the correctness oracle for beam_decode."""
    import math as m

    from icek_tpu.models import captioner as cap
    from icek_tpu.models import transformer as tfm

    V = len(wm)
    E = ents.shape[1]
    memory, ents_enc, facts_enc = cap.encode_memory(
        params, cfg, jnp.asarray(img), jnp.asarray(ents),
        jnp.asarray(facts) if facts is not None else None,
    )
    pos = tfm.sinusoidal_positions(max_len, cfg.emb_dim)

    def step_scores(prefix_tokens, prefix_kinds, seen):
        T = len(prefix_tokens)
        ids = jnp.asarray(np.array(prefix_tokens)[None, :])
        kinds = jnp.asarray(np.array(prefix_kinds)[None, :])
        emb = cap.embed_captions(params, V, wm["<pad>"], ids, kinds,
                                 ents_enc, facts_enc)
        x = emb * m.sqrt(cfg.emb_dim) + jnp.asarray(pos[:T])
        h, _ = tfm.decoder_stack(
            params["decoder"], x, memory, cfg.num_heads,
            causal_mask=tfm.causal_mask(T),
        )
        h_last = h[:, -1:]
        if cfg.has_facts:
            seen_vec = np.zeros((1, E), np.float32)
            for e in seen:
                seen_vec[0, e] = 1.0
            fb, pi = cap.indicators_from_seen(
                jnp.asarray(seen_vec), jnp.asarray(facts), cfg.num_predicates
            )
            scores = cap.copy_scores(params, cfg, h_last, ents_enc, facts_enc,
                                     fb[:, None, :], pi[:, None, :])
        else:
            scores = cap.copy_scores(params, cfg, h_last, ents_enc)
        return np.asarray(jax.nn.log_softmax(scores[0, 0]))

    S = V + E + (facts.shape[1] if facts is not None else 0)
    hyps = [
        {"tokens": [], "fed": [wm["<start>"]], "kinds": [0], "logp": 0.0,
         "seen": set(), "finished": False}
    ]
    for i in range(max_len):
        if all(h["finished"] for h in hyps):
            break
        candidates = []
        for h in hyps:
            if h["finished"]:
                candidates.append((h["logp"], h, wm["<pad>"]))
                continue
            logp = step_scores(h["fed"], h["kinds"], h["seen"])
            order = np.argsort(-logp, kind="stable")[:K]
            for tok in order:
                candidates.append((h["logp"] + float(logp[tok]), h, int(tok)))
        candidates.sort(key=lambda c: -c[0])
        new_hyps = []
        for logp, parent, tok in candidates[:K]:
            h = {
                "tokens": list(parent["tokens"]),
                "fed": list(parent["fed"]),
                "kinds": list(parent["kinds"]),
                "logp": logp,
                "seen": set(parent["seen"]),
                "finished": parent["finished"],
            }
            if not h["finished"]:
                h["tokens"].append(tok)
                kind = 0
                if facts is not None and tok >= V + E:
                    kind = 2
                elif tok >= V:
                    kind = 1
                    h["seen"].add(tok - V)
                h["fed"].append(tok if tok != wm["<end>"] else wm["<pad>"])
                h["kinds"].append(kind if tok != wm["<end>"] else 0)
                if tok == wm["<end>"]:
                    h["finished"] = True
            new_hyps.append(h)
        hyps = new_hyps
    best = max(hyps, key=lambda h: h["logp"])
    padded = best["tokens"] + [wm["<pad>"]] * (max_len - len(best["tokens"]))
    return padded, best["logp"]


@pytest.mark.parametrize("variant", ["geo", "knowledge"])
@pytest.mark.quick
def test_beam_matches_bruteforce_oracle(rng, variant):
    from icek_tpu.decode import beam

    subproject = {"geo": "geo-aware", "knowledge": "knowledge-aware"}[variant]
    ref_models, _ = reference_subproject(subproject)
    torch_seed(33)
    wm = _toy_wordmap()
    V = len(wm)
    cfg = small_cfg(variant)
    E, F, K, max_len = 6, 5, 3, 6
    ref = _small_ref_model(ref_models, wm, cfg, variant)
    params = port.import_captioner_state(ref.state_dict(), cfg)

    for b in range(3):
        local = np.random.default_rng(100 + b)
        img = local.standard_normal((1, 4, D)).astype(np.float32)
        ents = _geo_entities(local, 1, E)
        facts = _facts(local, 1, F, E, cfg.num_predicates) if variant != "geo" else None

        want_tokens, want_logp = _oracle_beam(
            params, cfg, wm, img, ents, facts, K, max_len
        )
        ctx = greedy.prepare_decode_context(
            params, cfg, jnp.asarray(img), jnp.asarray(ents),
            jnp.asarray(facts) if facts is not None else None,
        )
        got_tokens, got_logp = beam.beam_decode(
            params, cfg, V, E, wm["<start>"], wm["<end>"], wm["<pad>"],
            ctx, max_len, beam_size=K, length_normalize=False,
        )
        assert list(np.asarray(got_tokens)[0]) == want_tokens, b
        np.testing.assert_allclose(float(got_logp[0]), want_logp, atol=1e-3)


@pytest.mark.parametrize("shape_seed", [0, 1, 2])
@pytest.mark.quick
def test_greedy_parity_fuzzed_shapes(shape_seed):
    """Forward + greedy parity across randomized dims/heads/context sizes —
    guards broadcasting and indexing across shape combinations."""
    import dataclasses

    srng = np.random.default_rng(1000 + shape_seed)
    heads = int(srng.choice([2, 4, 5]))
    d = int(heads * srng.choice([6, 10]))
    layers = int(srng.choice([1, 2]))
    ffn = int(srng.choice([16, 48]))
    E = int(srng.integers(3, 11))
    F = int(srng.integers(2, 8))
    P = int(srng.integers(5, 30))
    max_len = int(srng.integers(5, 15))

    ref_models, _ = reference_subproject("knowledge-aware")
    torch.manual_seed(shape_seed)
    wm = _toy_wordmap(n_words=int(srng.integers(10, 40)))
    V = len(wm)
    cfg = dataclasses.replace(
        small_cfg("knowledge"),
        emb_dim=d, num_heads=heads, num_layers=layers,
        decoder_ffn_dim=ffn, encoder_ffn_dim=ffn, num_predicates=P,
    )
    ref = ref_models.DecoderTransformer(
        word_map=wm, emb_dim=d, decoder_dim=ffn, encoder_dim=ffn,
        num_heads=heads, num_layers=layers,
        dropout_dec=0.0, dropout_enc=0.0, dropout_pos=0.0,
    ).eval()
    ref.entity_encoder.type_embedding = nn.Embedding(cfg.type_vocab, cfg.type_emb_dim)
    ref.num_predicates = P
    ref.predicate_embedding = nn.Embedding(P, d)
    ref.fact_encoder.predicate_embedding = ref.predicate_embedding
    ref.fc_predicate = nn.Linear(P, d)
    ref.eval()
    params = port.import_captioner_state(ref.state_dict(), cfg)

    img = srng.standard_normal((1, 3, d)).astype(np.float32)
    ents = _geo_entities(srng, 1, E)
    facts = _facts(srng, 1, F, E, P)
    with torch.no_grad():
        want = ref.predict(
            torch.tensor(img).permute(0, 2, 1), max_len,
            torch.tensor(ents), torch.tensor(facts.astype(np.int64)),
        ).numpy()[:, 0]
    ctx = greedy.prepare_decode_context(
        params, cfg, jnp.asarray(img), jnp.asarray(ents), jnp.asarray(facts)
    )
    got = greedy.greedy_decode(
        params, cfg, V, E, wm["<start>"], wm["<end>"], wm["<pad>"],
        ctx, max_len,
    )
    np.testing.assert_array_equal(np.asarray(got)[0], want)


# ---------------------------------------------------------------------------
# top-k primitives (decode/topk.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n,k,seg", [
    (10301, 5, 512),   # beam flagship: segmented path, ragged last segment
    (4096, 2, 512),    # exact multiple
    (2049, 8, 512),    # boundary: just over the segmented threshold
    (300, 5, 512),     # small row: iterative path
])
def test_top_k_matches_lax(rng, n, k, seg):
    from icek_tpu.decode import topk

    x = jnp.asarray(rng.standard_normal((7, n)).astype(np.float32))
    want_v, want_i = jax.lax.top_k(x, k)
    got_v, got_i = topk.top_k(x, k, seg=seg)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_top_k_tie_breaking_first_index(rng):
    """Exact ties across and within segments resolve to the lowest index,
    matching lax.top_k — including duplicated maxima inside one segment."""
    from icek_tpu.decode import topk

    x = np.zeros((3, 3000), np.float32)
    x[0, [7, 600, 601, 2999]] = 5.0          # cross-segment + within-segment
    x[1, [512, 513]] = 2.0                   # adjacent in one segment
    x[2, :] = 1.0                            # everything tied
    x = jnp.asarray(x)
    for k in (3, 5):
        want_v, want_i = jax.lax.top_k(x, k)
        got_v, got_i = topk.top_k(x, k, seg=512)
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_top_k_two_stage_matches_flat(rng):
    from icek_tpu.decode import topk

    total = jnp.asarray(rng.standard_normal((4, 5, 10301)).astype(np.float32))
    want_v, want_i = jax.lax.top_k(total.reshape(4, 5 * 10301), 5)
    got_v, got_i = topk.top_k_two_stage(total, 5)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_subject_onehot_contraction_bit_exact(rng):
    """The one-hot MXU contraction that replaced the per-step fact_before
    gather (r3: the gather was 46% of the news beam step) must be BIT-exact
    against the take_along_axis formulation: operands are 0/1 and each
    output element has exactly one contributing term, so no accumulation
    (and hence no rounding) occurs."""
    from icek_tpu.models import captioner as cap

    B, F, E, T, K = 4, 301, 101, 7, 5
    ff = np.zeros((B, F, 3), np.float32)
    ff[:, :, 1] = rng.integers(0, E, (B, F))
    ff = jnp.asarray(ff)
    subj = np.asarray(ff[:, :, 1]).astype(np.int64)
    oh = cap.subject_onehot(ff, E)

    # (B, E) seen mask — greedy step shape.
    seen1 = jnp.asarray((rng.random((B, E)) < 0.3).astype(np.float32))
    got1 = jnp.einsum("be,bfe->bf", seen1, oh)
    want1 = np.take_along_axis(np.asarray(seen1), subj, axis=1)
    np.testing.assert_array_equal(np.asarray(got1), want1)

    # (B, K, E) — beam step shape.
    seen2 = jnp.asarray((rng.random((B, K, E)) < 0.3).astype(np.float32))
    got2 = jnp.einsum("bke,bfe->bkf", seen2, oh)
    want2 = np.take_along_axis(
        np.asarray(seen2), np.broadcast_to(subj[:, None, :], (B, K, F)), axis=2
    )
    np.testing.assert_array_equal(np.asarray(got2), want2)

    # (B, T, E) — training context_indicators shape.
    seen3 = jnp.asarray((rng.random((B, T, E)) < 0.3).astype(np.float32))
    got3 = jnp.einsum("bte,bfe->btf", seen3, oh)
    want3 = np.take_along_axis(
        np.asarray(seen3), np.broadcast_to(subj[:, None, :], (B, T, F)), axis=2
    )
    np.testing.assert_array_equal(np.asarray(got3), want3)
