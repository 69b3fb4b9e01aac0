"""The knowledge-aware captioner: entity/fact encoders, caption embedder,
copy/pointer scoring head and the full teacher-forced forward pass.

This is the TPU-native redesign of the reference's DecoderTransformer
(geo-aware/models.py:212-443, knowledge-aware/models.py:290-609,
news-knowledge-aware/models.py:273-592) — one parameterized model, three
variants.  Every host-side Python loop in the reference becomes an on-device
vectorized op:

  * EntityEncoder's per-element ``.apply_()`` azimuth math
    (geo models.py:95-97)           -> two ``jnp.where`` expressions
  * per-batch fact counting via ``torch.unique``
    (knowledge models.py:101-121)   -> a one-hot histogram matmul
  * CaptionEmbedder's per-batch index_select loop
    (geo models.py:154-180)         -> batched gathers + ``jnp.where``
  * get_context_indicators' O(B*T*F) nested Python loop
    (knowledge models.py:380-418)   -> exclusive cumulative-or + einsum
  * get_scores' (T,B,E,D) broadcast materialization
    (geo models.py:305-310)         -> an einsum that never materializes it
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from icek_tpu.core.config import ModelConfig
from icek_tpu.models import transformer as tfm


# --------------------------------------------------------------------------
# Parameter initialization
# --------------------------------------------------------------------------

def init_captioner_params(key, cfg: ModelConfig, vocab_size: int):
    ks = jax.random.split(key, 10)
    D = cfg.emb_dim
    params = {
        "word_embedding": jax.random.normal(ks[0], (vocab_size, D), jnp.float32),
        "type_embedding": jax.random.normal(
            ks[1], (cfg.type_vocab, cfg.type_emb_dim), jnp.float32
        ),
        "ctx_encoder_entities": tfm.init_encoder_stack(
            ks[2], cfg.num_layers, D, cfg.encoder_ffn_dim
        ),
        "decoder": tfm.init_decoder_stack(ks[3], cfg.num_layers, D, cfg.decoder_ffn_dim),
        # init_weights: U(-0.1, 0.1) weights, zero bias (geo models.py:264-272)
        "fc_vocab": {
            "w": jax.random.uniform(ks[4], (D, vocab_size), jnp.float32, -0.1, 0.1),
            "b": jnp.zeros((vocab_size,), jnp.float32),
        },
        "fc_entity": {
            "w": jax.random.uniform(ks[5], (D, 1), jnp.float32, -0.1, 0.1),
            "b": jnp.zeros((1,), jnp.float32),
        },
    }
    if cfg.has_facts:
        params.update(
            {
                "predicate_embedding": jax.random.normal(
                    ks[6], (cfg.num_predicates, D), jnp.float32
                ),
                "ctx_encoder_facts": tfm.init_encoder_stack(
                    ks[7], cfg.num_layers, D, cfg.encoder_ffn_dim
                ),
                "fc_fact": {
                    "w": jax.random.uniform(ks[8], (D, 1), jnp.float32, -0.1, 0.1),
                    "b": jnp.zeros((1,), jnp.float32),
                },
                "fc_predicate": {
                    "w": jax.random.uniform(
                        ks[9], (cfg.num_predicates, D), jnp.float32, -0.1, 0.1
                    ),
                    "b": jnp.zeros((D,), jnp.float32),
                },
            }
        )
    return params


# --------------------------------------------------------------------------
# Entity / fact encoders
# --------------------------------------------------------------------------

def _azimuth_to_north(az):
    return jnp.abs(az) / 180.0


def _azimuth_to_east(az):
    return jnp.where(az >= -90.0, jnp.abs(90.0 - az), 90.0 + jnp.abs(az + 180.0)) / 180.0


def count_subject_facts(fact_subjects: jnp.ndarray, num_entity_rows: int):
    """Per-entity count of facts whose subject is that entity.

    fact_subjects: (B, F) float/int subject row indices.  The final entity row
    (the <unk_ent> dummy) is forced to zero, matching the reference's skip of
    dummy-fact subjects (knowledge models.py:108-117).
    Returns (counts (B, E), indicator (B, E)) as float32.
    """
    subj = fact_subjects.astype(jnp.int32)
    one_hot = jax.nn.one_hot(subj, num_entity_rows, dtype=jnp.float32)  # (B,F,E)
    counts = jnp.sum(one_hot, axis=1)
    counts = counts.at[:, -1].set(0.0)
    return counts, (counts > 0).astype(jnp.float32)


def encode_entities(
    params,
    cfg: ModelConfig,
    entity_features: jnp.ndarray,        # (B, E, C) packed rows [row_idx, *feats]
    fact_features: Optional[jnp.ndarray] = None,   # (B, F, 3)
):
    """Build the per-entity 300-d vectors (all three variants).

    geo       (geo models.py:82-104):   [dist, az_north, az_east, size, type_emb...]
    knowledge (knowledge models.py:82-133): + [fact_count, fact_indicator] before type
    news      (news models.py:79-134):  [count, headline, first_par, fact_count,
                                         fact_indicator, type_emb...] * mean name emb
    """
    type_ids = entity_features[:, :, 4].astype(jnp.int32)
    type_emb = params["type_embedding"][type_ids]
    if cfg.variant == "geo":
        cols = [
            entity_features[:, :, 1],
            _azimuth_to_north(entity_features[:, :, 2]),
            _azimuth_to_east(entity_features[:, :, 2]),
            entity_features[:, :, 3],
        ]
    elif cfg.variant == "knowledge":
        counts, indicator = count_subject_facts(
            fact_features[:, :, 1], entity_features.shape[1]
        )
        cols = [
            entity_features[:, :, 1],
            _azimuth_to_north(entity_features[:, :, 2]),
            _azimuth_to_east(entity_features[:, :, 2]),
            entity_features[:, :, 3],
            counts,
            indicator,
        ]
    elif cfg.variant == "news":
        counts, indicator = count_subject_facts(
            fact_features[:, :, 1], entity_features.shape[1]
        )
        cols = [
            entity_features[:, :, 1],
            entity_features[:, :, 2],
            entity_features[:, :, 3],
            counts,
            indicator,
        ]
    else:
        raise ValueError(cfg.variant)
    encoded = jnp.concatenate(
        [jnp.stack(cols, axis=-1).astype(jnp.float32), type_emb], axis=-1
    )
    if cfg.entity_name_embedding:
        # feature cols 5..9 carry wordmap ids of the entity-name words
        name_ids = entity_features[:, :, 5:].astype(jnp.int32)
        name_emb = jnp.mean(params["word_embedding"][name_ids], axis=-2)
        encoded = encoded * name_emb
    return encoded


def encode_facts(params, fact_features: jnp.ndarray, entities_encoded: jnp.ndarray):
    """fact vector = encoded subject entity + predicate embedding
    (knowledge models.py:154-188)."""
    subj = fact_features[:, :, 1].astype(jnp.int32)
    pred = fact_features[:, :, 2].astype(jnp.int32)
    subj_enc = jnp.take_along_axis(
        entities_encoded, subj[:, :, None], axis=1
    )
    return subj_enc + params["predicate_embedding"][pred]


# --------------------------------------------------------------------------
# Caption embedding
# --------------------------------------------------------------------------

def embed_captions(
    params,
    vocab_size: int,
    pad_id: int,
    caption_ids: jnp.ndarray,       # (B, T) extended-vocab ids
    caption_mask: jnp.ndarray,      # (B, T) 0=word 1=entity 2=fact
    entities_encoded: jnp.ndarray,  # (B, E, D)
    facts_encoded: Optional[jnp.ndarray] = None,
):
    """Mixed-source token embedding (geo models.py:125-181, knowledge :191-259)."""
    E = entities_encoded.shape[1]
    word_ids = jnp.where(caption_ids >= vocab_size, pad_id, caption_ids)
    word_emb = params["word_embedding"][word_ids]

    ent_ids = caption_ids - vocab_size
    ent_ids = jnp.where((ent_ids < 0) | (ent_ids >= E), E - 1, ent_ids)
    ent_emb = jnp.take_along_axis(entities_encoded, ent_ids[:, :, None], axis=1)

    out = jnp.where((caption_mask == 1)[:, :, None], ent_emb, word_emb)
    if facts_encoded is not None:
        F = facts_encoded.shape[1]
        fact_ids = caption_ids - vocab_size - E
        fact_ids = jnp.where((fact_ids < 0) | (fact_ids >= F), F - 1, fact_ids)
        fact_emb = jnp.take_along_axis(facts_encoded, fact_ids[:, :, None], axis=1)
        out = jnp.where((caption_mask == 2)[:, :, None], fact_emb, out)
    return out


# --------------------------------------------------------------------------
# Context indicators (knowledge/news)
# --------------------------------------------------------------------------

def seen_entity_mask(caption_ids: jnp.ndarray, vocab_size: int, num_entity_rows: int):
    """(B, T, E) — entity e appeared at a position strictly before t.

    Vectorizes the reference's nested loop (knowledge models.py:395-417):
    positions after an entity token get its bit set.
    """
    ent_idx = caption_ids - vocab_size
    is_ent = (ent_idx >= 0) & (ent_idx < num_entity_rows)
    one_hot = jax.nn.one_hot(
        jnp.clip(ent_idx, 0, num_entity_rows - 1), num_entity_rows, dtype=jnp.float32
    ) * is_ent[:, :, None]
    cumulative = jnp.cumsum(one_hot, axis=1)
    exclusive = cumulative - one_hot  # shift to "strictly before"
    return (exclusive > 0).astype(jnp.float32)


def subject_onehot(
    fact_features: jnp.ndarray,     # (B, F, 3)
    num_entity_rows: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """(B, F, E) one-hot of each fact's subject-entity row.

    `fact_before[..., f] = seen[..., subj[f]]` looks like a gather, but XLA
    lowers the element-indexed `take_along_axis` inside decode loops to a
    scalar-gather custom call (~7 ns/element: 2.7 ms/step at the news
    shapes = 46% of the whole beam step body, profiled r3).  Contracting
    the seen mask against this precomputed one-hot on the MXU instead is
    bit-exact — both operands are 0/1 and each output element has exactly
    one contributing term, so no accumulation happens — and the one-hot is
    loop-invariant (subject indices are fixed per batch)."""
    subj = fact_features[:, :, 1].astype(jnp.int32)
    return jax.nn.one_hot(subj, num_entity_rows, dtype=dtype)


def context_indicators(
    caption_ids: jnp.ndarray,       # (B, T)
    fact_features: jnp.ndarray,     # (B, F, 3)
    vocab_size: int,
    num_entity_rows: int,
    num_predicates: int,
):
    """Returns (entity_idx_before (B,T,F), predicate_indicator (B,T,P))."""
    seen = seen_entity_mask(caption_ids, vocab_size, num_entity_rows)
    subj_oh = subject_onehot(fact_features, num_entity_rows)
    fact_before = jnp.einsum("bte,bfe->btf", seen, subj_oh)  # (B, T, F)
    pred_one_hot = jax.nn.one_hot(
        fact_features[:, :, 2].astype(jnp.int32), num_predicates, dtype=jnp.float32
    )  # (B, F, P)
    pred_ind = jnp.einsum("btf,bfp->btp", fact_before, pred_one_hot)
    return fact_before, (pred_ind > 0).astype(jnp.float32)


def indicators_from_seen(
    seen: jnp.ndarray,              # (B, E) 0/1 seen-entity bitmask
    fact_features: jnp.ndarray,     # (B, F, 3)
    num_predicates: int,
    pred_onehot: Optional[jnp.ndarray] = None,   # precomputed (B, F, P)
    subj_onehot_: Optional[jnp.ndarray] = None,  # precomputed (B, F, E)
):
    """Single-step variant for the decode loop: the carry holds `seen`."""
    if subj_onehot_ is None:
        subj_onehot_ = subject_onehot(fact_features, seen.shape[-1])
    fact_before = jnp.einsum("be,bfe->bf", seen, subj_onehot_)  # (B, F)
    if pred_onehot is None:
        pred_onehot = jax.nn.one_hot(
            fact_features[:, :, 2].astype(jnp.int32), num_predicates,
            dtype=jnp.float32,
        )
    pred_ind = jnp.einsum(
        "bf,bfp->bp", fact_before.astype(pred_onehot.dtype), pred_onehot
    )
    return fact_before, (pred_ind > 0).astype(jnp.float32)


# --------------------------------------------------------------------------
# Scoring head (copy / pointer over [vocab | entities | facts])
# --------------------------------------------------------------------------

def copy_scores(
    params,
    cfg: ModelConfig,
    h: jnp.ndarray,                  # (B, T, D) decoder output
    entities_encoded: jnp.ndarray,   # (B, E, D)
    facts_encoded: Optional[jnp.ndarray] = None,
    fact_before: Optional[jnp.ndarray] = None,       # (B, T, F)
    predicate_indicator: Optional[jnp.ndarray] = None,  # (B, T, P)
    compute_dtype=jnp.float32,
    out_dtype=jnp.float32,
):
    """Concatenated logits over [V | E | F] (geo models.py:291-313,
    knowledge models.py:420-455).

    The reference materializes (T, B, E, D) products; here entity/fact scores
    contract directly:  logit[b,t,e] = sum_d h*ent*w + b.
    """
    hc = h.astype(compute_dtype)
    if cfg.has_facts:
        # vocab logits are modulated by the active-predicate projection
        pred_proj = tfm.linear(params["fc_predicate"], predicate_indicator, compute_dtype)
        vocab_in = hc * pred_proj.astype(compute_dtype)
    else:
        vocab_in = hc
    preds_vocab = tfm.linear(params["fc_vocab"], vocab_in, compute_dtype)

    w_ent = params["fc_entity"]["w"][:, 0].astype(compute_dtype)
    preds_ent = (
        jnp.einsum("btd,bed,d->bte", hc, entities_encoded.astype(compute_dtype), w_ent)
        + params["fc_entity"]["b"][0]
    )
    pieces = [preds_vocab, preds_ent]
    if cfg.has_facts:
        w_fact = params["fc_fact"]["w"][:, 0].astype(compute_dtype)
        contracted = jnp.einsum(
            "btd,bfd,d->btf", hc, facts_encoded.astype(compute_dtype), w_fact
        )
        # the indicator gates the contraction but not the bias
        preds_fact = contracted * fact_before + params["fc_fact"]["b"][0]
        pieces.append(preds_fact)
    # out_dtype=f32 (default) is lossless when pieces are bf16 — the cast
    # widens already-rounded values — and keeps decode's f32 log-prob math.
    # Training passes out_dtype=compute_dtype instead: declaring the
    # (B, T, S) scores f32 made the backward materialize an f32 cotangent
    # of the full score tensor (1 GB/step at the knowledge shapes, ~6 ms of
    # pad/convert/copy per step, r3 profile) before re-rounding to bf16 for
    # the GEMM backwards; a bf16 declaration feeds _token_nll's bf16-native
    # custom VJP directly.
    return jnp.concatenate([p.astype(out_dtype) for p in pieces], axis=-1)


# --------------------------------------------------------------------------
# Memory construction + teacher-forced forward
# --------------------------------------------------------------------------

def resolve_flash(cfg: ModelConfig, deterministic: bool) -> bool:
    """Whether to use the fused Pallas attention: the config flag, or
    (None = auto) on for real TPU backends — both the dropout-active
    training pass and the deterministic context-encode/validation forwards
    (the kernel never materializes the (B, H, T, T) score tensors; the
    fused eval pipeline measured 1593 -> 1653 caps/s same-session A/B at
    batch 256 geo).  The autoregressive decode LOOP is unaffected: its
    attention runs through the separately-tuned KV-cache formulations in
    decode/beam.py and decode/greedy.py, which bypass the flash branch."""
    if cfg.use_flash_attention is not None:
        return cfg.use_flash_attention
    return jax.default_backend() == "tpu"


def encode_memory(
    params,
    cfg: ModelConfig,
    image_tokens: jnp.ndarray,       # (B, 196, D)
    entity_features: jnp.ndarray,
    fact_features: Optional[jnp.ndarray] = None,
    rng=None,
    deterministic: bool = True,
    compute_dtype=jnp.float32,
):
    """Encode contexts and assemble the cross-attention memory.

    Returns (memory (B, 196+E[+F], D), entities_encoded, facts_encoded).
    """
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
    flash = resolve_flash(cfg, deterministic)
    ents = encode_entities(params, cfg, entity_features, fact_features)
    facts = None
    ent_ctx = tfm.encoder_stack(
        params["ctx_encoder_entities"], ents, cfg.num_heads, cfg.dropout_enc,
        rngs[0], deterministic, compute_dtype, flash=flash,
    )
    memory_parts = [image_tokens, ent_ctx]
    if cfg.has_facts:
        facts = encode_facts(params, fact_features, ents)
        fact_ctx = tfm.encoder_stack(
            params["ctx_encoder_facts"], facts, cfg.num_heads, cfg.dropout_enc,
            rngs[1], deterministic, compute_dtype, flash=flash,
        )
        memory_parts.append(fact_ctx)
    memory = jnp.concatenate(memory_parts, axis=1)
    return memory, ents, facts


def captioner_forward(
    params,
    cfg: ModelConfig,
    vocab_size: int,
    pad_id: int,
    caption_ids: jnp.ndarray,        # (B, T)
    caption_mask: jnp.ndarray,       # (B, T)
    image_tokens: jnp.ndarray,       # (B, 196, D)
    entity_features: jnp.ndarray,
    fact_features: Optional[jnp.ndarray] = None,
    rng=None,
    deterministic: bool = True,
    compute_dtype=jnp.float32,
    pos_table: Optional[jnp.ndarray] = None,
    score_dtype=jnp.float32,
):
    """Teacher-forced pass returning (B, T, V+E[+F]) logits in score_dtype.

    Unlike the reference there is no length sort / pack_padded — the loss
    masks padding instead, which is XLA-static and numerically identical.
    """
    B, T = caption_ids.shape
    rngs = jax.random.split(rng, 3) if rng is not None else (None, None, None)
    memory, ents, facts = encode_memory(
        params, cfg, image_tokens, entity_features, fact_features,
        rngs[0], deterministic, compute_dtype,
    )
    emb = embed_captions(
        params, vocab_size, pad_id, caption_ids, caption_mask, ents, facts
    )
    if pos_table is None:
        pos_table = jnp.asarray(tfm.sinusoidal_positions(T, cfg.emb_dim))
    emb = emb * math.sqrt(cfg.emb_dim) + pos_table[:T]
    emb = tfm.dropout(emb, cfg.dropout_pos, rngs[1], deterministic)
    h, _ = tfm.decoder_stack(
        params["decoder"], emb, memory, cfg.num_heads,
        causal_mask=tfm.causal_mask(T), rate=cfg.dropout_dec, rng=rngs[2],
        deterministic=deterministic, compute_dtype=compute_dtype,
        flash=resolve_flash(cfg, deterministic),
    )
    if cfg.has_facts:
        fact_before, pred_ind = context_indicators(
            caption_ids, fact_features, vocab_size,
            entity_features.shape[1], cfg.num_predicates,
        )
        return copy_scores(
            params, cfg, h, ents, facts, fact_before, pred_ind, compute_dtype,
            out_dtype=score_dtype,
        )
    return copy_scores(
        params, cfg, h, ents, compute_dtype=compute_dtype,
        out_dtype=score_dtype,
    )
