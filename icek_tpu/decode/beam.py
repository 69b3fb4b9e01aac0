"""Batched on-device beam search over the extended [V | E | F] vocabulary.

A capability the reference does not have (its predict() is greedy-only,
geo-aware/models.py:412); this is the framework's default high-quality
decoder and the unit the north-star benchmark measures (encode + beam-5).

Design: hypotheses live in HBM as a (B, K, ...) extension of the greedy
loop's state.  Each step scores all K hypotheses in one batched pass
(folding K into the batch axis so the MXU sees a B*K batch), takes the
top-K of the K*S continuation scores per image, and gathers the KV caches
by parent index.  Finished hypotheses propagate with a single forced <pad>
continuation so their log-probability is unchanged.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from icek_tpu.core.config import ModelConfig
from icek_tpu.decode.greedy import DecodeContext, _token_kind
from icek_tpu.models import captioner as cap
from icek_tpu.models import transformer as tfm

NEG_INF = -1e30


def _expand(x, K):
    """(B, ...) -> (B*K, ...) by repeating each row K times."""
    return jnp.repeat(x, K, axis=0)


def _gather_parents(x, parent):
    """x: (B, K, ...), parent: (B, K) -> reorder beam dim by parent index."""
    return jax.vmap(lambda row, idx: row[idx])(x, parent)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "vocab_size", "num_entity_rows", "max_len", "beam_size",
        "compute_dtype", "length_normalize",
    ),
)
def beam_decode(
    params,
    cfg: ModelConfig,
    vocab_size: int,
    num_entity_rows: int,
    start_id: int,
    end_id: int,
    pad_id: int,
    ctx: DecodeContext,
    max_len: int,
    beam_size: int = 5,
    compute_dtype=jnp.float32,
    length_normalize: bool = True,
):
    """Returns (tokens (B, max_len), scores (B,)) for the best hypothesis."""
    B = ctx.entities_encoded.shape[0]
    K = beam_size
    D = cfg.emb_dim
    H = cfg.num_heads
    S = vocab_size + num_entity_rows + (
        ctx.facts_encoded.shape[1] if ctx.facts_encoded is not None else 0
    )
    pos_table = jnp.asarray(tfm.sinusoidal_positions(max_len, D))
    sqrt_d = math.sqrt(D)

    # Broadcast the per-image context across the beam: (B*K, ...).
    ents = _expand(ctx.entities_encoded, K)
    facts = _expand(ctx.facts_encoded, K) if ctx.facts_encoded is not None else None
    fact_feats = (
        _expand(ctx.fact_features, K) if ctx.fact_features is not None else None
    )
    cross_kvs = tuple(
        {"k": _expand(c["k"], K), "v": _expand(c["v"], K)} for c in ctx.cross_kvs
    )

    tokens = jnp.full((B, K, max_len), pad_id, jnp.int32)
    prev_token = jnp.full((B, K), start_id, jnp.int32)
    prev_kind = jnp.zeros((B, K), jnp.int32)
    seen = jnp.zeros((B, K, num_entity_rows), jnp.float32)
    finished = jnp.zeros((B, K), bool)
    lengths = jnp.zeros((B, K), jnp.int32)
    # Only beam 0 is alive at step 0 (all beams start identical).
    log_probs = jnp.where(jnp.arange(K)[None, :] == 0, 0.0, NEG_INF) * jnp.ones((B, 1))
    caches = tfm.init_self_kv_cache(
        cfg.num_layers, B * K, max_len, H, D // H,
        jnp.float32 if compute_dtype == jnp.float32 else compute_dtype,
    )

    def step(state):
        (i, tokens, prev_token, prev_kind, seen, finished, lengths, log_probs,
         caches) = state
        flat_tok = prev_token.reshape(B * K, 1)
        flat_kind = prev_kind.reshape(B * K, 1)
        emb = cap.embed_captions(
            params, vocab_size, pad_id, flat_tok, flat_kind, ents, facts
        )
        x = emb * sqrt_d + pos_table[i]
        h, new_caches = tfm.decoder_stack(
            params["decoder"], x, None, H,
            deterministic=True, compute_dtype=compute_dtype,
            kv_caches=caches, cache_index=i, cross_kvs=cross_kvs,
        )
        if cfg.has_facts:
            fact_before, pred_ind = cap.indicators_from_seen(
                seen.reshape(B * K, -1), fact_feats, cfg.num_predicates
            )
            scores = cap.copy_scores(
                params, cfg, h, ents, facts,
                fact_before[:, None, :], pred_ind[:, None, :], compute_dtype,
            )[:, 0]
        else:
            scores = cap.copy_scores(
                params, cfg, h, ents, compute_dtype=compute_dtype
            )[:, 0]
        step_logp = jax.nn.log_softmax(scores.astype(jnp.float32), axis=-1)
        step_logp = step_logp.reshape(B, K, S)

        # Finished hypotheses contribute exactly one continuation (<pad>, +0).
        pad_only = jnp.full((K, S), NEG_INF).at[:, pad_id].set(0.0)
        step_logp = jnp.where(finished[:, :, None], pad_only[None], step_logp)

        total = log_probs[:, :, None] + step_logp          # (B, K, S)
        flat_total = total.reshape(B, K * S)
        top_vals, top_idx = jax.lax.top_k(flat_total, K)   # (B, K)
        parent = top_idx // S
        token = (top_idx % S).astype(jnp.int32)

        # Reorder state by parent beam.
        tokens = _gather_parents(tokens, parent)
        seen = _gather_parents(seen, parent)
        fin_parent = _gather_parents(finished, parent)
        len_parent = _gather_parents(lengths, parent)
        new_caches = [
            {
                "self": {
                    "k": _gather_parents(
                        c["self"]["k"].reshape(B, K, *c["self"]["k"].shape[1:]), parent
                    ).reshape(B * K, *c["self"]["k"].shape[1:]),
                    "v": _gather_parents(
                        c["self"]["v"].reshape(B, K, *c["self"]["v"].shape[1:]), parent
                    ).reshape(B * K, *c["self"]["v"].shape[1:]),
                }
            }
            for c in new_caches
        ]

        emit = ~fin_parent
        write_tok = jnp.where(emit, token, pad_id)
        tokens = jax.vmap(
            jax.vmap(lambda row, v: row.at[i].set(v)), in_axes=(0, 0)
        )(tokens, write_tok)
        lengths = jnp.where(emit, len_parent + 1, len_parent)

        now_finished = fin_parent | (token == end_id)
        kind = _token_kind(token, vocab_size, num_entity_rows, cfg.has_facts)
        is_ent = (token >= vocab_size) & (token < vocab_size + num_entity_rows) & emit
        ent_onehot = jax.nn.one_hot(
            jnp.clip(token - vocab_size, 0, num_entity_rows - 1),
            num_entity_rows, dtype=jnp.float32,
        ) * is_ent[:, :, None]
        seen = jnp.maximum(seen, ent_onehot)

        next_token = jnp.where(emit, token, pad_id)
        next_kind = jnp.where(emit, kind, 0)
        return (
            i + 1, tokens, next_token, next_kind, seen, now_finished, lengths,
            top_vals, new_caches,
        )

    def cond(state):
        i, finished = state[0], state[5]
        return (i < max_len) & ~jnp.all(finished)

    state = (
        jnp.int32(0), tokens, prev_token, prev_kind, seen, finished, lengths,
        log_probs, caches,
    )
    state = jax.lax.while_loop(cond, step, state)
    tokens, lengths, log_probs = state[1], state[6], state[7]

    if length_normalize:
        rank = log_probs / jnp.maximum(lengths, 1)
    else:
        rank = log_probs
    best = jnp.argmax(rank, axis=1)
    best_tokens = jax.vmap(lambda t, b: t[b])(tokens, best)
    best_scores = jax.vmap(lambda s, b: s[b])(rank, best)
    return best_tokens, best_scores
