"""On-device greedy decoding: one `lax.while_loop`, KV-cached, batched.

Replaces the reference's per-step Python host loop that re-decodes the full
prefix every step with no KV cache (geo-aware/models.py:363-443,
knowledge-aware/models.py:516-609).  Semantics preserved:

  * argmax over softmax of the [V | E | F] copy scores;
  * generation stops at <end> (later positions stay <pad>);
  * the n-gram repetition cleanup — immediate repeats of unit length 1/2/3
    rewrite the repeated span with each step's recorded second-best token
    (geo models.py:417-435), with unit-1 taking precedence, then 2, then 3;
  * the caption fed back to the model is append-only — cleanup rewrites the
    *output* buffer only (and the current position feeds the next step),
    exactly like the reference, which is what makes KV caching valid;
  * emitted entity/fact ids update the caption-type mask and the seen-entity
    bitmask driving the fact/predicate indicators.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from icek_tpu.core.config import ModelConfig
from icek_tpu.decode import topk
from icek_tpu.models import captioner as cap
from icek_tpu.models import transformer as tfm


class DecodeContext(NamedTuple):
    """Static per-batch tensors prepared once before the decode loop."""

    entities_encoded: jnp.ndarray             # (B, E, D)
    facts_encoded: Optional[jnp.ndarray]      # (B, F, D) or None
    fact_features: Optional[jnp.ndarray]      # (B, F, 3) or None
    cross_kvs: tuple                          # per-layer cross-attention K/V
    ent_pred: Optional[jnp.ndarray]           # (B, E, P) per-entity predicate masks


def prepare_decode_context(
    params, cfg: ModelConfig, image_tokens, entity_features, fact_features=None,
    compute_dtype=jnp.float32,
) -> DecodeContext:
    memory, ents, facts = cap.encode_memory(
        params, cfg, image_tokens, entity_features, fact_features,
        deterministic=True, compute_dtype=compute_dtype,
    )
    cross_kvs = tfm.precompute_cross_kv(
        params["decoder"], memory, cfg.num_heads, compute_dtype
    )
    ent_pred = None
    if cfg.has_facts:
        # Per-ENTITY predicate masks, materialized once: ent_pred[b,e,p]=1
        # iff some fact with subject e has predicate p.  The decode loop then
        # accumulates the predicate indicator by GATHERING the emitted
        # entity's row (a few MB/step) instead of contracting the full
        # (B,F,P) one-hot every step (hundreds of MB/step for news).
        subj_onehot = jax.nn.one_hot(
            fact_features[:, :, 1].astype(jnp.int32),
            entity_features.shape[1], dtype=compute_dtype,
        )  # (B, F, E)
        pred_onehot = jax.nn.one_hot(
            fact_features[:, :, 2].astype(jnp.int32), cfg.num_predicates,
            dtype=compute_dtype,
        )  # (B, F, P)
        ent_pred = (
            jnp.einsum("bfe,bfp->bep", subj_onehot, pred_onehot) > 0
        ).astype(compute_dtype)
    return DecodeContext(ents, facts, fact_features, tuple(cross_kvs), ent_pred)


def _token_kind(token, vocab_size, num_entity_rows, has_facts):
    """0=word, 1=entity, 2=fact (knowledge models.py:600-608)."""
    if has_facts:
        return jnp.where(
            token >= vocab_size + num_entity_rows, 2,
            jnp.where(token >= vocab_size, 1, 0),
        )
    return jnp.where(token >= vocab_size, 1, 0)


def _repetition_cleanup(output, second, i, apply):
    """Rewrite immediate n-gram repeats with recorded second-best tokens.

    output, second: (B, L); i: scalar step; apply: (B,) bool.
    Mirrors geo models.py:417-435 (unit 1 rewrites 1 token, unit 2 rewrites
    2, unit 3 rewrites 4; first matching unit wins).
    """

    def col(buf, k):
        return jnp.take(buf, jnp.maximum(i - k, 0), axis=1)

    o = [col(output, k) for k in range(6)]
    s = [col(second, k) for k in range(4)]

    unit1 = (i > 0) & (o[0] == o[1])
    unit2 = (i > 2) & (o[0] == o[2]) & (o[1] == o[3])
    unit3 = (i > 4) & (o[0] == o[3]) & (o[1] == o[4]) & (o[2] == o[5])

    hit1 = apply & unit1
    hit2 = apply & ~unit1 & unit2
    hit3 = apply & ~unit1 & ~unit2 & unit3

    # positions i-r for r in 0..3; how many get rewritten per unit
    rewrite_count = jnp.where(hit1, 1, jnp.where(hit2, 2, jnp.where(hit3, 4, 0)))
    for r in range(4):
        do = rewrite_count > r
        pos = jnp.maximum(i - r, 0)
        current = jnp.take(output, pos, axis=1)
        new = jnp.where(do, s[r], current)
        output = jax.vmap(lambda row, p, v: row.at[p].set(v), in_axes=(0, None, 0))(
            output, pos, new
        )
    return output


def pointer_tail(params, cfg, hc, ents, facts=None, fact_before=None,
                 compute_dtype=jnp.float32):
    """Entity [+ fact] pointer logits for one decode step.

    hc: (..., D) raw decoder state; returns (..., E[+F]) — the "tail" of the
    extended vocabulary, fed to the fused score/top-k kernel.
    """
    # greedy: hc (B, D); beam: hc (B, K, D) with per-image shared tables
    spec = "bd,bed,d->be" if hc.ndim == 2 else "bkd,bed,d->bke"
    fact_spec = "bd,bfd,d->bf" if hc.ndim == 2 else "bkd,bfd,d->bkf"
    w_ent = params["fc_entity"]["w"][:, 0].astype(compute_dtype)
    tail = jnp.einsum(
        spec, hc.astype(compute_dtype), ents.astype(compute_dtype), w_ent
    ).astype(jnp.float32) + params["fc_entity"]["b"][0].astype(jnp.float32)
    if cfg.has_facts:
        w_fact = params["fc_fact"]["w"][:, 0].astype(compute_dtype)
        contracted = jnp.einsum(
            fact_spec, hc.astype(compute_dtype), facts.astype(compute_dtype), w_fact
        ).astype(jnp.float32)
        tail_fact = contracted * fact_before + params["fc_fact"]["b"][0].astype(
            jnp.float32
        )
        tail = jnp.concatenate([tail, tail_fact], axis=-1)
    return tail


def vocab_input(params, cfg, hc, pred_ind=None, compute_dtype=jnp.float32):
    """Predicate-modulated decoder state feeding the vocab projection."""
    if cfg.has_facts:
        from icek_tpu.models import transformer as tfm

        pred_proj = tfm.linear(params["fc_predicate"], pred_ind, compute_dtype)
        return hc.astype(compute_dtype) * pred_proj.astype(compute_dtype)
    return hc.astype(compute_dtype)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "vocab_size", "num_entity_rows", "max_len", "compute_dtype",
        "use_fused_scores",
    ),
)
def greedy_decode(
    params,
    cfg: ModelConfig,
    vocab_size: int,
    num_entity_rows: int,
    start_id: int,
    end_id: int,
    pad_id: int,
    ctx: DecodeContext,
    max_len: int,
    compute_dtype=jnp.float32,
    use_fused_scores=None,
):
    """Returns (B, max_len) extended-vocab token ids.

    `use_fused_scores` routes the scoring head through the Pallas fused
    vocab-matmul/top-k/logsumexp kernel (kernels/copy_scores.py); opt-in —
    see the default note below.
    """
    from icek_tpu.decode.beam import _cast_float_params

    if use_fused_scores is None:
        # Measured on v5e-1 at the preset shapes (V=10k): the Pallas fused
        # scoring kernel ties XLA for greedy and loses for beam (XLA's
        # batched GEMM + iterative top-k is already near the bandwidth
        # floor), so it is opt-in; it pays off at larger vocabularies where
        # the (N, S) score materialization dominates.
        use_fused_scores = False
    params = _cast_float_params(params, compute_dtype)
    B = ctx.entities_encoded.shape[0]
    D = cfg.emb_dim
    H = cfg.num_heads
    pos_table = jnp.asarray(tfm.sinusoidal_positions(max_len, D))
    sqrt_d = math.sqrt(D)

    captions = jnp.full((B, max_len + 1), start_id, jnp.int32)
    masks = jnp.zeros((B, max_len + 1), jnp.int32)
    output = jnp.full((B, max_len), pad_id, jnp.int32)
    second = jnp.zeros((B, max_len), jnp.int32)
    seen = jnp.zeros((B, num_entity_rows), jnp.float32)
    pred_ind = (
        jnp.zeros((B, cfg.num_predicates), jnp.float32)
        if cfg.has_facts else jnp.zeros((B, 1), jnp.float32)
    )
    # Loop-invariant (B, F, E) subject one-hot: fact_before is then an MXU
    # contraction per step instead of a scalar-gather custom call (see
    # captioner.subject_onehot).
    subj_oh = (
        cap.subject_onehot(ctx.fact_features, num_entity_rows)
        if ctx.fact_features is not None else None
    )
    finished = jnp.zeros((B,), bool)
    caches = tfm.init_self_kv_cache(
        cfg.num_layers, B, max_len, H, D // H,
        jnp.float32 if compute_dtype == jnp.float32 else compute_dtype,
    )

    def step(state):
        (i, captions, masks, output, second, seen, pred_ind, finished,
         caches) = state
        token = jax.lax.dynamic_slice_in_dim(captions, i, 1, axis=1)       # (B,1)
        tmask = jax.lax.dynamic_slice_in_dim(masks, i, 1, axis=1)
        emb = cap.embed_captions(
            params, vocab_size, pad_id, token, tmask,
            ctx.entities_encoded, ctx.facts_encoded,
        )
        x = emb * sqrt_d + pos_table[i]
        h, caches = tfm.decoder_stack(
            params["decoder"], x, None, H,
            deterministic=True, compute_dtype=compute_dtype,
            kv_caches=caches, cache_index=i, cross_kvs=ctx.cross_kvs,
        )
        fact_before = None
        if cfg.has_facts:
            fact_before = jnp.einsum("be,bfe->bf", seen, subj_oh)  # (B, F)
        if use_fused_scores:
            from icek_tpu.kernels import copy_scores as cs

            hc = h[:, 0]
            tail = pointer_tail(
                params, cfg, hc, ctx.entities_encoded, ctx.facts_encoded,
                fact_before, compute_dtype,
            )
            vin = vocab_input(params, cfg, hc, pred_ind, compute_dtype)
            _, top2_idx, _ = cs.fused_score_topk(
                vin, params["fc_vocab"]["w"],
                params["fc_vocab"]["b"].astype(jnp.float32), tail, k=2,
            )
        else:
            if cfg.has_facts:
                scores = cap.copy_scores(
                    params, cfg, h, ctx.entities_encoded, ctx.facts_encoded,
                    fact_before[:, None, :], pred_ind[:, None, :], compute_dtype,
                )[:, 0]
            else:
                scores = cap.copy_scores(
                    params, cfg, h, ctx.entities_encoded,
                    compute_dtype=compute_dtype,
                )[:, 0]
            _, top2_idx = topk.top_k(scores, 2)
        out_raw = top2_idx[:, 0].astype(jnp.int32)
        runner_up = top2_idx[:, 1].astype(jnp.int32)

        active = ~finished
        output = jax.vmap(
            lambda row, v, a: row.at[i].set(jnp.where(a, v, row[i])),
            in_axes=(0, 0, 0),
        )(output, out_raw, active)
        second = jax.vmap(
            lambda row, v, a: row.at[i].set(jnp.where(a, v, row[i])),
            in_axes=(0, 0, 0),
        )(second, runner_up, active)

        end_hit = out_raw == end_id
        output = _repetition_cleanup(output, second, i, active & ~end_hit)
        out = jnp.take(output, i, axis=1)

        next_token = jnp.where(active & ~end_hit, out, pad_id)
        captions = jax.lax.dynamic_update_slice_in_dim(
            captions, next_token[:, None], i + 1, axis=1
        )
        masks = jax.lax.dynamic_update_slice_in_dim(
            masks,
            _token_kind(next_token, vocab_size, num_entity_rows, cfg.has_facts)[:, None],
            i + 1,
            axis=1,
        )
        is_ent = (out >= vocab_size) & (out < vocab_size + num_entity_rows)
        gate = (is_ent & active & ~end_hit)[:, None]
        ent_idx = jnp.clip(out - vocab_size, 0, num_entity_rows - 1)
        ent_onehot = jax.nn.one_hot(
            ent_idx, num_entity_rows, dtype=jnp.float32
        ) * gate
        seen = jnp.maximum(seen, ent_onehot)
        if cfg.has_facts:
            # accumulate the emitted entity's predicate mask
            row = jnp.take_along_axis(
                ctx.ent_pred, ent_idx[:, None, None], axis=1
            )[:, 0].astype(jnp.float32)
            pred_ind = jnp.maximum(pred_ind, row * gate)
        finished = finished | (active & end_hit)
        return (i + 1, captions, masks, output, second, seen, pred_ind,
                finished, caches)

    def cond(state):
        i = state[0]
        finished = state[7]
        return (i < max_len) & ~jnp.all(finished)

    state = (jnp.int32(0), captions, masks, output, second, seen, pred_ind,
             finished, caches)
    state = jax.lax.while_loop(cond, step, state)
    return state[3]
