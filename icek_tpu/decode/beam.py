"""Batched on-device beam search over the extended [V | E | F] vocabulary.

A capability the reference does not have (its predict() is greedy-only,
geo-aware/models.py:412); this is the framework's default high-quality
decoder and the unit the north-star benchmark measures (encode + beam-5).

Design notes (HBM-bandwidth-first):
  * hypotheses live on an explicit beam axis K; per-hypothesis state is
    (B, K, ...);
  * everything static per image — cross-attention K/V of the 196+E+F
    memory, the encoded entity/fact tables, the predicate one-hots —
    stays at batch B and is read ONCE per step, with the K hypotheses
    riding the query-position axis (see transformer.multi_head_attention's
    shared-KV path).  This cuts per-step HBM traffic by ~K x;
  * self-attention KV caches are NEVER physically reordered by parent
    (profiling showed the reorder gathers + while-carry copies dominating
    the step).  Each hypothesis writes its step-i K/V into its own slot
    and an (B, K, L) ancestry index records which slot holds each history
    position; attention gathers through the ancestry at read time — the
    cache is read once per layer instead of read+write+copy;
  * finished hypotheses propagate with one forced <pad> continuation.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from icek_tpu.core.config import ModelConfig
from icek_tpu.decode import topk
from icek_tpu.decode.greedy import DecodeContext, _token_kind
from icek_tpu.models import captioner as cap
from icek_tpu.models import transformer as tfm

NEG_INF = -1e30


def _cast_float_params(params, compute_dtype):
    """Cast float weights to the compute dtype once, so the decode loop
    carries no per-step convert/copy ops for the parameter tensors."""
    if compute_dtype == jnp.float32:
        return params
    return jax.tree.map(
        lambda x: x.astype(compute_dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        params,
    )


def _gather_parents(x, parent):
    """x: (B, K, ...), parent: (B, K) -> reorder beam dim by parent index."""
    return jax.vmap(lambda row, idx: row[idx])(x, parent)


def _quantize_rows(x, axis=-1):
    """Symmetric per-row int8 quantization along `axis`.

    Returns (q int8, scale f32) with x ~= q * scale.  Scales fold into the
    attention math AFTER the int8 contraction (K scales scale logits rows,
    V scales pre-scale the attention weights), so the dequantized tensor is
    never materialized — the HBM stream is the int8 payload, half the bf16
    bytes.  Serving-mode option; not bit-parity with the float path.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )
    return q, scale


def quantize_cross_kvs(cross_kvs):
    """[{'k','v'}: (B, M, H, Hd)] -> int8 payloads and scales.

    K quantizes per row (b, m, h): its scale multiplies the logits (an
    elementwise producer XLA fuses into the softmax chain).  V quantizes
    along the MEMORY axis (per (b, h, d)): d is not contracted, so its
    scale multiplies the tiny (B, K, H, Hd) attention OUTPUT — folding it
    into the softmax weights instead would break XLA's softmax-into-AV
    fusion and materialize f32 (B, K, H, M) probabilities (profiled:
    ~0.5 ms/step regression)."""
    out = []
    for c in cross_kvs:
        kq, ks = _quantize_rows(c["k"])          # scale (B, M, H, 1)
        vq, vs = _quantize_rows(c["v"], axis=1)  # scale (B, 1, H, Hd)
        out.append({
            "kq": kq, "vq": vq,
            # (B, 1, H, M): broadcastable over the (B, K, H, M) logits
            "ks": jnp.transpose(ks[..., 0], (0, 2, 1))[:, None],
            "vs": vs,                            # (B, 1, H, Hd) over output
        })
    return out


def _beam_cross_attention_int8(mha, x, cross, num_heads, compute_dtype):
    """Cross-attention over int8-quantized shared KV: K row scales multiply
    the logits; V per-feature scales multiply the attention output."""
    B, K, D = x.shape
    H = num_heads
    Hd = D // H
    w = mha["qkv_w"].astype(compute_dtype)
    b = mha["qkv_b"].astype(compute_dtype)
    q = (x.astype(compute_dtype) @ w[:, :D] + b[:D]).reshape(B, K, H, Hd)
    logits = jnp.einsum(
        "bkhd,bmhd->bkhm", q, cross["kq"].astype(compute_dtype)
    ).astype(jnp.float32) * cross["ks"] / math.sqrt(Hd)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bkhm,bmhd->bkhd",
        weights.astype(compute_dtype),
        cross["vq"].astype(compute_dtype),
    ) * cross["vs"]
    return tfm.linear(mha["out"], out.astype(compute_dtype).reshape(B, K, D),
                      compute_dtype)


def _head_mask(H: int, Hd: int) -> jnp.ndarray:
    """(H, H*Hd) block mask: row h is 1 on head h's feature dims.

    d_model=300 / head_dim=30 is lane-hostile on TPU (SURVEY.md §7); the
    head mask turns per-head attention into full-width GEMMs with no
    sub-128-lane reshapes.
    """
    import numpy as np

    return jnp.asarray(np.kron(np.eye(H), np.ones((1, Hd))).astype(np.float32))


def _group_matrix(L: int, K: int) -> jnp.ndarray:
    """(L*K, L): sums the K slot entries of each history position."""
    import numpy as np

    return jnp.asarray(np.kron(np.eye(L), np.ones((K, 1))).astype(np.float32))


def _beam_self_attention(mha, x, cache, sel, i, num_heads, head_mask, group,
                         compute_dtype):
    """Ancestry-indirect cached self-attention for one decode step.

    x: (B, K, D); cache: {"k","v"} of (B, L*K, D) — row l*K+m holds slot m's
    step-l key/value; sel: (B, K*H, L*K) 0/1 ancestry selector (row k*H+h
    selects the (l, anc[k,l]) entries).  Everything is full-width batched
    GEMM: XLA keeps the cache row-major so the step-i write (K contiguous
    rows at offset i*K) stays in place — 5-D einsum formulations forced a
    permuted cache layout and full-buffer copies every step (profiled).
    Returns (attn_out (B, K, D), new_cache).
    """
    B, K, D = x.shape
    H = num_heads
    Hd = D // H
    w = mha["qkv_w"].astype(compute_dtype)
    b = mha["qkv_b"].astype(compute_dtype)
    proj = x.astype(compute_dtype) @ w + b
    q, k_new, v_new = jnp.split(proj, 3, axis=-1)
    cache_dt = cache["k"].dtype
    k_cache = jax.lax.dynamic_update_slice(
        cache["k"], k_new.astype(cache_dt), (0, i * K, 0)
    )
    v_cache = jax.lax.dynamic_update_slice(
        cache["v"], v_new.astype(cache_dt), (0, i * K, 0)
    )
    L = k_cache.shape[1] // K
    hm = head_mask.astype(compute_dtype)
    # per-head queries as masked full-width rows: (B, K*H, D)
    qh = (q[:, :, None, :] * hm[None, None]).reshape(B, K * H, D)
    logits_all = jnp.einsum(
        "bqd,bnd->bqn", qh, k_cache.astype(compute_dtype)
    ) / math.sqrt(Hd)                                        # (B, K*H, L*K)
    masked = logits_all.astype(jnp.float32) * sel
    lg = jnp.einsum("bqn,nl->bql", masked, group)            # (B, K*H, L)
    valid = jnp.arange(L) <= i
    lg = jnp.where(valid[None, None, :], lg, -jnp.inf)
    weights = jax.nn.softmax(lg, axis=-1)
    slot_w = (jnp.einsum("bql,nl->bqn", weights, group) * sel).astype(compute_dtype)
    out_h = jnp.einsum("bqn,bnd->bqd", slot_w, v_cache.astype(compute_dtype))
    out = jnp.sum(out_h.reshape(B, K, H, D) * hm[None, None], axis=2)
    out = tfm.linear(mha["out"], out, compute_dtype)
    return out, {"k": k_cache, "v": v_cache}


def _beam_self_attention_int8(mha, x, cache, sel, i, num_heads, head_mask,
                              group, compute_dtype):
    """_beam_self_attention over an int8 cache: this step's K/V rows are
    quantized per row at write; row scales fold into the logits (K) and
    the slot weights (V) after the int8 contractions."""
    B, K, D = x.shape
    H = num_heads
    Hd = D // H
    w = mha["qkv_w"].astype(compute_dtype)
    b = mha["qkv_b"].astype(compute_dtype)
    proj = x.astype(compute_dtype) @ w + b
    q, k_new, v_new = jnp.split(proj, 3, axis=-1)
    kq_new, ks_new = _quantize_rows(k_new)       # (B, K, D), (B, K, 1)
    vq_new, vs_new = _quantize_rows(v_new)
    k_cache = jax.lax.dynamic_update_slice(cache["kq"], kq_new, (0, i * K, 0))
    v_cache = jax.lax.dynamic_update_slice(cache["vq"], vq_new, (0, i * K, 0))
    ks = jax.lax.dynamic_update_slice(cache["ks"], ks_new[..., 0], (0, i * K))
    vs = jax.lax.dynamic_update_slice(cache["vs"], vs_new[..., 0], (0, i * K))
    L = k_cache.shape[1] // K
    hm = head_mask.astype(compute_dtype)
    qh = (q[:, :, None, :] * hm[None, None]).reshape(B, K * H, D)
    logits_all = jnp.einsum(
        "bqd,bnd->bqn", qh, k_cache.astype(compute_dtype)
    ).astype(jnp.float32) * ks[:, None, :] / math.sqrt(Hd)
    masked = logits_all * sel
    lg = jnp.einsum("bqn,nl->bql", masked, group)            # (B, K*H, L)
    valid = jnp.arange(L) <= i
    lg = jnp.where(valid[None, None, :], lg, -jnp.inf)
    weights = jax.nn.softmax(lg, axis=-1)
    slot_w = jnp.einsum("bql,nl->bqn", weights, group) * sel
    out_h = jnp.einsum(
        "bqn,bnd->bqd",
        (slot_w * vs[:, None, :]).astype(compute_dtype),
        v_cache.astype(compute_dtype),
    )
    out = jnp.sum(out_h.reshape(B, K, H, D) * hm[None, None], axis=2)
    out = tfm.linear(mha["out"], out, compute_dtype)
    return out, {"kq": k_cache, "vq": v_cache, "ks": ks, "vs": vs}


def _beam_cross_attention(mha, x, cross_kv, num_heads, compute_dtype):
    """Cross-attention of (B, K, D) queries over shared (B, M, H, Hd) KV."""
    B, K, D = x.shape
    H = num_heads
    Hd = D // H
    w = mha["qkv_w"].astype(compute_dtype)
    b = mha["qkv_b"].astype(compute_dtype)
    q = (x.astype(compute_dtype) @ w[:, :D] + b[:D]).reshape(B, K, H, Hd)
    k = cross_kv["k"].astype(compute_dtype)
    v = cross_kv["v"].astype(compute_dtype)
    logits = jnp.einsum("bkhd,bmhd->bkhm", q, k) / math.sqrt(Hd)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bkhm,bmhd->bkhd", weights.astype(compute_dtype), v
    ).reshape(B, K, D)
    return tfm.linear(mha["out"], out, compute_dtype)


def _beam_decoder_step(decoder_params, x, caches, anc, i, cross_kvs,
                       num_heads, head_mask, group, compute_dtype,
                       kv_int8=False, cross_int8=False):
    """All decoder layers for one beam step; x: (B, K, D)."""
    B, K, D = x.shape
    H = num_heads
    LK = caches[0]["kq" if kv_int8 else "k"].shape[1]
    # ancestry selector shared by all layers: (B, K*H, L*K)
    sel = jax.nn.one_hot(anc, K, dtype=jnp.float32).reshape(B, K, LK)
    sel = jnp.repeat(sel, H, axis=1)
    new_caches = []
    for layer, cache, cross in zip(decoder_params["layers"], caches, cross_kvs):
        self_fn = _beam_self_attention_int8 if kv_int8 else _beam_self_attention
        attn, new_cache = self_fn(
            layer["self_attn"], x, cache, sel, i, num_heads, head_mask, group,
            compute_dtype,
        )
        x = tfm.layer_norm(layer["norm1"], x + attn)
        cross_fn = (
            _beam_cross_attention_int8 if cross_int8 else _beam_cross_attention
        )
        cross_out = cross_fn(
            layer["cross_attn"], x, cross, num_heads, compute_dtype
        )
        x = tfm.layer_norm(layer["norm2"], x + cross_out)
        ff = tfm.linear(
            layer["ffn"]["lin2"],
            jax.nn.relu(tfm.linear(layer["ffn"]["lin1"], x, compute_dtype)),
            compute_dtype,
        )
        x = tfm.layer_norm(layer["norm3"], x + ff)
        new_caches.append(new_cache)
    return x, new_caches


def _embed_tokens_beam(
    params, vocab_size, pad_id, token, kind, ents, facts
):
    """token/kind: (B, K) -> (B, K, D), gathering from the SHARED per-image
    entity/fact tables (cf. captioner.embed_captions)."""
    E = ents.shape[1]
    word_ids = jnp.where(token >= vocab_size, pad_id, token)
    word_emb = params["word_embedding"][word_ids]
    ent_ids = token - vocab_size
    ent_ids = jnp.where((ent_ids < 0) | (ent_ids >= E), E - 1, ent_ids)
    ent_emb = jnp.take_along_axis(ents, ent_ids[..., None], axis=1)
    out = jnp.where((kind == 1)[..., None], ent_emb, word_emb)
    if facts is not None:
        F = facts.shape[1]
        fact_ids = token - vocab_size - E
        fact_ids = jnp.where((fact_ids < 0) | (fact_ids >= F), F - 1, fact_ids)
        fact_emb = jnp.take_along_axis(facts, fact_ids[..., None], axis=1)
        out = jnp.where((kind == 2)[..., None], fact_emb, out)
    return out


def resolve_kv_dtype(kv_dtype, cfg: ModelConfig):
    """Resolve ``kv_dtype="auto"`` to the measured per-preset win.

    The round-4 controlled A/B (benchmarks/int8_kv_ab.py, BASELINE.md, two
    independent sessions at batch 256 beam 5) showed the int8 KV cache is
    shape-dependent: +7% caps/s on news (M=598 — per-step cross-attention
    reads dominate), a wash on knowledge, and −9% on geo (the dequantize
    scale breaks the softmax→AV fusion and M=64 is too small to pay).
    "auto" therefore picks "int8" only for the news variant on a real TPU
    backend and stays on the bit-parity float path everywhere else
    (including CPU, where there is no HBM bottleneck to buy back).
    Explicit values pass through unchanged.
    """
    if kv_dtype != "auto":
        return kv_dtype
    if jax.default_backend() == "tpu" and cfg.variant == "news":
        return "int8"
    return None


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "vocab_size", "num_entity_rows", "max_len", "beam_size",
        "compute_dtype", "length_normalize", "use_fused_scores",
        "use_megakernel", "kv_dtype",
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
    use_fused_scores=None,
    use_megakernel=None,
    kv_dtype=None,
):
    """Returns (tokens (B, max_len), scores (B,)) for the best hypothesis.

    kv_dtype="int8" (opt-in) stores the self-attention caches and the
    precomputed cross-attention K/V as per-row-quantized int8, halving
    their HBM payload; scales fold into the attention math after the int8
    contractions (K scales on the logits, V scales on the un-contracted
    output), so dequantized tensors never materialize.
    kv_dtype="int8_cross" quantizes ONLY the precomputed cross-attention
    K/V (the dominant decode-loop bytes at the fact presets: M=548/598
    rows re-read every step) and keeps the tiny growing self caches in the
    compute dtype, avoiding the per-step quantize ops on the write path.
    Neither is bit-parity with the float path (quality-checked in tests).
    Measured per-preset A/B numbers: BASELINE.md / benchmarks/int8_kv_ab.py
    (r2 geo-shape result: int8 1420 vs bf16 1572 caps/s — the extra scale
    elementwise breaks the stream-optimal softmax->AV fusion chain).
    """
    if use_fused_scores is None:
        # Measured on v5e-1 at the preset shapes (V=10k): the Pallas fused
        # scoring kernel ties XLA for greedy and loses for beam (XLA's
        # batched GEMM + iterative top-k is already near the bandwidth
        # floor), so it is opt-in; it pays off at larger vocabularies where
        # the (N, S) score materialization dominates.
        use_fused_scores = False
    if use_megakernel is None:
        # Fused whole-stack decoder-step Pallas kernel
        # (kernels/decoder_step.py).  Off by default until measured on the
        # flagship shapes; CPU oracle tests opt in explicitly (interpreter).
        use_megakernel = False
    params = _cast_float_params(params, compute_dtype)
    B = ctx.entities_encoded.shape[0]
    K = beam_size
    D = cfg.emb_dim
    H = cfg.num_heads
    S = vocab_size + num_entity_rows + (
        ctx.facts_encoded.shape[1] if ctx.facts_encoded is not None else 0
    )
    pos_table = jnp.asarray(tfm.sinusoidal_positions(max_len, D))
    sqrt_d = math.sqrt(D)
    # Loop-invariant (B, F, E) subject one-hot: fact_before is then an MXU
    # contraction per step instead of a scalar-gather custom call, which the
    # r3 profile measured at 2.7 ms/step = 46% of the news beam step body
    # (see captioner.subject_onehot).
    subj_oh = (
        cap.subject_onehot(ctx.fact_features, num_entity_rows)
        if ctx.fact_features is not None
        else None
    )

    tokens = jnp.full((B, K, max_len), pad_id, jnp.int32)
    prev_token = jnp.full((B, K), start_id, jnp.int32)
    prev_kind = jnp.zeros((B, K), jnp.int32)
    seen = jnp.zeros((B, K, num_entity_rows), jnp.float32)
    pred_ind = jnp.zeros(
        (B, K, cfg.num_predicates if cfg.has_facts else 1), jnp.float32
    )
    finished = jnp.zeros((B, K), bool)
    lengths = jnp.zeros((B, K), jnp.int32)
    # Only beam 0 is alive at step 0 (all beams start identical).
    log_probs = jnp.where(jnp.arange(K)[None, :] == 0, 0.0, NEG_INF) * jnp.ones((B, 1))
    cache_dt = jnp.float32 if compute_dtype == jnp.float32 else compute_dtype
    kv_dtype = resolve_kv_dtype(kv_dtype, cfg)
    if kv_dtype not in (None, "int8", "int8_cross"):
        raise ValueError(
            f"kv_dtype must be None/'auto'/'int8'/'int8_cross', got {kv_dtype!r}"
        )
    kv_int8 = kv_dtype == "int8"
    cross_int8 = kv_dtype in ("int8", "int8_cross")
    if cross_int8 and use_megakernel:
        raise ValueError(f"kv_dtype={kv_dtype!r} is not supported with the megakernel")
    cross_for_step = ctx.cross_kvs
    if cross_int8:
        cross_for_step = quantize_cross_kvs(ctx.cross_kvs)
    if kv_int8:
        caches = [
            {
                "kq": jnp.zeros((B, max_len * K, D), jnp.int8),
                "vq": jnp.zeros((B, max_len * K, D), jnp.int8),
                "ks": jnp.zeros((B, max_len * K), jnp.float32),
                "vs": jnp.zeros((B, max_len * K), jnp.float32),
            }
            for _ in range(cfg.num_layers)
        ]
    elif use_megakernel:
        from icek_tpu.kernels import decoder_step as dsk

        caches = (
            jnp.zeros((cfg.num_layers, B, max_len * K, D), cache_dt),
            jnp.zeros((cfg.num_layers, B, max_len * K, D), cache_dt),
        )
        stacked = dsk.stack_decoder_params(
            params["decoder"], H, K, max_len, dtype=cache_dt
        )
        cross_k, cross_v, mem_len = dsk.pad_cross_kv(ctx.cross_kvs, cache_dt)
    else:
        caches = [
            {
                "k": jnp.zeros((B, max_len * K, D), cache_dt),
                "v": jnp.zeros((B, max_len * K, D), cache_dt),
            }
            for _ in range(cfg.num_layers)
        ]
    head_mask = _head_mask(H, D // H)
    group = _group_matrix(max_len, K)
    ancestry = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, max_len)
    )

    def step(state):
        (i, tokens, prev_token, prev_kind, seen, pred_ind, finished, lengths,
         log_probs, caches, ancestry) = state
        # this step's K/V land in the hypothesis's own slot
        ancestry = jax.lax.dynamic_update_slice(
            ancestry,
            jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, 1)),
            (0, 0, i),
        )
        emb = _embed_tokens_beam(
            params, vocab_size, pad_id, prev_token, prev_kind,
            ctx.entities_encoded, ctx.facts_encoded,
        )
        x = emb * sqrt_d + pos_table[i]
        if use_megakernel:
            from icek_tpu.kernels import decoder_step as dsk

            caches_k, caches_v = caches
            sel_plain = jax.nn.one_hot(ancestry, K, dtype=jnp.float32).reshape(
                B, K, max_len * K
            )
            h, k_new, v_new = dsk.fused_beam_decoder_step(
                stacked, x, sel_plain, caches_k, caches_v, cross_k, cross_v,
                i, num_heads=H, head_dim=D // H, mem_len=mem_len,
            )
            h = h.astype(compute_dtype)
            new_caches = (
                jax.lax.dynamic_update_slice(caches_k, k_new, (0, 0, i * K, 0)),
                jax.lax.dynamic_update_slice(caches_v, v_new, (0, 0, i * K, 0)),
            )
        else:
            h, new_caches = _beam_decoder_step(
                params["decoder"], x, caches, ancestry, i, cross_for_step, H,
                head_mask, group, compute_dtype, kv_int8=kv_int8,
                cross_int8=cross_int8,
            )
        fact_before = None
        if cfg.has_facts:
            fact_before = jnp.einsum("bke,bfe->bkf", seen, subj_oh)  # (B, K, F)
        if use_fused_scores:
            # Pallas fused vocab-matmul + per-hypothesis top-K + logsumexp:
            # the (B*K, S) score tensor never reaches HBM.  Global top-K is
            # then exact over the K*K finalists.
            from icek_tpu.decode.greedy import pointer_tail, vocab_input
            from icek_tpu.kernels import copy_scores as cs

            tail = pointer_tail(
                params, cfg, h, ctx.entities_encoded, ctx.facts_encoded,
                fact_before, compute_dtype,
            )
            vin = vocab_input(params, cfg, h, pred_ind, compute_dtype)
            vals, idx, lse = cs.fused_score_topk(
                vin.reshape(B * K, D), params["fc_vocab"]["w"],
                params["fc_vocab"]["b"].astype(jnp.float32),
                tail.reshape(B * K, -1), k=K,
            )
            cand_logp = (vals - lse[:, None]).reshape(B, K, K)
            cand_token = idx.reshape(B, K, K)
            # Finished parents contribute exactly one <pad> continuation.
            first = jnp.arange(K) == 0
            cand_logp = jnp.where(
                finished[:, :, None],
                jnp.where(first[None, None, :], 0.0, NEG_INF),
                cand_logp,
            )
            cand_token = jnp.where(finished[:, :, None], pad_id, cand_token)
            total = log_probs[:, :, None] + cand_logp       # (B, K, K)
            top_vals, pos = topk.top_k(total.reshape(B, K * K), K)
            parent = pos // K
            token = jnp.take_along_axis(
                cand_token.reshape(B, K * K), pos, axis=-1
            ).astype(jnp.int32)
        else:
            if cfg.has_facts:
                scores = cap.copy_scores(
                    params, cfg, h, ctx.entities_encoded, ctx.facts_encoded,
                    fact_before, pred_ind, compute_dtype,
                )
            else:
                scores = cap.copy_scores(
                    params, cfg, h, ctx.entities_encoded,
                    compute_dtype=compute_dtype,
                )
            step_logp = jax.nn.log_softmax(scores.astype(jnp.float32), axis=-1)

            # Finished hypotheses contribute exactly one continuation (<pad>, +0).
            pad_only = jnp.full((K, S), NEG_INF).at[:, pad_id].set(0.0)
            step_logp = jnp.where(finished[:, :, None], pad_only[None], step_logp)

            total = log_probs[:, :, None] + step_logp          # (B, K, S)
            top_vals, top_idx = topk.top_k_two_stage(total, K)  # (B, K)
            parent = top_idx // S
            token = (top_idx % S).astype(jnp.int32)

        # Reorder the SMALL per-hypothesis state by parent beam; the KV
        # caches stay in place — only the ancestry rows are gathered.
        tokens = _gather_parents(tokens, parent)
        seen = _gather_parents(seen, parent)
        pred_ind = _gather_parents(pred_ind, parent)
        fin_parent = _gather_parents(finished, parent)
        len_parent = _gather_parents(lengths, parent)
        ancestry = _gather_parents(ancestry, parent)

        emit = ~fin_parent
        write_tok = jnp.where(emit, token, pad_id)
        tokens = jax.vmap(
            jax.vmap(lambda row, v: row.at[i].set(v)), in_axes=(0, 0)
        )(tokens, write_tok)
        lengths = jnp.where(emit, len_parent + 1, len_parent)

        now_finished = fin_parent | (token == end_id)
        kind = _token_kind(token, vocab_size, num_entity_rows, cfg.has_facts)
        is_ent = (token >= vocab_size) & (token < vocab_size + num_entity_rows) & emit
        ent_idx = jnp.clip(token - vocab_size, 0, num_entity_rows - 1)
        ent_onehot = jax.nn.one_hot(
            ent_idx, num_entity_rows, dtype=jnp.float32
        ) * is_ent[..., None]
        seen = jnp.maximum(seen, ent_onehot)
        if cfg.has_facts:
            # accumulate the emitted entity's predicate mask (gathered row)
            row = jnp.take_along_axis(
                ctx.ent_pred, ent_idx[:, :, None], axis=1
            ).astype(jnp.float32)
            pred_ind = jnp.maximum(pred_ind, row * is_ent[..., None])

        next_token = jnp.where(emit, token, pad_id)
        next_kind = jnp.where(emit, kind, 0)
        return (
            i + 1, tokens, next_token, next_kind, seen, pred_ind, now_finished,
            lengths, top_vals, new_caches, ancestry,
        )

    def cond(state):
        i, finished = state[0], state[6]
        return (i < max_len) & ~jnp.all(finished)

    state = (
        jnp.int32(0), tokens, prev_token, prev_kind, seen, pred_ind, finished,
        lengths, log_probs, caches, ancestry,
    )
    state = jax.lax.while_loop(cond, step, state)
    tokens, lengths, log_probs = state[1], state[7], state[8]

    if length_normalize:
        rank = log_probs / jnp.maximum(lengths, 1)
    else:
        rank = log_probs
    best = jnp.argmax(rank, axis=1)
    best_tokens = jax.vmap(lambda t, b: t[b])(tokens, best)
    best_scores = jax.vmap(lambda s, b: s[b])(rank, best)
    return best_tokens, best_scores
