"""Transformer encoder/decoder stack, TPU-first but torch-parity.

Functional re-implementation of the semantics the reference gets from
``nn.TransformerEncoder``/``nn.TransformerDecoder`` (post-layer-norm, ReLU
FFN, dropout on attention weights and residual branches; reference:
geo-aware/models.py:241-244) so ported checkpoints reproduce outputs.

Everything is a pure function over a params pytree:
  * weights are stored (in_features, out_features) — torch imports transpose;
  * batch-first layout (B, T, D) throughout — the reference's (T, B, D)
    permutes are a torch convention with no XLA benefit;
  * attention runs in a configurable compute dtype (bfloat16 on TPU) with
    float32 softmax accumulation.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_linear(key, d_in, d_out, include_bias=True):
    """torch nn.Linear default init: kaiming-uniform weights, fan-in bias."""
    kw, kb = jax.random.split(key)
    bound_w = math.sqrt(1.0 / d_in) * math.sqrt(3.0)  # kaiming_uniform(a=sqrt(5))
    params = {"w": _uniform(kw, (d_in, d_out), bound_w)}
    if include_bias:
        params["b"] = _uniform(kb, (d_out,), math.sqrt(1.0 / d_in))
    return params


def linear(params, x, compute_dtype=None):
    w = params["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = x @ w
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def init_layer_norm(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def layer_norm(params, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return y * params["scale"] + params["bias"]


def init_mha(key, d_model):
    """torch nn.MultiheadAttention layout: fused qkv projection + out proj."""
    k1, k2, k3 = jax.random.split(key, 3)
    bound = math.sqrt(1.0 / d_model) * math.sqrt(3.0)
    return {
        # xavier_uniform over the fused (3d, d) matrix, stored (d, 3d)
        "qkv_w": _uniform(k1, (d_model, 3 * d_model), math.sqrt(6.0 / (4 * d_model))),
        "qkv_b": jnp.zeros((3 * d_model,), jnp.float32),
        "out": init_linear(k2, d_model, d_model) | {"b": jnp.zeros((d_model,), jnp.float32)},
    }


def dropout(x, rate, key, deterministic):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _kernel_seed(key):
    """(1,) int32 seed for the hardware-PRNG kernels, derived from a JAX key
    (same convention as the flash attention call site below)."""
    return jax.random.randint(
        key, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
    )


_LN_MODE = os.environ.get("ICEK_LN", "xla")  # xla | pallas | stock (A/B)


def residual_norm(norm, x, h, rate, key, deterministic, fused, compute_dtype):
    """``layer_norm(norm, x + dropout(h))``.

    On dropout-active fused training passes the chain is restructured so no
    f32 (B, S, D) tensor ever reaches HBM: the stock path materializes an
    f32 copy of the normalized tensor as a backward residual plus the
    dropout keep-mask, per site.  Two strategies (ICEK_LN env A/B):
      xla (default)  emit the LN result in the compute dtype and remat the
                     whole chain — backward recomputes from the bf16 inputs
                     XLA already has in HBM instead of storing f32 copies.
      pallas         kernels/fused_norm.dropout_add_ln (hardware-PRNG mask,
                     single read/write) — loses to xla here: XLA lays these
                     activations out (B)(D)(S) for the surrounding GEMMs and
                     relayout copies to feed the kernel eat the win.
    """
    if fused and not deterministic and rate > 0.0 and key is not None:
        if _LN_MODE == "pallas":
            from icek_tpu.kernels import fused_norm

            return fused_norm.dropout_add_ln(
                x.astype(compute_dtype), h.astype(compute_dtype),
                norm["scale"], norm["bias"], rate=rate, seed=_kernel_seed(key),
            )
        if _LN_MODE == "xla":

            def chain(n, x_, h_):
                y = layer_norm(n, x_ + dropout(h_, rate, key, False))
                return y.astype(compute_dtype)

            return jax.checkpoint(chain)(
                norm, x.astype(compute_dtype), h.astype(compute_dtype)
            )
    return layer_norm(norm, x + dropout(h, rate, key, deterministic))


def multi_head_attention(
    params,
    q_in: jnp.ndarray,            # (B, Tq, D)
    kv_in: jnp.ndarray,           # (B, Tk, D)
    num_heads: int,
    attn_mask: Optional[jnp.ndarray] = None,   # (Tq, Tk) additive, -inf masked
    dropout_rate: float = 0.0,
    dropout_key=None,
    deterministic: bool = True,
    compute_dtype=jnp.float32,
    kv_cache: Optional[dict] = None,
    cache_index: Optional[jnp.ndarray] = None,
    precomputed_kv: Optional[dict] = None,
    flash: bool = False,
    causal: bool = False,
):
    """Fused-projection MHA matching torch semantics.

    With `kv_cache` (dict with "k"/"v" of shape (B, Tmax, H, Hd)) and
    `cache_index`, the freshly projected K/V rows for the (single-step) input
    are written at `cache_index` and attention runs over the cache prefix —
    the on-device autoregressive decode path.
    With `precomputed_kv` (dict with "k"/"v" of shape (B, Tk, H, Hd)) the
    projections of a static memory are reused (cross-attention decode path).
    With `flash` (full-sequence passes only: no caches), the attention core
    runs as the fused Pallas kernel (kernels/flash_attention.py) — with
    in-kernel PRNG attention-weight dropout when training, score tensors
    never materialized either way; `causal` then replaces `attn_mask` (the
    only mask shape these passes use).
    Returns (output, updated_cache_or_None).
    """
    B, Tq, D = q_in.shape
    H = num_heads
    Hd = D // H
    w = params["qkv_w"].astype(compute_dtype)
    b = params["qkv_b"].astype(compute_dtype)

    if flash and kv_cache is None and precomputed_kv is None:
        # Fused Pallas path: zero-pad the projection weights so the GEMMs
        # emit the kernel's lane-aligned packed (B, T, H*slot) layout
        # directly — no transpose/pad/slice passes on the activations.
        from icek_tpu.kernels import flash_attention as fa

        if attn_mask is not None and not causal:
            raise ValueError(
                "the flash path only supports causal masking via `causal`; "
                "an explicit attn_mask would be silently dropped"
            )
        if dropout_rate > 0.0 and not deterministic and dropout_key is None:
            # match the stock path's failure mode (bernoulli(None) raises)
            # instead of silently reusing a constant zero seed every step
            raise ValueError(
                "dropout_key is required when dropout_rate > 0 and "
                "deterministic=False"
            )
        Tk = kv_in.shape[1]
        sub = 16
        tq_p, tk_p = -(-Tq // sub) * sub, -(-Tk // sub) * sub
        q_src = q_in.astype(compute_dtype)
        if tq_p != Tq:
            q_src = jnp.pad(q_src, ((0, 0), (0, tq_p - Tq), (0, 0)))
        if kv_in is q_in and tk_p == tq_p:
            kv_src = q_src
        else:
            kv_src = kv_in.astype(compute_dtype)
            if tk_p != Tk:
                kv_src = jnp.pad(kv_src, ((0, 0), (0, tk_p - Tk), (0, 0)))
        slot = fa.head_slot(Hd, fa.resolve_slot())
        qp = q_src @ fa.pack_heads(w[:, :D], H, slot) \
            + fa.pack_heads(b[:D], H, slot)
        kp = kv_src @ fa.pack_heads(w[:, D:2 * D], H, slot) \
            + fa.pack_heads(b[D:2 * D], H, slot)
        vp = kv_src @ fa.pack_heads(w[:, 2 * D:], H, slot) \
            + fa.pack_heads(b[2 * D:], H, slot)
        rate = 0.0 if deterministic else dropout_rate
        seed = None
        if rate > 0.0 and dropout_key is not None:
            seed = jax.random.randint(
                dropout_key, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
        outp = fa.flash_mha_packed(
            qp, kp, vp, head_dim=Hd, kv_len=Tk, causal=causal,
            dropout_rate=rate, seed=seed, slot=slot,
        )
        wo = fa.pack_rows(params["out"]["w"].astype(compute_dtype), H, slot)
        y = outp @ wo + params["out"]["b"].astype(compute_dtype)
        return y[:, :Tq], None

    q = q_in.astype(compute_dtype) @ w[:, :D] + b[:D]
    q = q.reshape(B, Tq, H, Hd)
    if precomputed_kv is not None:
        k = precomputed_kv["k"].astype(compute_dtype)
        v = precomputed_kv["v"].astype(compute_dtype)
        if k.shape[0] != B:
            # KV shared across beam groups: fold the beam factor into the
            # query-position axis so the big KV tensors are read once per
            # step, not once per hypothesis.
            G = B // k.shape[0]
            qg = q.reshape(k.shape[0], G * Tq, H, Hd)
            logits = jnp.einsum("bqhd,bkhd->bhqk", qg, k) / math.sqrt(Hd)
            weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            out = jnp.einsum(
                "bhqk,bkhd->bqhd", weights.astype(compute_dtype), v
            )
            out = out.reshape(B, Tq, D)
            return linear(params["out"], out, compute_dtype), None
    else:
        kv_proj = kv_in.astype(compute_dtype) @ w[:, D:] + b[D:]
        k, v = jnp.split(kv_proj, 2, axis=-1)
        k = k.reshape(B, -1, H, Hd)
        v = v.reshape(B, -1, H, Hd)

    new_cache = None
    if kv_cache is not None:
        # Write this step's K/V at cache_index, attend over the whole buffer.
        k_buf = jax.lax.dynamic_update_slice(
            kv_cache["k"], k.astype(kv_cache["k"].dtype), (0, cache_index, 0, 0)
        )
        v_buf = jax.lax.dynamic_update_slice(
            kv_cache["v"], v.astype(kv_cache["v"].dtype), (0, cache_index, 0, 0)
        )
        new_cache = {"k": k_buf, "v": v_buf}
        k, v = k_buf.astype(compute_dtype), v_buf.astype(compute_dtype)

    scale = 1.0 / math.sqrt(Hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    logits = logits.astype(jnp.float32)
    if attn_mask is not None:
        logits = logits + attn_mask
    if kv_cache is not None:
        # Mask out cache rows past the current step.
        Tk = kv_cache["k"].shape[1]
        valid = jnp.arange(Tk) <= cache_index
        logits = jnp.where(valid[None, None, None, :], logits, -jnp.inf)
    weights = jax.nn.softmax(logits, axis=-1)
    if not deterministic and dropout_rate > 0.0:
        weights = dropout(weights, dropout_rate, dropout_key, deterministic)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(compute_dtype), v)
    out = out.reshape(B, Tq, D)
    out = linear(params["out"], out, compute_dtype)
    return out, new_cache


def init_encoder_layer(key, d_model, ffn_dim):
    ks = jax.random.split(key, 3)
    return {
        "self_attn": init_mha(ks[0], d_model),
        "ffn": {
            "lin1": init_linear(ks[1], d_model, ffn_dim),
            "lin2": init_linear(ks[2], ffn_dim, d_model),
        },
        "norm1": init_layer_norm(d_model),
        "norm2": init_layer_norm(d_model),
    }


def _ffn(params, x, rate, key, deterministic, compute_dtype, fused=False):
    h = linear(params["lin1"], x, compute_dtype)
    h = jax.nn.relu(h)
    if (fused and _LN_MODE == "pallas" and not deterministic and rate > 0.0
            and key is not None):
        from icek_tpu.kernels import fused_norm

        h = fused_norm.hw_dropout(h, rate=rate, seed=_kernel_seed(key))
    else:
        h = dropout(h, rate, key, deterministic)
    return linear(params["lin2"], h, compute_dtype)


def encoder_layer(
    params, x, num_heads, rate=0.0, rng=None, deterministic=True,
    compute_dtype=jnp.float32, flash=False,
):
    """Post-LN transformer encoder layer (self-attn + FFN)."""
    keys = jax.random.split(rng, 4) if rng is not None else [None] * 4
    attn, _ = multi_head_attention(
        params["self_attn"], x, x, num_heads,
        dropout_rate=rate, dropout_key=keys[0], deterministic=deterministic,
        compute_dtype=compute_dtype, flash=flash,
    )
    x = residual_norm(params["norm1"], x, attn, rate, keys[1], deterministic,
                      flash, compute_dtype)
    ff = _ffn(params["ffn"], x, rate, keys[2], deterministic, compute_dtype,
              fused=flash)
    x = residual_norm(params["norm2"], x, ff, rate, keys[3], deterministic,
                      flash, compute_dtype)
    return x


def init_decoder_layer(key, d_model, ffn_dim):
    ks = jax.random.split(key, 4)
    return {
        "self_attn": init_mha(ks[0], d_model),
        "cross_attn": init_mha(ks[1], d_model),
        "ffn": {
            "lin1": init_linear(ks[2], d_model, ffn_dim),
            "lin2": init_linear(ks[3], ffn_dim, d_model),
        },
        "norm1": init_layer_norm(d_model),
        "norm2": init_layer_norm(d_model),
        "norm3": init_layer_norm(d_model),
    }


def decoder_layer(
    params, x, memory, num_heads, causal_mask=None, rate=0.0, rng=None,
    deterministic=True, compute_dtype=jnp.float32,
    kv_cache=None, cache_index=None, cross_kv=None, flash=False,
):
    """Post-LN transformer decoder layer (masked self-attn, cross-attn, FFN).

    With `kv_cache` = {"self": {k,v}} the layer runs one decode step: x is
    (B, 1, D), self-attn K/V append to the cache; `cross_kv` supplies the
    precomputed memory projections.
    Returns (output, new_self_cache_or_None).
    """
    keys = jax.random.split(rng, 6) if rng is not None else [None] * 6
    self_cache = kv_cache["self"] if kv_cache is not None else None
    attn, new_self_cache = multi_head_attention(
        params["self_attn"], x, x, num_heads, attn_mask=causal_mask,
        dropout_rate=rate, dropout_key=keys[0], deterministic=deterministic,
        compute_dtype=compute_dtype, kv_cache=self_cache, cache_index=cache_index,
        flash=flash, causal=causal_mask is not None,
    )
    x = residual_norm(params["norm1"], x, attn, rate, keys[1], deterministic,
                      flash, compute_dtype)
    cross, _ = multi_head_attention(
        params["cross_attn"], x, memory, num_heads,
        dropout_rate=rate, dropout_key=keys[2], deterministic=deterministic,
        compute_dtype=compute_dtype, precomputed_kv=cross_kv, flash=flash,
    )
    x = residual_norm(params["norm2"], x, cross, rate, keys[3], deterministic,
                      flash, compute_dtype)
    ff = _ffn(params["ffn"], x, rate, keys[4], deterministic, compute_dtype,
              fused=flash)
    x = residual_norm(params["norm3"], x, ff, rate, keys[5], deterministic,
                      flash, compute_dtype)
    return x, new_self_cache


def init_encoder_stack(key, num_layers, d_model, ffn_dim):
    return {
        "layers": [
            init_encoder_layer(k, d_model, ffn_dim)
            for k in jax.random.split(key, num_layers)
        ]
    }


def encoder_stack(params, x, num_heads, rate=0.0, rng=None, deterministic=True,
                  compute_dtype=jnp.float32, flash=False):
    for i, layer in enumerate(params["layers"]):
        sub = jax.random.fold_in(rng, i) if rng is not None else None
        x = encoder_layer(layer, x, num_heads, rate, sub, deterministic,
                          compute_dtype, flash=flash)
    return x


def init_decoder_stack(key, num_layers, d_model, ffn_dim):
    return {
        "layers": [
            init_decoder_layer(k, d_model, ffn_dim)
            for k in jax.random.split(key, num_layers)
        ]
    }


def decoder_stack(params, x, memory, num_heads, causal_mask=None, rate=0.0,
                  rng=None, deterministic=True, compute_dtype=jnp.float32,
                  kv_caches=None, cache_index=None, cross_kvs=None, flash=False):
    """Run the decoder layers; returns (output, new_kv_caches_or_None)."""
    new_caches = [] if kv_caches is not None else None
    for i, layer in enumerate(params["layers"]):
        sub = jax.random.fold_in(rng, i) if rng is not None else None
        cache = kv_caches[i] if kv_caches is not None else None
        cross = cross_kvs[i] if cross_kvs is not None else None
        x, new_self = decoder_layer(
            layer, x, memory, num_heads, causal_mask, rate, sub, deterministic,
            compute_dtype, kv_cache=cache, cache_index=cache_index, cross_kv=cross,
            flash=flash,
        )
        if new_caches is not None:
            new_caches.append({"self": new_self})
    return x, new_caches


def precompute_cross_kv(params, memory, num_heads, compute_dtype=jnp.float32):
    """Project a static memory through every decoder layer's cross-attention
    K/V once, so the per-step decode never re-touches the memory matmuls."""
    B, M, D = memory.shape
    H = num_heads
    out = []
    for layer in params["layers"]:
        w = layer["cross_attn"]["qkv_w"].astype(compute_dtype)
        b = layer["cross_attn"]["qkv_b"].astype(compute_dtype)
        kv = memory.astype(compute_dtype) @ w[:, D:] + b[D:]
        k, v = jnp.split(kv, 2, axis=-1)
        out.append(
            {"k": k.reshape(B, M, H, D // H), "v": v.reshape(B, M, H, D // H)}
        )
    return out


def init_self_kv_cache(num_layers, batch, max_len, num_heads, head_dim,
                       dtype=jnp.float32):
    """Zeroed per-layer self-attention KV buffers for the decode scan."""
    return [
        {
            "self": {
                "k": jnp.zeros((batch, max_len, num_heads, head_dim), dtype),
                "v": jnp.zeros((batch, max_len, num_heads, head_dim), dtype),
            }
        }
        for _ in range(num_layers)
    ]


def causal_mask(length: int) -> jnp.ndarray:
    """(T, T) additive mask: 0 on/below the diagonal, -inf above."""
    i = jnp.arange(length)[:, None]
    j = jnp.arange(length)[None, :]
    return jnp.where(j <= i, 0.0, -jnp.inf).astype(jnp.float32)


def sinusoidal_positions(max_len: int, d_model: int) -> np.ndarray:
    """Standard sin/cos table (reference: geo-aware/models.py:184-209)."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model)
    )
    table = np.zeros((max_len, d_model), dtype=np.float32)
    table[:, 0::2] = np.sin(position * div)
    table[:, 1::2] = np.cos(position * div[: table[:, 1::2].shape[1]])
    return table
