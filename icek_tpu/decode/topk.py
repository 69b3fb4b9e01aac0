"""Exact top-k via iterative argmax.

``jax.lax.top_k`` lowers to a full sort on this TPU backend — profiled at
~1.7 ms/step on (256, 10301) scores, the single largest cost of the greedy
decode loop.  For the tiny k of beam/greedy decoding (k <= ~8), k passes of
argmax + masking are exact (identical first-occurrence tie-breaking: argmax
returns the first maximum, and masking removes already-taken positions) and
run as cheap VPU max-reductions instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def top_k_two_stage(total: jnp.ndarray, k: int):
    """Exact top-k over the flattened last two axes of (B, K, S) without
    materializing the (B, K*S) flatten (which costs a physical layout copy
    at beam shapes).  Stage 1 takes top-k within each K row; stage 2 ranks
    the K*k finalists.  Returns (values, flat_indices) identical to
    ``top_k(total.reshape(B, K*S), k)`` up to exact-tie ordering.
    """
    B, K, S = total.shape
    vals1, idx1 = top_k(total, k)                    # (B, K, k) per parent
    flat1 = (jnp.arange(K, dtype=jnp.int32)[None, :, None] * S + idx1)
    vals2, pos2 = top_k(vals1.reshape(B, K * k), k)  # (B, k) among finalists
    flat = jnp.take_along_axis(flat1.reshape(B, K * k), pos2, axis=-1)
    return vals2, flat


def top_k(x: jnp.ndarray, k: int, seg: int = 512):
    """Drop-in replacement for jax.lax.top_k on the last axis (small k).

    Returns (values, indices), values sorted descending, ties broken by
    ascending index — the lax.top_k contract.

    Large rows use the segmented formulation (one full max+argmax pass,
    then k rounds over the tiny per-segment maxima — profiled: the plain
    iterative argmax re-reads the full (B*K, S) scores k times, ~60 us per
    pass at the beam-5 flagship shapes); small rows keep the simple
    iterative argmax.
    """
    n = x.shape[-1]
    if n >= 4 * seg:
        return _top_k_segmented(x, k, seg)
    positions = jnp.arange(n, dtype=jnp.int32)
    work = x
    vals = []
    idxs = []
    for _ in range(k):
        idx = jnp.argmax(work, axis=-1).astype(jnp.int32)
        val = jnp.take_along_axis(x, idx[..., None], axis=-1)[..., 0]
        vals.append(val)
        idxs.append(idx)
        work = jnp.where(positions == idx[..., None], -jnp.inf, work)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def _top_k_segmented(x: jnp.ndarray, k: int, seg: int):
    """Exact top-k reading the full row ONCE.

    Stage 1: per-segment (max, argmax) in a single fused reduction pass.
    Stage 2: k rounds of argmax over the (n/seg)-wide segment maxima; each
    round re-derives only the winning segment (a seg-wide gather) with the
    already-taken positions masked, preserving lax.top_k's
    first-occurrence tie order (earlier segments win ties between
    segments, earlier positions win within a segment).
    """
    n = x.shape[-1]
    nseg = -(-n // seg)
    pad = nseg * seg - n
    if pad:
        # concat fuses into the reduction read; -inf never wins
        x = jnp.concatenate(
            [x, jnp.full(x.shape[:-1] + (pad,), -jnp.inf, x.dtype)], axis=-1
        )
    xs = x.reshape(x.shape[:-1] + (nseg, seg))
    seg_max = jnp.max(xs, axis=-1)                       # (..., nseg)
    seg_arg = jnp.argmax(xs, axis=-1).astype(jnp.int32)
    pos_in_seg = jnp.arange(seg, dtype=jnp.int32)
    seg_iota = jnp.arange(nseg, dtype=jnp.int32)
    vals, idxs = [], []
    for _ in range(k):
        s = jnp.argmax(seg_max, axis=-1).astype(jnp.int32)   # (...)
        val = jnp.take_along_axis(seg_max, s[..., None], axis=-1)[..., 0]
        within = jnp.take_along_axis(seg_arg, s[..., None], axis=-1)[..., 0]
        gidx = s * seg + within
        vals.append(val)
        idxs.append(gidx)
        # refresh the winning segment with all taken positions masked
        row = jnp.take_along_axis(
            xs, s[..., None, None], axis=-2
        )[..., 0, :]                                          # (..., seg)
        row_pos = s[..., None] * seg + pos_in_seg
        for t in idxs:
            row = jnp.where(row_pos == t[..., None], -jnp.inf, row)
        new_max = jnp.max(row, axis=-1)
        new_arg = jnp.argmax(row, axis=-1).astype(jnp.int32)
        hit = seg_iota == s[..., None]
        seg_max = jnp.where(hit, new_max[..., None], seg_max)
        seg_arg = jnp.where(hit, new_arg[..., None], seg_arg)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)
