"""Pallas TPU kernel: fused copy-score vocabulary matmul + top-k + logsumexp.

The decode loop's scoring head computes logits over the extended
[vocab | entities | facts] vocabulary and then only ever consumes
  * the top-k entries (argmax/top-2 for greedy with repetition cleanup,
    top-K for beam), and
  * the row logsumexp (to turn the chosen entries into log-probabilities).

XLA materializes the (N, V+E+F) score tensor in HBM (10-53 MB per decode
step) and re-reads it for every top-k pass.  This kernel streams the vocab
projection tile-by-tile through VMEM, maintaining a running top-k and an
online logsumexp, and never writes the scores to HBM at all.  The (small)
entity/fact pointer logits are computed outside (they are cheap einsums
over per-image context tables) and merged as a final tail tile, preserving
lax.top_k's first-index tie-breaking (vocab entries win ties against tail
entries, lower indices win within a region).

Used by the greedy and beam decoders on TPU; the pure-XLA path remains as
fallback (and as the oracle in tests/test_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _merge_topk(vals_ref, idx_ref, scores, base, k):
    """Merge a (N, T) score tile (global indices base+t) into the running
    (N, k) top-k scratch, via k extract-and-mask passes.

    Ties keep the incumbent (strict >), so earlier tiles / lower indices
    win — the lax.top_k contract.
    """
    n, t = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (n, t), 1)
    work = scores
    for _ in range(k):
        tile_max = jnp.max(work, axis=1, keepdims=True)            # (N, 1)
        tile_arg = jnp.argmax(work, axis=1).astype(jnp.int32)      # (N,)
        work = jnp.where(col == tile_arg[:, None], NEG, work)
        cand_v = tile_max                                          # (N, 1)
        cand_i = (tile_arg + base)[:, None]
        # bubble insertion — pure elementwise compare/swap per slot (Mosaic
        # miscompiles reductions over the tiny k-lane running buffers)
        for slot in range(k):
            rv = vals_ref[:, slot : slot + 1]
            ri = idx_ref[:, slot : slot + 1]
            swap = cand_v > rv                                     # strict: incumbent wins ties
            vals_ref[:, slot : slot + 1] = jnp.where(swap, cand_v, rv)
            idx_ref[:, slot : slot + 1] = jnp.where(swap, cand_i, ri)
            cand_v = jnp.where(swap, rv, cand_v)
            cand_i = jnp.where(swap, ri, cand_i)


def _score_topk_kernel(
    h_ref, wv_ref, bv_ref, tail_ref,
    vals_out, idx_out, lse_out,
    vals_s, idx_s, m_s, s_s,
    *, k, vocab_size, tile, n_tiles,
):
    j = pl.program_id(1)  # vocab-tile index (rows are the outer grid dim)

    @pl.when(j == 0)
    def _init():
        vals_s[:] = jnp.full_like(vals_s[:], NEG)
        idx_s[:] = jnp.zeros_like(idx_s[:])
        m_s[:] = jnp.full_like(m_s[:], NEG)
        s_s[:] = jnp.zeros_like(s_s[:])

    scores = (
        jnp.dot(h_ref[:], wv_ref[:], preferred_element_type=jnp.float32)
        + bv_ref[:].astype(jnp.float32)  # (1, tile) broadcasts over rows
    )
    # mask the padding columns of the final vocab tile
    base = j * tile
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    scores = jnp.where(col < vocab_size, scores, NEG)

    def _online_lse(x):
        new_m = jnp.maximum(m_s[:], jnp.max(x, axis=1, keepdims=True))
        s_s[:] = s_s[:] * jnp.exp(m_s[:] - new_m) + jnp.sum(
            jnp.exp(x - new_m), axis=1, keepdims=True
        )
        m_s[:] = new_m

    _online_lse(scores)
    _merge_topk(vals_s, idx_s, scores, base, k)

    @pl.when(j == n_tiles - 1)
    def _finish():
        tail = tail_ref[:].astype(jnp.float32)
        _online_lse(tail)
        _merge_topk(vals_s, idx_s, tail, vocab_size, k)
        vals_out[:] = vals_s[:]
        idx_out[:] = idx_s[:]
        lse_out[:] = m_s[:] + jnp.log(s_s[:])


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def fused_score_topk(h, wv, bv, tail, k: int = 5, tile: int = 512):
    """h: (N, D); wv: (D, V); bv: (V,); tail: (N, T) precomputed pointer
    logits (entities [+ facts], already gated/biased).

    Returns (top_vals (N, k) f32, top_idx (N, k) int32 over the extended
    vocabulary [V | tail], lse (N,) f32 logsumexp of the full row).
    """
    n, d = h.shape
    v = wv.shape[1]
    true_tail = tail.shape[1]
    n_tiles = -(-v // tile)
    v_pad = n_tiles * tile
    if v_pad != v:
        wv = jnp.pad(wv, ((0, 0), (0, v_pad - v)))
        bv = jnp.pad(bv, (0, v_pad - v))
    bv = bv[None, :]  # 2-D so the block tiling matches XLA's layout
    # pad the tail to full lanes; padding scores NEG so they never win
    tail_pad = -(-true_tail // 128) * 128
    if tail_pad != true_tail:
        tail = jnp.pad(
            tail, ((0, 0), (0, tail_pad - true_tail)), constant_values=NEG
        )
    # row-block the grid so VMEM holds one (rows, tile) score tile at a time
    rows = min(n, 512)
    n_row_blocks = -(-n // rows)
    if n_row_blocks * rows != n:
        pad_rows = n_row_blocks * rows - n
        h = jnp.pad(h, ((0, pad_rows), (0, 0)))
        tail = jnp.pad(tail, ((0, pad_rows), (0, 0)), constant_values=NEG)
    n_padded = n_row_blocks * rows
    grid = (n_row_blocks, n_tiles)
    out_shapes = (
        jax.ShapeDtypeStruct((n_padded, k), jnp.float32),
        jax.ShapeDtypeStruct((n_padded, k), jnp.int32),
        jax.ShapeDtypeStruct((n_padded, 1), jnp.float32),
    )
    kernel = functools.partial(
        _score_topk_kernel, k=k, vocab_size=v, tile=tile, n_tiles=n_tiles
    )
    vals, idx, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, d), lambda r, j: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda r, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rows, tail.shape[1]), lambda r, j: (r, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((rows, k), lambda r, j: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, k), lambda r, j: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda r, j: (r, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((rows, k), jnp.float32),
            pltpu.VMEM((rows, k), jnp.int32),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
        ],
    )(h, wv, bv, tail)
    return vals[:n], idx[:n], lse[:n, 0]


def reference_score_topk(h, wv, bv, tail, k: int = 5):
    """Pure-XLA oracle with identical semantics (for tests + fallback)."""
    scores = jnp.concatenate(
        [h.astype(jnp.float32) @ wv.astype(jnp.float32) + bv, tail.astype(jnp.float32)],
        axis=1,
    )
    vals, idx = jax.lax.top_k(scores, k)
    lse = jax.nn.logsumexp(scores, axis=1)
    return vals, idx.astype(jnp.int32), lse
