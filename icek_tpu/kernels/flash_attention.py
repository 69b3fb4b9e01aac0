"""Pallas TPU kernel: fused training attention with in-kernel PRNG dropout.

The train step's profiled hotspot is the (B, H, 301, 301) attention inside
the entity/fact context encoders plus the decoder's self/cross attention
(reference semantics: attention-weight dropout inside nn.TransformerEncoder /
nn.TransformerDecoder, knowledge-aware/models.py:324, geo-aware/models.py:241).
The stock XLA path materializes the (B, H, Tq, Tk) softmax weights in HBM,
generates a threefry dropout mask of the same shape (~100 VPU ops/element),
and saves both as residuals for the backward pass.

This kernel never writes the weights to HBM at all:

  forward   per (b, h): S = QK^T, masked softmax, hardware-PRNG dropout,
            O = (dropout(P)) V — one program, everything in VMEM.
  backward  recomputes S and P from the saved Q/K/V (identical reduction
            order => identical values), regenerates the *same* dropout mask
            by reseeding the hardware PRNG with the same (seed, b, h), and
            produces dQ/dK/dV in one program per (b, h).

Layout: head_dim 30 is lane-hostile, so Q/K/V arrive PACKED as
(B, T, H * slot) — each head padded to a lane-aligned slot.  The caller
produces this layout for free by zero-padding the projection weights
(see `pack_heads` / models/transformer.py): the projection GEMM then emits
the packed tensor directly and no transpose/pad/slice passes ever touch the
(B, T, H, Hd) activations (those cost ~40% of the train step when done as
separate XLA ops).  Zero pad lanes contribute zero to every contraction.

Two slot widths (resolve_slot / ICEK_FLASH_SLOT):
  slot=128  one head per 128-lane block, grid (B, H): every dot is a
            dense single-MXU-pass (T, 128) GEMM, but HBM stores 128/30 =
            4.27x the real data.
  slot=32   four heads per 128-lane block, grid (B, H_pad/4): the kernel
            loops over the 4 head groups, isolating each head's scores by
            LANE-MASKING one dot operand (the other operand's cross-head
            lanes then multiply zeros) — contraction stays a dense 128
            lanes (same MXU pass count as slot=128, masks are cheap VPU
            selects) while HBM shrinks to 384/1280 = 3.3x less for the
            10-head presets.  H*32 is padded up to a 128 multiple with
            dummy heads whose projections are zero weights: their scores
            are all zero -> uniform softmax -> AV against zero V -> zero
            output, and the packed out-projection rows for them are zero,
            so they contribute nothing in either direction.

Sequence lengths here are small enough (Tk <= 896 across all presets) that a
full (Tq, Tk) tile per (b, h) fits VMEM comfortably — no online-softmax
streaming needed.

On CPU the kernel runs under the Mosaic interpreter (pltpu.InterpretParams),
where prng_random_bits returns zeros — every weight would be kept but still
scaled by 1/(1-rate), silently inflating attention outputs.  The entry
points therefore REJECT dropout_rate > 0 under the interpreter
(ValueError); CPU tests exercise the deterministic path only, and dropout
statistics / fwd-bwd mask-consistency tests are TPU-gated
(tests/test_tpu_smoke.py).
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
LANE = 128


class _Static(NamedTuple):
    causal: bool
    kv_len: int       # true key/value length (cols beyond it are masked)
    head_dim: int     # true head dim (sets the softmax scale)
    rate: float       # attention-weight dropout rate
    interpret: bool
    slot: int = LANE  # lanes per head slot (128 % slot == 0)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _prec(*operands):
    """float32 operands get true-f32 MXU passes (the TPU default quietly
    rounds f32 matmul inputs to bfloat16 — fine for the bf16 production
    mode, wrong for the f32 parity mode)."""
    if all(o.dtype == jnp.float32 for o in operands):
        return jax.lax.Precision.HIGHEST
    return None


def _valid_mask(tq: int, tk: int, st: _Static):
    """(Tq, Tk) bool score mask — group-independent, so computed ONCE per
    program (not per head group)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    valid = col < st.kv_len
    if st.causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
        valid = jnp.logical_and(valid, col <= row)
    return valid


def _softmax_parts(s, valid):
    """Masked softmax split as (numerator e, per-row reciprocal r): callers
    multiply e*r instead of dividing per element (VPU divide is multi-op;
    the reciprocal is one (Tq, 1) op), and can fold row-constant factors
    (dropout 1/(1-rate)) into r for free."""
    s = jnp.where(valid, s, NEG)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    return e, 1.0 / jnp.sum(e, axis=1, keepdims=True)


def _keep_mask(shape, seed_ref, st: _Static, group: int):
    """Regenerable dropout keep-mask from the hardware PRNG.

    Seeded per (batch, head) so the backward kernel reproduces the exact
    mask by reseeding with the same values; with grouped slots the head id
    is (block, group-within-block).
    """
    hpb = LANE // st.slot
    pid = (pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)) * hpb
    pltpu.prng_seed(seed_ref[0] + pid + group)  # Mosaic: single-arg seed only
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # keep iff the top 24 bits < (1-rate)*2^24 — a pure int compare (the
    # equivalent float formulation costs an int->f32 convert + multiply)
    thresh = int((1.0 - st.rate) * (1 << 24))
    return pltpu.bitcast(bits >> 8, jnp.int32) < thresh


def _group_ids(rows: int, slot: int):
    """(rows, LANE) int32 head-group id per lane (hoisted out of the group
    loop; per group the operand mask is then a single compare + select)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    return lane // slot


def _mask_to(arr, grp_ids, group: int, scale: float = 1.0):
    """Zero every lane outside head-group `group` (a VPU select; the dense
    128-lane contraction then only picks up this group's lanes because the
    OTHER operand's cross-head lanes multiply these zeros).  `scale` folds
    a scalar factor into the kept lanes (used for the softmax 1/sqrt(hd):
    scaling the (T, 128) operand is ~Tk/128 x cheaper than scaling the
    (Tq, Tk) score matrix)."""
    kept = arr if scale == 1.0 else arr * jnp.asarray(scale, arr.dtype)
    return jnp.where(grp_ids == group, kept, jnp.zeros((), arr.dtype))


def _scores(qg, k):
    return jax.lax.dot_general(
        qg, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(qg, k),
    )


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, st: _Static):
    hpb = LANE // st.slot
    scale = 1.0 / math.sqrt(st.head_dim)
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    valid = _valid_mask(q.shape[0], k.shape[0], st)
    gq = _group_ids(q.shape[0], st.slot)
    gk = _group_ids(k.shape[0], st.slot)
    acc = None
    for g in range(hpb):
        # the scale rides the Q operand into the dot (free vs scaling s)
        if hpb == 1:
            qg = q * jnp.asarray(scale, q.dtype)
            vg = v
        else:
            qg = _mask_to(q, gq, g, scale)
            vg = _mask_to(v, gk, g)
        e, r = _softmax_parts(_scores(qg, k), valid)
        if st.rate > 0.0:
            keep = _keep_mask(e.shape, seed_ref, st, g)
            r = r * (1.0 / (1.0 - st.rate))     # (Tq, 1): free
            p = jnp.where(keep, e, 0.0) * r
        else:
            p = e * r
        o = jnp.dot(
            p.astype(v.dtype), vg, preferred_element_type=jnp.float32,
            precision=_prec(v),
        )
        acc = o if acc is None else acc + o
    o_ref[0] = acc.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, st: _Static):
    hpb = LANE // st.slot
    scale = 1.0 / math.sqrt(st.head_dim)
    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    valid = _valid_mask(q.shape[0], k.shape[0], st)
    gq = _group_ids(q.shape[0], st.slot)
    gk = _group_ids(k.shape[0], st.slot)
    dq_acc = dk_acc = dv_acc = None
    for g in range(hpb):
        if hpb == 1:
            qg = q * jnp.asarray(scale, q.dtype)
            kg, dog = k, do
        else:
            qg = _mask_to(q, gq, g, scale)  # qg carries the softmax scale
            kg = _mask_to(k, gk, g)
            dog = _mask_to(do, gq, g)
        e, r = _softmax_parts(_scores(qg, k), valid)
        p = e * r
        if st.rate > 0.0:
            inv = 1.0 / (1.0 - st.rate)
            keep = _keep_mask(p.shape, seed_ref, st, g)
            pd = jnp.where(keep, p, 0.0) * inv
        else:
            pd = p
        # dV = dropout(P)^T dO_g (dog's cross-head lanes are zero, so the
        # accumulated dv slots stay disjoint)
        dv = jax.lax.dot_general(
            pd.astype(dog.dtype), dog, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(do),
        )
        # dP = dO_g V^T (dense 128-lane contraction; dog masks it to g),
        # routed back through the dropout mask
        dp = jax.lax.dot_general(
            dog, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(do, v),
        )
        if st.rate > 0.0:
            dp = jnp.where(keep, dp, 0.0) * inv
        # softmax backward: dS = P * (dP - sum(dP * P)), wrt the PRE-scaled
        # scores qg.k — so dk takes qg (scale included) directly and dq is
        # rescaled once per group on the small (Tq, 128) result
        ds = (p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))).astype(q.dtype)
        # dQ/dK need the masked K/Q: ds is per-head-g, an unmasked operand
        # would smear grads into other heads' lanes
        dq = jnp.dot(ds, kg, preferred_element_type=jnp.float32,
                     precision=_prec(k)) * scale
        dk = jax.lax.dot_general(
            ds, qg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(q),
        )
        dq_acc = dq if dq_acc is None else dq_acc + dq
        dk_acc = dk if dk_acc is None else dk_acc + dk
        dv_acc = dv if dv_acc is None else dv_acc + dv
    dq_ref[0] = dq_acc.astype(dq_ref.dtype)
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _block_specs(tq_p, tk_p):
    """Blocks over the packed (B, T_pad, H*LANE) layout: one (T_pad, LANE)
    head slot per (b, h) program — lane-aligned, no relayouts."""
    q_spec = pl.BlockSpec((1, tq_p, LANE), lambda b, h, s: (b, 0, h),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, tk_p, LANE), lambda b, h, s: (b, 0, h),
                           memory_space=pltpu.VMEM)
    return q_spec, kv_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash(st: _Static, q, k, v, seed):
    out, _ = _flash_fwd(st, q, k, v, seed)
    return out


def _flash_fwd(st: _Static, q, k, v, seed):
    B, tq_p, HL = q.shape
    tk_p = k.shape[1]
    H = HL // LANE
    q_spec, kv_spec = _block_specs(tq_p, tk_p)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, st=st),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H),
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=pltpu.InterpretParams() if st.interpret else False,
    )(seed, q, k, v)
    return out, (q, k, v, seed)


def _flash_bwd(st: _Static, res, g):
    q, k, v, seed = res
    B, tq_p, HL = q.shape
    tk_p = k.shape[1]
    H = HL // LANE
    q_spec, kv_spec = _block_specs(tq_p, tk_p)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, st=st),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H),
            in_specs=[q_spec, kv_spec, kv_spec, q_spec],
            out_specs=(q_spec, kv_spec, kv_spec),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        interpret=pltpu.InterpretParams() if st.interpret else False,
    )(seed, q, k, v, g)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dseed


_flash.defvjp(_flash_fwd, _flash_bwd)


def resolve_slot(explicit: Optional[int] = None) -> int:
    """Head-slot lane width: explicit arg > ICEK_FLASH_SLOT env > default."""
    if explicit is not None:
        return int(explicit)
    env = os.environ.get("ICEK_FLASH_SLOT")
    if env:
        return int(env)
    return 32


def head_slot(head_dim: int, slot: Optional[int] = None) -> int:
    """Lanes per packed head slot: the requested width, doubled as needed
    to cover head_dim (so e.g. slot=32 with head_dim 50 packs at 64).
    Must divide LANE; head dims beyond LANE are unsupported."""
    if head_dim > LANE:
        raise ValueError(f"head_dim {head_dim} > {LANE} is unsupported")
    slot = LANE if slot is None else slot
    if not (0 < slot <= LANE and LANE % slot == 0):
        raise ValueError(f"slot {slot} must divide LANE ({LANE})")
    while slot < head_dim:
        slot *= 2
    return slot


def _packed_width(num_heads: int, slot: int) -> int:
    """Total packed lane count: head slots plus dummy-head padding up to a
    LANE multiple (dummy heads carry zero weights -> zero contributions)."""
    return _round_up(num_heads * slot, LANE)


def pack_heads(w: jnp.ndarray, num_heads: int,
               slot: Optional[int] = None) -> jnp.ndarray:
    """Zero-pad a (..., H*Hd) projection so each head occupies a full
    lane-aligned slot: (..., H*Hd) -> (..., _packed_width(H, slot)).

    Applying this to the Q/K/V projection weights (and biases) makes the
    projection GEMM emit the kernel's packed layout directly — the padding
    costs extra MXU flops instead of a separate HBM pad pass.
    """
    hd = w.shape[-1] // num_heads
    slot = head_slot(hd, slot)
    total = _packed_width(num_heads, slot)
    if slot == hd and total == w.shape[-1]:
        return w
    parts = w.reshape(w.shape[:-1] + (num_heads, hd))
    parts = jnp.pad(parts, [(0, 0)] * (parts.ndim - 1) + [(0, slot - hd)])
    out = parts.reshape(w.shape[:-1] + (num_heads * slot,))
    if total != num_heads * slot:
        out = jnp.pad(
            out, [(0, 0)] * (out.ndim - 1) + [(0, total - num_heads * slot)]
        )
    return out


def unpack_heads(w: jnp.ndarray, num_heads: int, head_dim: int,
                 slot: Optional[int] = None) -> jnp.ndarray:
    """Inverse of pack_heads on the last axis."""
    slot = head_slot(head_dim, slot)
    if slot == head_dim and w.shape[-1] == num_heads * head_dim:
        return w
    parts = w[..., :num_heads * slot]
    parts = parts.reshape(w.shape[:-1] + (num_heads, slot))[..., :head_dim]
    return parts.reshape(w.shape[:-1] + (num_heads * head_dim,))


def pack_rows(w: jnp.ndarray, num_heads: int,
              slot: Optional[int] = None) -> jnp.ndarray:
    """Zero-pad the FIRST axis of an (H*Hd, ...) matrix to head slots, so a
    packed attention output can hit the out-projection GEMM directly."""
    hd = w.shape[0] // num_heads
    slot = head_slot(hd, slot)
    total = _packed_width(num_heads, slot)
    if slot == hd and total == w.shape[0]:
        return w
    parts = w.reshape((num_heads, hd) + w.shape[1:])
    parts = jnp.pad(parts, [(0, 0), (0, slot - hd)] + [(0, 0)] * (w.ndim - 1))
    out = parts.reshape((num_heads * slot,) + w.shape[1:])
    if total != num_heads * slot:
        out = jnp.pad(
            out, [(0, total - num_heads * slot)] + [(0, 0)] * (w.ndim - 1)
        )
    return out


def flash_mha_packed(
    q: jnp.ndarray,                  # (B, Tq, packed_width) packed
    k: jnp.ndarray,                  # (B, Tk, packed_width) packed
    v: jnp.ndarray,                  # (B, Tk, packed_width) packed
    *,
    head_dim: int,
    kv_len: Optional[int] = None,    # true Tk (cols beyond are masked)
    causal: bool = False,
    dropout_rate: float = 0.0,
    seed: Optional[jnp.ndarray] = None,   # (1,) int32, required if rate > 0
    interpret: Optional[bool] = None,
    slot: Optional[int] = None,      # lanes per head slot (see resolve_slot)
):
    """Fused attention over head-slot-packed tensors; returns the packed
    (B, Tq, H*head_slot) output.  Query pad rows are NOT masked: their
    output rows are garbage that the caller must slice away (the packed
    out-projection + slice in models/transformer.py does), while key pad
    cols beyond `kv_len` ARE masked (they would corrupt real rows)."""
    B, Tq, HL = q.shape
    Tk = k.shape[1]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if interpret and dropout_rate > 0.0:
        raise ValueError(
            "flash attention with dropout_rate > 0 is unsupported under the "
            "Mosaic interpreter (CPU): interpreted prng_random_bits returns "
            "zeros, which would keep every weight yet still scale by "
            "1/(1-rate). Run deterministic, or on real TPU hardware."
        )
    kv_len = Tk if kv_len is None else kv_len
    slot = head_slot(head_dim, resolve_slot(slot))
    if HL % LANE != 0:
        raise ValueError(f"packed width {HL} must be a multiple of {LANE}")
    sub = 16  # sublane multiple covering both float32 and bfloat16 tiles
    tq_p, tk_p = _round_up(Tq, sub), _round_up(Tk, sub)
    pad = lambda x, t: jnp.pad(x, ((0, 0), (0, t - x.shape[1]), (0, 0)))
    q, k, v = pad(q, tq_p), pad(k, tk_p), pad(v, tk_p)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    st = _Static(
        causal=causal, kv_len=kv_len, head_dim=head_dim,
        rate=float(dropout_rate), interpret=bool(interpret), slot=slot,
    )
    out = _flash(st, q, k, v, seed.astype(jnp.int32))
    return out[:, :Tq]


def flash_mha(
    q: jnp.ndarray,                  # (B, Tq, H, Hd)
    k: jnp.ndarray,                  # (B, Tk, H, Hd)
    v: jnp.ndarray,                  # (B, Tk, H, Hd)
    *,
    causal: bool = False,
    dropout_rate: float = 0.0,
    seed: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
    slot: Optional[int] = None,
):
    """Per-head-shaped convenience wrapper (tests, ad-hoc use): packs heads
    into lane slots (a pad, no transpose), runs the kernel, unpacks.
    Equivalent (up to float reduction order) to
        softmax(Q K^T / sqrt(Hd) + masks) -> attention-weight dropout -> @ V
    i.e. the torch nn.MultiheadAttention training semantics the stock path in
    models/transformer.py implements.  Returns (B, Tq, H, Hd).
    """
    B, Tq, H, Hd = q.shape
    slot = head_slot(Hd, resolve_slot(slot))
    flat = lambda x: pack_heads(
        x.reshape(x.shape[0], x.shape[1], H * Hd), H, slot
    )
    out = flash_mha_packed(
        flat(q), flat(k), flat(v), head_dim=Hd, causal=causal,
        dropout_rate=dropout_rate, seed=seed, interpret=interpret, slot=slot,
    )
    return unpack_heads(out, H, Hd, slot).reshape(B, Tq, H, Hd)


def reference_mha(q, k, v, *, causal=False):
    """Pure-XLA oracle with identical masking semantics (rate 0)."""
    Hd = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(Hd)
    logits = logits.astype(jnp.float32)
    if causal:
        Tq, Tk = q.shape[1], k.shape[1]
        i = jnp.arange(Tq)[:, None]
        j = jnp.arange(Tk)[None, :]
        logits = jnp.where(j <= i, logits, NEG)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v)
