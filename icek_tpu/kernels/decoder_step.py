"""Pallas TPU megakernel: one fused beam-decode step (all decoder layers).

The batched beam decoder (decode/beam.py) runs ~45 small XLA ops per
while-loop step (3 layers x [qkv GEMM, ancestry-grouped self-attention,
cross-attention over the 196+E+F memory, FFN, 3 layer norms]).  At the
flagship shapes (B=256, K=5, D=300) every one of those ops is far below
MXU tile size, so the step cost is op-dispatch + HBM round-trips, not
FLOPs (round-1 profile: ~0.12 ms per op, 2.1 ms per step).

This kernel runs the ENTIRE transformer stack for one decode step as one
program per image: activations never leave VMEM between layers, the
per-layer cross-attention K/V (the true per-step bandwidth floor: the
B x M x D x 2 x nL memory must be re-read every step) is the only large
stream, and layer weights are fetched once per step (constant block index
=> Mosaic elides the re-copy across grid steps).

MEASURED (v5e-1, flagship shapes B=256 K=5 geo): 7.0 ms/step vs the stock
XLA step's 2.1 ms — the kernel is OFF by default.  Root cause, isolated
with DMA-only kernel variants: the per-(image)-program DMA pipeline only
reaches ~140 GB/s at these block sizes (4.3-4.5 ms for the step's
~614 MB, insensitive to image-major vs layer-major layout and to Bt=2
block batching), while XLA's async-sliced cross-attention fusions on the
same tensors sustain >600 GB/s (profiled: a 76 MB cross-V contraction in
122 us).  Many small per-image blocks through the Pallas pipeline cannot
match XLA's large async-sliced streams here, so op fusion loses to the
stock path end to end; byte REDUCTION (decode/beam.py kv_dtype="int8")
is the productive lever on this workload instead.  The kernel is kept as
a tested, opt-in implementation for shapes/hardware where dispatch or
compute, not stream efficiency, bounds the step.

Semantics match decode/beam.py::_beam_decoder_step exactly (same masking,
same ancestry slot-group attention, layer norm in f32) GIVEN the beam
loop's invariant that ancestry[:, :, i] points at each hypothesis's own
slot for the current step i — the kernel expresses the current-step
attention as an explicit self term instead of reading the just-written
cache rows through the selector.  The oracle test (tests/test_kernels.py)
checks full beam parity against the stock XLA path under the interpreter;
tests/test_tpu_smoke.py checks one decoder-stack step numerically on real
hardware (full-decode token equality is reduction-order-sensitive on
near-tie beam picks and is not asserted there).

Mosaic notes (learned in kernels/flash_attention.py): f32 MXU dots
silently round to bf16 unless precision=HIGHEST; reductions over sub-128
lane dims miscompile, so the L-slot logits live in a 128-lane pad and the
per-head replication/collapse are expressed as tiny constant matmuls
(rep / repT) instead of jnp.repeat/reshape gymnastics.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
LANE = 128


class _Static(NamedTuple):
    num_layers: int
    num_heads: int
    head_dim: int     # true head dim (softmax scale)
    L: int            # max decode length (cache slots per hypothesis)
    mem_len: int      # true memory rows (cross columns beyond are masked)
    eps: float        # layer-norm epsilon
    interpret: bool


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _prec(*operands):
    if all(o.dtype == jnp.float32 for o in operands):
        return jax.lax.Precision.HIGHEST
    return None


def _mm(a, b):
    """a @ b with f32 accumulate (and true-f32 MXU for the parity mode)."""
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(a, b),
    )


def _mm_t(a, b):
    """a @ b.T (contract last dims), f32 accumulate."""
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (b.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(a, b),
    )


def _mm_tn(a, b):
    """a.T @ b (contract FIRST dims: head-collapse reductions)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(a, b),
    )


def _layer_norm(x, scale, bias, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(
    i_ref,                      # scalar prefetch: (1,) current step index
    # per-image inputs (blocked over the batch grid axis)
    x_ref,                      # (1, K, D)
    sel_ref,                    # (1, K, LK) ancestry slot selector (0/1)
    ck_ref, cv_ref,             # (nL, 1, LK, D) self-attn caches
    xk_ref, xv_ref,             # (nL, 1, Mp, D) cross K/V
    # constants (same block for every program; fetched once)
    rep_ref,                    # (K*H, K) one-hot head-replication matrix
    hmask_ref,                  # (K*H, D) per-row head lane mask
    group_ref,                  # (LK, 128) slot -> L-column group matrix
    group_t_ref,                # (128, LK) transpose of the above
    qkv_w_ref, qkv_b_ref,       # (nL, D, 3D), (nL, 1, 3D)
    so_w_ref, so_b_ref,         # (nL, D, D), (nL, 1, D) self out-proj
    cq_w_ref, cq_b_ref,         # (nL, D, D), (nL, 1, D) cross q-proj
    co_w_ref, co_b_ref,         # (nL, D, D), (nL, 1, D) cross out-proj
    f1_w_ref, f1_b_ref,         # (nL, D, F), (nL, 1, F)
    f2_w_ref, f2_b_ref,         # (nL, F, D), (nL, 1, D)
    ln_s_ref, ln_b_ref,         # (nL, 3, 1, D) x2 norm scale/bias
    # outputs
    h_ref,                      # (1, K, D)
    kn_ref, vn_ref,             # (nL, 1, K, D) this step's new K/V rows
    *, st: _Static,
):
    K, D = x_ref.shape[1], x_ref.shape[2]
    H, Hd, L = st.num_heads, st.head_dim, st.L
    scale = 1.0 / math.sqrt(Hd)
    i = i_ref[0]

    x = x_ref[0].astype(jnp.float32)                       # (K, D)
    rep = rep_ref[...]                                     # (K*H, K)
    hmask = hmask_ref[...]                                 # (K*H, D)
    sel = sel_ref[0]                                       # (K, LK)
    selh = _mm(rep, sel)                                   # (K*H, LK)
    # 128-lane pads for the slot-grouped logits (Mosaic miscompiles
    # reductions over sub-128 lane dims, so L columns live in 128 lanes)
    col = jax.lax.broadcasted_iota(jnp.int32, (K * H, 128), 1)

    for l in range(st.num_layers):
        dt = ck_ref.dtype
        # ---- self-attention over the ancestry-grouped cache + self ----
        proj = _mm(x.astype(dt), qkv_w_ref[l]) + qkv_b_ref[l]
        q, kn, vn = proj[:, :D], proj[:, D:2 * D], proj[:, 2 * D:]
        kn_ref[l, 0] = kn.astype(kn_ref.dtype)
        vn_ref[l, 0] = vn.astype(vn_ref.dtype)
        qh = _mm(rep, q) * hmask                           # (K*H, D)
        knh = _mm(rep, kn) * hmask
        vnh = _mm(rep, vn) * hmask
        logits = _mm_t(qh.astype(dt), ck_ref[l, 0]) * scale     # (K*H, LK)
        lg = _mm(logits * selh, group_ref[...])                 # (K*H, 128)
        self_logit = jnp.sum(qh * knh, axis=-1, keepdims=True) * scale
        lg = jnp.where(col < i, lg, jnp.where(col == i, self_logit, NEG))
        m = jnp.max(lg, axis=-1, keepdims=True)
        e = jnp.exp(lg - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)              # (K*H, 128)
        # the current step's weight goes to the explicit vn term, NOT the
        # cache contraction — its cache rows are written only after this
        # kernel returns (and must not contribute whatever they hold)
        w_cache = jnp.where(col < i, w, 0.0)
        w_slot = _mm(w_cache, group_t_ref[...]) * selh          # (K*H, LK)
        out_h = _mm(w_slot.astype(dt), cv_ref[l, 0])            # (K*H, D)
        w_self = jnp.sum(jnp.where(col == i, w, 0.0), axis=-1, keepdims=True)
        out_h = (out_h + w_self * vnh) * hmask
        attn = _mm_tn(rep, out_h)                               # (K, D)
        attn = _mm(attn.astype(dt), so_w_ref[l]) + so_b_ref[l]
        x = _layer_norm(x + attn, ln_s_ref[l, 0], ln_b_ref[l, 0], st.eps)

        # ---- cross-attention over the shared per-image memory ----
        q2 = _mm(x.astype(dt), cq_w_ref[l]) + cq_b_ref[l]
        qh2 = _mm(rep, q2) * hmask                              # (K*H, D)
        lg2 = _mm_t(qh2.astype(dt), xk_ref[l, 0]) * scale       # (K*H, Mp)
        mcol = jax.lax.broadcasted_iota(jnp.int32, lg2.shape, 1)
        lg2 = jnp.where(mcol < st.mem_len, lg2, NEG)
        m2 = jnp.max(lg2, axis=-1, keepdims=True)
        e2 = jnp.exp(lg2 - m2)
        w2 = e2 / jnp.sum(e2, axis=-1, keepdims=True)
        out2 = _mm(w2.astype(dt), xv_ref[l, 0]) * hmask         # (K*H, D)
        cross = _mm_tn(rep, out2)                               # (K, D)
        cross = _mm(cross.astype(dt), co_w_ref[l]) + co_b_ref[l]
        x = _layer_norm(x + cross, ln_s_ref[l, 1], ln_b_ref[l, 1], st.eps)

        # ---- FFN ----
        hdn = jnp.maximum(_mm(x.astype(dt), f1_w_ref[l]) + f1_b_ref[l], 0.0)
        ff = _mm(hdn.astype(dt), f2_w_ref[l]) + f2_b_ref[l]
        x = _layer_norm(x + ff, ln_s_ref[l, 2], ln_b_ref[l, 2], st.eps)

    h_ref[0] = x.astype(h_ref.dtype)


class StackedDecoder(NamedTuple):
    """Decoder weights restacked (nL leading axis) + kernel constants."""
    qkv_w: jnp.ndarray
    qkv_b: jnp.ndarray
    so_w: jnp.ndarray
    so_b: jnp.ndarray
    cq_w: jnp.ndarray
    cq_b: jnp.ndarray
    co_w: jnp.ndarray
    co_b: jnp.ndarray
    f1_w: jnp.ndarray
    f1_b: jnp.ndarray
    f2_w: jnp.ndarray
    f2_b: jnp.ndarray
    ln_s: jnp.ndarray
    ln_b: jnp.ndarray
    rep: jnp.ndarray
    hmask: jnp.ndarray
    group: jnp.ndarray
    group_t: jnp.ndarray


def stack_decoder_params(
    decoder_params, num_heads: int, K: int, L: int, dtype=jnp.float32
) -> StackedDecoder:
    """Restack the per-layer param dicts into kernel-shaped arrays.

    Weight values are identical to the stock path; this is a layout
    transform done once per decode batch (outside the step loop).
    """
    layers = decoder_params["layers"]
    stack = lambda get: jnp.stack([get(lay).astype(dtype) for lay in layers])
    # biases keep a unit row axis so in-kernel [l] indexing yields 2-D
    # operands (Mosaic dislikes 1-D broadcasts); they stay f32 (added to
    # f32 matmul accumulators, so no reason to round them)
    stack_b = lambda get: jnp.stack(
        [get(lay).astype(jnp.float32)[None] for lay in layers]
    )
    D = layers[0]["self_attn"]["qkv_w"].shape[0]
    H = num_heads
    Hd = D // H
    rep = np.kron(np.eye(K), np.ones((H, 1))).astype(np.float32)  # (K*H, K)
    hmask = np.tile(
        np.kron(np.eye(H), np.ones((1, Hd))).astype(np.float32), (K, 1)
    )                                                             # (K*H, D)
    group = np.zeros((L * K, 128), np.float32)                    # slots -> L
    for l in range(L):
        group[l * K : (l + 1) * K, l] = 1.0
    return StackedDecoder(
        qkv_w=stack(lambda l: l["self_attn"]["qkv_w"]),
        qkv_b=stack_b(lambda l: l["self_attn"]["qkv_b"]),
        so_w=stack(lambda l: l["self_attn"]["out"]["w"]),
        so_b=stack_b(lambda l: l["self_attn"]["out"]["b"]),
        cq_w=stack(lambda l: l["cross_attn"]["qkv_w"][:, :D]),
        cq_b=stack_b(lambda l: l["cross_attn"]["qkv_b"][:D]),
        co_w=stack(lambda l: l["cross_attn"]["out"]["w"]),
        co_b=stack_b(lambda l: l["cross_attn"]["out"]["b"]),
        f1_w=stack(lambda l: l["ffn"]["lin1"]["w"]),
        f1_b=stack_b(lambda l: l["ffn"]["lin1"]["b"]),
        f2_w=stack(lambda l: l["ffn"]["lin2"]["w"]),
        f2_b=stack_b(lambda l: l["ffn"]["lin2"]["b"]),
        ln_s=jnp.stack([
            jnp.stack([lay[f"norm{n}"]["scale"][None] for n in (1, 2, 3)])
            for lay in layers
        ]).astype(jnp.float32),
        ln_b=jnp.stack([
            jnp.stack([lay[f"norm{n}"]["bias"][None] for n in (1, 2, 3)])
            for lay in layers
        ]).astype(jnp.float32),
        rep=jnp.asarray(rep),
        hmask=jnp.asarray(hmask),
        group=jnp.asarray(group),
        group_t=jnp.asarray(group.T.copy()),
    )


def pad_cross_kv(cross_kvs, dtype) -> tuple:
    """[{'k','v'} of (B, M, H, Hd)] per layer -> stacked (nL, B, Mp, D)
    with M padded to a lane multiple (padded rows are masked in-kernel)."""
    ks = jnp.stack([c["k"].reshape(c["k"].shape[0], c["k"].shape[1], -1)
                    for c in cross_kvs]).astype(dtype)
    vs = jnp.stack([c["v"].reshape(c["v"].shape[0], c["v"].shape[1], -1)
                    for c in cross_kvs]).astype(dtype)
    M = ks.shape[2]
    Mp = _round_up(M, LANE)
    if Mp != M:
        pad = [(0, 0), (0, 0), (0, Mp - M), (0, 0)]
        ks, vs = jnp.pad(ks, pad), jnp.pad(vs, pad)
    return ks, vs, M


def fused_beam_decoder_step(
    stacked: StackedDecoder,
    x,                           # (B, K, D)
    sel,                         # (B, K, L*K) f32 ancestry selector
    caches_k, caches_v,          # (nL, B, L*K, D)
    cross_k, cross_v,            # (nL, B, Mp, D)
    i,                           # scalar int32 step index
    *,
    num_heads: int,
    head_dim: int,
    mem_len: int,
    eps: float = 1e-5,
    interpret=None,
):
    """One full decoder stack step for every (image, hypothesis).

    Returns (h (B, K, D) f32, k_new, v_new (nL, B, K, D)); the caller
    writes k_new/v_new into the caches at slot rows i*K..i*K+K-1 (the
    kernel itself already attended to them via the explicit self term).
    """
    nL, B, LK, D = caches_k.shape
    K = x.shape[1]
    L = LK // K
    Mp = cross_k.shape[2]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    st = _Static(
        num_layers=nL, num_heads=num_heads, head_dim=head_dim, L=L,
        mem_len=mem_len, eps=eps, interpret=bool(interpret),
    )
    dt = caches_k.dtype

    # index maps receive (grid indices..., scalar prefetch refs...)
    img = lambda *dims: pl.BlockSpec(dims, lambda b, s: (0,) * len(dims),
                                     memory_space=pltpu.VMEM)
    per_b = pl.BlockSpec((1, K, D), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    sel_spec = pl.BlockSpec((1, K, LK), lambda b, s: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    cache_spec = pl.BlockSpec((nL, 1, LK, D), lambda b, s: (0, b, 0, 0),
                              memory_space=pltpu.VMEM)
    cross_spec = pl.BlockSpec((nL, 1, Mp, D), lambda b, s: (0, b, 0, 0),
                              memory_space=pltpu.VMEM)
    knew_spec = pl.BlockSpec((nL, 1, K, D), lambda b, s: (0, b, 0, 0),
                             memory_space=pltpu.VMEM)
    Fd = stacked.f1_w.shape[-1]

    h, k_new, v_new = pl.pallas_call(
        functools.partial(_kernel, st=st),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                per_b, sel_spec, cache_spec, cache_spec,
                cross_spec, cross_spec,
                img(K * num_heads, K), img(K * num_heads, D),
                img(LK, 128), img(128, LK),
                img(nL, D, 3 * D), img(nL, 1, 3 * D),
                img(nL, D, D), img(nL, 1, D),
                img(nL, D, D), img(nL, 1, D),
                img(nL, D, D), img(nL, 1, D),
                img(nL, D, Fd), img(nL, 1, Fd),
                img(nL, Fd, D), img(nL, 1, D),
                img(nL, 3, 1, D), img(nL, 3, 1, D),
            ],
            out_specs=(per_b, knew_spec, knew_spec),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, K, D), jnp.float32),
            jax.ShapeDtypeStruct((nL, B, K, D), dt),
            jax.ShapeDtypeStruct((nL, B, K, D), dt),
        ),
        interpret=pltpu.InterpretParams() if st.interpret else False,
    )(
        jnp.asarray(i, jnp.int32).reshape(1),
        x.astype(dt), sel.astype(jnp.float32),
        caches_k, caches_v, cross_k, cross_v,
        stacked.rep, stacked.hmask, stacked.group, stacked.group_t,
        stacked.qkv_w.astype(dt), stacked.qkv_b.astype(jnp.float32),
        stacked.so_w.astype(dt), stacked.so_b.astype(jnp.float32),
        stacked.cq_w.astype(dt), stacked.cq_b.astype(jnp.float32),
        stacked.co_w.astype(dt), stacked.co_b.astype(jnp.float32),
        stacked.f1_w.astype(dt), stacked.f1_b.astype(jnp.float32),
        stacked.f2_w.astype(dt), stacked.f2_b.astype(jnp.float32),
        stacked.ln_s, stacked.ln_b,
    )
    return h, k_new, v_new
