"""Pallas TPU kernels: fused residual-dropout-LayerNorm and plain dropout.

After round 2 moved attention into the fused flash kernel, the profiled
train step's next-largest addressable cost is the residual/LN glue between
the GEMMs (reference semantics: dropout on every residual branch + post-LN,
inside nn.TransformerEncoderLayer / nn.TransformerDecoderLayer,
geo-aware/models.py:241-244).  Stock XLA materializes, per site, an f32
copy of the (B, S, 300) normalized tensor for backward, a pred keep-mask,
and a u32 random-bits buffer, plus ~25 tiny (B, S)/ (300,) stat ops —
~27 ms/step of the batch-256 georic profile.

These kernels keep every HBM tensor in the model compute dtype (bf16) and
every intermediate in registers:

  dropout_add_ln   y = LayerNorm(x + dropout(h, rate)) in ONE pass
                   (read x,h -> write y).  Backward regenerates the
                   dropout mask by reseeding the hardware PRNG with the
                   same (seed, block) values, recomputes the row stats
                   from x,h in-register, and emits dx, dh, dscale, dbias
                   in ONE pass (read x,h,g -> write dx,dh).
  hw_dropout       elementwise hardware-PRNG dropout (FFN-internal /
                   positional dropout sites); backward saves nothing but
                   the seed.

Like the flash kernel, the mask STREAM differs from jax.random.bernoulli
(training is stochastic either way); deterministic passes and the f32
parity suite never reach these kernels (models/transformer.py routes here
only for dropout-active training passes).  Under the Mosaic interpreter
(CPU) prng_random_bits returns zeros, so rate > 0 is rejected outright.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 256  # rows per grid block; fwd and bwd must agree (mask regen)


class _Static(NamedTuple):
    rate: float
    eps: float
    n_rows: int       # true row count (tail-block rows beyond are masked)
    interpret: bool


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _keep_mask(shape, seed_ref, rate):
    """Regenerable keep-mask from the hardware PRNG, seeded per block so
    backward reproduces the exact mask (same convention as
    flash_attention._keep_mask; Mosaic quirks: single-scalar prng_seed,
    no uint32->float cast)."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return u < (1.0 - rate)


def _row_stats(z, eps):
    d = z.shape[-1]
    mu = jnp.sum(z, axis=-1, keepdims=True) * (1.0 / d)
    c = z - mu
    var = jnp.sum(c * c, axis=-1, keepdims=True) * (1.0 / d)
    return c, jax.lax.rsqrt(var + eps)


def _dropped(h, seed_ref, st):
    """(dropped h, keep mask); callers guard rate > 0."""
    keep = _keep_mask(h.shape, seed_ref, st.rate)
    return jnp.where(keep, h * (1.0 / (1.0 - st.rate)), 0.0), keep


# --------------------------------------------------------------------------
# dropout_add_ln
# --------------------------------------------------------------------------

def _ln_fwd_kernel(seed_ref, x_ref, h_ref, scale_ref, bias_ref, o_ref,
                   *, st: _Static):
    x = x_ref[...].astype(jnp.float32)
    h = h_ref[...].astype(jnp.float32)
    if st.rate > 0.0:
        dh, _ = _dropped(h, seed_ref, st)
    else:
        dh = h
    c, rstd = _row_stats(x + dh, st.eps)
    y = c * rstd * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(
        jnp.float32
    )
    o_ref[...] = y.astype(o_ref.dtype)


def _ln_bwd_kernel(seed_ref, x_ref, h_ref, scale_ref, g_ref,
                   dx_ref, dh_ref, dscale_ref, dbias_ref, *, st: _Static):
    d = x_ref.shape[-1]
    x = x_ref[...].astype(jnp.float32)
    h = h_ref[...].astype(jnp.float32)
    if st.rate > 0.0:
        dropped, keep = _dropped(h, seed_ref, st)
    else:
        dropped = h
    c, rstd = _row_stats(x + dropped, st.eps)
    zhat = c * rstd
    g = g_ref[...].astype(jnp.float32)
    gs = g * scale_ref[0].astype(jnp.float32)
    c1 = jnp.sum(gs * zhat, axis=-1, keepdims=True) * (1.0 / d)
    c2 = jnp.sum(gs, axis=-1, keepdims=True) * (1.0 / d)
    dz = (gs - c2 - zhat * c1) * rstd
    dx_ref[...] = dz.astype(dx_ref.dtype)
    if st.rate > 0.0:
        dh = jnp.where(keep, dz * (1.0 / (1.0 - st.rate)), 0.0)
    else:
        dh = dz
    dh_ref[...] = dh.astype(dh_ref.dtype)

    # param grads: accumulate across the sequential grid; tail-block rows
    # past n_rows hold garbage loads -> select them out (after the product:
    # where() discards NaNs the garbage may have produced)
    row0 = pl.program_id(0) * x_ref.shape[0]
    valid = (
        row0 + jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    ) < st.n_rows
    gsum = jnp.sum(jnp.where(valid, g, 0.0), axis=0, keepdims=True)
    gzsum = jnp.sum(jnp.where(valid, g * zhat, 0.0), axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscale_ref[...] = gzsum
        dbias_ref[...] = gsum

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dscale_ref[...] += gzsum
        dbias_ref[...] += gsum


def _ln_specs(d):
    # index maps receive the scalar-prefetch ref as a trailing arg
    row = pl.BlockSpec((ROWS, d), lambda i, s: (i, 0), memory_space=pltpu.VMEM)
    par = pl.BlockSpec((1, d), lambda i, s: (0, 0), memory_space=pltpu.VMEM)
    return row, par


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ln(st: _Static, x, h, scale, bias, seed):
    out, _ = _ln_fwd(st, x, h, scale, bias, seed)
    return out


def _ln_fwd(st: _Static, x, h, scale, bias, seed):
    n, d = x.shape
    row, par = _ln_specs(d)
    out = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, st=st),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(_round_up(n, ROWS) // ROWS,),
            in_specs=[row, row, par, par],
            out_specs=row,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=pltpu.InterpretParams() if st.interpret else False,
    )(seed, x, h, scale, bias)
    return out, (x, h, scale, seed)


def _ln_bwd(st: _Static, res, g):
    x, h, scale, seed = res
    n, d = x.shape
    row, par = _ln_specs(d)
    dx, dh, dscale, dbias = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, st=st),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(_round_up(n, ROWS) // ROWS,),
            in_specs=[row, row, par, row],
            out_specs=(row, row, par, par),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(h.shape, h.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        interpret=pltpu.InterpretParams() if st.interpret else False,
    )(seed, x, h, scale, g)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dx, dh, dscale[0], dbias[0], dseed


_ln.defvjp(_ln_fwd, _ln_bwd)


def _check_interpret(interpret, rate):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if interpret and rate > 0.0:
        raise ValueError(
            "fused dropout kernels with rate > 0 are unsupported under the "
            "Mosaic interpreter (CPU): interpreted prng_random_bits returns "
            "zeros. Run deterministic, or on real TPU hardware."
        )
    return interpret


def dropout_add_ln(x, h, scale, bias, *, rate, seed=None, eps=1e-5,
                   interpret=None):
    """LayerNorm(x + dropout(h, rate)) fused over the last axis.

    x, h: (..., D) same shape/dtype (the compute dtype); scale, bias: (D,)
    f32 LayerNorm parameters; seed: (1,) int32, required when rate > 0.
    Matches models/transformer.py's
    ``layer_norm(p, x + dropout(h, rate, key, False))`` semantics with a
    hardware-PRNG mask stream and the output emitted in x.dtype (the stock
    path materializes f32 and lets the next matmul cast down).
    """
    interpret = _check_interpret(interpret, rate)
    if rate > 0.0 and seed is None:
        raise ValueError("seed is required when rate > 0")
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    orig = x.shape
    d = orig[-1]
    n = int(np.prod(orig[:-1]))
    st = _Static(rate=float(rate), eps=float(eps), n_rows=n,
                 interpret=bool(interpret))
    out = _ln(
        st, x.reshape(n, d), h.reshape(n, d).astype(x.dtype),
        scale.astype(jnp.float32).reshape(1, d),
        bias.astype(jnp.float32).reshape(1, d), seed.astype(jnp.int32),
    )
    return out.reshape(orig)


# --------------------------------------------------------------------------
# hw_dropout
# --------------------------------------------------------------------------

def _drop_fwd_kernel(seed_ref, h_ref, o_ref, *, st: _Static):
    h = h_ref[...].astype(jnp.float32)
    dh, _ = _dropped(h, seed_ref, st)
    o_ref[...] = dh.astype(o_ref.dtype)


def _drop_bwd_kernel(seed_ref, g_ref, dh_ref, *, st: _Static):
    g = g_ref[...].astype(jnp.float32)
    keep = _keep_mask(g.shape, seed_ref, st.rate)
    dh_ref[...] = jnp.where(keep, g * (1.0 / (1.0 - st.rate)), 0.0).astype(
        dh_ref.dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _drop(st: _Static, h, seed):
    out, _ = _drop_fwd(st, h, seed)
    return out


def _drop_call(kernel, st, arr, seed):
    n, d = arr.shape
    row = pl.BlockSpec((ROWS, d), lambda i, s: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kernel, st=st),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(_round_up(n, ROWS) // ROWS,),
            in_specs=[row],
            out_specs=row,
        ),
        out_shape=jax.ShapeDtypeStruct(arr.shape, arr.dtype),
        interpret=pltpu.InterpretParams() if st.interpret else False,
    )(seed, arr)


def _drop_fwd(st: _Static, h, seed):
    return _drop_call(_drop_fwd_kernel, st, h, seed), (seed,)


def _drop_bwd(st: _Static, res, g):
    (seed,) = res
    dh = _drop_call(_drop_bwd_kernel, st, g, seed)
    return dh, np.zeros(seed.shape, dtype=jax.dtypes.float0)


_drop.defvjp(_drop_fwd, _drop_bwd)


def hw_dropout(h, *, rate, seed, interpret=None):
    """Hardware-PRNG dropout: where(keep, h / (1-rate), 0) with the mask
    regenerated (never stored) in backward.  h: (..., D); seed: (1,) int32."""
    if rate <= 0.0:
        return h
    interpret = _check_interpret(interpret, rate)
    orig = h.shape
    d = orig[-1]
    n = int(np.prod(orig[:-1]))
    st = _Static(rate=float(rate), eps=0.0, n_rows=n, interpret=bool(interpret))
    return _drop(st, h.reshape(n, d), seed.astype(jnp.int32)).reshape(orig)
