"""Jitted train / eval steps: masked-CE loss, Adam with the reference's
per-element gradient clamp, plateau LR decay via injected hyperparams.

Loss semantics match the reference exactly (geo-aware/train.py:274-284):
scores at position t predict caption token t+1, restricted to positions
t < length-1 (through <end>), averaged over all contributing tokens.  The
reference's sort + pack_padded_sequence is replaced by a mask — XLA-static
and numerically identical for mean-CE.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import optax

from icek_tpu.core.config import Config
from icek_tpu.data import images as image_ops
from icek_tpu.models import captioner as cap
from icek_tpu.models import resnet


def _batch_images(batch):
    """Model-ready NHWC images from either batch form: "raw_images" (stored
    f16 CHW rows, normalized in-graph — half the host->device bytes and no
    host normalize passes) or "images" (host-normalized f32, the f32-parity
    path)."""
    if "raw_images" in batch:
        return image_ops.normalize_in_graph(batch["raw_images"])
    return batch["images"]


def to_rbg_key(rng):
    """Rekey to the 'rbg' PRNG implementation: random bits come from the
    XLA RngBitGenerator (a hardware PRNG instruction on TPU) instead of
    ~100 VPU ops/element of threefry, while split/fold_in still run
    threefry over the (tiny) key data — so the per-layer key derivation in
    models/transformer.py is unchanged and cheap.

    This is the same cost class the flash kernel's in-kernel PRNG removed
    for attention-weight dropout, applied to the residual / positional /
    FFN dropouts that remain XLA ops.  The mask STREAM differs from
    threefry (training is stochastic either way); deterministic passes and
    the f32 parity suite never reach it.
    """
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(rng)
    else:
        data = rng
    data = jnp.asarray(data, jnp.uint32).reshape(-1)
    return jax.random.wrap_key_data(
        jnp.concatenate([data, data])[:4], impl="rbg"
    )


def resolve_rbg_dropout(explicit=None) -> bool:
    """Hardware-PRNG dropout: config flag, or (None = auto) on for TPU
    backends (CPU keeps threefry — RngBitGenerator lowers poorly there and
    tests want the default path)."""
    if explicit is not None:
        return explicit
    return jax.default_backend() == "tpu"


def resolve_flat_optimizer(explicit=None) -> bool:
    """Flattened (single-vector) clip+Adam via ``optax.flatten``.

    Measured a wash on TPU at the production shape (2223 vs 2220
    samples/s, batch 256 georic — XLA already runs the ~300 tiny per-leaf
    update ops well inside other ops' bubbles), and it changes the
    opt-state tree layout checkpoints serialize.  Default off; kept as an
    explicit opt-in for A/B on other topologies."""
    return bool(explicit)


def resolve_grad_accum(steps, variant=None, batch_size=None) -> int:
    """Resolve ``grad_accum_steps == "auto"`` to the measured per-preset win.

    The round-4 interleaved A/B (benchmarks/grad_accum_ab.py, BASELINE.md,
    batch 256 on v5e-1) showed in-graph accumulation is a throughput WIN at
    production batches, not just a memory lever: geo +18.5% at accum=8,
    news +8.6% at accum=8, knowledge +5% at accum=2 only (higher N
    measured flat-to-worse there).  The round-5 accum-sweep profiles
    (tools/profile_train_step.py [.. accum]) explain the knowledge curve:
    the flash-attention kernels are microbatch-INVARIANT (46.5/46.9/47.7
    ms/step at accum 1/2/8 — 44% of the step) and the non-attention tail
    bottoms out by accum=2 (65.9 -> 59.8 -> 59.4 ms), while the
    per-microbatch accumulator adds stay small and sublinear (2.8 ms/step
    at accum=2, 3.7 at accum=8 — XLA fuses and hides them; removing one
    full add pass outright measured +0.3%, benchmarks/accum_init_ab.py).
    knowledge=2 is a saturation point, not an accumulator-traffic cliff.
    "auto"
    deploys exactly that table — TPU backend and global batch >= 256, the
    shapes where it was measured — and falls back to 1 (monolithic)
    everywhere else (CPU, small batches).  Ints pass through unchanged;
    the default stays 1 so existing runs remain bit-reproducible (the
    accumulated step draws per-microbatch dropout keys).
    """
    if steps != "auto":
        return int(steps or 1)
    if jax.default_backend() != "tpu" or (batch_size or 0) < 256:
        return 1
    return {"geo": 8, "knowledge": 2, "news": 8}.get(variant, 1)


def make_optimizer(learning_rate: float, grad_clip: float = 5.0,
                   flat: bool = None):
    """clip-by-value then Adam — mirrors clip_gradient's clamp_(-c, c)
    (geo-aware/utils.py:75-85) followed by Adam.step.

    The learning rate is injected so the plateau decay (train.py:173-176)
    can rescale it in-place between epochs.
    """
    flat = resolve_flat_optimizer(flat)
    wrap = optax.flatten if flat else (lambda tx: tx)
    return optax.inject_hyperparams(
        lambda learning_rate: wrap(optax.chain(
            optax.clip(grad_clip),
            optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8),
        ))
    )(learning_rate=learning_rate)


def decay_learning_rate(opt_state, factor: float):
    opt_state.hyperparams["learning_rate"] = (
        opt_state.hyperparams["learning_rate"] * factor
    )
    return opt_state


@jax.custom_vjp
def _token_nll(logits, targets, valid):
    """Per-token negative log-likelihood with a hand-written backward.

    Forward never materializes an f32 copy of the (B, T, V) logits: max /
    logsumexp / gather reduce the native-dtype (bf16 on TPU) tensor with
    f32 accumulation fused into the reductions.  Backward emits
    d_logits = (softmax - onehot) * d_nll directly in the logits dtype —
    autodiff of the same expression materializes TWO f32 (B, T, V)
    intermediates (exp recompute + onehot subtract) before the convert,
    ~2 extra full-tensor HBM passes at the 10k-vocab production shape.
    """
    nll, _ = _token_nll_fwd(logits, targets, valid)
    return nll


def _token_nll_fwd(logits, targets, valid):
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1)).astype(jnp.float32)
    shifted = logits.astype(jnp.float32) - m[..., None]  # fuses: single use
    lse = m + jnp.log(jnp.sum(jnp.exp(shifted), axis=-1))
    picked = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    nll = (lse - picked.astype(jnp.float32)) * valid
    return nll, (logits, targets, valid, lse)


def _token_nll_bwd(res, g):
    logits, targets, valid, lse = res
    scale = (g * valid).astype(jnp.float32)[..., None]
    soft = jnp.exp(logits.astype(jnp.float32) - lse[..., None])
    onehot = (
        jnp.arange(logits.shape[-1], dtype=targets.dtype) == targets[..., None]
    )
    d_logits = ((soft - onehot) * scale).astype(logits.dtype)
    return d_logits, None, None


_token_nll.defvjp(_token_nll_fwd, _token_nll_bwd)


def caption_loss_total(scores, caption_ids, caption_lengths, pad_id):
    """Summed masked NLL and its token count — the linear form whose
    per-microbatch gradients ADD, used by gradient accumulation."""
    targets = caption_ids[:, 1:]                           # predict next token
    logits = scores[:, : targets.shape[1]]
    T = targets.shape[1]
    valid = jnp.arange(T)[None, :] < (caption_lengths[:, None] - 1)
    valid = valid & (targets != pad_id)
    nll = _token_nll(logits, targets, valid)
    return jnp.sum(nll), jnp.sum(valid)


def caption_loss(scores, caption_ids, caption_lengths, pad_id):
    """Masked mean cross-entropy over teacher-forced positions.

    Positions are limited to t < length-1 AND non-<pad> targets: the
    knowledge/news preps record the full padded length as the caplen
    (knowledge-aware/create_input_files.py:347), and the reference's
    CrossEntropyLoss(ignore_index=<pad>) is what actually excludes the
    padding there.
    """
    total, count = caption_loss_total(
        scores, caption_ids, caption_lengths, pad_id
    )
    return total / jnp.maximum(count, 1), count


def encoder_trainable_mask(encoder_params):
    """Trainable-leaf mask replicating the reference's fine_tune policy
    (geo models.py:49-60 + train.py:92-100): ResNet blocks 2-4 (children[5:])
    plus the 1x1 projection train; the stem, layer1 and all batch-norm
    running statistics stay frozen."""

    def mask_stage(tree, trainable):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: trainable
            and not any(
                getattr(p, "key", None) in ("mean", "var") for p in path
            ),
            tree,
        )

    return {
        name: mask_stage(sub, name in ("layer2", "layer3", "layer4", "proj"))
        for name, sub in encoder_params.items()
    }


def make_encoder_optimizer(encoder_params, learning_rate: float,
                           grad_clip: float = 5.0):
    """Masked Adam over the fine-tunable encoder subset."""
    mask = encoder_trainable_mask(encoder_params)
    inverse = jax.tree.map(lambda m: not m, mask)
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.masked(
                optax.chain(optax.clip(grad_clip), optax.adam(learning_rate)),
                mask,
            ),
            # frozen leaves: zero their update (masked() passes raw grads
            # through untouched otherwise)
            optax.masked(optax.set_to_zero(), inverse),
        )
    )(learning_rate=learning_rate)


def make_train_step(
    cfg: Config,
    vocab_size: int,
    pad_id: int,
    optimizer,
    compute_dtype=jnp.float32,
    encode_images: bool = True,
    encoder_optimizer=None,
    bn_train_mode: bool = False,
    token_cache=None,
    token_cache_mesh=None,
):
    """Build the jitted train step.

    If `encode_images` the batch carries raw normalized images (B,H,W,3) and
    the ResNet runs inside the step; otherwise the batch carries precomputed
    image tokens (B, 196, D) — the fast path, since the default config never
    updates the encoder (reference train.py:52,92-100).
    With `encoder_optimizer` set (fine-tuning), gradients flow into the
    unfrozen encoder subset and the step also returns updated encoder state.
    With `bn_train_mode` (opt-in), the encoder's batch-norms run in train
    mode during the step — normalizing by batch statistics and updating the
    running buffers — reproducing the reference's frozen-encoder side effect
    (geo-aware/train.py:245 calls encoder.train() even when it is frozen).
    The step then additionally returns the updated encoder params:
    non-fine-tune steps return (params, opt_state, encoder_params, loss,
    count) instead of (params, opt_state, loss, count).
    """
    mcfg = cfg.model
    fine_tune = encoder_optimizer is not None
    if bn_train_mode and not encode_images:
        raise ValueError("bn_train_mode requires encode_images=True")
    rbg = resolve_rbg_dropout(cfg.train.use_rbg_dropout)

    def image_tokens(encoder_params, batch):
        if not encode_images:
            if token_cache is not None and "token_rows" in batch:
                # device-resident cache (TrainConfig.device_token_cache_gb):
                # the whole split's tokens live in HBM; the batch carries
                # only row ids and the (B, 196, D) gather happens in-graph —
                # nothing big crosses the host->device link per step.
                # token_cache_mesh marks the cache as ROW-SHARDED over the
                # mesh's data axis (pooled multi-chip HBM — splits bigger
                # than one chip); the gather is then the explicit
                # all_gather(ids) + local-gather + psum_scatter exchange
                # (parallel/mesh.py::sharded_row_gather), never a GSPMD
                # gather that might all-gather the cache.
                if token_cache_mesh is not None:
                    from icek_tpu.parallel import mesh as mesh_lib

                    toks = mesh_lib.sharded_row_gather(
                        token_cache, batch["token_rows"], token_cache_mesh
                    )
                else:
                    toks = jnp.take(token_cache, batch["token_rows"], axis=0)
                return toks.astype(compute_dtype), None
            # cached tokens may arrive f16 (disk/RAM cache stores half
            # precision when training in bf16); cast on entry so the memory
            # concat stays in compute dtype.  Value-identical to the old
            # cast at the cross-KV projection (no arithmetic in between).
            return batch["image_tokens"].astype(compute_dtype), None
        if bn_train_mode:
            tokens, new_enc = resnet.resnet_encode(
                encoder_params, _batch_images(batch), mcfg.encoded_image_size,
                train=True, compute_dtype=compute_dtype, return_stats=True,
            )
            # the running-stat side effect is not a gradient path
            new_enc = jax.lax.stop_gradient(new_enc)
            return tokens, new_enc
        return resnet.resnet_encode(
            encoder_params, _batch_images(batch), mcfg.encoded_image_size,
            train=False, compute_dtype=compute_dtype,
        ), None

    def forward_total(params, encoder_params, batch, rng):
        """(summed NLL, token count, updated encoder stats) for one batch —
        the linear-in-batch form shared by the mean loss and by gradient
        accumulation (microbatch gradients of the SUM add exactly)."""
        if rbg:
            rng = to_rbg_key(rng)
        tokens, new_enc = image_tokens(encoder_params, batch)
        if not fine_tune:
            tokens = jax.lax.stop_gradient(tokens)
        scores = cap.captioner_forward(
            params, mcfg, vocab_size, pad_id,
            batch["caption_ids"], batch["caption_mask"], tokens,
            batch["entity_features"], batch.get("fact_features"),
            rng=rng, deterministic=False, compute_dtype=compute_dtype,
            # bf16 passes keep the (B, T, V+E+F) score tensor bf16 through
            # the loss; _token_nll's fwd/bwd read/write bf16 with f32
            # accumulation.  Declaring f32 and downcasting afterwards is NOT
            # equivalent: the backward then materializes an f32 cotangent of
            # the full score tensor (the r3 profile showed a 1 GB/step
            # pad+convert at the knowledge shapes) before re-rounding.
            # f32 (parity) passes are unchanged.
            score_dtype=compute_dtype,
        )
        total, count = caption_loss_total(
            scores, batch["caption_ids"], batch["lengths"], pad_id
        )
        return total, count, new_enc

    def loss_fn(params, encoder_params, batch, rng):
        total, count, new_enc = forward_total(params, encoder_params, batch, rng)
        return total / jnp.maximum(count, 1), (count, new_enc)

    def merge_stats(encoder_params, new_enc):
        """Overwrite only the BN mean/var leaves with the train-mode stats."""
        return jax.tree_util.tree_map_with_path(
            lambda path, old, new: new
            if any(getattr(p, "key", None) in ("mean", "var") for p in path)
            else old,
            encoder_params, new_enc,
        )

    accum_steps = getattr(cfg.train, "grad_accum_steps", 1)
    if bn_train_mode and accum_steps == "auto":
        # "auto" (the r5 no-flag default) must not break configs the table
        # was never measured for: BN batch statistics are defined over the
        # full batch, so auto falls back to the monolithic step here.
        # Only an EXPLICIT accum > 1 request is a hard error.
        accum_steps = 1
    accum = resolve_grad_accum(accum_steps, mcfg.variant, cfg.train.batch_size)
    if accum > 1 and bn_train_mode:
        raise ValueError(
            "grad_accum_steps > 1 is incompatible with bn_train_mode: "
            "batch-norm batch statistics are defined over the full batch"
        )

    def _microbatches(batch, rng):
        """Zero-pad the batch to a multiple of `accum` (padded rows carry
        zero valid tokens — _token_nll masks them out of both the loss and
        its gradient) and stack every array to (accum, B/accum, ...); the
        pad amount is resolved from the concrete shape at trace time.
        Returns (stacked batch, one dropout key per microbatch)."""
        B = next(iter(batch.values())).shape[0]
        pad = (-B) % accum
        micro = {}
        for k, v in batch.items():
            if pad:
                v = jnp.pad(v, [(0, pad)] + [(0, 0)] * (v.ndim - 1))
            micro[k] = v.reshape((accum, (B + pad) // accum) + v.shape[1:])
        return micro, jax.random.split(rng, accum)

    def accum_grads(params, encoder_params, batch, rng, *, wrt_encoder):
        """In-graph gradient accumulation: scan the microbatches, summing
        gradients of the SUMMED NLL (which add exactly across microbatches),
        then scale once by 1/total_tokens — identical to the full-batch
        mean-loss gradient up to float associativity.  Peak activation
        memory is one microbatch's."""
        argnums = (0, 1) if wrt_encoder else 0

        def total_fn(p, ep, mb, k):
            total, count, _ = forward_total(p, ep, mb, k)
            return total, count

        grad_fn = jax.value_and_grad(total_fn, argnums=argnums, has_aux=True)

        def body(carry, xs):
            g_acc, tot_acc, cnt_acc = carry
            mb, k = xs
            (tot, cnt), g = grad_fn(params, encoder_params, mb, k)
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            return (g_acc, tot_acc + tot, cnt_acc + cnt), None

        micro, keys = _microbatches(batch, rng)
        if os.environ.get("ICEK_ACCUM_INIT") == "first":
            # A/B lever (VERDICT r4 #4): seed the carry with microbatch 0's
            # gradients and scan the remaining N-1, removing the zeros init
            # + one full params-sized add pass per step.  Bitwise-identical
            # to the zeros carry (0 + g == g; pinned by
            # test_accum_init_first_matches_zeros_carry).  MEASURED A WASH
            # at knowledge batch-256 (benchmarks/accum_init_ab.py,
            # interleaved, r5): accum=2 2369.3 -> 2375.9 samples/s (+0.3%),
            # accum=4 2276.4 -> 2279.0 (+0.1%) — the removed add pass is
            # ~1.4 ms attributed but XLA already hides it behind other
            # work, and the lever emits the grad graph twice (once inline,
            # once in the loop body).  Kept opt-in for the record, not
            # deployed.
            mb0 = jax.tree.map(lambda v: v[0], micro)
            (tot0, cnt0), g0 = grad_fn(params, encoder_params, mb0, keys[0])
            (grads, total, count), _ = jax.lax.scan(
                body,
                (g0, tot0, cnt0),
                (jax.tree.map(lambda v: v[1:], micro), keys[1:]),
            )
        else:
            shapes = (params, encoder_params) if wrt_encoder else params
            zeros = jax.tree.map(jnp.zeros_like, shapes)
            (grads, total, count), _ = jax.lax.scan(
                body,
                (zeros, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
                (micro, keys),
            )
        inv = 1.0 / jnp.maximum(count, 1).astype(jnp.float32)
        grads = jax.tree.map(lambda g: (g * inv).astype(g.dtype), grads)
        return total * inv, count, grads

    if fine_tune and accum > 1:

        @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def train_step_ft_accum(params, opt_state, encoder_params,
                                enc_opt_state, batch, rng):
            loss, count, (grads, enc_grads) = accum_grads(
                params, encoder_params, batch, rng, wrt_encoder=True
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            enc_updates, enc_opt_state = encoder_optimizer.update(
                enc_grads, enc_opt_state, encoder_params
            )
            encoder_params = optax.apply_updates(encoder_params, enc_updates)
            return params, opt_state, encoder_params, enc_opt_state, loss, count

        train_step = train_step_ft_accum
    elif fine_tune:

        @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def train_step_ft(params, opt_state, encoder_params, enc_opt_state,
                          batch, rng):
            (loss, (count, new_enc)), (grads, enc_grads) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, encoder_params, batch, rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            enc_updates, enc_opt_state = encoder_optimizer.update(
                enc_grads, enc_opt_state, encoder_params
            )
            encoder_params = optax.apply_updates(encoder_params, enc_updates)
            if new_enc is not None:
                encoder_params = merge_stats(encoder_params, new_enc)
            return params, opt_state, encoder_params, enc_opt_state, loss, count

        train_step = train_step_ft
    elif bn_train_mode:

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step_bn(params, opt_state, encoder_params, batch, rng):
            (loss, (count, new_enc)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, encoder_params, batch, rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            encoder_params = merge_stats(encoder_params, new_enc)
            return params, opt_state, encoder_params, loss, count

        train_step = train_step_bn
    elif accum > 1:

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step_accum(params, opt_state, encoder_params, batch, rng):
            loss, count, grads = accum_grads(
                params, encoder_params, batch, rng, wrt_encoder=False
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, count

        train_step = train_step_accum
    else:

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, encoder_params, batch, rng):
            (loss, (count, _)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, encoder_params, batch, rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, count

    @jax.jit
    def eval_step(params, encoder_params, batch):
        # validation always uses inference-mode BN over the (updated) running
        # stats — the reference's validate() calls encoder.eval()
        # (geo-aware/train.py:328-330) regardless of bn_train_mode.
        if not encode_images:
            tokens = batch["image_tokens"].astype(compute_dtype)
        else:
            tokens = resnet.resnet_encode(
                encoder_params, _batch_images(batch), mcfg.encoded_image_size,
                train=False, compute_dtype=compute_dtype,
            )
        scores = cap.captioner_forward(
            params, mcfg, vocab_size, pad_id,
            batch["caption_ids"], batch["caption_mask"], tokens,
            batch["entity_features"], batch.get("fact_features"),
            deterministic=True, compute_dtype=compute_dtype,
            score_dtype=compute_dtype,
        )
        return caption_loss(scores, batch["caption_ids"], batch["lengths"], pad_id)

    return train_step, eval_step
