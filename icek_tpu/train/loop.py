"""Training driver: epoch loop with the reference's plateau-decay and
early-stop policy (geo-aware/train.py:57-220), TPU-native internals.

Differences from the reference by design:
  * the frozen image encoder runs ONCE per split (token cache) instead of
    every batch — the default config never trains it (train.py:52);
  * batches are static-shape with masked padding, prefetched to device;
  * AverageMeter-style batch/data timing stats are preserved in the logs.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from icek_tpu.core import config as config_lib
from icek_tpu.core.config import Config
from icek_tpu.data import dataset as ds
from icek_tpu.data import images as image_ops
from icek_tpu.models import captioner, resnet
from icek_tpu.train import checkpoint as ckpt
from icek_tpu.train import step as step_lib
from icek_tpu.utils import profiling


class Meter:
    """Running value/avg tracker (the reference's AverageMeter,
    geo-aware/utils.py:51-68)."""

    def __init__(self):
        self.val = self.sum = self.count = 0.0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)


@dataclasses.dataclass
class TrainResult:
    best_loss: float
    epochs_run: int
    params: dict
    encoder_params: dict
    preempted: bool = False


class Preempted(Exception):
    """Raised by the step callback after the preemption checkpoint is
    written; unwinds run_epoch so train() can return cleanly."""


def _batch_assembler(mesh):
    """Prefetch-thread transform: local numpy rows -> (global) device batch.

    With a mesh, each process's local loader shard is assembled into global
    sharded jax.Arrays (parallel/mesh.py::global_batch) on the prefetch
    thread, overlapping the device puts with the running step.  Without a
    mesh, on an accelerator, batches are jax.device_put on the prefetch
    thread for the same overlap — leaving them as numpy would serialize the
    host->device copy into every step dispatch (measured r3: the whole
    pipeline ran at ~1/10th of the step-only rate).  The put also makes the
    device batch independent of the streaming loader's reused ring slots.
    On CPU the arrays are left as numpy (zero transfer; jit may zero-copy
    them, so the per-step loss sync in run_epoch stays load-bearing there
    for ring aliasing)."""
    if mesh is None:
        if jax.default_backend() == "cpu":
            return lambda b: b
        return jax.device_put
    from icek_tpu.parallel import mesh as mesh_lib

    return lambda b: mesh_lib.global_batch(b, mesh)


def _staged(mesh) -> bool:
    """True when batches are committed device arrays (see _batch_assembler):
    the driver loop may then run ahead without a per-step host sync."""
    return mesh is not None or jax.default_backend() != "cpu"


def run_epoch(
    train_step, params, opt_state, encoder_params, data: ds.CaptionDataset,
    batch_size: int, rng_key, epoch: int, print_freq: int = 100,
    log: Callable[[str], None] = print, enc_opt_state=None,
    bn_train_mode: bool = False, mesh=None, raw_images: bool = False,
    start_batch: int = 0, step_callback=None,
):
    """``start_batch`` resumes a deterministically-seeded epoch mid-way
    (the loader skips the prefix, per-step rng folds in the GLOBAL batch
    index, so the resumed tail is bit-identical to the uninterrupted
    run).  ``step_callback(i, params, opt_state, encoder_params,
    enc_opt_state)`` runs after every step — the fault-tolerance hook
    (may raise :class:`Preempted` after saving)."""
    batch_time, data_time, losses = Meter(), Meter(), Meter()
    start = time.time()
    n_batches = -(-len(data) // batch_size)
    batches = ds.prefetch(
        data.epoch_batches(
            batch_size, shuffle=True, seed=epoch, raw_images=raw_images,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            start_batch=start_batch,
        ),
        _batch_assembler(mesh),
    )
    fine_tune = enc_opt_state is not None
    staged = _staged(mesh)
    pending = []

    def drain():
        for l, c in pending:
            losses.update(float(l), int(c))
        pending.clear()
    for i, batch in enumerate(batches, start=start_batch):
        data_time.update(time.time() - start)
        step_rng = jax.random.fold_in(rng_key, i)
        if fine_tune:
            (params, opt_state, encoder_params, enc_opt_state, loss,
             count) = train_step(
                params, opt_state, encoder_params, enc_opt_state, batch, step_rng
            )
        elif bn_train_mode:
            params, opt_state, encoder_params, loss, count = train_step(
                params, opt_state, encoder_params, batch, step_rng
            )
        else:
            params, opt_state, loss, count = train_step(
                params, opt_state, encoder_params, batch, step_rng
            )
        if staged:
            # async dispatch: loss/count stay on device; syncing every step
            # costs a full host round-trip (20-30 ms through remote
            # transports) and stalls the put/step pipeline.  Drain at print
            # boundaries and at epoch end.
            pending.append((loss, count))
            if i % print_freq == 0:
                drain()
        else:
            # CPU: the identity assembler may zero-copy the loader's reused
            # ring buffers into jit — the per-step sync keeps the consumer
            # within the ring (data/streaming.py aliasing contract).
            losses.update(float(loss), int(count))
        if step_callback is not None:
            step_callback(i, params, opt_state, encoder_params, enc_opt_state)
        batch_time.update(time.time() - start)
        start = time.time()
        if i % print_freq == 0:
            log(
                f"Epoch: [{epoch}][{i}/{n_batches}]\t"
                f"Batch Time {batch_time.val:.3f} ({batch_time.avg:.3f})\t"
                f"Data Load Time {data_time.val:.3f} ({data_time.avg:.3f})\t"
                f"Loss {losses.val:.4f} ({losses.avg:.4f})"
            )
    drain()
    return params, opt_state, losses.avg, encoder_params, enc_opt_state


def run_validation(
    eval_step, params, encoder_params, data: ds.CaptionDataset,
    batch_size: int, print_freq: int = 100, log: Callable[[str], None] = print,
    mesh=None, raw_images: bool = False,
):
    losses = Meter()
    n_batches = -(-len(data) // batch_size)
    batches = ds.prefetch(
        data.epoch_batches(
            batch_size, shuffle=False, raw_images=raw_images,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        ),
        _batch_assembler(mesh),
    )
    staged = _staged(mesh)
    pending = []

    def drain():
        for l, c in pending:
            losses.update(float(l), int(c))
        pending.clear()

    for i, batch in enumerate(batches):
        loss, count = eval_step(params, encoder_params, batch)
        if staged:
            pending.append((loss, count))
            if i % print_freq == 0:
                drain()
        else:
            losses.update(float(loss), int(count))
        if i % print_freq == 0:
            log(f"Validation: [{i}/{n_batches}]\tLoss {losses.val:.4f} ({losses.avg:.4f})")
    drain()
    return losses.avg


def resolve_token_cache_placement(
    n_rows: int, row_bytes: int, budget_gb: float, dp: int
) -> Optional[str]:
    """Device token-cache placement rule (documented at
    TrainConfig.device_token_cache_gb): "replicated" when the whole cache
    fits one chip's budget (gathers are then local and free), "sharded"
    when it doesn't but one data shard's rows do — the capacity then POOLS
    to budget x dp (e.g. NYTimes800k's ~800k rows x 115 KiB bf16 ≈ 88 GiB
    fits 8 chips at device_token_cache_gb=12) — and None when even the
    pooled HBM can't hold it (the host streaming path remains)."""
    budget = budget_gb * 2**30
    if budget <= 0 or n_rows <= 0:
        return None
    if n_rows * row_bytes <= budget:
        return "replicated"
    if dp > 1 and -(-n_rows // dp) * row_bytes <= budget:
        return "sharded"
    return None


def train(
    cfg: Config,
    data_dir: str,
    vocab_size: int,
    pad_id: int,
    checkpoint_dir: str = ".",
    pretrained_embeddings: Optional[np.ndarray] = None,
    resume_from: Optional[str] = None,
    max_epochs: Optional[int] = None,
    reset_epochs_since_improvement: bool = False,
    log: Callable[[str], None] = print,
    mesh=None,
    encoder_weights: Optional[str] = None,
) -> TrainResult:
    """Full training run for one preset; returns the best params.

    With ``mesh`` (a jax.sharding.Mesh), the run is SPMD over all mesh
    devices: params shard per parallel/mesh.py policy, every process loads
    a disjoint shard of each global batch (tc.batch_size is GLOBAL), and
    batches are assembled into global arrays on the prefetch thread.
    Multi-host runs must call parallel.distributed.maybe_initialize()
    before anything else (the apps/ train CLIs do)."""
    tc = cfg.train
    has_facts = cfg.model.has_facts
    if cfg.data.streaming:
        from icek_tpu.data import streaming

        train_data = streaming.StreamingCaptionDataset(
            data_dir, cfg.data.base_name, "TRAIN", has_facts
        )
        val_data = streaming.StreamingCaptionDataset(
            data_dir, cfg.data.base_name, "VAL", has_facts
        )
    else:
        train_data = ds.CaptionDataset(data_dir, cfg.data.base_name, "TRAIN", has_facts)
        val_data = ds.CaptionDataset(data_dir, cfg.data.base_name, "VAL", has_facts)

    key = jax.random.PRNGKey(tc.seed)
    k_model, k_enc, k_train = jax.random.split(key, 3)
    params = captioner.init_captioner_params(k_model, cfg.model, vocab_size)
    if pretrained_embeddings is not None:
        params["word_embedding"] = jnp.asarray(pretrained_embeddings)
    if encoder_weights:
        # pretrained image encoder for fresh runs — the reference's
        # torchvision resnet101(pretrained=True) (geo-aware/models.py:14-16,
        # train.py:90); a .pth state_dict or a ported .msgpack tree
        from icek_tpu.train import port

        encoder_params = port.resolve_encoder_weights(
            encoder_weights, cfg.model.emb_dim, seed=tc.seed
        )
        log(f"encoder initialized from {encoder_weights}")
    else:
        encoder_params = resnet.init_resnet101(k_enc, cfg.model.emb_dim)

    mesh_lib = None
    if mesh is not None:
        from icek_tpu.parallel import mesh as mesh_lib

        params = mesh_lib.shard_params(params, mesh)
        encoder_params = mesh_lib.replicate(encoder_params, mesh)

    optimizer = step_lib.make_optimizer(tc.decoder_lr, tc.grad_clip)
    # after shard_params: Adam's mu/nu (zeros_like) inherit the shardings
    opt_state = optimizer.init(params)

    start_epoch, stale, best_loss, resume_step = 0, 0, float("inf"), 0
    if resume_from:
        params, restored_opt, enc, meta = ckpt.load_checkpoint(resume_from, opt_state)
        recorded_geom = meta.get("geometry")
        if recorded_geom and recorded_geom != config_lib.geometry_of(cfg):
            # Same-width mismatches (e.g. 300x6 vs 300x10) would otherwise
            # load silently and train corrupted head groupings; apps/common
            # resolves this automatically via checkpoint.read_meta, so this
            # only fires for direct library callers.
            raise ValueError(
                f"resume checkpoint {resume_from} records geometry "
                f"{recorded_geom} but the config is "
                f"{config_lib.geometry_of(cfg)}; apply the recorded "
                f"geometry (core.config.apply_geometry) before resuming"
            )
        if restored_opt is not None:
            opt_state = restored_opt
        if enc is not None:
            encoder_params = enc
        if mesh is not None:
            # checkpoints restore as host/single-device arrays — re-shard
            params = mesh_lib.shard_params(params, mesh)
            encoder_params = mesh_lib.replicate(encoder_params, mesh)
            if restored_opt is not None:
                ref = optimizer.init(params)
                opt_state = jax.tree.map(
                    lambda x, r: jax.device_put(jnp.asarray(x), r.sharding),
                    restored_opt, ref,
                )
        if "step" in meta:
            # mid-epoch (fault-tolerance) checkpoint: re-enter the SAME
            # epoch at the recorded batch; the loader skips the prefix of
            # its deterministically seeded stream
            start_epoch = meta["epoch"]
            resume_step = meta["step"]
        else:
            start_epoch = meta["epoch"] + 1
        stale = meta["epochs_since_improvement"]
        if reset_epochs_since_improvement:
            # the reference's zero_out_epochs_since_improvement knob
            # (geo-aware/train.py:54,108-123): restart the early-stop /
            # LR-decay counter on resume without touching best_loss
            stale = 0
        best_loss = meta["loss"]
        log(
            f"Resumed from {resume_from} at epoch {start_epoch}"
            + (f" batch {resume_step}" if resume_step else "")
            + (" (stale counter reset)" if reset_epochs_since_improvement
               else "")
        )

    # Cache frozen-encoder image tokens once per split.
    compute_dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    encoder_optimizer = enc_opt_state = None
    encode_images = tc.fine_tune_encoder or tc.bn_train_mode
    # fine-tune/bn batches carry images every step; bf16 passes ship the
    # stored f16 rows and normalize in-graph (train/step._batch_images) —
    # half the host->device bytes, zero host normalize passes.  f32 parity
    # passes keep the exact host normalize.
    raw_image_batches = encode_images and compute_dtype == jnp.bfloat16
    if tc.fine_tune_encoder:
        encoder_optimizer = step_lib.make_encoder_optimizer(
            encoder_params, tc.encoder_lr, tc.grad_clip
        )
        enc_opt_state = encoder_optimizer.init(encoder_params)
    elif not tc.bn_train_mode:
        # bn_train_mode mutates the BN stats every step, so token caching is
        # only valid when the frozen encoder is truly stateless.
        # bf16 training re-rounds the tokens on step entry anyway, so the
        # cache stores f16 there — halving cache RAM/disk and the per-batch
        # gather + host->device bytes (the streaming loader was otherwise
        # marginally slower than the r3 step: 85.7 vs 83.5 ms/batch at
        # geo batch 256).  f32 passes keep f32 for exactness (host
        # normalize, bit-stable cache); bf16 builds also normalize the
        # stored f16 rows IN-graph — 2x smaller uploads, no host passes.
        raw_feed = compute_dtype == jnp.bfloat16
        cache_dtype = np.float16 if raw_feed else np.float32

        @jax.jit
        def encode(imgs):
            if raw_feed:
                imgs = image_ops.normalize_in_graph(imgs)
            return resnet.resnet_encode(
                encoder_params, imgs, cfg.model.encoded_image_size,
                compute_dtype=compute_dtype,
            )

        for split_data in (train_data, val_data):
            split_data.cache_image_tokens(
                lambda x: encode(jnp.asarray(x)), dtype=cache_dtype,
                raw=raw_feed,
            )

    # Lift the train split's token cache into device HBM when it fits the
    # budget: batches then carry int32 row ids and the step gathers the
    # (B, 196, D) tokens in-graph — the dominant data stream never crosses
    # the host->device link.  Frozen-encoder paths only (fine-tune/bn carry
    # raw images).  Under a mesh, a cache within the PER-CHIP budget is
    # replicated (row-id gathers are then local and free); one that exceeds
    # it but fits the POOLED dp budget (budget x data-axis size) is
    # row-sharded over the data axis instead (parallel/mesh.py::shard_rows)
    # and gathered via the explicit all_gather(ids)+psum_scatter exchange —
    # this is what lets an NYTimes800k-scale split (~90 GB bf16 tokens, far
    # beyond one chip) still train straight out of HBM on a pod slice.
    token_cache = token_cache_mesh = None
    if (
        not encode_images
        and jax.default_backend() != "cpu"
        and tc.device_token_cache_gb > 0
        and train_data.image_tokens is not None
    ):
        tokens = train_data.image_tokens
        n_rows = int(tokens.shape[0])
        row_bytes = int(np.prod(tokens.shape[1:])) * 2  # stored bf16 on device
        nbytes = n_rows * row_bytes
        dp = mesh.shape[tc.data_axis] if mesh is not None else 1
        placement = resolve_token_cache_placement(
            n_rows, row_bytes, tc.device_token_cache_gb, dp
        )
        if placement == "replicated":
            host = np.asarray(tokens[:]).astype(jnp.bfloat16)
            if mesh is None:
                token_cache = jnp.asarray(host)
            else:
                replicated = jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec()
                )
                if jax.process_count() == 1:
                    token_cache = jax.device_put(host, replicated)
                else:
                    token_cache = jax.make_array_from_process_local_data(
                        replicated, host
                    )
            train_data.use_token_rows = True
            log(
                f"device token cache: {nbytes / 2**20:.0f} MiB in HBM"
                f"{' (replicated over mesh)' if mesh is not None else ''}; "
                "batches carry row ids only"
            )
        elif placement == "sharded":
            from icek_tpu.parallel import mesh as _mesh_lib

            token_cache = _mesh_lib.shard_rows(tokens, mesh, jnp.bfloat16)
            token_cache_mesh = mesh
            train_data.use_token_rows = True
            log(
                f"device token cache: {nbytes / 2**20:.0f} MiB row-sharded "
                f"over {dp} data shards "
                f"({nbytes / dp / 2**20:.0f} MiB/chip); batches carry row "
                "ids only"
            )

    train_step, eval_step = step_lib.make_train_step(
        cfg, vocab_size, pad_id, optimizer,
        compute_dtype=compute_dtype,
        encode_images=encode_images,
        encoder_optimizer=encoder_optimizer,
        bn_train_mode=tc.bn_train_mode,
        token_cache=token_cache,
        token_cache_mesh=token_cache_mesh,
    )

    metric_log = profiling.MetricLogger(
        os.environ.get("ICEK_METRICS_LOG") or None
    )
    profile_dir = profiling.profile_dir_from_env()

    # ---- fault tolerance: mid-epoch STEP checkpoints + SIGTERM handling.
    # A preemption notice sets the flag; the step callback then writes the
    # rolling STEP checkpoint and unwinds via Preempted.  Interval saves
    # (checkpoint_every_steps) are deterministic across processes, so they
    # stay on under a mesh; the signal path is single-process only.
    import signal
    import threading

    preempt_flag = threading.Event()
    prev_handler = None
    catch_signals = (
        tc.save_on_preempt
        and jax.process_count() == 1
        and threading.current_thread() is threading.main_thread()
    )
    if catch_signals:
        prev_handler = signal.signal(
            signal.SIGTERM, lambda *_: preempt_flag.set()
        )

    def make_step_callback(epoch, stale, best_loss):
        every = tc.checkpoint_every_steps
        if not every and not catch_signals:
            return None

        def step_cb(i, p, o, e, eo):
            preempt = preempt_flag.is_set()
            if not preempt and not (every and (i + 1) % every == 0):
                return
            save_p, save_o, save_e = p, o, e
            if mesh is not None and jax.process_count() > 1:
                save_p = mesh_lib.gather_for_host(p, mesh)
                save_o = mesh_lib.gather_for_host(o, mesh)
                save_e = mesh_lib.gather_for_host(e, mesh)
            if jax.process_index() == 0:
                path = ckpt.save_checkpoint(
                    checkpoint_dir, cfg.data.base_name, epoch, stale,
                    best_loss, save_p, save_o, save_e, step=i + 1,
                    extra_meta={"geometry": config_lib.geometry_of(cfg)},
                )
                if preempt:
                    log(f"PREEMPTED: saved {path} at epoch {epoch} batch {i + 1}")
            if preempt:
                raise Preempted
        return step_cb

    epochs = max_epochs if max_epochs is not None else tc.epochs
    epoch = start_epoch
    preempted = False
    try:
        for epoch in range(start_epoch, epochs):
            if stale == tc.max_epochs_since_improvement:
                break
            if stale > 0 and stale % tc.lr_decay_every == 0:
                opt_state = step_lib.decay_learning_rate(opt_state, tc.lr_decay_factor)
                if enc_opt_state is not None:
                    enc_opt_state = step_lib.decay_learning_rate(
                        enc_opt_state, tc.lr_decay_factor
                    )
                log(
                    "DECAYING learning rate to "
                    f"{float(opt_state.hyperparams['learning_rate']):.6f}"
                )
            try:
                with profiling.trace(profile_dir if epoch == start_epoch else None):
                    (params, opt_state, train_loss, encoder_params,
                     enc_opt_state) = run_epoch(
                        train_step, params, opt_state, encoder_params, train_data,
                        tc.batch_size, jax.random.fold_in(k_train, epoch), epoch,
                        tc.print_freq, log, enc_opt_state=enc_opt_state,
                        bn_train_mode=tc.bn_train_mode and not tc.fine_tune_encoder,
                        mesh=mesh, raw_images=raw_image_batches,
                        start_batch=resume_step if epoch == start_epoch else 0,
                        step_callback=make_step_callback(epoch, stale, best_loss),
                    )
            except Preempted:
                preempted = True
                break
            val_loss = run_validation(
                eval_step, params, encoder_params, val_data, tc.batch_size,
                tc.print_freq, log, mesh=mesh, raw_images=raw_image_batches,
            )
            metric_log.log(
                "epoch", epoch=epoch, train_loss=train_loss, val_loss=val_loss,
                lr=float(opt_state.hyperparams["learning_rate"]),
            )
            is_best = val_loss < best_loss
            best_loss = min(val_loss, best_loss)
            stale = 0 if is_best else stale + 1
            if not is_best:
                log(f"Epochs since last improvement: {stale}")
            save_params, save_opt, save_enc = params, opt_state, encoder_params
            if mesh is not None and jax.process_count() > 1:
                # every process participates in the all-gather (collective);
                # only the primary writes below
                save_params = mesh_lib.gather_for_host(params, mesh)
                save_opt = mesh_lib.gather_for_host(opt_state, mesh)
                save_enc = mesh_lib.gather_for_host(encoder_params, mesh)
            if jax.process_index() == 0:
                ckpt.save_checkpoint(
                    checkpoint_dir, cfg.data.base_name, epoch, stale, val_loss,
                    save_params, save_opt, save_enc, is_best,
                    extra_meta={"geometry": config_lib.geometry_of(cfg)},
                )
                # the completed epoch outranks any STEP file from its
                # interior; drop the stale rolling file
                step_file = os.path.join(
                    checkpoint_dir,
                    f"checkpoint_STEP_{cfg.data.base_name}.msgpack",
                )
                if not preempted and os.path.exists(step_file):
                    os.remove(step_file)
    finally:
        if catch_signals:
            signal.signal(signal.SIGTERM, prev_handler)
    return TrainResult(
        best_loss, epoch + 1 - start_epoch, params, encoder_params,
        preempted=preempted,
    )
