"""Training throughput: icek_tpu jitted train step (TPU) vs the reference's
torch train iteration (CPU), all three presets at production sizes.

Both measurements exclude the frozen ResNet encoder (icek_tpu caches image
tokens once per split; the reference recomputes it per batch, so this is
again conservative in the reference's favor).  The reference side times one
forward + backward + clip + Adam step of DecoderTransformer at its
documented batch size 4 (geo-aware/train.py:45); ours at batch 64.

Usage: train_throughput.py [icek|stock|reference|both|finetune|finetune_bn]
                           [batch] [georic|k_georic|nytimes800k]
Env: ICEK_RBG=0/1 forces hardware-PRNG dropout off/on (default: auto);
     ICEK_FLAT=0/1 forces the flattened clip+Adam off/on (default: auto).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB, E, T = 10000, 301, 32

# production training shapes per preset: (E+1 entity rows, F+1 fact rows,
# ents feature width, padded caption length = prep max_len + start/end)
PRESET_SHAPES = {
    "georic": (301, 0, 5, 32),
    "k_georic": (301, 51, 5, 102),
    "nytimes800k": (101, 301, 10, 52),
    # same data protocol/shapes as georic; only the transformer geometry
    # differs (config.georic_fast)
    "georic_fast": (301, 0, 5, 32),
}


def measure_icek(batch=64, iters=60, flash=None, preset="georic",
                 profile_dir=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/icek_jax_cache")
    import dataclasses

    from icek_tpu.core import config as config_lib
    from icek_tpu.models import captioner
    from icek_tpu.train import step as step_lib

    cfg = config_lib.get_config(preset)
    E, F, C, T = PRESET_SHAPES[preset]
    if flash is not None:
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, use_flash_attention=flash)
        )
    rbg_env = os.environ.get("ICEK_RBG")
    if rbg_env is not None:
        cfg = cfg.replace(
            train=dataclasses.replace(cfg.train, use_rbg_dropout=rbg_env == "1")
        )
    geom = os.environ.get("ICEK_GEOM")  # "<emb_dim>x<heads>", e.g. "384x12":
    # from-scratch lane-aligned geometry (SURVEY §7; now a user capability —
    # train.py --geometry / the georic_fast preset).  Not checkpoint-
    # compatible with the reference's d=300/10-head models.
    if geom:
        cfg = config_lib.apply_geometry(cfg, geom)
    flat_env = os.environ.get("ICEK_FLAT")  # A/B: flattened clip+Adam
    flat = None if flat_env is None else flat_env == "1"
    accum_env = os.environ.get("ICEK_ACCUM")  # A/B: in-graph grad accumulation
    if accum_env:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train,
            grad_accum_steps=accum_env if accum_env == "auto"
            else int(accum_env)))
    # benchmarks pass the bench batch so "auto" (the r5 default) resolves
    # exactly as a real training run at this batch would
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, batch_size=batch))
    compute_dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    rng = np.random.default_rng(0)
    params = captioner.init_captioner_params(jax.random.PRNGKey(0), cfg.model, VOCAB)
    optimizer = step_lib.make_optimizer(cfg.train.decoder_lr, cfg.train.grad_clip,
                                        flat=flat)
    opt_state = optimizer.init(params)
    train_step, _ = step_lib.make_train_step(
        cfg, VOCAB, 0, optimizer, compute_dtype=compute_dtype, encode_images=False
    )
    ext = VOCAB + E + F
    ents = np.zeros((batch, E, C), dtype=np.float32)
    ents[:, :, 0] = np.arange(E)
    ents[:, :, 4] = rng.integers(0, cfg.model.type_vocab, (batch, E))
    if C > 5:  # news: name word ids ride in cols 5..9
        ents[:, :, 5:] = rng.integers(0, VOCAB, (batch, E, C - 5))
    batch_data = {
        "caption_ids": rng.integers(1, ext, (batch, T)).astype(np.int32),
        "caption_mask": np.zeros((batch, T), dtype=np.int32),
        "lengths": np.full((batch,), T, dtype=np.int32),
        "entity_features": ents,
        "image_tokens": rng.standard_normal(
            (batch, 196, cfg.model.emb_dim)
        ).astype(np.float32),
    }
    if F:
        facts = np.zeros((batch, F, 3), dtype=np.float32)
        facts[:, :, 0] = np.arange(F)
        facts[:, :, 1] = rng.integers(0, E, (batch, F))
        facts[:, :, 2] = rng.integers(0, cfg.model.num_predicates, (batch, F))
        batch_data["fact_features"] = facts
    ids = batch_data["caption_ids"]
    batch_data["caption_mask"][(ids >= VOCAB) & (ids < VOCAB + E)] = 1
    batch_data["caption_mask"][ids >= VOCAB + E] = 2
    # pre-stage batch AND step keys on device: the production loader
    # prefetches on a background thread; this measures the device step itself
    batch_data = jax.tree.map(jnp.asarray, batch_data)
    keys = [jax.random.PRNGKey(i) for i in range(iters)]
    jax.block_until_ready(keys)
    params, opt_state, loss, _ = train_step(
        params, opt_state, None, batch_data, keys[0]
    )
    float(loss)  # force compile + sync (block_until_ready is unreliable
    # through the axon tunnel — only a value fetch truly drains the queue)
    best = float("inf")
    for _ in range(2):  # best-of-2 to shed tunnel dispatch noise
        t0 = time.perf_counter()
        for i in range(iters):
            params, opt_state, loss, _ = train_step(
                params, opt_state, None, batch_data, keys[i]
            )
        float(loss)
        best = min(best, (time.perf_counter() - t0) / iters)
    if profile_dir:  # one traced pass for tools/profile_train_step.py
        with jax.profiler.trace(profile_dir):
            for i in range(min(iters, 10)):
                params, opt_state, loss, _ = train_step(
                    params, opt_state, None, batch_data, keys[i]
                )
            float(loss)
    result = {"backend": jax.default_backend(), "batch": batch,
              "preset": preset,
              "geometry": f"{cfg.model.emb_dim}x{cfg.model.num_heads}",
              "rbg_dropout": step_lib.resolve_rbg_dropout(cfg.train.use_rbg_dropout),
              "flat_optimizer": step_lib.resolve_flat_optimizer(flat),
              # the RESOLVED value ("auto" is the config default since r5)
              "grad_accum": step_lib.resolve_grad_accum(
                  cfg.train.grad_accum_steps, cfg.model.variant, batch),
              "step_ms": round(best * 1000, 2),
              "samples_per_sec": round(batch / best, 1)}
    # chip-relative utilization: analytic fwd+bwd GEMM FLOPs over the
    # measured step time (utils/roofline.py; tokens are pre-cached, the
    # frozen encoder is not part of the step)
    from icek_tpu.utils import roofline

    result.update(roofline.utilization(
        roofline.train_step_flops(cfg.model, VOCAB, E, F, T) * batch, best
    ))
    return result


def measure_finetune(batch=16, iters=20, bn_train_mode=False):
    """fine_tune_encoder=True: full ResNet-101 fwd+bwd inside the step with
    raw 256x256 images — the reference's expensive mode
    (geo-aware/train.py:92-100).  With bn_train_mode, additionally runs the
    encoder's batch-norms in train mode (the reference's encoder.train()
    side effect)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/icek_jax_cache")
    from icek_tpu.core import config as config_lib
    from icek_tpu.models import captioner, resnet
    from icek_tpu.train import step as step_lib

    import dataclasses

    cfg = config_lib.georic()
    accum_env = os.environ.get("ICEK_ACCUM")  # memory lever: the ResNet
    # fwd+bwd activations dominate fine-tune HBM; accumulation scales the
    # peak by ~1/N at the same optimizer semantics.
    if accum_env:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train,
            grad_accum_steps=accum_env if accum_env == "auto"
            else int(accum_env)))
    # resolve "auto" against the benchmarked batch, like measure_icek
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, batch_size=batch))
    compute_dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    rng = np.random.default_rng(0)
    params = captioner.init_captioner_params(jax.random.PRNGKey(0), cfg.model, VOCAB)
    encoder_params = resnet.init_resnet101(jax.random.PRNGKey(1), cfg.model.emb_dim)
    optimizer = step_lib.make_optimizer(cfg.train.decoder_lr, cfg.train.grad_clip)
    opt_state = optimizer.init(params)
    enc_optimizer = step_lib.make_encoder_optimizer(
        encoder_params, cfg.train.encoder_lr, cfg.train.grad_clip
    )
    enc_opt_state = enc_optimizer.init(encoder_params)
    train_step, _ = step_lib.make_train_step(
        cfg, VOCAB, 0, optimizer, compute_dtype=compute_dtype,
        encode_images=True, encoder_optimizer=enc_optimizer,
        bn_train_mode=bn_train_mode,
    )
    ents = np.zeros((batch, E, 5), dtype=np.float32)
    ents[:, :, 0] = np.arange(E)
    ents[:, :, 4] = rng.integers(0, 900, (batch, E))
    batch_data = {
        "caption_ids": rng.integers(1, VOCAB + E, (batch, T)).astype(np.int32),
        "caption_mask": np.zeros((batch, T), dtype=np.int32),
        "lengths": np.full((batch,), T, dtype=np.int32),
        "entity_features": ents,
        "images": rng.standard_normal((batch, 256, 256, 3)).astype(np.float32),
    }
    batch_data["caption_mask"][batch_data["caption_ids"] >= VOCAB] = 1
    batch_data = jax.tree.map(jnp.asarray, batch_data)
    keys = [jax.random.PRNGKey(i) for i in range(iters)]
    jax.block_until_ready(keys)
    out = train_step(params, opt_state, encoder_params, enc_opt_state,
                     batch_data, keys[0])
    params, opt_state, encoder_params, enc_opt_state, loss = out[:5]
    float(loss)  # force compile + sync
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(iters):
            out = train_step(params, opt_state, encoder_params, enc_opt_state,
                             batch_data, keys[i])
            params, opt_state, encoder_params, enc_opt_state, loss = out[:5]
        float(loss)
        best = min(best, (time.perf_counter() - t0) / iters)
    result = {"backend": jax.default_backend(), "batch": batch,
              "bn_train_mode": bn_train_mode,
              # the RESOLVED value, like measure_icek ("auto" is the config
              # default since r5; bn_train_mode forces 1)
              "grad_accum": 1 if bn_train_mode else step_lib.resolve_grad_accum(
                  cfg.train.grad_accum_steps, cfg.model.variant, batch),
              "step_ms": round(best * 1000, 2),
              "samples_per_sec": round(batch / best, 1)}
    try:  # peak HBM — the number grad accumulation exists to move
        stats = jax.devices()[0].memory_stats()
        if stats and stats.get("peak_bytes_in_use"):
            result["peak_hbm_gb"] = round(stats["peak_bytes_in_use"] / 2**30, 2)
    except Exception:
        pass
    return result


def measure_reference(batch=4, iters=5):
    import types

    import numpy as np
    import torch
    from torch import nn

    if "torchvision" not in sys.modules:
        stub = types.ModuleType("torchvision")
        stub.models = types.SimpleNamespace(resnet101=None)
        sys.modules["torchvision"] = stub
    sys.path.insert(0, "/root/reference/geo-aware")
    import importlib

    import models as ref_models
    importlib.reload(ref_models)
    import utils as ref_utils
    from torch.nn.utils.rnn import pack_padded_sequence

    torch.manual_seed(0)
    wm = {f"w{i}": i + 1 for i in range(VOCAB - 4)}
    wm["<unk>"] = len(wm) + 1
    wm["<start>"] = len(wm) + 1
    wm["<end>"] = len(wm) + 1
    wm["<pad>"] = 0
    decoder = ref_models.DecoderTransformer(
        word_map=wm, emb_dim=300, decoder_dim=512, encoder_dim=512,
        num_heads=10, num_layers=3,
        dropout_dec=0.2, dropout_enc=0.2, dropout_pos=0.1,
    ).train()
    optimizer = torch.optim.Adam(decoder.parameters(), lr=4e-4)
    criterion = nn.CrossEntropyLoss(ignore_index=0)
    rng = np.random.default_rng(0)
    imgs = torch.tensor(rng.standard_normal((batch, 300, 196)).astype(np.float32))
    caps = torch.tensor(rng.integers(1, VOCAB - 4, (batch, T)).astype(np.int64))
    masks = torch.zeros((batch, T), dtype=torch.long)
    lengths = torch.tensor([[T - i] for i in range(batch)])
    ents = np.zeros((batch, E, 5), dtype=np.float32)
    ents[:, :, 0] = np.arange(E)
    ents_t = torch.tensor(ents)

    def one_step():
        scores, caps_sorted, dec_lens = decoder(caps, imgs, masks, lengths, ents_t)
        targets = caps_sorted[:, 1:]
        packed_s = pack_padded_sequence(scores, dec_lens, batch_first=True).data
        packed_t = pack_padded_sequence(targets, dec_lens, batch_first=True).data
        loss = criterion(packed_s, packed_t)
        optimizer.zero_grad()
        loss.backward()
        ref_utils.clip_gradient(optimizer, 5.0)
        optimizer.step()

    one_step()
    t0 = time.perf_counter()
    for _ in range(iters):
        one_step()
    dt = (time.perf_counter() - t0) / iters
    sys.path.pop(0)
    return {"backend": "torch-cpu", "batch": batch,
            "step_ms": round(dt * 1000, 2),
            "samples_per_sec": round(batch / dt, 1)}


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    preset = sys.argv[3] if len(sys.argv) > 3 else "georic"
    out = {}
    if which in ("both", "icek"):
        out["icek_tpu"] = measure_icek(batch=batch, preset=preset)
    if which == "stock":  # flash kernel ablation: stock XLA attention
        out["icek_tpu"] = measure_icek(batch=batch, flash=False, preset=preset)
    if which == "finetune":  # full ResNet fwd+bwd in the step
        out["icek_tpu"] = measure_finetune(batch=batch if batch != 64 else 16)
    if which == "finetune_bn":  # + reference's train-mode BN side effect
        out["icek_tpu"] = measure_finetune(
            batch=batch if batch != 64 else 16, bn_train_mode=True
        )
    if which in ("both", "reference"):
        out["reference"] = measure_reference()
    if "icek_tpu" in out and "reference" in out:
        out["speedup_samples_per_sec"] = round(
            out["icek_tpu"]["samples_per_sec"] / out["reference"]["samples_per_sec"], 1
        )
    print(json.dumps(out))
