"""Controlled gradient-accumulation train-step A/B at production shapes.

The first grad-accum measurement (ICEK_ACCUM on train_throughput.py) showed
the ACCUMULATED step beating the monolithic one at the same global batch
(256 geo: 81.9 ms -> 69.8 ms at accum=4) — per-sample FLOPs identical, so
the win must come from the smaller working set per microbatch (the bf16
(B, T, V+E+F) score tensor alone is 170 MB at batch 256 vs 42 MB at 64;
the fwd+bwd passes over it run closer to peak when the tiles stay small)
plus the per-batch fixed cost (optimizer update over ~300 leaves, grad
scale) amortizing once per global batch.

This benchmark makes the claim honest: ONE model + batch per preset, one
jitted train step per accum factor, all compiled before timing, then timed
CHUNKS interleaved round-robin across variants so tunnel drift (~±4%
session-to-session) hits every variant equally.  Each variant keeps its own
(params, opt_state) chain because the steps donate their buffers.

Semantics are exact across variants (tests/test_grad_accum.py): this is a
free knob, not a quality trade.

Usage: python benchmarks/grad_accum_ab.py [--presets georic ...]
         [--batch 256] [--accum 1 2 4 8] [--iters 6] [--chunk 15]
       python benchmarks/grad_accum_ab.py --presets georic \
         --pairs 256x8 512x16   # race global batches in one session
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/icek_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from icek_tpu.core import config as config_lib
from icek_tpu.models import captioner
from icek_tpu.train import step as step_lib

from train_throughput import PRESET_SHAPES, VOCAB


def build_batch(rng, cfg, preset, batch):
    E, F, C, T = PRESET_SHAPES[preset]
    ext = VOCAB + E + F
    ents = np.zeros((batch, E, C), dtype=np.float32)
    ents[:, :, 0] = np.arange(E)
    ents[:, :, 4] = rng.integers(0, cfg.model.type_vocab, (batch, E))
    if C > 5:
        ents[:, :, 5:] = rng.integers(0, VOCAB, (batch, E, C - 5))
    data = {
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
        data["fact_features"] = facts
    ids = data["caption_ids"]
    data["caption_mask"][(ids >= VOCAB) & (ids < VOCAB + E)] = 1
    data["caption_mask"][ids >= VOCAB + E] = 2
    return jax.tree.map(jnp.asarray, data)


def run_preset(preset, pairs, iters, chunk):
    """Interleaved A/B over (global_batch, accum) pairs for one preset.

    All variants share one session/process, compile before timing, and are
    timed in round-robin chunks so tunnel drift hits every variant equally.
    Distinct global batches build distinct (seed-0) batch tensors; samples/s
    is per-variant batch/step so cross-batch comparisons are apples-to-apples
    throughput.
    """
    compute_dtype = (
        jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    )
    cfg0 = config_lib.get_config(preset)
    batches = {}
    for b, _ in pairs:
        if b not in batches:
            batches[b] = build_batch(np.random.default_rng(0), cfg0,
                                     preset, b)
    keys = [jax.random.PRNGKey(i) for i in range(chunk)]
    jax.block_until_ready(keys)

    states = {}
    for b, a in pairs:
        cfg = cfg0.replace(
            train=dataclasses.replace(cfg0.train, grad_accum_steps=a)
        )
        params = captioner.init_captioner_params(
            jax.random.PRNGKey(0), cfg.model, VOCAB
        )
        optimizer = step_lib.make_optimizer(
            cfg.train.decoder_lr, cfg.train.grad_clip
        )
        opt_state = optimizer.init(params)
        ts, _ = step_lib.make_train_step(
            cfg, VOCAB, 0, optimizer,
            compute_dtype=compute_dtype, encode_images=False,
        )
        t0 = time.perf_counter()
        params, opt_state, loss, _ = ts(params, opt_state, None,
                                        batches[b], keys[0])
        float(loss)  # compile + drain (block_until_ready is unreliable
        # through the axon tunnel)
        print(f"  [{preset}] batch={b} accum={a}: first step "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        states[(b, a)] = [ts, params, opt_state]

    times = {pair: [] for pair in pairs}
    for _ in range(iters):
        for pair in pairs:  # interleave: drift hits all equally
            b, _ = pair
            ts, params, opt_state = states[pair]
            t0 = time.perf_counter()
            for i in range(chunk):
                params, opt_state, loss, _ = ts(params, opt_state, None,
                                                batches[b], keys[i])
            float(loss)
            times[pair].append((time.perf_counter() - t0) / chunk)
            states[pair][1], states[pair][2] = params, opt_state

    out = {"preset": preset, "iters": iters, "chunk": chunk}
    for pair in pairs:
        b, a = pair
        med = float(np.median(times[pair]))
        tag = f"b{b}_accum{a}" if len({p[0] for p in pairs}) > 1 \
            else f"accum{a}"
        out[f"{tag}_step_ms"] = round(med * 1000, 2)
        out[f"{tag}_samples_per_sec"] = round(b / med, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--presets", nargs="*",
                    default=["georic", "k_georic", "nytimes800k"])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--accum", nargs="*", type=int, default=[1, 2, 4, 8])
    ap.add_argument("--pairs", nargs="*", metavar="BATCHxACCUM",
                    help="explicit (global batch, accum) variants, e.g. "
                         "256x8 512x16 — overrides --batch/--accum; lets "
                         "different global batches race in one session")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--chunk", type=int, default=15)
    args = ap.parse_args()
    if args.pairs:
        pairs = []
        for p in args.pairs:
            # accept both the BATCHxACCUM and BATCH:ACCUM spellings
            parts = p.replace(":", "x").split("x")
            if len(parts) != 2:
                ap.error(
                    f"--pairs entries must be BATCHxACCUM (e.g. 256x8); "
                    f"got {p!r}"
                )
            pairs.append((int(parts[0]), int(parts[1])))
    else:
        pairs = [(args.batch, a) for a in args.accum]
    results = [
        run_preset(p, pairs, args.iters, args.chunk)
        for p in args.presets
    ]
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
