"""Controlled int8-KV decode A/B at the per-preset production shapes.

Round-3 verdict ask #2: the r2 int8-KV measurement (1420 vs 1572 caps/s)
was taken only at the GEO shapes, where the cross-attention memory is
smallest (M=64) and the quantization overhead proportionally largest.  At
the fact presets the memory is M=548 (knowledge) / M=598 (news) rows
re-read by every decode step — the one place the byte halving is most
likely to pay.  This benchmark answers that question with a controlled
same-session A/B: for each preset it builds ONE model + batch, compiles
the full fused pipeline (encode + context prep + beam decode, as in
multi_dataset_eval.py) per kv_dtype variant, then INTERLEAVES timed
iterations round-robin across variants so tunnel drift (~±4%
session-to-session) hits all variants equally.

Variants: bf16 (kv_dtype=None), int8 (self caches + cross KV quantized),
int8_cross (cross KV only — self caches stay bf16; decode/beam.py).

Usage: python benchmarks/int8_kv_ab.py [--presets k_georic nytimes800k]
                                       [--batch 256] [--beam 5] [--iters 8]
"""

import argparse
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
from icek_tpu.data.codec import Wordmap
from icek_tpu.decode import beam as beam_lib
from icek_tpu.decode import greedy as greedy_lib
from icek_tpu.models import captioner, resnet

from multi_dataset_eval import synthetic_context

VARIANTS = (None, "int8", "int8_cross")


def build_pipelines(name, batch, beam, vocab=10000, seed=0):
    cfg = config_lib.get_config(name)
    compute_dtype = (
        jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    )
    rng = np.random.default_rng(seed)
    wm = Wordmap.from_words([f"w{i}" for i in range(vocab - 4)])
    key = jax.random.PRNGKey(seed)
    params = captioner.init_captioner_params(key, cfg.model, len(wm))
    folded = resnet.fold_bn_params(resnet.init_resnet101(key, cfg.model.emb_dim))

    images = jnp.asarray(
        rng.standard_normal((batch, 256, 256, 3)).astype(np.float32)
    )
    ents, _, facts, _ = synthetic_context(rng, cfg, batch, len(wm))
    E = ents.shape[1]
    ents_j = jnp.asarray(ents)
    facts_j = jnp.asarray(facts) if facts is not None else None

    def make(kv_dtype):
        @jax.jit
        def pipeline(images):
            tokens = resnet.resnet_encode_folded(
                folded, images, cfg.model.encoded_image_size,
                compute_dtype=compute_dtype,
            )
            ctx = greedy_lib.prepare_decode_context(
                params, cfg.model, tokens, ents_j, facts_j,
                compute_dtype=compute_dtype,
            )
            decoded, _ = beam_lib.beam_decode(
                params, cfg.model, len(wm), E, wm.start_id, wm.end_id,
                wm.pad_id, ctx, cfg.decode.max_caption_len, beam_size=beam,
                compute_dtype=compute_dtype, kv_dtype=kv_dtype,
            )
            return decoded

        return pipeline

    return {v: make(v) for v in VARIANTS}, images


def run_preset(name, batch, beam, iters):
    pipelines, images = build_pipelines(name, batch, beam)
    # compile + warm every variant before any timing
    for v, fn in pipelines.items():
        t0 = time.perf_counter()
        np.asarray(fn(images))
        print(f"  [{name}] {v or 'bf16'}: first run "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    times = {v: [] for v in VARIANTS}
    for _ in range(iters):
        for v, fn in pipelines.items():  # interleave: drift hits all equally
            t0 = time.perf_counter()
            jax.block_until_ready(fn(images))
            times[v].append(time.perf_counter() - t0)
    out = {"preset": name, "batch": batch, "beam": beam, "iters": iters}
    for v in VARIANTS:
        med = float(np.median(times[v]))
        out[f"{v or 'bf16'}_caps_per_sec"] = round(batch / med, 1)
        out[f"{v or 'bf16'}_median_s"] = round(med, 4)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--presets", nargs="*",
                    default=["georic", "k_georic", "nytimes800k"])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    results = [
        run_preset(p, args.batch, args.beam, args.iters) for p in args.presets
    ]
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
