"""Controlled eval-pipeline A/B across transformer geometries.

BASELINE.md's geometry sweep measured the TRAIN side (256x8 = +47% at
batch 256); this measures what the `georic_fast` preset buys on the EVAL
side: the fused ResNet-101 encode + context prep + beam-5 pipeline at the
flagship shapes, one variant per geometry, INTERLEAVED iterations so the
~±4% tunnel drift hits all variants equally (same methodology as
benchmarks/int8_kv_ab.py / int8_encoder_ab.py).

The ResNet body is geometry-independent (only the final 2048->d projection
changes), so any eval-side spread beyond noise is the decode loop + context
encoders.  Different geometries are different models (random weights here;
captions are not comparable across variants — only wall time is).

Usage: python benchmarks/geometry_eval_ab.py [--geometries 300x10 256x8]
                                             [--batch 256] [--beam 5]
                                             [--iters 8] [--preset georic]
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


def build_pipeline(cfg, wm, batch, beam, compute_dtype, seed=0):
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    params = captioner.init_captioner_params(key, cfg.model, len(wm))
    encoder_params = resnet.init_resnet101(key, cfg.model.emb_dim)
    folded = resnet.fold_bn_params(encoder_params)
    ents, _, facts, _ = synthetic_context(rng, cfg, batch, len(wm))
    E = ents.shape[1]
    ents_j = jnp.asarray(ents)
    facts_j = jnp.asarray(facts) if facts is not None else None

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
            compute_dtype=compute_dtype,
        )
        return decoded

    return pipeline


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="georic")
    ap.add_argument("--geometries", nargs="*", default=["300x10", "256x8"])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    compute_dtype = (
        jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    )
    base = config_lib.get_config(args.preset)
    wm = Wordmap.from_words([f"w{i}" for i in range(10000 - 4)])
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((args.batch, 256, 256, 3)).astype(np.float32)
    )

    pipelines = {}
    for geom in args.geometries:
        cfg = config_lib.apply_geometry(base, geom)
        pipelines[geom] = build_pipeline(
            cfg, wm, args.batch, args.beam, compute_dtype
        )

    for name, fn in pipelines.items():
        t0 = time.perf_counter()
        jax.block_until_ready(fn(images))
        print(f"  {name}: first run {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

    times = {name: [] for name in pipelines}
    for _ in range(args.iters):
        for name, fn in pipelines.items():
            t0 = time.perf_counter()
            jax.block_until_ready(fn(images))
            times[name].append(time.perf_counter() - t0)
    result = {
        "preset": args.preset, "batch": args.batch, "beam": args.beam,
        "iters": args.iters,
    }
    for name, ts in times.items():
        med = float(np.median(ts))
        result[f"{name}_caps_per_sec"] = round(args.batch / med, 1)
        result[f"{name}_median_s"] = round(med, 4)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
