"""Controlled int8-PTQ-encoder A/B on the full fused eval pipeline.

The round-3 encode profile put the bf16 folded ResNet at ~80% of the conv
bandwidth roofline — the remaining levers are arithmetic (int8: the v5e MXU
runs int8xint8->int32 at 2x the bf16 rate AND halves activation traffic;
an isolated 20-conv probe measured 1.66x) or cross-layer Pallas conv
pipelining.  models/resnet_int8.py implements the int8 path; this measures
what it buys END TO END: the fused encode + context prep + beam-5 pipeline
at the flagship shapes, bf16-folded vs int8-qtree, INTERLEAVED iterations
(tunnel drift ~±4% session-to-session hits both variants equally).

The int8 encoder changes arithmetic (captions may differ — PTQ is opt-in
via eval.py --encoder-qtree / --encoder-int8); this benchmark also reports
caption token agreement between the two variants so the speed number comes
with its quality cost attached.

Usage: python benchmarks/int8_encoder_ab.py [--batch 256] [--beam 5]
                                            [--iters 8] [--preset georic]
                                            [--kv-dtype int8]

--kv-dtype applies the int8 KV cache (decode/beam.py) to the int8-encoder
variant only, measuring the combined "fast stack" against the stock bf16
pipeline (e.g. news serving: int8 encoder + int8 KV vs bf16+float).
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
from icek_tpu.models import captioner, resnet, resnet_int8

from multi_dataset_eval import synthetic_context


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="georic")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--calib-batches", type=int, default=2)
    ap.add_argument("--kv-dtype", default=None,
                    help="int8/int8_cross KV caches on the int8-encoder "
                         "variant (combined fast-stack A/B)")
    args = ap.parse_args()

    cfg = config_lib.get_config(args.preset)
    compute_dtype = (
        jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    )
    rng = np.random.default_rng(0)
    vocab = 10000
    wm = Wordmap.from_words([f"w{i}" for i in range(vocab - 4)])
    key = jax.random.PRNGKey(0)
    params = captioner.init_captioner_params(key, cfg.model, len(wm))
    encoder_params = resnet.init_resnet101(key, cfg.model.emb_dim)
    folded = resnet.fold_bn_params(encoder_params)

    images = jnp.asarray(
        rng.standard_normal((args.batch, 256, 256, 3)).astype(np.float32)
    )
    ents, _, facts, _ = synthetic_context(rng, cfg, args.batch, len(wm))
    E = ents.shape[1]
    ents_j = jnp.asarray(ents)
    facts_j = jnp.asarray(facts) if facts is not None else None

    # calibrate on distinct batches drawn from the same distribution
    calib = [
        jnp.asarray(
            rng.standard_normal((args.batch, 256, 256, 3)).astype(np.float32)
        )
        for _ in range(args.calib_batches)
    ]
    print("calibrating int8 tree...", file=sys.stderr)
    qtree = resnet_int8.calibrate_and_quantize(
        folded, calib, compute_dtype=compute_dtype,
        source_params=encoder_params,
    )

    def make(encode, kv_dtype=None):
        @jax.jit
        def pipeline(images):
            tokens = encode(images)
            ctx = greedy_lib.prepare_decode_context(
                params, cfg.model, tokens, ents_j, facts_j,
                compute_dtype=compute_dtype,
            )
            decoded, _ = beam_lib.beam_decode(
                params, cfg.model, len(wm), E, wm.start_id, wm.end_id,
                wm.pad_id, ctx, cfg.decode.max_caption_len,
                beam_size=args.beam, compute_dtype=compute_dtype,
                kv_dtype=kv_dtype,
            )
            return decoded

        return pipeline

    pipelines = {
        "bf16": make(lambda imgs: resnet.resnet_encode_folded(
            folded, imgs, cfg.model.encoded_image_size,
            compute_dtype=compute_dtype,
        )),
        "int8": make(lambda imgs: resnet_int8.resnet_encode_int8(
            qtree, imgs, cfg.model.encoded_image_size,
            compute_dtype=compute_dtype,
        ), kv_dtype=args.kv_dtype),
    }
    outs = {}
    for name, fn in pipelines.items():
        t0 = time.perf_counter()
        outs[name] = np.asarray(fn(images))
        print(f"  {name}: first run {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
    agree = float((outs["bf16"] == outs["int8"]).mean())

    times = {name: [] for name in pipelines}
    for _ in range(args.iters):
        for name, fn in pipelines.items():
            t0 = time.perf_counter()
            jax.block_until_ready(fn(images))
            times[name].append(time.perf_counter() - t0)
    result = {
        "preset": args.preset, "batch": args.batch, "beam": args.beam,
        "iters": args.iters, "token_agreement": round(agree, 4),
    }
    for name, ts in times.items():
        med = float(np.median(ts))
        result[f"{name}_caps_per_sec"] = round(args.batch / med, 1)
        result[f"{name}_median_s"] = round(med, 4)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
