"""Profile the fused eval pipeline (encode + context prep + beam decode)
and print a device-time summary by op class, plus the top individual ops
with their HLO long names.

This is the reproducible version of the round-3 ad-hoc trace analysis
that found the `fact_before` scalar-gather pathology (2.7 ms/step = 46%
of the news beam step; see BASELINE.md).  Same caveats as
tools/profile_train_step.py: attributed per-op times are a WHERE map,
not a savings predictor — XLA hides much of it behind async copies;
decide with controlled end-to-end A/B only.

Usage: python tools/profile_eval.py [batch] [preset] [beam] [trace_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "benchmarks"),
)

from profile_train_step import find_trace, op_class, summarize  # noqa: E402


def top_ops(trace_path, n=20):
    """Print the n largest individual ops with HLO long names (layouts!)."""
    import collections
    import gzip

    with gzip.open(trace_path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {
        pid for pid, name in pid_names.items()
        if any(k in name for k in ("TPU", "Chip", "/device", "XLA Op"))
    }
    agg = collections.defaultdict(lambda: [0.0, 0, ""])
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        args = e.get("args") or {}
        if device_pids and not (
            "long_name" in args or "hlo_op" in args or "hlo" in args
        ):
            continue
        name = e.get("name", "")
        if name == "while" or op_class(name) == "while":
            continue  # the loop wrapper subsumes its body; skip
        g = agg[name]
        g[0] += e["dur"] / 1000.0
        g[1] += 1
        g[2] = (args.get("long_name") or args.get("hlo") or "")[:200]
    print(f"\ntop {n} individual ops:")
    for name, (ms, count, long_name) in sorted(
        agg.items(), key=lambda kv: -kv[1][0]
    )[:n]:
        print(f"{ms:8.2f} ms x{count:<5} {name}\n           {long_name}")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    preset = sys.argv[2] if len(sys.argv) > 2 else "georic"
    beam = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    trace_dir = (
        sys.argv[4] if len(sys.argv) > 4 else f"/tmp/icek_eval_trace_{preset}"
    )

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/icek_jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from icek_tpu.core import config as config_lib
    from icek_tpu.data.codec import Wordmap
    from icek_tpu.decode import beam as beam_lib
    from icek_tpu.decode import greedy as greedy_lib
    from icek_tpu.models import captioner, resnet
    from multi_dataset_eval import synthetic_context

    vocab = 10000
    cfg = config_lib.get_config(preset)
    backend = jax.default_backend()
    compute_dtype = jnp.float32 if backend == "cpu" else jnp.bfloat16
    rng = np.random.default_rng(0)
    wm = Wordmap.from_words([f"w{i}" for i in range(vocab - 4)])
    key = jax.random.PRNGKey(0)
    params = captioner.init_captioner_params(key, cfg.model, len(wm))
    encoder_params = resnet.init_resnet101(key, cfg.model.emb_dim)
    images = jnp.asarray(
        rng.standard_normal((batch, 256, 256, 3)).astype(np.float32)
    )
    ents, _, facts, _ = synthetic_context(rng, cfg, batch, len(wm))
    E = ents.shape[1]
    ents_j = jnp.asarray(ents)
    facts_j = jnp.asarray(facts) if facts is not None else None
    folded = resnet.fold_bn_params(encoder_params)

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

    np.asarray(pipeline(images))  # compile
    t0 = time.perf_counter()
    np.asarray(pipeline(images))
    steady = time.perf_counter() - t0
    print(json.dumps({
        "preset": preset, "batch": batch, "beam": beam,
        "pipeline_steady_s": round(steady, 4),
        "caps_per_sec": round(batch / steady, 1),
    }))
    with jax.profiler.trace(trace_dir):
        np.asarray(pipeline(images))
    trace = find_trace(trace_dir)
    summarize(trace, 1)
    top_ops(trace)


if __name__ == "__main__":
    main()
