"""Measure the reference's decode throughput on CPU (phase 0 of BASELINE.md).

Runs the reference ``DecoderTransformer.predict`` loop (batch-1 greedy,
full-prefix re-decode per step — geo-aware/models.py:363-443,
knowledge-aware/models.py:516-609, news-knowledge-aware/models.py:499-592)
at production sizes for each preset and reports captions/sec:

  geo        V=10k  E=300+1          max_len=30
  knowledge  V=10k  E=300+1  F=50+1  max_len=40
  news       V=10k  E=100+1  F=300+1 max_len=40

The ResNet-101 encode stage is EXCLUDED (torchvision is not installed
here), which biases every baseline in the reference's favor — encoder_out
is fed as a precomputed (1, 300, 196) tensor.

Usage: python benchmarks/reference_baseline.py [geo|knowledge|news|all]
Writes benchmarks/reference_cpu_baseline.json (dict keyed by preset).
"""

import importlib
import json
import os
import sys
import time
import types

import numpy as np
import torch

REFERENCE_ROOT = "/root/reference"

PRESETS = {
    "geo": {
        "dir": "geo-aware", "E": 301, "F": 0, "max_len": 30,
        "type_vocab": 1000, "n_images": 8,
    },
    "knowledge": {
        "dir": "knowledge-aware", "E": 301, "F": 51, "max_len": 40,
        "type_vocab": 1000, "n_images": 8,
    },
    "news": {
        "dir": "news-knowledge-aware", "E": 101, "F": 301, "max_len": 40,
        "type_vocab": 20, "n_images": 4,
    },
}


def _import_reference_models(subdir: str):
    """Import the subproject's models module (each subproject ships its own
    flat `models.py`, so imports must be isolated per preset)."""
    if "torchvision" not in sys.modules:
        stub = types.ModuleType("torchvision")
        stub.models = types.SimpleNamespace(resnet101=None)
        sys.modules["torchvision"] = stub
    saved = {m: sys.modules.pop(m) for m in ("models", "utils") if m in sys.modules}
    path = os.path.join(REFERENCE_ROOT, subdir)
    sys.path.insert(0, path)
    try:
        models = importlib.import_module("models")
        importlib.reload(models)
        return models
    finally:
        sys.path.pop(0)
        sys.modules.pop("models", None)
        sys.modules.pop("utils", None)
        sys.modules.update(saved)


def _make_contexts(preset, rng):
    """Random entity/fact contexts shaped like the packed protocol arrays
    (geo-aware/utils.py:194-269; news packs 5 name word ids in cols 5..9,
    news-knowledge-aware/utils.py:232-244)."""
    E, F = preset["E"], preset["F"]
    n_cols = 10 if preset["dir"].startswith("news") else 5
    contexts = []
    for _ in range(preset["n_images"]):
        ents = np.zeros((1, E, n_cols), dtype=np.float32)
        ents[0, :, 0] = np.arange(E)
        if n_cols == 5:  # geo/knowledge: dist/azimuth/size/type
            ents[0, :, 1] = rng.uniform(0, 1, E)
            ents[0, :, 2] = rng.uniform(-179, 179, E)
            ents[0, :, 3] = rng.uniform(0, 0.1, E)
            ents[0, :, 4] = rng.integers(0, preset["type_vocab"] - 100, E)
        else:  # news: count/headline/first_par/type/name-word-ids
            ents[0, :, 1] = rng.integers(0, 5, E)
            ents[0, :, 2] = rng.integers(0, 2, E)
            ents[0, :, 3] = rng.integers(0, 2, E)
            ents[0, :, 4] = rng.integers(0, preset["type_vocab"], E)
            ents[0, :, 5:] = rng.integers(1, 9000, (E, 5))
        enc_out = rng.standard_normal((1, 300, 196)).astype(np.float32)
        if F:
            # the reference loads facts as LongTensor (knowledge datasets.py:60)
            facts = np.zeros((1, F, 3), dtype=np.int64)
            facts[0, :, 0] = np.arange(F)
            facts[0, :, 1] = rng.integers(0, E, F)
            facts[0, :, 2] = rng.integers(0, 2500, F)
            contexts.append(
                (torch.tensor(enc_out), torch.tensor(ents), torch.tensor(facts))
            )
        else:
            contexts.append((torch.tensor(enc_out), torch.tensor(ents)))
    return contexts


def measure_preset(name: str):
    preset = PRESETS[name]
    ref_models = _import_reference_models(preset["dir"])
    torch.manual_seed(0)
    V = 10000
    wm = {f"w{i}": i + 1 for i in range(V - 4)}
    wm["<unk>"] = len(wm) + 1
    wm["<start>"] = len(wm) + 1
    wm["<end>"] = len(wm) + 1
    wm["<pad>"] = 0

    decoder = ref_models.DecoderTransformer(
        word_map=wm, emb_dim=300, decoder_dim=512, encoder_dim=512,
        num_heads=10, num_layers=3,
        dropout_dec=0.0, dropout_enc=0.0, dropout_pos=0.0,
    ).eval()

    contexts = _make_contexts(preset, np.random.default_rng(0))
    max_len = preset["max_len"]
    with torch.no_grad():
        decoder.predict(*contexts[0][:1], max_len, *contexts[0][1:])  # warmup
        start = time.perf_counter()
        for ctx in contexts:
            decoder.predict(ctx[0], max_len, *ctx[1:])
        elapsed = time.perf_counter() - start
    caps_per_sec = len(contexts) / elapsed
    return {
        "metric": f"reference CPU captions/sec (batch-1 greedy predict, {name} config)",
        "value": caps_per_sec,
        "n_images": len(contexts),
        "elapsed_s": elapsed,
        "notes": "encoder excluded (torchvision unavailable); favors reference",
    }


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(PRESETS) if which == "all" else [which]
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "reference_cpu_baseline.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        # migrate the round-1 single-preset format
        results = prior if "value" not in prior else {"geo": prior}
    for name in names:
        results[name] = measure_preset(name)
        print(json.dumps({name: results[name]}))
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
