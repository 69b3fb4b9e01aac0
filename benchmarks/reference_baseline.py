"""Measure the reference's decode throughput on CPU (phase 0 of BASELINE.md).

Runs the reference geo-aware ``DecoderTransformer.predict`` loop (batch-1
greedy, full-prefix re-decode per step — geo-aware/models.py:363-443) at
production sizes (V=10k, E=300+1, d_model=300, 3 layers) and reports
captions/sec.  The ResNet-101 encode stage is EXCLUDED (torchvision is not
installed here), which biases the baseline in the reference's favor —
encoder_out is fed as a precomputed (1, 300, 196) tensor.

Writes benchmarks/reference_cpu_baseline.json.
"""

import json
import os
import sys
import time
import types

import numpy as np
import torch

REFERENCE = "/root/reference/geo-aware"


def main():
    if "torchvision" not in sys.modules:
        stub = types.ModuleType("torchvision")
        stub.models = types.SimpleNamespace(resnet101=None)
        sys.modules["torchvision"] = stub
    sys.path.insert(0, REFERENCE)
    import models as ref_models

    torch.manual_seed(0)
    V = 10000
    E = 301
    max_len = 30
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

    rng = np.random.default_rng(0)
    n_images = 8
    contexts = []
    for _ in range(n_images):
        ents = np.zeros((1, E, 5), dtype=np.float32)
        ents[0, :, 0] = np.arange(E)
        ents[0, :, 1] = rng.uniform(0, 1, E)
        ents[0, :, 2] = rng.uniform(-179, 179, E)
        ents[0, :, 3] = rng.uniform(0, 0.1, E)
        ents[0, :, 4] = rng.integers(0, 900, E)
        enc_out = rng.standard_normal((1, 300, 196)).astype(np.float32)
        contexts.append((torch.tensor(enc_out), torch.tensor(ents)))

    with torch.no_grad():
        # warmup
        decoder.predict(contexts[0][0], max_len, contexts[0][1])
        start = time.perf_counter()
        steps = 0
        for enc_out, ents in contexts:
            out = decoder.predict(enc_out, max_len, ents)
            steps += 1
        elapsed = time.perf_counter() - start
    caps_per_sec = steps / elapsed
    result = {
        "metric": "reference CPU captions/sec (batch-1 greedy predict, geo config)",
        "value": caps_per_sec,
        "n_images": steps,
        "elapsed_s": elapsed,
        "notes": "encoder excluded (torchvision unavailable); favors reference",
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "reference_cpu_baseline.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
