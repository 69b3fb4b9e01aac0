"""Input-pipeline throughput: is data loading ever the bottleneck?

Builds a synthetic geo-shaped dataset at production tensor sizes (E=300+1,
cap len 32, 196x300 cached image tokens), converts it to the streaming
sidecar store, and measures host-side batch assembly for both loaders at
batch 256 against the measured TPU train-step time (127.8 ms at batch 256,
BASELINE.md).  The loaders run on a prefetch thread in production
(data/dataset.py::prefetch), so the step hides any data time below the
step time entirely.

Usage: python benchmarks/streaming_loader.py [n_rows]
Prints one JSON line per loader.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEP_MS = 83.5  # measured train-step time at batch 256 (BASELINE.md r3)


def build_fixture(root, n, E=301, T=32, D=300):
    import h5py

    base = "loaderbench"
    rng = np.random.default_rng(0)
    caps = rng.integers(1, 5000, (n, T)).astype(np.int32)
    ents = rng.standard_normal((n, E, 5)).astype(np.float32)
    names = rng.integers(32, 120, (n, E, 52)).astype(np.int32)
    with h5py.File(os.path.join(root, f"TRAIN_IMAGES_{base}.hdf5"), "w") as h:
        h.create_dataset("images", data=np.zeros((n, 3, 8, 8), np.float16))
    for kind, arr in (("CAPTIONS", caps), ("CAPLENS", np.full((n,), T, np.int32)),
                      ("CAPMASKS", np.zeros((n, T), np.int32))):
        with open(os.path.join(root, f"TRAIN_{kind}_{base}.json"), "w") as f:
            json.dump(arr.tolist(), f)
    import pickle

    for kind, arr in (("ENT_FEATURES", ents), ("ENT_NAMES", names)):
        with open(os.path.join(root, f"TRAIN_{kind}_{base}.pkl"), "wb") as f:
            pickle.dump(arr.tolist(), f)
    # production-size image-token cache on disk for the streaming loader
    from icek_tpu.data import streaming

    tokens = rng.standard_normal((n, 196, D)).astype(np.float32)
    import h5py

    with h5py.File(streaming.token_cache_path(root, base, "TRAIN"), "w") as h:
        # contiguous, like the library's cache_image_tokens (chunked layouts
        # round every random row access up to whole chunks)
        h.create_dataset("image_tokens", data=tokens)
    return base, tokens


def measure(data, batch=256, epochs=3):
    """First epoch includes cold disk + buffer warmup; steady state is the
    best later epoch (what a multi-epoch training run actually sees)."""
    per_epoch = []
    for epoch in range(epochs):
        t0 = time.perf_counter()
        count = 0
        for b in data.epoch_batches(batch, shuffle=True, seed=epoch):
            count += 1
            for v in b.values():
                np.asarray(v)
        per_epoch.append((time.perf_counter() - t0) / count * 1000)
    steady = min(per_epoch[1:]) if len(per_epoch) > 1 else per_epoch[0]
    return {"batches_per_epoch": count,
            "first_epoch_ms_per_batch": round(per_epoch[0], 2),
            "steady_ms_per_batch": round(steady, 2),
            "step_ms": STEP_MS,
            "steady_data_over_step": round(steady / STEP_MS, 3)}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    root = tempfile.mkdtemp(prefix="icek_loaderbench_")
    try:
        base, tokens = build_fixture(root, n)
        from icek_tpu.data import dataset as ds
        from icek_tpu.data import streaming

        mem = ds.CaptionDataset(root, base, "TRAIN")
        mem.image_tokens = tokens
        out = {"in_memory": measure(mem)}
        stream = streaming.StreamingCaptionDataset(root, base, "TRAIN")
        out["streaming"] = measure(stream)
        stream.close()  # release the f32 cache so it can be rewritten
        # f16 token cache (what bf16 training writes, train/loop.py): halves
        # the dominant per-batch byte stream (196x300 tokens per row)
        import h5py

        with h5py.File(
            streaming.token_cache_path(root, base, "TRAIN"), "w"
        ) as h:
            h.create_dataset(
                "image_tokens", data=tokens.astype(np.float16)
            )
        stream16 = streaming.StreamingCaptionDataset(root, base, "TRAIN")
        out["streaming_f16_cache"] = measure(stream16)
        for k, v in out.items():
            print(json.dumps({k: v}))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
