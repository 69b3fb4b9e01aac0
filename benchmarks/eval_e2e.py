"""End-to-end Evaluator.run throughput: disk -> captions CSV.

bench.py measures the pure device pipeline (encode + beam-5) on resident
tensors; this harness measures what a user actually runs — the full
``eval_driver.Evaluator.run`` loop over an on-disk TEST split: HDF5 image
reads, host normalization, host->device staging, fused encode + beam
decode, detokenization, and the CSV write (reference flow:
geo-aware/eval.py:46-131, batch-1; here batched).

The real GeoRic blobs are absent from this mount (SURVEY.md §2.5), so the
split is synthesized once at production geo shapes (256x256 f16 HDF5
images, E=300+1 entity rows) under /tmp and reused across runs.

    python benchmarks/eval_e2e.py [--n 1024] [--batch 256] [--no-stage]

--no-stage restores the pre-staging behavior (prefetch thread yields numpy,
the device upload serializes into every decode dispatch) for an A/B of the
prefetch-thread jax.device_put staging in Evaluator.run.
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

import numpy as np

from icek_tpu import eval_driver
from icek_tpu.core import config as config_lib
from icek_tpu.data import codec
from icek_tpu.data import dataset as ds
from icek_tpu.models import captioner, resnet

VOCAB = 10000
DATA_DIR = os.environ.get("ICEK_EVAL_E2E_DIR", "/tmp/icek_eval_e2e_data")
BASE = "georic_synth"


def build_split(n: int) -> None:
    """Synthesize a TEST split in the L0 file protocol at geo shapes."""
    import pickle

    import h5py

    os.makedirs(DATA_DIR, exist_ok=True)
    marker = os.path.join(DATA_DIR, f"READY_{n}")
    if os.path.exists(marker):
        return
    cfg = config_lib.georic()
    dc = cfg.data
    E = dc.entity_context_size + 1
    T = dc.max_caption_len + 2  # <start> + tokens + <end>
    rng = np.random.default_rng(0)

    with h5py.File(os.path.join(DATA_DIR, f"TEST_IMAGES_{BASE}.hdf5"), "w") as h:
        dset = h.create_dataset(
            "images", (n, 3, dc.img_size, dc.img_size), dtype="float16"
        )
        chunk = 64
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            dset[s:e] = rng.uniform(
                0, 255, (e - s, 3, dc.img_size, dc.img_size)
            ).astype(np.float16)

    ids = rng.integers(1, VOCAB - 3, (n, T)).astype(np.int64)
    lens = rng.integers(5, dc.max_caption_len, (n,)).astype(np.int64)
    masks = np.zeros((n, T), np.int64)
    for kind, arr in (("CAPTIONS", ids), ("CAPLENS", lens), ("CAPMASKS", masks)):
        with open(os.path.join(DATA_DIR, f"TEST_{kind}_{BASE}.json"), "w") as f:
            json.dump(arr.tolist(), f)

    feats = np.zeros((n, E, 5), np.float32)
    feats[:, :, 0] = np.arange(E)
    feats[:, :, 1] = rng.uniform(0, 1, (n, E))
    feats[:, :, 2] = rng.uniform(-179, 179, (n, E))
    feats[:, :, 3] = rng.uniform(0, 0.1, (n, E))
    feats[:, :, 4] = rng.integers(0, 900, (n, E))
    names = np.zeros((n, E, 52), np.int64)
    for j in range(E):
        nm = f"entity_{j}"
        names[:, j] = [j, len(nm)] + codec.encode_name(nm)
    for kind, arr in (("ENT_FEATURES", feats), ("ENT_NAMES", names)):
        with open(os.path.join(DATA_DIR, f"TEST_{kind}_{BASE}.pkl"), "wb") as f:
            pickle.dump(arr, f)
    open(marker, "w").close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--no-stage", action="store_true",
                    help="A/B: disable prefetch-thread device staging")
    ap.add_argument("--host-normalize", action="store_true",
                    help="A/B: restore host-side f32 normalization (2x the "
                         "upload bytes + two host alloc passes per batch)")
    args = ap.parse_args()

    if args.host_normalize:
        orig_batch = ds.CaptionDataset.batch
        ds.CaptionDataset.batch = (
            lambda self, idx, with_images=True, raw_images=False:
            orig_batch(self, idx, with_images=with_images, raw_images=False)
        )
    if args.no_stage:
        orig = ds.prefetch
        eval_driver.ds.prefetch = (
            lambda it, put_fn, depth=2: orig(it, lambda x: x, depth)
        )

    build_split(args.n)
    import dataclasses

    cfg = config_lib.georic()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, base_name=BASE))
    data = ds.CaptionDataset(DATA_DIR, BASE, "TEST")
    wm = codec.Wordmap(
        {"<pad>": 0, **{f"w{i}": i for i in range(1, VOCAB - 3)},
         "<unk>": VOCAB - 3, "<start>": VOCAB - 2, "<end>": VOCAB - 1}
    )
    key = jax.random.PRNGKey(0)
    params = captioner.init_captioner_params(key, cfg.model, VOCAB)
    encoder_params = resnet.init_resnet101(key, cfg.model.emb_dim)
    evaluator = eval_driver.Evaluator(
        cfg, wm, params, encoder_params,
        batch_size=args.batch, beam_size=args.beam,
    )

    # warmup: compile + first-touch of the page cache
    evaluator.run(data, output_csv="/tmp/icek_eval_e2e_warm.csv",
                  log=lambda s: None)
    t0 = time.perf_counter()
    out = evaluator.run(data, output_csv="/tmp/icek_eval_e2e.csv",
                        log=lambda s: None)
    dt = time.perf_counter() - t0
    n = len(out["captions"])
    print(json.dumps({
        "metric": "eval_e2e_caps_per_sec",
        "value": round(n / dt, 2),
        "unit": "captions/sec",
        "n": n,
        "batch": evaluator.batch_size,
        "beam": evaluator.beam_size,
        "staged": not args.no_stage,
        "host_normalize": args.host_normalize,
        "wall_s": round(dt, 2),
    }))


if __name__ == "__main__":
    main()
