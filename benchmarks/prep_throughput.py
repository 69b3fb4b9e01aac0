"""Offline data-prep (L0) throughput: create_input_files images/sec.

The reference prep is a serial host loop
(geo-aware/create_input_files.py:89-130: read -> skimage resize -> HDF5
row write per image); at NYTimes800k scale that's the dominant offline
cost.  InputFileWriter threads the read+resize stage (bounded in-order
pool, bit-identical output — tests/test_train_e2e.py); this harness
measures the speedup on a synthetic image set.

    python benchmarks/prep_throughput.py [--n 200] [--size 800]
        [--workers 1 4 8]
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DATA_DIR = "/tmp/icek_prep_bench"


def build_raw(n: int, size: int):
    import pickle

    import pandas as pd
    from PIL import Image

    if os.path.exists(os.path.join(DATA_DIR, f"READY_{n}_{size}")):
        return
    shutil.rmtree(DATA_DIR, ignore_errors=True)
    img_dir = os.path.join(DATA_DIR, "images")
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    images, contexts = [], {}
    words = ["a", "the", "bridge", "river", "near", "old", "tower"]
    for i in range(n):
        arr = rng.integers(0, 255, (size, size * 4 // 3, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"img{i}.jpg"))
        url = f"http://example.com/{i}"
        images.append({
            "tokens": list(rng.choice(words, size=6)), "mask": [0] * 6,
            "url": url, "id": f"img{i}",
            "split": "train" if i % 10 < 8 else ("val" if i % 10 == 8 else "test"),
        })
        contexts[url] = pd.DataFrame({
            "name": ["Tower Bridge"], "distance": [0.1], "azimuth": [12.0],
            "size": [0.02], "type_index": [3],
        })
    with open(os.path.join(DATA_DIR, "captions_split.json"), "w") as f:
        json.dump({"images": images}, f)
    with open(os.path.join(DATA_DIR, "entity_context.pkl"), "wb") as f:
        pickle.dump(contexts, f)
    open(os.path.join(DATA_DIR, f"READY_{n}_{size}"), "w").close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--size", type=int, default=800,
                    help="source image height (width 4:3)")
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 4, 8])
    ap.add_argument("--pool", choices=["thread", "process", "both"],
                    default="both")
    ap.add_argument("--native", choices=["on", "off", "both"], default="on",
                    help="A/B the C++ resize kernel (native/resize.cpp)")
    args = ap.parse_args()

    import dataclasses

    from icek_tpu.core import config as config_lib
    from icek_tpu.data.input_files import InputFileWriter

    build_raw(args.n, args.size)
    cfg = config_lib.georic()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, base_name="prep_bench"))
    pools = {"thread": [False], "process": [True], "both": [False, True]}
    natives = {"on": ["1"], "off": ["0"], "both": ["0", "1"]}[args.native]
    base = None
    for native_flag in natives:
        os.environ["ICEK_NATIVE_RESIZE"] = native_flag
        for workers in args.workers:
            for procs in ([False] if workers == 1 else pools[args.pool]):
                out_dir = os.path.join(DATA_DIR, f"out_w{workers}")
                shutil.rmtree(out_dir, ignore_errors=True)
                writer = InputFileWriter(
                    cfg, os.path.join(DATA_DIR, "captions_split.json"),
                    os.path.join(DATA_DIR, "entity_context.pkl"),
                    os.path.join(DATA_DIR, "images"), out_dir,
                    seed=0, image_workers=workers, image_processes=procs,
                )
                t0 = time.perf_counter()
                writer.run()
                dt = time.perf_counter() - t0
                rate = args.n / dt
                if base is None:
                    base = rate
                print(json.dumps({
                    "metric": "prep_images_per_sec",
                    "value": round(rate, 2),
                    "unit": "images/sec",
                    "workers": workers,
                    "pool": "process" if procs else "thread",
                    "native_resize": native_flag == "1",
                    "n": args.n,
                    "source_px": f"{args.size * 4 // 3}x{args.size}",
                    "wall_s": round(dt, 2),
                    "vs_serial": round(rate / base, 2),
                }))


if __name__ == "__main__":
    main()
