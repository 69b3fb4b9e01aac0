"""END-TO-END training throughput: the samples/sec a user actually gets.

`benchmarks/train_throughput.py` measures the jitted step in isolation and
`benchmarks/streaming_loader.py` measures host batch assembly in isolation;
this runs the real `train/loop.py::run_epoch` — streaming loader + prefetch
thread + jitted train step + meters — over a synthetic geo-shaped dataset
at production tensor sizes and reports wall-clock samples/sec per epoch.
The steady-state epoch rate should approach the step-only rate when the
loader hides behind the prefetch thread (BASELINE.md host-pipeline note).

Usage: python benchmarks/train_e2e_throughput.py [n_rows] [batch]
Prints one JSON line.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/icek_jax_cache")
    import jax.numpy as jnp

    from streaming_loader import build_fixture

    from icek_tpu.core import config as config_lib
    from icek_tpu.data import streaming
    from icek_tpu.models import captioner
    from icek_tpu.train import loop as loop_lib
    from icek_tpu.train import step as step_lib

    backend = jax.default_backend()
    compute_dtype = jnp.float32 if backend == "cpu" else jnp.bfloat16
    cache_dtype = np.float16 if compute_dtype == jnp.bfloat16 else np.float32

    root = tempfile.mkdtemp(prefix="icek_e2ebench_")
    try:
        base, tokens = build_fixture(root, n)
        # store the cache at the dtype train/loop.py would pick
        import h5py

        with h5py.File(
            streaming.token_cache_path(root, base, "TRAIN"), "w"
        ) as h:
            h.create_dataset("image_tokens", data=tokens.astype(cache_dtype))
        del tokens
        data = streaming.StreamingCaptionDataset(root, base, "TRAIN")

        cfg = config_lib.georic()
        V = 10000
        key = jax.random.PRNGKey(0)
        params0 = captioner.init_captioner_params(key, cfg.model, V)
        optimizer = step_lib.make_optimizer(cfg.train.decoder_lr)

        def run(token_cache):
            data.use_token_rows = token_cache is not None
            # the step donates params/opt_state buffers; give each run its own
            params = jax.tree.map(jnp.copy, params0)
            opt_state = optimizer.init(params)
            train_step, _ = step_lib.make_train_step(
                cfg, V, 0, optimizer, compute_dtype=compute_dtype,
                encode_images=False, token_cache=token_cache,
            )
            per_epoch = []
            for epoch in range(3):
                t0 = time.perf_counter()
                params, opt_state, _, _, _ = loop_lib.run_epoch(
                    train_step, params, opt_state, None, data, batch,
                    key, epoch, print_freq=10**9, log=lambda s: None,
                )
                wall = time.perf_counter() - t0
                per_epoch.append(n / wall)
            return {
                "epoch_samples_per_sec": [round(r, 1) for r in per_epoch],
                "steady_samples_per_sec": round(max(per_epoch[1:]), 1),
            }

        result = {
            "backend": backend,
            "n_rows": n,
            "batch": batch,
            "cache_dtype": np.dtype(cache_dtype).name,
            "host_cache": run(None),
        }
        # device-resident token cache (TrainConfig.device_token_cache_gb):
        # only row ids cross the host->device link
        dev_cache = jnp.asarray(
            np.asarray(data.image_tokens[:]), dtype=compute_dtype
        )
        result["device_cache"] = run(dev_cache)
        print(json.dumps(result))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
