#!/usr/bin/env python
"""North-star benchmark: captions/sec (encode + beam-5 decode) per chip.

Runs the geo-preset production configuration (d_model=300, 3 layers,
10 heads, V=10k, E=300+1 entity context, 256x256 images through the full
ResNet-101 encoder, beam-5 decode to 30 tokens) at batch 256 on one chip
and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "captions/sec", "vs_baseline": N}

vs_baseline is against the measured reference CPU throughput
(benchmarks/reference_cpu_baseline.json — 2.81 captions/sec, batch-1 greedy
predict loop, decode only, so the comparison favors the reference).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

try:  # reuse compiled executables across driver runs
    jax.config.update("jax_compilation_cache_dir", "/tmp/icek_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

from icek_tpu.core import config as config_lib
from icek_tpu.decode import beam as beam_lib
from icek_tpu.decode import greedy as greedy_lib
from icek_tpu.models import captioner, resnet

REFERENCE_CPU_CAPS_PER_SEC = 2.8126  # benchmarks/reference_cpu_baseline.json

BATCH = int(os.environ.get("BENCH_BATCH", "256"))
BEAM = int(os.environ.get("BENCH_BEAM", "5"))
VOCAB = 10000
MAX_LEN = 30
ITERS = int(os.environ.get("BENCH_ITERS", "5"))
# decoder-step megakernel A/B: "1"/"0" forces, unset = beam_decode default
_MEGA = os.environ.get("BENCH_MEGAKERNEL")
MEGAKERNEL = None if _MEGA is None else _MEGA == "1"
# fused score/top-k kernel A/B
_FUSED = os.environ.get("BENCH_FUSED_SCORES")
FUSED_SCORES = None if _FUSED is None else _FUSED == "1"
# int8 KV serving mode A/B: BENCH_KV_DTYPE=int8
KV_DTYPE = os.environ.get("BENCH_KV_DTYPE") or None
# int8-quantized encoder A/B (resnet_int8; calibrated on the bench batch):
# BENCH_ENCODER=int8
ENCODER = os.environ.get("BENCH_ENCODER") or "bf16"


def main():
    cfg = config_lib.georic()
    mcfg = cfg.model
    backend = jax.default_backend()
    compute_dtype = jnp.float32 if backend == "cpu" else jnp.bfloat16

    key = jax.random.PRNGKey(0)
    params = captioner.init_captioner_params(key, mcfg, VOCAB)
    encoder_params = resnet.init_resnet101(key, mcfg.emb_dim)

    rng = np.random.default_rng(0)
    E = cfg.data.entity_context_size + 1
    images = jnp.asarray(
        rng.standard_normal((BATCH, 256, 256, 3)).astype(np.float32)
    )
    ents = np.zeros((BATCH, E, 5), dtype=np.float32)
    ents[:, :, 0] = np.arange(E)
    ents[:, :, 1] = rng.uniform(0, 1, (BATCH, E))
    ents[:, :, 2] = rng.uniform(-179, 179, (BATCH, E))
    ents[:, :, 3] = rng.uniform(0, 0.1, (BATCH, E))
    ents[:, :, 4] = rng.integers(0, 900, (BATCH, E))
    ents = jnp.asarray(ents)

    start_id, end_id, pad_id = VOCAB - 2, VOCAB - 1, 0

    # Frozen-encoder fast path: BN affines folded into the conv weights
    # (resnet.fold_bn_params) — removes the standalone BN elementwise passes
    # that dominate the encode profile at batch 256.
    folded = resnet.fold_bn_params(encoder_params)
    qtree = None
    if ENCODER == "int8":
        from icek_tpu.models import resnet_int8

        qtree = resnet_int8.calibrate_and_quantize(
            folded, [images], compute_dtype=compute_dtype
        )

    # encode + context/memory prep + decode in ONE jitted executable:
    # separate jits cost ~30ms of dispatch each through the runtime boundary
    @jax.jit
    def pipeline(imgs):
        if qtree is not None:
            from icek_tpu.models import resnet_int8

            tokens = resnet_int8.resnet_encode_int8(
                qtree, imgs, mcfg.encoded_image_size,
                compute_dtype=compute_dtype,
            )
        else:
            tokens = resnet.resnet_encode_folded(
                folded, imgs, mcfg.encoded_image_size,
                compute_dtype=compute_dtype,
            )
        ctx = greedy_lib.prepare_decode_context(
            params, mcfg, tokens, ents, compute_dtype=compute_dtype
        )
        if BEAM <= 1:
            return greedy_lib.greedy_decode(
                params, mcfg, VOCAB, E, start_id, end_id, pad_id, ctx,
                MAX_LEN, compute_dtype=compute_dtype,
            )
        out, _ = beam_lib.beam_decode(
            params, mcfg, VOCAB, E, start_id, end_id, pad_id, ctx,
            MAX_LEN, beam_size=BEAM, compute_dtype=compute_dtype,
            use_megakernel=MEGAKERNEL, use_fused_scores=FUSED_SCORES,
            kv_dtype=KV_DTYPE,
        )
        return out

    # warmup / compile; force a value fetch — block_until_ready alone does
    # not reliably drain the queue through the axon tunnel
    int(np.asarray(pipeline(images))[0, 0])
    profile_dir = os.environ.get("BENCH_PROFILE_DIR")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            int(np.asarray(pipeline(images))[0, 0])
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        int(np.asarray(pipeline(images))[0, 0])
        times.append(time.perf_counter() - t0)
    best = min(times)
    median = sorted(times)[len(times) // 2]
    caps_per_sec = BATCH / best
    result = {
        "metric": (
            f"captions/sec (ResNet-101 encode + beam-{BEAM} decode, "
            f"batch {BATCH}, geo config) per chip"
        ),
        "value": round(caps_per_sec, 2),
        "unit": "captions/sec",
        "vs_baseline": round(caps_per_sec / REFERENCE_CPU_CAPS_PER_SEC, 2),
        "median": round(BATCH / median, 2),
        "times_ms": [round(t * 1e3, 2) for t in times],
    }
    # Chip-relative utilization (utils/roofline.py): analytic model
    # FLOPs/HBM bytes over the measured wall time, so "fast" is judged
    # against the hardware, not only the 2.8 caps/s CPU reference.  The
    # pipeline is bandwidth-bound in its decode phase (BASELINE.md), so
    # expect low mfu_pct; hbm_util_pct is measured against the
    # minimal-traffic floor model (see utils/roofline.py) and sits well
    # under 100% by construction.
    from icek_tpu.utils import roofline

    flops, hbm = roofline.eval_pipeline_costs(
        mcfg, VOCAB, E, 0, beam=BEAM, max_len=MAX_LEN
    )
    result.update(
        roofline.utilization(flops * BATCH, best, hbm_bytes=hbm * BATCH)
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
