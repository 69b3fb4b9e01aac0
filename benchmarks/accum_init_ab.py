"""Interleaved A/B of the accumulator-init lever (VERDICT r4 #4).

Compares the stock gradient-accumulation scan (zeros carry, N add passes)
against ICEK_ACCUM_INIT=first (carry seeded with microbatch 0's gradients,
N-1 add passes, no zeros init) at fixed (batch, accum) — the "fold one
microbatch's grad straight into the accumulator" cheap lever from the
round-4 verdict.  Both variants are built in ONE process (the env flag is
read at trace time, so it is flipped between make_train_step calls),
compiled up front, then timed in round-robin chunks so tunnel drift hits
both equally — same protocol as benchmarks/grad_accum_ab.py.

Usage: python benchmarks/accum_init_ab.py [--preset k_georic] [--batch 256]
         [--accum 2 4] [--iters 6] [--chunk 15]
"""

import argparse
import dataclasses
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
from icek_tpu.models import captioner
from icek_tpu.train import step as step_lib

from grad_accum_ab import build_batch
from train_throughput import VOCAB


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="k_georic")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--accum", nargs="*", type=int, default=[2, 4])
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--chunk", type=int, default=15)
    args = ap.parse_args()

    compute_dtype = (
        jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    )
    cfg0 = config_lib.get_config(args.preset)
    batch_data = build_batch(
        np.random.default_rng(0), cfg0, args.preset, args.batch
    )
    keys = [jax.random.PRNGKey(i) for i in range(args.chunk)]
    jax.block_until_ready(keys)

    variants = [(a, init) for a in args.accum for init in ("zeros", "first")]
    states = {}
    for a, init in variants:
        cfg = cfg0.replace(
            train=dataclasses.replace(cfg0.train, grad_accum_steps=a)
        )
        params = captioner.init_captioner_params(
            jax.random.PRNGKey(0), cfg.model, VOCAB
        )
        optimizer = step_lib.make_optimizer(
            cfg.train.decoder_lr, cfg.train.grad_clip
        )
        opt_state = optimizer.init(params)
        os.environ["ICEK_ACCUM_INIT"] = init  # read at trace time
        ts, _ = step_lib.make_train_step(
            cfg, VOCAB, 0, optimizer,
            compute_dtype=compute_dtype, encode_images=False,
        )
        t0 = time.perf_counter()
        params, opt_state, loss, _ = ts(params, opt_state, None,
                                        batch_data, keys[0])
        float(loss)  # compile + drain
        print(f"  [{args.preset}] accum={a} init={init}: first step "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        states[(a, init)] = [ts, params, opt_state]
    os.environ.pop("ICEK_ACCUM_INIT", None)

    times = {v: [] for v in variants}
    for _ in range(args.iters):
        for v in variants:  # interleave: drift hits all equally
            ts, params, opt_state = states[v]
            t0 = time.perf_counter()
            for i in range(args.chunk):
                params, opt_state, loss, _ = ts(params, opt_state, None,
                                                batch_data, keys[i])
            float(loss)
            times[v].append((time.perf_counter() - t0) / args.chunk)
            states[v][1], states[v][2] = params, opt_state

    out = {"preset": args.preset, "batch": args.batch,
           "iters": args.iters, "chunk": args.chunk}
    for a, init in variants:
        med = float(np.median(times[(a, init)]))
        out[f"accum{a}_{init}_step_ms"] = round(med * 1000, 2)
        out[f"accum{a}_{init}_samples_per_sec"] = round(args.batch / med, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
