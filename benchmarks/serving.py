"""Online-serving load test: latency percentiles + sustained throughput.

Drives ``icek_tpu.serve.ServingEngine`` (dynamic micro-batching over the
fused encode+beam pipeline) with concurrent clients on the synthesized
geo-shape TEST split from benchmarks/eval_e2e.py.  Two load modes:

  closed  C client threads, each issuing back-to-back requests for
          --seconds: the saturation point — max sustained captions/sec
          and the latency cost of riding full batches.
  open    Poisson arrivals at --rate req/s: the production operating
          point — latency percentiles while the device is underloaded.

    python benchmarks/serving.py [closed|open|both] [--clients 64]
        [--rate 200] [--seconds 10] [--max-batch 64] [--max-wait-ms 3]

NOTE (this environment): every request crosses the axon tunnel's
~20-30 ms per-dispatch cost (CLAUDE.md), which dominates single-request
latency here; on a directly-attached chip the same harness measures the
real serving floor.  Throughput numbers remain meaningful because the
batcher amortizes the dispatch across the whole batch.
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/icek_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np

from benchmarks.eval_e2e import BASE, DATA_DIR, VOCAB, build_split
from icek_tpu.core import config as config_lib
from icek_tpu.data import codec
from icek_tpu.data import dataset as ds
from icek_tpu.models import captioner, resnet
from icek_tpu.serve.engine import ServingEngine


def _percentiles(lat):
    lat = np.sort(np.asarray(lat))
    pick = lambda q: float(lat[min(len(lat) - 1, int(q * len(lat)))])  # noqa: E731
    return {
        "p50_ms": round(pick(0.50) * 1e3, 1),
        "p95_ms": round(pick(0.95) * 1e3, 1),
        "p99_ms": round(pick(0.99) * 1e3, 1),
        "mean_ms": round(float(np.mean(lat)) * 1e3, 1),
    }


def _report(name, latencies, count, wall, stats, extra=None):
    out = {
        "metric": f"serving_{name}",
        "value": round(count / wall, 2),
        "unit": "captions/sec",
        **_percentiles(latencies),
        "requests": count,
        "wall_s": round(wall, 2),
        "mean_batch_fill": round(stats.mean_fill, 2),
        "batches": stats.batches,
        **(extra or {}),
    }
    print(json.dumps(out))


def run_closed(engine, samples, clients, seconds):
    latencies, lock = [], threading.Lock()
    stop = time.monotonic() + seconds

    def client(cid):
        i = cid
        local = []
        while time.monotonic() < stop:
            t0 = time.monotonic()
            engine.caption(samples[i % len(samples)], timeout=600)
            local.append(time.monotonic() - t0)
            i += clients
        with lock:
            latencies.extend(local)

    before = engine.stats()
    threads = [threading.Thread(target=client, args=(c,)) for c in range(clients)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    after = engine.stats()
    after.batches -= before.batches
    after.batch_fill = {
        k: v - before.batch_fill.get(k, 0) for k, v in after.batch_fill.items()
    }
    _report("closed_loop", latencies, len(latencies), wall, after,
            {"clients": clients})


def run_open(engine, samples, rate, seconds):
    latencies, lock = [], threading.Lock()
    futures = []
    rng = np.random.default_rng(0)
    before = engine.stats()
    t0 = time.monotonic()
    i = 0

    def record(t_send):
        # done-callbacks fire at completion time — measuring at collection
        # time would charge early requests for the whole send phase
        def cb(fut):
            dt = time.monotonic() - t_send
            with lock:
                latencies.append(dt)
        return cb

    while time.monotonic() - t0 < seconds:
        t_send = time.monotonic()
        fut = engine.submit(samples[i % len(samples)])
        fut.add_done_callback(record(t_send))
        futures.append(fut)
        i += 1
        time.sleep(float(rng.exponential(1.0 / rate)))
    for fut in futures:
        fut.result(timeout=600)
    wall = time.monotonic() - t0
    after = engine.stats()
    after.batches -= before.batches
    after.batch_fill = {
        k: v - before.batch_fill.get(k, 0) for k, v in after.batch_fill.items()
    }
    _report("open_loop", latencies, len(latencies), wall, after,
            {"offered_rate": rate})


class _RouterFront:
    """engine-shaped facade over N replica engines behind the HTTP router
    (icek_tpu/serve/router.py): caption() goes through the router (the
    full proxy path under test), submit() adapts it to the open-loop
    driver via a thread pool, stats() sums the replicas' counters."""

    def __init__(self, engines, router_addr, clients):
        from concurrent.futures import ThreadPoolExecutor

        from icek_tpu.serve.server import encode_request

        self._engines = engines
        self._addr = router_addr
        self._encode = encode_request
        self._pool = ThreadPoolExecutor(max_workers=max(clients, 8))

    def caption(self, sample, timeout=None):
        import http.client
        import json as _json

        conn = http.client.HTTPConnection(*self._addr, timeout=timeout)
        try:
            conn.request("POST", "/caption", body=self._encode(sample))
            resp = conn.getresponse()
            body = resp.read()
            if resp.status != 200:
                raise RuntimeError(f"{resp.status}: {body[:200]!r}")
            return _json.loads(body)
        finally:
            conn.close()

    def submit(self, sample):
        return self._pool.submit(self.caption, sample, 600)

    def stats(self):
        from icek_tpu.serve.engine import ServeStats

        total = ServeStats()
        for e in self._engines:
            s = e.stats()
            total.requests += s.requests
            total.batches += s.batches
            total.errors += s.errors
            for k, v in s.batch_fill.items():
                total.batch_fill[k] = total.batch_fill.get(k, 0) + v
        return total

    def close(self):
        self._pool.shutdown(wait=False)
        for e in self._engines:
            e.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="both",
                    choices=["closed", "open", "both"])
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--rate", type=float, default=200.0)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--max-wait-ms", type=float, default=3.0)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--buckets", type=int, nargs="+", default=None,
                    help="explicit bucket ladder (fewer buckets = fewer "
                         "compiles; default powers of two up to max-batch)")
    ap.add_argument("--replicas", type=int, default=1,
                    help="N in-process engines behind the HTTP router "
                         "(replica scale-out path; on one chip the replicas "
                         "SHARE the device, so this exercises correctness "
                         "and router overhead, not scaling — per-replica "
                         "throughput is the --replicas 1 number)")
    args = ap.parse_args()

    n_samples = 64
    build_split(max(n_samples, 64))
    data = ds.CaptionDataset(DATA_DIR, BASE, "TEST")
    wm = codec.Wordmap(
        {"<pad>": 0, **{f"w{i}": i for i in range(1, VOCAB - 3)},
         "<unk>": VOCAB - 3, "<start>": VOCAB - 2, "<end>": VOCAB - 1}
    )
    cfg = config_lib.georic()
    key = jax.random.PRNGKey(0)
    params = captioner.init_captioner_params(key, cfg.model, VOCAB)
    encoder_params = resnet.init_resnet101(key, cfg.model.emb_dim)
    engines = [
        ServingEngine(
            cfg, wm, params, encoder_params, beam_size=args.beam,
            max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
            buckets=args.buckets,
        )
        for _ in range(args.replicas)
    ]
    samples = []
    for i in range(n_samples):
        row = data.batch(np.array([i]), raw_images=True)
        samples.append({
            "raw_images": row["raw_images"][0],
            "entity_features": row["entity_features"][0],
            "entity_names": data.arrays.entity_names[i],
        })
    print(f"warmup: compiling buckets {engines[0].buckets}", file=sys.stderr)
    for e in engines:
        e.warmup(samples[0])

    servers = []
    if args.replicas > 1:
        from icek_tpu.serve import router as router_lib
        from icek_tpu.serve.server import make_server

        for e in engines:
            srv = make_server(e, port=0)
            threading.Thread(target=srv.serve_forever, daemon=True).start()
            servers.append(srv)
        router = router_lib.make_router(
            [f"127.0.0.1:{s.server_address[1]}" for s in servers], port=0
        )
        threading.Thread(target=router.serve_forever, daemon=True).start()
        servers.append(router)
        front = _RouterFront(
            engines, ("127.0.0.1", router.server_address[1]), args.clients
        )
    else:
        front = engines[0]
    try:
        if args.mode in ("closed", "both"):
            run_closed(front, samples, args.clients, args.seconds)
        if args.mode in ("open", "both"):
            run_open(front, samples, args.rate, args.seconds)
    finally:
        for srv in servers:
            srv.shutdown()
        if front is not engines[0]:
            front.close()
        else:
            engines[0].close()


if __name__ == "__main__":
    main()
