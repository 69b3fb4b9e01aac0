"""Shared plumbing for the per-dataset entry points under apps/.

Each subdirectory (geo_aware / knowledge_aware / news_knowledge_aware)
exposes the reference's four scripts — create_input_files.py, train.py,
eval.py, compute_eval_metrics.py — as thin CLIs over the icek_tpu library,
preserving the reference's file / checkpoint / CSV contracts per preset.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from icek_tpu.core import config as config_lib                     # noqa: E402
from icek_tpu.data.codec import Wordmap                            # noqa: E402


def load_wordmap(data_dir: str, base_name: str) -> Wordmap:
    with open(os.path.join(data_dir, f"WORDMAP_{base_name}.json")) as f:
        return Wordmap(json.load(f))


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument(
        "--data-dir", default="img_caption_data/input_dataset_files/",
        help="directory with the packed input files",
    )
    return p


def run_create_input_files(preset: str, argv=None):
    cfg = config_lib.get_config(preset)
    p = argparse.ArgumentParser(
        description=f"Create input files for the {preset} preset"
    )
    p.add_argument("--splits", default="img_caption_data/captions_split.json")
    p.add_argument("--entities", default="img_caption_data/entity_context.pkl")
    p.add_argument("--knowledge", default="img_caption_data/knowledge_context.pkl")
    p.add_argument("--images", default="img_caption_data/images/")
    p.add_argument("--output", default="img_caption_data/input_dataset_files/")
    p.add_argument("--wordmap", default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--streaming", action="store_true",
                   help="additionally build the HDF5 sidecar stores "
                        "for the constant-memory streaming loader")
    p.add_argument("--image-workers", type=int, default=None,
                   help="workers for the image read+resize pipeline "
                        "(default min(8, cpus); 1 = serial); output is "
                        "bit-identical regardless")
    p.add_argument("--image-pool", choices=["process", "thread"],
                   default="process",
                   help="worker kind (process default: the resize stack "
                        "holds the GIL, threads cap out ~1.2x)")
    args = p.parse_args(argv)
    from icek_tpu.data.input_files import InputFileWriter

    writer = InputFileWriter(
        cfg, args.splits, args.entities, args.images, args.output,
        knowledge_context_path=args.knowledge if cfg.model.has_facts else None,
        wordmap_file_path=args.wordmap, seed=args.seed,
        image_workers=args.image_workers,
        image_processes=args.image_pool == "process",
    )
    writer.run()
    if args.streaming:
        from icek_tpu.data import streaming

        for split in ("TRAIN", "VAL", "TEST"):
            streaming.write_sidecar_store(
                args.output, cfg.data.base_name, split, cfg.model.has_facts
            )


def add_parallel_args(p: argparse.ArgumentParser, verb: str):
    p.add_argument("--distributed", action="store_true",
                   help="initialize the multi-process (multi-host) runtime "
                        "before anything touches the backend; topology from "
                        "ICEK_COORDINATOR/ICEK_NUM_PROCESSES/ICEK_PROCESS_ID "
                        "or jax auto-detection (Cloud TPU pods need nothing)")
    p.add_argument("--mesh", default=None, metavar="DATA,MODEL",
                   help=f"{verb} SPMD over a (data, model) device mesh, e.g. "
                        "'4,2'; 'auto' = all devices on the data axis. "
                        "Implied (auto) by --distributed.")


def resolve_parallel(args):
    """Initialize the multi-process runtime / build the mesh, if requested.
    Must run before anything else touches the jax backend."""
    if not (args.distributed or args.mesh):
        return None
    from icek_tpu.parallel import distributed
    from icek_tpu.parallel import mesh as mesh_lib

    if args.distributed:
        # force: --distributed with no topology configured must error, not
        # silently run N independent unsharded replicas
        info = distributed.maybe_initialize(force=True)
        print(f"distributed: process {info.index}/{info.count}")
    if args.mesh and args.mesh != "auto":
        data_ax, model_ax = (int(x) for x in args.mesh.split(","))
        return mesh_lib.make_mesh(data=data_ax, model=model_ax)
    return mesh_lib.make_mesh()


def run_train(preset: str, argv=None):
    cfg = config_lib.get_config(preset)
    p = base_parser(f"Train the {preset} captioner")
    p.add_argument("--checkpoint-dir", default=".")
    p.add_argument("--resume", default=None,
                   help="checkpoint to resume from; 'auto' picks the most "
                        "recent in --checkpoint-dir (mid-epoch STEP files "
                        "rank by resume position), so re-running the same "
                        "command after a preemption continues exactly "
                        "where it stopped")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--reset-stale", action="store_true",
                   help="on resume, zero the epochs-since-improvement "
                        "counter (the reference's zero_out_epochs_since_"
                        "improvement knob, geo-aware/train.py:54)")
    p.add_argument("--glove", default=None,
                   help="path to GloVe-format embeddings for word init")
    p.add_argument("--encoder-weights", default=None, metavar="FILE",
                   help="initialize the image encoder from pretrained "
                        "weights — a torchvision resnet101 state_dict .pth "
                        "(ImageNet-pretrained, the reference's "
                        "pretrained=True at geo-aware/models.py:14-16) or a "
                        "ported .msgpack tree from "
                        "tools/port_torchvision_encoder.py; the 1x1 "
                        "projection is freshly initialized when the file "
                        "carries none")
    p.add_argument("--streaming", action="store_true",
                   help="stream batches from the HDF5 sidecar store "
                        "(constant host memory; NYTimes800k scale)")
    p.add_argument("--batch-size", type=int, default=None, metavar="B",
                   help="global training batch size (default: the "
                        "reference's per-preset value; the measured "
                        "production sweet spot on v5e is 256 — BASELINE.md)")
    p.add_argument("--grad-accum", default=None, metavar="N",
                   type=lambda s: s if s == "auto" else int(s),
                   help="split each batch into N sequential microbatches "
                        "inside the jitted step, accumulating gradients "
                        "in-graph before the single optimizer update — "
                        "exact full-batch-mean semantics, ~1/N peak "
                        "activation memory, and a measured throughput WIN "
                        "at batch 256 (geo +18.5%% at N=8; BASELINE.md). "
                        "'auto' (the default) deploys the measured "
                        "per-preset table on TPU at batch >= 256; pass 1 "
                        "for bit-reproducibility with monolithic-step "
                        "runs. Incompatible with TrainConfig.bn_train_mode")
    p.add_argument("--geometry", default=None, metavar="DxH",
                   help="from-scratch transformer geometry "
                        "'<emb_dim>x<num_heads>' (e.g. 256x8 — measured "
                        "+47%% train throughput vs the reference 300x10 on "
                        "v5e, BASELINE.md). NOT checkpoint-parity with the "
                        "reference; recorded in checkpoints so eval/serve "
                        "pick it up automatically. Incompatible with "
                        "--glove (GloVe vectors are 300-d).")
    add_parallel_args(p, "train")
    args = p.parse_args(argv)

    resume = args.resume
    if resume == "auto":
        from icek_tpu.train import checkpoint as ckpt_lib

        resume = ckpt_lib.latest_checkpoint(
            args.checkpoint_dir, cfg.data.base_name
        )
        print(f"auto-resume: {resume or 'no checkpoint found, fresh run'}")
    if resume:
        # A resumed run must train at the checkpoint's recorded geometry:
        # resolve it exactly like eval/serve do (flag must agree when both
        # are present; recorded geometry re-applies without the flag).
        from icek_tpu.train import checkpoint as ckpt_lib

        cfg = config_lib.resolve_geometry(
            cfg, ckpt_lib.read_meta(resume), flag=args.geometry
        )
    elif args.geometry:
        cfg = config_lib.apply_geometry(cfg, args.geometry)
    if args.glove and cfg.model.emb_dim != 300:
        raise SystemExit(
            "--glove requires emb_dim=300 (GloVe 42B vectors); "
            f"geometry {config_lib.geometry_of(cfg)} is incompatible"
        )
    mesh = resolve_parallel(args)

    from icek_tpu.train import loop as train_loop
    from icek_tpu.train.embeddings import load_glove_embeddings

    if args.streaming:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, streaming=True))
    if args.batch_size:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, batch_size=args.batch_size))
    if args.grad_accum is not None:
        # `is not None`, not truthiness: --grad-accum 1 (the monolithic
        # bit-reproducibility escape hatch) must override the "auto" default
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, grad_accum_steps=args.grad_accum))
    wm = load_wordmap(args.data_dir, cfg.data.base_name)
    pretrained = None
    if args.glove:
        pretrained = load_glove_embeddings(args.glove, wm, cfg.model.emb_dim)
    train_loop.train(
        cfg, args.data_dir, len(wm), wm.pad_id,
        checkpoint_dir=args.checkpoint_dir,
        pretrained_embeddings=pretrained,
        resume_from=resume,
        max_epochs=args.epochs,
        reset_epochs_since_improvement=args.reset_stale,
        mesh=mesh,
        encoder_weights=args.encoder_weights,
    )


def run_eval(preset: str, argv=None):
    cfg = config_lib.get_config(preset)
    p = base_parser(f"Evaluate the {preset} captioner on the TEST split")
    p.add_argument("--checkpoint", required=True,
                   help=".msgpack checkpoint or reference .pth.tar")
    p.add_argument("--reference-dir", default=None,
                   help="reference subproject dir (for unpickling the "
                        "classes inside a .pth.tar checkpoint)")
    p.add_argument("--batch-size", type=int, default=None,
                   help="decode batch size (default: the flagship "
                        "configuration — 256 on TPU, 64 on CPU)")
    p.add_argument("--beam", type=int, default=None,
                   help="beam size (default: preset; 1 = greedy)")
    p.add_argument("--metric-data", default="data",
                   help="directory with the metric pkl tables")
    p.add_argument("--splits", default="img_caption_data/captions_split.json")
    p.add_argument("--entities", default="img_caption_data/entity_context.pkl")
    p.add_argument("--knowledge", default="img_caption_data/knowledge_context.pkl")
    p.add_argument("--output", default="generated_captions.csv")
    p.add_argument("--streaming", action="store_true",
                   help="read the TEST split via the streaming loader")
    p.add_argument("--encoder-int8", type=int, default=0, metavar="N",
                   help="quantize the frozen ResNet encoder to int8 (PTQ, "
                        "models/resnet_int8.py), calibrating activation "
                        "scales on the first N TEST batches; CHANGES "
                        "ARITHMETIC — captions may differ slightly from "
                        "the bf16 pipeline (opt-in serving speedup)")
    p.add_argument("--encoder-qtree", default=None, metavar="FILE",
                   help="use an already calibrated int8 encoder tree "
                        "(tools/quantize_encoder.py); overrides "
                        "--encoder-int8")
    p.add_argument("--geometry", default=None, metavar="DxH",
                   help="transformer geometry of the checkpoint (normally "
                        "auto-detected from its meta; only needed for "
                        "checkpoints predating geometry recording)")
    p.add_argument("--kv-dtype", choices=["int8", "int8_cross", "auto"],
                   default=None,
                   help="quantize beam-decode KV caches (decode/beam.py). "
                        "Measured at batch-256 beam-5 production shapes "
                        "(benchmarks/int8_kv_ab.py, two sessions): int8 is "
                        "+7%% caps/s on the news preset (largest cross "
                        "memory, M=598), a wash on knowledge, and -9%% on "
                        "geo. 'auto' applies exactly that table (int8 on "
                        "news/TPU, float elsewhere). int8 modes are NOT "
                        "bit-parity with the float pipeline")
    p.add_argument("--cache-tokens", nargs="?", const="auto", default=None,
                   metavar="FILE",
                   help="encode the TEST split once and cache the encoder "
                        "tokens (default FILE: TEST_TOKENS_{base}.npz in "
                        "--data-dir, or the sidecar TEST_TOKENS_{base}.h5 "
                        "with --streaming); later runs with the same checkpoint "
                        "load the cache and skip the encoder + image IO — "
                        "the metric-iteration fast path.  Caches are bound "
                        "to the encoder weights by fingerprint and captions "
                        "are token-identical to the image path")
    add_parallel_args(p, "decode")
    args = p.parse_args(argv)

    if args.kv_dtype:
        cfg = cfg.replace(
            decode=dataclasses.replace(cfg.decode, kv_dtype=args.kv_dtype)
        )

    mesh = resolve_parallel(args)

    from icek_tpu import eval_driver
    from icek_tpu.data import dataset as ds
    from icek_tpu.train import checkpoint as ckpt_lib
    from icek_tpu.train import port

    wm = load_wordmap(args.data_dir, cfg.data.base_name)
    if args.checkpoint.endswith(".pth.tar"):
        if args.reference_dir:
            # the pickled modules resolve against the reference's own
            # models.py; torchvision may need stubbing (not installed here)
            import types

            if "torchvision" not in sys.modules:
                stub = types.ModuleType("torchvision")
                stub.models = types.SimpleNamespace(resnet101=None)
                sys.modules["torchvision"] = stub
            sys.path.insert(0, args.reference_dir)
        params, encoder_params, _ = port.load_reference_checkpoint(
            args.checkpoint, cfg.model
        )
    else:
        params, _, encoder_params, meta = ckpt_lib.load_checkpoint(args.checkpoint)
        cfg = config_lib.resolve_geometry(cfg, meta, args.geometry)

    if args.streaming:
        from icek_tpu.data import streaming

        data = streaming.StreamingCaptionDataset(
            args.data_dir, cfg.data.base_name, "TEST", cfg.model.has_facts
        )
    else:
        data = ds.CaptionDataset(
            args.data_dir, cfg.data.base_name, "TEST", cfg.model.has_facts
        )
    encoder_qtree = None
    if args.encoder_qtree:
        from icek_tpu.models import resnet_int8

        encoder_qtree = resnet_int8.load_qtree(args.encoder_qtree)
    elif args.encoder_int8:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from icek_tpu.models import resnet, resnet_int8

        dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
        bs = eval_driver.resolve_eval_batch_size(args.batch_size, cfg)
        folded = resnet.fold_bn_params(encoder_params)

        # calibrate activation scales on VAL, never on the TEST split whose
        # metrics the run reports (tools/quantize_encoder.py --split says
        # the same); fall back to TEST with a loud warning only when no VAL
        # files exist next to the TEST ones
        try:
            calib_data = ds.CaptionDataset(
                args.data_dir, cfg.data.base_name, "VAL", cfg.model.has_facts
            )
            calib_split = "VAL"
        except OSError:
            calib_data, calib_split = data, "TEST"
            print("[encoder-int8] WARNING: no VAL split found — calibrating "
                  "on TEST, the split being reported (train/test leak; "
                  "prefer tools/quantize_encoder.py --split VAL)")

        def calib_batches():
            for b in range(args.encoder_int8):
                idx = np.arange(b * bs, min((b + 1) * bs, len(calib_data)))
                if len(idx) == 0:
                    return
                yield jnp.asarray(calib_data.batch(idx)["images"])

        print(f"[encoder-int8] calibrating on {args.encoder_int8} {calib_split} "
              f"batches of {bs} (PTQ — arithmetic differs from bf16)")
        encoder_qtree = resnet_int8.calibrate_and_quantize(
            folded, calib_batches(), compute_dtype=dtype,
            source_params=encoder_params,
        )
    evaluator = eval_driver.Evaluator(
        cfg, wm, params, encoder_params,
        batch_size=args.batch_size, beam_size=args.beam, mesh=mesh,
        encoder_qtree=encoder_qtree,
    )

    if args.cache_tokens:
        if mesh is not None:
            raise SystemExit(
                "--cache-tokens requires a single-process run "
                "(no --distributed)"
            )
        if args.streaming:
            # disk-backed h5 cache in the streaming sidecar layout
            # (eval_driver.cache_split_tokens streaming branch)
            from icek_tpu.data import streaming as streaming_lib

            default_path = streaming_lib.token_cache_path(
                args.data_dir, cfg.data.base_name, "TEST"
            )
        else:
            default_path = os.path.join(
                args.data_dir, f"TEST_TOKENS_{cfg.data.base_name}.npz"
            )
        cache_path = (
            default_path if args.cache_tokens == "auto" else args.cache_tokens
        )
        evaluator.cache_split_tokens(data, cache_path)

    js_metric = fact_metric = predicate_to_objects = None
    if cfg.model.variant == "geo" and os.path.isdir(args.metric_data):
        from icek_tpu.metrics.js_geo import JSGeoMetric

        js_metric = JSGeoMetric.from_data_dir(wm.to_json_dict(), args.metric_data)
    if cfg.model.variant == "knowledge":
        import pickle

        if os.path.isdir(args.metric_data):
            from icek_tpu.metrics.fact_accuracy import FactAccuracyMetric

            fact_metric = FactAccuracyMetric.from_data_dir(
                args.splits, args.entities, args.knowledge, args.metric_data
            )
            with open(
                os.path.join(args.metric_data, "predicate_to_objects.pkl"), "rb"
            ) as f:
                predicate_to_objects = pickle.load(f)
    evaluator.run(
        data, js_metric=js_metric, fact_metric=fact_metric,
        predicate_to_objects=predicate_to_objects, output_csv=args.output,
    )


def _strip_flag(argv, name, has_value=True):
    """Remove ``name [value]`` / ``name=value`` occurrences from argv."""
    out, skip = [], False
    for tok in argv:
        if skip:
            skip = False
            continue
        if tok == name:
            skip = has_value
            continue
        if has_value and tok.startswith(name + "="):
            continue
        out.append(tok)
    return out


def _run_serve_router(argv, args):
    """serve.py --replicas N: spawn N single-engine replica subprocesses
    of this same command (router.launch_replicas assigns each its own
    --port and ICEK_SERVE_DEVICE), then front them with the round-robin
    router on --port (icek_tpu/serve/router.py)."""
    from icek_tpu.serve import router as router_lib

    raw = list(sys.argv[1:] if argv is None else argv)
    for flag in ("--replicas", "--port", "--host"):
        raw = _strip_flag(raw, flag)
    procs, specs = router_lib.launch_replicas(
        [sys.argv[0]] + raw, args.replicas, args.port, host=args.host
    )
    try:
        print(f"waiting for {args.replicas} replicas {specs} "
              f"(warmup includes XLA compilation)", flush=True)
        router_lib.wait_for_healthy(specs, procs=procs)
        server = router_lib.make_router(specs, args.host, args.port)
        print(f"routing over {specs} on "
              f"http://{args.host}:{server.server_address[1]}", flush=True)
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            server.shutdown()
    finally:
        for proc in procs:
            proc.terminate()
        for proc in procs:
            proc.wait()


def run_serve(preset: str, argv=None):
    """Online serving entry point (no reference counterpart — the
    reference has no serving path at all; see icek_tpu/serve/engine.py)."""
    cfg = config_lib.get_config(preset)
    p = base_parser(f"Serve the {preset} captioner over HTTP")
    p.add_argument("--checkpoint", required=True,
                   help=".msgpack checkpoint or reference .pth.tar")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--beam", type=int, default=None,
                   help="beam size (default: preset; 1 = greedy)")
    p.add_argument("--max-batch", type=int, default=64,
                   help="largest dynamic-batch bucket")
    p.add_argument("--max-wait-ms", type=float, default=3.0,
                   help="how long the oldest request waits for batchmates")
    p.add_argument("--warmup", action="store_true",
                   help="pre-compile every bucket from a TEST-split sample "
                        "before accepting traffic")
    p.add_argument("--encoder-qtree", default=None, metavar="FILE",
                   help="serve with the int8 PTQ encoder from a calibrated "
                        "tree (tools/quantize_encoder.py); changes "
                        "arithmetic vs the bf16 pipeline")
    p.add_argument("--replicas", type=int, default=1,
                   help="run N replica engines (one process per chip, "
                        "ICEK_SERVE_DEVICE=i pins jax's default device) "
                        "behind a round-robin router on --port "
                        "(icek_tpu/serve/router.py)")
    p.add_argument("--kv-dtype", choices=["int8", "int8_cross", "auto"],
                   default=None,
                   help="quantize beam-decode KV caches (decode/beam.py): "
                        "+7%% caps/s measured on the news preset, a wash on "
                        "knowledge, -9%% on geo (benchmarks/int8_kv_ab.py); "
                        "'auto' applies exactly that table (int8 on news/"
                        "TPU, float elsewhere); int8 modes are NOT "
                        "bit-parity with the float pipeline")
    p.add_argument("--geometry", default=None, metavar="DxH",
                   help="transformer geometry of the checkpoint, for "
                        "checkpoints that predate geometry recording in "
                        "meta (newer checkpoints resolve it automatically)")
    args = p.parse_args(argv)

    if args.kv_dtype:
        cfg = cfg.replace(
            decode=dataclasses.replace(cfg.decode, kv_dtype=args.kv_dtype)
        )

    if args.replicas > 1:
        return _run_serve_router(argv, args)

    # replica subprocesses pin one device each (router.launch_replicas)
    device_idx = os.environ.get("ICEK_SERVE_DEVICE")
    if device_idx is not None:
        import jax

        devices = jax.devices()
        jax.config.update(
            "jax_default_device", devices[int(device_idx) % len(devices)]
        )

    from icek_tpu.serve.engine import ServingEngine
    from icek_tpu.serve.server import make_server
    from icek_tpu.train import checkpoint as ckpt_lib
    from icek_tpu.train import port

    wm = load_wordmap(args.data_dir, cfg.data.base_name)
    if args.checkpoint.endswith(".pth.tar"):
        params, encoder_params, _ = port.load_reference_checkpoint(
            args.checkpoint, cfg.model
        )
    else:
        params, _, encoder_params, meta = ckpt_lib.load_checkpoint(args.checkpoint)
        cfg = config_lib.resolve_geometry(cfg, meta, flag=args.geometry)
    encoder_qtree = None
    if args.encoder_qtree:
        from icek_tpu.models import resnet_int8

        encoder_qtree = resnet_int8.load_qtree(args.encoder_qtree)
    engine = ServingEngine(
        cfg, wm, params, encoder_params, beam_size=args.beam,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        encoder_qtree=encoder_qtree,
    )
    if args.warmup:
        from icek_tpu.data import dataset as ds

        data = ds.CaptionDataset(
            args.data_dir, cfg.data.base_name, "TEST", cfg.model.has_facts
        )
        row = data.batch(__import__("numpy").array([0]), raw_images=True)
        sample = {k: v[0] for k, v in row.items()
                  if k in ("raw_images", "images", "image_tokens",
                           "entity_features", "fact_features")}
        sample["entity_names"] = data.arrays.entity_names[0]
        if data.arrays.fact_names is not None:
            sample["fact_names"] = data.arrays.fact_names[0]
        print("warmup: compiling buckets", engine.buckets, flush=True)
        engine.warmup(sample)
    server = make_server(engine, args.host, args.port)
    print(f"serving {preset} on http://{args.host}:{server.server_address[1]}",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        engine.close()


def run_compute_eval_metrics(preset: str, argv=None):
    cfg = config_lib.get_config(preset)
    p = argparse.ArgumentParser(
        description=f"Score generated captions for the {preset} preset"
    )
    p.add_argument("--captions", default="generated_captions.csv")
    p.add_argument("--splits", default="img_caption_data/captions_split.json")
    p.add_argument("--output", default="metric_scores_for_generated_captions.csv")
    args = p.parse_args(argv)
    import pandas as pd

    from icek_tpu.metrics.scores import score_captions

    generated_raw = pd.read_csv(args.captions)["generated_caption"].fillna("").tolist()
    with open(args.splits) as f:
        data = json.load(f)
    # news filters test images by the prep max_len (news compute_eval_
    # metrics.py:27-30); geo/knowledge take every test image and pad missing
    # generated rows with "" (geo compute_eval_metrics.py:15-30)
    if cfg.model.variant == "news":
        test_imgs = [
            img for img in data["images"]
            if img["split"] == "test"
            and len(img["tokens"]) <= cfg.data.max_caption_len
        ]
    else:
        test_imgs = [img for img in data["images"] if img["split"] == "test"]
    # underscores become spaces in both columns for every preset
    true_captions = [
        " ".join(img["tokens"]).replace("_", " ") for img in test_imgs
    ]
    generated = [
        (generated_raw[i] if i < len(generated_raw) else "").replace("_", " ")
        for i in range(len(test_imgs))
    ]
    ids = [img["id"] for img in test_imgs]
    if cfg.model.variant == "news":
        from icek_tpu.metrics.ne_pr import NamedEntityPR

        NamedEntityPR().compute(generated, true_captions)
    score_captions(true_captions, generated, ids, output_csv=args.output)
