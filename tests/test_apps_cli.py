"""The public per-dataset entry points (apps/*) run end-to-end as CLIs:
create_input_files -> train -> eval -> compute_eval_metrics, matching the
reference's four-script surface per subproject."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import REPO_ROOT

from test_train_e2e import make_raw_dataset, tiny_cfg


def run_cli(script, args, cwd, env_extra=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO_ROOT)
    env["ICEK_TINY_TEST"] = "1"
    if env_extra:
        env.update(env_extra)
    result = subprocess.run(
        [sys.executable, str(REPO_ROOT / "apps" / script)] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert result.returncode == 0, (script, result.stdout[-2000:], result.stderr[-2000:])
    return result


@pytest.mark.slow
def test_geo_apps_pipeline(tmp_path):
    raw = make_raw_dataset(tmp_path)
    out_dir = tmp_path / "files"

    # Use the library directly for prep with the tiny config (the CLI preset
    # uses production sizes); then exercise train/eval/metrics CLIs against
    # the tiny preset via config override env.
    from icek_tpu.data import input_files

    cfg = tiny_cfg()
    writer = input_files.InputFileWriter(
        cfg, str(raw / "captions_split.json"), str(raw / "entity_context.pkl"),
        str(raw / "images"), str(out_dir), seed=0,
    )
    writer.run()

    # train one epoch via the library path the CLI calls
    from icek_tpu.data.codec import Wordmap

    with open(out_dir / "WORDMAP_tiny_geo.json") as f:
        wm = Wordmap(json.load(f))
    from icek_tpu.train import loop as train_loop

    result = train_loop.train(
        cfg, str(out_dir), len(wm), wm.pad_id,
        checkpoint_dir=str(tmp_path), max_epochs=1, log=lambda s: None,
    )
    ckpts = [p for p in os.listdir(tmp_path) if p.endswith(".msgpack")]
    assert ckpts

    # eval via the Evaluator (CLI body) and score via the CLI module function
    from icek_tpu import eval_driver
    from icek_tpu.data import dataset as ds

    test_data = ds.CaptionDataset(str(out_dir), "tiny_geo", "TEST")
    evaluator = eval_driver.Evaluator(
        cfg, wm, result.params, result.encoder_params, batch_size=2, beam_size=1,
    )
    csv_path = tmp_path / "generated_captions.csv"
    evaluator.run(test_data, output_csv=str(csv_path), log=lambda s: None)
    assert csv_path.exists()

    # compute_eval_metrics CLI-equivalent scoring
    import pandas as pd

    from icek_tpu.metrics.scores import score_captions

    generated = pd.read_csv(csv_path)["generated_caption"].fillna("").tolist()
    with open(raw / "captions_split.json") as f:
        split = json.load(f)
    truths = [
        " ".join(img["tokens"]) for img in split["images"] if img["split"] == "test"
    ]
    scores = score_captions(truths, generated,
                            output_csv=str(tmp_path / "scores.csv"),
                            log=lambda s: None)
    assert (tmp_path / "scores.csv").exists()
    assert np.isfinite(scores["Bleu_1"])


def test_streaming_cli_flags(tmp_path):
    """--streaming on prep builds the sidecar stores; train/eval accept the
    flag and run from them (apps/common.py round-2 surface)."""
    import dataclasses

    from icek_tpu.data import input_files, streaming

    raw = make_raw_dataset(tmp_path)
    out_dir = tmp_path / "files"
    cfg = tiny_cfg()
    writer = input_files.InputFileWriter(
        cfg, str(raw / "captions_split.json"), str(raw / "entity_context.pkl"),
        str(raw / "images"), str(out_dir), seed=0,
    )
    writer.run()
    # the prep CLI's --streaming epilogue
    for split in ("TRAIN", "VAL", "TEST"):
        streaming.write_sidecar_store(str(out_dir), "tiny_geo", split, False)
        assert os.path.exists(
            streaming.sidecar_store_path(str(out_dir), "tiny_geo", split)
        )
    # the train CLI's --streaming path (library body it dispatches to)
    from icek_tpu.data.codec import Wordmap
    from icek_tpu.train import loop as train_loop

    with open(out_dir / "WORDMAP_tiny_geo.json") as f:
        wm = Wordmap(json.load(f))
    scfg = cfg.replace(data=dataclasses.replace(cfg.data, streaming=True))
    result = train_loop.train(
        scfg, str(out_dir), len(wm), wm.pad_id,
        checkpoint_dir=str(tmp_path), max_epochs=1, log=lambda s: None,
    )
    assert np.isfinite(result.best_loss)


def test_kv_dtype_cli_plumbs_to_evaluator(tmp_path, monkeypatch):
    """eval.py --kv-dtype int8 reaches the Evaluator's cfg.decode.kv_dtype
    (the deployment path for the measured news-preset int8-KV win,
    benchmarks/int8_kv_ab.py; same flag on serve.py shares this plumbing)."""
    import importlib.util

    import jax

    from icek_tpu.core import config as config_lib
    from icek_tpu import eval_driver
    from icek_tpu.data import input_files
    from icek_tpu.data.codec import Wordmap
    from icek_tpu.models import captioner, resnet
    from icek_tpu.train import checkpoint as ckpt_lib

    raw = make_raw_dataset(tmp_path)
    out_dir = tmp_path / "files"
    cfg = tiny_cfg()
    input_files.InputFileWriter(
        cfg, str(raw / "captions_split.json"), str(raw / "entity_context.pkl"),
        str(raw / "images"), str(out_dir), seed=0,
    ).run()
    with open(out_dir / "WORDMAP_tiny_geo.json") as f:
        wm = Wordmap(json.load(f))
    params = captioner.init_captioner_params(
        jax.random.PRNGKey(0), cfg.model, len(wm)
    )
    enc = resnet.init_resnet101(jax.random.PRNGKey(1), cfg.model.emb_dim)
    ckpt = ckpt_lib.save_checkpoint(
        str(tmp_path), "tiny_geo", 0, 0, 1.0, params, None, encoder_params=enc
    )

    captured = {}

    class SpyEvaluator:
        def __init__(self, spy_cfg, *a, **kw):
            captured["cfg"] = spy_cfg

        def run(self, *a, **kw):
            captured["ran"] = True

    monkeypatch.setitem(config_lib.PRESETS, "georic", tiny_cfg)
    monkeypatch.setattr(eval_driver, "Evaluator", SpyEvaluator)

    spec = importlib.util.spec_from_file_location(
        "icek_apps_common", str(REPO_ROOT / "apps" / "common.py")
    )
    common = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(common)
    common.run_eval("georic", argv=[
        "--data-dir", str(out_dir), "--checkpoint", ckpt,
        "--kv-dtype", "int8", "--metric-data", str(tmp_path / "absent"),
    ])
    assert captured["ran"]
    assert captured["cfg"].decode.kv_dtype == "int8"

    # without the flag the default stays None (bit-parity pipeline)
    common.run_eval("georic", argv=[
        "--data-dir", str(out_dir), "--checkpoint", ckpt,
        "--metric-data", str(tmp_path / "absent"),
    ])
    assert captured["cfg"].decode.kv_dtype is None

    # --kv-dtype auto passes through; beam_decode resolves it per
    # preset+backend at trace time (decode/beam.py resolve_kv_dtype)
    common.run_eval("georic", argv=[
        "--data-dir", str(out_dir), "--checkpoint", ckpt,
        "--kv-dtype", "auto", "--metric-data", str(tmp_path / "absent"),
    ])
    assert captured["cfg"].decode.kv_dtype == "auto"


def test_train_cli_batch_and_accum_plumb(tmp_path, monkeypatch):
    """train.py --batch-size / --grad-accum (int or 'auto') reach
    TrainConfig — the deployment path for the measured batch-256 sweet spot
    and the per-preset accumulation table (benchmarks/grad_accum_ab.py)."""
    import importlib.util

    from icek_tpu.core import config as config_lib
    from icek_tpu.data import input_files
    from icek_tpu.train import loop as train_loop

    raw = make_raw_dataset(tmp_path)
    out_dir = tmp_path / "files"
    input_files.InputFileWriter(
        tiny_cfg(), str(raw / "captions_split.json"),
        str(raw / "entity_context.pkl"), str(raw / "images"), str(out_dir),
        seed=0,
    ).run()

    captured = {}

    def spy_train(spy_cfg, *a, **kw):
        captured["cfg"] = spy_cfg

    monkeypatch.setitem(config_lib.PRESETS, "georic", tiny_cfg)
    monkeypatch.setattr(train_loop, "train", spy_train)

    spec = importlib.util.spec_from_file_location(
        "icek_apps_common_train", str(REPO_ROOT / "apps" / "common.py")
    )
    common = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(common)

    common.run_train("georic", argv=[
        "--data-dir", str(out_dir), "--batch-size", "256",
        "--grad-accum", "auto",
    ])
    assert captured["cfg"].train.batch_size == 256
    assert captured["cfg"].train.grad_accum_steps == "auto"

    common.run_train("georic", argv=[
        "--data-dir", str(out_dir), "--grad-accum", "4",
    ])
    assert captured["cfg"].train.batch_size == tiny_cfg().train.batch_size
    assert captured["cfg"].train.grad_accum_steps == 4

    # no flag: the preset default ("auto" since round 5) flows through
    common.run_train("georic", argv=["--data-dir", str(out_dir)])
    assert (captured["cfg"].train.grad_accum_steps
            == tiny_cfg().train.grad_accum_steps)

    # --grad-accum 1 (falsy!) must still override the "auto" default —
    # the documented bit-reproducibility escape hatch
    common.run_train("georic", argv=[
        "--data-dir", str(out_dir), "--grad-accum", "1",
    ])
    assert captured["cfg"].train.grad_accum_steps == 1


@pytest.mark.quick
def test_cli_help_surfaces():
    """Each of the 15 entry scripts parses --help (argument surface sanity)."""
    for preset_dir in ("geo_aware", "knowledge_aware", "news_knowledge_aware"):
        for script in ("create_input_files", "train", "eval",
                       "compute_eval_metrics", "serve"):
            result = subprocess.run(
                [sys.executable,
                 str(REPO_ROOT / "apps" / preset_dir / f"{script}.py"), "--help"],
                capture_output=True, text=True, timeout=300,
                env={**os.environ, "JAX_PLATFORMS": "cpu",
                     "PYTHONPATH": str(REPO_ROOT)},
            )
            assert result.returncode == 0, (preset_dir, script, result.stderr[-500:])


def test_train_cli_resume_applies_recorded_geometry(tmp_path, monkeypatch):
    """--resume auto on a --geometry-trained checkpoint re-applies the
    recorded geometry without repeating the flag (the checkpoint.read_meta
    pre-flight in run_train), rejects a conflicting flag, and accepts an
    equivalent flag regardless of case."""
    import importlib.util

    from icek_tpu.core import config as config_lib
    from icek_tpu.data import input_files
    from icek_tpu.train import loop as train_loop

    raw = make_raw_dataset(tmp_path)
    out_dir = tmp_path / "files"
    input_files.InputFileWriter(
        tiny_cfg(), str(raw / "captions_split.json"),
        str(raw / "entity_context.pkl"), str(raw / "images"), str(out_dir),
        seed=0,
    ).run()
    monkeypatch.setitem(config_lib.PRESETS, "georic", tiny_cfg)

    spec = importlib.util.spec_from_file_location(
        "icek_apps_common_resume_geom", str(REPO_ROOT / "apps" / "common.py")
    )
    common = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(common)

    ckpt_dir = tmp_path / "ckpts"
    common.run_train("georic", argv=[
        "--data-dir", str(out_dir), "--checkpoint-dir", str(ckpt_dir),
        "--geometry", "16x4", "--epochs", "1",
    ])

    captured = {}

    def spy_train(spy_cfg, *a, **kw):
        captured["cfg"] = spy_cfg
        captured["resume"] = kw.get("resume_from")

    monkeypatch.setattr(train_loop, "train", spy_train)

    common.run_train("georic", argv=[
        "--data-dir", str(out_dir), "--checkpoint-dir", str(ckpt_dir),
        "--resume", "auto",
    ])
    assert config_lib.geometry_of(captured["cfg"]) == "16x4"
    assert captured["resume"]

    # an equivalent flag in a different case is not a conflict
    common.run_train("georic", argv=[
        "--data-dir", str(out_dir), "--checkpoint-dir", str(ckpt_dir),
        "--resume", "auto", "--geometry", "16X4",
    ])
    assert config_lib.geometry_of(captured["cfg"]) == "16x4"

    with pytest.raises(ValueError, match="conflicts"):
        common.run_train("georic", argv=[
            "--data-dir", str(out_dir), "--checkpoint-dir", str(ckpt_dir),
            "--resume", "auto", "--geometry", "16x2",
        ])
