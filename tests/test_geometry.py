"""From-scratch transformer geometry as a user capability.

The reference's d_model=300 / 10 heads (*/train.py:27-38) is lane-hostile on
TPU; the measured sweep (BASELINE.md) found 256x8 trains +47% faster.  These
tests cover the supported surface: the ``georic_fast`` preset, the
``--geometry`` train flag semantics (config.apply_geometry), geometry
recording in checkpoints, and eval-side auto-detection — ending in a real
train + beam-decode at a non-default geometry.
"""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from icek_tpu.core import config as config_lib
from icek_tpu.data import dataset as ds
from icek_tpu.data import input_files
from icek_tpu.train import checkpoint as ckpt
from icek_tpu.train import loop as train_loop

from test_train_e2e import make_raw_dataset, tiny_cfg


def test_georic_fast_preset_constructs():
    cfg = config_lib.get_config("georic_fast")
    assert cfg.name == "georic_fast"
    assert cfg.model.emb_dim == 256 and cfg.model.num_heads == 8
    # same data protocol as georic — the input files are geometry-independent
    base = config_lib.georic()
    assert cfg.data == base.data
    assert cfg.model.variant == "geo"
    assert cfg.model.type_emb_dim == 256 - cfg.model.num_entity_feature_dims


def test_apply_geometry_validation():
    cfg = config_lib.georic()
    out = config_lib.apply_geometry(cfg, "256x8")
    assert (out.model.emb_dim, out.model.num_heads) == (256, 8)
    assert config_lib.geometry_of(out) == "256x8"
    for bad in ("256", "ax8", "301x10", "0x1", "256x-8"):
        with pytest.raises(ValueError):
            config_lib.apply_geometry(cfg, bad)
    # emb_dim must exceed the hand-crafted entity feature dims
    with pytest.raises(ValueError):
        config_lib.apply_geometry(cfg, "4x2")


def test_resolve_geometry_flag_and_meta():
    cfg = config_lib.georic()
    # reference-era meta without geometry: no-op
    assert config_lib.resolve_geometry(cfg, {"epoch": 3}) is cfg
    # recorded geometry re-applied
    out = config_lib.resolve_geometry(
        cfg, {"geometry": "256x8"}, log=lambda s: None
    )
    assert config_lib.geometry_of(out) == "256x8"
    # matching flag+meta fine; conflicting errors
    out = config_lib.resolve_geometry(
        cfg, {"geometry": "256x8"}, flag="256x8", log=lambda s: None
    )
    assert out.model.num_heads == 8
    with pytest.raises(ValueError):
        config_lib.resolve_geometry(cfg, {"geometry": "256x8"}, flag="128x4")
    # flag comparison is normalized: "256X8" is the same geometry as the
    # recorded "256x8", not a conflict
    out = config_lib.resolve_geometry(
        cfg, {"geometry": "256x8"}, flag="256X8", log=lambda s: None
    )
    assert config_lib.geometry_of(out) == "256x8"


def test_geometry_train_and_beam_decode_e2e(tmp_path):
    """Train at a non-default geometry, confirm the checkpoint records it,
    and beam-decode through eval-side auto-detection (the --geometry /
    georic_fast user path, minus argparse)."""
    from icek_tpu import eval_driver

    cfg = config_lib.apply_geometry(tiny_cfg(), "16x4")
    assert cfg.model.emb_dim == 16 and cfg.model.num_heads == 4
    raw = make_raw_dataset(tmp_path)
    out_dir = tmp_path / "files"
    wm = input_files.InputFileWriter(
        cfg, str(raw / "captions_split.json"), str(raw / "entity_context.pkl"),
        str(raw / "images"), str(out_dir), seed=0,
    ).run()
    ckpt_dir = tmp_path / "ckpts"
    result = train_loop.train(
        cfg, str(out_dir), len(wm), wm.pad_id,
        checkpoint_dir=str(ckpt_dir), max_epochs=1, log=lambda s: None,
    )
    assert np.isfinite(result.best_loss)

    latest = ckpt.latest_checkpoint(str(ckpt_dir), "tiny_geo")
    params, _, encoder_params, meta = ckpt.load_checkpoint(latest)
    assert meta["geometry"] == "16x4"
    assert params["word_embedding"].shape[1] == 16

    # eval side starts from the plain preset and recovers the geometry
    cfg_eval = config_lib.resolve_geometry(tiny_cfg(), meta, log=lambda s: None)
    assert config_lib.geometry_of(cfg_eval) == "16x4"
    test_data = ds.CaptionDataset(str(out_dir), "tiny_geo", "TEST")
    evaluator = eval_driver.Evaluator(
        cfg_eval, wm, params, encoder_params, batch_size=2, beam_size=2,
    )
    csv_path = tmp_path / "generated.csv"
    out = evaluator.run(test_data, output_csv=str(csv_path), log=lambda s: None)
    assert len(out["captions"]) == len(test_data)
    assert csv_path.exists()


def test_resume_geometry_guard_and_read_meta(tmp_path):
    """Resuming a --geometry-trained checkpoint under a mismatched config
    must error clearly, not silently train corrupted head groupings (a
    300x6 checkpoint loads shape-compatibly into a 300x10 config).
    checkpoint.read_meta supplies the recorded geometry without building
    param trees (the run_train pre-flight)."""
    cfg = config_lib.apply_geometry(tiny_cfg(), "16x4")
    raw = make_raw_dataset(tmp_path)
    out_dir = tmp_path / "files"
    wm = input_files.InputFileWriter(
        cfg, str(raw / "captions_split.json"), str(raw / "entity_context.pkl"),
        str(raw / "images"), str(out_dir), seed=0,
    ).run()
    ckpt_dir = tmp_path / "ckpts"
    train_loop.train(
        cfg, str(out_dir), len(wm), wm.pad_id,
        checkpoint_dir=str(ckpt_dir), max_epochs=1, log=lambda s: None,
    )
    latest = ckpt.latest_checkpoint(str(ckpt_dir), "tiny_geo")
    assert ckpt.read_meta(latest)["geometry"] == "16x4"

    # same emb_dim, different head count: every param shape matches, so
    # without the guard this would "work" — the dangerous case
    bad = config_lib.apply_geometry(tiny_cfg(), "16x2")
    with pytest.raises(ValueError, match="geometry"):
        train_loop.train(
            bad, str(out_dir), len(wm), wm.pad_id,
            checkpoint_dir=str(ckpt_dir), max_epochs=2,
            resume_from=latest, log=lambda s: None,
        )

    # matching config resumes fine
    result = train_loop.train(
        cfg, str(out_dir), len(wm), wm.pad_id,
        checkpoint_dir=str(ckpt_dir), max_epochs=2,
        resume_from=latest, log=lambda s: None,
    )
    assert np.isfinite(result.best_loss)
