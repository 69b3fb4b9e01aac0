"""tools/validate_dataset.py: clean on a freshly prepped dataset, and
catches protocol violations (id range, mask/kind disagreement, row-count
skew) that the reference pipeline would only hit deep inside training."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.quick  # <5-min core lane (CLAUDE.md)

sys.path.insert(0, os.path.dirname(__file__))

from test_train_e2e import make_raw_knowledge_dataset, tiny_knowledge_cfg

from icek_tpu.data import input_files

_TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "validate_dataset.py",
)
_spec = importlib.util.spec_from_file_location("validate_dataset", _TOOL)
vd = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(vd)


def _prep(tmp_path):
    cfg = tiny_knowledge_cfg()
    raw = make_raw_knowledge_dataset(tmp_path)
    out_dir = tmp_path / "input_dataset_files"
    writer = input_files.InputFileWriter(
        cfg, str(raw / "captions_split.json"),
        str(raw / "entity_context.pkl"), str(raw / "images"), str(out_dir),
        knowledge_context_path=str(raw / "knowledge_context.pkl"), seed=0,
    )
    writer.run()
    return cfg, str(out_dir)


def _run(cfg, out_dir):
    lint = vd.Lint()
    wm = vd.check_wordmap(lint, out_dir, cfg.data.base_name)
    for split in vd.SPLITS:
        vd.check_split(lint, out_dir, cfg.data.base_name, split, wm,
                       has_facts=True, img_size=cfg.data.img_size)
    return lint


def test_validator_clean_on_fresh_prep(tmp_path):
    cfg, out_dir = _prep(tmp_path)
    lint = _run(cfg, out_dir)
    assert lint.errors == [], lint.errors


def test_validator_catches_corruption(tmp_path):
    cfg, out_dir = _prep(tmp_path)
    base = cfg.data.base_name
    cap_path = os.path.join(out_dir, f"TRAIN_CAPTIONS_{base}.json")
    with open(cap_path) as f:
        caps = json.load(f)
    pristine = json.dumps(caps)

    # id out of the extended-vocab range
    caps[0][2] = 10**6
    with open(cap_path, "w") as f:
        json.dump(caps, f)
    lint = _run(cfg, out_dir)
    assert any("outside" in e for e in lint.errors), lint.errors

    # entity-range id at a position whose mask says word
    caps = json.loads(pristine)
    wm = vd.check_wordmap(vd.Lint(), out_dir, base)
    with open(os.path.join(out_dir, f"TRAIN_CAPMASKS_{base}.json")) as f:
        masks = json.load(f)
    row = np.asarray(caps[1])
    word_pos = next(
        j for j in range(1, len(row))
        if masks[1][j] == 0 and row[j] not in
        (wm.start_id, wm.end_id, wm.pad_id)
    )
    caps[1][word_pos] = len(wm) + 1
    with open(cap_path, "w") as f:
        json.dump(caps, f)
    lint = _run(cfg, out_dir)
    assert any("mask disagrees" in e for e in lint.errors), lint.errors

    # row-count skew between CAPLENS and CAPTIONS
    caps = json.loads(pristine)
    with open(cap_path, "w") as f:
        json.dump(caps, f)
    len_path = os.path.join(out_dir, f"TRAIN_CAPLENS_{base}.json")
    with open(len_path) as f:
        lens = json.load(f)
    with open(len_path, "w") as f:
        json.dump(lens[:-1], f)
    lint = _run(cfg, out_dir)
    assert any("rows" in e and "CAPTIONS" in e for e in lint.errors), lint.errors


def test_validator_catches_missing_file(tmp_path):
    cfg, out_dir = _prep(tmp_path)
    os.remove(os.path.join(
        out_dir, f"VAL_FACT_NAMES_{cfg.data.base_name}.pkl"))
    lint = _run(cfg, out_dir)
    assert any("missing" in e and "VAL" in e for e in lint.errors), lint.errors
