"""Fault tolerance: mid-epoch STEP checkpoints + preemption resume.

The reference's recovery story is manual epoch-level restart
(geo-aware/train.py:53,102-129); production TPU training needs to survive
preemption mid-epoch.  The contract tested here: a run killed by SIGTERM
saves a STEP checkpoint, and resuming from it finishes the epoch
BIT-IDENTICALLY to the uninterrupted run (loader skip + global-batch-index
rng folding make the resumed tail exact).
"""

import os
import signal

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from icek_tpu.data import dataset as ds  # noqa: E402
from icek_tpu.data import input_files, streaming  # noqa: E402
from icek_tpu.train import checkpoint as ckpt  # noqa: E402
from icek_tpu.train import loop as train_loop  # noqa: E402
from test_train_e2e import make_raw_dataset, tiny_cfg  # noqa: E402


def _prep(tmp_path, batch_size=2):
    import dataclasses

    cfg = tiny_cfg()
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, batch_size=batch_size)
    )
    raw = make_raw_dataset(tmp_path)
    out_dir = tmp_path / "input_dataset_files"
    wm = input_files.InputFileWriter(
        cfg, str(raw / "captions_split.json"), str(raw / "entity_context.pkl"),
        str(raw / "images"), str(out_dir), seed=0,
    ).run()
    return cfg, str(out_dir), wm


def _leaves(tree):
    return jax.tree.leaves(tree)


def test_sigterm_preempt_then_resume_bit_exact(tmp_path):
    """Kill a run mid-epoch with a real SIGTERM; resume from the STEP file;
    the completed epoch-0 checkpoint must equal the uninterrupted run's."""
    cfg, out_dir, wm = _prep(tmp_path)

    # --- uninterrupted oracle
    dir_a = str(tmp_path / "ckpt_a")
    train_loop.train(
        cfg, out_dir, len(wm), wm.pad_id, checkpoint_dir=dir_a,
        max_epochs=1, log=lambda s: None,
    )

    # --- preempted run: deliver SIGTERM after the first batch logs
    dir_b = str(tmp_path / "ckpt_b")
    fired = []

    def killing_log(msg):
        # print_freq=1: every batch logs "Epoch: [0][i/..."; the signal
        # lands after batch 0, so the NEXT step's callback saves step=2
        if "Epoch: [0][0/" in msg and not fired:
            fired.append(True)
            os.kill(os.getpid(), signal.SIGTERM)

    result = train_loop.train(
        cfg, out_dir, len(wm), wm.pad_id, checkpoint_dir=dir_b,
        max_epochs=1, log=killing_log,
    )
    assert result.preempted
    step_file = os.path.join(dir_b, "checkpoint_STEP_tiny_geo.msgpack")
    assert os.path.exists(step_file)
    _, _, _, meta = ckpt.load_checkpoint(step_file)
    assert meta["epoch"] == 0
    assert 0 < meta["step"] < -(-6 // cfg.train.batch_size)  # truly mid-epoch
    # auto-resume would pick the STEP file
    assert ckpt.latest_checkpoint(dir_b, "tiny_geo") == step_file

    # --- resume and finish epoch 0
    result2 = train_loop.train(
        cfg, out_dir, len(wm), wm.pad_id, checkpoint_dir=dir_b,
        max_epochs=1, resume_from=step_file, log=lambda s: None,
    )
    assert not result2.preempted
    # the completed epoch outranks + removes the rolling STEP file
    assert not os.path.exists(step_file)

    import json as json_lib

    from flax import serialization

    def raw(path):
        with open(path, "rb") as f:
            return serialization.msgpack_restore(f.read())

    a = raw(os.path.join(dir_a, "checkpoint_0_tiny_geo.msgpack"))
    b = raw(os.path.join(dir_b, "checkpoint_0_tiny_geo.msgpack"))
    assert json_lib.loads(a["meta"]) == json_lib.loads(b["meta"])
    for group in ("params", "encoder_params", "opt_leaves"):
        la, lb = _leaves(a[group]), _leaves(b[group])
        assert len(la) == len(lb) > 0
        for xa, xb in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_interval_step_checkpoints(tmp_path):
    """checkpoint_every_steps writes the rolling STEP file during the
    epoch and cleans it up once the epoch checkpoint lands."""
    import dataclasses

    cfg, out_dir, wm = _prep(tmp_path)
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, checkpoint_every_steps=1)
    )
    dir_c = str(tmp_path / "ckpt_c")
    step_file = os.path.join(dir_c, "checkpoint_STEP_tiny_geo.msgpack")
    seen_steps = []

    def spy_log(msg):
        if os.path.exists(step_file):
            seen_steps.append(ckpt.load_checkpoint(step_file)[3]["step"])

    train_loop.train(
        cfg, out_dir, len(wm), wm.pad_id, checkpoint_dir=dir_c,
        max_epochs=1, log=spy_log,
    )
    assert seen_steps and max(seen_steps) >= 1
    assert not os.path.exists(step_file)  # removed after the epoch save


def test_latest_checkpoint_ranks_step_files(tmp_path):
    """Resume ordering: epoch-0 file < mid-epoch-1 STEP file < epoch-1
    file."""
    d = str(tmp_path)
    params = {"w": np.zeros(2)}
    p0 = ckpt.save_checkpoint(d, "tiny_geo", 0, 0, 1.0, params, None)
    assert ckpt.latest_checkpoint(d, "tiny_geo") == p0
    ps = ckpt.save_checkpoint(d, "tiny_geo", 1, 0, 1.0, params, None, step=3)
    assert ckpt.latest_checkpoint(d, "tiny_geo") == ps
    p1 = ckpt.save_checkpoint(d, "tiny_geo", 1, 0, 0.9, params, None)
    assert ckpt.latest_checkpoint(d, "tiny_geo") == p1


@pytest.mark.parametrize("k", [0, 1, 3])
def test_index_loader_start_batch(tmp_path, k):
    cfg, out_dir, _ = _prep(tmp_path)
    data = ds.CaptionDataset(out_dir, "tiny_geo", "TRAIN")
    full = list(data.epoch_batches(2, shuffle=True, seed=5))
    tail = list(data.epoch_batches(2, shuffle=True, seed=5, start_batch=k))
    assert len(tail) == max(0, len(full) - k)
    for a, b in zip(full[k:], tail):
        for key in a:
            np.testing.assert_array_equal(a[key], b[key])


@pytest.mark.parametrize("k", [1, 2])
def test_streaming_loader_start_batch(tmp_path, k):
    """The streaming loader's skip must preserve the window/carry/rng
    state exactly: tail batches equal the full epoch's suffix."""
    cfg, out_dir, _ = _prep(tmp_path)
    stream = streaming.StreamingCaptionDataset(out_dir, "tiny_geo", "TRAIN")
    kwargs = dict(shuffle=True, seed=5, block_rows=3, window_blocks=2,
                  copy=True)
    full = list(stream.epoch_batches(2, **kwargs))
    tail = list(stream.epoch_batches(2, start_batch=k, **kwargs))
    assert len(tail) == max(0, len(full) - k)
    for a, b in zip(full[k:], tail):
        assert a.keys() == b.keys()
        for key in a:
            np.testing.assert_array_equal(a[key], b[key])
