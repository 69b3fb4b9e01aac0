"""Checkpoint save/restore with the reference's filename + rotation protocol.

Reference semantics (geo-aware/utils.py:8-49): every epoch saves
``checkpoint_{base}.pth.tar`` (odd epochs, rolling) or
``checkpoint_{epoch}_{base}.pth.tar`` (even epochs, kept), and the best
checkpoint (by val loss) gets a ``BEST_`` copy.  We keep the same naming
with ``.msgpack`` payloads: flattened param/opt pytrees serialized with
flax.serialization, plus a JSON-serializable meta dict
(epoch / epochs_since_improvement / loss), enabling auto-resume.

``icek_tpu.train.port`` imports the reference's torch ``.pth.tar`` into
these trees for parity evaluation.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    directory: str,
    base_name: str,
    epoch: int,
    epochs_since_improvement: int,
    loss: float,
    params: Any,
    opt_state: Any,
    encoder_params: Any = None,
    is_best: bool = False,
    step: Optional[int] = None,
    extra_meta: Optional[Dict] = None,
) -> str:
    """``step`` marks a MID-epoch checkpoint (fault tolerance): meta
    records the next batch index of ``epoch`` to run, the file is the
    rolling ``checkpoint_STEP_{base}``, and resume re-enters the same
    epoch at that batch (train/loop.py).  Epoch checkpoints (step=None)
    keep the reference rotation protocol.  ``extra_meta`` merges additional
    JSON-serializable fields into meta (e.g. the model geometry)."""
    os.makedirs(directory, exist_ok=True)
    # optimizer states are (named)tuples — store leaves and rebuild against a
    # template treedef at load time
    opt_leaves = (
        [np.asarray(x) for x in jax.tree.leaves(opt_state)]
        if opt_state is not None
        else []
    )
    meta = {
        "epoch": epoch,
        "epochs_since_improvement": epochs_since_improvement,
        "loss": float(loss),
    }
    if step is not None:
        meta["step"] = int(step)
    if extra_meta:
        meta.update(extra_meta)
    payload = {
        "meta": json.dumps(meta),
        "params": _to_numpy(params),
        "opt_leaves": opt_leaves,
        "encoder_params": _to_numpy(encoder_params)
        if encoder_params is not None
        else {},
    }
    blob = serialization.msgpack_serialize(payload)
    if step is not None:
        filename = f"checkpoint_STEP_{base_name}.msgpack"
    elif epoch % 2 == 0:
        filename = f"checkpoint_{epoch}_{base_name}.msgpack"
    else:
        filename = f"checkpoint_{base_name}.msgpack"
    path = os.path.join(directory, filename)
    # write-then-rename: a preemption mid-write must not corrupt the
    # rolling file a later auto-resume would pick up
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    if is_best:
        with open(os.path.join(directory, "BEST_" + filename), "wb") as f:
            f.write(blob)
    return path


def load_checkpoint(path: str, opt_state_template: Any = None) -> Tuple[Any, Any, Any, Dict]:
    """Restore (params, opt_state, encoder_params, meta).

    `opt_state_template` (e.g. ``optimizer.init(params)``) supplies the
    treedef for rebuilding the optimizer state from its stored leaves.
    """
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = json.loads(payload["meta"])
    opt_state = None
    leaves = payload.get("opt_leaves", [])
    if opt_state_template is not None and len(leaves):
        treedef = jax.tree.structure(opt_state_template)
        opt_state = jax.tree.unflatten(
            treedef, [jnp.asarray(x) for x in leaves]
        )
    # Restore as device arrays: model code indexes param tables with traced
    # ids (e.g. captioner.encode_entities' type_embedding gather), which
    # raises TracerArrayConversionError on raw numpy leaves under jit.
    to_device = lambda tree: jax.tree.map(jnp.asarray, tree)  # noqa: E731
    return (
        to_device(payload["params"]),
        opt_state,
        to_device(payload["encoder_params"]) if payload["encoder_params"] else None,
        meta,
    )


def read_meta(path: str) -> Dict:
    """The meta dict of a checkpoint (for pre-flight checks — e.g.
    resume-side geometry resolution).  Skips the jax tree/device
    restoration, not the read: msgpack_restore still materializes the full
    payload in host memory, so this costs one deserialization pass."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return json.loads(payload["meta"])


def save_encoder_tree(path: str, encoder_params: Any, meta: Optional[Dict] = None) -> str:
    """Standalone encoder-weights file (tools/port_torchvision_encoder.py):
    ``{meta, encoder_params}`` only, for ``train.py --encoder-weights``."""
    payload = {
        "meta": json.dumps(meta or {}),
        "encoder_params": _to_numpy(encoder_params),
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


def load_encoder_tree(path: str) -> Tuple[Any, Dict]:
    """Restore (encoder_params, meta) from a ``save_encoder_tree`` file —
    or from a full training checkpoint (its encoder_params are taken)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if not payload.get("encoder_params"):
        raise ValueError(f"{path} carries no encoder_params")
    meta = json.loads(payload.get("meta", "{}"))
    return jax.tree.map(jnp.asarray, payload["encoder_params"]), meta


def latest_checkpoint(directory: str, base_name: str) -> Optional[str]:
    """Most recent checkpoint for auto-resume.

    Ranked by where training would resume: an epoch-E checkpoint resumes
    at (E+1, batch 0); a mid-epoch STEP checkpoint at (E, batch s).  A
    STEP file from a preempted epoch E therefore outranks the epoch-(E-1)
    file but loses to the completed epoch-E file."""
    if not os.path.isdir(directory):
        return None
    best_path, best_key = None, (-1, -1)
    for name in os.listdir(directory):
        if not name.endswith(f"{base_name}.msgpack") or name.startswith("BEST_"):
            continue
        path = os.path.join(directory, name)
        try:
            _, _, _, meta = load_checkpoint(path)
        except Exception:
            continue
        if "step" in meta:
            key = (meta["epoch"], meta["step"])
        else:
            key = (meta["epoch"] + 1, 0)
        if key > best_key:
            best_key = key
            best_path = path
    return best_path
