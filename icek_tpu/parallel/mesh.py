"""Device mesh + sharding policy (dp over batch, tp over the vocab axis).

The reference is strictly single-process/single-device (SURVEY.md §2: no
torch.distributed anywhere), so this subsystem is green-field TPU design:
a (data, model) mesh over ICI, batch arrays sharded on `data`, and the
large vocabulary-sized tables (word embedding, vocab head, predicate
tables) sharded on `model`.  XLA inserts the all-gathers/psums.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None, model: int = 1, devices=None
) -> Mesh:
    """Build a (data, model) mesh; `data` defaults to all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if data is None:
        data = devices.size // model
    grid = devices.reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _spec_for_path(path) -> P:
    """Sharding rule for one captioner param leaf, keyed by its tree path.

    The vocabulary-sized tables shard over the model axis; all transformer
    weights replicate (at d_model=300 tensor-splitting them would put
    sub-128-lane shards on each chip — worse than replication).
    """
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    top = keys[0] if keys else None
    leaf = keys[-1] if keys else None
    if top in ("word_embedding", "predicate_embedding"):
        return P(MODEL_AXIS, None)
    if top == "fc_vocab":
        return P(None, MODEL_AXIS) if leaf == "w" else P(MODEL_AXIS)
    if top == "fc_predicate":
        return P(MODEL_AXIS, None) if leaf == "w" else P()
    return P()


def param_specs(params) -> dict:
    """PartitionSpec tree (same structure as params)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _spec_for_path(path), params
    )


def shard_params(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(
            x, NamedSharding(mesh, _spec_for_path(path))
        ),
        params,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(batch, mesh: Mesh):
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
