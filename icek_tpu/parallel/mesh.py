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


def _fits(spec: P, shape, mesh: Mesh) -> bool:
    """True when every sharded dim divides evenly by its mesh axis size."""
    for dim, axis in enumerate(spec):
        if axis is not None and shape[dim] % mesh.shape[axis]:
            return False
    return True


def param_specs(params, mesh: Optional[Mesh] = None) -> dict:
    """PartitionSpec tree (same structure as params).  With a mesh, specs
    whose sharded dims don't divide by the axis size (e.g. tiny test
    vocabularies) fall back to replication."""
    def spec(path, x):
        s = _spec_for_path(path)
        if mesh is not None and not _fits(s, np.shape(x), mesh):
            return P()
        return s

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh):
    specs = param_specs(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(batch, mesh: Mesh):
    """Single-process path: device_put each leaf with batch sharding."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def global_batch(local_batch, mesh: Mesh):
    """Assemble this process's local batch rows into globally sharded
    arrays — the multi-host data path.

    Each process's loader yields the rows owned by its addressable devices
    (``data/dataset.py::process_local_slices`` /
    ``data/streaming.py::epoch_batches`` with process args);
    ``jax.make_array_from_process_local_data`` stitches the per-process
    shards into one global jax.Array per leaf.  Single-process meshes fall
    back to a plain sharded device_put (identical result, no collective
    metadata needed)."""
    if jax.process_count() == 1:
        return shard_batch(local_batch, mesh)
    sharding = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch,
    )


def gather_for_host(tree, mesh: Mesh):
    """All-gather a (possibly sharded) tree to fully-replicated arrays so
    every process holds addressable full copies — multi-host checkpoint
    saving.  A collective: EVERY process must call it, even if only the
    primary writes the result."""
    target = NamedSharding(mesh, P())
    return jax.jit(lambda t: t, out_shardings=target)(tree)


def global_batch_from_shards(shards, mesh: Mesh):
    """Simulated multi-host assembly (tests / dryrun): ``shards[p]`` is the
    local batch "process" p's loader produced.  Builds, on the
    single-process virtual mesh, the same global jax.Array the real
    multi-process path (``global_batch``) produces — each simulated
    process's rows are placed on exactly the devices that process would
    own, via ``jax.make_array_from_single_device_arrays``."""
    sharding = batch_sharding(mesh)

    def leaf(*parts):
        full = np.concatenate([np.asarray(p) for p in parts], axis=0)
        idx_map = sharding.addressable_devices_indices_map(full.shape)
        arrs = [jax.device_put(full[idx], d) for d, idx in idx_map.items()]
        return jax.make_array_from_single_device_arrays(
            full.shape, sharding, arrs
        )

    return jax.tree.map(lambda *xs: leaf(*xs), *shards)
