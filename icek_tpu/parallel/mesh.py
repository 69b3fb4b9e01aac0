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
import jax.numpy as jnp
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


def shard_rows(source, mesh: Mesh, dtype=None):
    """Build a row-sharded jax.Array over the mesh's data axis from an
    indexable row source (numpy array or h5py dataset).

    The pooled-HBM half of the device token cache (train/loop.py): rows pad
    up to ``S * R`` (``R = ceil(n / S)`` rows per data shard, zero rows in
    the pad tail — they are never referenced), each shard block is read as
    ONE contiguous range (h5-friendly) and put straight onto its devices, so
    host peak memory is a single block, never the full source.  Works
    multi-process: each process reads and puts only its addressable shards.
    """
    S = mesh.shape[DATA_AXIS]
    n = len(source)
    rows_per_shard = -(-n // S)
    shape = (S * rows_per_shard,) + tuple(source.shape[1:])
    dtype = np.dtype(dtype) if dtype is not None else source.dtype
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    blocks: dict = {}  # (lo, hi) -> host block, shared across model-axis replicas
    arrs = []
    for dev, idx in sharding.addressable_devices_indices_map(shape).items():
        sl = idx[0]
        lo = sl.start or 0
        hi = sl.stop if sl.stop is not None else shape[0]
        if (lo, hi) not in blocks:
            take = max(0, min(hi, n) - lo)
            block = np.zeros((hi - lo,) + shape[1:], dtype=dtype)
            if take:
                # assignment casts in place — an explicit .astype would
                # materialize a second full-block temp on a host where
                # first-touch page faults are the bottleneck (CLAUDE.md)
                block[:take] = source[lo : lo + take]
            blocks[(lo, hi)] = block
        arrs.append(jax.device_put(blocks[(lo, hi)], dev))
    return jax.make_array_from_single_device_arrays(shape, sharding, arrs)


def sharded_row_gather(cache, rows, mesh: Mesh):
    """``cache[rows]`` where ``cache`` is row-sharded over the data axis
    (``shard_rows``) and ``rows`` is a dp-sharded (B,) int32 of GLOBAL row
    ids that may reference ANY shard (both loaders shuffle globally, so row
    ownership is arbitrary per batch).

    TPU-native exchange instead of a GSPMD gather (which could choose to
    all-gather the multi-GB cache): all_gather the tiny id vector over dp,
    gather + ownership-mask locally, and psum_scatter the per-shard
    contributions back to the batch owners.  Cross-chip traffic per call is
    one (B,) int32 all-gather plus one (B, ...)-sized reduce-scatter over
    ICI (~30 MB at batch 256 production shapes) — never the cache.  Every
    output element receives exactly one non-zero contribution (ownership is
    a partition), so the result is bit-identical to a host-side gather.
    """
    S = mesh.shape[DATA_AXIS]
    if rows.shape[0] % S:
        raise ValueError(
            f"sharded token-cache gather needs the batch (or microbatch) "
            f"row count {rows.shape[0]} divisible by the data axis ({S}); "
            f"pick batch_size / grad_accum_steps accordingly"
        )

    def local(cache_blk, rows_blk):
        R = cache_blk.shape[0]
        all_rows = jax.lax.all_gather(rows_blk, DATA_AXIS, tiled=True)
        local_idx = all_rows - jax.lax.axis_index(DATA_AXIS) * R
        own = (local_idx >= 0) & (local_idx < R)
        picked = jnp.take(cache_blk, jnp.clip(local_idx, 0, R - 1), axis=0)
        mask = own.reshape(own.shape + (1,) * (picked.ndim - 1))
        contrib = jnp.where(mask, picked, jnp.zeros((), picked.dtype))
        return jax.lax.psum_scatter(
            contrib, DATA_AXIS, scatter_dimension=0, tiled=True
        )

    rest = [None] * (cache.ndim - 1)
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS, *rest), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS, *rest),
        check_vma=False,
    )(cache, rows)


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
