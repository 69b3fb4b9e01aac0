"""Multi-process (multi-host) runtime, simulated on the virtual 8-CPU mesh:
per-process loader sharding must exactly cover each epoch, and a train step
fed from per-process local shards must match the single-process step.

The reference is single-process/single-device (geo-aware/train.py:16-18),
so these semantics are green-field TPU design (SURVEY.md §5); correctness
is proven here by simulating K processes inside one process."""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from icek_tpu.core import config as config_lib
from icek_tpu.data import dataset as ds
from icek_tpu.data import streaming
from icek_tpu.parallel import distributed, mesh as mesh_lib
from icek_tpu.train import step as step_lib

from test_parallel import _setup  # noqa: E402
from test_train_e2e import make_raw_dataset, tiny_cfg  # noqa: E402


# -----------------------------------------------------------------------
# loader sharding: union of per-process streams == one exact epoch
# -----------------------------------------------------------------------

@pytest.mark.parametrize("n,batch,P", [(37, 8, 2), (64, 8, 4), (10, 4, 4)])
def test_process_local_slices_union_is_global_stream(n, batch, P):
    """Every process sees the identical global stream and keeps its own
    B/P-row slice; per batch the slices concatenate (in process order) back
    to the global batch, and the union over the epoch covers every index
    exactly once."""
    global_batches = list(ds.batch_indices(n, batch, shuffle=True, seed=7))
    per_process = [
        list(ds.process_local_slices(
            ds.batch_indices(n, batch, shuffle=True, seed=7), p, P
        ))
        for p in range(P)
    ]
    assert all(len(s) == len(global_batches) for s in per_process)
    for i, gbatch in enumerate(global_batches):
        stitched = np.concatenate([per_process[p][i] for p in range(P)])
        np.testing.assert_array_equal(stitched, gbatch)
    flat = np.concatenate([np.concatenate(s) for s in per_process])
    real = np.sort(flat[flat >= 0])
    np.testing.assert_array_equal(real, np.arange(n))


def test_process_local_slices_validation():
    with pytest.raises(ValueError, match="not divisible"):
        list(ds.process_local_slices(iter([np.arange(6)]), 0, 4))
    with pytest.raises(ValueError, match="process_index"):
        list(ds.process_local_slices(iter([np.arange(8)]), 4, 4))


def test_streaming_index_batches_process_sharding():
    """The streaming index loader shares the slicing semantics."""
    n, batch, P = 50, 8, 2
    got = [
        list(ds.process_local_slices(
            streaming.block_shuffled_indices(
                n, batch, shuffle=True, seed=3, block=8, window_blocks=2
            ), p, P,
        ))
        for p in range(P)
    ]
    flat = np.concatenate([np.concatenate(s) for s in got])
    real = np.sort(flat[flat >= 0])
    np.testing.assert_array_equal(real, np.arange(n))


@pytest.fixture
def prepped(tmp_path):
    from icek_tpu.data import input_files

    cfg = tiny_cfg()
    raw = make_raw_dataset(tmp_path)
    out_dir = tmp_path / "input_dataset_files"
    writer = input_files.InputFileWriter(
        cfg, str(raw / "captions_split.json"), str(raw / "entity_context.pkl"),
        str(raw / "images"), str(out_dir), seed=0,
    )
    wm = writer.run()
    return cfg, str(out_dir), wm


@pytest.mark.parametrize("P,batch,block", [(2, 4, 3), (4, 4, 2)])
def test_streaming_epoch_batches_process_sharding(prepped, P, batch, block):
    """Block-sharded streaming: each simulated process range-reads only its
    own blocks, all processes yield the same number of batches (SPMD
    lockstep), and the union of real rows is exactly one epoch."""
    cfg, out_dir, _ = prepped
    stream = streaming.StreamingCaptionDataset(out_dir, "tiny_geo", "TRAIN")
    n = len(stream)
    shards = [
        list(stream.epoch_batches(
            batch, shuffle=True, seed=5, block_rows=block, window_blocks=2,
            copy=True, process_index=p, process_count=P,
        ))
        for p in range(P)
    ]
    counts = {len(s) for s in shards}
    assert len(counts) == 1, f"desynchronized step counts: {counts}"
    local = batch // P
    rows = []
    for s in shards:
        for b in s:
            assert len(b["lengths"]) == local
            rows.append(b["caption_ids"][b["lengths"] > 0])
    got = np.sort(np.concatenate(rows), axis=0)
    want = np.sort(np.asarray(stream.arrays.caption_ids)[:n], axis=0)
    np.testing.assert_array_equal(got, want)


# -----------------------------------------------------------------------
# global-array assembly: per-process shards -> identical train step
# -----------------------------------------------------------------------

@pytest.mark.parametrize("mesh_shape,P", [((8, 1), 4), ((4, 2), 2), ((4, 2), 4)])
def test_train_step_from_process_shards_matches_single_process(mesh_shape, P):
    """The global batch assembled from P simulated per-process shards (the
    make_array_from_process_local_data layout) must give the SAME loss and
    parameters as the monolithic single-process batch."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg, V, params, batch = _setup()
    optimizer = step_lib.make_optimizer(1e-3)
    train_step, _ = step_lib.make_train_step(cfg, V, 0, optimizer,
                                             encode_images=False)
    mesh = mesh_lib.make_mesh(*mesh_shape)

    sharded_params = mesh_lib.shard_params(params, mesh)
    full_batch = mesh_lib.shard_batch(batch, mesh)
    p1, _, loss1, count1 = train_step(
        jax.tree.map(jnp.copy, sharded_params),
        optimizer.init(sharded_params), None, full_batch, jax.random.PRNGKey(1),
    )

    B = batch["caption_ids"].shape[0]
    local = B // P
    shards = [
        {k: v[p * local : (p + 1) * local] for k, v in batch.items()}
        for p in range(P)
    ]
    assembled = mesh_lib.global_batch_from_shards(shards, mesh)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(assembled[k]), batch[k])
        assert assembled[k].sharding == full_batch[k].sharding
    p2, _, loss2, count2 = train_step(
        mesh_lib.shard_params(params, mesh),
        optimizer.init(sharded_params), None, assembled, jax.random.PRNGKey(1),
    )
    assert int(count1) == int(count2)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_gather_for_host_roundtrip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = mesh_lib.make_mesh(4, 2)
    tree = {
        "w": np.arange(32, dtype=np.float32).reshape(8, 4),
        "b": np.ones((3,), np.float32),
    }
    sharded = {
        "w": jax.device_put(
            tree["w"], mesh_lib.batch_sharding(mesh)
        ),
        "b": mesh_lib.replicate(tree["b"], mesh),
    }
    gathered = mesh_lib.gather_for_host(sharded, mesh)
    for k in tree:
        assert gathered[k].sharding.is_fully_replicated
        np.testing.assert_array_equal(np.asarray(gathered[k]), tree[k])


# -----------------------------------------------------------------------
# runtime helpers + end-to-end mesh training
# -----------------------------------------------------------------------

def test_maybe_initialize_single_process_noop():
    info = distributed.maybe_initialize()
    assert info == distributed.ProcessInfo(0, 1)
    assert info.is_primary


def test_local_batch_size():
    assert distributed.local_batch_size(256, 8) == 32
    with pytest.raises(ValueError, match="not divisible"):
        distributed.local_batch_size(10, 4)


def test_train_loop_with_mesh(prepped, tmp_path):
    """train_loop.train(mesh=...) end-to-end on the virtual mesh: loaders
    take the process args, batches run through global_batch, checkpoints
    save on the primary."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from icek_tpu.train import loop as train_loop

    cfg, out_dir, wm = prepped
    mesh = mesh_lib.make_mesh(4, 2)
    result = train_loop.train(
        cfg, out_dir, len(wm), wm.pad_id,
        checkpoint_dir=str(tmp_path / "ckpts"), max_epochs=1,
        log=lambda s: None, mesh=mesh,
    )
    assert np.isfinite(result.best_loss)
    from icek_tpu.train import checkpoint as ckpt

    assert ckpt.latest_checkpoint(str(tmp_path / "ckpts"), "tiny_geo")


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_device_token_cache_sharded_matches_host_path(mesh_shape):
    """The device-resident token cache under a mesh: a replicated cache
    gathered in-graph by dp-sharded row ids gives EXACTLY the same loss
    and parameters as the sharded image_tokens path."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg, V, params, batch = _setup()
    optimizer = step_lib.make_optimizer(1e-3)
    mesh = mesh_lib.make_mesh(*mesh_shape)
    sharded_params = mesh_lib.shard_params(params, mesh)

    step_host, _ = step_lib.make_train_step(
        cfg, V, 0, optimizer, encode_images=False
    )
    full_batch = mesh_lib.shard_batch(batch, mesh)
    p1, _, loss1, count1 = step_host(
        jax.tree.map(jnp.copy, sharded_params),
        optimizer.init(sharded_params), None, full_batch,
        jax.random.PRNGKey(1),
    )

    # rows-mode batch: the tokens live replicated on the mesh; the batch
    # carries the global row ids (here: an identity mapping of a cache
    # whose rows equal the original batch tokens)
    cache = np.asarray(batch["image_tokens"])
    replicated = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()
    )
    token_cache = jax.device_put(jnp.asarray(cache), replicated)
    rows_batch = {k: v for k, v in batch.items() if k != "image_tokens"}
    rows_batch["token_rows"] = np.arange(len(cache), dtype=np.int32)
    rows_batch = mesh_lib.shard_batch(rows_batch, mesh)
    step_dev, _ = step_lib.make_train_step(
        cfg, V, 0, optimizer, encode_images=False, token_cache=token_cache
    )
    p2, _, loss2, count2 = step_dev(
        mesh_lib.shard_params(params, mesh),
        optimizer.init(sharded_params), None, rows_batch,
        jax.random.PRNGKey(1),
    )
    assert int(count1) == int(count2)
    np.testing.assert_array_equal(float(loss1), float(loss2))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.quick
def test_shard_rows_pads_and_places_contiguous_blocks(tmp_path):
    """shard_rows: rows pad to ceil(n/dp) per data shard, values round-trip
    exactly, and an h5py dataset source works via contiguous range reads
    (the NYTimes-scale streaming token cache is an h5 dataset)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import h5py

    src = np.arange(13 * 3 * 4, dtype=np.float32).reshape(13, 3, 4)
    for mesh_shape in ((4, 2), (8, 1)):
        mesh = mesh_lib.make_mesh(*mesh_shape)
        dp = mesh_shape[0]
        arr = mesh_lib.shard_rows(src, mesh, np.float32)
        R = -(-13 // dp)
        assert arr.shape == (dp * R, 3, 4)
        got = np.asarray(arr)
        np.testing.assert_array_equal(got[:13], src)
        np.testing.assert_array_equal(got[13:], 0)
        # each data shard's block is one contiguous row range
        spec = arr.sharding.spec
        assert spec[0] == mesh_lib.DATA_AXIS
    with h5py.File(tmp_path / "rows.h5", "w") as h:
        h.create_dataset("t", data=src)
    with h5py.File(tmp_path / "rows.h5", "r") as h:
        arr = mesh_lib.shard_rows(h["t"], mesh_lib.make_mesh(4, 2), np.float32)
        np.testing.assert_array_equal(np.asarray(arr)[:13], src)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
@pytest.mark.quick
def test_sharded_row_gather_matches_host_gather(mesh_shape):
    """sharded_row_gather == cache[rows] bit-for-bit for arbitrary global
    row ids (cross-shard, repeated, and out-of-order — both loaders shuffle
    globally, so ownership per batch is arbitrary)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = mesh_lib.make_mesh(*mesh_shape)
    rng = np.random.default_rng(7)
    src = rng.standard_normal((21, 6, 8)).astype(np.float32)
    cache = mesh_lib.shard_rows(src, mesh, np.float32)
    rows = np.array([20, 0, 3, 3, 17, 9, 12, 1], np.int32)
    rows_arr = jax.device_put(
        rows, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(mesh_lib.DATA_AXIS))
    )
    got = np.asarray(mesh_lib.sharded_row_gather(cache, rows_arr, mesh))
    np.testing.assert_array_equal(got, src[rows])
    # works under jit too (the train step calls it inside the jitted step)
    got_jit = np.asarray(jax.jit(
        lambda c, r: mesh_lib.sharded_row_gather(c, r, mesh)
    )(cache, rows_arr))
    np.testing.assert_array_equal(got_jit, src[rows])
    with pytest.raises(ValueError, match="divisible by the data axis"):
        mesh_lib.sharded_row_gather(cache, rows_arr[:3], mesh)


@pytest.mark.parametrize("accum", [1, 2])
@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_device_token_cache_row_sharded_matches_host_path(mesh_shape, accum):
    """The ROW-SHARDED device token cache (pooled multi-chip HBM): a train
    step gathering arbitrary rows from the dp-sharded cache produces
    EXACTLY the same loss and parameters as the host image_tokens path —
    including under in-graph gradient accumulation (the scan's microbatch
    row slices re-enter the shard_map exchange).  B=16 keeps every
    microbatch divisible by the data axis (16/2 rows over <=8 shards); the
    indivisible case must fail loudly at trace time (asserted below)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg, V, params, batch = _setup(B=16)
    if accum > 1:
        cfg = cfg.replace(
            train=dataclasses.replace(cfg.train, grad_accum_steps=accum)
        )
    optimizer = step_lib.make_optimizer(1e-3)
    mesh = mesh_lib.make_mesh(*mesh_shape)
    sharded_params = mesh_lib.shard_params(params, mesh)

    # a split larger than the batch; the batch references arbitrary rows
    rng = np.random.default_rng(3)
    split_tokens = rng.standard_normal((19, 12, 16)).astype(np.float32)
    rows = np.array([18, 2, 2, 11, 7, 0, 13, 5,
                     9, 16, 4, 4, 1, 15, 10, 3], np.int32)

    host_batch = {k: v for k, v in batch.items() if k != "image_tokens"}
    host_batch["image_tokens"] = split_tokens[rows]
    step_host, _ = step_lib.make_train_step(
        cfg, V, 0, optimizer, encode_images=False
    )
    p1, _, loss1, count1 = step_host(
        jax.tree.map(jnp.copy, sharded_params),
        optimizer.init(sharded_params), None,
        mesh_lib.shard_batch(host_batch, mesh), jax.random.PRNGKey(1),
    )

    token_cache = mesh_lib.shard_rows(split_tokens, mesh, np.float32)
    rows_batch = {k: v for k, v in batch.items() if k != "image_tokens"}
    rows_batch["token_rows"] = rows
    step_dev, _ = step_lib.make_train_step(
        cfg, V, 0, optimizer, encode_images=False,
        token_cache=token_cache, token_cache_mesh=mesh,
    )
    p2, _, loss2, count2 = step_dev(
        mesh_lib.shard_params(params, mesh),
        optimizer.init(sharded_params), None,
        mesh_lib.shard_batch(rows_batch, mesh), jax.random.PRNGKey(1),
    )
    assert int(count1) == int(count2)
    np.testing.assert_array_equal(float(loss1), float(loss2))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_row_sharded_cache_indivisible_microbatch_fails_loudly():
    """accum splitting a batch below the data-axis width (8-row batch,
    accum=2 -> 4-row microbatches over 8 dp shards) must raise the
    guidance error at trace time, not miscompute."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg, V, params, batch = _setup(B=8)
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, grad_accum_steps=2)
    )
    mesh = mesh_lib.make_mesh(8, 1)
    split_tokens = np.zeros((19, 12, 16), np.float32)
    cache = mesh_lib.shard_rows(split_tokens, mesh, np.float32)
    rows_batch = {k: v for k, v in batch.items() if k != "image_tokens"}
    rows_batch["token_rows"] = np.arange(8, dtype=np.int32)
    optimizer = step_lib.make_optimizer(1e-3)
    step, _ = step_lib.make_train_step(
        cfg, V, 0, optimizer, encode_images=False,
        token_cache=cache, token_cache_mesh=mesh,
    )
    sharded_params = mesh_lib.shard_params(params, mesh)
    with pytest.raises(ValueError, match="divisible by the data axis"):
        step(sharded_params, optimizer.init(sharded_params), None,
             mesh_lib.shard_batch(rows_batch, mesh), jax.random.PRNGKey(0))


@pytest.mark.quick
def test_token_cache_placement_rule():
    """The documented replicated/sharded/None decision, including the
    NYTimes800k-scale capacity claim (800k rows x 115 KiB bf16 ≈ 88 GiB:
    too big for any one chip, fits 8 pooled chips at 12 GiB each)."""
    from icek_tpu.train.loop import resolve_token_cache_placement as place

    row = 196 * 300 * 2                      # bf16 (196, 300) tokens
    assert place(30_000, row, 4.0, 1) == "replicated"
    assert place(100_000, row, 4.0, 1) is None          # 11 GiB, one chip
    assert place(100_000, row, 4.0, 8) == "sharded"     # 1.4 GiB/chip
    assert place(800_000, row, 4.0, 8) is None          # 11 GiB/chip > 4
    assert place(800_000, row, 12.0, 8) == "sharded"    # the headline case
    assert place(800_000, row, 12.0, 1) is None
    assert place(30_000, row, 0.0, 8) is None           # disabled
    assert place(0, row, 4.0, 8) is None


def test_force_initialize_without_topology_errors_loudly():
    """--distributed with no configured/auto-detectable topology must fail
    with guidance, not silently run an unsharded single-process replica
    (N such replicas would clobber each other's checkpoints)."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if not k.startswith("ICEK_")}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "from icek_tpu.parallel import distributed\n"
        "distributed.maybe_initialize(force=True)\n"
    )
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode != 0
    assert "--distributed was requested" in r.stderr
