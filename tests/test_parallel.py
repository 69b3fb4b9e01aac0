"""Multi-device semantics on the virtual 8-CPU mesh: dp+tp train step must
match the single-device step numerically, and decode must be shardable."""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from icek_tpu.core import config as config_lib
from icek_tpu.models import captioner
from icek_tpu.parallel import mesh as mesh_lib
from icek_tpu.train import step as step_lib


def _setup(V=64, E=9, F=6, B=8, T=10):
    base = config_lib.k_georic()
    mcfg = dataclasses.replace(
        base.model,
        emb_dim=16, decoder_ffn_dim=32, encoder_ffn_dim=32, num_heads=2,
        num_layers=1, type_vocab=16, num_predicates=8,
        dropout_dec=0.0, dropout_enc=0.0, dropout_pos=0.0,
    )
    cfg = base.replace(model=mcfg)
    rng = np.random.default_rng(0)
    params = captioner.init_captioner_params(jax.random.PRNGKey(0), mcfg, V)
    ents = np.zeros((B, E, 5), dtype=np.float32)
    ents[:, :, 0] = np.arange(E)
    ents[:, :, 1:4] = rng.uniform(0, 1, (B, E, 3))
    ents[:, :, 4] = rng.integers(0, 16, (B, E))
    facts = np.zeros((B, F, 3), dtype=np.float32)
    facts[:, :, 1] = rng.integers(0, E, (B, F))
    facts[:, :, 2] = rng.integers(0, 8, (B, F))
    caps = rng.integers(1, V + E + F, (B, T)).astype(np.int32)
    mask = np.zeros((B, T), dtype=np.int32)
    mask[(caps >= V) & (caps < V + E)] = 1
    mask[caps >= V + E] = 2
    batch = {
        "caption_ids": caps,
        "caption_mask": mask,
        "lengths": np.full((B,), T, np.int32),
        "entity_features": ents,
        "fact_features": facts,
        "image_tokens": rng.standard_normal((B, 12, 16)).astype(np.float32),
    }
    return cfg, V, params, batch


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_train_step_matches_single_device(mesh_shape):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg, V, params, batch = _setup()
    optimizer = step_lib.make_optimizer(1e-3)
    train_step, _ = step_lib.make_train_step(cfg, V, 0, optimizer,
                                             encode_images=False)
    # single-device run (copy: the step donates its params/opt buffers)
    params_copy = jax.tree.map(jnp.copy, params)
    p1, o1, loss1, count1 = train_step(
        params_copy, optimizer.init(params_copy), None, batch,
        jax.random.PRNGKey(1),
    )

    mesh = mesh_lib.make_mesh(*mesh_shape)
    sharded_params = mesh_lib.shard_params(params, mesh)
    sharded_batch = mesh_lib.shard_batch(batch, mesh)
    p2, o2, loss2, count2 = train_step(
        sharded_params, optimizer.init(sharded_params), None, sharded_batch,
        jax.random.PRNGKey(1),
    )
    assert int(count1) == int(count2)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    # parameters after one step must agree across sharding layouts
    flat1 = jax.tree.leaves(p1)
    flat2 = jax.tree.leaves(p2)
    for a, b in zip(flat1, flat2):
        # Adam's first step normalizes tiny gradients to ~±lr, amplifying
        # reduction-order float differences across layouts — hence the
        # comparatively loose tolerance.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_sharded_decode_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from icek_tpu.decode import greedy

    cfg, V, params, batch = _setup()
    E = batch["entity_features"].shape[1]
    ctx = greedy.prepare_decode_context(
        params, cfg.model, jnp.asarray(batch["image_tokens"]),
        jnp.asarray(batch["entity_features"]), jnp.asarray(batch["fact_features"]),
    )
    single = np.asarray(
        greedy.greedy_decode(params, cfg.model, V, E, V - 2, V - 1, 0, ctx, 8)
    )

    mesh = mesh_lib.make_mesh(8, 1)
    sp = mesh_lib.shard_params(params, mesh)
    tokens = mesh_lib.shard_batch(
        {k: batch[k] for k in ("image_tokens", "entity_features", "fact_features")},
        mesh,
    )
    ctx_s = greedy.prepare_decode_context(
        sp, cfg.model, jnp.asarray(tokens["image_tokens"]),
        jnp.asarray(tokens["entity_features"]), jnp.asarray(tokens["fact_features"]),
    )
    sharded = np.asarray(
        greedy.greedy_decode(sp, cfg.model, V, E, V - 2, V - 1, 0, ctx_s, 8)
    )
    np.testing.assert_array_equal(single, sharded)


def test_sharded_greedy_decode_dp_tp_mesh():
    """Greedy decode under a combined (4,2) data+model mesh: the vocab-table
    shardings (word embedding, vocab head, predicate table on `model`) must
    not change a single token vs the unsharded run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from icek_tpu.decode import greedy

    cfg, V, params, batch = _setup()
    E = batch["entity_features"].shape[1]
    ctx = greedy.prepare_decode_context(
        params, cfg.model, jnp.asarray(batch["image_tokens"]),
        jnp.asarray(batch["entity_features"]), jnp.asarray(batch["fact_features"]),
    )
    single = np.asarray(
        greedy.greedy_decode(params, cfg.model, V, E, V - 2, V - 1, 0, ctx, 8)
    )

    mesh = mesh_lib.make_mesh(4, 2)
    sp = mesh_lib.shard_params(params, mesh)
    tokens = mesh_lib.shard_batch(
        {k: batch[k] for k in ("image_tokens", "entity_features", "fact_features")},
        mesh,
    )
    ctx_s = greedy.prepare_decode_context(
        sp, cfg.model, tokens["image_tokens"],
        tokens["entity_features"], tokens["fact_features"],
    )
    sharded = np.asarray(
        greedy.greedy_decode(sp, cfg.model, V, E, V - 2, V - 1, 0, ctx_s, 8)
    )
    np.testing.assert_array_equal(single, sharded)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
@pytest.mark.quick
def test_sharded_beam_decode_matches_single_device(mesh_shape):
    """Beam-5 decode (the flagship/bench configuration) sharded over dp and
    dp+tp meshes must be token- and score-exact vs the single-device run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from icek_tpu.decode import beam, greedy

    cfg, V, params, batch = _setup()
    E = batch["entity_features"].shape[1]
    ctx = greedy.prepare_decode_context(
        params, cfg.model, jnp.asarray(batch["image_tokens"]),
        jnp.asarray(batch["entity_features"]), jnp.asarray(batch["fact_features"]),
    )
    toks1, scores1 = beam.beam_decode(
        params, cfg.model, V, E, V - 2, V - 1, 0, ctx, 8, beam_size=5
    )
    toks1, scores1 = np.asarray(toks1), np.asarray(scores1)

    mesh = mesh_lib.make_mesh(*mesh_shape)
    sp = mesh_lib.shard_params(params, mesh)
    tokens = mesh_lib.shard_batch(
        {k: batch[k] for k in ("image_tokens", "entity_features", "fact_features")},
        mesh,
    )
    ctx_s = greedy.prepare_decode_context(
        sp, cfg.model, tokens["image_tokens"],
        tokens["entity_features"], tokens["fact_features"],
    )
    toks2, scores2 = beam.beam_decode(
        sp, cfg.model, V, E, V - 2, V - 1, 0, ctx_s, 8, beam_size=5
    )
    np.testing.assert_array_equal(toks1, np.asarray(toks2))
    np.testing.assert_allclose(scores1, np.asarray(scores2), rtol=1e-5)
