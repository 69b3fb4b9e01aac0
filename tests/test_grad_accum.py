"""Gradient accumulation (``TrainConfig.grad_accum_steps``): the in-graph
N-microbatch scan must reproduce the full-batch update EXACTLY (gradients
of the summed NLL add across microbatches; one 1/total_tokens scale at the
end equals the full-batch mean-loss gradient), including tail batches that
are zero-padded in-graph.

Green-field TPU capability: the reference trains full batches only
(geo-aware/train.py:239-284); accumulation is the memory lever for large
effective batches / image-carrying fine-tune steps on one chip.
"""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from icek_tpu.train import step as step_lib

from test_parallel import _setup  # noqa: E402
from test_train_e2e import tiny_cfg  # noqa: E402


def _with_accum(cfg, n):
    return cfg.replace(
        train=dataclasses.replace(cfg.train, grad_accum_steps=n)
    )


def _one_step(cfg, V, params, batch, rng):
    optimizer = step_lib.make_optimizer(1e-3)
    params = jax.tree.map(jnp.copy, params)
    train_step, _ = step_lib.make_train_step(
        cfg, V, 0, optimizer, encode_images=False
    )
    return train_step(params, optimizer.init(params), None, batch, rng)


@pytest.mark.parametrize("accum", [2, 4])
def test_accum_matches_full_batch(accum):
    """Same batch, same rng: accumulated step == monolithic step (loss,
    token count, and parameters after the Adam update)."""
    cfg, V, params, batch = _setup(B=8)
    # varying lengths so the masked token count actually differs per micro
    batch = dict(batch)
    batch["lengths"] = np.array([10, 7, 3, 10, 2, 9, 10, 5], np.int32)
    rng = jax.random.PRNGKey(3)
    p1, _, loss1, count1 = _one_step(cfg, V, params, batch, rng)
    p2, _, loss2, count2 = _one_step(_with_accum(cfg, accum), V, params, batch, rng)
    assert int(count1) == int(count2)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    # Adam's first step normalizes tiny gradients to ~±lr, amplifying
    # reduction-order float differences — same tolerance rationale as
    # test_parallel.py's sharded-vs-single comparison.
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_accum_pads_tail_batches():
    """B=10 with accum=4 zero-pads to 12 in-graph; the padded rows carry
    zero valid tokens and must not change anything vs the monolithic step
    on the raw 10-row batch."""
    cfg, V, params, batch = _setup(B=10)
    batch = dict(batch)
    batch["lengths"] = np.array([10, 1, 3, 10, 2, 9, 10, 5, 4, 7], np.int32)
    rng = jax.random.PRNGKey(5)
    p1, _, loss1, count1 = _one_step(cfg, V, params, batch, rng)
    p2, _, loss2, count2 = _one_step(_with_accum(cfg, 4), V, params, batch, rng)
    assert int(count1) == int(count2)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_accum_init_first_matches_zeros_carry(monkeypatch):
    """ICEK_ACCUM_INIT=first (carry seeded with microbatch 0's gradients,
    one fewer accumulator add pass — the r5 A/B lever) is bitwise-identical
    to the stock zeros carry: 0 + g == g exactly, so only the op schedule
    changes.  Padded tail included (B=10, accum=4)."""
    cfg, V, params, batch = _setup(B=10)
    batch = dict(batch)
    batch["lengths"] = np.array([10, 1, 3, 10, 2, 9, 10, 5, 4, 7], np.int32)
    rng = jax.random.PRNGKey(5)
    p1, _, loss1, count1 = _one_step(_with_accum(cfg, 4), V, params, batch, rng)
    monkeypatch.setenv("ICEK_ACCUM_INIT", "first")
    p2, _, loss2, count2 = _one_step(_with_accum(cfg, 4), V, params, batch, rng)
    assert int(count1) == int(count2)
    assert float(loss1) == float(loss2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_accum_fine_tune_matches_full_batch():
    """The fine-tune path accumulates BOTH gradient trees; encoder and
    decoder parameters after one step match the monolithic fine-tune step."""
    from icek_tpu.models import captioner, resnet

    cfg = tiny_cfg()
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, fine_tune_encoder=True),
        model=dataclasses.replace(
            cfg.model, dropout_dec=0.0, dropout_enc=0.0, dropout_pos=0.0
        ),
    )
    V, E, B = 20, 5, 4
    rng = np.random.default_rng(2)
    key = jax.random.PRNGKey(0)
    params = captioner.init_captioner_params(key, cfg.model, V)
    encoder_params = resnet.init_resnet101(key, cfg.model.emb_dim)
    ents = np.zeros((B, E, 5), dtype=np.float32)
    ents[:, :, 0] = np.arange(E)
    batch = {
        "caption_ids": rng.integers(1, V, (B, 8)).astype(np.int32),
        "caption_mask": np.zeros((B, 8), dtype=np.int32),
        "lengths": np.array([8, 5, 8, 3], dtype=np.int32),
        "entity_features": ents,
        "images": rng.standard_normal((B, 32, 32, 3)).astype(np.float32),
    }

    import optax

    # SGD instead of Adam: parameter deltas are then LINEAR in the gradients,
    # so the comparison pins gradient equality tightly (Adam's first step
    # normalizes tiny gradients to ~±lr, where a reduction-order sign flip
    # on a ~1e-8 gradient shows up as a 2·lr parameter difference).
    mask = step_lib.encoder_trainable_mask(encoder_params)
    inverse = jax.tree.map(lambda m: not m, mask)

    def run(cfg):
        optimizer = optax.sgd(1e-2)
        enc_optimizer = optax.chain(
            optax.masked(optax.sgd(1e-2), mask),
            optax.masked(optax.set_to_zero(), inverse),
        )
        p = jax.tree.map(jnp.copy, params)
        ep = jax.tree.map(jnp.copy, encoder_params)
        train_step, _ = step_lib.make_train_step(
            cfg, V, 0, optimizer, encode_images=True,
            encoder_optimizer=enc_optimizer,
        )
        return train_step(
            p, optimizer.init(p), ep, enc_optimizer.init(ep), batch,
            jax.random.PRNGKey(1),
        )

    p1, _, e1, _, loss1, count1 = run(cfg)
    p2, _, e2, _, loss2, count2 = run(_with_accum(cfg, 2))
    assert int(count1) == int(count2)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
    for a, b in zip(jax.tree.leaves(e1), jax.tree.leaves(e2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


@pytest.mark.quick
def test_resolve_grad_accum(monkeypatch):
    """'auto' deploys the measured per-preset table only where it was
    measured (TPU, batch >= 256); ints and None pass through."""
    resolve = step_lib.resolve_grad_accum
    assert resolve(1) == 1
    assert resolve(4, "geo", 32) == 4          # explicit wins everywhere
    assert resolve(None) == 1
    assert resolve(0) == 1
    # CPU backend: auto always monolithic
    assert resolve("auto", "geo", 256) == 1
    monkeypatch.setattr(step_lib.jax, "default_backend", lambda: "tpu")
    assert resolve("auto", "geo", 256) == 8
    assert resolve("auto", "knowledge", 256) == 2
    assert resolve("auto", "news", 512) == 8
    assert resolve("auto", "geo", 64) == 1     # below the measured batch
    assert resolve("auto", "geo", None) == 1


@pytest.mark.quick
def test_default_config_resolves_per_backend(monkeypatch):
    """The no-flag TrainConfig default is 'auto' (round-5 flagship-defaults
    policy): a zero-flag TPU batch-256 run trains at the measured per-preset
    table, while CPU and small batches resolve to the monolithic step —
    existing runs there stay bit-identical."""
    from icek_tpu.core import config as config_lib

    expected_tpu = {"geo": 8, "knowledge": 2, "news": 8}
    presets = ["georic", "k_georic", "nytimes800k", "georic_fast"]
    for preset in presets:
        cfg = config_lib.get_config(preset)
        assert cfg.train.grad_accum_steps == "auto", preset
        # CPU backend (this suite): the default resolves to monolithic
        assert step_lib.resolve_grad_accum(
            cfg.train.grad_accum_steps, cfg.model.variant, 256) == 1
    monkeypatch.setattr(step_lib.jax, "default_backend", lambda: "tpu")
    for preset in presets:
        cfg = config_lib.get_config(preset)
        assert step_lib.resolve_grad_accum(
            cfg.train.grad_accum_steps, cfg.model.variant, 256
        ) == expected_tpu[cfg.model.variant], preset
        # below the measured batch the default stays monolithic even on TPU
        assert step_lib.resolve_grad_accum(
            cfg.train.grad_accum_steps, cfg.model.variant,
            cfg.train.batch_size) == 1


def test_accum_auto_resolves_inside_make_train_step(monkeypatch):
    """grad_accum_steps='auto' flows through make_train_step: on CPU it
    resolves to 1, so the step is exactly the monolithic step."""
    cfg, V, params, batch = _setup(B=8)
    rng = jax.random.PRNGKey(3)
    p1, _, loss1, count1 = _one_step(cfg, V, params, batch, rng)
    p2, _, loss2, count2 = _one_step(_with_accum(cfg, "auto"), V, params,
                                     batch, rng)
    assert int(count1) == int(count2)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-7)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_accum_rejects_bn_train_mode():
    cfg, V, _, _ = _setup()
    cfg = _with_accum(cfg, 2)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, bn_train_mode=True))
    optimizer = step_lib.make_optimizer(1e-3)
    with pytest.raises(ValueError, match="bn_train_mode"):
        step_lib.make_train_step(
            cfg, V, 0, optimizer, encode_images=True, bn_train_mode=True
        )


def test_accum_auto_falls_back_for_bn_train_mode(monkeypatch):
    """grad_accum_steps='auto' (the r5 no-flag default) must not break
    bn_train_mode configs the per-preset table was never measured for:
    on a TPU backend at batch >= 256, auto silently resolves to the
    monolithic step instead of raising (only an EXPLICIT accum > 1
    request conflicts with full-batch BN statistics)."""
    cfg, V, _, _ = _setup()
    cfg = _with_accum(cfg, "auto")
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, bn_train_mode=True, batch_size=256))
    monkeypatch.setattr(step_lib.jax, "default_backend", lambda: "tpu")
    assert step_lib.resolve_grad_accum("auto", cfg.model.variant, 256) > 1
    optimizer = step_lib.make_optimizer(1e-3)
    step_lib.make_train_step(  # must not raise
        cfg, V, 0, optimizer, encode_images=True, bn_train_mode=True
    )


def test_accum_sharded_matches_single_device():
    """Accumulation composes with the dp mesh: the sharded accumulated step
    matches the single-device accumulated step."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import optax

    from icek_tpu.parallel import mesh as mesh_lib

    cfg, V, params, batch = _setup(B=8)
    cfg = _with_accum(cfg, 2)
    # SGD: parameter deltas linear in gradients (see the fine-tune test).
    optimizer = optax.sgd(1e-2)
    train_step, _ = step_lib.make_train_step(
        cfg, V, 0, optimizer, encode_images=False
    )
    params_copy = jax.tree.map(jnp.copy, params)
    p1, _, loss1, count1 = train_step(
        params_copy, optimizer.init(params_copy), None, batch,
        jax.random.PRNGKey(1),
    )
    mesh = mesh_lib.make_mesh(4, 2)
    sharded_params = mesh_lib.shard_params(params, mesh)
    sharded_batch = mesh_lib.shard_batch(batch, mesh)
    p2, _, loss2, count2 = train_step(
        sharded_params, optimizer.init(sharded_params), None, sharded_batch,
        jax.random.PRNGKey(1),
    )
    assert int(count1) == int(count2)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
