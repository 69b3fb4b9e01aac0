"""Eval-driver behavioral details vs the reference eval scripts.

Covers the caption cleanup coupling: the random-fact baseline caption is
trimmed in LOCKSTEP with the main caption — the trim condition is evaluated
on the main caption's text and then applied to both strings
(knowledge-aware/eval.py:169-172).
"""

import random

import numpy as np

from icek_tpu.data import codec
from icek_tpu.decode import detok
from icek_tpu.eval_driver import _random_fact_caption


def test_trim_lockstep_crafted_cases():
    # leader needs trimming -> follower loses ITS OWN last sentence, even if
    # the follower would not qualify on its own text.
    leader = "a house . near a lake . with trees"
    follower = "a house . near 1990 . with facts"
    assert detok.trim_lockstep(leader, follower) == "a house . near 1990 ."
    # follower already "."-terminated: the reference's split/join is a no-op
    # (the last split segment is empty), so the follower stays intact.
    assert (
        detok.trim_lockstep(leader, "a . b . c .") == "a . b . c ."
    )
    # leader terminated -> follower untouched, even when the follower's own
    # text would qualify for trimming.
    leader2 = "a house . near a lake ."
    follower2 = "a barn . by 1990 . and more"
    assert detok.trim_lockstep(leader2, follower2) == follower2
    # leader with <2 dots is never trimmed (reference condition count(".")>1)
    assert detok.trim_lockstep("one sentence", "x . y") == "x . y"


def _fact_row(name: str) -> list:
    return [0, len(name)] + codec.encode_name(name)


def test_random_fact_baseline_trims_with_main_caption():
    """Mirror of the reference flow: build main + baseline token streams,
    then apply the single lockstep cleanup (knowledge-aware/eval.py:166-172)."""
    fact_names = np.array(
        [_fact_row("1923"), _fact_row("castle"), _fact_row("tower"),
         _fact_row("<pad>")],
        dtype=np.int64,
    )
    predicate_to_objects = {"builtIn": ["castle", "tower"]}
    # main caption: fact token then an unterminated trailing sentence
    tokens = ["built", "in", "castle", ".", "also", ".", "see", "more"]
    kinds = [0, 0, 2, 0, 0, 0, 0, 0]
    rng = random.Random(0)
    baseline_raw = _random_fact_caption(
        tokens, kinds, fact_names, predicate_to_objects, rng
    )
    # _random_fact_caption itself must NOT trim (the caller owns cleanup)
    assert baseline_raw.endswith("more")

    main_raw = " ".join(tokens)
    main = detok.trim_trailing_sentence(main_raw)
    baseline = detok.trim_lockstep(main_raw, baseline_raw)
    assert main == "built in castle . also ."
    # the baseline lost its own trailing sentence in lockstep
    assert baseline.endswith(".")
    assert "more" not in baseline
    # fact token replaced by a same-type object from the knowledge context
    first_word = baseline.split()[2]
    assert first_word in {"castle", "tower"}


def test_random_fact_baseline_untouched_when_main_terminated():
    fact_names = np.array([_fact_row("1923"), _fact_row("<pad>")], np.int64)
    tokens = ["in", "1923", ".", "done", "."]
    kinds = [0, 2, 0, 0, 0]
    rng = random.Random(1)
    baseline_raw = _random_fact_caption(tokens, kinds, fact_names, {}, rng)
    main_raw = " ".join(tokens)
    assert detok.trim_trailing_sentence(main_raw) == main_raw
    assert detok.trim_lockstep(main_raw, baseline_raw) == baseline_raw


def test_evaluator_mesh_matches_unsharded(tmp_path):
    """Sharded (mesh) Evaluator must produce byte-identical captions + CSV
    to the plain single-device Evaluator on the same params/dataset — the
    single-process leg of the distributed-eval contract (the real
    two-process run is tests/test_multiprocess_real.py)."""
    import jax
    import pandas as pd
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    from icek_tpu import eval_driver
    from icek_tpu.data import dataset as ds
    from icek_tpu.data import input_files
    from icek_tpu.models import captioner, resnet
    from icek_tpu.parallel import mesh as mesh_lib
    from test_train_e2e import make_raw_dataset, tiny_cfg

    cfg = tiny_cfg()
    raw = make_raw_dataset(tmp_path)
    out_dir = tmp_path / "input_dataset_files"
    wm = input_files.InputFileWriter(
        cfg, str(raw / "captions_split.json"), str(raw / "entity_context.pkl"),
        str(raw / "images"), str(out_dir), seed=0,
    ).run()
    test_data = ds.CaptionDataset(str(out_dir), "tiny_geo", "TEST")

    key = jax.random.PRNGKey(3)
    params = captioner.init_captioner_params(key, cfg.model, len(wm))
    encoder_params = resnet.init_resnet101(key, cfg.model.emb_dim)

    plain = eval_driver.Evaluator(
        cfg, wm, params, encoder_params, batch_size=4, beam_size=3,
    ).run(test_data, output_csv=str(tmp_path / "plain.csv"), log=lambda s: None)
    sharded = eval_driver.Evaluator(
        cfg, wm, params, encoder_params, batch_size=4, beam_size=3,
        mesh=mesh_lib.make_mesh(4, 2),
    ).run(test_data, output_csv=str(tmp_path / "mesh.csv"), log=lambda s: None)

    assert sharded["captions"] == plain["captions"]
    assert sharded["masks"] == plain["masks"]
    pd.testing.assert_frame_equal(
        pd.read_csv(tmp_path / "mesh.csv"), pd.read_csv(tmp_path / "plain.csv")
    )


def test_in_graph_normalize_bit_exact_and_token_exact(tmp_path):
    """The device-side image normalize (images.normalize_in_graph, the
    default Evaluator loader path) must match the host normalize_for_model
    to <=2 ulp (XLA strength-reduces the constant divides, so exact bit
    equality is not guaranteed), and decode_batch must return IDENTICAL
    tokens for the "raw_images" and host-normalized "images" batch forms."""
    import jax

    from icek_tpu import eval_driver
    from icek_tpu.data import dataset as ds
    from icek_tpu.data import images as image_ops
    from icek_tpu.data import input_files
    from icek_tpu.models import captioner, resnet

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_train_e2e import make_raw_dataset, tiny_cfg

    cfg = tiny_cfg()
    raw = make_raw_dataset(tmp_path)
    out_dir = tmp_path / "input_dataset_files"
    wm = input_files.InputFileWriter(
        cfg, str(raw / "captions_split.json"), str(raw / "entity_context.pkl"),
        str(raw / "images"), str(out_dir), seed=0,
    ).run()
    test_data = ds.CaptionDataset(str(out_dir), "tiny_geo", "TEST")

    idx = np.arange(min(4, len(test_data)))
    stored = test_data.raw_image_batch(idx)
    host = image_ops.normalize_for_model(stored)
    device = np.asarray(jax.jit(image_ops.normalize_in_graph)(stored))
    np.testing.assert_array_max_ulp(host, device, maxulp=2)

    key = jax.random.PRNGKey(3)
    params = captioner.init_captioner_params(key, cfg.model, len(wm))
    encoder_params = resnet.init_resnet101(key, cfg.model.emb_dim)
    evaluator = eval_driver.Evaluator(
        cfg, wm, params, encoder_params, batch_size=4, beam_size=3,
    )
    raw_batch = test_data.batch(idx, raw_images=True)
    assert "raw_images" in raw_batch
    norm_batch = test_data.batch(idx)
    assert "images" in norm_batch
    np.testing.assert_array_equal(
        evaluator.decode_batch(raw_batch), evaluator.decode_batch(norm_batch)
    )


def test_evaluator_int8_encoder_wiring(tmp_path):
    """Evaluator(encoder_qtree=...) must route image batches through the
    int8 encode (models/resnet_int8.py): decoding an "images" batch with
    the quantized evaluator equals encoding with resnet_encode_int8
    directly and decoding the resulting "image_tokens" batch."""
    import jax
    import jax.numpy as jnp

    from icek_tpu import eval_driver
    from icek_tpu.data import dataset as ds
    from icek_tpu.data import images as image_ops
    from icek_tpu.data import input_files
    from icek_tpu.models import captioner, resnet, resnet_int8

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_train_e2e import make_raw_dataset, tiny_cfg

    cfg = tiny_cfg()
    raw = make_raw_dataset(tmp_path)
    out_dir = tmp_path / "input_dataset_files"
    wm = input_files.InputFileWriter(
        cfg, str(raw / "captions_split.json"), str(raw / "entity_context.pkl"),
        str(raw / "images"), str(out_dir), seed=0,
    ).run()
    test_data = ds.CaptionDataset(str(out_dir), "tiny_geo", "TEST")

    key = jax.random.PRNGKey(3)
    params = captioner.init_captioner_params(key, cfg.model, len(wm))
    encoder_params = resnet.init_resnet101(key, cfg.model.emb_dim)
    folded = resnet.fold_bn_params(encoder_params)

    idx = np.arange(min(4, len(test_data)))
    batch = test_data.batch(idx)
    images = jnp.asarray(batch["images"])
    qtree = resnet_int8.calibrate_and_quantize(
        folded, [images], compute_dtype=jnp.float32
    )

    evaluator = eval_driver.Evaluator(
        cfg, wm, params, encoder_params, batch_size=4, beam_size=3,
        encoder_qtree=qtree,
    )
    got = evaluator.decode_batch(batch)

    tokens = resnet_int8.resnet_encode_int8(
        qtree, images, cfg.model.encoded_image_size,
        compute_dtype=evaluator.compute_dtype,
    )
    token_batch = dict(batch)
    del token_batch["images"]
    token_batch["image_tokens"] = np.asarray(tokens)
    want = evaluator.decode_batch(token_batch)
    np.testing.assert_array_equal(got, want)


def test_cache_split_tokens_token_identical_and_fingerprint_bound(tmp_path):
    """--cache-tokens (Evaluator.cache_split_tokens): captions from cached
    tokens are token-identical to the image path; a second invocation loads
    the cache; a different encoder invalidates it (fingerprint mismatch)."""
    import jax

    from icek_tpu import eval_driver
    from icek_tpu.data import dataset as ds
    from icek_tpu.data import input_files
    from icek_tpu.models import captioner, resnet

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_train_e2e import make_raw_dataset, tiny_cfg

    cfg = tiny_cfg()
    raw = make_raw_dataset(tmp_path)
    out_dir = tmp_path / "input_dataset_files"
    wm = input_files.InputFileWriter(
        cfg, str(raw / "captions_split.json"), str(raw / "entity_context.pkl"),
        str(raw / "images"), str(out_dir), seed=0,
    ).run()

    key = jax.random.PRNGKey(3)
    params = captioner.init_captioner_params(key, cfg.model, len(wm))
    encoder_params = resnet.init_resnet101(key, cfg.model.emb_dim)
    evaluator = eval_driver.Evaluator(
        cfg, wm, params, encoder_params, batch_size=4, beam_size=3,
    )

    def fresh_data():
        return ds.CaptionDataset(str(out_dir), "tiny_geo", "TEST")

    # oracle: the normal image path
    oracle = evaluator.run(
        fresh_data(), output_csv=str(tmp_path / "a.csv"), log=lambda s: None
    )["captions"]

    cache = str(tmp_path / "TEST_TOKENS_tiny_geo.npz")
    data = fresh_data()
    assert evaluator.cache_split_tokens(data, cache, log=lambda s: None) == "encoded"
    assert data.image_tokens is not None
    cached = evaluator.run(
        data, output_csv=str(tmp_path / "b.csv"), log=lambda s: None
    )["captions"]
    assert cached == oracle

    # second invocation: loads, identical captions again
    data2 = fresh_data()
    assert evaluator.cache_split_tokens(data2, cache, log=lambda s: None) == "loaded"
    reloaded = evaluator.run(
        data2, output_csv=str(tmp_path / "c.csv"), log=lambda s: None
    )["captions"]
    assert reloaded == oracle

    # a different checkpoint's encoder must NOT consume the stale cache
    other_encoder = resnet.init_resnet101(jax.random.PRNGKey(9), cfg.model.emb_dim)
    other_eval = eval_driver.Evaluator(
        cfg, wm, params, other_encoder, batch_size=4, beam_size=3,
    )
    data3 = fresh_data()
    assert other_eval.cache_split_tokens(data3, cache, log=lambda s: None) == "encoded"
    assert other_eval.encoder_fingerprint() != evaluator.encoder_fingerprint()


def test_cache_split_tokens_streaming(tmp_path):
    """--cache-tokens with the STREAMING loader (round-5: the news-scale
    split whose re-encodes are slowest is exactly the one that needs
    --streaming): tokens cache to the h5 sidecar, captions are
    token-identical to the image path, a second run loads, and a different
    encoder re-encodes instead of serving the stale cache."""
    import jax

    from icek_tpu import eval_driver
    from icek_tpu.data import input_files, streaming
    from icek_tpu.models import captioner, resnet

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_train_e2e import make_raw_dataset, tiny_cfg

    cfg = tiny_cfg()
    raw = make_raw_dataset(tmp_path)
    out_dir = str(tmp_path / "input_dataset_files")
    wm = input_files.InputFileWriter(
        cfg, str(raw / "captions_split.json"), str(raw / "entity_context.pkl"),
        str(raw / "images"), out_dir, seed=0,
    ).run()
    streaming.write_sidecar_store(out_dir, "tiny_geo", "TEST", False)

    key = jax.random.PRNGKey(3)
    params = captioner.init_captioner_params(key, cfg.model, len(wm))
    encoder_params = resnet.init_resnet101(key, cfg.model.emb_dim)
    evaluator = eval_driver.Evaluator(
        cfg, wm, params, encoder_params, batch_size=4, beam_size=3,
    )

    def fresh_stream():
        return streaming.StreamingCaptionDataset(out_dir, "tiny_geo", "TEST")

    oracle = evaluator.run(
        fresh_stream(), output_csv=str(tmp_path / "a.csv"), log=lambda s: None
    )["captions"]

    cache = streaming.token_cache_path(out_dir, "tiny_geo", "TEST")
    data = fresh_stream()
    assert evaluator.cache_split_tokens(data, cache, log=lambda s: None) == "encoded"
    assert data.image_tokens is not None
    assert data.token_cache_attrs["fingerprint"] == evaluator.encoder_fingerprint()
    cached = evaluator.run(
        data, output_csv=str(tmp_path / "b.csv"), log=lambda s: None
    )["captions"]
    assert cached == oracle

    # second invocation loads (constructor auto-opens; fingerprint verifies)
    data2 = fresh_stream()
    assert evaluator.cache_split_tokens(data2, cache, log=lambda s: None) == "loaded"
    assert evaluator.run(
        data2, output_csv=str(tmp_path / "c.csv"), log=lambda s: None
    )["captions"] == oracle

    # fingerprint mismatch: a different encoder must re-encode.  Close the
    # earlier datasets first — HDF5 file locking refuses to truncate a
    # cache another open handle still reads (one dataset per process in
    # real runs).
    data.close()
    data2.close()
    other_encoder = resnet.init_resnet101(jax.random.PRNGKey(9), cfg.model.emb_dim)
    other_eval = eval_driver.Evaluator(
        cfg, wm, params, other_encoder, batch_size=4, beam_size=3,
    )
    data3 = fresh_stream()
    assert other_eval.cache_split_tokens(data3, cache, log=lambda s: None) == "encoded"
