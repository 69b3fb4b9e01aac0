"""int8 post-training quantization of the folded encoder (resnet_int8).

The int8 path changes arithmetic (unlike BN folding), so the tests pin:
(a) the integer conv EXACTLY against a pure-python integer oracle — XLA's
int8 x int8 -> int32 lowering must be exact integer arithmetic; (b) the
quantization algebra (per-channel weight scales, epilogue scales, requant
rounding); (c) the maxpool/requant commutation the stem relies on; and
(d) end-to-end closeness + determinism of the full quantized encode vs the
f32 folded encode it approximates.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from icek_tpu.models import resnet as rn
from icek_tpu.models import resnet_int8 as q8


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _int_conv_oracle(x, w, stride=1):
    """Exact integer NHWC conv with torch-style (k-1)//2 padding, python ints."""
    B, H, W, Ci = x.shape
    kh, kw, _, Co = w.shape
    pad = (kh - 1) // 2
    xp = np.zeros((B, H + 2 * pad, W + 2 * pad, Ci), dtype=np.int64)
    xp[:, pad:pad + H, pad:pad + W, :] = x
    Ho = (H + 2 * pad - kh) // stride + 1
    Wo = (W + 2 * pad - kw) // stride + 1
    out = np.zeros((B, Ho, Wo, Co), dtype=np.int64)
    for b in range(B):
        for i in range(Ho):
            for j in range(Wo):
                patch = xp[b, i * stride:i * stride + kh,
                           j * stride:j * stride + kw, :].astype(np.int64)
                out[b, i, j, :] = np.tensordot(patch, w.astype(np.int64), 3)
    return out


@pytest.mark.parametrize("stride", [1, 2])
def test_qconv_exact_integer(rng, stride):
    x = rng.integers(-127, 128, (2, 6, 6, 3)).astype(np.int8)
    w = rng.integers(-127, 128, (3, 3, 3, 5)).astype(np.int8)
    got = np.asarray(q8._qconv(jnp.asarray(x), jnp.asarray(w), stride))
    want = _int_conv_oracle(x, w, stride)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_weight_quantization_algebra(rng):
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 6)).astype(np.float32))
    wq, s = q8._quantize_weight(w)
    assert wq.dtype == jnp.int8
    # per-channel scale = absmax/127, every channel reaches +-127 somewhere
    np.testing.assert_allclose(
        np.asarray(s), np.max(np.abs(np.asarray(w)), axis=(0, 1, 2)) / 127.0,
        rtol=1e-6,
    )
    assert int(np.max(np.abs(np.asarray(wq)))) == 127
    # dequantization error bounded by half a step per element
    err = np.abs(np.asarray(wq).astype(np.float32) * np.asarray(s) - np.asarray(w))
    assert np.all(err <= np.asarray(s) * 0.5 + 1e-7)


def test_requant_relu_semantics():
    y = jnp.asarray([-3.0, 0.0, 0.24, 0.26, 12.7, 99.0], jnp.float32)
    out = np.asarray(q8._requant_relu(y, jnp.float32(10.0)))  # scale a = 0.1
    # negative -> 0, round-half-even at the step boundary, clip at 127
    np.testing.assert_array_equal(out, np.asarray([0, 0, 2, 3, 127, 127], np.int8))


def test_maxpool_commutes_with_requant(rng):
    """Stem claim: pooling the quantized tensor == quantizing the pooled."""
    y = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    inv_a = jnp.float32(23.7)
    pooled_then_q = q8._requant_relu(rn.max_pool_3x3_s2(y), inv_a)
    q = q8._requant_relu(y, inv_a)
    q_then_pooled = jax.lax.reduce_window(
        q, jnp.int8(-128), jax.lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=[(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    np.testing.assert_array_equal(np.asarray(pooled_then_q),
                                  np.asarray(q_then_pooled))


def _small_folded(rng, emb_dim=24):
    params = rn.init_resnet101(jax.random.PRNGKey(3), emb_dim=emb_dim)
    return rn.fold_bn_params(params)


def test_observe_calibrate_running_max(rng):
    folded = _small_folded(rng)
    b1 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32)) * 2.0
    obs = q8.calibrate(folded, [b1, b2], compute_dtype=jnp.float32)
    o1 = jax.device_get(q8.observe(folded, b1, jnp.float32))
    o2 = jax.device_get(q8.observe(folded, b2, jnp.float32))
    want = jax.tree.map(np.maximum, o1, o2)
    got_leaves = jax.tree.leaves(obs)
    want_leaves = jax.tree.leaves(want)
    assert len(got_leaves) == len(want_leaves)
    for g, w in zip(got_leaves, want_leaves):
        np.testing.assert_allclose(g, w, rtol=1e-6)


def test_observe_per_image_matches_scalar(rng):
    """per_image=True returns (B,) per-image maxima whose max equals the
    scalar observation (same forward, finer reduction)."""
    folded = _small_folded(rng)
    images = jnp.asarray(rng.standard_normal((3, 64, 64, 3)).astype(np.float32))
    scalar = jax.device_get(q8.observe(folded, images, jnp.float32))
    per_img = jax.device_get(
        q8.observe(folded, images, jnp.float32, per_image=True)
    )
    for s, p in zip(jax.tree.leaves(scalar), jax.tree.leaves(per_img)):
        assert p.shape == (3,)
        np.testing.assert_allclose(np.max(p), s, rtol=1e-6)


def test_calibrate_percentile_rejects_outlier_image(rng):
    """mode="percentile" outvotes a single anomalous calibration image that
    would own every scale under the running max (the documented running-max
    sensitivity, now with an in-library mitigation)."""
    folded = _small_folded(rng)
    clean = rng.standard_normal((15, 64, 64, 3)).astype(np.float32)
    outlier = np.concatenate(
        [clean[:1] * 100.0, clean[1:]], axis=0
    )  # image 0 is 100x hotter
    batches = [jnp.asarray(outlier[i:i + 5]) for i in range(0, 15, 5)]
    obs_max = q8.calibrate(folded, batches, jnp.float32)
    obs_pct = q8.calibrate(folded, batches, jnp.float32,
                           mode="percentile", percentile=90.0)
    obs_clean = q8.calibrate(
        folded, [jnp.asarray(clean[i:i + 5]) for i in range(0, 15, 5)],
        jnp.float32,
    )
    # running max: the outlier owns the image scale (~100x the clean max)
    assert float(obs_max["a_img"]) > 50 * float(obs_clean["a_img"])
    # 90th percentile of 15 per-image maxima: the one outlier is outvoted
    assert float(obs_pct["a_img"]) < 2 * float(obs_clean["a_img"])
    # and every site's percentile scale is <= the running max
    for p, m in zip(jax.tree.leaves(obs_pct), jax.tree.leaves(obs_max)):
        assert float(p) <= float(m) + 1e-6

    # quantized quality on the CLEAN distribution: percentile calibration
    # must track the float encode at least as well as the inflated-max tree
    probe = jnp.asarray(clean[1:3])
    want = np.asarray(
        rn.resnet_encode_folded(folded, probe, encoded_size=2,
                                compute_dtype=jnp.float32)
    )

    def min_cos(obs):
        qt = q8.quantize(folded, obs)
        got = np.asarray(
            q8.resnet_encode_int8(qt, probe, encoded_size=2,
                                  compute_dtype=jnp.float32)
        )
        num = np.sum(got * want, axis=-1)
        den = np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
        return float(np.min(num / (den + 1e-12)))

    assert min_cos(obs_pct) >= min_cos(obs_max) - 1e-6
    assert min_cos(obs_pct) > 0.9


def test_quantize_tree_epilogue_scales(rng):
    folded = _small_folded(rng)
    images = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    obs = q8.calibrate(folded, [images], compute_dtype=jnp.float32)
    qt = q8.quantize(folded, obs)
    # conv1 epilogue scale = a_img * s_w (per channel)
    a_img = max(float(obs["a_img"]) / 127.0, 0.0) or 1.0
    _, sw = q8._quantize_weight(folded["conv1"])
    np.testing.assert_allclose(
        np.asarray(qt["conv1"]["es"]), a_img * np.asarray(sw), rtol=1e-6
    )
    # requant reciprocals invert the observed scales
    a_stem = float(obs["a_stem"]) / 127.0
    np.testing.assert_allclose(float(qt["inv_stem"]), 1.0 / a_stem, rtol=1e-6)
    # int8 weights everywhere, f32 scales
    for stage in range(1, 5):
        for qb in qt[f"layer{stage}"]:
            for site in ("conv1", "conv2", "conv3"):
                assert qb[site]["wq"].dtype == jnp.int8
                assert qb[site]["es"].dtype == jnp.float32


def test_encode_int8_close_and_deterministic(rng):
    """Full quantized ResNet-101 encode tracks the f32 folded encode on the
    data it was calibrated on (PTQ closeness, loose bound — 104 quantized
    convs), and is bit-deterministic call to call."""
    folded = _small_folded(rng)
    images = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    qt = q8.calibrate_and_quantize(folded, [images], compute_dtype=jnp.float32)
    want = np.asarray(
        rn.resnet_encode_folded(folded, images, encoded_size=2,
                                compute_dtype=jnp.float32)
    )
    got = np.asarray(
        q8.resnet_encode_int8(qt, images, encoded_size=2,
                              compute_dtype=jnp.float32)
    )
    assert got.shape == want.shape
    # cosine per image-token between quantized and f32 features
    num = np.sum(got * want, axis=-1)
    den = np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1) + 1e-12
    cos = num / den
    assert np.min(cos) > 0.95, f"min token cosine {np.min(cos)}"
    rel = np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-12)
    assert rel < 0.35, f"relative L2 {rel}"
    again = np.asarray(
        q8.resnet_encode_int8(qt, images, encoded_size=2,
                              compute_dtype=jnp.float32)
    )
    np.testing.assert_array_equal(got, again)


def test_qtree_fingerprint_binding(rng, tmp_path, capsys):
    """A qtree records the (unfolded) source weights' fingerprint; loading
    it against a different checkpoint's encoder fails loudly instead of
    silently serving another model's encodings.  Legacy trees (no
    fingerprint) pass with a warning — they cannot be verified."""
    params = rn.init_resnet101(jax.random.PRNGKey(3), emb_dim=24)
    folded = rn.fold_bn_params(params)
    images = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    qt = q8.calibrate_and_quantize(
        folded, [images], compute_dtype=jnp.float32, source_params=params
    )
    q8.verify_qtree(qt, params)  # matching weights: no raise
    path = str(tmp_path / "enc_int8.msgpack")
    q8.save_qtree(qt, path)
    loaded = q8.load_qtree(path)
    q8.verify_qtree(loaded, params)  # fingerprint survives serialization
    other = rn.init_resnet101(jax.random.PRNGKey(4), emb_dim=24)
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        q8.verify_qtree(loaded, other)
    # legacy tree without source_params: warns, does not raise
    legacy = q8.calibrate_and_quantize(folded, [images], compute_dtype=jnp.float32)
    assert "_fingerprint" not in legacy
    q8.verify_qtree(legacy, other)
    assert "cannot verify" in capsys.readouterr().err


def test_qtree_save_load_roundtrip(rng, tmp_path):
    """Persisted trees (tools/quantize_encoder.py artifact flow) must encode
    bit-identically to the in-memory tree."""
    folded = _small_folded(rng)
    images = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    qt = q8.calibrate_and_quantize(folded, [images], compute_dtype=jnp.float32)
    path = str(tmp_path / "enc_int8.msgpack")
    q8.save_qtree(qt, path)
    loaded = q8.load_qtree(path)
    want = np.asarray(q8.resnet_encode_int8(qt, images, 2, jnp.float32))
    got = np.asarray(q8.resnet_encode_int8(loaded, images, 2, jnp.float32))
    np.testing.assert_array_equal(got, want)
