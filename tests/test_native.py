"""C++ fuzzy matcher: builds, and agrees exactly with the pure-Python path
(and therefore with the reference, via test_data_codecs)."""

import random

import numpy as np
import pytest

pytestmark = pytest.mark.quick  # <5-min core lane (CLAUDE.md)

from icek_tpu.data import codec, context


def _python_fuzzy_entity(token, index):
    packed = tuple(codec.encode_name(token))
    if packed in index:
        return index[packed]
    token_key = context._strip_pad(packed)
    best_key, best_len = None, 0
    for cand in index:
        cand_key = context._strip_pad(cand)
        if (cand_key in token_key or token_key in cand_key) and len(cand_key) > best_len:
            best_len = len(cand_key)
            best_key = cand
    return index[best_key] if best_key is not None else None


def test_native_builds():
    from icek_tpu import native

    if not native.available():
        pytest.skip("no C++ toolchain available")
    keys = np.asarray(
        [codec.encode_name("tower_bridge"), codec.encode_name("river")],
        dtype=np.int32,
    )
    assert native.fuzzy_lookup(codec.encode_name("tower_bridge_x"), keys) == 0
    assert native.fuzzy_lookup(codec.encode_name("zzz"), keys) == -1


def test_native_matches_python_on_random_cases():
    from icek_tpu import native

    if not native.available():
        pytest.skip("no C++ toolchain available")
    rng = random.Random(0)
    alphabet = "abcdefgh_"
    names = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 20)))
        for _ in range(60)
    ]
    index = context.entity_name_index(
        [[i, len(n)] + codec.encode_name(n) for i, n in enumerate(names)]
    )
    queries = names + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 25)))
        for _ in range(120)
    ]
    for q in queries:
        want = _python_fuzzy_entity(q, index)
        got = context.fuzzy_lookup_entity(q, index)
        assert got == want, q


def test_native_fact_lookup_matches_python():
    from icek_tpu import native

    if not native.available():
        pytest.skip("no C++ toolchain available")
    rng = random.Random(1)
    objects = ["1894", "horace_jones", "gothic", "215_m", "brick"]
    rows = []
    feats = []
    for i in range(12):
        obj = rng.choice(objects)
        rows.append([i, len(obj)] + codec.encode_name(obj))
        feats.append([i, rng.randint(0, 4), rng.randint(0, 3)])
    index = context.fact_name_index(rows, feats)
    for q in objects + ["horace", "unknown_thing", "1894_x"]:
        for seen in ([], [0, 1], [2], [0, 1, 2, 3, 4]):
            # python reference path (force by bypassing native)
            packed = tuple(codec.encode_name(q))
            hit = None
            for ent in seen:
                if (packed, ent) in index:
                    hit = index[(packed, ent)]
            if hit is None:
                token_key = context._strip_pad(packed)
                best, best_len = None, 0
                for (cand, cand_ent) in index:
                    cand_key = context._strip_pad(cand)
                    if (
                        (cand_key in token_key or token_key in cand_key)
                        and cand_ent in seen
                        and len(cand_key) > best_len
                    ):
                        best_len = len(cand_key)
                        best = (cand, cand_ent)
                want = index[best] if best is not None else None
            else:
                want = hit
            got = context.fuzzy_lookup_fact(q, seen, index)
            assert got == want, (q, seen)


# ---------------------------------------------------------------------------
# Native resize (resize.cpp): bit-identical f16 output vs the scipy path.


def _scipy_prep(img, size):
    from icek_tpu.data import images

    arr = images.resize_like_reference(img, size, size)
    return arr.transpose(2, 0, 1).astype(np.float16)


def test_native_resize_bit_identical_to_scipy_path():
    from icek_tpu import native

    if not native.resize_available():
        pytest.skip("no C++ toolchain available")
    rng = np.random.default_rng(0)
    cases = [
        (1066, 800),  # downscale both (typical photo)
        (300, 120),   # downscale y, upscale x
        (120, 300),   # upscale y, downscale x
        (100, 90),    # upscale both
        (256, 256),   # unit factors (no prefilter)
        (257, 255),   # near-unit factors
        (2000, 37),   # extreme aspect ratio
    ]
    for h, w in cases:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        want = _scipy_prep(img, 256)
        got = native.resize_chw_f16(img, 256, 256)
        assert np.array_equal(
            want.view(np.uint16), got.view(np.uint16)
        ), (h, w)


def test_native_resize_other_output_sizes_and_flat_images():
    from icek_tpu import native

    if not native.resize_available():
        pytest.skip("no C++ toolchain available")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(512, 384, 3), dtype=np.uint8)
    for size in (14, 64, 256):
        want = _scipy_prep(img, size)
        got = native.resize_chw_f16(img, size, size)
        assert np.array_equal(want.view(np.uint16), got.view(np.uint16)), size
    # constant image: clip bounds collapse (lo == hi)
    flat = np.full((300, 200, 3), 77, dtype=np.uint8)
    want = _scipy_prep(flat, 256)
    got = native.resize_chw_f16(flat, 256, 256)
    assert np.array_equal(want.view(np.uint16), got.view(np.uint16))


def test_prepare_uses_native_and_matches_scipy(monkeypatch):
    """_prepare routes through the native kernel (when built) and its output
    is bit-identical to the scipy route, gray/RGBA handling included."""
    from icek_tpu import native
    from icek_tpu.data import images

    if not native.resize_available():
        pytest.skip("no C++ toolchain available")
    rng = np.random.default_rng(2)
    gray = rng.integers(0, 256, size=(310, 475), dtype=np.uint8)
    rgba = rng.integers(0, 256, size=(310, 475, 4), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(310, 475, 3), dtype=np.uint8)
    for img in (gray, rgba, rgb):
        native_out = images._prepare(img.copy(), 256)
        monkeypatch.setenv("ICEK_NATIVE_RESIZE", "0")
        scipy_out = images._prepare(img.copy(), 256)
        monkeypatch.delenv("ICEK_NATIVE_RESIZE")
        assert native_out.dtype == np.float16
        assert np.array_equal(
            native_out.view(np.uint16), scipy_out.view(np.uint16)
        ), img.shape
