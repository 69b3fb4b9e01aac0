"""C++ fuzzy matcher: builds, and agrees exactly with the pure-Python path
(and therefore with the reference, via test_data_codecs)."""

import random

import numpy as np
import pytest

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
