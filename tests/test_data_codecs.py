"""Golden parity of the host-side data codecs against the reference utils.

These codecs define the training targets (SURVEY.md §7 hard parts), so they
are compared function-by-function with the reference implementation.
"""

import random
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.quick  # <5-min core lane (CLAUDE.md)

from icek_tpu.data import codec, context

from conftest import REFERENCE_ROOT, reference_subproject


def _stub_imaging_modules():
    """create_input_files.py imports imageio/skimage at module level."""
    if "imageio" not in sys.modules:
        m = types.ModuleType("imageio")
        m.imread = lambda *a, **k: None
        sys.modules["imageio"] = m
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        tr = types.ModuleType("skimage.transform")
        tr.resize = lambda *a, **k: None
        sk.transform = tr
        sys.modules["skimage"] = sk
        sys.modules["skimage.transform"] = tr


def reference_input_constructor(subproject):
    path = REFERENCE_ROOT / subproject
    if not path.exists():
        pytest.skip("reference not mounted")
    _stub_imaging_modules()
    import importlib

    saved = {
        mod: sys.modules.pop(mod)
        for mod in ("create_input_files", "utils")
        if mod in sys.modules
    }
    sys.path.insert(0, str(path))
    try:
        cif = importlib.import_module("create_input_files")
        importlib.reload(cif)
        return cif
    finally:
        sys.path.pop(0)
        sys.modules.pop("create_input_files", None)
        sys.modules.pop("utils", None)
        sys.modules.update(saved)


NAMES = [
    "Tower Bridge", "the_River_Thames", "St. Paul's Cathedral",
    "http://dbpedia.org/resource/London_Underground#station",
    "Big Ben, London", "abbey_(road)", "c.1987", "2010-01-01",
    "King's Cross railway_station", "Saint Mary tube_station",
    "The_Shard_of_england", "A & B", 'he said ``hi"',
]


def test_char_codec_matches_reference():
    _, ref_ut = reference_subproject("geo-aware")
    for name in NAMES + ["x" * 80, ""]:
        assert codec.encode_name(name) == ref_ut.str_to_int(name)
        packed = codec.encode_name(name)
        assert codec.decode_name(packed, min(len(name), 50)) == ref_ut.int_to_str(
            packed, min(len(name), 50)
        )


def test_normalize_name_geo_matches_reference():
    _, ref_ut = reference_subproject("geo-aware")
    for name in NAMES:
        assert codec.normalize_name_geo(name) == ref_ut.normalize_name(name)


def test_normalize_name_news_matches_reference():
    _, ref_ut = reference_subproject("news-knowledge-aware")
    for name in NAMES + ["The Mayor’s office", "“quoted”  name"]:
        assert codec.normalize_name_news(name) == ref_ut.normalize_name(name)


def _entity_df(pd):
    return pd.DataFrame(
        {
            "name": ["Tower Bridge", "River_Thames", "", "Big Ben, London"],
            "distance": [0.1, 0.5, 0.2, 0.9],
            "azimuth": [10.0, -120.0, 5.0, 170.0],
            "size": [0.01, 0.05, 0.0, 0.09],
            "type_index": [3, 7, 1, 12],
        }
    )


def test_pack_context_matches_reference_geo():
    pd = pytest.importorskip("pandas")
    _, ref_ut = reference_subproject("geo-aware")
    df = _entity_df(pd)
    kwargs = dict(
        name_col="name",
        feature_cols=["distance", "azimuth", "size", "type_index"],
        random_value_range=[(0.0, 1.0), (-179.0, 179.0), (0.0, 0.1), (0, 500)],
        context_size=6,
        unk_dummy="<unk_ent>",
    )
    random.seed(42)
    want_feats, want_names = ref_ut.prepare_context(df, **kwargs)
    random.seed(42)
    rows = df.to_dict("records")
    got_feats, got_names = context.pack_context(
        rows,
        name_key="name",
        feature_keys=kwargs["feature_cols"],
        random_ranges=kwargs["random_value_range"],
        context_size=6,
        unk_token="<unk_ent>",
        normalizer=codec.normalize_name_geo,
    )
    assert got_names == want_names
    np.testing.assert_allclose(np.array(got_feats), np.array(want_feats))


def test_pack_context_matches_reference_news():
    pd = pytest.importorskip("pandas")
    _, ref_ut = reference_subproject("news-knowledge-aware")
    wm_dict = {"tower": 1, "bridge": 2, "<unk>": 3, "<start>": 4, "<end>": 5, "<pad>": 0}
    wm = codec.Wordmap(wm_dict)
    df = pd.DataFrame(
        {
            "name_processed": ["tower_bridge", "river_thames_crossing_at_night_x", ""],
            "count": [3, 1, 0],
            "in_headline": [1, 0, 0],
            "in_first_paragraph": [0, 1, 0],
            "type": [2, 5, 0],
        }
    )
    kwargs = dict(
        name_col="name_processed",
        feature_cols=["count", "in_headline", "in_first_paragraph", "type", "name_processed"],
        random_value_range=[(0, 0), (0, 0), (0, 0), (0, 0), (0, 0)],
        context_size=4,
        unk_dummy="<unk_ent>",
        word_map=wm_dict,
    )
    random.seed(7)
    want_feats, want_names = ref_ut.prepare_context(df, **kwargs)
    random.seed(7)
    got_feats, got_names = context.pack_context(
        df.to_dict("records"),
        name_key="name_processed",
        feature_keys=kwargs["feature_cols"],
        random_ranges=kwargs["random_value_range"],
        context_size=4,
        unk_token="<unk_ent>",
        wordmap=wm,
        pack_name_word_ids=True,
        truncate_input=True,
    )
    assert got_names == want_names
    np.testing.assert_allclose(np.array(got_feats), np.array(want_feats))


def _ref_process_caption(subproject, tokens, mask, wm, entity_names,
                         fact_names=None, facts=None, max_len=20,
                         entity_context_size=None):
    cif = reference_input_constructor(subproject)
    ic = object.__new__(cif.InputConstructor)
    ic.max_len = max_len
    if entity_context_size is not None:
        ic.entity_context_size = entity_context_size
    img = {"tokens": tokens, "mask": mask}
    if fact_names is not None:
        return ic.process_caption(img, wm, entity_names, fact_names, facts)
    return ic.process_caption(img, wm, entity_names)


def test_encode_caption_matches_reference_geo():
    pd = pytest.importorskip("pandas")
    _, ref_ut = reference_subproject("geo-aware")
    df = _entity_df(pd)
    random.seed(3)
    feats, names = context.pack_context(
        df.to_dict("records"),
        name_key="name",
        feature_keys=["distance", "azimuth", "size", "type_index"],
        random_ranges=[(0.0, 1.0), (-179.0, 179.0), (0.0, 0.1), (0, 500)],
        context_size=6,
        unk_token="<unk_ent>",
        normalizer=codec.normalize_name_geo,
    )
    wm_dict = codec.Wordmap.from_words(["a", "the", "bridge", "near", "is"]).to_json_dict()
    wm = codec.Wordmap(wm_dict)
    tokens = ["the", "bridge", "tower_bridge", "is", "near", "river_thames_x",
              "missing_entity", "zzz"]
    mask = [0, 0, 1, 0, 0, 1, 1, 0]
    want = _ref_process_caption("geo-aware", tokens, mask, wm_dict, names)
    got = context.encode_caption(tokens, mask, wm, names, max_len=20)
    assert got == tuple(want) or list(got) == list(want)


def test_encode_caption_matches_reference_knowledge():
    pd = pytest.importorskip("pandas")
    _, ref_ut = reference_subproject("knowledge-aware")
    df = _entity_df(pd)
    random.seed(5)
    ent_feats, ent_names = context.pack_context(
        df.to_dict("records"),
        name_key="name",
        feature_keys=["distance", "azimuth", "size", "type_index"],
        random_ranges=[(0.0, 10.0), (-179.0, 179.0), (0.0, 0.1), (0, 500)],
        context_size=6,
        unk_token="<unk_ent>",
        normalizer=codec.normalize_name_geo,
    )
    fact_df = pd.DataFrame(
        {
            "object": ["1894", "Horace Jones", "1886"],
            "subject_idx_in_entity_context": [0, 0, 1],
            "predicate_idx": [2, 5, 2],
        }
    )
    fact_feats, fact_names = context.pack_context(
        fact_df.to_dict("records"),
        name_key="object",
        feature_keys=["subject_idx_in_entity_context", "predicate_idx"],
        random_ranges=[(6, 6), (0, 0)],
        context_size=4,
        unk_token="<unk_fact>",
        normalizer=codec.normalize_name_geo,
    )
    wm_dict = codec.Wordmap.from_words(["built", "in", "by", "the"]).to_json_dict()
    wm = codec.Wordmap(wm_dict)
    tokens = ["the", "tower_bridge", "built", "in", "1894", "by", "horace_jones",
              "1886", "unknown_fact_object"]
    mask = [0, 1, 0, 0, 2, 0, 2, 2, 2]
    want = _ref_process_caption(
        "knowledge-aware", tokens, mask, wm_dict, ent_names,
        fact_names=fact_names, facts=fact_feats, max_len=20,
        entity_context_size=6,
    )
    got = context.encode_caption(
        tokens, mask, wm, ent_names, max_len=20,
        fact_names=fact_names, fact_features=fact_feats,
        entity_context_size=6, length_is_padded=True,
    )
    assert list(got) == list(want)


def test_pack_context_deterministic_with_seed():
    """Seeded packing is reproducible (input-pipeline determinism guard)."""
    import random as _random

    pd = pytest.importorskip("pandas")
    df = _entity_df(pd)
    kwargs = dict(
        name_key="name",
        feature_keys=["distance", "azimuth", "size", "type_index"],
        random_ranges=[(0.0, 1.0), (-179.0, 179.0), (0.0, 0.1), (0, 500)],
        context_size=6,
        unk_token="<unk_ent>",
        normalizer=codec.normalize_name_geo,
    )
    a = context.pack_context(df.to_dict("records"), rng=_random.Random(7), **kwargs)
    b = context.pack_context(df.to_dict("records"), rng=_random.Random(7), **kwargs)
    assert a == b
