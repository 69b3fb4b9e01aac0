"""Metric correctness: BLEU cross-checked against nltk, CIDEr/ROUGE/METEOR
invariants, JS-geo accumulation parity vs the reference metric class, and
fact-accuracy parity on crafted cases."""

import random
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.quick  # <5-min core lane (CLAUDE.md)

from icek_tpu.metrics import bleu, cider, meteor, rouge

from conftest import REFERENCE_ROOT, reference_subproject

REFS = [
    ["the old bridge crosses the river near the town"],
    ["a tower built in 1894 stands on the hill"],
    ["the cathedral of st paul is in london"],
]
CANDS = [
    "the old bridge crosses the river near the city",
    "a tower built in 1894 stands on the hill",
    "a cathedral in london",
]


def test_bleu_matches_nltk_corpus():
    nltk = pytest.importorskip("nltk")
    from nltk.translate.bleu_score import corpus_bleu as nltk_bleu

    refs_tok = [[r.split() for r in refs] for refs in REFS]
    cands_tok = [c.split() for c in CANDS]
    corpus, _ = bleu.corpus_bleu(REFS, CANDS)
    for n in range(4):
        weights = tuple([1.0 / (n + 1)] * (n + 1))
        want = nltk_bleu(refs_tok, cands_tok, weights=weights)
        assert abs(corpus[n] - want) < 1e-6, (n, corpus[n], want)


def test_bleu_perfect_match():
    corpus, per_sent = bleu.corpus_bleu([[c] for c in CANDS], CANDS)
    assert all(abs(s - 1.0) < 1e-6 for s in corpus)


def test_cider_perfect_match_scores_ten():
    mean, scores = cider.cider_score([[c] for c in CANDS], CANDS)
    assert abs(mean - 10.0) < 1e-6
    assert all(abs(s - 10.0) < 1e-6 for s in scores)


def test_cider_hand_computed_with_df():
    """Hand-derived golden on a corpus where document frequency > 1, count
    clipping, and the gaussian length penalty (sigma=6) all bind
    (coco-caption Cider semantics, geo-aware/compute_eval_metrics.py:35).

    Corpus (N=3 images, 1 ref each):
      img1: ref "a b",  cand "a a b"   (cand count of 'a' exceeds ref -> clip;
                                        len 3 vs 2 -> delta=1 penalty)
      img2: ref "a c",  cand "c"       (delta=-1 penalty)
      img3: ref "d e",  cand "d e"     (exact; only n=1,2 levels non-empty)

    df('a') = 2 (appears in the refs of img1 AND img2), every other gram 1.
    The expected values below are derived independently, straight-line:
    missing log(df) weighting (idf_a would be log 3, not log 1.5), missing
    clipping (the 'a' dot term would use 2*idf_a), or a missing length
    penalty each shifts them beyond the 1e-9 tolerance."""
    import math

    log3 = math.log(3.0)
    idf_a = log3 - math.log(2.0)  # df>1 binds: log(3) - log(df=2)
    pen1 = math.exp(-1.0 / (2 * 6.0 ** 2))  # |delta|=1

    # --- img1 ---
    # n=1: cand vec {a: 2*idf_a, b: log3}, ref vec {a: idf_a, b: log3};
    # clipped dot = min(2*idf_a, idf_a)*idf_a + log3*log3
    dot1 = idf_a ** 2 + log3 ** 2
    n1 = dot1 / (
        math.sqrt((2 * idf_a) ** 2 + log3 ** 2)
        * math.sqrt(idf_a ** 2 + log3 ** 2)
    ) * pen1
    # n=2: cand {aa: log3, ab: log3} (df('a a')=0 -> idf=log 3),
    # ref {ab: log3}; shared 'a b' only
    n2 = (log3 ** 2) / (math.sqrt(2) * log3 * log3) * pen1
    # n=3: ref has no trigram -> 0; n=4: both empty -> 0
    score1 = 10.0 * (n1 + n2) / 4.0

    # --- img2 ---
    # n=1: cand {c: log3}, ref {a: idf_a, c: log3}; dot = log3^2
    m1 = (log3 ** 2) / (log3 * math.sqrt(idf_a ** 2 + log3 ** 2)) * pen1
    score2 = 10.0 * m1 / 4.0  # n>=2: cand has none

    # --- img3 --- exact 2-token match: sim=1 at n=1 and n=2, 0 above
    score3 = 10.0 * 2.0 / 4.0

    mean, scores = cider.cider_score(
        [["a b"], ["a c"], ["d e"]], ["a a b", "c", "d e"]
    )
    assert abs(scores[0] - score1) < 1e-9, (scores[0], score1)
    assert abs(scores[1] - score2) < 1e-9, (scores[1], score2)
    assert abs(scores[2] - score3) < 1e-9, (scores[2], score3)
    assert abs(mean - (score1 + score2 + score3) / 3.0) < 1e-9


def test_cider_orders_by_overlap():
    refs = [
        ["the old bridge crosses the river"],
        ["a tall tower stands on the hill"],
        ["boats sail along the canal at dawn"],
    ]
    cands = ["the old bridge crosses the river", "a completely different text here",
             "boats sail along the canal at dawn"]
    _, scores = cider.cider_score(refs, cands)
    assert scores[0] > scores[1]
    assert scores[2] > scores[1]


def test_rouge_l_hand_computed():
    # cand LCS with ref: "the cat sat" (3 tokens)
    score = rouge.rouge_l_sentence(["the cat sat on the mat"], "the cat sat down")
    p, r, b = 3 / 4, 3 / 6, 1.2
    want = (1 + b * b) * p * r / (r + b * b * p)
    assert abs(score - want) < 1e-9


def test_meteor_invariants():
    assert meteor.meteor_sentence(["the cat sat"], "the cat sat") > 0.9
    good = meteor.meteor_sentence(["the old towers stand"], "the old tower stands")
    bad = meteor.meteor_sentence(["the old towers stand"], "unrelated words entirely")
    assert good > bad == 0.0


def test_meteor_synonym_stage():
    # METEOR 1.5's wn-synonymy module (injected table: no WordNet corpus in
    # this image).  "automobile" must align with "car" only when the synonym
    # stage is active, raising the score; exact/stem matches are unaffected.
    table = {"automobile": frozenset({"car", "auto"})}
    syn = lambda w: table.get(w, frozenset())
    refs = ["the red car stopped"]
    cand = "the red automobile stopped"
    without = meteor.meteor_sentence(refs, cand, synonyms=lambda w: frozenset())
    with_syn = meteor.meteor_sentence(refs, cand, synonyms=syn)
    assert with_syn > without
    # all four words align -> same score as the exact-match sentence
    exact = meteor.meteor_sentence(refs, "the red car stopped",
                                   synonyms=lambda w: frozenset())
    assert abs(with_syn - exact) < 1e-12
    # symmetric direction: synonym knowledge on the reference-side word
    rev = meteor.meteor_sentence(["the red automobile stopped"],
                                 "the red car stopped", synonyms=syn)
    assert abs(rev - exact) < 1e-12


def test_meteor_synonym_resolution_never_silent(monkeypatch, tmp_path):
    """The synonym source resolves vendored-table > nltk-wordnet > disabled;
    'disabled' warns LOUDLY on first use (never a silent no-op), and the
    active stage is reported for metric metadata."""
    import warnings as _warnings

    # force a fresh resolution against a missing vendored table
    monkeypatch.setattr(meteor, "_RESOLVED", None)
    monkeypatch.setattr(
        meteor, "VENDORED_LEMMAS", str(tmp_path / "absent.json.gz")
    )
    if meteor._wordnet_synonyms() is None:
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            meteor.meteor_sentence(["a"], "a")  # first scoring use
            assert meteor.synonym_stage() == "disabled"
        assert any("synonym stage DISABLED" in str(w.message) for w in caught)
    else:  # environment has the corpus: the stage must be active, no warning
        assert meteor.synonym_stage() == "nltk-wordnet"

    # vendored table present -> it wins and actually matches synonyms
    import gzip as _gzip
    import json as _json

    vendored = tmp_path / "wordnet_lemmas.json.gz"
    with _gzip.open(vendored, "wt") as f:
        _json.dump({"automobile": ["car", "auto"]}, f)
    monkeypatch.setattr(meteor, "_RESOLVED", None)
    monkeypatch.setattr(meteor, "VENDORED_LEMMAS", str(vendored))
    assert meteor.synonym_stage() == "vendored-wordnet"
    with_syn = meteor.meteor_sentence(
        ["the red car stopped"], "the red automobile stopped"
    )
    exact = meteor.meteor_sentence(
        ["the red car stopped"], "the red car stopped",
        synonyms=lambda w: frozenset(),
    )
    assert abs(with_syn - exact) < 1e-12


# -----------------------------------------------------------------------
# JS geo metric parity
# -----------------------------------------------------------------------

def _geo_wordmap():
    words = ["a", "the", "of", "near", "in", "across", "along", "north_of",
             "south_of", "east_of", "west_of", "bridge", "stands"]
    wm = {w: i + 1 for i, w in enumerate(words)}
    wm["<unk>"] = len(wm) + 1
    wm["<start>"] = len(wm) + 1
    wm["<end>"] = len(wm) + 1
    wm["<pad>"] = 0
    return wm


def test_js_geo_accumulation_matches_reference(monkeypatch):
    torch = pytest.importorskip("torch")
    path = REFERENCE_ROOT / "geo-aware"
    if not path.exists():
        pytest.skip("reference not mounted")
    sys.path.insert(0, str(path))
    monkeypatch.chdir(path)  # reference loads data/*.pkl relative to cwd
    try:
        for mod in ("jensen_shannon_metric", "utils"):
            sys.modules.pop(mod, None)
        import jensen_shannon_metric as ref_js
        import importlib

        importlib.reload(ref_js)
        wm = _geo_wordmap()
        ref_metric = ref_js.JSGeoMetric(word_map=wm, print_metrics=False)

        from icek_tpu.data.codec import encode_name
        from icek_tpu.metrics.js_geo import JSGeoMetric

        mine = JSGeoMetric(
            wm,
            ref_metric.bins_distance,
            ref_metric.bins_azimuth,
            len(ref_metric.OSM_types_index),
            train_distributions=None,
            print_metrics=False,
        )

        V = len(wm)
        E = 4
        names = []
        for i, name in enumerate(["tower_bridge", "river_thames", "old_town", "<unk_ent>"]):
            names.append([i, len(name)] + encode_name(name))
        feats = np.zeros((E, 5), dtype=np.float32)
        feats[:, 0] = np.arange(E)
        feats[:, 1] = [0.05, 0.5, 1.2, 0.3]
        feats[:, 2] = [10.0, -100.0, 170.0, 0.0]
        feats[:, 4] = [3, 7, 100, 2]

        seqs = [
            # "bridge near tower_bridge" / "north_of the river_thames" etc.
            [wm["bridge"], wm["near"], V + 0, wm["stands"]],
            [wm["bridge"], wm["north_of"], wm["the"], V + 1],
            [wm["across"], wm["of"], wm["the"], V + 2],
            [wm["in"], V + 3],            # unk_ent -> skipped
            [wm["along"], V + 1, V + 0],  # entity after entity -> only first
        ]
        random.seed(0)
        for seq in seqs:
            ref_metric.run(
                [torch.tensor(t) for t in seq],
                torch.tensor(feats),
                torch.tensor(names),
            )
        random.seed(0)
        for seq in seqs:
            mine.run(seq, feats, names)

        for term in mine.generated:
            for key in ("n_occurrences", "distance", "azimuth", "type"):
                if key in mine.generated[term]:
                    assert (
                        mine.generated[term][key]
                        == ref_metric.geo_probability_distr_generated[term][key]
                    ), (term, key)
            for key in ("distance", "azimuth", "type"):
                if key in mine.random_baseline[term]:
                    assert (
                        mine.random_baseline[term][key]
                        == ref_metric.geo_probability_distr_random[term][key]
                    ), (term, key)

        # js distance math parity
        p = [0.2, 0.3, 0.5]
        q = [0.4, 0.4, 0.2]
        assert abs(
            JSGeoMetric.js_distance(p, q) - ref_metric.js_distance(np.array(p), np.array(q))
        ) < 1e-12

        # END-TO-END score parity vs the reference's compute_metrics on its
        # REAL train distribution table (r5: compute() read the raw
        # per-occurrence bin list instead of the "<feature>_probs" vector
        # the reference compares against — accumulation parity alone never
        # caught it).  The reference divides by n_occurrences while
        # building probs, so n=0 terms (which crash it) are filtered from
        # the copy it receives; ours skips them by contract.
        import contextlib
        import copy as copy_lib
        import io
        import pickle

        with open(path / "data" / "geo_probability_distr_train.pkl", "rb") as f:
            train = pickle.load(f)
        analysis = {
            t: copy_lib.deepcopy(v)
            for t, v in ref_metric.geo_probability_distr_generated.items()
            if v["n_occurrences"] > 0
        }
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            ref_metric.compute_metrics(analysis, train)
        ref_scores = {}
        term = None
        for line in buf.getvalue().splitlines():
            if line and line == line.upper() and ":" not in line:
                term = line.lower()
            elif ":" in line and not line.startswith("Number"):
                name, val = line.split(":")
                ref_scores.setdefault(term, {})[name.strip()] = float(val)
        assert ref_scores, "failed to parse reference compute_metrics output"

        mine_t = JSGeoMetric(
            wm, ref_metric.bins_distance, ref_metric.bins_azimuth,
            len(ref_metric.OSM_types_index),
            train_distributions=train, print_metrics=False,
        )
        out = mine_t.compute(mine.generated)
        for t, feats in ref_scores.items():
            for name, val in feats.items():
                assert abs(out[t][name] - val) < 1e-12, (t, name)
    finally:
        sys.path.pop(0)
        sys.modules.pop("jensen_shannon_metric", None)
        sys.modules.pop("utils", None)


# -----------------------------------------------------------------------
# Fact accuracy parity
# -----------------------------------------------------------------------

def _fact_fixture(tmp_path):
    pd = pytest.importorskip("pandas")
    import json
    import pickle

    url = "http://example.com/1"
    images = [
        {
            "tokens": ["the", "tower_bridge", "built", "in", "1894"],
            "mask": [0, 1, 0, 0, 2],
            "url": url, "id": f"img{i}", "split": "test",
        }
        for i in range(4)
    ]
    entities = {
        url: pd.DataFrame(
            {"name": ["Tower Bridge", "River Thames"], "distance": [0.1, 0.2],
             "azimuth": [0.0, 1.0], "size": [0.1, 0.1], "type_index": [1, 2]}
        )
    }
    knowledge = {
        url: pd.DataFrame(
            {
                "subject": ["Tower Bridge", "Tower Bridge", "River Thames"],
                "predicate": ["opened", "architect", "length"],
                "object": ["1894", "horace_jones", "215_miles"],
            }
        )
    }
    splits = tmp_path / "captions_split.json"
    ents_p = tmp_path / "entity_context.pkl"
    know_p = tmp_path / "knowledge_context.pkl"
    with open(splits, "w") as f:
        json.dump({"images": images}, f)
    with open(ents_p, "wb") as f:
        pickle.dump(entities, f)
    with open(know_p, "wb") as f:
        pickle.dump(knowledge, f)
    return str(splits), str(ents_p), str(know_p)


def test_fact_accuracy_matches_reference(tmp_path, monkeypatch):
    path = REFERENCE_ROOT / "knowledge-aware"
    if not path.exists():
        pytest.skip("reference not mounted")
    splits, ents_p, know_p = _fact_fixture(tmp_path)
    sys.path.insert(0, str(path))
    monkeypatch.chdir(path)
    try:
        for mod in ("fact_accuracy_metric", "utils"):
            sys.modules.pop(mod, None)
        import fact_accuracy_metric as ref_fm
        import importlib

        importlib.reload(ref_fm)
        ref = ref_fm.FactAccuracyMetric(splits, ents_p, know_p)

        from icek_tpu.metrics.fact_accuracy import FactAccuracyMetric

        mine = FactAccuracyMetric.from_data_dir(
            splits, ents_p, know_p, str(path / "data")
        )
        captions = [
            "the tower_bridge built in 1894",      # correct temporal fact
            "the tower_bridge built in 1901",      # wrong year
            "a bridge near the river",             # no facts
            "tower_bridge opened in <unk_fact>",   # unk fact counts, incorrect
        ]
        for cap in captions:
            gt_caption = "the tower_bridge built in 1894"
            gt_entities = ["tower_bridge"]
            url = "http://example.com/1"
            want = ref.check_temporal_facts(cap, gt_caption, gt_entities, url)
            got = mine.check_temporal(cap, gt_caption, gt_entities, url)
            assert tuple(got) == tuple(want), cap
            want_o = ref.check_other_facts(cap, gt_entities, url)
            got_o = mine.check_other(cap, gt_entities, url)
            assert tuple(got_o) == tuple(want_o), cap
        assert ref.extract_year("built in 1894 and no. 1921") == (
            __import__("icek_tpu.metrics.fact_accuracy", fromlist=["x"]).extract_years(
                "built in 1894 and no. 1921"
            )
        )
        assert mine.run(captions, log=lambda s: None)["n_temporal"] == 3
    finally:
        sys.path.pop(0)
        sys.modules.pop("fact_accuracy_metric", None)
        sys.modules.pop("utils", None)


def test_ne_pr_fallback():
    from icek_tpu.metrics.ne_pr import NamedEntityPR, fallback_ner

    assert "Tower Bridge" in fallback_ner("the Tower Bridge opened in London")
    metric = NamedEntityPR(proper_nouns=["tower", "bridge", "london"])
    res = metric.compute(
        ["the tower bridge in london"],
        ["the tower bridge in london"],
        log=lambda s: None,
    )
    assert res["exact_precision"] == 1.0
    assert res["exact_recall"] == 1.0
