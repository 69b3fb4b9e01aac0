"""METEOR, pure-Python implementation.

The coco-caption METEOR the reference relies on
(geo-aware/compute_eval_metrics.py:36) spawns a Java subprocess with the
full METEOR 1.5 model (synonyms/paraphrase tables).  This implementation
covers the exact-, stem-, and synonym-match stages with the standard
METEOR parameters (alpha=0.9, beta=3.0, gamma=0.5), which reproduces the
Java scorer closely on caption-style text.  The synonym stage uses nltk
WordNet when its corpus data is installed (it is not baked into this
image, so by default the stage degrades to a no-op); tests inject a
synonym table via the ``synonyms`` argument.  METEOR 1.5's
paraphrase-table stage has no open data source and remains approximated
(documented delta vs the Java scorer).
"""

from __future__ import annotations

from typing import Callable, FrozenSet, List, Optional, Sequence, Tuple

ALPHA = 0.9
BETA = 3.0
GAMMA = 0.5

SynonymFn = Callable[[str], FrozenSet[str]]


def _wordnet_synonyms() -> Optional[SynonymFn]:
    """WordNet-backed synonym lookup, or None when corpus data is absent."""
    try:
        from nltk.corpus import wordnet

        wordnet.synsets("test")  # raises LookupError without corpus data
    except Exception:
        return None

    def lookup(word: str) -> FrozenSet[str]:
        return frozenset(
            lemma.name().lower()
            for synset in wordnet.synsets(word)
            for lemma in synset.lemmas()
        )

    return lookup


_DEFAULT_SYNONYMS = _wordnet_synonyms()

try:
    from nltk.stem.porter import PorterStemmer

    _STEMMER = PorterStemmer()

    def _stem(w: str) -> str:
        return _STEMMER.stem(w)

except Exception:  # pragma: no cover - nltk is expected in the image

    def _stem(w: str) -> str:
        return w


def _align(
    cand: List[str],
    ref: List[str],
    synonyms: Optional[SynonymFn] = None,
) -> List[Tuple[int, int]]:
    """Greedy staged alignment: exact, then stem, then synonym matches."""
    matches: List[Tuple[int, int]] = []
    used_c, used_r = set(), set()
    for stage in ("exact", "stem"):
        key = (lambda w: w) if stage == "exact" else _stem
        ref_keys = {}
        for j, w in enumerate(ref):
            if j not in used_r:
                ref_keys.setdefault(key(w), []).append(j)
        for i, w in enumerate(cand):
            if i in used_c:
                continue
            slots = ref_keys.get(key(w))
            if slots:
                j = slots.pop(0)
                matches.append((i, j))
                used_c.add(i)
                used_r.add(j)
    if synonyms is not None:
        # METEOR 1.5 wn-synonymy module: unmatched words align when their
        # synset lemma sets intersect (either direction, first free slot).
        for i, w in enumerate(cand):
            if i in used_c:
                continue
            w_syn = synonyms(w) | {w}
            for j, r in enumerate(ref):
                if j in used_r:
                    continue
                if r in w_syn or w in synonyms(r):
                    matches.append((i, j))
                    used_c.add(i)
                    used_r.add(j)
                    break
    return sorted(matches)


def _chunks(matches: List[Tuple[int, int]]) -> int:
    if not matches:
        return 0
    chunks = 1
    for (c0, r0), (c1, r1) in zip(matches, matches[1:]):
        if c1 != c0 + 1 or r1 != r0 + 1:
            chunks += 1
    return chunks


def meteor_sentence(
    refs: Sequence[str], cand: str, synonyms: Optional[SynonymFn] = None
) -> float:
    if synonyms is None:
        synonyms = _DEFAULT_SYNONYMS
    cand_tokens = cand.split()
    best = 0.0
    for ref in refs:
        ref_tokens = ref.split()
        matches = _align(cand_tokens, ref_tokens, synonyms)
        m = len(matches)
        if m == 0:
            continue
        precision = m / len(cand_tokens)
        recall = m / len(ref_tokens)
        fmean = precision * recall / (ALPHA * precision + (1 - ALPHA) * recall)
        frag = _chunks(matches) / m
        penalty = GAMMA * frag ** BETA
        best = max(best, fmean * (1 - penalty))
    return best


def meteor(
    references: Sequence[Sequence[str]],
    candidates: Sequence[str],
    synonyms: Optional[SynonymFn] = None,
) -> Tuple[float, List[float]]:
    scores = [
        meteor_sentence(r, c, synonyms)
        for r, c in zip(references, candidates)
    ]
    return (sum(scores) / len(scores) if scores else 0.0), scores


class Meteor:
    def compute_score(self, gts, res):
        refs = [list(r) for r in gts]
        cands = [c[0] for c in res]
        return meteor(refs, cands)
