"""METEOR, pure-Python implementation.

The coco-caption METEOR the reference relies on
(geo-aware/compute_eval_metrics.py:36) spawns a Java subprocess with the
full METEOR 1.5 model (synonyms/paraphrase tables).  This implementation
covers the exact- and stem-match stages with the standard METEOR
parameters (alpha=0.9, beta=3.0, gamma=0.5), which reproduces the Java
scorer closely on caption-style text; the synonym stage is skipped (no
WordNet data ships with this framework).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

ALPHA = 0.9
BETA = 3.0
GAMMA = 0.5

try:
    from nltk.stem.porter import PorterStemmer

    _STEMMER = PorterStemmer()

    def _stem(w: str) -> str:
        return _STEMMER.stem(w)

except Exception:  # pragma: no cover - nltk is expected in the image

    def _stem(w: str) -> str:
        return w


def _align(cand: List[str], ref: List[str]) -> List[Tuple[int, int]]:
    """Greedy two-stage alignment: exact matches first, then stem matches."""
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
    return sorted(matches)


def _chunks(matches: List[Tuple[int, int]]) -> int:
    if not matches:
        return 0
    chunks = 1
    for (c0, r0), (c1, r1) in zip(matches, matches[1:]):
        if c1 != c0 + 1 or r1 != r0 + 1:
            chunks += 1
    return chunks


def meteor_sentence(refs: Sequence[str], cand: str) -> float:
    cand_tokens = cand.split()
    best = 0.0
    for ref in refs:
        ref_tokens = ref.split()
        matches = _align(cand_tokens, ref_tokens)
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
    references: Sequence[Sequence[str]], candidates: Sequence[str]
) -> Tuple[float, List[float]]:
    scores = [meteor_sentence(r, c) for r, c in zip(references, candidates)]
    return (sum(scores) / len(scores) if scores else 0.0), scores


class Meteor:
    def compute_score(self, gts, res):
        refs = [list(r) for r in gts]
        cands = [c[0] for c in res]
        return meteor(refs, cands)
